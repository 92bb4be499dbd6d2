"""Fused-frame renderer (tpu.frame_fuse): one executable per frame — grid
bake + DFSS sweep + lax.scan over ray blocks — must produce the same pixels
as the per-block host loop (VERDICT r3 weak-4: the loop's ~6-9 sequential
dispatches per frame idle the chip between executables over the tunnel).

Reference analogue: utils/data_utils.py chunkify re-dispatches per chunk;
the fused path is the TPU-native redesign (static shapes + in-device scan).
"""
import jax
import numpy as np
import pytest

from relightableavatar_tpu.config import default_cfg
from relightableavatar_tpu.models import anisdf
from relightableavatar_tpu.models.anisdf import AniSDFConfig
from relightableavatar_tpu.models.context import (make_bigpose,
                                                  make_frame_context)
from relightableavatar_tpu.renderer.orchestrate import SphereTracingRenderer
from relightableavatar_tpu.smpl import synthetic
from relightableavatar_tpu.utils.dotdict import dotdict


def _setup(P=150, **tpu_overrides):
    model = synthetic.make_body_model(n_bones=52, target_verts=800, seed=0)
    motion = synthetic.make_motion(1, n_bones=52)
    tverts, tjoints, big_A, _ = make_bigpose(model, motion["shapes"][0])
    ctx = make_frame_context(model, tverts, tjoints, big_A,
                             motion["poses"][0], motion["Rh"][0],
                             motion["Th"][0], motion["shapes"][0])
    cfg = default_cfg()
    cfg.n_bones = 52
    cfg.cond_dim = 156
    cfg.relighting = True
    cfg.n_samples = 2
    cfg.env_h, cfg.env_w = 2, 4
    cfg.sphere_tracing.iter = 2
    cfg.obj_lvis.iter = 1
    cfg.tpu.ray_block = 64
    cfg.tpu.bf16_mlp = False
    cfg.tpu.shadow_grid = 16
    cfg.tpu.lvis_sweep = True
    cfg.tpu.lvis_downscale = 2
    cfg.tpu.lvis_query_offset = 0.0
    cfg.tpu.distant_envmap = True
    for k, v in tpu_overrides.items():
        cfg.tpu[k] = v
    mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=6)
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)

    center = np.asarray(ctx["Th"]).reshape(3) + [0, 0, 1.0]
    rng = np.random.default_rng(0)
    ray_o = np.tile(center + [2.0, 0, 0], (P, 1)).astype(np.float32)
    tgt = center + rng.normal(0, 0.25, (P, 3))
    ray_d = (tgt - ray_o).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    batch = dotdict(ray_o=ray_o, ray_d=ray_d,
                    near=np.full(P, 0.5, np.float32),
                    far=np.full(P, 4.0, np.float32), ctx=ctx)
    return cfg, params, mcfg, batch


@pytest.mark.parametrize("lvis_sweep", [True, False])
def test_fused_matches_block_loop(lvis_sweep):
    """P=150, block=64 -> 3 valid blocks bucketed to nb=4 (one skipped via
    lax.cond).  Every output map must match the per-block loop."""
    cfg, params, mcfg, batch = _setup(lvis_sweep=lvis_sweep)

    r = SphereTracingRenderer(cfg, params, mcfg)
    ref = r.render(dotdict(batch))

    cfg.tpu.frame_fuse = True
    rf = SphereTracingRenderer(cfg, params, mcfg)
    got = rf.render(dotdict(batch))

    assert set(ref.keys()) == set(got.keys())
    for k in ref:
        if k == 'envmap':
            continue
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        assert a.shape == b.shape, k
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5, err_msg=k)


def test_fused_collects_frame_cost():
    """collect_cost works through the single fused executable (flops+bytes
    of the whole frame, grid bake + sweep + all blocks in one)."""
    cfg, params, mcfg, batch = _setup(frame_fuse=True)
    r = SphereTracingRenderer(cfg, params, mcfg)
    r.collect_cost = True
    out = r.render(dotdict(batch))
    jax.block_until_ready(out.rgb_map)
    assert r.last_frame_cost['flops'] > 0
    assert r.last_frame_cost['bytes'] > 0


def test_fused_single_block_bucket():
    """P smaller than one block -> nb=1, no padding blocks."""
    cfg, params, mcfg, batch = _setup(P=40)
    ref = SphereTracingRenderer(cfg, params, mcfg).render(dotdict(batch))
    cfg.tpu.frame_fuse = True
    got = SphereTracingRenderer(cfg, params, mcfg).render(dotdict(batch))
    np.testing.assert_allclose(np.asarray(ref.rgb_map),
                               np.asarray(got.rgb_map), rtol=2e-5, atol=2e-5)
