"""Golden-image regression test (SURVEY.md §4: the determinism fixture a
golden test would use).

Renders a tiny fixed view of the distilled fixture avatar through the FULL
relight pipeline on CPU and compares against a stored golden. Guards perf
work from silently changing pixels. Regenerate (after an intentional
change): RA_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), 'golden_relight_24px.npy')


def _render():
    from relightableavatar_tpu.config import default_cfg
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.smpl.body_model import BodyModel
    from relightableavatar_tpu.train.checkpoints import load_params

    root = os.path.join(os.path.dirname(__file__), '..')
    model = BodyModel(os.path.join(root, 'fixtures/synthetic_body.npz'))
    motion = dict(np.load(os.path.join(root, 'fixtures/synthetic_motion.npz')))
    sh = motion['shapes'][0]
    tv, tj, bA, _ = make_bigpose(model, sh)
    ctx = make_frame_context(model, tv, tj, bA, motion['poses'][0],
                             motion['Rh'][0], motion['Th'][0], sh)
    cfg = default_cfg()
    cfg.n_bones = model.n_bones
    cfg.cond_dim = model.n_bones * 3
    cfg.relighting = True
    cfg.n_samples = 3
    cfg.dist_th = 0.125
    cfg.obj_lvis.dist_th = 0.125
    cfg.sphere_tracing.iter = 6
    cfg.tpu.lvis_downscale = 8        # 2x4 traced texels (keeps CPU runtime sane)
    cfg.tpu.distant_envmap = True
    cfg.obj_lvis.iter = 2
    cfg.tpu.ray_block = 1024
    cfg.tpu.bf16_mlp = False          # goldens stay f32-deterministic
    mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=8)
    params = load_params(
        anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg),
        os.path.join(root, 'fixtures/synthetic_avatar_params.npz'))
    # fixed 256-ray bundle through render_human_block directly (compiling
    # the full orchestrator on CPU costs minutes; the block IS the pipeline)
    from relightableavatar_tpu.ops.envmap import gen_light_xyz
    from relightableavatar_tpu.renderer.sphere_tracing import (
        RelightRenderConfig, render_human_block)
    from relightableavatar_tpu.renderer.tracing import STConfig
    P = 256
    rng = np.random.default_rng(7)
    center = np.asarray(ctx['Th']).reshape(3) + [0, 0, 0.9]
    ray_o = np.tile(center + [2.2, 0, 0], (P, 1)).astype(np.float32)
    tgt = center + rng.normal(0, 0.3, (P, 3))
    ray_d = (tgt - ray_o).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    lx, la = gen_light_xyz(2, 4, 10.0)
    ls = 1.0 / jnp.sqrt(la / np.pi)
    st_surf = STConfig.from_cfg(cfg.sphere_tracing)
    st_obj = STConfig.from_cfg({**dict(cfg.sphere_tracing),
                                **dict(cfg.obj_lvis)})
    rcfg = RelightRenderConfig(shadow_block=1024, distant_envmap=True)
    out = render_human_block(
        params, mcfg, ctx, jnp.asarray(ray_o), jnp.asarray(ray_d),
        jnp.full(P, 0.8), jnp.full(P, 4.0),
        jnp.full((2, 4, 3), 0.6), lx, la, ls, st_surf, st_obj, rcfg, False)
    return np.asarray(out.rgb_map, np.float32)


def test_golden_relight_render():
    img = _render()
    assert np.isfinite(img).all()
    if os.environ.get('RA_REGEN_GOLDEN') == '1' or not os.path.exists(GOLDEN):
        np.save(GOLDEN, img)
        pytest.skip('golden (re)generated')
    ref = np.load(GOLDEN)
    assert img.shape == ref.shape
    mse = float(((img - ref) ** 2).mean())
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 50.0, f"render drifted from golden: {psnr:.1f}dB"
