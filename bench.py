"""Benchmark: relight rendering throughput on one chip.

Measures the BASELINE.md north-star — foreground rays/sec through the FULL
relight pipeline (HDQ sphere tracing surface pass, 512-texel DFSS shadow
tracing, microfacet shading) at 512x512 on the synthetic flagship avatar.

Baseline: the reference's own code comment records "2 and a half minutes to
render an 1024 x 1024 image" with env visibility on a CUDA GPU
(lib/config/config.py:127,135).  Frame time scales with pixel count (both
implementations only process in-bbox rays), so the 512x512 reference baseline
is 150 / 4 = 37.5 s/frame.  vs_baseline = reference_time / our_time.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_SEC_PER_FRAME_512 = 150.0 / 4  # reference comment scaled to 512x512


def main():
    import jax
    import jax.numpy as jnp
    from relightableavatar_tpu.config import default_cfg
    from relightableavatar_tpu.data.rays import get_full_near_far, get_rays
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.renderer.orchestrate import SphereTracingRenderer
    from relightableavatar_tpu.smpl import synthetic
    from relightableavatar_tpu.smpl.body_model import BodyModel
    from relightableavatar_tpu.train.checkpoints import load_params
    from relightableavatar_tpu.utils.dotdict import dotdict

    H = W = 512

    model = BodyModel("fixtures/synthetic_body.npz")
    motion = dict(np.load("fixtures/synthetic_motion.npz"))
    shapes = motion["shapes"][0]
    tverts, tjoints, big_A, _ = make_bigpose(model, shapes)
    ctx = make_frame_context(model, tverts, tjoints, big_A,
                             motion["poses"][0], motion["Rh"][0],
                             motion["Th"][0], shapes)

    cfg = default_cfg()
    cfg.n_bones = model.n_bones
    cfg.cond_dim = model.n_bones * 3
    cfg.relighting = True
    cfg.n_samples = 3
    cfg.dist_th = 0.125
    cfg.obj_lvis.dist_th = 0.125
    cfg.tpu.ray_block = 8192
    # shading accelerations: coarse-visibility MXU upsample (2.1x),
    # slice-sweep DFSS shadow volume on a per-frame SDF voxel cache
    # (ops/lvis_sweep.py, 2.3x), texel-center distant lights (2.35x).
    # Honest quality gate against exact-render GT: this full stack
    # measures 37.36 dB PSNR / 0.9962 SSIM; the all-exact stack floor is
    # 42.77 dB (JPG+protocol limit) — the 5.4 dB gap is the combined
    # cost of the four knobs.  Render-vs-render gates (32.3 dB for the
    # visibility upsample, 34.7 dB for the sweep) remain valid.
    cfg.tpu.lvis_downscale = 2
    cfg.tpu.shadow_grid = 96
    cfg.tpu.lvis_sweep = True
    cfg.tpu.lvis_query_offset = 0.0
    # texel-center distant-light shading (the textbook env-light
    # discretization): 74.6dB vs per-direction resampling, avoids the
    # (P*L, H*W) one-hot gather lowering — 2.35x frame speedup
    cfg.tpu.distant_envmap = True
    # camera trace stays EXACT (16 HDQ iterations).  The cache pre-march
    # (tpu.surf_grid_iters) buys ~50 ms/frame but erodes silhouettes:
    # against exact-render GT it measures 31.77 dB (20 pre-march + 4 exact)
    # vs 37.36 dB for the exact tracer with identical shading accelerations
    # — a real quality knob, off for the headline number.  (An earlier
    # "faster AND better" readout was an artifact of evaluating against
    # missing GT images — the dataset's zero-image fallback rewards
    # emptier renders; the evaluator now refuses to score black GT.)
    cfg.tpu.surf_grid_iters = 0
    cfg.tpu.surf_exact_iters = 0
    mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=8, bf16=True)
    params = load_params(anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg),
                         "fixtures/synthetic_avatar_params.npz")

    cams = synthetic.make_cameras(4, H=H, W=W)
    K, R, T = cams["K"][0], cams["R"][0], cams["T"][0] / 1000.0
    ray_o, ray_d = get_rays(H, W, K, R, T)
    wb = np.asarray(ctx["wbounds"])
    near, far, mab = get_full_near_far(wb, ray_o.reshape(-1, 3),
                                       ray_d.reshape(-1, 3))
    sel = mab
    batch = dotdict(ray_o=ray_o.reshape(-1, 3)[sel],
                    ray_d=ray_d.reshape(-1, 3)[sel],
                    near=near[sel], far=far[sel], ctx=ctx)
    n_rays = int(sel.sum())

    renderer = SphereTracingRenderer(cfg, params, mcfg)
    out = renderer.render(batch)             # compile
    jax.block_until_ready(out.rgb_map)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = renderer.render(batch)
        jax.block_until_ready(out.rgb_map)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rays_per_s = n_rays / dt

    print(json.dumps({
        "metric": "relight_sec_per_frame_512",
        "value": round(dt, 3),
        "unit": f"s/frame (512x512 full relight; {n_rays} fg rays, {rays_per_s:.0f} rays/s)",
        "vs_baseline": round(REFERENCE_SEC_PER_FRAME_512 / dt, 2),
    }))


if __name__ == "__main__":
    main()
