"""Component-level timing of the relight pipeline on the current backend.

Times the bench.py workload under ablations that peel off pipeline stages:
  trace_only     surface sphere trace + 3-sample band net forward (relighting off)
  no_visibility  + microfacet shading, but no shadow-ray tracing
  full           + DFSS light visibility (the complete pipeline)

Run from the repo root: python scripts/tools/profile_relight.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def build(cfg_edit=None):
    import jax
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
    cfg.tpu.lvis_downscale = 2
    cfg.tpu.distant_envmap = True
    if cfg_edit:
        cfg_edit(cfg)
    mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=8, bf16=True)
    params = load_params(anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg),
                         "fixtures/synthetic_avatar_params.npz")
    cams = synthetic.make_cameras(4, H=H, W=W)
    K, R, T = cams["K"][0], cams["R"][0], cams["T"][0] / 1000.0
    ray_o, ray_d = get_rays(H, W, K, R, T)
    wb = np.asarray(ctx["wbounds"])
    near, far, mab = get_full_near_far(wb, ray_o.reshape(-1, 3),
                                       ray_d.reshape(-1, 3))
    batch = dotdict(ray_o=ray_o.reshape(-1, 3)[mab],
                    ray_d=ray_d.reshape(-1, 3)[mab],
                    near=near[mab], far=far[mab], ctx=ctx)
    return SphereTracingRenderer(cfg, params, mcfg), batch, int(mab.sum())


def bench_one(name, cfg_edit=None, reps=3):
    import jax
    renderer, batch, n = build(cfg_edit)
    out = renderer.render(batch)
    jax.block_until_ready(out.rgb_map)
    np.asarray(out.rgb_map)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = renderer.render(batch)
        jax.block_until_ready(out.rgb_map)
        np.asarray(out.rgb_map)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{name:16s} {dt * 1e3:8.1f} ms   ({n / dt:,.0f} rays/s)")
    return dt


def bench_quality(name, cfg_edit, ref_img, reps=3):
    """Time a variant AND report PSNR of its render vs the reference image."""
    import jax
    renderer, batch, n = build(cfg_edit)
    out = renderer.render(batch)
    jax.block_until_ready(out.rgb_map)
    img = np.asarray(out.rgb_map, np.float32)
    mse = float(((img - ref_img) ** 2).mean())
    psnr = -10 * np.log10(mse + 1e-12)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = renderer.render(batch)
        jax.block_until_ready(out.rgb_map)
        np.asarray(out.rgb_map)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{name:24s} {dt * 1e3:8.1f} ms   ({n / dt:,.0f} rays/s)  "
          f"{psnr:5.1f} dB vs exact")
    return dt, psnr


def main():
    import jax

    def _trace_only(cfg):
        cfg.relighting = False

    def _no_vis(cfg):
        cfg.no_visibility = True

    if "--quality" in sys.argv:
        # reference render: exact HDQ shadows at the reference's own budget
        renderer, batch, _ = build()
        ref = np.asarray(renderer.render(batch).rgb_map, np.float32)
        del renderer
        for name, edit in [
            ("compact=0.5", lambda c: c.tpu.update(shadow_compact=0.5)),
            ("compact=0.25", lambda c: c.tpu.update(shadow_compact=0.25)),
            ("compact=0.125", lambda c: c.tpu.update(shadow_compact=0.125)),
            ("knn=grouped", lambda c: c.tpu.update(knn_impl='grouped')),
            ("compact=.25+grouped", lambda c: c.tpu.update(
                shadow_compact=0.25, knn_impl='grouped')),
        ]:
            bench_quality(name, edit, ref)
        return

    t_full = bench_one("full")
    t_novis = bench_one("no_visibility", _no_vis)
    t_trace = bench_one("trace_only", _trace_only)
    print(f"\nbreakdown: trace+net {t_trace * 1e3:.0f} ms | "
          f"shading {max(t_novis - t_trace, 0) * 1e3:.0f} ms | "
          f"light visibility {max(t_full - t_novis, 0) * 1e3:.0f} ms")


if __name__ == "__main__":
    main()
