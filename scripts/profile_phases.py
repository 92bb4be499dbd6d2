"""Phase-split profiling of the relight frame (bench.py geometry).

Times the full pipeline against ablated variants to attribute frame time:
  - full           : surface trace + DFSS shadows + shading
  - no_visibility  : surface trace + shading (no shadow rays)
  - check_bound_sdf: surface trace only (early exit)
Prints a small table; use to decide where optimization effort goes.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(cfg_mut=None):
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
    if cfg_mut:
        cfg_mut(cfg)
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
    renderer = SphereTracingRenderer(cfg, params, mcfg)
    return renderer, batch, int(sel.sum())


def timeit(renderer, batch, reps=3):
    import jax
    out = renderer.render(batch)
    jax.block_until_ready(out.rgb_map)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = renderer.render(batch)
        jax.block_until_ready(out.rgb_map)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_cfg(c):
    """The bench.py performance configuration (SDF cache + sweep DFSS +
    conservative camera pre-march)."""
    c.tpu.shadow_grid = 96
    c.tpu.lvis_sweep = True
    c.tpu.lvis_query_offset = 0.0
    c.tpu.surf_grid_iters = 20
    c.tpu.surf_exact_iters = 4


def rec40_cfg(c):
    """The recommended >=40 dB operating point (knob_splits_r3: accel stack
    with lvis_downscale=1)."""
    bench_cfg(c)
    c.tpu.lvis_downscale = 1


def main():
    import argparse
    import json
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='results/frame_phases_r4.json')
    a = ap.parse_args()

    results = {}
    for label, base in (('accel', bench_cfg), ('rec40db', rec40_cfg)):
        rows = []
        r, b, n = build(base)
        rows.append(("full", timeit(r, b)))

        def no_vis(c, base=base):
            base(c)
            c.no_visibility = True
        r, b, _ = build(no_vis)
        rows.append(("no_visibility (trace+shade)", timeit(r, b)))

        def only_trace(c, base=base):
            base(c)
            c.check_bound_sdf = True
        r, b, _ = build(only_trace)
        rows.append(("check_bound_sdf (trace only)", timeit(r, b)))

        full = rows[0][1]
        print(f"\n== {label}: fg rays {n}")
        for name, t in rows:
            print(f"{name:32s} {t*1000:8.1f} ms  ({t/full*100:5.1f}% of full)")
        vis = rows[0][1] - rows[1][1]
        shade = rows[1][1] - rows[2][1]
        print(f"{'vis pass (full - no_vis)':32s} {vis*1000:8.1f} ms")
        print(f"{'shade+band (no_vis - trace)':32s} {shade*1000:8.1f} ms")
        results[label] = dict(
            fg_rays=n, **{k: round(v, 4) for k, v in rows},
            vis_pass_s=round(vis, 4), shade_band_s=round(shade, 4))

    r, b, _ = build()
    results['exact_shadows_s'] = round(timeit(r, b), 4)
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, 'w') as f:
        json.dump(results, f, indent=2)
    print(f"\n-> {a.out}")


if __name__ == "__main__":
    main()
