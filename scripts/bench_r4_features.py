"""Round-4 feature validation on the real chip.

Measures the three round-4 perf features against their VERDICT r3 targets,
each with bench.py's error-bar timing protocol (median over >=3 warm reps):

1. ``tpu.frame_fuse`` (task 5, headline-frame stall): the accel + the
   recommended-40dB configs timed fused vs per-block, plus XLA
   cost-analysis HBM utilization of the fused executable.  Target:
   recommended frame <= 0.25 s/frame (from 0.325) or HBM util >= 40%.
2. ``tpu.volume_cull`` (task 8, exact volume path): novel_view_512 with
   cull K in {0, 16, 32} + live PSNR of culled-vs-exact over in-box rays.
   Target: <= 0.7 s/frame at >= 45 dB.
3. batched novel-light sweep (task 2 follow-through): the 8-light sweep
   with reshade_sweep_block.  Target: sweep <= 1.3 s, per-light <= 0.13 s.

Writes results/r4_features.json (merged per-row so a crashed run keeps
earlier rows) and prints each row as it lands.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (_accel_knobs, _rays, _setup, _time, _trow,
                   REFERENCE_SEC_PER_FRAME_512)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'results', 'r4_features.json')


def _write(row):
    rows = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows = json.load(f)
    rows = [r for r in rows if r['name'] != row['name']] + [row]
    with open(OUT, 'w') as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(row))


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 99.0 if mse == 0 else -10.0 * np.log10(mse)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', nargs='*', default=None,
                    help='subset: fuse, cull, sweep')
    args = ap.parse_args()
    want = lambda k: args.only is None or k in args.only

    import jax
    from relightableavatar_tpu.renderer.orchestrate import (
        NovelLightRenderer, SphereTracingRenderer)
    from relightableavatar_tpu.renderer.volume import VolumeRenderer
    from relightableavatar_tpu.utils.flops import (TPU_V5E_HBM_BW,
                                                   TPU_V5E_PEAK_BF16, hbm_util,
                                                   mfu)

    model, ctx, make_cfg, make_params = _setup()
    batch512, n512 = _rays(ctx, 512, 512)

    if want('fuse'):
        # headline accel + recommended-40dB (accel_no_downscale), each
        # per-block vs fused
        for label, downscale in (('accel', 2), ('rec40db', 1)):
            base = {}
            for fuse in (False, True):
                cfg = make_cfg(relight=True)
                cfg.n_samples = 3
                _accel_knobs(cfg, on=True)
                cfg.tpu.lvis_downscale = downscale
                cfg.tpu.frame_fuse = fuse
                params, mcfg = make_params(cfg, relight=True)
                r = SphereTracingRenderer(cfg, params, mcfg)
                st, out = _time(lambda: r.render(batch512))
                row = dict(name=f'relight_512_{label}_'
                                f'{"fused" if fuse else "perblock"}',
                           **_trow(st), fg_rays=n512,
                           vs_baseline=round(
                               REFERENCE_SEC_PER_FRAME_512 / st['median'], 2))
                if not fuse:
                    base[label] = st['median']
                else:
                    row['speedup_vs_perblock'] = round(
                        base[label] / st['median'], 3)
                    # cost analysis of the fused frame
                    r.collect_cost = True
                    out = r.render(batch512)
                    jax.block_until_ready(out['rgb_map'])
                    r.collect_cost = False
                    fc = r.last_frame_cost or {'flops': 0.0, 'bytes': 0.0}
                    row['mfu_pct'] = round(
                        mfu(fc['flops'], st['median'], TPU_V5E_PEAK_BF16), 2)
                    row['hbm_util_pct'] = round(
                        hbm_util(fc['bytes'], st['median'], TPU_V5E_HBM_BW), 2)
                _write(row)

    if want('cull'):
        exact_rgb = None
        for K in (0, 16, 32):
            cfg = make_cfg(relight=False)
            cfg.n_samples = 128
            cfg.tpu.volume_cull = K
            params, mcfg = make_params(cfg, relight=False)
            r = VolumeRenderer(cfg, params, mcfg)
            st, out = _time(lambda: r.render(batch512))
            row = dict(name=f'novel_view_512_cull{K}', **_trow(st),
                       fg_rays=n512,
                       rays_per_s=round(n512 / st['median']))
            rgb = np.asarray(out['rgb_map'])
            if K == 0:
                exact_rgb = rgb
                row['quality'] = 'exact (128-sample volume rendering)'
            else:
                row['psnr_vs_exact'] = round(_psnr(rgb, exact_rgb), 2)
                if row['psnr_vs_exact'] < 45.0:
                    # below the >=45 dB gate the bench quotes (VERDICT r4
                    # item 8): quotable only as a preview knob
                    row['quality'] = 'preview-only (below the 45 dB gate)'
            _write(row)

    if want('sweep'):
        cfg = make_cfg(relight=True)
        cfg.n_samples = 3
        _accel_knobs(cfg, on=True)
        cfg.test_light = ['gym_entrance', 'city_sky', 'sunset_road', 'studio',
                          'olat0000-0000', 'olat0000-0027', 'olat0002-0027',
                          'olat0006-0008']
        params, mcfg = make_params(cfg, relight=True)
        from relightableavatar_tpu.data.datasets import load_lighting
        b = dict(batch512)
        from relightableavatar_tpu.utils.dotdict import dotdict
        b = dotdict(b)
        b.novel_lights = load_lighting(cfg)
        n_lights = len(b.novel_lights)
        r = NovelLightRenderer(cfg, params, mcfg)
        st, out = _time(lambda: r.render(b))
        base_t = float(out.diff)
        _write(dict(name='relight_sweep_8light_batched', **_trow(st),
                    n_lights=n_lights, base_pass_s=round(base_t, 3),
                    per_light_reshade_s=round(
                        (st['min'] - base_t) / n_lights, 4),
                    fg_rays=n512,
                    vs_baseline=round(
                        n_lights * REFERENCE_SEC_PER_FRAME_512 / st['median'],
                        2)))


if __name__ == '__main__':
    main()
