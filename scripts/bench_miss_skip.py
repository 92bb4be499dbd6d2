"""Measure the camera-trace miss skip (tracing.py sphere_trace_miss_skip;
VERDICT r4 item 3 lever) on the headline 512x512 relight frame.

For the accel and recommended-40dB stacks: time with the skip off/on and
assert pixel parity (the skip is provably exact — survivors trace from
their original near, skipped rays are guaranteed clean misses).  Writes
``results/miss_skip_r5.json``.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)


def main():
    import bench
    from relightableavatar_tpu.renderer.orchestrate import SphereTracingRenderer
    from relightableavatar_tpu.utils.preempt import preempt_training
    if preempt_training():
        print("# preempted an in-flight training run")

    model, ctx, make_cfg, make_params = bench._setup()
    batch, n = bench._rays(ctx, 512, 512)
    rows = []

    def stack_cfg(name):
        cfg = make_cfg(relight=True)
        cfg.n_samples = 3
        if name == 'accel':
            bench._accel_knobs(cfg, on=True)
        else:                               # rec40db operating point
            bench._accel_knobs(cfg, on=False)
            labels = bench._knob_quality_labels()
            cands = [(nm, m) for nm, m in labels.items()
                     if m.get('psnr', 0) >= 40.0 and nm != 'exact'
                     and m.get('opts')]
            op_name, op_m = min(cands, key=lambda t: t[1]['sec_per_frame'])
            def _parse(v):
                if v in ('True', 'False'):
                    return v == 'True'
                try:
                    return int(v)
                except ValueError:
                    return float(v)
            for k, v in op_m['opts'].items():
                cfg.tpu[k[4:]] = _parse(v)
        return cfg

    for stack in ('accel', 'rec40db'):
        outs = {}
        for skip in (False, True):
            cfg = stack_cfg(stack)
            if skip and int(cfg.tpu.shadow_grid) == 0:
                # forcing a grid on would change shadow rendering and make
                # the on/off comparison cross two different stacks
                print(f'# {stack}: no baked grid in base config — '
                      'skip row omitted')
                break
            cfg.tpu.surf_miss_skip = skip
            params, mcfg = make_params(cfg, relight=True)
            r = SphereTracingRenderer(cfg, params, mcfg)
            st, out = bench._time(lambda: r.render(batch))
            outs[skip] = np.asarray(out['rgb_map'])
            rows.append(dict(name=f'{stack}_skip{int(skip)}',
                             **bench._trow(st), fg_rays=n))
            print(rows[-1], flush=True)
        rows.append(dict(name=f'{stack}_parity_psnr_on_vs_off',
                         psnr=round(psnr(outs[True], outs[False]), 2)))
        print(rows[-1], flush=True)

    path = os.path.join(os.path.dirname(__file__), '..',
                        'results', 'miss_skip_r5.json')
    with open(path, 'w') as f:
        json.dump(rows, f, indent=1)
    print(f'-> results/miss_skip_r5.json')


if __name__ == '__main__':
    main()
