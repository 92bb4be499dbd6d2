"""Per-knob speed/quality splits for the shading-acceleration stack
(VERDICT r1 item 3): evaluate each lossy knob's dB cost and ms gain
separately against the same exact-render GT.

Renders the tubeman eval protocol (test split, real GT images) once per
knob configuration, timing frames (first frame excluded: compile) and
scoring PSNR/SSIM through the reference evaluator math.  Writes
``data/record/knob_splits.json``.

Run on the TPU:  python scripts/bench_quality.py [--frames 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

ACCEL = {'tpu.lvis_downscale': '2', 'tpu.shadow_grid': '96',
         'tpu.lvis_sweep': 'True', 'tpu.lvis_query_offset': '0.0',
         'tpu.distant_envmap': 'True'}

KNOBS = {
    # each knob toggled ON alone from the exact stack (marginal dB cost)
    'exact': {},
    'lvis_downscale2': {'tpu.lvis_downscale': '2'},
    'shadow_sweep96': {'tpu.shadow_grid': '96', 'tpu.lvis_sweep': 'True',
                       'tpu.lvis_query_offset': '0.0'},
    'distant_envmap': {'tpu.distant_envmap': 'True'},
    'full_accel': dict(ACCEL),
    # each knob toggled OFF from the accel stack (VERDICT r2 item 2 —
    # marginal ms gain / dB cost at the accel operating point)
    'accel_no_downscale': {**ACCEL, 'tpu.lvis_downscale': '1'},
    'accel_grid128': {**ACCEL, 'tpu.shadow_grid': '128'},
    'accel_no_sweep': {k: v for k, v in ACCEL.items()
                       if k != 'tpu.lvis_query_offset'} | {
                           'tpu.lvis_sweep': 'False'},
    'accel_no_distant': {**ACCEL, 'tpu.distant_envmap': 'False'},
    # candidate >=40 dB operating points between exact (42.77 dB) and
    # full_accel (37.36 dB)
    'op_sweep_only': {'tpu.shadow_grid': '128', 'tpu.lvis_sweep': 'True',
                      'tpu.lvis_query_offset': '0.0',
                      'tpu.distant_envmap': 'True'},
    'op_grid192': {**ACCEL, 'tpu.shadow_grid': '192',
                   'tpu.lvis_downscale': '1'},
}


def run_one(name: str, opts: dict, frames: int):
    import jax
    from relightableavatar_tpu.config import default_cfg, make_parser, update_cfg
    from relightableavatar_tpu.data.datasets import make_data_loader
    from relightableavatar_tpu.models.factory import (make_evaluator,
                                                      make_network,
                                                      make_renderer)
    argv = ['-t', 'evaluate', '-c', 'configs/synthetic/tubeman.yaml',
            'relighting', 'True',
            'test.frame_sampler_interval', str(max(30 // frames, 1))]
    for k, v in opts.items():
        argv += [k, v]
    cfg = default_cfg()
    update_cfg(cfg, make_parser().parse_args(argv))
    cfg.result_dir = os.path.join('data/result/knobs', name)

    params, mcfg = make_network(cfg)
    renderer = make_renderer(cfg, params, mcfg)
    evaluator = make_evaluator(cfg)
    loader = make_data_loader(cfg, is_train=False)
    times = []
    for i, batch in enumerate(loader):
        t0 = time.perf_counter()
        out = renderer.render(batch)
        jax.block_until_ready(out.rgb_map)
        times.append(time.perf_counter() - t0)
        evaluator.evaluate(out, batch)
    m = evaluator.summarize()
    sec = (sum(times[1:]) / max(len(times) - 1, 1)) if len(times) > 1 else times[0]
    return dict(name=name, opts=opts, sec_per_frame=round(sec, 3),
                psnr=round(m.get('psnr', 0), 2),
                ssim=round(m.get('ssim', 0), 5),
                frames=len(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=3)
    ap.add_argument('--only', default='')
    a = ap.parse_args()
    rows = []
    for name, opts in KNOBS.items():
        if a.only and name != a.only:
            continue
        print(f'[knobs] {name} ...', flush=True)
        try:
            rows.append(run_one(name, opts, a.frames))
        except Exception as e:  # e.g. op_grid192 OOMs the 16G chip — keep
            # the measured rows; a lost config must not lose the run
            print(f'[knobs] {name} FAILED: {type(e).__name__}: {e}',
                  flush=True)
            continue
        print(f'[knobs] {rows[-1]}', flush=True)
        _write(rows, a.only)  # incremental: a later crash keeps these


def _write(rows, only):
    # tracked copy: bench.py reads this for its per-knob quality labels and
    # to pick the >=40 dB recommended operating point.  Always merge with the
    # existing file: the incremental write fires after every config, and a
    # full-matrix run that crashes midway must never replace the committed
    # results with the partial subset measured so far (ADVICE r3).
    del only
    for out in (os.path.join(REPO, 'data/record/knob_splits.json'),
                os.path.join(REPO, 'results/knob_splits_r3.json')):
        os.makedirs(os.path.dirname(out), exist_ok=True)
        prev = {}
        if os.path.exists(out):
            with open(out) as f:
                prev = {r['name']: r for r in json.load(f)}
        prev.update({r['name']: r for r in rows})
        with open(out, 'w') as f:
            json.dump(list(prev.values()), f, indent=2)


if __name__ == '__main__':
    main()
