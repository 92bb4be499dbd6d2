"""Eval-parity A/B of the fast train step (VERDICT r4 item 4).

Round 4 advertised bf16 activations + 8192-sample grad chunks as "validated"
on a 2-epoch loss-curve check that actually showed a 0.7 dB train-PSNR gap,
and the one long run using it (run E) regressed the volume eval — but that
run confounded the fast step with ``edge_sample_ratio 0.3``.  This script
isolates the step: TWO stage-1 extensions of ``--epochs-ext`` epochs from
the SAME committed checkpoint (results/tubeman_e2eC/live/stage1_latest.npz,
epoch 320), identical in every config knob except the step
(f32-default vs ``tpu.bf16_act True tpu.grad_sample_budget 8192``,
``edge_sample_ratio`` 0 in both), then the stage-1 volume eval on each.

Writes ``results/fast_train_ab_r5.json`` with both arms' eval metrics,
measured sec/it, and a ``verdict_label`` that bench.py quotes on its
``train_step_stage1_fast`` row (parity claimed only if the eval delta is
within ``--parity-db``).  Reference trains f32 end-to-end (environment.yml).

Usage (TPU, ~1 h): setsid python scripts/fast_train_ab.py
"""
from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = 'configs/synthetic/tubeman.yaml'
SRC_CKPT = 'results/tubeman_e2eC/live/stage1_latest.npz'
SRC_SCALARS = 'results/tubeman_e2eC/live/stage1_scalars.jsonl'

ARMS = {
    'f32': [],
    'fast': ['tpu.bf16_act', 'True', 'tpu.grad_sample_budget', '8192'],
}


def run(args_list, log_name):
    out_dir = os.path.join(REPO, 'data/record/fast_train_ab')
    os.makedirs(out_dir, exist_ok=True)
    log_path = os.path.join(out_dir, log_name + '.log')
    print(f'[ab] {" ".join(args_list)}\n     -> {log_path}', flush=True)
    t0 = time.time()
    with open(log_path, 'w') as f:
        p = subprocess.run([sys.executable] + args_list, cwd=REPO,
                           stdout=f, stderr=subprocess.STDOUT)
    if p.returncode != 0:
        print(open(log_path).read()[-3000:])
        raise SystemExit(f'[ab] {log_name} FAILED')
    return time.time() - t0, log_path


def sec_per_it(log_path):
    vals = [float(m.group(1)) for line in open(log_path)
            for m in [re.search(r'(\d+\.\d+)s/it', line)] if m]
    vals = vals[len(vals) // 2:]
    vals.sort()
    return vals[len(vals) // 2] if vals else None


def read_metrics(result_dir):
    import numpy as np
    m = np.load(os.path.join(REPO, result_dir, 'metrics.npy'),
                allow_pickle=True).item()
    return {k: (float(np.mean(v)) if np.ndim(v) else float(v))
            for k, v in m.items() if k != 'frames'}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs-ext', type=int, default=40)
    ap.add_argument('--parity-db', type=float, default=0.1,
                    help='max |eval PSNR delta| to still call it parity')
    ap.add_argument('--only', default='', choices=['', 'f32', 'fast'])
    a = ap.parse_args()

    sys.path.insert(0, REPO)
    from relightableavatar_tpu.utils.preempt import register_training_group
    register_training_group()

    import numpy as np
    with np.load(os.path.join(REPO, SRC_CKPT), allow_pickle=True) as z:
        ep0 = int(z['epoch'])
    target = ep0 + a.epochs_ext
    print(f'[ab] common start: {SRC_CKPT} (epoch {ep0}) -> {target}')

    rows = []
    for arm, extra in ARMS.items():
        if a.only and arm != a.only:
            continue
        exp = f'tubeman_ab_{arm}'
        for src, dst in ((SRC_CKPT, f'data/trained_model/deform/{exp}/latest.npz'),
                         (SRC_SCALARS, f'data/record/deform/{exp}/scalars.jsonl')):
            dstp = os.path.join(REPO, dst)
            os.makedirs(os.path.dirname(dstp), exist_ok=True)
            shutil.copy(os.path.join(REPO, src), dstp)
        dt, log_path = run(
            ['train.py', '-c', CFG, 'exp_name', exp, 'resume', 'True',
             'train.epoch', str(target),
             'train.scheduler.decay_epochs', str(target),
             'n_samples', '128', 'ratio', '1.0', 'edge_sample_ratio', '0.',
             'eval_ep', '999', 'save_ep', str(a.epochs_ext)] + extra,
            f'train_{arm}')
        run(['run.py', '-t', 'evaluate', '-c', CFG, 'exp_name', exp],
            f'eval_{arm}')
        m = read_metrics(f'data/result/deform/{exp}')
        rows.append(dict(arm=arm, start_epoch=ep0, end_epoch=target,
                         opts=extra, train_s=round(dt, 1),
                         sec_per_it=sec_per_it(log_path),
                         **{k: round(v, 4) for k, v in m.items()}))
        print(f'[ab] {rows[-1]}', flush=True)

    out = dict(rows=rows)
    by = {r['arm']: r for r in rows}
    if 'f32' in by and 'fast' in by:
        d = by['fast']['psnr'] - by['f32']['psnr']
        speed = (by['f32']['sec_per_it'] / by['fast']['sec_per_it']
                 if by['fast'].get('sec_per_it')
                 and by['f32'].get('sec_per_it') else None)
        out['psnr_delta_fast_minus_f32'] = round(d, 4)
        out['speedup'] = round(speed, 2) if speed else None
        sp_txt = f'{speed:.2f}x faster' if speed else 'speedup unmeasured'
        if abs(d) <= a.parity_db:
            out['verdict_label'] = (
                f'eval-parity VALIDATED: {a.epochs_ext}-epoch A/B from the '
                f'same ep{ep0} checkpoint, volume-eval delta {d:+.3f} dB '
                f'(f32 {by["f32"]["psnr"]:.2f} vs fast {by["fast"]["psnr"]:.2f}), '
                f'{sp_txt} (results/fast_train_ab_r5.json)')
        else:
            out['verdict_label'] = (
                f'NOT eval-parity: {d:+.3f} dB vs f32 over a {a.epochs_ext}-'
                f'epoch A/B (f32 {by["f32"]["psnr"]:.2f} vs fast '
                f'{by["fast"]["psnr"]:.2f}); fast step is a labeled lossy '
                f'knob (results/fast_train_ab_r5.json)')
    path = os.path.join(REPO, 'results/fast_train_ab_r5.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(f'[ab] -> {path}\n{json.dumps(out, indent=2)}')


if __name__ == '__main__':
    main()
