"""Quality-validate the hash-encoder path (VERDICT r2 item 7): train tubeman
stage 1 twice with an identical budget — once with the positional encoding
(reference default, ``e_type='pe'``) and once with the multires hash grid
(``e_type='hash'``, reference embedder.py:40-224, dormant there) — then eval
both on the test split and write the side-by-side to
``results/hash_vs_pe_r3.json``.

Usage (TPU, ~1 h at the defaults):
    python scripts/hash_vs_pe.py [--epochs 30] [--ratio 0.5]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = 'configs/synthetic/tubeman.yaml'


def run(args_list, log_name):
    out_dir = os.path.join(REPO, 'data/record/hash_vs_pe')
    os.makedirs(out_dir, exist_ok=True)
    log_path = os.path.join(out_dir, log_name + '.log')
    print(f'[hvp] {" ".join(args_list)}\n      -> {log_path}', flush=True)
    t0 = time.time()
    with open(log_path, 'w') as f:
        p = subprocess.run([sys.executable] + args_list, cwd=REPO,
                           stdout=f, stderr=subprocess.STDOUT)
    if p.returncode != 0:
        print(open(log_path).read()[-3000:])
        raise SystemExit(f'[hvp] {log_name} FAILED')
    return time.time() - t0, log_path


def sec_per_it(log_path):
    """Median of the trainer's printed s/it over the last 50 log lines."""
    vals = [float(m.group(1)) for line in open(log_path)
            for m in [re.search(r'(\d+\.\d+)s/it', line)] if m]
    vals = vals[len(vals) // 2:]
    vals.sort()
    return vals[len(vals) // 2] if vals else None


def read_metrics(result_dir):
    import numpy as np
    path = os.path.join(REPO, result_dir, 'metrics.npy')
    m = np.load(path, allow_pickle=True).item()
    return {k: (float(np.mean(v)) if np.ndim(v) else float(v))
            for k, v in m.items() if k != 'frames'}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=30)
    ap.add_argument('--ratio', default='0.5')
    ap.add_argument('--n-samples', type=int, default=64)
    ap.add_argument('--only', default='', choices=['', 'pe', 'hash'])
    a = ap.parse_args()

    sys.path.insert(0, REPO)
    from relightableavatar_tpu.utils.preempt import register_training_group
    register_training_group()

    rows = []
    for enc in ('pe', 'hash'):
        if a.only and enc != a.only:
            continue
        exp = f'tubeman_hvp_{enc}'
        dt, log_path = run(
            ['train.py', '-c', CFG, 'exp_name', exp, 'resume', 'False',
             'e_type', enc, 'train.epoch', str(a.epochs),
             'train.scheduler.decay_epochs', str(a.epochs),
             'n_samples', str(a.n_samples), 'ratio', a.ratio,
             'eval_ep', '999', 'save_ep', str(a.epochs)],
            f'train_{enc}')
        run(['run.py', '-t', 'evaluate', '-c', CFG, 'exp_name', exp,
             'e_type', enc], f'eval_{enc}')
        m = read_metrics(f'data/result/deform/{exp}')
        rows.append(dict(encoder=enc, epochs=a.epochs, ratio=a.ratio,
                         n_samples=a.n_samples, train_s=round(dt, 1),
                         sec_per_it=sec_per_it(log_path),
                         **{k: round(v, 4) for k, v in m.items()}))
        print(f'[hvp] {rows[-1]}', flush=True)

    out = os.path.join(REPO, 'results/hash_vs_pe_r3.json')
    # merge keyed by the full run configuration (ADVICE r4: encoder+epochs
    # alone silently overwrote a row run at a different ratio/n_samples):
    # a new run at a different budget (or a re-run of one encoder) must
    # never drop the other committed rows
    key = lambda r: (r['encoder'], r['epochs'],
                     str(r.get('ratio', '0.5')), r.get('n_samples', 64))
    prev = {}
    if os.path.exists(out):
        with open(out) as f:
            prev = {key(r): r for r in json.load(f)}
    prev.update({key(r): r for r in rows})
    with open(out, 'w') as f:
        json.dump(list(prev.values()), f, indent=2)
    print(f'[hvp] -> {out}')


if __name__ == '__main__':
    main()
