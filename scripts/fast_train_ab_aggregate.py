"""Aggregate an already-run fast-train A/B into results/fast_train_ab_r5.json.

The chained driver (scripts/fast_train_ab.py) died when its fast arm's
tunnel RPC hung and the arm was finished by hand; this re-reads both arms'
logs + eval metrics and writes the exact same results file + verdict label
(shared code imported from the driver).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import fast_train_ab as ab


def main():
    rows = []
    for arm, extra in ab.ARMS.items():
        exp = f'tubeman_ab_{arm}'
        log = os.path.join(ab.REPO, 'data/record/fast_train_ab',
                           f'train_{arm}.log')
        m = ab.read_metrics(f'data/result/deform/{exp}')
        rows.append(dict(arm=arm, start_epoch=320, end_epoch=360,
                         opts=extra, sec_per_it=ab.sec_per_it(log),
                         **{k: round(v, 4) for k, v in m.items()}))
        print(rows[-1])

    out = dict(rows=rows, note=(
        'fast arm finished by hand after a hung tunnel RPC killed the '
        'chained driver at ep351; resumed from its own latest.npz '
        '(bit-exact resume), identical config'))
    by = {r['arm']: r for r in rows}
    d = by['fast']['psnr'] - by['f32']['psnr']
    speed = (by['f32']['sec_per_it'] / by['fast']['sec_per_it']
             if by['fast'].get('sec_per_it') and by['f32'].get('sec_per_it')
             else None)
    out['psnr_delta_fast_minus_f32'] = round(d, 4)
    out['speedup'] = round(speed, 2) if speed else None
    sp_txt = f'{speed:.2f}x faster' if speed else 'speedup unmeasured'
    if abs(d) <= 0.1:
        out['verdict_label'] = (
            f'eval-parity VALIDATED: 40-epoch A/B from the same ep320 '
            f'checkpoint, volume-eval delta {d:+.3f} dB '
            f'(f32 {by["f32"]["psnr"]:.2f} vs fast {by["fast"]["psnr"]:.2f}), '
            f'{sp_txt} (results/fast_train_ab_r5.json)')
    else:
        out['verdict_label'] = (
            f'NOT eval-parity: {d:+.3f} dB vs f32 over a 40-epoch A/B '
            f'(f32 {by["f32"]["psnr"]:.2f} vs fast {by["fast"]["psnr"]:.2f}); '
            f'fast step is a labeled lossy knob '
            f'(results/fast_train_ab_r5.json)')
    path = os.path.join(ab.REPO, 'results/fast_train_ab_r5.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=2)
    print(f'-> {path}\n{json.dumps(out, indent=2)}')


if __name__ == '__main__':
    main()
