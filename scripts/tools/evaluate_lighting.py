"""Compare a learned environment map against ground-truth probes.

Mirrors the reference tool (``scripts/tools/evaluate_lighting.py``): loads
the trained relight checkpoint's env map, aligns global scale (relighting is
scale-ambiguous between light and albedo), reports per-probe MSE/PSNR.

Usage:
  python scripts/tools/evaluate_lighting.py -c configs/synthetic/tubeman.yaml \
      relighting True [--gt-dir data/lighting/16x32]
"""
from __future__ import annotations

import os
import sys
from os.path import dirname, join

sys.path.insert(0, dirname(dirname(dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    import cv2
    from relightableavatar_tpu.config import setup
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.factory import make_network

    gt_dir = None
    argv = sys.argv[1:]
    if '--gt-dir' in argv:
        i = argv.index('--gt-dir')
        gt_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    cfg, args = setup(argv)
    gt_dir = gt_dir or join(cfg.lighting_dir, f'{cfg.env_h}x{cfg.env_w}')

    params, mcfg = make_network(cfg)
    if 'env' not in params:
        print('no learned env map in this checkpoint (not a relight model)')
        return
    learned = np.asarray(anisdf.global_env_map(params, mcfg))
    learned = cv2.resize(learned, (cfg.env_w, cfg.env_h),
                         interpolation=cv2.INTER_AREA)

    if not os.path.isdir(gt_dir):
        print(f'no GT probes at {gt_dir}; learned env stats: '
              f'mean {learned.mean():.4f} max {learned.max():.4f}')
        return

    for f in sorted(os.listdir(gt_dir)):
        if not f.endswith('.hdr'):
            continue
        gt = cv2.imread(join(gt_dir, f), cv2.IMREAD_UNCHANGED)
        gt = cv2.cvtColor(gt.astype(np.float32), cv2.COLOR_BGR2RGB)
        gt = cv2.resize(gt, (cfg.env_w, cfg.env_h), interpolation=cv2.INTER_AREA)
        # scale-align (light/albedo ambiguity)
        s = float((learned * gt).sum() / np.clip((learned ** 2).sum(), 1e-8, None))
        mse = float(((s * learned - gt) ** 2).mean())
        psnr = -10 * np.log10(mse / max(gt.max(), 1e-8) ** 2 + 1e-12)
        print(f'{f}: scale {s:.3f} mse {mse:.5f} psnr(norm) {psnr:.2f}')


if __name__ == '__main__':
    main()
