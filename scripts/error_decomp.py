"""Decompose an eval render's PSNR loss into silhouette-band vs interior
vs exterior error (28 dB gate diagnosis, VERDICT r2 item 1).

A trained-from-images run that misses the gate can lose dB two very
different ways: geometry error (wrong silhouette / traced surface offset —
full-contrast pixel errors concentrated in a thin band around the GT mask
boundary) or appearance error (materials/shading misfit spread over the
interior).  This tool loads the saved eval renders
(``data/result/<task>/<exp>/rendering/frame*_view*.png``) and the dataset GT
(images + masks), and reports each region's contribution to total MSE so the
next training lever (stage-1 geometry sharpness vs stage-2 appearance
budget) is chosen from evidence.

CPU-only, no jax.  Usage:
    python scripts/error_decomp.py --exp tubeman_e2eB_relight --task relight
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--exp', default='tubeman_e2eB_relight')
    ap.add_argument('--task', default='relight', choices=['relight', 'deform'])
    ap.add_argument('--data', default='data/synthetic/tubeman')
    ap.add_argument('--band-px', type=int, default=5,
                    help='half-width of the silhouette band (dilate/erode '
                         'radius around the GT mask edge)')
    ap.add_argument('--out', default=None)
    a = ap.parse_args()

    rdir = f'data/result/{a.task}/{a.exp}/rendering'
    frames = sorted(glob.glob(os.path.join(rdir, 'frame*_view*.png')))
    if not frames:
        sys.exit(f'no renders under {rdir}')

    k = np.ones((2 * a.band_px + 1,) * 2, np.uint8)
    tot = {'band': 0.0, 'interior': 0.0, 'exterior': 0.0}
    npx = {'band': 0, 'interior': 0, 'exterior': 0}
    mse_all, rows = 0.0, []
    n_all = 0
    for fp in frames:
        m = re.match(r'frame(\d+)_view(\d+)', os.path.basename(fp))
        fi, vi = int(m.group(1)), int(m.group(2))
        pred = cv2.imread(fp).astype(np.float32) / 255.0
        gt_p = os.path.join(a.data, 'images', f'{vi:02d}', f'{fi:06d}.jpg')
        mk_p = os.path.join(a.data, 'mask', f'{vi:02d}', f'{fi:06d}.png')
        gt = cv2.imread(gt_p).astype(np.float32) / 255.0
        msk = (cv2.imread(mk_p, 0) > 127).astype(np.uint8)
        if gt.shape[:2] != pred.shape[:2]:   # eval may render at cfg.ratio
            gt = cv2.resize(gt, pred.shape[1::-1], interpolation=cv2.INTER_AREA)
            msk = cv2.resize(msk, pred.shape[1::-1],
                             interpolation=cv2.INTER_NEAREST)
        # the eval protocol scores inside the mask bbox; mirror that crop
        ys, xs = np.nonzero(msk)
        y0, y1, x0, x1 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
        pred, gt, msk = (z[y0:y1, x0:x1] for z in (pred, gt, msk))
        err = ((pred - gt) ** 2).mean(-1)
        dil, ero = cv2.dilate(msk, k), cv2.erode(msk, k)
        band = (dil > 0) & (ero == 0)
        interior = ero > 0
        exterior = dil == 0
        for name, sel in (('band', band), ('interior', interior),
                          ('exterior', exterior)):
            tot[name] += float(err[sel].sum())
            npx[name] += int(sel.sum())
        mse_all += float(err.sum())
        n_all += err.size
        rows.append({'frame': fi, 'view': vi,
                     'psnr': float(-10 * np.log10(err.mean() + 1e-12))})

    mse = mse_all / n_all
    rep = {
        'exp': a.exp, 'n_frames': len(frames), 'band_px': a.band_px,
        'psnr_cropped': float(-10 * np.log10(mse + 1e-12)),
        'per_frame': rows,
        'regions': {},
    }
    for name in tot:
        share = tot[name] / mse_all if mse_all else 0.0
        rep['regions'][name] = {
            'mse_share_pct': round(100 * share, 1),
            'px_share_pct': round(100 * npx[name] / n_all, 1),
            'rms_err': round(float(np.sqrt(tot[name] / max(npx[name], 1))), 4),
        }
    # the headline: PSNR if the silhouette band were rendered perfectly
    for name in tot:
        rest = (mse_all - tot[name]) / n_all
        rep[f'psnr_if_{name}_perfect'] = float(-10 * np.log10(rest + 1e-12))
    out = a.out or f'results/{a.exp.replace("_relight", "")}/error_decomp.json'
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, 'w') as f:
        json.dump(rep, f, indent=2)
    print(json.dumps(rep, indent=2))
    print(f'-> {out}')


if __name__ == '__main__':
    main()
