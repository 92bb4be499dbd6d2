"""Assemble annots.npy from per-camera calibration files.

Mirrors the reference tool (``scripts/tools/prepare_annots.py``): collects
K/R/T/D per camera (from intri/extri yml-style npz or plain npz per camera)
and the per-frame image lists into the annots.npy layout the datasets read.

Usage:
  python scripts/tools/prepare_annots.py --root data/my_capture \
      [--calib calibration.npz] [--images images]
Calibration npz keys: K (V,3,3), R (V,3,3), T (V,3,1) in mm, D (V,5,1).
"""
from __future__ import annotations

import argparse
import os
import sys
from os.path import dirname, join

sys.path.insert(0, dirname(dirname(dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', required=True)
    ap.add_argument('--calib', default='calibration.npz')
    ap.add_argument('--images', default='images')
    args = ap.parse_args()

    with np.load(join(args.root, args.calib)) as f:
        cams = dict(K=list(f['K'].astype(np.float32)),
                    R=list(f['R'].astype(np.float32)),
                    T=list(f['T'].astype(np.float32)),
                    D=list(f.get('D', np.zeros((len(f['K']), 5, 1))).astype(np.float32)))

    img_root = join(args.root, args.images)
    views = sorted(d for d in os.listdir(img_root)
                   if os.path.isdir(join(img_root, d)))
    frames = sorted(os.path.splitext(f)[0]
                    for f in os.listdir(join(img_root, views[0]))
                    if f.endswith(('.jpg', '.png')))
    ims = [dict(ims=[f'{args.images}/{v}/{fr}.jpg' for v in views])
           for fr in frames]
    np.save(join(args.root, 'annots.npy'), dict(cams=cams, ims=ims),
            allow_pickle=True)
    print(f'wrote annots.npy: {len(views)} views x {len(frames)} frames')


if __name__ == '__main__':
    main()
