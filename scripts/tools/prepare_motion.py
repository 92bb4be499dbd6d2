"""Convert motion capture formats into the framework's motion.npz schema.

Mirrors the reference tool (``scripts/tools/prepare_motion.py``): the output
schema is poses (N, n_bones*3), Rh (N, 3), Th (N, 3), shapes (N, n_shapes)
(reference :219-223).  Loaders: easymocap-style per-frame json/npz dumps,
a flat npz with the same keys, and AMASS-style npz (poses as (N, 156)
axis-angle with trans).

Usage:
  python scripts/tools/prepare_motion.py --input motion_src --output data/xxx/motion.npz \
      --format {auto,npz,amass,easymocap} [--n-bones 52]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from os.path import dirname, exists, isdir, join

sys.path.insert(0, dirname(dirname(dirname(os.path.abspath(__file__)))))

import numpy as np


def load_npz(path: str, n_bones: int):
    with np.load(path, allow_pickle=True) as f:
        poses = np.asarray(f['poses'], np.float32)
        Rh = np.asarray(f.get('Rh', np.zeros((len(poses), 3))), np.float32)
        Th = np.asarray(f.get('Th', f.get('trans', np.zeros((len(poses), 3)))), np.float32)
        shapes = np.asarray(f.get('shapes', f.get('betas', np.zeros((1, 10)))), np.float32)
    return poses, Rh, Th, shapes


def load_amass(path: str, n_bones: int):
    """AMASS-style: poses (N, >=66) with root orient in the first 3 dims."""
    with np.load(path, allow_pickle=True) as f:
        full = np.asarray(f['poses'], np.float32)
        trans = np.asarray(f.get('trans', np.zeros((len(full), 3))), np.float32)
        betas = np.asarray(f.get('betas', np.zeros(10)), np.float32)
    Rh = full[:, :3]
    body = full[:, 3:3 + (n_bones - 1) * 3]
    poses = np.concatenate([np.zeros((len(full), 3), np.float32), body], axis=1)
    shapes = np.tile(betas[None, :10], (len(full), 1))
    return poses, Rh, trans, shapes


def load_easymocap(path: str, n_bones: int):
    """Directory of per-frame json files with {poses, Rh, Th, shapes}."""
    frames = sorted(f for f in os.listdir(path) if f.endswith('.json'))
    poses, Rh, Th, shapes = [], [], [], []
    for fr in frames:
        with open(join(path, fr)) as f:
            d = json.load(f)
        ann = d[0] if isinstance(d, list) else d
        poses.append(np.asarray(ann['poses'], np.float32).reshape(-1))
        Rh.append(np.asarray(ann.get('Rh', [0, 0, 0]), np.float32).reshape(3))
        Th.append(np.asarray(ann.get('Th', [0, 0, 0]), np.float32).reshape(3))
        shapes.append(np.asarray(ann.get('shapes', np.zeros(10)), np.float32).reshape(-1))
    return (np.stack(poses), np.stack(Rh), np.stack(Th), np.stack(shapes))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', required=True)
    ap.add_argument('--output', required=True)
    ap.add_argument('--format', default='auto',
                    choices=['auto', 'npz', 'amass', 'easymocap'])
    ap.add_argument('--n-bones', type=int, default=52)
    ap.add_argument('--stride', type=int, default=1)
    args = ap.parse_args()

    fmt = args.format
    if fmt == 'auto':
        if isdir(args.input):
            fmt = 'easymocap'
        else:
            with np.load(args.input, allow_pickle=True) as f:
                p = np.asarray(f['poses'])
            fmt = 'amass' if p.ndim == 2 and p.shape[1] > args.n_bones * 3 else 'npz'

    loader = {'npz': load_npz, 'amass': load_amass, 'easymocap': load_easymocap}[fmt]
    poses, Rh, Th, shapes = loader(args.input, args.n_bones)

    J3 = args.n_bones * 3
    if poses.shape[1] < J3:
        poses = np.concatenate(
            [poses, np.zeros((len(poses), J3 - poses.shape[1]), np.float32)], 1)
    poses = poses[:, :J3]

    sl = slice(None, None, args.stride)
    os.makedirs(dirname(args.output) or '.', exist_ok=True)
    np.savez(args.output, poses=poses[sl], Rh=Rh[sl], Th=Th[sl],
             shapes=shapes[sl] if len(shapes) == len(poses) else
             np.tile(shapes[:1], (len(poses[sl]), 1)))
    print(f'wrote {args.output}: {len(poses[sl])} frames, {J3 // 3} bones ({fmt})')


if __name__ == '__main__':
    main()
