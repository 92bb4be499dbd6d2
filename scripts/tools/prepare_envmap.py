"""Prepare relighting probes: downsample HDR environment maps to the 16x32
light grid the renderer integrates over.

Mirrors the reference tool (``scripts/tools/prepare_envmap.py``): reads .hdr
files, writes ``<lighting_dir>/16x32/<name>.hdr`` (area-downsampled probes)
and optionally keeps the originals under ``<lighting_dir>/8k/``.

Usage:
  python scripts/tools/prepare_envmap.py --input dir_of_hdrs \
      [--lighting-dir data/lighting] [--height 16] [--width 32]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
from os.path import basename, dirname, join, splitext

sys.path.insert(0, dirname(dirname(dirname(os.path.abspath(__file__)))))

import cv2
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--input', required=True)
    ap.add_argument('--lighting-dir', default='data/lighting')
    ap.add_argument('--height', type=int, default=16)
    ap.add_argument('--width', type=int, default=32)
    ap.add_argument('--keep-8k', action='store_true')
    args = ap.parse_args()

    probe_dir = join(args.lighting_dir, f'{args.height}x{args.width}')
    os.makedirs(probe_dir, exist_ok=True)
    if args.keep_8k:
        os.makedirs(join(args.lighting_dir, '8k'), exist_ok=True)

    n = 0
    for f in sorted(os.listdir(args.input)):
        if not f.lower().endswith(('.hdr', '.exr')):
            continue
        path = join(args.input, f)
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            print(f'skip unreadable {f}')
            continue
        img = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_BGR2RGB)
        probe = cv2.resize(img, (args.width, args.height),
                           interpolation=cv2.INTER_AREA)
        out = join(probe_dir, splitext(basename(f))[0] + '.hdr')
        cv2.imwrite(out, probe[..., ::-1])
        if args.keep_8k:
            shutil.copy(path, join(args.lighting_dir, '8k', f))
        n += 1
    print(f'wrote {n} probes to {probe_dir}')


if __name__ == '__main__':
    main()
