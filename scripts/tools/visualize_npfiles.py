"""Tabulate the contents of a numpy dict file (.npy dict / .npz) for
inspection (reference ``scripts/tools/visualize_npfiles.py``).

The reference writes .xlsx via pandas; pandas is not in this image, so the
default output is one CSV per (nested) key plus a printed summary table —
same information, dependency-free.

    python scripts/tools/visualize_npfiles.py data/.../smpl_params.npy -o out_dir
"""
from __future__ import annotations

import argparse
import csv
import os
from functools import reduce

import numpy as np


def get_indices(*shapes):
    """Column labels for flattened trailing dims (reference :33-36)."""
    if not shapes:
        return ['0']
    inds = np.stack(np.meshgrid(*[np.arange(s) for s in shapes],
                                indexing='ij'), axis=-1)
    inds = reduce(np.char.add, np.split(inds.astype(str), inds.shape[-1],
                                        axis=-1))
    return list(inds.ravel())


def traverse(d: dict, out_dir: str, key_prefix: str = ''):
    for key, item in d.items():
        key_full = f'{key_prefix}.{key}' if key_prefix else str(key)
        if isinstance(item, dict):
            traverse(item, out_dir, key_full)
            continue
        item = np.asarray(item)
        if item.ndim == 0:
            item = item[None]
        if item.ndim == 1:
            item = item[:, None]
        flat = item.reshape(item.shape[0], -1)
        path = os.path.join(out_dir, key_full.replace('/', '_') + '.csv')
        with open(path, 'w', newline='') as f:
            w = csv.writer(f)
            w.writerow([''] + get_indices(*item.shape[1:]))
            for i, row in enumerate(flat):
                w.writerow([i] + list(row))
        print(f'{key_full:40s} shape={tuple(item.shape)} dtype={item.dtype} '
              f'-> {path}')


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('input')
    ap.add_argument('-o', '--output', default='')
    a = ap.parse_args()
    out_dir = a.output or os.path.splitext(a.input)[0] + '_tables'
    os.makedirs(out_dir, exist_ok=True)

    d = np.load(a.input, allow_pickle=True)
    if isinstance(d, np.lib.npyio.NpzFile):
        d = {**d}
    elif isinstance(d, np.ndarray) and np.squeeze(d).size == 1:
        d = d.item()
    else:
        d = {os.path.splitext(os.path.basename(a.input))[0]: d}
    traverse(d, out_dir)


if __name__ == '__main__':
    main()
