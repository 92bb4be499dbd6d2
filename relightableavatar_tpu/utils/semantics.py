"""SCHP semantic-palette utilities (host-side numpy).

Reference: lib/utils/sem_utils.py — SCHP label list, the bit-twiddled
segmentation palette, and color-coded-map <-> index <-> one-hot conversion
used for optional semantic supervision (trainer hook
lib/train/trainers/base_trainer.py:90-93, loader
lib/datasets/base_dataset.py:252-260).

Host-side and vectorized (the reference loops over the 256-entry palette per
image); the palette lookup is a single (H*W, C) compare per class.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

SEMANTIC_LIST = [
    'background', 'hat', 'hair', 'glove', 'sunglasses', 'upper_cloth',
    'dress', 'coat', 'sock', 'pant', 'jumpsuit', 'scarf', 'skirt', 'face',
    'left_leg', 'right_leg', 'left_arm', 'right_arm', 'left_shoe',
    'right_shoe',
]
SEMANTIC_DIM = len(SEMANTIC_LIST)


@lru_cache
def schp_palette(num_cls: int = 256) -> np.ndarray:
    """(num_cls, 3) uint8 — SCHP's VOC-style bit-spread colormap
    (sem_utils.py:73-99)."""
    pal = np.zeros((num_cls, 3), np.uint8)
    for j in range(num_cls):
        lab, i = j, 0
        r = g = b = 0
        while lab:
            r |= ((lab >> 0) & 1) << (7 - i)
            g |= ((lab >> 1) & 1) << (7 - i)
            b |= ((lab >> 2) & 1) << (7 - i)
            i += 1
            lab >>= 3
        pal[j] = (r, g, b)
    return pal


def color_to_index(sem_rgb: np.ndarray, num_cls: int = SEMANTIC_DIM) -> np.ndarray:
    """Color-coded map (..., 3) -> class indices (...,) uint8.

    Unknown colors map to 0 (background), like the reference's zeros-init
    scatter (sem_utils.py:53-60)."""
    pal = schp_palette(num_cls)
    flat = sem_rgb.reshape(-1, 3).astype(np.int16)
    out = np.zeros(flat.shape[0], np.uint8)
    for i in range(1, num_cls):                      # 0 is the default
        out[(flat == pal[i].astype(np.int16)).all(-1)] = i
    return out.reshape(sem_rgb.shape[:-1])


def index_to_onehot(idx: np.ndarray, num_cls: int = SEMANTIC_DIM) -> np.ndarray:
    return np.eye(num_cls, dtype=np.float32)[idx.astype(np.int64)]


def color_to_onehot(sem_rgb: np.ndarray, num_cls: int = SEMANTIC_DIM) -> np.ndarray:
    """sem_utils.palette_to_onehot equivalent."""
    return index_to_onehot(color_to_index(sem_rgb, num_cls), num_cls)


def index_to_color(idx: np.ndarray, num_cls: int = 256) -> np.ndarray:
    """Semantic indices -> palette colors (semantics_to_color)."""
    return schp_palette(num_cls)[idx.astype(np.int64)]
