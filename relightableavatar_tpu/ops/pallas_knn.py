"""Pallas TPU kernel: fused brute-force K-nearest-neighbour (K=3).

The HDQ inner loop queries K=3 nearest posed-SMPL vertices for every sample
point (SURVEY.md §7 hard parts).  The XLA path (ops/knn.py) materializes the
(P, N) distance matrix in HBM and runs approx_min_k over it; this kernel
keeps everything in VMEM: the vertex tile stays resident, distances for one
(point-block x vertex-tile) are computed with a VPU-friendly
coordinate-broadcast form, and a running top-3 merge is carried in scratch —
the (P, N) matrix never exists in HBM.

Grid: (P / BP, N / BV), vertex tiles innermost so the scratch accumulates
over them (TPU grid execution is sequential).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BP = 512     # points per block
BV = 512     # vertices per tile
K = 3


def _knn_kernel(pts_ref, verts_ref, d2_ref, idx_ref, best_d, best_i):
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_d[:] = jnp.full((BP, K), jnp.inf, jnp.float32)
        best_i[:] = jnp.zeros((BP, K), jnp.int32)

    # pts (BP, 3) x verts tile (BV, 3) -> d2 (BP, BV)
    px = pts_ref[:, 0:1]
    py = pts_ref[:, 1:2]
    pz = pts_ref[:, 2:3]
    vx = verts_ref[:, 0][None, :]
    vy = verts_ref[:, 1][None, :]
    vz = verts_ref[:, 2][None, :]
    d2 = (px - vx) ** 2 + (py - vy) ** 2 + (pz - vz) ** 2       # (BP, BV)

    base = j * BV
    col = jax.lax.broadcasted_iota(jnp.int32, (BP, BV), 1) + base

    # extract the tile's top-3 by 3 passes of min+mask
    tile_d = []
    tile_i = []
    for _ in range(K):
        m = jnp.min(d2, axis=1, keepdims=True)                  # (BP, 1)
        is_min = d2 == m
        # first index achieving the min
        first = jnp.min(jnp.where(is_min, col, jnp.int32(2 ** 30)), axis=1,
                        keepdims=True)
        tile_d.append(m)
        tile_i.append(first)
        d2 = jnp.where(col == first, jnp.inf, d2)

    # merge 3 running + 3 tile candidates -> top 3 (small fixed sort network)
    cand_d = jnp.concatenate([best_d[:], *tile_d], axis=1)      # (BP, 6)
    cand_i = jnp.concatenate([best_i[:], *tile_i], axis=1)      # (BP, 6)
    # selection: 3 passes of min-extract over the 6 candidates
    out_d = []
    out_i = []
    for _ in range(K):
        m = jnp.min(cand_d, axis=1, keepdims=True)
        pick_col = jnp.argmin(cand_d, axis=1)[:, None]          # (BP, 1)
        pos = jax.lax.broadcasted_iota(jnp.int32, cand_d.shape, 1)
        sel = pos == pick_col
        picked_i = jnp.sum(jnp.where(sel, cand_i, 0), axis=1, keepdims=True)
        out_d.append(m)
        out_i.append(picked_i)
        cand_d = jnp.where(sel, jnp.inf, cand_d)
    best_d[:] = jnp.concatenate(out_d, axis=1)
    best_i[:] = jnp.concatenate(out_i, axis=1)

    @pl.when(j == nv - 1)
    def _():
        d2_ref[:] = best_d[:]
        idx_ref[:] = best_i[:]


@partial(jax.jit, static_argnames=("k", "interpret"))
def knn_pallas(pts: jnp.ndarray, verts: jnp.ndarray, k: int = 3,
               interpret: bool | None = None):
    """pts (P, 3), verts (N, 3) -> d2 (P, k), idx (P, k) ascending.

    P is padded to BP, N to BV (padding vertices pushed to +inf distance by
    placing them far away).  interpret=None auto-enables Pallas interpret
    mode on CPU so tests exercise the same kernel body without a TPU."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    assert k == K, "kernel is specialized for K=3"
    P = pts.shape[0]
    N = verts.shape[0]
    pad_p = (-P) % BP
    pad_n = (-N) % BV
    if pad_p:
        pts = jnp.concatenate([pts, jnp.zeros((pad_p, 3), pts.dtype)])
    if pad_n:
        far = jnp.full((pad_n, 3), 1e6, verts.dtype)
        verts = jnp.concatenate([verts, far])
    Pp = pts.shape[0]
    Np = verts.shape[0]

    grid = (Pp // BP, Np // BV)
    d2, idx = pl.pallas_call(
        _knn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BP, 3), lambda i, j: (i, 0)),
            pl.BlockSpec((BV, 3), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BP, K), lambda i, j: (i, 0)),
            pl.BlockSpec((BP, K), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Pp, K), jnp.float32),
            jax.ShapeDtypeStruct((Pp, K), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BP, K), jnp.float32),
            pltpu.VMEM((BP, K), jnp.int32),
        ],
        interpret=interpret,
    )(pts, verts)
    return d2[:P], idx[:P]
