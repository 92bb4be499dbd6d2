"""K-nearest-neighbour queries against the posed SMPL vertex cloud.

Replaces the reference's pytorch3d CUDA ``knn_points``
(``lib/utils/sample_utils.py:122``) with TPU-friendly implementations:

- ``knn_xla``: distance computation via the |p|^2 + |v|^2 - 2 p.v matmul
  identity (runs on the MXU) followed by ``jax.lax.top_k``; chunked with
  ``lax.map`` so the P x N distance matrix never exceeds a block.
- ``knn_pallas`` (ops/pallas_knn.py): fused Pallas kernel that keeps the
  vertex tile in VMEM and maintains a running top-K without materializing
  the full distance matrix in HBM.

Both return squared distances sorted ascending and the matching indices,
like pytorch3d's ``knn_points(return_sorted=True)``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _knn_block(pts: jnp.ndarray, verts: jnp.ndarray, K: int):
    """pts (B, 3), verts (N, 3) -> (B, K) d2, (B, K) idx.

    d2 via a fused broadcast-difference pass, then ``lax.approx_min_k`` —
    the TPU-native partial top-k reduction.  Plain ``lax.top_k`` lowers to
    a FULL SORT of the (B, N) matrix on TPU (~300 ms for 65k x 6890
    measured on v5e); approx_min_k with recall 0.99 + aggregate_to_topk is
    ~100x faster.

    Numerics, load-bearing on TPU (measured, see git history):
    - The textbook |p|^2 - 2 p.v + |v|^2 matmul identity is UNUSABLE at the
      TPU default matmul precision: f32 inputs are truncated to bf16 (one
      pass), and the identity cancels two O(1) terms to recover an O(mm^2)
      distance — the bf16 product noise is ~0.03 in d2 (16 cm^2!), which
      silently scrambled neighbour selection (9% top-3 match vs exact; a
      14 dB hit on renders vs the CPU golden).  Precision.HIGH/HIGHEST fix
      it but cost ~2x (multi-pass matmul).
    - Instead the selection matrix is built cancellation-FREE: subtract
      coordinates first (exact in f32 — nearby operands), square and
      accumulate in bf16.  One fused elementwise pass on the VPU, the
      (B, N) matrix lands in HBM as bf16 (half traffic), and relative
      error is ~0.4% of d2 itself — ordering-safe except for near-ties.
    - bf16 quantizes d2 at 0.4% relative, enough to flip near-ties.  Two
      modes (``fast``):
      * fast=False (public API): the bf16 pass selects a SUPERSET of 2K+2
        candidates; those few are re-measured exactly in f32 and the true
        top-K extracted — exact selection and values barring (2K+2)-way
        ties below 0.4%.
      * fast=True (HDQ hot loop): top-K straight from the bf16 matrix,
        values re-measured exactly in f32 with the selection order kept, so
        the verts[idx] gather CSEs with the caller's own neighbour gather
        (the superset gather costs ~2x frame time in the shadow tracer).
        Near-ties may swap members (sub-3 mm effect on the blended result);
        rendering and AD training gradients are unaffected — only exact
        far-field crossing points are traded away.
    """
    d2 = ((pts[:, 0:1] - verts[None, :, 0]).astype(jnp.bfloat16) ** 2
          + (pts[:, 1:2] - verts[None, :, 1]).astype(jnp.bfloat16) ** 2
          + (pts[:, 2:3] - verts[None, :, 2]).astype(jnp.bfloat16) ** 2)
    K2 = min(2 * K + 2, verts.shape[0])
    _, idx2 = jax.lax.approx_min_k(d2, K2, recall_target=0.99,
                                   aggregate_to_topk=True)
    d2_2 = _exact_d2(pts, verts, idx2)                      # (B, K2) f32
    nd, sub = jax.lax.top_k(-d2_2, K)                       # tiny: K2 wide
    return -nd, jnp.take_along_axis(idx2, sub, axis=-1)


def _knn_block_fast(pts: jnp.ndarray, verts: jnp.ndarray, K: int):
    """Hot-loop variant: bf16 selection of exactly K, exact f32 values,
    selection order preserved (see ``_knn_block`` numerics note)."""
    d2 = ((pts[:, 0:1] - verts[None, :, 0]).astype(jnp.bfloat16) ** 2
          + (pts[:, 1:2] - verts[None, :, 1]).astype(jnp.bfloat16) ** 2
          + (pts[:, 2:3] - verts[None, :, 2]).astype(jnp.bfloat16) ** 2)
    _, idx = jax.lax.approx_min_k(d2, K, recall_target=0.99,
                                  aggregate_to_topk=True)
    return _exact_d2(pts, verts, idx), idx


def _exact_d2(pts: jnp.ndarray, verts: jnp.ndarray, idx: jnp.ndarray):
    """Exact f32 squared distances to selected verts (no cancellation)."""
    diff = pts[:, None, :] - verts[idx]                     # (B, K, 3)
    return jnp.sum(diff * diff, axis=-1)


@partial(jax.jit, static_argnames=("K", "block"))
def knn(pts: jnp.ndarray, verts: jnp.ndarray, K: int = 3, block: int = 4096):
    """pts (..., P, 3), verts (N, 3) -> d2 (..., P, K), idx (..., P, K).

    P is processed in fixed-size blocks so the distance matrix stays at
    (block, N) — bounded HBM traffic regardless of P.
    """
    shape = pts.shape
    flat = pts.reshape(-1, 3)
    P = flat.shape[0]
    pad = (-P) % block
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, 3), flat.dtype)], axis=0)
    blocks = flat.reshape(-1, block, 3)

    d2, idx = jax.lax.map(lambda p: _knn_block(p, verts, K), blocks)
    d2 = d2.reshape(-1, K)[:P]
    idx = idx.reshape(-1, K)[:P]
    d2 = jnp.maximum(d2, 0.0)
    return d2.reshape(*shape[:-1], K), idx.reshape(*shape[:-1], K)


def knn_unchunked(pts: jnp.ndarray, verts: jnp.ndarray, K: int = 3,
                  exact: bool = False, fast: bool = False):
    """Single-block variant for use inside other jitted bodies where the
    caller already bounds P (e.g. the fused sphere tracer).

    exact=True routes K=3 TPU queries through the Pallas fused kernel
    (ops/pallas_knn.py): 100% exact neighbours vs approx_min_k's ~0.64 top-3
    recall on dense clouds, at ~5x the cost — pick per quality needs
    (cfg.tpu.knn_impl / AniSDFConfig.knn_exact)."""
    shape = pts.shape
    flat = pts.reshape(-1, 3)
    if exact and K == 3 and jax.devices()[0].platform != 'cpu':
        from relightableavatar_tpu.ops.pallas_knn import knn_pallas
        d2, idx = knn_pallas(flat, verts, k=3)
    elif exact:
        vsq = jnp.sum(verts * verts, axis=-1)
        pv = jnp.matmul(flat, verts.T, precision=jax.lax.Precision.HIGHEST)
        d2f = jnp.sum(flat * flat, -1, keepdims=True) - 2 * pv + vsq[None]
        nd, idx = jax.lax.top_k(-d2f, K)
        d2 = -nd
    elif fast:
        d2, idx = _knn_block_fast(flat, verts, K)
    else:
        d2, idx = _knn_block(flat, verts, K)
    d2 = jnp.maximum(d2, 0.0)
    return d2.reshape(*shape[:-1], K), idx.reshape(*shape[:-1], K)


# ------------------------------------------------------------- grouped KNN
# Two-level KNN: the brute-force (P, 6890) distance matrix is HBM-bound
# (~1.8 GB traffic per 32k-point block -> ~3.4 ms, the single hottest op in
# the HDQ).  Instead: partition the POSED vertices per frame into G balanced
# spatial groups (median-split k-d tree -> equal group sizes, static shapes;
# host-side, ~1 ms).  A query ranks groups by the BOUNDING-SPHERE lower
# bound max(|p - centroid| - radius, 0) — centroid distance alone fails on
# tubular geometry where a vertex ring's centroid sits on the limb axis —
# picks the best C groups, gathers their C*S candidate vertices, and runs
# the exact top-3 over those ~192 candidates: ~20x less VPU work and ~15x
# less HBM traffic than the full matrix.  With S=16, C=12: 100% top-3 index
# match near the surface, 99.9% in the sampling band, worst-case distance
# error 1.7 cm on far (> dist_th) queries where only the smooth SMPL
# fallback consumes it (tests/test_ops_core.py gates this).

GROUP_SIZE = 16          # S: vertices per group (k-d leaf, padded)
GROUP_TOPC = 12          # C: candidate groups per query


def build_vertex_groups(tverts, group_size: int = GROUP_SIZE):
    """Balanced k-d partition of a vertex cloud (host side).  Returns gvid
    (G, S) int32 vertex ids and gmask (G, S) bool validity (False =
    padding slot)."""
    import numpy as np
    tverts = np.asarray(tverts, np.float32)
    N = len(tverts)
    # number of leaves: next power of two holding N at <= group_size each
    G = 1
    while G * group_size < N:
        G *= 2
    ids = [np.arange(N)]
    while len(ids) < G:
        nxt = []
        for leaf in ids:
            pts = tverts[leaf]
            ax = int(np.argmax(pts.max(0) - pts.min(0)))
            order = np.argsort(pts[:, ax], kind="stable")
            half = (len(leaf) + 1) // 2
            nxt.append(leaf[order[:half]])
            nxt.append(leaf[order[half:]])
        ids = nxt
    gvid = np.zeros((G, group_size), np.int32)
    gmask = np.zeros((G, group_size), bool)
    for g, leaf in enumerate(ids):
        gvid[g, :len(leaf)] = leaf
        gmask[g, :len(leaf)] = True
    return gvid, gmask


def group_frame_arrays(pverts, gvid, gmask):
    """Per-frame grouped vertex arrays: padded slots are pushed far away so
    they can never win a distance comparison.  Host-side numpy (runs in the
    frame-context builder).  Returns gverts (G, S, 3), gcent (G, 3),
    gradius (G,) — the bounding-sphere radius around each centroid."""
    import numpy as np
    pverts = np.asarray(pverts, np.float32)
    gverts = pverts[gvid]                                   # (G, S, 3)
    cnt = gmask.sum(-1, keepdims=True).clip(1)
    gcent = (gverts * gmask[..., None]).sum(1) / cnt        # (G, 3)
    d = np.sqrt((((gverts - gcent[:, None]) ** 2).sum(-1)) * gmask)
    gradius = d.max(-1)                                     # (G,)
    gverts = np.where(gmask[..., None], gverts, 1e6)
    return (gverts.astype(np.float32), gcent.astype(np.float32),
            gradius.astype(np.float32))


def _top_c_min(d2, C):
    """C smallest columns of d2 (P, G) by C passes of min+mask (G is small;
    lax.top_k would sort, approx_min_k needs G >= lanes)."""
    idx = []
    for _ in range(C):
        i = jnp.argmin(d2, axis=-1)                         # (P,)
        idx.append(i)
        d2 = jnp.where(jax.nn.one_hot(i, d2.shape[-1], dtype=bool), jnp.inf, d2)
    return jnp.stack(idx, axis=-1)                          # (P, C)


def knn_grouped(pts: jnp.ndarray, gverts: jnp.ndarray, gcent: jnp.ndarray,
                gradius: jnp.ndarray, gvid: jnp.ndarray,
                K: int = 3, C: int = GROUP_TOPC):
    """pts (P, 3) against grouped verts gverts (G, S, 3) with original ids
    gvid (G, S); returns (d2 (P, K), idx (P, K)) ascending, matching the
    brute-force result whenever the true top-K lie in the C groups with the
    smallest bounding-sphere lower bound.
    """
    P = pts.shape[0]
    G, S, _ = gverts.shape
    csq = jnp.sum(gcent * gcent, axis=-1)
    d2c = (jnp.sum(pts * pts, -1, keepdims=True)
           - 2.0 * jnp.matmul(pts, gcent.T,
                              precision=jax.lax.Precision.HIGHEST)
           + csq[None, :])                                  # (P, G)
    # bounding-sphere lower bound on the distance to any group member
    lb = jnp.maximum(jnp.sqrt(jnp.maximum(d2c, 0.0)) - gradius[None, :], 0.0)
    top_g = _top_c_min(lb, C)                               # (P, C)

    cand_v = gverts[top_g].reshape(P, C * S, 3)             # (P, C*S, 3)
    cand_i = gvid[top_g].reshape(P, C * S)                  # (P, C*S)
    diff = pts[:, None, :] - cand_v
    d2 = jnp.sum(diff * diff, axis=-1)                      # (P, C*S)

    pos = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    out_d, out_i = [], []
    for _ in range(K):
        j = jnp.argmin(d2, axis=-1)                         # (P,)
        sel = pos == j[:, None]
        out_d.append(jnp.sum(jnp.where(sel, d2, 0.0), -1))
        out_i.append(jnp.sum(jnp.where(sel, cand_i, 0), -1))
        d2 = jnp.where(sel, jnp.inf, d2)
    return (jnp.maximum(jnp.stack(out_d, -1), 0.0),
            jnp.stack(out_i, -1).astype(jnp.int32))


def subsample_verts(gvid, gmask, stride: int):
    """Spatially-uniform vertex subsample: every ``stride``-th member of each
    balanced k-d leaf (build_vertex_groups) — uniform coverage, unlike a raw
    id stride.  Returns global vertex ids, shape (ceil(valid/stride),)."""
    import numpy as np
    ids = []
    for g in range(gvid.shape[0]):
        members = gvid[g][gmask[g]]
        ids.append(members[::stride])
    return np.concatenate(ids).astype(np.int32)


def knn_select(pts: jnp.ndarray, verts: jnp.ndarray, K: int = 3):
    """Selection only: bf16 broadcast-difference matrix + approx_min_k,
    returning INDICES (no value gather).  The caller re-measures distances
    from its own fused attribute gather (see models/anisdf.py
    _hdq_knn_stage) — gathers are latency-bound on TPU, so the exact-value
    gather must be shared, not duplicated here."""
    d2 = ((pts[:, 0:1] - verts[None, :, 0]).astype(jnp.bfloat16) ** 2
          + (pts[:, 1:2] - verts[None, :, 1]).astype(jnp.bfloat16) ** 2
          + (pts[:, 2:3] - verts[None, :, 2]).astype(jnp.bfloat16) ** 2)
    _, idx = jax.lax.approx_min_k(d2, K, recall_target=0.99,
                                  aggregate_to_topk=True)
    return idx
