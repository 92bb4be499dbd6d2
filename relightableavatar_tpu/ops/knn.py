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


def _knn_block(pts: jnp.ndarray, verts: jnp.ndarray, vsq: jnp.ndarray, K: int):
    """pts (B, 3), verts (N, 3), vsq (N,) -> (B, K) d2, (B, K) idx.

    d2 via the |p|^2 - 2 p.v + |v|^2 matmul identity (MXU), then
    ``lax.approx_min_k`` — the TPU-native partial top-k reduction.  Plain
    ``lax.top_k`` lowers to a FULL SORT of the (B, N) matrix on TPU (~300 ms
    for 65k x 6890 measured on v5e); approx_min_k with recall 0.99 +
    aggregate_to_topk is ~100x faster and exact in practice for K=3 on
    smooth vertex clouds.
    """
    pv = pts @ verts.T                                      # (B, N)
    d2 = jnp.sum(pts * pts, axis=-1, keepdims=True) - 2.0 * pv + vsq[None, :]
    d2_k, idx = jax.lax.approx_min_k(d2, K, recall_target=0.99,
                                     aggregate_to_topk=True)
    return d2_k, idx


@partial(jax.jit, static_argnames=("K", "block"))
def knn(pts: jnp.ndarray, verts: jnp.ndarray, K: int = 3, block: int = 4096):
    """pts (..., P, 3), verts (N, 3) -> d2 (..., P, K), idx (..., P, K).

    P is processed in fixed-size blocks so the distance matrix stays at
    (block, N) — bounded HBM traffic regardless of P.
    """
    shape = pts.shape
    flat = pts.reshape(-1, 3)
    P = flat.shape[0]
    vsq = jnp.sum(verts * verts, axis=-1)

    pad = (-P) % block
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, 3), flat.dtype)], axis=0)
    blocks = flat.reshape(-1, block, 3)

    d2, idx = jax.lax.map(lambda p: _knn_block(p, verts, vsq, K), blocks)
    d2 = d2.reshape(-1, K)[:P]
    idx = idx.reshape(-1, K)[:P]
    # clamp tiny negative values from the matmul identity
    d2 = jnp.maximum(d2, 0.0)
    return d2.reshape(*shape[:-1], K), idx.reshape(*shape[:-1], K)


def knn_unchunked(pts: jnp.ndarray, verts: jnp.ndarray, K: int = 3,
                  exact: bool = False):
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
        pv = flat @ verts.T
        d2f = jnp.sum(flat * flat, -1, keepdims=True) - 2 * pv + vsq[None]
        nd, idx = jax.lax.top_k(-d2f, K)
        d2 = -nd
    else:
        vsq = jnp.sum(verts * verts, axis=-1)
        d2, idx = _knn_block(flat, verts, vsq, K)
    d2 = jnp.maximum(d2, 0.0)
    return d2.reshape(*shape[:-1], K), idx.reshape(*shape[:-1], K)
