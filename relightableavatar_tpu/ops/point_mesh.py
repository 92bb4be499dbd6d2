"""Point-to-triangle-mesh distance (pure jnp, static shapes).

TPU-native replacement for the reference's two CUDA deps:
- ``bvh_distance_queries.BVH`` — exact SMPL mesh SDF under ``cfg.smpl_distance``
  (lib/networks/deform/base_network.py:417-427): closest point on mesh,
  sign from the closest face's normal.
- pytorch3d ``_C`` point-mesh distance wrappers (lib/utils/sample_utils.py:198-308).

Design: no BVH. The SMPL-H mesh is small (13776 faces) and queries are
batched; a brute-force closest-point over face *blocks* with a running min
(``lax.scan``) is one fused XLA loop of FMA-dense work — on TPU that beats
a pointer-chasing tree walk, keeps shapes static, and needs no precompute.
The per-block inner computation is Ericson's region-based closest-point-on-
triangle, vectorized over (P, Fb) with ``jnp.where`` selects instead of
branches.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def closest_point_on_triangles(p: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """p (..., 3) broadcast against triangles tri (..., 3, 3) -> closest
    point (..., 3).  Branch-free Ericson 5.1.5 region tests."""
    a, b, c = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    ab, ac, ap = b - a, c - a, p - a
    d1, d2 = _dot(ab, ap), _dot(ac, ap)

    bp = p - b
    d3, d4 = _dot(ab, bp), _dot(ac, bp)
    cp = p - c
    d5, d6 = _dot(ab, cp), _dot(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    eps = 1e-12
    # edge/vertex barycentric params (clamped)
    v_ab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) < eps, eps, d1 - d3), 0, 1)
    v_ac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) < eps, eps, d2 - d6), 0, 1)
    v_bc = jnp.clip((d4 - d3) / jnp.where(
        jnp.abs((d4 - d3) + (d5 - d6)) < eps, eps, (d4 - d3) + (d5 - d6)), 0, 1)
    denom = va + vb + vc
    denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
    v_in = vb / denom
    w_in = vc / denom

    cp_a = a
    cp_b = b
    cp_c = c
    cp_ab = a + v_ab[..., None] * ab
    cp_ac = a + v_ac[..., None] * ac
    cp_bc = b + v_bc[..., None] * (c - b)
    cp_in = a + v_in[..., None] * ab + w_in[..., None] * ac

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (~in_a) & (~in_b) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (~in_a) & (~in_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (~in_b) & (~in_c) & (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    out = cp_in
    out = jnp.where(on_bc[..., None], cp_bc, out)
    out = jnp.where(on_ac[..., None], cp_ac, out)
    out = jnp.where(on_ab[..., None], cp_ab, out)
    out = jnp.where(in_c[..., None], cp_c, out)
    out = jnp.where(in_b[..., None], cp_b, out)
    out = jnp.where(in_a[..., None], cp_a, out)
    return out


@partial(jax.jit, static_argnames=("block",))
def point_mesh_distance(pts: jnp.ndarray, verts: jnp.ndarray,
                        faces: jnp.ndarray, block: int = 1024):
    """pts (P, 3), verts (V, 3), faces (F, 3) int -> (d2 (P,), closest (P, 3),
    fid (P,) int32).  Face blocks scanned with a running min so the (P, F)
    matrix never materializes."""
    P = pts.shape[0]
    F = faces.shape[0]
    pad = (-F) % block
    if pad:
        # repeat face 0 as padding: it cannot win unless it's the true min
        faces = jnp.concatenate([faces, jnp.broadcast_to(faces[:1], (pad, 3))])
    tris = verts[faces]                                   # (Fp, 3, 3)
    tris = tris.reshape(-1, block, 3, 3)                  # (nb, block, 3, 3)
    fids = jnp.arange(faces.shape[0], dtype=jnp.int32).reshape(-1, block)
    fids = jnp.minimum(fids, F - 1)

    def body(carry, blk):
        best_d2, best_cp, best_id = carry
        tri, fid = blk
        cp = closest_point_on_triangles(pts[:, None, :],
                                        tri[None, :, :, :])   # (P, block, 3)
        d2 = jnp.sum((pts[:, None, :] - cp) ** 2, axis=-1)    # (P, block)
        j = jnp.argmin(d2, axis=1)                            # (P,)
        d2m = jnp.take_along_axis(d2, j[:, None], 1)[:, 0]
        cpm = jnp.take_along_axis(cp, j[:, None, None], 1)[:, 0]
        idm = fid[j]
        better = d2m < best_d2
        return (jnp.where(better, d2m, best_d2),
                jnp.where(better[:, None], cpm, best_cp),
                jnp.where(better, idm, best_id)), None

    init = (jnp.full((P,), jnp.inf, pts.dtype),
            jnp.zeros((P, 3), pts.dtype),
            jnp.zeros((P,), jnp.int32))
    (d2, cp, fid), _ = jax.lax.scan(body, init, (tris, fids))
    return d2, cp, fid


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """(F, 3) unit normals (pytorch3d faces_normals_padded equivalent)."""
    tris = verts[faces]
    n = jnp.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)


@partial(jax.jit, static_argnames=("block",))
def signed_mesh_distance(pts: jnp.ndarray, verts: jnp.ndarray,
                         faces: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """(P,) signed distance: |closest| with the sign of
    dot(p - closest, n_closest_face) — the reference's BVH-SDF convention
    (base_network.py:421-427)."""
    d2, cp, fid = point_mesh_distance(pts, verts, faces, block=block)
    n = face_normals(verts, faces)[fid]
    s = jnp.sign(jnp.sum((pts - cp) * n, axis=-1))
    s = jnp.where(s == 0, 1.0, s)
    return jnp.sqrt(jnp.maximum(d2, 0.0)) * s
