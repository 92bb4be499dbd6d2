"""Linear blend skinning algebra (pure jnp, broadcast over leading dims).

TPU-native re-design of the reference LBS math
(``lib/utils/blend_utils.py``): closed-form 3x3 adjugate inverse
(``blend_utils.py:125-165``), blended bone transforms
(``blend_utils.py:212-218``) and the point/direction transforms between
world / pose / tpose spaces (``blend_utils.py:234-333``).  All functions are
shape-polymorphic over leading batch dims and jit/vmap friendly.
"""
from __future__ import annotations

import jax.numpy as jnp


def affine_inverse(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of (..., 4, 4) rigid/affine transforms (blend_utils.py:11-21)."""
    R = A[..., :3, :3]
    T = A[..., :3, 3:]
    P = A[..., 3:, :]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ T], axis=-1)
    return jnp.concatenate([top, P], axis=-2)


def inverse_3x3(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Adjugate-based inverse of (..., 3, 3); matches reference numerics
    including the +eps on the determinant (blend_utils.py:125-165)."""
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    m00 = r11 * r22 - r21 * r12
    m10 = -r10 * r22 + r20 * r12
    m20 = r10 * r21 - r20 * r11
    m01 = -r01 * r22 + r21 * r02
    m11 = r00 * r22 - r20 * r02
    m21 = -r00 * r21 + r20 * r01
    m02 = r01 * r12 - r11 * r02
    m12 = -r00 * r12 + r10 * r02
    m22 = r00 * r11 - r10 * r01

    D = r00 * m00 + r01 * m10 + r02 * m20
    M = jnp.stack([
        jnp.stack([m00, m01, m02], axis=-1),
        jnp.stack([m10, m11, m12], axis=-1),
        jnp.stack([m20, m21, m22], axis=-1),
    ], axis=-2)
    return M / (D[..., None, None] + eps)


def blend_transform(bw: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """Blend per-bone transforms with skinning weights.

    bw: (..., P, J); A: (..., J, 4, 4) -> (..., P, 4, 4).
    Contraction on the MXU via einsum (reference blend_utils.py:212-218 does a
    broadcast-multiply-sum which would materialize P x J x 4 x 4).
    """
    return jnp.einsum('...pj,...jab->...pab', bw, A)


# points ------------------------------------------------------------------
def world_points_to_pose_points(wpts, R, Th):
    """wpts (..., P, 3); R (..., 3, 3); Th (..., 3) or (..., 1, 3)."""
    if Th.ndim == R.ndim - 1:
        Th = Th[..., None, :]
    return (wpts - Th) @ R


def pose_points_to_world_points(ppts, R, Th):
    if Th.ndim == R.ndim - 1:
        Th = Th[..., None, :]
    return ppts @ jnp.swapaxes(R, -1, -2) + Th


def world_dirs_to_pose_dirs(wdirs, R):
    return wdirs @ R


def pose_dirs_to_world_dirs(pdirs, R):
    return pdirs @ jnp.swapaxes(R, -1, -2)


# blended (per-point) transforms ------------------------------------------
def pose_points_to_tpose_points(ppts, A_bw, R_inv=None):
    """ppts (..., P, 3), A_bw (..., P, 4, 4): x_t = R^-1 (x_p - t)."""
    pts = ppts - A_bw[..., :3, 3]
    if R_inv is None:
        R_inv = inverse_3x3(A_bw[..., :3, :3])
    return jnp.einsum('...pab,...pb->...pa', R_inv, pts)


def tpose_points_to_pose_points(tpts, A_bw, R_inv=None):
    pts = jnp.einsum('...pab,...pb->...pa', A_bw[..., :3, :3], tpts)
    return pts + A_bw[..., :3, 3]


def pose_dirs_to_tpose_dirs(pdirs, A_bw, R_inv=None):
    """Directions transform with the transpose (inverse-transpose of inverse)."""
    R = A_bw[..., :3, :3]
    return jnp.einsum('...pba,...pb->...pa', R, pdirs)


def tpose_dirs_to_pose_dirs(tdirs, A_bw, R_inv=None):
    if R_inv is None:
        R_inv = inverse_3x3(A_bw[..., :3, :3])
    return jnp.einsum('...pba,...pb->...pa', R_inv, tdirs)


def normalize(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """v / ||v|| with a FINITE gradient at v == 0.

    jnp.linalg.norm has a NaN gradient at zero (d||v||/dv = v/||v||), and
    masked lanes carry exact zeros through the renderer — the rsqrt form keeps
    both value and gradient finite there."""
    import jax
    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps * eps)
