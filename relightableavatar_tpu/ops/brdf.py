"""GGX microfacet BRDF (pure jnp, vectorized over a light axis).

Re-implements the reference ``Microfacet`` (``lib/utils/relight_utils.py:468-615``)
— lambert + GGX glossy lobes, Schlick fresnel, and the ``cancel_cosine`` trick —
without the reshape/permute gymnastics: everything broadcasts over
pts (..., 3) x lights (..., L, 3).  ``safe_divide`` reproduces the reference's
eps clamping semantics (``relight_utils.py:618-632``) which affect *values*,
not just stability, so PSNR parity depends on them.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from relightableavatar_tpu.ops.lbs import normalize


def safe_divide(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Clamp |a|,|b| >= eps keeping signs, divide, zero nan/inf, clip 1e10."""
    a = jnp.where((a < eps) & (a >= 0), eps, a)
    a = jnp.where((a > -eps) & (a < 0), -eps, a)
    b = jnp.where((b < eps) & (b >= 0), eps, b)
    b = jnp.where((b > -eps) & (b < 0), -eps, b)
    div = a / b
    div = jnp.where(jnp.isnan(div) | jnp.isinf(div), 0.0, div)
    return jnp.clip(div, -1e10, 1e10)


def microfacet_brdf(pts2l: jnp.ndarray,     # (..., L, 3) surface-to-light
                    pts2c: jnp.ndarray,     # (..., 3) surface-to-camera
                    normal: jnp.ndarray,    # (..., 3)
                    albedo: jnp.ndarray,    # (..., 3)
                    rough: jnp.ndarray,     # (..., 1)
                    f0: float = 0.04,
                    lambert_only: bool = False,
                    glossy_only: bool = False,
                    cancel_cosine: bool = True) -> jnp.ndarray:
    """Returns brdf (..., L, 3)."""
    pts2l = normalize(pts2l, eps=1e-7)
    pts2c = normalize(pts2c, eps=1e-7)
    normal = normalize(normal, eps=1e-7)

    n = normal[..., None, :]                                      # (..., 1, 3)
    v = pts2c[..., None, :]                                       # (..., 1, 3)

    l_dot_n = jnp.clip(jnp.sum(pts2l * n, axis=-1), 1e-4, 1.0)    # (..., L)
    v_dot_n = jnp.clip(jnp.sum(pts2c * normal, axis=-1), 1e-4, 1.0)  # (...,)

    # Diffuse
    brdf_lambert = albedo[..., None, :] / math.pi                 # (..., 1->L, 3)
    brdf_lambert = jnp.broadcast_to(brdf_lambert, pts2l.shape)
    if cancel_cosine:
        brdf_lambert = brdf_lambert * l_dot_n[..., None]

    # Glossy (GGX)
    h = normalize(pts2l + v, eps=1e-7)                            # (..., L, 3)
    alpha = rough ** 2                                            # (..., 1)

    # Fresnel (Schlick)
    cos_lh = jnp.sum(pts2l * h, axis=-1)                          # (..., L)
    f = f0 + (1 - f0) * (1 - cos_lh) ** 5

    # Distribution (GGX)
    cos_theta_m = jnp.sum(h * n, axis=-1)                         # (..., L)
    chi_d = jnp.where(cos_theta_m > 0, 1.0, 0.0)
    cos_m_sq = jnp.square(cos_theta_m)
    tan_m_sq = safe_divide(1 - cos_m_sq, cos_m_sq)
    denom_d = math.pi * jnp.square(cos_m_sq) * jnp.square(alpha ** 2 + tan_m_sq)
    d = safe_divide(alpha ** 2 * chi_d, denom_d)

    # Geometry (GGX Smith-like, per reference _get_g)
    cos_theta_v = jnp.sum(normal * pts2c, axis=-1)                # (...,)
    cos_theta = jnp.sum(h * v, axis=-1)                           # (..., L)
    div = safe_divide(cos_theta, cos_theta_v[..., None])
    chi_g = jnp.where(div > 0, 1.0, 0.0)
    cos_v_sq = jnp.clip(jnp.square(cos_theta_v), 0.0, 1.0)
    tan_v_sq = jnp.clip(safe_divide(1 - cos_v_sq, cos_v_sq), 0.0, 1e10)
    denom_g = 1 + jnp.sqrt(1 + alpha ** 2 * tan_v_sq[..., None])
    g = safe_divide(chi_g * 2, denom_g)

    ldn = jnp.ones_like(l_dot_n) if cancel_cosine else l_dot_n
    denom = 4 * jnp.abs(ldn) * jnp.abs(v_dot_n)[..., None]
    micro = safe_divide(f * g * d, denom)                         # (..., L)
    brdf_glossy = jnp.broadcast_to(micro[..., None], pts2l.shape)

    if lambert_only:
        return brdf_lambert
    if glossy_only:
        return brdf_glossy
    return brdf_glossy + brdf_lambert


def evaluate_shade(lvis: jnp.ndarray,   # (..., L)
                   ldot: jnp.ndarray,   # (..., L)
                   area: jnp.ndarray,   # (L,)
                   light: jnp.ndarray   # (..., L, 3)
                   ) -> jnp.ndarray:
    """Per-texel incident radiance (reference sphere_tracing_renderer.py:364-376)."""
    return lvis[..., None] * ldot[..., None] * area[..., :, None] * light
