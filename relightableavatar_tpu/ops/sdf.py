"""VolSDF-style SDF-to-density conversions and volume rendering (pure jnp).

Mirrors the reference numerics exactly:
- ``sdf_to_sigma`` Laplace CDF (``lib/utils/net_utils.py:873-893``)
- ``raw2alpha`` / ``alpha2raw`` (``net_utils.py:851-860``)
- ``volume_rendering`` cumprod transmittance compositing
  (``net_utils.py:970-999``)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sdf_to_sigma(sdf: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """Laplace CDF density: branchless double-evaluation like the reference
    (net_utils.py:873-893) — no data-dependent control flow."""
    x = -sdf
    ind0 = x <= 0
    ind1 = ~ind0
    val0 = 1 / beta * (0.5 * jnp.exp(jnp.where(ind0, x, 0.0) / beta)) * ind0
    val1 = 1 / beta * (1 - 0.5 * jnp.exp(-jnp.where(ind1, x, 0.0) / beta)) * ind1
    return val0 + val1


def raw2alpha(raw: jnp.ndarray, dists=0.005, bias: float = 0.0) -> jnp.ndarray:
    if isinstance(dists, jnp.ndarray) and dists.ndim == raw.ndim - 1:
        dists = dists[..., None]
    return 1.0 - jnp.exp(-jax.nn.relu(raw + bias) * dists)


def alpha2raw(alpha: jnp.ndarray, dists: float = 0.005, bias: float = 0.0) -> jnp.ndarray:
    return jax.nn.relu(-jnp.log(1 - alpha) / dists) - bias


def sdf_to_occ(sdf: jnp.ndarray, beta: jnp.ndarray, dists=0.005) -> jnp.ndarray:
    return raw2alpha(sdf_to_sigma(sdf, beta), dists)


def render_weights(alpha: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """alpha (..., S) -> compositing weights (..., S)."""
    shifted = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1.0 - alpha[..., :-1] + eps], axis=-1)
    return alpha * jnp.cumprod(shifted, axis=-1)


def volume_rendering(rgb: jnp.ndarray, alpha: jnp.ndarray, eps: float = 1e-8,
                     bg_brightness: float = 0.0, bg_image=None):
    """rgb (..., S, C), alpha (..., S) ->
    (weights (..., S), rgb_map (..., C), acc_map (...,))."""
    if bg_image is not None:
        rgb = rgb.at[..., -1, :].set(bg_image)
    weights = render_weights(alpha, eps)
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc_map = jnp.sum(weights, axis=-1)
    rgb_map = rgb_map + (1.0 - acc_map[..., None]) * bg_brightness
    return weights, rgb_map, acc_map
