"""Ray-AABB intersection (pure jnp, static shapes).

Mirrors ``lib/utils/net_utils.py:1683-1719`` but returns raw (near, far, hit)
without boolean compaction — TPU-native masking replaces the reference's
dynamic filtering.
"""
from __future__ import annotations

import jax.numpy as jnp


def get_near_far_aabb(bounds: jnp.ndarray, ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                      epsilon: float = 1e-8):
    """bounds (..., 2, 3); ray_o/ray_d (..., P, 3) ->
    near (..., P), far (..., P), hit (..., P) bool."""
    if bounds.ndim < ray_o.ndim:
        bounds = jnp.expand_dims(bounds, axis=-3)  # broadcast over P

    # regularize tiny components exactly like the reference in-place clamps
    d = ray_d
    d = jnp.where((d < epsilon) & (d > -epsilon ** 2), epsilon, d)
    d = jnp.where((d > -epsilon ** 2) & (d < epsilon), -epsilon, d)

    tmin = (bounds[..., :1, :] - ray_o) / d
    tmax = (bounds[..., 1:2, :] - ray_o) / d
    t1 = jnp.minimum(tmin, tmax)
    t2 = jnp.maximum(tmin, tmax)
    near = jnp.max(t1, axis=-1)
    far = jnp.min(t2, axis=-1)
    return near, far, near < far
