"""Per-frame SDF voxel-grid cache for shadow-ray tracing (pure jnp).

A TPU-specific accelerator with no reference equivalent (the reference
traces every one of its P×512 env shadow rays through the full HDQ query,
sphere_tracing_renderer.py:265-344 — its code comment prices that at "2 and
a half minutes to render an 1024x1024 image", lib/config/config.py:127).

Observation: soft shadows are low-frequency.  The HDQ world SDF is frozen
within a frame, so we bake it once into a dense voxel grid over the (padded)
body bbox — ~2M HDQ queries — and shadow rays march trilinear lookups
instead of KNN→LBS→MLP chains: ~365M HDQ queries become ~365M gathers.
The camera-facing surface pass keeps the exact HDQ SDF; only light
visibility (and the DFSS cone distances, which are exactly the grid values)
uses the cache.  Enabled by ``cfg.tpu.shadow_grid`` (voxels per axis, 0=off).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def build_sdf_grid(sdf_fn, lo: jnp.ndarray, hi: jnp.ndarray, res: int,
                   chunk: int = 262144) -> jnp.ndarray:
    """Evaluate ``sdf_fn`` at the centers of a res³ lattice spanning
    [lo, hi] (inclusive corners) -> (res, res, res) float32."""
    ax = [jnp.linspace(lo[i], hi[i], res) for i in range(3)]
    X, Y, Z = jnp.meshgrid(*ax, indexing="ij")
    pts = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)           # (res^3, 3)
    n = pts.shape[0]
    pad = (-n) % chunk
    if pad:
        pts = jnp.concatenate([pts, jnp.broadcast_to(pts[:1], (pad, 3))])
    blocks = pts.reshape(-1, chunk, 3)
    vals = jax.lax.map(lambda p: sdf_fn(p)[:, 0], blocks).reshape(-1)
    return vals[:n].reshape(res, res, res)


@partial(jax.jit, static_argnames=("mcfg", "res", "dist_th"))
def build_hdq_grid(params, mcfg, ctx, lo, hi, res: int,
                   dist_th: float | None = None) -> jnp.ndarray:
    """Jitted per-frame bake of the HDQ world SDF (params/ctx as arguments —
    large closure constants would blow the remote-compile payload)."""
    from relightableavatar_tpu.models import anisdf
    hdq = lambda x: anisdf.hdq_sdf(params, mcfg, ctx, x,
                                   smooth_transition=True, dist_th=dist_th)
    return build_sdf_grid(hdq, lo, hi, res)


def grid_sdf(grid: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
             x: jnp.ndarray) -> jnp.ndarray:
    """Trilinear lookup, (P, 3) -> (P, 1); queries clamp to the box (shadow
    rays are AABB-clipped to it before tracing)."""
    res = grid.shape[0]
    f = (x - lo) / (hi - lo) * (res - 1)
    f = jnp.clip(f, 0.0, res - 1 - 1e-4)
    b = jnp.floor(f).astype(jnp.int32)
    t = f - b
    ix, iy, iz = b[:, 0], b[:, 1], b[:, 2]
    tx, ty, tz = t[:, 0], t[:, 1], t[:, 2]
    flat = grid.reshape(-1)

    def at(dx, dy, dz):
        idx = ((ix + dx) * res + (iy + dy)) * res + (iz + dz)
        return flat[idx]

    c00 = at(0, 0, 0) * (1 - tx) + at(1, 0, 0) * tx
    c10 = at(0, 1, 0) * (1 - tx) + at(1, 1, 0) * tx
    c01 = at(0, 0, 1) * (1 - tx) + at(1, 0, 1) * tx
    c11 = at(0, 1, 1) * (1 - tx) + at(1, 1, 1) * tx
    c0 = c00 * (1 - ty) + c10 * ty
    c1 = c01 * (1 - ty) + c11 * ty
    return (c0 * (1 - tz) + c1 * tz)[:, None]
