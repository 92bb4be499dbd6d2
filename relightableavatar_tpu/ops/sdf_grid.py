"""Per-frame SDF voxel-grid cache for shadow-ray tracing (pure jnp).

A TPU-specific accelerator with no reference equivalent (the reference
traces every one of its P×512 env shadow rays through the full HDQ query,
sphere_tracing_renderer.py:265-344 — its code comment prices that at "2 and
a half minutes to render an 1024x1024 image", lib/config/config.py:127).

Observation: soft shadows are low-frequency.  The HDQ world SDF is frozen
within a frame, so we bake it once into a dense voxel grid over the (tightly
padded) body bbox and shadow rays march trilinear lookups instead of
KNN→LBS→MLP chains.  The camera-facing surface pass keeps the exact HDQ SDF;
only light visibility (and the DFSS cone distances, which are exactly the
grid values) uses the cache.  Enabled by ``cfg.tpu.shadow_grid`` (voxels on
the longest axis, 0=off).

Resolution is PER-AXIS (``res`` is a 3-tuple): the body bbox is strongly
anisotropic (~2.4 x 1.3 x 1.3 m for a standing human), and near-isotropic
voxels both cut the bake cost ~2.4x and keep the slice-sweep visibility
drift |d_b/d_a * voxel_a/voxel_b| <= 1 (ops/lvis_sweep.py needs that for
its half-voxel path-deviation bound).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def resolve_res(res) -> tuple:
    """int -> cubic tuple; tuple passes through."""
    if isinstance(res, (tuple, list)):
        assert len(res) == 3, res
        return tuple(int(r) for r in res)
    return (int(res),) * 3


def axis_resolutions(extents, n: int, min_res: int = 17) -> tuple:
    """Per-axis lattice sizes: ``n`` points on the longest axis, others
    scaled by extent (near-isotropic voxels).  ``extents`` is host-side."""
    import numpy as np
    e = np.asarray(extents, np.float64).reshape(3)
    scale = e / max(float(e.max()), 1e-6)
    return tuple(int(max(min_res, round(n * s))) for s in scale)


def build_sdf_grid(sdf_fn, lo: jnp.ndarray, hi: jnp.ndarray, res,
                   chunk: int = 262144) -> jnp.ndarray:
    """Evaluate ``sdf_fn`` at the nodes of a (Rx, Ry, Rz) lattice spanning
    [lo, hi] (inclusive corners) -> (Rx, Ry, Rz) float32."""
    res = resolve_res(res)
    ax = [jnp.linspace(lo[i], hi[i], res[i]) for i in range(3)]
    X, Y, Z = jnp.meshgrid(*ax, indexing="ij")
    pts = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)           # (N, 3)
    n = pts.shape[0]
    # ``chunk`` is a ceiling, not the block size: snapping the lattice to a
    # fixed 256k block pads 853k nodes to 1.05M evals (23% wasted HDQ
    # queries, ~35 ms/frame measured).  Use the smallest lane-aligned block
    # that covers n in the same number of launches.
    nblk = -(-n // min(chunk, n))
    per_blk = -(-n // nblk)
    chunk = -(-per_blk // 1024) * 1024                           # lane multiple
    pad = (-n) % chunk
    if pad:
        pts = jnp.concatenate([pts, jnp.broadcast_to(pts[:1], (pad, 3))])
    blocks = pts.reshape(-1, chunk, 3)
    vals = jax.lax.map(lambda p: sdf_fn(p)[:, 0], blocks).reshape(-1)
    return vals[:n].reshape(res)


@partial(jax.jit, static_argnames=("mcfg", "res", "dist_th", "packed",
                                   "verts_sub"))
def build_hdq_grid(params, mcfg, ctx, lo, hi, res,
                   dist_th: float | None = None,
                   packed: bool = False,
                   verts_sub: bool = False) -> jnp.ndarray:
    """Jitted per-frame bake of the HDQ world SDF (params/ctx as arguments —
    large closure constants would blow the remote-compile payload).
    ``packed=True`` returns the cell-corner table (the fast lookup layout).
    ``verts_sub`` bakes with the 1/4-vertex KNN subsample
    (cfg.tpu.shadow_verts_sub — the grid feeds only shadow visibility)."""
    from relightableavatar_tpu.models import anisdf
    hdq = lambda x: anisdf.hdq_sdf(params, mcfg, ctx, x,
                                   smooth_transition=True, dist_th=dist_th,
                                   verts_sub=verts_sub)
    grid = build_sdf_grid(hdq, lo, hi, res)
    return pack_grid_corners(grid) if packed else grid


def pack_grid_corners(grid: jnp.ndarray) -> jnp.ndarray:
    """(Rx, Ry, Rz) -> (Rx-1, Ry-1, Rz-1, 8) cell-corner table.

    TPU gathers are row-count-bound, not byte-bound: 8 separate scalar
    gathers per query cost ~10x one 8-float row gather (measured on v5e:
    2.0 ms vs 0.2 ms per 32k points).  Packing every cell's corners into
    one row turns the trilerp into a single gather + an 8-wide dot."""
    Rx, Ry, Rz = grid.shape
    c = [grid[dx:Rx - 1 + dx, dy:Ry - 1 + dy, dz:Rz - 1 + dz]
         for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    return jnp.stack(c, axis=-1)


def grid_sdf_lower_bound(grid: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                         x: jnp.ndarray) -> jnp.ndarray:
    """Conservative lower bound on the SDF from the packed corner table:
    min over the cell's corners minus half the cell diagonal (a 1-Lipschitz
    SDF inside a cell is >= that).  Trilerp OVERestimates the distance near
    sub-voxel features, so a sphere-trace warm-up on it can step through a
    grazing hit and erode silhouettes (measured: ~3% of rays flip acc);
    marching this bound can never pass a true surface."""
    if grid.ndim == 3:
        grid = pack_grid_corners(grid)
    cx, cy, cz = grid.shape[:3]
    flat = grid.reshape(cx * cy * cz, 8)
    res = jnp.asarray([cx + 1, cy + 1, cz + 1], x.dtype)
    voxel = (hi - lo) / (res - 1)
    half_diag = 0.5 * jnp.sqrt(jnp.sum(voxel ** 2))
    f = (x - lo) / (hi - lo) * (res - 1)
    f = jnp.clip(f, 0.0, res - 1 - 1e-4)
    b = jnp.floor(f).astype(jnp.int32)
    rows = flat[(b[:, 0] * cy + b[:, 1]) * cz + b[:, 2]]      # (P, 8)
    return (jnp.min(rows, axis=-1, keepdims=True) - half_diag).astype(x.dtype)


def grid_sdf(grid: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
             x: jnp.ndarray) -> jnp.ndarray:
    """Trilinear lookup, (P, 3) -> (P, 1); queries clamp to the box (shadow
    rays are AABB-clipped to it before tracing).

    ``grid`` is either the raw (Rx, Ry, Rz) lattice or the packed 4D
    (Rx-1, Ry-1, Rz-1, 8) corner table from :func:`pack_grid_corners` (the
    fast path — one row gather per query instead of eight scalar gathers)."""
    if grid.ndim == 3:
        grid = pack_grid_corners(grid)
    cx, cy, cz = grid.shape[:3]                           # cells per axis
    flat = grid.reshape(cx * cy * cz, 8)
    res = jnp.asarray([cx + 1, cy + 1, cz + 1], x.dtype)
    f = (x - lo) / (hi - lo) * (res - 1)
    f = jnp.clip(f, 0.0, res - 1 - 1e-4)
    b = jnp.floor(f).astype(jnp.int32)
    t = (f - b).astype(flat.dtype)
    ix, iy, iz = b[:, 0], b[:, 1], b[:, 2]
    tx, ty, tz = t[:, 0:1], t[:, 1:2], t[:, 2:3]

    rows = flat[(ix * cy + iy) * cz + iz]                 # (P, 8)
    # corner order matches pack_grid_corners: dx major, dz minor
    wx = jnp.concatenate([1 - tx, tx], axis=-1)           # (P, 2)
    wy = jnp.concatenate([1 - ty, ty], axis=-1)
    wz = jnp.concatenate([1 - tz, tz], axis=-1)
    w = (wx[:, :, None, None] * wy[:, None, :, None]
         * wz[:, None, None, :]).reshape(-1, 8)
    return jnp.sum(rows * w, axis=-1, keepdims=True).astype(x.dtype)
