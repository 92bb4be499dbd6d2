"""Multi-resolution hash-grid encoding (Instant-NGP style), pure jnp.

Covers the reference ``HashEncoding`` (lib/networks/embedder.py:40-214) —
implemented but dormant there (live configs use ``e_type='pe'``); same here.

TPU-first design choices (vs the reference's torch version):

- ONE unified flat ``(L, T*F)`` table (the reference's ``separate_dense=False``
  layout): every level does the same gather, so XLA sees a single
  static-shape ``take_along_axis`` instead of two differently-shaped ones.
  Dense levels (grid fits the table) index directly; finer levels hash.
- Table size is ``2**log2_hashmap_size`` exactly (power of two), so the
  modulo folds to a bitwise AND on the VPU.  The reference uses
  ``nextprime(2**t)`` — with XOR-prime hashing the prime table adds nothing
  but an integer division.
- Correct trilinear interpolation.  The reference computes the corner
  weights over x·y only (``mul_xyz[..., 0] * mul_xyz[..., 1]``,
  embedder.py:184-185 — the z factor is dropped); we use the full
  x·y·z product.  Deliberate behavioural deviation (bug fix).
- Border clamp for out-of-bounds queries (the reference extrapolates with
  unbounded weights via its unclamped ``off_xyz``) — second deliberate
  deviation: features saturate at the boundary value.

Functional API: ``hash_encoding_init`` -> params pytree, ``hash_encode``
applies it; shapes are static functions of ``HashGridConfig`` alone.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# XOR-prime spatial hash constants (standard NGP choice; reference ps
# embedder.py:55 uses the same first-three primes with p0 = 1).
_PRIMES = (1, 19349663, 83492791)


class HashGridConfig(NamedTuple):
    bounds_lo: Tuple[float, float, float] = (-2.0, -2.0, -2.0)
    bounds_hi: Tuple[float, float, float] = (2.0, 2.0, 2.0)
    n_levels: int = 16
    n_features: int = 16          # F per level (reference default 16)
    growth: float = 1.38          # per-level resolution multiplier b
    log2_hashmap_size: int = 20   # T = 2**this
    base_resolution: int = 16
    sum_levels: bool = True          # reference ``sum``
    sum_over_features: bool = True   # reference ``sum_over_features``
    include_input: bool = True

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def level_resolutions(self) -> Tuple[int, ...]:
        return tuple(int(self.base_resolution * self.growth ** i)
                     for i in range(self.n_levels))

    @property
    def out_dim(self) -> int:
        if self.sum_levels:
            d = self.n_levels if self.sum_over_features else self.n_features
        else:
            d = self.n_levels * self.n_features
        return d + (3 if self.include_input else 0)


def hash_encoding_init(key: jax.Array, hcfg: HashGridConfig) -> jnp.ndarray:
    """Kaiming-normal table, stored FLAT as (L, T*F) — matches reference
    init intent (embedder.py:100-106).

    Layout note (load-bearing on TPU): a (L, T, F) table with small F puts
    F on the lane dimension, which the (8, 128) tiled layout pads to 128 —
    64x HBM expansion at F=2 for the parameter, its Adam moments, AND every
    gradient-accumulation buffer the train step's scan transpose carries
    (measured: 2 GB HLO temps, compile-time HBM OOM).  Flat (L, T*F) keeps
    the lane dimension large; entries of cell (t) live at [t*F : t*F+F].
    """
    L, T, F = hcfg.n_levels, hcfg.table_size, hcfg.n_features
    std = float(np.sqrt(2.0 / T))  # kaiming over the fan-in dim torch uses
    return std * jax.random.normal(key, (L, T * F), jnp.float32)


# 8 corner offsets of a unit cell, (8, 3) — static.
_OFFSETS = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                indexing="ij"), -1).reshape(8, 3)


def hash_encode(table: jnp.ndarray, hcfg: HashGridConfig,
                xyz: jnp.ndarray) -> jnp.ndarray:
    """xyz (..., 3) -> (..., out_dim).

    Per level: scale normalized coords to the level grid, gather the 8 cell
    corners (direct index when the dense grid fits in the table, XOR-prime
    hash otherwise — embedder.py:151-165 semantics), trilerp, then aggregate
    levels per cfg.

    TPU gather strategy (VERDICT r3 item 4 — gathers are ROW-count bound,
    ~10x cheaper per byte for wide rows, ops/sdf_grid.py measurement):

    - DENSE levels (res^3 <= T; a static prefix of the monotone level list)
      are Python-unrolled.  Each level's grid slice is repacked in-jit into
      an (r-1)^3 x 8F cell-corner table (pure slicing of the trainable flat
      table — cheap, differentiable), so the whole trilerp needs ONE row
      gather per level instead of 8F scalar gathers.
    - HASHED levels keep the lax.scan (uniform shapes, bounded memory) but
      gather (F,)-wide rows per corner from the (T, F) view of the flat
      table: 8 row gathers per level instead of 8F scalar gathers.
    - Gathered rows are split into (N,) scalars IMMEDIATELY: every value
      that survives into the jvp-linearized SDF-normal path (and hence into
      scan residuals) stays 1-D, keeping the r3 flat-layout OOM fix intact
      (the (N, small) temps that pad 16-64x under the tiled layout are
      transient inside one fused gather+slice).

    At the model config (L16, F2, T 2^19: 6 dense + 10 hashed levels) this
    cuts gather rows 256N -> 86N per encode.
    """
    shape = xyz.shape
    x = xyz.reshape(-1, 3)
    lo = jnp.asarray(hcfg.bounds_lo, x.dtype)
    hi = jnp.asarray(hcfg.bounds_hi, x.dtype)
    # border clamp: out-of-bounds queries take the boundary feature instead
    # of extrapolating with weights outside [0, 1]
    xn = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)                # (N, 3)

    T = hcfg.table_size
    mask = T - 1
    res = np.asarray(hcfg.level_resolutions, np.int64)           # (L,)
    # grid has `res` entries per side -> cell size 1/(res-1), border inside
    # (embedder.py:79-82 semantics)
    N = x.shape[0]
    F = hcfg.n_features
    dense_np = res ** 3 <= T
    # resolutions are monotone non-decreasing -> dense levels are a prefix
    D = int(np.sum(dense_np))
    assert bool(np.all(dense_np[:D])) and not np.any(dense_np[D:]), res

    def trilerp_weight(frac, k):
        ox, oy, oz = (int(v) for v in _OFFSETS[k])
        fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
        # full trilinear weight (fixes the reference's dropped-z bug)
        return ((fx if ox else 1.0 - fx) * (fy if oy else 1.0 - fy)
                * (fz if oz else 1.0 - fz))

    # ---- dense prefix: unrolled, packed-corner rows, ONE gather per level
    dense_outs = []                                  # list of [F x (N,)]
    for li in range(D):
        r = int(res[li])
        c = r - 1                                     # cells per side
        flt = xn * float(r - 1)
        base = jnp.clip(jnp.floor(flt).astype(jnp.int32), 0, max(c - 1, 0))
        frac = flt - base                             # in [0, 1] incl. border
        grid = table[li, :r * r * r * F].reshape(r, r, r, F)
        packed = jnp.concatenate(
            [grid[dx:c + dx, dy:c + dy, dz:c + dz]
             for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
            axis=-1).reshape(c * c * c, 8 * F)        # corner-major cols
        cell = (base[:, 0] * c + base[:, 1]) * c + base[:, 2]
        rows = packed[cell]                           # (N, 8F): the gather
        feats = [jnp.zeros_like(flt[:, 0]) for _ in range(F)]
        for k in range(8):
            wk = trilerp_weight(frac, k)
            for f in range(F):
                feats[f] = feats[f] + wk * rows[:, k * F + f]
        dense_outs.append(feats)

    # ---- hashed suffix: scan, (F,)-wide row gather per corner
    def level(carry, xs):
        table_l, scale_l, r_l = xs                    # (T, F), scalars
        flt = xn * scale_l                                        # (N, 3)
        base = jnp.clip(jnp.floor(flt).astype(jnp.int32), 0, r_l - 1)
        frac = flt - base                                         # (N, 3)
        bx, by, bz = base[:, 0], base[:, 1], base[:, 2]
        feats = [jnp.zeros_like(flt[:, 0]) for _ in range(F)]
        for k in range(8):                                 # static unroll
            ox, oy, oz = (int(v) for v in _OFFSETS[k])
            cx = jnp.minimum(bx + ox, r_l - 1)
            cy = jnp.minimum(by + oy, r_l - 1)
            cz = jnp.minimum(bz + oz, r_l - 1)
            idx = ((cx * _PRIMES[0]) ^ (cy * _PRIMES[1]) ^
                   (cz * _PRIMES[2])) & mask                      # (N,)
            wk = trilerp_weight(frac, k)
            row = table_l[idx]                      # (N, F) one row gather
            for f in range(F):
                feats[f] = feats[f] + wk * row[:, f]
        if hcfg.sum_levels and hcfg.sum_over_features:
            out = feats[0]
            for f in range(1, F):
                out = out + feats[f]
            return carry, out                                     # (N,)
        f_l = jnp.stack(feats, 0)                                 # (F, N)
        if hcfg.sum_levels:
            return carry + f_l, None
        return carry, f_l

    scale_h = jnp.asarray((res[D:] - 1).astype(np.float32))      # (Lh,)
    r_h = jnp.asarray(res[D:], jnp.int32)
    carry0 = jnp.zeros((F, N), xn.dtype)
    if D < hcfg.n_levels:
        carry, ys = jax.lax.scan(level, carry0,
                                 (table[D:].reshape(-1, T, F), scale_h, r_h))
    else:
        carry, ys = carry0, None

    if hcfg.sum_levels and hcfg.sum_over_features:
        per_level = [sum(fs[1:], fs[0]) for fs in dense_outs]     # (N,) each
        if ys is not None:
            feat = jnp.concatenate(
                [jnp.stack(per_level, 1) if per_level else
                 jnp.zeros((N, 0), xn.dtype), jnp.transpose(ys, (1, 0))],
                axis=-1)                                          # (N, L)
        else:
            feat = jnp.stack(per_level, 1)
    elif hcfg.sum_levels:
        for fs in dense_outs:
            carry = carry + jnp.stack(fs, 0)
        feat = jnp.transpose(carry, (1, 0))                       # (N, F)
    else:
        parts = [jnp.stack(fs, 0)[None] for fs in dense_outs]     # (1, F, N)
        if ys is not None:
            parts.append(ys)                                      # (Lh, F, N)
        allf = jnp.concatenate(parts, axis=0)                     # (L, F, N)
        feat = jnp.transpose(allf, (2, 0, 1)).reshape(N, hcfg.n_levels * F)
    if hcfg.include_input:
        feat = jnp.concatenate([xn, feat], axis=-1)
    return feat.reshape(*shape[:-1], hcfg.out_dim)


def get_hash_embedder(hcfg: HashGridConfig, key: jax.Array):
    """(embed_fn(params, x), params, out_dim) — registry hook for
    e_type='hash' (reference get_embedder embedder.py:217-224)."""
    params = hash_encoding_init(key, hcfg)
    return hash_encode, params, hcfg.out_dim
