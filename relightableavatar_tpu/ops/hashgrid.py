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
    offs = jnp.asarray(_OFFSETS, jnp.int32)                      # (8, 3)

    res = np.asarray(hcfg.level_resolutions, np.int64)           # (L,)
    # grid has `res` entries per side -> cell size 1/(res-1), border inside
    # (embedder.py:79-82 semantics)
    N = x.shape[0]
    F = hcfg.n_features

    # TPU layout strategy (load-bearing, measured): every per-level tensor
    # in the scan body is ONE-DIMENSIONAL (N,).  Any (N, 8) weight /
    # (N, 8, F) corner-feature temp puts 8 or F=2 on the lane dimension,
    # which the (8, 128) tiled layout pads 16-64x — and because the SDF
    # normal path runs hash_encode under jvp, the linearized scan SAVES
    # those temps stacked over all L levels for the transpose (remat does
    # not apply to linearized scans): three 8 GB HLO temps at L16 x batch 4
    # x 32k samples = compile-time HBM OOM.  Unrolling the 8 corners (and
    # the F features) in Python keeps residuals at (L, B, N) unpadded.
    # lax.scan over levels bounds live temps to one level's working set.
    def level(carry, xs):
        table_l, scale_l, r_l, dense_l = xs               # (T*F,), scalars
        flt = xn * scale_l                                        # (N, 3)
        base = jnp.clip(jnp.floor(flt).astype(jnp.int32), 0, r_l - 1)
        frac = flt - base                                         # (N, 3)
        bx, by, bz = base[:, 0], base[:, 1], base[:, 2]
        fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
        feats = [jnp.zeros_like(fx) for _ in range(F)]
        for k in range(8):                                 # static unroll
            ox, oy, oz = (int(v) for v in _OFFSETS[k])
            cx = jnp.minimum(bx + ox, r_l - 1)
            cy = jnp.minimum(by + oy, r_l - 1)
            cz = jnp.minimum(bz + oz, r_l - 1)
            # dense levels use row-major x*r^2 + y*r + z, hashed levels
            # the XOR-prime hash; both then land in [0, T)
            idx_dense = (cx * r_l + cy) * r_l + cz                # (N,)
            idx_hash = ((cx * _PRIMES[0]) ^ (cy * _PRIMES[1]) ^
                        (cz * _PRIMES[2])) & mask
            idx = jnp.where(dense_l, idx_dense, idx_hash)         # (N,)
            # full trilinear weight (fixes the reference's dropped-z bug)
            wk = ((fx if ox else 1.0 - fx) * (fy if oy else 1.0 - fy)
                  * (fz if oz else 1.0 - fz))                     # (N,)
            col = idx * F                  # flat (T*F,) table, see init
            for f in range(F):
                feats[f] = feats[f] + wk * table_l[col + f]
        if hcfg.sum_levels and hcfg.sum_over_features:
            out = feats[0]
            for f in range(1, F):
                out = out + feats[f]
            return carry, out                                     # (N,)
        f_l = jnp.stack(feats, 0)                                 # (F, N)
        if hcfg.sum_levels:
            return carry + f_l, None
        return carry, f_l

    scale = jnp.asarray((res - 1).astype(np.float32))             # (L,)
    r_all = jnp.asarray(res, jnp.int32)
    dense_all = jnp.asarray(res ** 3 <= T)
    carry0 = jnp.zeros((F, N), xn.dtype)
    carry, ys = jax.lax.scan(level, carry0,
                             (table, scale, r_all, dense_all))
    if hcfg.sum_levels:
        feat = (jnp.transpose(ys, (1, 0)) if hcfg.sum_over_features
                else jnp.transpose(carry, (1, 0)))
        if hcfg.include_input:
            feat = jnp.concatenate([xn, feat], axis=-1)
        return feat.reshape(*shape[:-1], hcfg.out_dim)
    feat = jnp.transpose(ys, (2, 0, 1))                           # (N, L, F)
    feat = feat.reshape(N, hcfg.n_levels * F)
    if hcfg.include_input:
        feat = jnp.concatenate([xn, feat], axis=-1)
    return feat.reshape(*shape[:-1], hcfg.out_dim)


def get_hash_embedder(hcfg: HashGridConfig, key: jax.Array):
    """(embed_fn(params, x), params, out_dim) — registry hook for
    e_type='hash' (reference get_embedder embedder.py:217-224)."""
    params = hash_encoding_init(key, hcfg)
    return hash_encode, params, hcfg.out_dim
