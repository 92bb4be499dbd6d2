"""FLOP estimates and MFU accounting (VERDICT r1 item 4).

Two sources, cross-checkable:

* :func:`xla_flops` — the compiled executable's own cost analysis
  (``jit(f).lower(...).compile().cost_analysis()['flops']``), exact for the
  HLO XLA actually runs.
* :func:`anisdf_hdq_flops` — analytic matmul count of one HDQ query
  (KNN + residual MLP + SDF MLP), the hot kernel the renderer spends its
  time in, for sanity-checking the XLA number.

MFU is reported against the chip's dense peak.  Roofline assumption
(documented in README): TPU v5e (v5 litepod) peak = 197 TFLOP/s bf16 /
98.5 TFLOP/s f32 per chip; the pipeline's MXU work runs bf16
(``cfg.tpu.bf16_mlp``) so the bf16 peak is the denominator.  An MLP-query
renderer is gather/latency-heavy between matmuls, so single-digit MFU is
the expected regime — the number's value is tracking it across rounds.
"""
from __future__ import annotations

import jax

TPU_V5E_PEAK_BF16 = 197e12
TPU_V5E_PEAK_F32 = 98.5e12
TPU_V5E_HBM_BW = 819e9  # bytes/s — the memory roofline for gather-bound phases


def compiled_cost(jitfn, *args, **kwargs) -> dict:
    """``{'flops': F, 'bytes': B}`` for ONE call of an already-jitted function
    per XLA's own cost model (``lower().compile().cost_analysis()``).  The
    executable comes from the jit cache when the call signature was already
    traced, so this costs milliseconds; zeros when the backend exposes no
    cost analysis."""
    try:
        ca = jitfn.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if not ca:
            return {'flops': 0.0, 'bytes': 0.0}
        return {'flops': float(ca.get('flops', 0.0)),
                'bytes': float(ca.get('bytes accessed', 0.0))}
    except Exception:
        return {'flops': 0.0, 'bytes': 0.0}


def hbm_util(nbytes: float | None, seconds: float,
             bw: float = TPU_V5E_HBM_BW) -> float | None:
    """HBM bandwidth utilization in percent (memory roofline)."""
    if not nbytes or seconds <= 0:
        return None
    return 100.0 * nbytes / seconds / bw


def xla_flops(fn, *args, static_argnums=()) -> float | None:
    """FLOPs of one call of ``fn(*args)`` per XLA's cost model, or None when
    the backend does not expose cost analysis."""
    try:
        compiled = jax.jit(fn, static_argnums=static_argnums).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if not ca:
            return None
        return float(ca.get('flops', 0.0)) or None
    except Exception:
        return None


def mfu(flops: float | None, seconds: float,
        peak: float = TPU_V5E_PEAK_BF16) -> float | None:
    """Model FLOP utilization in percent."""
    if not flops or seconds <= 0:
        return None
    return 100.0 * flops / seconds / peak


def mlp_flops(dims) -> int:
    """2 * sum of matmul sizes for an MLP given layer dims [d0, d1, ...]."""
    return int(sum(2 * a * b for a, b in zip(dims, dims[1:])))


def anisdf_hdq_flops(mcfg, n_points: int, n_verts: int) -> int:
    """Analytic FLOPs of n_points HDQ world-SDF queries: brute KNN distance
    products + residual MLP (8x256) + SDF MLP (8x256) per query.  Embedding
    trig and gathers are not counted (latency-, not FLOP-bound)."""
    from relightableavatar_tpu.ops.embedder import embed_dim
    knn = 8 * n_verts                       # diff + square + reduce, 3 dims
    resd = mlp_flops([embed_dim(3, mcfg.xyz_res) + mcfg.cond_dim] +
                     [256] * 8 + [3])
    sdf = mlp_flops([embed_dim(3, mcfg.sdf_res)] + [256] * 8 +
                    [1 + mcfg.feat_dim])
    return n_points * (knn + resd + sdf)
