"""Fused sphere tracing over the HDQ world SDF (TPU-native).

Re-design of the reference tracer
(``lib/networks/renderer/sphere_tracing_renderer.py:20-216``): the signed
fixed-iteration sphere tracer with relax+offset stepping, sign-flip linear
surface refinement, closest-distance tracking, Claybook penumbra banding
removal, and the DFSS cone occlusion ``d / (2 t tan)``.

TPU-first: the Python-level per-iteration kernel-launch loop becomes ONE
``lax.fori_loop`` whose body fuses the entire HDQ query (KNN -> inverse LBS ->
residual MLP -> SDF MLP -> hierarchical blend) with the stepping math — 16
iterations compile to a single XLA computation with no host round-trips.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class STConfig(NamedTuple):
    """Static sphere-tracing knobs (reference cfg.sphere_tracing /
    cfg.obj_lvis / cfg.env_lvis, config.py:116-146)."""
    iter: int = 16
    tan_i: float = 1000.0
    relax: float = 0.0
    offset: float = 0.02
    eps: float = 1e-8
    near_offset: float = 0.01
    shadow_skip_iter: int = 1
    tan_i_multiplier: float = 1.0
    clay_book: bool = True
    dist_th: float | None = None     # HDQ band override for shadow queries

    @classmethod
    def from_cfg(cls, node, clay_book: bool = True) -> "STConfig":
        return cls(iter=int(node.get('iter', 16)),
                   tan_i=float(node.get('tan_i', 1000.0)),
                   relax=float(node.get('relax', 0.0)),
                   offset=float(node.get('offset', 0.02)),
                   eps=float(node.get('eps', 1e-8)),
                   near_offset=float(node.get('near_offset', 0.01)),
                   shadow_skip_iter=int(node.get('shadow_skip_iter', 1)),
                   tan_i_multiplier=float(node.get('tan_i_multiplier', 1.0)),
                   clay_book=clay_book,
                   dist_th=node.get('dist_th', None))


def sphere_trace(sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
                 ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                 near: jnp.ndarray, far: jnp.ndarray,
                 st: STConfig,
                 tan_i: jnp.ndarray | float | None = None,
                 soft_shadow: bool = False,
                 premarch_sdf_fn: Callable | None = None,
                 premarch_iter: int = 0):
    """Trace P rays against a world-space SDF.

    ray_o/ray_d (P, 3); near/far (P,) or (P, 1); tan_i per-ray sharpness for
    soft shadows.  Returns (surf, edge, occ, st_t, ot_t): (P,3) x2, (P,1) x3.
    Mirrors sphere_tracing_renderer.py:107-216 semantics exactly.

    ``premarch_sdf_fn``/``premarch_iter``: before the exact trace, advance
    ``t`` with ``premarch_iter`` sphere-trace steps on a CONSERVATIVE lower
    bound of the SDF (ops/sdf_grid.py:grid_sdf_lower_bound) — a march on a
    lower bound of a 1-Lipschitz SDF provably never crosses the true
    surface, so the exact phase simply starts from a tightened ``near``
    with fresh state and its semantics are untouched.  TPU-motivated: one
    exact HDQ iteration costs ~12x a packed-grid trilerp iteration, so the
    long-haul approach is better spent on the cache; pair with a reduced
    ``st.iter`` (cfg.tpu.surf_exact_iters) to bank the saving.  (An earlier
    variant carried the warm-up's d0/dt/closest-distance state into the
    exact phase; voxel-interpolated distances in the bookkeeping eroded ~3%
    of grazing hits — hence march-only + fresh state.)
    """
    P = ray_o.shape[0]
    ones = jnp.ones((P, 1), ray_o.dtype)
    near = near.reshape(P, 1) * jnp.ones_like(ones)
    far = far.reshape(P, 1) * jnp.ones_like(ones)

    if not soft_shadow:
        tan_i_val = ones * st.tan_i          # hard shadow (reference :113-116)
    else:
        ti = tan_i if tan_i is not None else st.tan_i
        ti = ti.reshape(P, 1) if isinstance(ti, jnp.ndarray) else ones * ti
        tan_i_val = st.tan_i_multiplier * ti

    tan = ones / tan_i_val
    off0 = ones * st.offset
    rlx0 = ones * st.relax
    eps = st.eps

    start = near
    if premarch_sdf_fn is not None and premarch_iter > 0:
        # conservative pre-march: step by max(lower_bound, 0).  Stalls (the
        # bound goes <= 0 within ~a voxel of any surface) leave t safely
        # outside; punch-throughs park t at far, where the exact phase
        # immediately re-confirms the miss.  t stays in [near, far], i.e.
        # inside the world bounds the cache grid covers.
        def pbody(_, t):
            d = premarch_sdf_fn(ray_o + t * ray_d)
            return jnp.clip(t + jnp.maximum(d, 0.0), near, far)
        start = jax.lax.fori_loop(0, premarch_iter, pbody, near)

    state = dict(
        t=start,
        d0=ones * 1e9,
        occ=ones,
        st=far,
        ot=far,
        cd=ones * 1e9,
        dt=ones * 1e9,
        off=off0,
        rlx=rlx0,
    )

    def make_body(query_fn):
      def body(i, s):
        ray_f = ray_o + s['t'] * ray_d
        d1 = query_fn(ray_f)                                 # (P, 1) — heavy

        occ, ot = s['occ'], s['ot']
        if soft_shadow and st.clay_book:
            # Claybook banding removal (reference :157-172)
            dx0 = s['d0'] + s['rlx'] * s['d0'] + s['off']
            dx1 = d1 + s['rlx'] * d1 + s['off']
            dy = (dx1 ** 2) / (2 * dx0)
            dx = (jnp.sqrt(jnp.clip(dx1 ** 2 - dy ** 2, 0.0)) - s['off']) / (1 + s['rlx'])
            cls = jnp.clip(dx, 0.0) / jnp.maximum(jnp.maximum(s['t'] - dy, near), eps) / (tan * 2)
            msk = (cls < occ) & (i >= st.shadow_skip_iter)
            msk &= (dy < s['t']) & (dx1 > 0) & (dx0 > 0) & (dx > 0) & (dy > 0) & (dy < dx0)
            msk &= jnp.isfinite(cls)
            ot = jnp.where(msk, s['t'] - dy, ot)
            occ = jnp.where(msk, cls, occ)

        # DFSS cone occlusion (reference :175-179)
        cls = jnp.clip(d1, 0.0) / jnp.maximum(jnp.maximum(s['t'], near), eps) / (tan * 2)
        msk = (cls < occ) & (i >= st.shadow_skip_iter)
        ot = jnp.where(msk, s['t'], ot)
        occ = jnp.where(msk, cls, occ)

        st_t, off, rlx, cd = s['st'], s['off'], s['rlx'], s['cd']
        if not soft_shadow:
            d1_udf = jnp.abs(d1)
            d0_udf = jnp.abs(s['d0'])
            # sign-flip linear-interp surface refinement (reference :187-191)
            msk = jnp.sign(s['d0']) != jnp.sign(d1)
            interp = s['t'] - s['dt'] * jnp.clip(d1_udf / (d0_udf + d1_udf + eps), 0.0, 1.0)
            st_t = jnp.where(msk, interp, st_t)
            off = jnp.where(msk, 0.0, off)
            rlx = jnp.where(msk, 0.0, rlx)
            # closest-distance tracking (reference :194-197)
            msk = d1_udf < cd
            cd = jnp.where(msk, d1_udf, cd)
            st_t = jnp.where(msk, s['t'], st_t)

        # relax + offset stepping (reference :200-207)
        dt = d1 + rlx * d1 + off
        t = s['t'] + dt
        t = jnp.minimum(t, far)
        t = jnp.maximum(t, near)

        return dict(t=t, d0=d1, occ=occ, st=st_t, ot=ot, cd=cd, dt=dt,
                    off=off, rlx=rlx)
      return body

    state = jax.lax.fori_loop(0, st.iter, make_body(sdf_fn), state)

    surf = ray_o + state['st'] * ray_d
    edge = ray_o + state['ot'] * ray_d
    return surf, edge, state['occ'], state['st'], state['ot']


def safe_miss_march(lb_fn, ray_o, ray_d, near, far, tan_i: float,
                    margin: float = 0.01, iters: int = 32) -> jnp.ndarray:
    """March every ray on a conservative SDF lower bound with step
    ``max(d_lb - m(t), 0)``, ``m(t) = margin + 2 t / tan_i``; returns a
    (P,) bool marking rays PROVEN to be clean misses (they covered
    ``[near, far]`` with the margin intact, so the exact tracer's DFSS
    ``cls`` stays >= 1 everywhere along them — see
    :func:`sphere_trace_miss_skip` for the proof sketch)."""
    P = ray_o.shape[0]
    near = near.reshape(P, 1)
    far = far.reshape(P, 1)
    m_slope = 2.0 / tan_i

    def mbody(_, t):
        d = lb_fn(ray_o + t * ray_d)
        m = margin + t * m_slope
        return jnp.minimum(t + jnp.maximum(d - m, 0.0), far)

    t_end = jax.lax.fori_loop(0, iters, mbody, near)
    return t_end[:, 0] >= far[:, 0] - 1e-6


def sphere_trace_miss_skip(sdf_fn, lb_fn,
                           ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                           near: jnp.ndarray, far: jnp.ndarray,
                           st: STConfig,
                           skip_iter: int = 32, margin: float = 0.01,
                           sub_block: int = 1024):
    """Camera-ray trace with a provably-exact miss skip.

    The headline frame spends 91% of its time in the 16-iteration exact HDQ
    trace, and a large fraction of in-bbox rays are clean misses (plus the
    ray-block padding lanes).  This wrapper first marches ALL rays on the
    baked grid's conservative lower bound (``lb_fn``, one row-gather per
    query — ~100x cheaper than an HDQ iteration) with step
    ``max(d_lb - m(t), 0)`` where ``m(t) = margin + 2 t / tan_i``:

    - ``d_lb <= d_true`` (grid_sdf_lower_bound), so every stepped segment
      ``[t, t + d_lb - m]`` provably has ``d_true >= m(t)`` along it
      (1-Lipschitz).  A ray that covers ``[near, far]`` this way therefore
      keeps DFSS ``cls = d * tan_i / (2 t) >= 1`` at EVERY point the exact
      tracer could sample, so its exact-trace result is exactly
      ``occ = 1`` (clean miss, outside the sub-voxel AA band) — skipping it
      changes no pixel.
    - survivors are sorted to the front (one argsort of the ray block) and
      traced exactly in ``sub_block`` slices; fully-miss slices are skipped
      at runtime by ``lax.cond`` (same block-skip pattern as the shadow
      compaction in sphere_tracing.py light_visibility).  Survivors trace
      from their ORIGINAL near with the full iteration budget — the march
      result is used for classification only — so every unskipped ray's
      output is bit-identical to the plain trace.  (Starting survivors at
      the march's stall position converges faster but shifts where the
      under-converged/AA rays sample, i.e. it is no longer pixel-exact;
      that lossy banking stays on the separate surf_grid_iters knob.)

    Returns the same (surf, edge, occ, st_t, ot_t) tuple as
    :func:`sphere_trace`; skipped rays report the clean-miss state
    (st = ot = far, occ = 1).
    """
    P = ray_o.shape[0]
    near = near.reshape(P, 1)
    far = far.reshape(P, 1)
    miss = safe_miss_march(lb_fn, ray_o, ray_d, near, far, st.tan_i,
                           margin, skip_iter)

    pad = (-P) % sub_block
    if pad:
        z = lambda a, v: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], v, a.dtype)])
        ray_o = z(ray_o, 0.0)
        ray_d = z(ray_d, 1.0)
        near = z(near, 1.0)
        far = z(far, 1.0)           # near == far: padding traces are no-ops
        miss = jnp.concatenate([miss, jnp.ones((pad,), bool)])
    Pp = ray_o.shape[0]

    order = jnp.argsort(miss, stable=True)            # active rays first
    n_active = jnp.sum((~miss).astype(jnp.int32))
    ro = ray_o[order]
    rd = ray_d[order]
    nr = near[order]
    fr = far[order]

    nsub = Pp // sub_block

    def scan_body(carry, args):
        i, ro_b, rd_b, nr_b, fr_b = args

        def trace(_):
            return sphere_trace(sdf_fn, ro_b, rd_b, nr_b, fr_b, st,
                                soft_shadow=False)

        def skip(_):
            end = ro_b + fr_b * rd_b
            return (end, end, jnp.ones_like(fr_b), fr_b, fr_b)

        out = jax.lax.cond(i * sub_block < n_active, trace, skip, None)
        return carry, out

    _, outs = jax.lax.scan(
        scan_body, None,
        (jnp.arange(nsub),
         ro.reshape(nsub, sub_block, 3), rd.reshape(nsub, sub_block, 3),
         nr.reshape(nsub, sub_block, 1), fr.reshape(nsub, sub_block, 1)))

    def unsort(a):
        flat = a.reshape(Pp, a.shape[-1])
        return jnp.zeros_like(flat).at[order].set(flat)[:P]

    surf, edge, occ, st_t, ot_t = (unsort(o) for o in outs)
    return surf, edge, occ, st_t, ot_t


def softer_shadow(sdf_fn, ray_o, ray_d, near, far, st: STConfig,
                  tan_i=None, **_):
    """Inverse-sqrt-stepping DFSS tracer (reference :219-262)."""
    P = ray_o.shape[0]
    ones = jnp.ones((P, 1), ray_o.dtype)
    near = near.reshape(P, 1) * ones
    far = far.reshape(P, 1) * ones
    ti = tan_i if tan_i is not None else st.tan_i
    ti = ti.reshape(P, 1) if isinstance(ti, jnp.ndarray) else ones * ti
    tan = ones / ti
    eps = st.eps

    def body(i, s):
        t, occ = s
        h = sdf_fn(ray_o + t * ray_d) + t * tan
        occ = jnp.minimum(occ, jnp.clip(h, eps) / jnp.clip(t, eps) / (2 * tan))
        t = t + h * jax.lax.rsqrt(t + 1)
        t = jnp.maximum(t, near)
        t = jnp.minimum(t, far)
        return (t, occ)

    t, occ = jax.lax.fori_loop(0, st.iter, body, (near, ones))
    edge = ray_o + t * ray_d
    return edge, edge, occ, t, t
