"""Sweep-based light visibility: DFSS cone occlusion for EVERY voxel and
EVERY (distant) light direction in one pass of regular, MXU-friendly work.

TPU-native redesign of the reference's env-shadow fan-out
(sphere_tracing_renderer.py:265-344): instead of sphere tracing P x L shadow
rays (each iteration a full HDQ query -> the reference prices the pass at
"2 and a half minutes per 1024x1024 image", lib/config/config.py:127), we

1. bake the frozen per-frame HDQ SDF into a voxel grid (ops/sdf_grid.py);
2. for each light direction d, compute for ALL cells at once
       r(x, d) = min_{k>=1}  clip(sdf(x + k*h*d), 0) / max(k*h, near)
   with a backward recurrence over grid slices along d's dominant axis:
       best(x) = merge( (sdf(x+D), h),  best(x+D) shifted by +h in t )
   carrying the (s*, t*) pair of the minimizing sample (the pair makes the
   running min exact for the sampled set — a plain running min of s/t does
   not survive the t-rebasing between slices);
3. the in-plane shift of each slice is applied as TWO small batched matmuls
   with per-direction shift operators — no gathers anywhere in the sweep
   (TPU gathers are row-count-bound and would dominate).  The carried state
   moves on a Bresenham-quantized integer lattice (a permutation matrix per
   step — fractional bilinear shifts of the STATE smear it by
   ~sqrt(n_steps) voxels by the far end; measured occ errors up to 0.8 at
   penumbra edges); the first sample of each ray, which dominates the cone
   ratio, is sampled with exact bilinear weights.  Deviation bound: a sample
   inserted at step 0 stays within half a voxel of the true ray path; a
   sample inserted MID-SWEEP at step k0 and read j slices downstream
   accumulates floor((k0+j)*frac) - floor(k0*frac) + j*floor(d), which can
   differ from the exact floor(j*drift) by up to ONE voxel — the test
   tolerances (test_lvis_sweep.py) absorb this; widen the exact-bilinear
   prefix M if penumbra banding is observed;
4. surface points then look up lvis with one trilinear read per (point,
   direction-set) — 8 row gathers total instead of P*L*iters HDQ queries.

The shift operators are built ON DEVICE from traced per-frame voxel sizes
(iota arithmetic) — baking them as compile-time constants would force a
recompile every frame because the body bbox moves with the pose.  Only the
direction->dominant-axis grouping is static (directions are fixed by the
light grid).

The DFSS cone factor is applied at lookup: occ_l = clip(r * tan_i_l / 2)
(renderer/tracing.py DFSS step, reference :175-179).  Claybook banding
removal is unnecessary here: banding is an artifact of sparse adaptive
sampling, and the sweep samples every slice (~1 voxel spacing).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e6


def _canonical_sweep(grid_c, drift_b, drift_c, h, near_offset):
    """Sweep rays marching toward +axis0 of ``grid_c`` (S, R1, R2).

    drift_b/drift_c (Lg,) traced: per-direction in-plane index drift per
    slice step; h (Lg,) traced: world step length.  Returns the ratio
    volume (S, Lg, R1, R2)."""
    S_, R1, R2 = grid_c.shape
    Lg = drift_b.shape[0]
    n_steps = S_ - 1
    h = jnp.asarray(h, jnp.float32).reshape(Lg, 1, 1)

    def operators(drift, R):
        """Integer (Bresenham) shift pair + step schedule + in-range row
        indicators, built from traced drifts with iota arithmetic.

        The out-of-volume pad is reconstructed from the row-weight deficit
        as (1 - wsum) * BIG.  wsum MUST be exact: computing it by pushing a
        ones-field through the shift matmuls picks up the TPU's default
        bf16 matmul error (~0.4%), and 0.004 * 1e6 = a +-4000 bias on every
        SDF sample — half the volume reads as fully occluded (measured).
        The indicators here are exact elementwise arithmetic instead."""
        i = jnp.arange(R)[:, None]
        j = jnp.arange(R)[None, :]
        d = drift[:, None, None]                              # (Lg, 1, 1)
        m = jnp.floor(d)
        S0 = ((j - i) == m).astype(jnp.float32)               # shift by m
        S1 = ((j - i) == m + 1).astype(jnp.float32)           # shift by m+1
        ivec = jnp.arange(R)[None, :]                         # (1, R)
        mi = jnp.floor(drift)[:, None]                        # (Lg, 1)
        in0 = ((ivec + mi >= 0) & (ivec + mi < R)).astype(jnp.float32)
        in1 = ((ivec + mi + 1 >= 0) & (ivec + mi + 1 < R)).astype(jnp.float32)
        k = jnp.arange(1, n_steps + 1)[:, None]               # (steps, 1)
        frac = (drift - jnp.floor(drift))[None, :]            # (1, Lg)
        mask = jnp.floor(k * frac) - jnp.floor((k - 1) * frac)
        return S0, S1, in0, in1, mask.astype(jnp.float32)     # mask (steps,Lg)

    Sb0, Sb1, inb0, inb1, maskb = operators(drift_b, R1)
    Sc0, Sc1, inc0, inc1, maskc = operators(drift_c, R2)
    Sc0, Sc1 = Sc0.transpose(0, 2, 1), Sc1.transpose(0, 2, 1)

    # The first M samples of each cell's ray dominate the cone ratio (the
    # division by small t amplifies value error: half a voxel of Bresenham
    # rounding at t = h..2h is a 0.2-0.5 occ error, measured) — evaluate
    # them with EXACT bilinear operators at k*drift; the carried state only
    # covers samples at >= (M+1) steps, where rounding is benign.
    M = min(3, n_steps)

    def frac_op(drift, R, k):
        i = jnp.arange(R)[:, None].astype(jnp.float32)
        j = jnp.arange(R)[None, :].astype(jnp.float32)
        d = (k * drift)[:, None, None]                        # (Lg, 1, 1)
        return jnp.clip(1.0 - jnp.abs(j - i - d), 0.0, 1.0)

    def frac_wsum(drift, R, k):
        """Exact row-weight of frac_op (see operators() on why the deficit
        must NOT come from a ones-field matmul)."""
        ivec = jnp.arange(R)[None, :].astype(jnp.float32)
        pos = ivec + (k * drift)[:, None]
        j0 = jnp.floor(pos)
        f = pos - j0
        in0 = ((j0 >= 0) & (j0 < R)).astype(jnp.float32)
        in1 = ((j0 + 1 >= 0) & (j0 + 1 < R)).astype(jnp.float32)
        return (1.0 - f) * in0 + f * in1                      # (Lg, R)

    fshifts, pad_fs = [], []
    for k in range(1, M + 1):
        Gb = frac_op(drift_b, R1, k)
        Gc = frac_op(drift_c, R2, k).transpose(0, 2, 1)

        def fs(F, Gb=Gb, Gc=Gc):
            return jnp.einsum('lij,ljk->lik',
                              jnp.einsum('lij,ljk->lik', Gb, F), Gc)

        fshifts.append(fs)
        wk = (frac_wsum(drift_b, R1, k)[:, :, None]
              * frac_wsum(drift_c, R2, k)[:, None, :])
        pad_fs.append((1.0 - wk) * BIG)

    def ratio(s, t):
        return jnp.clip(s, 0.0) / jnp.maximum(t, near_offset)

    # intermediate rebase horizon for the C pair (see merge comment)
    d_mid = jnp.maximum(h, near_offset) * (0.5 * n_steps)    # (Lg, 1, 1)

    def step(carry, xs):
        # carry THREE (s, t) pairs per cell summarizing samples at >= M
        # steps: A = argmin of the cone ratio at the current origin
        # (Delta=0), B = argmin of s (the optimum as the rebase
        # Delta -> inf), C = argmin at an intermediate horizon.  A single
        # pair is not associative under the +h t-rebasing between slices —
        # a far occluder with smaller s can overtake A's ratio a few
        # slices upstream (measured 0.08 ratio error even on axis-aligned
        # rays); the lower envelope of s/(t+Delta) curves can have several
        # segments, and three probes of it bound the miss to the deep-
        # penumbra tail.  ``gp`` carries the M-1 raw slices ahead of
        # g_next for the exact-prefix samples.
        As, At, Bs, Bt, Cs, Ct, gp = carry
        g_next, mb, mc = xs                                  # (R1,R2),(Lg),(Lg)
        Sb = Sb0 + mb[:, None, None] * (Sb1 - Sb0)
        Sc = Sc0 + mc[:, None, None] * (Sc1 - Sc0)

        def shift(F):
            return jnp.einsum('lij,ljk->lik',
                              jnp.einsum('lij,ljk->lik', Sb, F), Sc)

        # exact in-range weight (NOT a ones-field matmul — see operators())
        wb = inb0 + mb[:, None] * (inb1 - inb0)               # (Lg, R1)
        wc = inc0 + mc[:, None] * (inc1 - inc0)               # (Lg, R2)
        wsum = wb[:, :, None] * wc[:, None, :]
        pad = (1.0 - wsum) * BIG
        tfix = (1.0 - wsum) + h

        # exact-prefix samples at t = k*h, k = 1..M
        raw = [g_next] + list(gp)                            # (R1, R2) each
        ex_s = [fshifts[k](jnp.broadcast_to(raw[k][None], (Lg, R1, R2)))
                + pad_fs[k] for k in range(M)]
        ex_t = [h * float(k + 1) for k in range(M)]

        # state merge candidates: the M-step exact sample + shifted pairs
        cs = (ex_s[M - 1], shift(As) + pad, shift(Bs) + pad, shift(Cs) + pad)
        ct = (jnp.broadcast_to(ex_t[M - 1], cs[0].shape), shift(At) + tfix,
              shift(Bt) + tfix, shift(Ct) + tfix)

        def argmin_pair(keys):
            best = keys[0]
            for k in keys[1:]:
                best = jnp.minimum(best, k)
            s = cs[-1]
            t = ct[-1]
            for i in range(len(keys) - 2, -1, -1):
                pick = keys[i] == best
                s = jnp.where(pick, cs[i], s)
                t = jnp.where(pick, ct[i], t)
            return s, t, best

        As_n, At_n, _ = argmin_pair([ratio(s, t) for s, t in zip(cs, ct)])
        Bs_n, Bt_n, _ = argmin_pair(list(cs))
        Cs_n, Ct_n, _ = argmin_pair(
            [jnp.clip(s, 0.0) / jnp.maximum(t + d_mid, near_offset)
             for s, t in zip(cs, ct)])

        # OUTPUT: min over the exact prefix (k = 1..M-1), the state pairs,
        # excluding samples inside the self-occlusion guard (the ray tracer
        # starts marching at t = near_offset, so closer occluders are never
        # seen from THIS origin — they still enter the carried state, where
        # downstream cells see them at t >= near).  Without the exclusion,
        # fine voxels (h < near) black out grazing angles.
        terms = ([(ratio(s, jnp.broadcast_to(t, s.shape)),
                   jnp.broadcast_to(t, s.shape))
                  for s, t in zip(ex_s[:M - 1], ex_t[:M - 1])]
                 + [(ratio(s, t), t) for s, t in zip(cs, ct)])
        r_out = jnp.full_like(cs[0], BIG)
        for rr, tt in terms:
            r_out = jnp.minimum(r_out, jnp.where(tt >= near_offset, rr, BIG))

        gp_n = tuple([raw[0]] + list(gp[:-1])) if M > 1 else gp
        return (As_n, At_n, Bs_n, Bt_n, Cs_n, Ct_n, gp_n), r_out

    big = jnp.full((Lg, R1, R2), BIG, jnp.float32)
    bigs = jnp.full((R1, R2), BIG, jnp.float32)
    one = jnp.ones((Lg, R1, R2), jnp.float32)
    init = (big, one, big, one, big, one, tuple(bigs for _ in range(M - 1)))
    # slice k consumes slice k+1: feed G[S-1], ..., G[1], collect for
    # k = S-2 .. 0, then append the far slice (no samples -> unoccluded)
    _, ys = jax.lax.scan(step, init, (grid_c[1:][::-1], maskb, maskc))
    ys = ys[::-1]                                   # (S-1, Lg, R1, R2)
    far = jnp.full((1, Lg, R1, R2), BIG, jnp.float32)
    return jnp.concatenate([ys, far], axis=0)


def sweep_ratio_volume(grid: jnp.ndarray, lo, hi,
                       dirs: np.ndarray, near_offset: float) -> jnp.ndarray:
    """grid (res, res, res) world-space SDF over [lo, hi] (traced per-frame
    bounds); dirs (L, 3) unit directions pointing from the surface TOWARD
    the light — STATIC numpy (they set the static direction grouping).
    Returns the ratio volume (res, res, res, L) float32."""
    lo = jnp.asarray(lo, jnp.float32).reshape(3)
    hi = jnp.asarray(hi, jnp.float32).reshape(3)
    dirs = np.asarray(dirs, np.float32).reshape(-1, 3)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    res = grid.shape                                         # (Rx, Ry, Rz)
    voxel = (hi - lo) / (jnp.asarray(res, jnp.float32) - 1)  # traced (3,)

    a_dom = np.argmax(np.abs(dirs), axis=-1)
    sgn_dom = np.where(np.take_along_axis(dirs, a_dom[:, None], 1)[:, 0] >= 0,
                       1.0, -1.0)
    vols, id_chunks = [], []
    for a in range(3):
        for sgn in (1.0, -1.0):
            ids = np.nonzero((a_dom == a) & (sgn_dom == sgn))[0]
            if len(ids) == 0:
                continue
            b, c = [ax for ax in range(3) if ax != a]
            g = jnp.transpose(grid, (a, b, c))
            if sgn < 0:
                g = g[::-1]
            d_g = jnp.asarray(dirs[ids])
            # per-slice step: advance one voxel along a (after the flip the
            # march is toward +axis0); in-plane drift in index units
            h = voxel[a] / jnp.abs(d_g[:, a])                # (Lg,) traced
            drift_b = d_g[:, b] / jnp.abs(d_g[:, a]) * voxel[a] / voxel[b]
            drift_c = d_g[:, c] / jnp.abs(d_g[:, a]) * voxel[a] / voxel[c]
            vol = _canonical_sweep(g, drift_b, drift_c, h,
                                   float(near_offset))       # (S, Lg, R, R)
            if sgn < 0:
                vol = vol[::-1]
            # back to (x, y, z, Lg)
            inv = np.argsort([a, b, c])
            vol = jnp.transpose(vol, tuple(list(np.array([0, 2, 3])[inv]) + [1]))
            vols.append(vol)
            id_chunks.append(ids)
    order = np.argsort(np.concatenate(id_chunks))
    return jnp.concatenate(vols, axis=-1)[..., order]


def query_ratio_volume(vol: jnp.ndarray, lo, hi, pts: jnp.ndarray) -> jnp.ndarray:
    """Trilinear lookup of the ratio volume: (P, 3) -> (P, L)."""
    Rx, Ry, Rz = vol.shape[:3]
    L = vol.shape[-1]
    flat = vol.reshape(Rx * Ry * Rz, L)
    res = jnp.asarray([Rx, Ry, Rz], pts.dtype)
    f = (pts - lo) / (hi - lo) * (res - 1)
    f = jnp.clip(f, 0.0, res - 1 - 1e-4)
    b = jnp.floor(f).astype(jnp.int32)
    t = f - b
    ix, iy, iz = b[:, 0], b[:, 1], b[:, 2]
    tx, ty, tz = t[:, 0:1], t[:, 1:2], t[:, 2:3]

    def at(dx, dy, dz):
        return flat[((ix + dx) * Ry + (iy + dy)) * Rz + (iz + dz)]  # (P, L)

    c00 = at(0, 0, 0) * (1 - tx) + at(1, 0, 0) * tx
    c10 = at(0, 1, 0) * (1 - tx) + at(1, 1, 0) * tx
    c01 = at(0, 0, 1) * (1 - tx) + at(1, 0, 1) * tx
    c11 = at(0, 1, 1) * (1 - tx) + at(1, 1, 1) * tx
    c0 = c00 * (1 - ty) + c10 * ty
    c1 = c01 * (1 - ty) + c11 * ty
    return c0 * (1 - tz) + c1 * tz
