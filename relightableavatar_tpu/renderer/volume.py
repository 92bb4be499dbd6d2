"""NeRF-style volume renderer for AniSDF (TPU-native, static ray blocks).

Re-design of the reference ``lib/networks/renderer/base_renderer.py``:
- uniform z sampling with optional stratified perturbation (``:15-31``)
- network eval on P x S points (``:33-51``)
- cumprod transmittance compositing + map splitting (``:53-113``)

TPU-first: the reference's dynamic ``chunkify`` becomes fixed-size ray blocks
processed by ONE jit-compiled function (`_render_block`), host-looped over
padded blocks.  Inside each block everything is static-shape; invalid rays
(near >= far) are masked, not compacted.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from relightableavatar_tpu.models import anisdf
from relightableavatar_tpu.models.anisdf import AniSDFConfig
from relightableavatar_tpu.utils.dotdict import dotdict


@partial(jax.jit, static_argnames=("mcfg", "n_samples", "training",
                                   "bg_brightness", "perturb", "cull_k"))
def _render_block(params, mcfg: AniSDFConfig, ctx, ray_o, ray_d, near, far,
                  key, n_samples: int, training: bool, bg_brightness: float,
                  perturb: bool, cull_k: int = 0, grid=None, glo=None,
                  ghi=None):
    """ray_o/ray_d (P, 3); near/far (P,) -> maps dict, each (P, ...).

    ``cull_k`` > 0 (inference only): evaluate the network on only the K
    samples per ray with the largest PROXY COMPOSITING WEIGHT — the actual
    volume-rendering weight T_i * alpha_i computed from the trilerped HDQ
    grid SDF proxy (``grid``/``glo``/``ghi``: the per-frame bake), dilated
    +-2 samples to tolerate grid-vs-network surface offset.  This is the
    importance metric compositing itself uses: it spends the budget on the
    transmittance ramp, keeps unsaturated back surfaces on grazing rays,
    and ignores fully occluded samples (top-K by |proxy| wasted half the
    budget behind the first surface: 38.8 dB at K=32 on the 512px frame;
    a contiguous first-crossing window lost double-surface rays: 40.9 dB
    on the fixture gate).  Static shapes throughout — top_k selects, the
    results scatter back to the full S lattice; skipped samples get occ =
    sdf_to_occ(grid proxy) inside the geodesic-filter band and 0 outside
    (matching forward's mask semantics, anisdf.forward:598).  TPU sample
    culling for the SURVEY §2.4 volume path (base_renderer.py:15-51
    evaluates all P x S points)."""
    P = ray_o.shape[0]
    S = n_samples

    t_vals = jnp.linspace(0.0, 1.0, S)
    z_vals = near[:, None] * (1.0 - t_vals) + far[:, None] * t_vals   # (P, S)
    if perturb and training:
        mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand

    pts = ray_o[:, None, :] + ray_d[:, None, :] * z_vals[..., None]   # (P, S, 3)
    viewdir = jnp.broadcast_to(ray_d[:, None, :], (P, S, 3))

    if cull_k and cull_k < S and not training:
        from relightableavatar_tpu.models.anisdf import beta_of
        from relightableavatar_tpu.ops.sdf import render_weights, sdf_to_occ
        from relightableavatar_tpu.ops.sdf_grid import grid_sdf
        proxy = grid_sdf(grid, glo, ghi, pts.reshape(-1, 3)).reshape(P, S)
        occ_bg = sdf_to_occ(proxy, beta_of(params))
        occ_bg = jnp.where(jnp.abs(proxy) <= mcfg.dist_th, occ_bg, 0.0)
        w_proxy = render_weights(occ_bg)                              # (P, S)
        wp = jnp.pad(w_proxy, ((0, 0), (2, 2)))
        score = jnp.max(jnp.stack([wp[:, i:i + S] for i in range(5)]), axis=0)
        # tiebreak dead-zero scores toward the band (miss rays, halo edges)
        score = score + 1e-7 * mcfg.dist_th / (mcfg.dist_th + jnp.abs(proxy))
        _, idx = jax.lax.top_k(score, cull_k)                         # (P, K)
        pts_sel = jnp.take_along_axis(pts, idx[..., None], axis=1)
        ret = anisdf.forward(params, mcfg, ctx,
                             pts_sel.reshape(P * cull_k, 3),
                             jnp.broadcast_to(ray_d[:, None, :],
                                              (P, cull_k, 3)
                                              ).reshape(P * cull_k, 3),
                             training=False)
        raw_sel = ret.raw.reshape(P, cull_k, -1)
        C = raw_sel.shape[-1]
        raw = jnp.zeros((P, S, C), raw_sel.dtype)
        raw = raw.at[..., -1].set(occ_bg)
        raw = raw.at[jnp.arange(P)[:, None], idx].set(raw_sel)
    else:
        ret = anisdf.forward(params, mcfg, ctx, pts.reshape(P * S, 3),
                             viewdir.reshape(P * S, 3), training=training)
        raw = ret.raw.reshape(P, S, -1)

    rgb = raw[..., :-1]
    occ = raw[..., -1]

    from relightableavatar_tpu.ops.sdf import volume_rendering
    weights, raw_map, acc_map = volume_rendering(rgb, occ, bg_brightness=bg_brightness)
    depth_map = jnp.sum(weights * z_vals, axis=-1)

    out = dotdict()
    if training:
        out.residuals = ret.residuals
        out.observed_gradients = ret.observed_gradients
        out.gradients = ret.gradients
        out.weights = weights
        out.z_vals = z_vals
    else:
        out.depth_map = depth_map

    # channel-split conventions (base_renderer.py:96-108)
    raw_c = raw_map
    if raw_c.shape[-1] >= 9:
        cpts, bpts, resd, raw_c = (raw_c[..., :3], raw_c[..., 3:6],
                                   raw_c[..., 6:9], raw_c[..., 9:])
        if not training:
            out.cpts_map = cpts
            out.bpts_map = bpts
            out.resd_map = resd
    if raw_c.shape[-1] >= 6:
        norm, raw_c = raw_c[..., :3], raw_c[..., 3:]
        if not training:
            out.norm_map = norm

    out.rgb_map = raw_c
    out.acc_map = acc_map
    return out


class VolumeRenderer:
    """Host-side orchestration: pad rays to block multiples, loop blocks."""

    def __init__(self, cfg, params, mcfg: AniSDFConfig):
        self.cfg = cfg
        self.params = params
        self.mcfg = mcfg
        self._grid_res = None

    def _bake_cull_grid(self, ctx):
        """Per-frame HDQ SDF bake for sample culling (cfg.tpu.volume_cull):
        same machinery as the sphere-traced path's shadow cache
        (orchestrate.py:154-209), packed for the one-row-gather trilerp."""
        from relightableavatar_tpu.ops.sdf_grid import (axis_resolutions,
                                                        build_hdq_grid)
        cfg = self.cfg
        margin = float(cfg.tpu.grid_margin)
        gbox = jnp.asarray(ctx["wbounds"])
        gbox = gbox.at[0].add(-margin).at[1].add(margin)
        if self._grid_res is None:
            ext = np.asarray(jax.device_get(gbox[1] - gbox[0]))
            self._grid_res = axis_resolutions(ext, int(cfg.tpu.volume_grid))
        grid = build_hdq_grid(self.params, self.mcfg, ctx, gbox[0], gbox[1],
                              self._grid_res, packed=True)
        return grid, gbox[0], gbox[1]

    def render(self, batch: dotdict, training: bool = False,
               key=None) -> dotdict:
        cfg = self.cfg
        ray_o = np.asarray(batch.ray_o, np.float32).reshape(-1, 3)
        ray_d = np.asarray(batch.ray_d, np.float32).reshape(-1, 3)
        near = np.asarray(batch.near, np.float32).reshape(-1)
        far = np.asarray(batch.far, np.float32).reshape(-1)
        near = np.clip(near, cfg.clip_near, None)
        far = np.clip(far, None, cfg.clip_far)

        P = ray_o.shape[0]
        if P == 0:
            return dotdict(rgb_map=jnp.zeros((0, 3)), acc_map=jnp.zeros((0,)))
        block = int(cfg.tpu.ray_block)
        pad = (-P) % block
        if pad:
            ray_o = np.concatenate([ray_o, np.zeros((pad, 3), np.float32)])
            ray_d = np.concatenate([ray_d, np.tile([[0, 0, 1.0]], (pad, 1)).astype(np.float32)])
            near = np.concatenate([near, np.full(pad, 0.1, np.float32)])
            far = np.concatenate([far, np.full(pad, 0.2, np.float32)])

        if key is None:
            key = jax.random.PRNGKey(0)

        cull_k = 0 if training else int(cfg.tpu.volume_cull)
        grid = glo = ghi = None
        if cull_k and cull_k < int(cfg.n_samples):
            grid, glo, ghi = self._bake_cull_grid(batch.ctx)
        else:
            cull_k = 0

        outs = []
        for i in range(0, len(ray_o), block):
            key, sub = jax.random.split(key)
            out = _render_block(
                self.params, self.mcfg, batch.ctx,
                jnp.asarray(ray_o[i:i + block]), jnp.asarray(ray_d[i:i + block]),
                jnp.asarray(near[i:i + block]), jnp.asarray(far[i:i + block]),
                sub, int(cfg.n_samples), training,
                float(cfg.bg_brightness), cfg.perturb > 0,
                cull_k=cull_k, grid=grid, glo=glo, ghi=ghi)
            outs.append(out)

        merged = dotdict()
        for k in outs[0]:
            merged[k] = jnp.concatenate([o[k] for o in outs], axis=0)[:P]
        return merged
