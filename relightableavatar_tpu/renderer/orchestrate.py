"""Host-side renderer orchestration: block the rays, jit per block, merge.

Mirrors the reference Renderer.render entry points
(``sphere_tracing_renderer.py:1066-1115`` and
``novel_light_sphere_tracing.py:103-221``): envmap selection (learned vs
replace_light), chunked pixel loop, and the novel-light sweep that traces
geometry+visibility ONCE then re-shades per light.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from relightableavatar_tpu.models import anisdf
from relightableavatar_tpu.models.anisdf import AniSDFConfig
from relightableavatar_tpu.ops.brdf import evaluate_shade, microfacet_brdf
from relightableavatar_tpu.ops.envmap import (gen_light_xyz, linear2srgb,
                                              sample_envmap_image)
from relightableavatar_tpu.ops.lbs import normalize
from relightableavatar_tpu.renderer.sphere_tracing import (
    RelightRenderConfig, render_human_block)
from relightableavatar_tpu.renderer.tracing import STConfig
from relightableavatar_tpu.utils.dotdict import dotdict
from relightableavatar_tpu.utils.log import log


def _pad_rays(ray_o, ray_d, near, far, block):
    P = len(ray_o)
    pad = (-P) % block
    if pad:
        ray_o = np.concatenate([ray_o, np.zeros((pad, 3), np.float32)])
        ray_d = np.concatenate([ray_d, np.tile([[0, 0, 1.0]], (pad, 1)).astype(np.float32)])
        near = np.concatenate([near, np.full(pad, 0.1, np.float32)])
        far = np.concatenate([far, np.full(pad, 0.11, np.float32)])
    return ray_o, ray_d, near, far, P


@partial(jax.jit, static_argnames=('pp', 'p_out'))
def _assemble_unsort(outs, order_prefix, pp: int, p_out: int):
    """Concat the rendered blocks, zero-pad to ``pp`` rays (the skipped
    proven-miss blocks), undo the frame-global sort, and slice to ``p_out``
    — for EVERY output key in ONE dispatch.  Clean-miss pixels are all-zero
    after the renderer's acc masking, so the zero rows are bit-identical to
    having rendered those blocks (tracing.py sphere_trace_miss_skip)."""
    res = {}
    for k in outs[0]:
        cat = jnp.concatenate([o[k] for o in outs], axis=0)
        full = jnp.zeros((pp,) + cat.shape[1:], cat.dtype)
        res[k] = full.at[order_prefix].set(cat)[:p_out]
    return res


class SphereTracingRenderer:
    """The relight / sphere-traced renderer (reference Renderer :943-1115)."""

    def __init__(self, cfg, params, mcfg: AniSDFConfig):
        if cfg.get('bruteforce_st', False):
            raise NotImplementedError(
                "bruteforce_st routes to render_bruteforce_human, which is "
                "broken in the reference (base_network.py:207-217 lazy-imports "
                "a module absent from its tree); deliberately not built")
        self.cfg = cfg
        self.params = params
        self.mcfg = mcfg
        self.rcfg = RelightRenderConfig.from_cfg(cfg)
        self.st_surf = STConfig.from_cfg(cfg.sphere_tracing,
                                         clay_book=not cfg.no_claybook)
        self.st_obj = STConfig.from_cfg(
            {**dict(cfg.sphere_tracing), **dict(cfg.obj_lvis)},
            clay_book=not cfg.no_claybook)
        self.light_xyz, self.light_area = gen_light_xyz(cfg.env_h, cfg.env_w,
                                                        cfg.env_r)
        self.light_sharp = 1.0 / jnp.sqrt(self.light_area / np.pi)
        self.block = int(cfg.tpu.ray_block)
        self._sweep_fn = None
        self._fused_fn = None
        self._march_fn = None
        self._grid_res = None
        self._grid_ext = None
        # when True, render() also sums XLA cost_analysis (flops + bytes
        # accessed) over every jitted call of the frame into last_frame_cost
        # — the executable cache makes the re-lower ~free (utils/flops.py)
        self.collect_cost = False
        self.last_frame_cost = None

        # multi-chip rendering: each chip owns a slice of the ray block
        # (pixels sharded, params/ctx replicated — same mesh layout as
        # training, parallel/mesh.py)
        self.mesh = None
        if len(jax.devices()) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from relightableavatar_tpu.parallel.mesh import get_mesh
            self.mesh = get_mesh(cfg)
            n = self.mesh.devices.size
            if self.block % n:
                self.block += (-self.block) % n   # pad block to mesh multiple
            self._ray_sharding = NamedSharding(self.mesh, P("rays"))

    # ------------------------------------------------------------- cost
    def _call(self, jitfn, *a, **k):
        """Call a jitted fn; under collect_cost also add its XLA cost model
        (flops + bytes accessed) to last_frame_cost."""
        out = jitfn(*a, **k)
        if self.collect_cost and self.last_frame_cost is not None:
            from relightableavatar_tpu.utils.flops import compiled_cost
            c = compiled_cost(jitfn, *a, **k)
            self.last_frame_cost['flops'] += c['flops']
            self.last_frame_cost['bytes'] += c['bytes']
        return out

    # ------------------------------------------------------------- skip
    def _miss_march_fn(self):
        """Jitted frame-global safe-miss march (tracing.safe_miss_march)
        over the baked shadow grid's conservative lower bound."""
        if self._march_fn is None:
            from relightableavatar_tpu.ops.sdf_grid import grid_sdf_lower_bound
            from relightableavatar_tpu.renderer.tracing import safe_miss_march
            tan_i = float(self.st_surf.tan_i)
            margin = float(self.rcfg.surf_skip_margin)
            iters = int(self.rcfg.surf_skip_iters)

            def march(grid, lo, hi, ro, rd, nr, fr):
                lb = lambda x: grid_sdf_lower_bound(grid, lo, hi, x)
                return safe_miss_march(lb, ro, rd, nr, fr, tan_i,
                                       margin, iters)

            self._march_fn = jax.jit(march)
        return self._march_fn

    # ------------------------------------------------------------- sweep
    def _sweep_dirs(self):
        """STATIC sweep directions: the same coarse light grid
        render_human_block traces at under lvis_downscale."""
        eH, eW = int(self.cfg.env_h), int(self.cfg.env_w)
        k = self.rcfg.lvis_downscale
        if k > 1:
            hc, wc = max(eH // k, 1), max(eW // k, 2)
        else:
            hc, wc = eH, eW
        xyz_c, _ = gen_light_xyz(hc, wc, self.rcfg.env_r)
        dirs = np.asarray(xyz_c).reshape(-1, 3)
        return dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)

    def _sweep_volume(self, grid3d, bbox):
        """Per-frame DFSS ratio volume over the coarse light grid (the same
        directions render_human_block traces at under lvis_downscale)."""
        if self._sweep_fn is None:
            from relightableavatar_tpu.ops.lvis_sweep import sweep_ratio_volume
            dirs = self._sweep_dirs()
            near = float(self.st_obj.near_offset)
            self._sweep_fn = jax.jit(
                lambda g, lo, hi: sweep_ratio_volume(g, lo, hi, dirs, near))
        return self._call(self._sweep_fn, grid3d, bbox[0], bbox[1])

    # ------------------------------------------------------------- fused
    def _get_fused_fn(self):
        """One-executable-per-frame render: HDQ grid bake + DFSS sweep +
        lax.scan over ray blocks, all inside a single jit.

        The per-block loop in render() issues ~6-9 sequential dispatches
        per 512px frame over the axon tunnel (grid bake, corner pack, sweep,
        then one per ray block) with host Python between them — the chip
        idles between executables (VERDICT r3: 2.5% MFU / 26% HBM on the
        headline frame, neither roofline binding).  Fusing the frame into
        one executable removes every inter-block host round-trip; lax.scan
        keeps peak memory at one block's working set.  Blocks past n_valid
        are skipped with lax.cond (TPU executes one branch), so the block
        count can be bucketed to powers of two — one compile per bucket,
        not per frame shape.  (reference chunkify: utils/data_utils.py —
        redesigned; the reference re-dispatches per chunk.)"""
        if self._fused_fn is not None:
            return self._fused_fn

        sweep_dirs = self._sweep_dirs() if self.rcfg.lvis_sweep else None
        near_off = float(self.st_obj.near_offset)

        def fused(params, ctx, ro, rd, nr, fr, n_valid, probe,
                  lxyz, larea, lsharp, *, mcfg, st_surf, st_obj, rcfg,
                  grid_res):
            shadow = lvol = None
            if rcfg.shadow_grid > 0:
                from relightableavatar_tpu.ops.lvis_sweep import \
                    sweep_ratio_volume
                from relightableavatar_tpu.ops.sdf_grid import (
                    build_hdq_grid, pack_grid_corners)
                gbox = ctx["wbounds"]
                gbox = gbox.at[0].add(-rcfg.grid_margin).at[1].add(
                    rcfg.grid_margin)
                grid3d = build_hdq_grid(
                    params, mcfg, ctx, gbox[0], gbox[1], grid_res,
                    st_obj.dist_th, packed=not rcfg.lvis_sweep,
                    verts_sub=rcfg.shadow_verts_sub)
                if rcfg.lvis_sweep:
                    # same lazy-pack rule as the loop path: pack eagerly only
                    # when the camera pre-march reads the cache per block
                    shadow = (pack_grid_corners(grid3d)
                              if rcfg.surf_grid_iters > 0 else grid3d)
                    lvol = sweep_ratio_volume(grid3d, gbox[0], gbox[1],
                                              sweep_dirs, near_off)
                else:
                    shadow = grid3d

            def block(ro_b, rd_b, nr_b, fr_b):
                return render_human_block(
                    params, mcfg, ctx, ro_b, rd_b, nr_b, fr_b, probe,
                    lxyz, larea, lsharp, st_surf, st_obj, rcfg, False,
                    shadow_sdf_grid=shadow, lvis_volume=lvol)

            out_struct = jax.eval_shape(block, ro[0], rd[0], nr[0], fr[0])

            def body(carry, xs):
                i, ro_b, rd_b, nr_b, fr_b = xs
                out = jax.lax.cond(
                    i < n_valid,
                    lambda: block(ro_b, rd_b, nr_b, fr_b),
                    lambda: jax.tree.map(
                        lambda s: jnp.zeros(s.shape, s.dtype), out_struct))
                return carry, out

            _, outs = jax.lax.scan(
                body, None,
                (jnp.arange(ro.shape[0], dtype=jnp.int32), ro, rd, nr, fr))
            return outs

        self._fused_fn = jax.jit(fused, static_argnames=(
            "mcfg", "st_surf", "st_obj", "rcfg", "grid_res"))
        return self._fused_fn

    # ------------------------------------------------------------- envmap
    def select_envmap(self, batch, training: bool = False):
        cfg = self.cfg
        if not training and cfg.replace_light and 'novel_lights' in batch:
            return dotdict(batch.novel_lights[cfg.replace_light])
        if 'env' in self.params:
            return dotdict(probe=anisdf.global_env_map(self.params, self.mcfg))
        return None

    # ------------------------------------------------------------- render
    def render(self, batch, training: bool = False, key=None) -> dotdict:
        cfg = self.cfg
        envmap = self.select_envmap(batch, training)
        probe = envmap.probe if envmap is not None else jnp.ones(
            (cfg.env_h, cfg.env_w, 3))
        if probe.ndim == 4:
            probe = probe[0]

        ray_o = np.asarray(batch.ray_o, np.float32).reshape(-1, 3)
        ray_d = np.asarray(batch.ray_d, np.float32).reshape(-1, 3)
        near = np.asarray(batch.near, np.float32).reshape(-1)
        far = np.asarray(batch.far, np.float32).reshape(-1)
        near = np.clip(near, cfg.clip_near, None)
        far = np.clip(far, None, cfg.clip_far)
        ray_o, ray_d, near, far, P = _pad_rays(ray_o, ray_d, near, far, self.block)
        if self.collect_cost:
            self.last_frame_cost = {'flops': 0.0, 'bytes': 0.0}
        if P == 0:
            return dotdict(rgb_map=jnp.zeros((0, 3)), acc_map=jnp.zeros((0,)),
                           envmap=envmap)

        if self.mesh is not None:
            place = lambda x: jax.device_put(jnp.asarray(x), self._ray_sharding)
        else:
            place = jnp.asarray

        use_fused = (bool(cfg.tpu.frame_fuse) and not training
                     and self.mesh is None)

        # bake the shadow SDF voxel cache ONCE per frame (the HDQ field is
        # frozen at inference), shared by every ray block below; with
        # tpu.lvis_sweep the cache additionally feeds the slice-sweep DFSS
        # volume (ops/lvis_sweep.py) that replaces shadow-ray tracing
        shadow_sdf_grid = None
        lvis_volume = None
        if self.rcfg.shadow_grid > 0 and not training:
            from relightableavatar_tpu.ops.sdf_grid import (axis_resolutions,
                                                            build_hdq_grid)
            gbox = batch.ctx["wbounds"]
            gbox = gbox.at[0].add(-self.rcfg.grid_margin).at[1].add(
                self.rcfg.grid_margin)
            self._last_gbox = gbox
            ext = np.asarray(jax.device_get(gbox[1] - gbox[0]))
            if self._grid_res is None:
                # per-axis lattice sizes, fixed on the first frame (the
                # body aspect is stable across poses -> one compile)
                self._grid_res = axis_resolutions(ext, self.rcfg.shadow_grid)
                self._grid_ext = ext
            else:
                # the sweep's |drift| <= 1 path-deviation bound assumes
                # near-isotropic voxels; warn when a pose changes the bbox
                # aspect enough to break the first-frame calibration
                ratio = ext / np.maximum(self._grid_ext, 1e-6)
                if np.max(ratio) / np.min(ratio) > 1.5:
                    from relightableavatar_tpu.utils.log import log
                    log(f'shadow-grid bbox aspect drifted {ratio} from the '
                        'first frame; voxels are no longer near-isotropic — '
                        'shadow accuracy may degrade (recreate the renderer '
                        'to recalibrate, costs one recompile)', 'yellow')
                    self._grid_ext = ext  # warn once per regime, not per frame
            if use_fused:
                pass    # grid + sweep bake inside the fused executable
            elif self.rcfg.lvis_sweep:
                grid3d = self._call(
                    build_hdq_grid,
                    self.params, self.mcfg, batch.ctx, gbox[0], gbox[1],
                    self._grid_res, self.st_obj.dist_th, packed=False,
                    verts_sub=self.rcfg.shadow_verts_sub)
                # pass the RAW grid: the sweep replaces shadow-ray marching,
                # so the in-block shadow_sdf closure is dead code XLA DCEs —
                # an eager pack_grid_corners here costs 31 ms/frame (measured)
                # for a table nothing reads.  grid_sdf packs lazily in-jit on
                # the rare configs that still trace (local_visibility etc.).
                # Exception: the camera pre-march DOES read the cache from
                # every ray block — pack once here rather than once per
                # block.  (The frame-global miss-skip march packs in-jit
                # instead: it runs ONCE per frame, and the eager pack's
                # 31 ms is dispatch latency the in-jit pack doesn't pay.)
                if self.rcfg.surf_grid_iters > 0:
                    from relightableavatar_tpu.ops.sdf_grid import (
                        pack_grid_corners)
                    shadow_sdf_grid = jax.jit(pack_grid_corners)(grid3d)
                else:
                    shadow_sdf_grid = grid3d
                lvis_volume = self._sweep_volume(grid3d, gbox)
            else:
                shadow_sdf_grid = self._call(
                    build_hdq_grid,
                    self.params, self.mcfg, batch.ctx, gbox[0], gbox[1],
                    self._grid_res, self.st_obj.dist_th, packed=True,
                    verts_sub=self.rcfg.shadow_verts_sub)

        if use_fused:
            nb_exact = len(ray_o) // self.block
            nb = 1 << max(0, (nb_exact - 1).bit_length())   # power-of-2 bucket
            pad = nb * self.block - len(ray_o)
            if pad:     # extra blocks carry the same dummy-ray pattern
                ray_o = np.concatenate([ray_o, np.zeros((pad, 3), np.float32)])
                ray_d = np.concatenate(
                    [ray_d, np.tile([[0, 0, 1.0]], (pad, 1)).astype(np.float32)])
                near = np.concatenate([near, np.full(pad, 0.1, np.float32)])
                far = np.concatenate([far, np.full(pad, 0.11, np.float32)])
            shp = lambda a: jnp.asarray(a.reshape((nb, self.block) + a.shape[1:]))
            outs = self._call(
                self._get_fused_fn(),
                self.params, batch.ctx,
                shp(ray_o), shp(ray_d), shp(near), shp(far),
                jnp.int32(nb_exact), jnp.asarray(probe),
                self.light_xyz, self.light_area, self.light_sharp,
                mcfg=self.mcfg, st_surf=self.st_surf, st_obj=self.st_obj,
                rcfg=self.rcfg, grid_res=self._grid_res)
            ret = dotdict()
            for k in outs:
                if k.startswith('term_sdf_'):
                    ret[k] = float(np.asarray(outs[k][:, 0]).sum())
                else:
                    v = outs[k]
                    ret[k] = v.reshape((nb * self.block,) + v.shape[2:])[:P]
        else:
            # frame-global miss skip: sort PROVEN clean misses (one safe
            # march on the baked grid over all rays) to the tail so whole
            # ray blocks become all-miss and are synthesized on the HOST —
            # zero device work, exact by the sphere_trace_miss_skip proof.
            # (Clean-miss pixels are all-zero after the acc masking, so a
            # zeros block is bit-identical to rendering them.)
            order = None
            n_ray_active = len(ray_o)
            block_rcfg = self.rcfg
            if (self.rcfg.surf_miss_skip and shadow_sdf_grid is not None
                    and not training and self.mesh is None
                    and self.rcfg.ablate_mode == 'hdq'
                    and not self.rcfg.want_light_maps
                    and not self.rcfg.check_bound_sdf
                    and not self.rcfg.check_termination_sdf):
                gb = self._last_gbox
                miss = np.asarray(self._call(
                    self._miss_march_fn(), shadow_sdf_grid, gb[0], gb[1],
                    jnp.asarray(ray_o), jnp.asarray(ray_d),
                    jnp.asarray(near), jnp.asarray(far)))
                order = np.argsort(miss, kind='stable')  # active rays first
                ray_o, ray_d = ray_o[order], ray_d[order]
                near, far = near[order], far[order]
                n_ray_active = int((~miss).sum())
                # the global sort already concentrated the misses; the
                # in-block sub-slice skip would only slow the now-dense
                # active blocks (narrow sub-traces lose MXU width)
                block_rcfg = self.rcfg._replace(surf_miss_skip=False)

            outs = []
            for i in range(0, len(ray_o), self.block):
                if order is not None and i >= n_ray_active and outs:
                    # proven-miss block: no device work at all — the
                    # single-dispatch assembly below leaves its rays zero
                    continue
                out = self._call(
                    render_human_block,
                    self.params, self.mcfg, batch.ctx,
                    place(ray_o[i:i + self.block]),
                    place(ray_d[i:i + self.block]),
                    place(near[i:i + self.block]),
                    place(far[i:i + self.block]),
                    jnp.asarray(probe),
                    self.light_xyz, self.light_area, self.light_sharp,
                    self.st_surf, self.st_obj, block_rcfg, training,
                    shadow_sdf_grid=shadow_sdf_grid, lvis_volume=lvis_volume)
                outs.append(out)

            ret = dotdict()
            if order is not None:
                # ONE dispatch for concat + zero-pad + unsort of every key:
                # eager per-key/per-block ops each cost a tunnel round trip
                # (measured: they erased the entire skip saving)
                n_rendered = len(outs) * self.block
                prefix = jnp.asarray(order[:n_rendered], jnp.int32)
                ret.update(self._call(_assemble_unsort, tuple(outs), prefix,
                                      pp=len(ray_o), p_out=P))
            else:
                for k in outs[0]:
                    if k.startswith('term_sdf_'):
                        ret[k] = sum(float(o[k][0]) for o in outs)
                    else:
                        ret[k] = jnp.concatenate([o[k] for o in outs],
                                                 axis=0)[:P]
        ret.envmap = envmap

        if cfg.check_termination_sdf:
            # running avg |sdf| at termination, like the reference's global
            # accumulator (sphere_tracing_renderer.py:765-778)
            self._term_sdf_sum = getattr(self, '_term_sdf_sum', 0.0) + ret.pop('term_sdf_sum')
            self._term_sdf_cnt = getattr(self, '_term_sdf_cnt', 0.0) + ret.pop('term_sdf_cnt')
            print(f'avg sdf abs: {self._term_sdf_sum / max(self._term_sdf_cnt, 1.0):.8f}')

        if not training and cfg.vis_ground_shading and 'H' in batch:
            ret = self._render_ground(batch, ret, envmap)
        return ret

    # ------------------------------------------------------------- ground
    def _render_ground(self, batch, ret, envmap, mutate_mask: bool = True):
        """Full-frame ground pass + foreground/background alpha blend
        (reference sphere_tracing_renderer.py:1084-1113, blend_output_).

        ``mutate_mask=False`` leaves ``batch.mask_at_box`` untouched so the
        pass can run once per novel light against the same fg-ray base."""
        import jax.numpy as jnp
        from relightableavatar_tpu.data.rays import get_rays
        from relightableavatar_tpu.renderer.ground import render_ground_block
        from relightableavatar_tpu.renderer.tracing import STConfig

        cfg = self.cfg
        H, W = int(batch.H), int(batch.W)
        F = H * W
        ray_o, ray_d = get_rays(H, W, np.asarray(batch.cam_K),
                                np.asarray(batch.cam_R), np.asarray(batch.cam_T))
        ray_o = ray_o.reshape(F, 3)
        ray_d = ray_d.reshape(F, 3)

        # scatter human alpha to the full frame; ground sees its complement
        mab = np.asarray(batch.mask_at_box).reshape(F)
        acc_full = np.zeros(F, np.float32)
        acc_full[mab] = np.asarray(ret.acc_map)
        bg_alpha = 1.0 - acc_full

        st_env = STConfig.from_cfg(
            {**dict(cfg.sphere_tracing), **dict(cfg.env_lvis)},
            clay_book=not cfg.no_claybook)
        probe = envmap.probe if envmap is not None else jnp.ones((cfg.env_h, cfg.env_w, 3))
        if probe.ndim == 4:
            probe = probe[0]
        image = envmap.get('image', None) if envmap is not None else None
        if image is not None and np.asarray(image).ndim == 4:
            image = image[0]

        block = self.block
        grounds = []
        ro = np.concatenate([ray_o, np.zeros(((-F) % block, 3), np.float32)])
        rd = np.concatenate([ray_d, np.tile([[0, 0, 1.0]], ((-F) % block, 1)).astype(np.float32)])
        af = np.concatenate([bg_alpha, np.zeros((-F) % block, np.float32)])
        for i in range(0, len(ro), block):
            g = render_ground_block(
                self.params, self.mcfg, batch.ctx,
                jnp.asarray(ro[i:i + block]), jnp.asarray(rd[i:i + block]),
                jnp.asarray(af[i:i + block]),
                jnp.asarray(probe),
                jnp.asarray(image) if image is not None else jnp.asarray(probe),
                self.light_xyz, self.light_area, self.light_sharp,
                jnp.asarray(np.asarray(cfg.ground_normal, np.float32)),
                jnp.asarray(np.asarray(cfg.ground_origin, np.float32)),
                jnp.asarray(np.asarray(cfg.ground_albedo, np.float32)),
                st_env, self.rcfg, bool(cfg.ground_attach_envmap))
            grounds.append(g)
        grd = dotdict()
        for k in grounds[0]:
            grd[k] = np.concatenate([np.asarray(g[k]) for g in grounds], axis=0)[:F]

        # blend: full = human*acc (scattered) + ground*(1-acc)
        blend_keys = ['rgb_map', 'surf_map', 'albedo_map', 'roughness_map',
                      'norm_map', 'cpts_map', 'bpts_map', 'spec_map',
                      'depth_map', 'shade_map']
        merged = dotdict(ret)
        for k in blend_keys:
            if k not in grd:
                continue
            gv = grd[k]
            full = np.zeros_like(gv)
            if k in ret:
                hv = np.asarray(ret[k])
                if hv.ndim == 1:
                    full[mab] = hv * np.asarray(ret.acc_map)
                else:
                    full[mab] = hv * np.asarray(ret.acc_map)[:, None]
            if gv.ndim == 1:
                merged[k] = full + gv * bg_alpha
            else:
                merged[k] = full + gv * bg_alpha[:, None]
        acc_new = np.ones(F, np.float32)
        merged.acc_map = acc_new
        if mutate_mask:
            batch.mask_at_box = np.ones((H, W), bool)
        merged.envmap = envmap
        return merged


def reshade_dense(surf, norm, albedo, roughness, lvis, ldot, acc, ray_o,
                  probe, light_xyz, light_area, rcfg: RelightRenderConfig):
    """Reference-layout re-shade: the straightforward (P, L, 3) composition
    of microfacet_brdf + evaluate_shade (novel_light_sphere_tracing.py:21-98).
    Semantics oracle for reshade_block's L-minor rewrite — do NOT run this
    at frame scale on TPU: the (P, L, 3) buffers pad 3 -> 128 lanes under
    the tiled layout (17.8 GB at 512 px, the round-3 OOM)."""
    P = surf.shape[0]
    L = light_xyz.shape[0] * light_xyz.shape[1]
    xyz = light_xyz.reshape(L, 3)
    area = light_area.reshape(L)

    surf2light = normalize(xyz[None, :, :] - surf[:, None, :])
    surf2cam = normalize(ray_o - surf)
    if rcfg.distant_envmap:
        # texel-center distant-light shading (see render_human_block)
        from relightableavatar_tpu.ops.envmap import probe_at_texels
        light = jnp.broadcast_to(probe_at_texels(probe, light_xyz)[None],
                                 (P, L, 3))
    else:
        light = sample_envmap_image(probe, surf2light)

    ldot_shade = jnp.ones_like(ldot) if rcfg.cancel_cosine else ldot
    shade = evaluate_shade(lvis, ldot_shade, area, light)
    brdf = microfacet_brdf(surf2light, surf2cam, norm, albedo, roughness,
                           f0=rcfg.fresnel_f0, lambert_only=rcfg.lambert_only,
                           glossy_only=rcfg.glossy_only,
                           cancel_cosine=rcfg.cancel_cosine)
    rgb = jnp.sum(brdf * shade, axis=-2)
    if rcfg.tonemapping:
        rgb = linear2srgb(rgb)
    rgb = rgb * acc[:, None]

    shade_map = jnp.sum(evaluate_shade(lvis, ldot, area, light), axis=-2)
    shade_map = shade_map * rcfg.shading_albedo / np.pi * acc[:, None]
    return dotdict(rgb_map=rgb, shade_map=shade_map)


def _reshade_weights(surf, norm, albedo, roughness, lvis, ldot, ray_o,
                     light_xyz, light_area, rcfg: RelightRenderConfig):
    """Probe-INDEPENDENT part of the L-minor re-shade: the per-(point, texel)
    contraction weights.  Everything here depends only on the cached
    geometry/visibility, never on the envmap, so a K-light sweep computes it
    once (reshade_sweep_block) — the per-light work collapses to the light
    colors and the final matmuls/gathers.

    Returns (A, B, w2, sx, sy, sz): glossy weights, lambert weights,
    shade-map weights — each (P, L) f32, L minor-most — plus the normalized
    surface-to-light components the non-distant equirect lookup needs."""
    import math
    from relightableavatar_tpu.ops.brdf import safe_divide
    L = light_xyz.shape[0] * light_xyz.shape[1]
    xyz = light_xyz.reshape(L, 3)
    area = light_area.reshape(L)

    # surface-to-light components with L minor: (P, L) each
    sx = xyz[None, :, 0] - surf[:, 0, None]
    sy = xyz[None, :, 1] - surf[:, 1, None]
    sz = xyz[None, :, 2] - surf[:, 2, None]
    inv = jax.lax.rsqrt(sx * sx + sy * sy + sz * sz + 1e-16)  # normalize eps 1e-8
    sx, sy, sz = sx * inv, sy * inv, sz * inv
    # brdf re-normalizes its inputs at eps 1e-7 (microfacet_brdf:40)
    inv = jax.lax.rsqrt(sx * sx + sy * sy + sz * sz + 1e-14)
    lx, ly, lz = sx * inv, sy * inv, sz * inv

    pts2c = normalize(normalize(ray_o - surf), eps=1e-7)      # (P, 3)
    n = normalize(norm, eps=1e-7)                             # (P, 3)
    vx, vy, vz = pts2c[:, 0:1], pts2c[:, 1:2], pts2c[:, 2:3]  # (P, 1)
    nx, ny, nz = n[:, 0:1], n[:, 1:2], n[:, 2:3]

    l_dot_n = jnp.clip(lx * nx + ly * ny + lz * nz, 1e-4, 1.0)      # (P, L)
    v_dot_n = jnp.clip(jnp.sum(pts2c * n, -1, keepdims=True), 1e-4, 1.0)

    # half vector
    hx, hy, hz = lx + vx, ly + vy, lz + vz
    hinv = jax.lax.rsqrt(hx * hx + hy * hy + hz * hz + 1e-14)
    hx, hy, hz = hx * hinv, hy * hinv, hz * hinv

    alpha = roughness ** 2                                     # (P, 1)
    cos_lh = lx * hx + ly * hy + lz * hz
    f0 = rcfg.fresnel_f0
    fres = f0 + (1 - f0) * (1 - cos_lh) ** 5
    cos_theta_m = hx * nx + hy * ny + hz * nz
    chi_d = jnp.where(cos_theta_m > 0, 1.0, 0.0)
    cos_m_sq = jnp.square(cos_theta_m)
    tan_m_sq = safe_divide(1 - cos_m_sq, cos_m_sq)
    denom_d = math.pi * jnp.square(cos_m_sq) * jnp.square(alpha ** 2 + tan_m_sq)
    dist = safe_divide(alpha ** 2 * chi_d, denom_d)

    cos_theta_v = jnp.sum(n * pts2c, -1, keepdims=True)        # (P, 1)
    cos_theta = hx * vx + hy * vy + hz * vz
    div = safe_divide(cos_theta, cos_theta_v)
    chi_g = jnp.where(div > 0, 1.0, 0.0)
    cos_v_sq = jnp.clip(jnp.square(cos_theta_v), 0.0, 1.0)
    tan_v_sq = jnp.clip(safe_divide(1 - cos_v_sq, cos_v_sq), 0.0, 1e10)
    denom_g = 1 + jnp.sqrt(1 + alpha ** 2 * tan_v_sq)
    g = safe_divide(chi_g * 2, denom_g)

    ldn = jnp.ones_like(l_dot_n) if rcfg.cancel_cosine else l_dot_n
    micro = safe_divide(fres * g * dist, 4 * jnp.abs(ldn) * jnp.abs(v_dot_n))
    lamb = (l_dot_n / math.pi) if rcfg.cancel_cosine \
        else jnp.full_like(l_dot_n, 1.0 / math.pi)

    ldot_shade = jnp.ones_like(ldot) if rcfg.cancel_cosine else ldot
    w = lvis * ldot_shade * area[None, :]                      # (P, L)
    w2 = lvis * ldot * area[None, :]                           # shade_map weights
    A = micro * w                                              # glossy texel weight
    B = lamb * w                                               # lambert texel weight
    return A, B, w2, sx, sy, sz


def _equirect_contract(img, A, B, w2, sx, sy, sz):
    """Contract the (P, L) weight planes against a per-direction equirect
    lookup of ``img`` — the gathers of sample_envmap_image without its
    (P, L, 3) output.  Returns (sumA, sumB, shade_sum), each (P, 3)."""
    import math
    eH, eW = img.shape[:2]
    sn = jnp.sqrt(sx * sx + sy * sy + sz * sz)
    dz = sz / (sn + 1e-13)
    theta = jnp.arccos(jnp.clip(dz, -1.0, 1.0)) - 1e-6
    phi = jnp.arctan2(sy, sx)   # scale-invariant: sy/sx == dy/dx
    px = (-phi / math.pi + 1) * 0.5 * eW
    py = (theta / math.pi) * eH
    x0 = jnp.floor(px - 0.5)
    y0 = jnp.floor(py - 0.5)
    wx = (px - 0.5) - x0
    wy = (py - 0.5) - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, eW - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, eW - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, eH - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, eH - 1)
    sums = []
    for wgt in (A, B, w2):
        ch = []
        for c in range(3):
            pc = img[..., c]
            lc = ((pc[y0i, x0i] * (1 - wx) + pc[y0i, x1i] * wx) * (1 - wy)
                  + (pc[y1i, x0i] * (1 - wx) + pc[y1i, x1i] * wx) * wy)
            ch.append(jnp.sum(wgt * lc, axis=-1))
        sums.append(jnp.stack(ch, axis=-1))                    # (P, 3)
    return sums


@partial(jax.jit, static_argnames=("rcfg",))
def reshade_block(surf, norm, albedo, roughness, lvis, ldot, acc, ray_o,
                  probe, light_xyz, light_area, rcfg: RelightRenderConfig):
    """Re-shade cached geometry/visibility under a new envmap
    (novel_light_sphere_tracing.py:21-98: geometry traced once, shading per
    light).

    TPU-native layout: the light axis is CONTRACTED inside the kernel with
    L minor-most.  Every per-texel quantity is a (P, L) array — L rides the
    128 lanes exactly (L = 512 for the 16x32 grid) — and the only 3-wide
    arrays are per-point (P, 3).  The GGX lobe is channel-independent and
    the lambert lobe separates as albedo_c * B, so

        rgb_c = sum_L glossy*w*light_c + albedo_c * sum_L lambert*w*light_c

    which under a distant envmap becomes two (P, L) @ (L, 3) matmuls on the
    MXU.  This removes the (P, L, 3) buffer whose 3 -> 128 lane padding
    forced the round-3 ray_block chunking (+50 ms/light); numerics match
    reshade_dense (same normalize eps chain, safe_divide clamps) — see
    test_reshade_lminor_matches_dense."""
    A, B, w2, sx, sy, sz = _reshade_weights(
        surf, norm, albedo, roughness, lvis, ldot, ray_o,
        light_xyz, light_area, rcfg)

    hp = jax.lax.Precision.HIGHEST
    if rcfg.distant_envmap:
        from relightableavatar_tpu.ops.envmap import probe_at_texels
        lt = probe_at_texels(probe, light_xyz)                 # (L, 3)
        sumA = jnp.matmul(A, lt, precision=hp)                 # (P, 3) on MXU
        sumB = jnp.matmul(B, lt, precision=hp)
        shade_sum = jnp.matmul(w2, lt, precision=hp)
    else:
        # per-channel equirect bilinear with (P, L) index planes
        img = probe[0] if probe.ndim == 4 else probe
        sumA, sumB, shade_sum = _equirect_contract(img, A, B, w2, sx, sy, sz)

    if rcfg.lambert_only:
        rgb = albedo * sumB
    elif rcfg.glossy_only:
        rgb = sumA
    else:
        rgb = sumA + albedo * sumB
    if rcfg.tonemapping:
        rgb = linear2srgb(rgb)
    rgb = rgb * acc[:, None]
    shade_map = shade_sum * rcfg.shading_albedo / np.pi * acc[:, None]
    return dotdict(rgb_map=rgb, shade_map=shade_map)


@partial(jax.jit, static_argnames=("rcfg",))
def reshade_sweep_block(surf, norm, albedo, roughness, lvis, ldot, acc,
                        ray_o, probes, light_xyz, light_area,
                        rcfg: RelightRenderConfig):
    """Re-shade under K envmaps in ONE executable: ``probes`` is
    (K, eH, eW, 3) and the return maps are (K, P, 3).

    The (P, L) contraction weights A/B/w2 (_reshade_weights) depend only on
    the cached geometry/visibility, never on the envmap — a K-light sweep
    computes them ONCE.  Under a distant envmap the per-light work then
    collapses to the texel colors: stacking the K probes' (L, 3) color
    tables into (L, 3K) turns the whole sweep into three (P, L) @ (L, 3K)
    MXU matmuls — K times less weight recompute AND one dispatch + one
    host transfer instead of K of each over the tunnel.  Non-distant probes
    share the weights too but keep their per-light equirect gathers under
    an in-device lax.map (peak memory = one light's working set).
    (reference novel_light_sphere_tracing.py:103-221 re-dispatches per
    light; semantics pinned by test_reshade_sweep_matches_per_light.)"""
    K = probes.shape[0]
    A, B, w2, sx, sy, sz = _reshade_weights(
        surf, norm, albedo, roughness, lvis, ldot, ray_o,
        light_xyz, light_area, rcfg)
    P = surf.shape[0]
    hp = jax.lax.Precision.HIGHEST

    if rcfg.distant_envmap:
        from relightableavatar_tpu.ops.envmap import probe_at_texels
        lt = jax.vmap(lambda p: probe_at_texels(p, light_xyz))(probes)
        LT = jnp.transpose(lt, (1, 0, 2)).reshape(lt.shape[1], K * 3)
        sumA = jnp.matmul(A, LT, precision=hp).reshape(P, K, 3)
        sumB = jnp.matmul(B, LT, precision=hp).reshape(P, K, 3)
        shade = jnp.matmul(w2, LT, precision=hp).reshape(P, K, 3)
        sumA = jnp.transpose(sumA, (1, 0, 2))                  # (K, P, 3)
        sumB = jnp.transpose(sumB, (1, 0, 2))
        shade = jnp.transpose(shade, (1, 0, 2))
    else:
        def one(img):
            sA, sB, sh = _equirect_contract(img, A, B, w2, sx, sy, sz)
            return jnp.stack([sA, sB, sh])
        stacked = jax.lax.map(one, probes)                     # (K, 3, P, 3)
        sumA, sumB, shade = stacked[:, 0], stacked[:, 1], stacked[:, 2]

    if rcfg.lambert_only:
        rgb = albedo[None] * sumB
    elif rcfg.glossy_only:
        rgb = sumA
    else:
        rgb = sumA + albedo[None] * sumB
    if rcfg.tonemapping:
        rgb = linear2srgb(rgb)
    rgb = rgb * acc[None, :, None]
    shade_map = shade * rcfg.shading_albedo / np.pi * acc[None, :, None]
    return dotdict(rgb_map=rgb, shade_map=shade_map)


class NovelLightRenderer(SphereTracingRenderer):
    """Relight sweep: one geometry+visibility pass, then per-light re-shading
    (reference novel_light_sphere_tracing.Renderer :103-221)."""

    def render(self, batch, training: bool = False, key=None) -> dotdict:
        cfg = self.cfg
        # force the cached maps we need
        self.rcfg = self.rcfg._replace(want_light_maps=True)

        # ground shading is envmap-dependent: postpone it to the per-light
        # loop (the base pass must keep fg-ray-sized maps for re-shading)
        ground = bool(cfg.vis_ground_shading and 'H' in batch)
        if ground:
            cfg.vis_ground_shading = False
        t0 = time.perf_counter()
        try:
            base = super().render(batch, training=training, key=key)
        finally:
            if ground:
                cfg.vis_ground_shading = True
        jax.block_until_ready(base.rgb_map)
        net_time = time.perf_counter() - t0
        log(f"net render time: {net_time:.3f}s", 'cyan')

        ret = dotdict()
        ret.diff = net_time
        ret.base = base

        surf = base.surf_map
        norm = base.norm_map
        albedo = base.albedo_map
        rough = base.roughness_map[..., None]
        lvis = base.lvis_map
        ldot = base.ldot_map
        acc = base.acc_map
        ray_o = jnp.asarray(np.asarray(batch.ray_o, np.float32).reshape(-1, 3))

        novel = dotdict()
        lights = batch.get('novel_lights', {})
        names = list(lights.keys()) if lights else []
        rotate = int(cfg.rotate_ratio) if cfg.vis_rotate_light else 0
        from relightableavatar_tpu.ops.envmap import rotate_envmap_dict

        # materialize the light list host-side first: the re-shade weights
        # are probe-independent, so ALL lights of a chunk share one
        # reshade_sweep_block executable (one dispatch + one host transfer
        # per chunk instead of per light)
        n_total = (len(names) * cfg.env_w * rotate) if rotate > 0 else len(names)
        entries = []
        for idx in range(n_total):
            if rotate > 0:
                name, envmap = rotate_envmap_dict(lights, idx, rotate, cfg.env_w)
            else:
                name, envmap = names[idx], lights[names[idx]]
            p = np.asarray(envmap['probe'], np.float32)
            if p.ndim == 4:
                p = p[0]
            entries.append((name, p, envmap))

        albedo_np = np.asarray(albedo)
        norm_np = np.asarray(norm)
        acc_np = np.asarray(acc)
        CH = 32     # lights per executable: bounds the (K, P, 3) transfer
        for s in range(0, len(entries), CH):
            chunk = entries[s:s + CH]
            probes = jnp.asarray(np.stack([p for _, p, _ in chunk]))
            maps = reshade_sweep_block(
                surf, norm, albedo, rough, lvis, ldot, acc, ray_o, probes,
                self.light_xyz, self.light_area, self.rcfg)
            rgb_np = np.asarray(maps.rgb_map)                  # (K, P, 3)
            shade_np = np.asarray(maps.shade_map)
            for j, (name, p, envmap) in enumerate(chunk):
                frame = dotdict(rgb_map=rgb_np[j],
                                shade_map=shade_np[j],
                                albedo_map=albedo_np,
                                norm_map=norm_np,
                                acc_map=acc_np,
                                envmap=dotdict(probe=p))
                if ground:
                    # per-light ground pass (reference renders ground per
                    # light: its shading + attached albedo depend on the
                    # envmap)
                    sub = dotdict(base)
                    sub.rgb_map = maps.rgb_map[j]
                    sub.shade_map = maps.shade_map[j]
                    merged = self._render_ground(
                        batch, sub, dotdict(envmap), mutate_mask=False)
                    for k in ('rgb_map', 'shade_map', 'albedo_map',
                              'norm_map', 'acc_map'):
                        if k in merged:
                            frame[k] = np.asarray(merged[k])
                novel[name] = frame
        ret.novel_light = novel
        if ground:
            # top-level maps under the capture envmap, merged over ground;
            # mutates mask_at_box to full-frame — consistent with the
            # full-frame per-light maps above
            base = self._render_ground(batch, base, base.envmap,
                                       mutate_mask=True)
        ret.update({k: v for k, v in base.items() if k.endswith('_map')})
        ret.envmap = base.envmap
        return ret
