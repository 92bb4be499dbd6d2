"""Benchmark: the full BASELINE.md config matrix on one chip.

Measures every BASELINE.md workload (volume 256/512, sphere-tracing fast
path, exact-stack relight, accelerated relight, 8-light sweep) and prints
ONE json line whose headline metric stays the BASELINE.md north-star —
sec/frame for the full 512x512 relight — with the complete matrix in the
``configs`` array (one row per workload with an explicit quality label) and
``mfu_pct`` for the headline frame.

Baseline: the reference's own code comment records "2 and a half minutes to
render an 1024 x 1024 image" with env visibility on a CUDA GPU
(lib/config/config.py:127,135).  Frame time scales with pixel count (both
implementations only process in-bbox rays), so the 512x512 reference
baseline is 150 / 4 = 37.5 s/frame.  vs_baseline = reference_time / our_time.

Quality labels (measured against exact-render GT on the regenerated
fixtures, commit 15d4620 era):
- exact stack:        42.77 dB PSNR (the JPG/protocol ceiling)
- accelerated stack:  37.36 dB / SSIM 0.9962 (lvis_sweep + shadow_grid 96 +
                      lvis_downscale 2 + distant_envmap; exact 16-it tracer)

MFU (VERDICT r2 item 3): the headline frame's FLOPs come from XLA's own cost
model, summed over every compiled executable the frame runs (grid bake +
DFSS sweep + ray blocks; orchestrate.py collect_cost), against the TPU v5e
bf16 peak (197 TFLOP/s).  ``hbm_util_pct`` is the same frame's bytes-accessed
total against the 819 GB/s HBM roofline — the binding roofline for the
gather-bound trace phases.  The analytic HDQ-stream count (utils/flops.py)
is kept as ``mfu_analytic_pct`` for cross-checking.  ``train_*`` fields time
the stage-1 train step at reference geometry (4x1024 rays, 128 samples) with
the step executable's own cost analysis.

Per-knob rows (VERDICT r2 item 2): each lossy knob toggled off the accel
stack is timed live; quality labels are read from results/knob_splits_r3.json
(measured once by scripts/bench_quality.py against the tubeman eval
protocol).  ``golden_ok`` asserts the tracked 64px bench-stack golden
(VERDICT r2 item 8) so perf work cannot silently shift bench-path pixels.
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SEC_PER_FRAME_512 = 150.0 / 4  # reference comment scaled to 512x512

# BENCH_r04 died rc=1 to one of these at the SECOND train row and threw away
# six already-measured configs (VERDICT r4 item 2).  Every section is now
# guarded: transient tunnel errors get one retry, anything else becomes an
# error row, and the summary JSON always prints with whatever completed.
TRANSIENT_MARKERS = ('remote_compile', 'response body closed',
                     'DEADLINE_EXCEEDED', 'UNAVAILABLE',
                     'Connection reset', 'Socket closed')


def _guarded(rows, name, fn, retries=1):
    """Run one bench section; on failure append an error row and move on.
    Rows appended by a failed attempt are dropped before a retry so a
    section can never contribute duplicate rows."""
    last = None
    n0 = len(rows)
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # bench must never die mid-matrix
            last = f'{type(e).__name__}: {e}'
            if attempt < retries and any(m in str(e)
                                         for m in TRANSIENT_MARKERS):
                print(f'# transient error in {name}, retrying: {last[:200]}')
                del rows[n0:]
                time.sleep(5.0)
                continue
            break
    rows.append(dict(name=name, error=last[:500]))
    return None


def _setup():
    import jax
    from relightableavatar_tpu.config import default_cfg
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.smpl import synthetic
    from relightableavatar_tpu.smpl.body_model import BodyModel
    from relightableavatar_tpu.train.checkpoints import load_params

    model = BodyModel("fixtures/synthetic_body.npz")
    motion = dict(np.load("fixtures/synthetic_motion.npz"))
    shapes = motion["shapes"][0]
    tverts, tjoints, big_A, _ = make_bigpose(model, shapes)
    ctx = make_frame_context(model, tverts, tjoints, big_A,
                             motion["poses"][0], motion["Rh"][0],
                             motion["Th"][0], shapes)

    def make_cfg(relight: bool):
        cfg = default_cfg()
        cfg.n_bones = model.n_bones
        cfg.cond_dim = model.n_bones * 3
        cfg.relighting = relight
        cfg.dist_th = 0.125
        cfg.obj_lvis.dist_th = 0.125
        cfg.tpu.ray_block = 8192
        return cfg

    def make_params(cfg, relight: bool, sdf_res=8):
        mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=sdf_res, bf16=True)
        params = load_params(anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg),
                             "fixtures/synthetic_avatar_params.npz")
        return params, mcfg

    return model, ctx, make_cfg, make_params


def _rays(ctx, H, W, view: int = 0):
    from relightableavatar_tpu.data.rays import get_full_near_far, get_rays
    from relightableavatar_tpu.smpl import synthetic
    from relightableavatar_tpu.utils.dotdict import dotdict
    cams = synthetic.make_cameras(4, H=H, W=W)
    K, R, T = cams["K"][view], cams["R"][view], cams["T"][view] / 1000.0
    ray_o, ray_d = get_rays(H, W, K, R, T)
    wb = np.asarray(ctx["wbounds"])
    near, far, mab = get_full_near_far(wb, ray_o.reshape(-1, 3),
                                       ray_d.reshape(-1, 3))
    batch = dotdict(ray_o=ray_o.reshape(-1, 3)[mab],
                    ray_d=ray_d.reshape(-1, 3)[mab],
                    near=near[mab], far=far[mab], ctx=ctx,
                    # kept for consumers that scatter fg rays back to the
                    # frame (scripts/check_golden_512.py) — re-deriving it
                    # there risks silent divergence from this ray set
                    mask_at_box=mab)
    return batch, int(mab.sum())


def _time(render, out_key='rgb_map', reps=3):
    """(timing stats over >=reps warm reps, output of the MIN rep).

    stats: median (the reported time), min/max, reps, spread_pct
    (100*(max-min)/median).  Same-round r3 runs disagreed 26% on single-rep
    timings (VERDICT r3 item 7) — every row now carries its spread so a
    regression is distinguishable from noise.  The min-rep output is kept
    because derived per-rep quantities (e.g. the sweep's base-pass time in
    out.diff) must come from one coherent rep."""
    import jax
    reps = max(int(reps), 3)
    out = render()                       # compile
    jax.block_until_ready(out[out_key])
    ts = []
    best_t, best_out = None, None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = render()
        jax.block_until_ready(out[out_key])
        dt = time.perf_counter() - t0
        ts.append(dt)
        if best_t is None or dt < best_t:
            best_t, best_out = dt, out
    med = float(np.median(ts))
    stats = dict(median=med, min=min(ts), max=max(ts), reps=reps,
                 spread_pct=100.0 * (max(ts) - min(ts)) / med)
    return stats, best_out


def _trow(stats, key='sec_per_frame'):
    """Timing fields for a bench row: median headline + error bars."""
    d = {key: round(stats['median'], 4),
         'sec_min': round(stats['min'], 4),
         'sec_max': round(stats['max'], 4),
         'reps': stats['reps'],
         'spread_pct': round(stats['spread_pct'], 1)}
    if stats['spread_pct'] > 10.0:
        d['noisy'] = True                # >10% spread: treat with suspicion
    return d


def _accel_knobs(cfg, on: bool):
    """The four lossy shading-acceleration knobs (see module docstring)."""
    cfg.tpu.lvis_downscale = 2 if on else 1
    cfg.tpu.shadow_grid = 96 if on else 0
    cfg.tpu.lvis_sweep = bool(on)
    cfg.tpu.lvis_query_offset = 0.0
    cfg.tpu.distant_envmap = bool(on)
    # camera trace stays EXACT in both stacks (the pre-march erodes
    # silhouettes: 31.77 dB vs 37.36 dB against exact-render GT)
    cfg.tpu.surf_grid_iters = 0
    cfg.tpu.surf_exact_iters = 0


def _knob_quality_labels():
    """name -> measured quality row from scripts/bench_quality.py (committed
    as results/knob_splits_r3.json); {} when not yet measured on this box."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'results', 'knob_splits_r3.json')
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return {r['name']: r for r in json.load(f)}


def _train_step_row(model, ctx, B=4, R=1024, S=128, reps=5,
                    name='train_step_stage1', bf16_act=False, budget=None,
                    quality=None):
    """Time + cost-analyze the stage-1 train step at reference geometry
    (batch 4 x 1024 rays x 128 samples; lib/config/config.py defaults).
    B/R/S parameterized so tests can smoke the path with tiny shapes.
    ``bf16_act``/``budget`` select the validated fast-train configuration
    (results/train_phase_r4.json knee)."""
    import jax
    import jax.numpy as jnp
    from relightableavatar_tpu.config import default_cfg
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.train.trainer import Trainer
    from relightableavatar_tpu.utils.dotdict import dotdict
    from relightableavatar_tpu.utils.flops import (TPU_V5E_PEAK_BF16,
                                                   TPU_V5E_HBM_BW)

    cfg = default_cfg()
    cfg.n_bones = model.n_bones
    cfg.cond_dim = model.n_bones * 3
    cfg.relighting = False
    cfg.n_samples = S
    cfg.train.batch_size = B
    cfg.record_dir = '/tmp/ra_tpu_bench_train'
    cfg.tpu.bf16_act = bf16_act
    if budget is not None:
        cfg.tpu.grad_sample_budget = budget
    mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=8)
    from relightableavatar_tpu.models import anisdf
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)
    trainer = Trainer(cfg, params, mcfg)
    step = trainer._build_step()

    rng = np.random.default_rng(0)
    center = np.asarray(ctx["Th"]).reshape(3) + [0, 0, 1.0]
    ray_o = np.tile(center + [2.0, 0, 0], (B, R, 1)).astype(np.float32)
    tgt = center[None, None] + rng.normal(0, 0.3, (B, R, 3)).astype(np.float32)
    ray_d = tgt - ray_o
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    batch = dotdict(
        ctx=jax.tree_util.tree_map(lambda x: jnp.stack([x] * B), ctx),
        ray_o=jnp.asarray(ray_o), ray_d=jnp.asarray(ray_d),
        near=jnp.full((B, R), 0.5), far=jnp.full((B, R), 4.0),
        rgb=jnp.asarray(rng.random((B, R, 3), np.float32)),
        msk=jnp.ones((B, R)))

    p, o = trainer.params, trainer.opt_state
    key, it = jax.random.PRNGKey(0), jnp.asarray(0)
    p, o, stats = step(p, o, batch, key, it)            # compile
    jax.block_until_ready(stats['loss'])
    reps = max(int(reps), 3)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        p, o, stats = step(p, o, batch, key, it)
        jax.block_until_ready(stats['loss'])
        ts.append(time.perf_counter() - t0)
    best = float(np.median(ts))
    try:
        ca = step.lower(p, o, batch, key, it).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = float(ca.get('flops', 0.0))
        by = float(ca.get('bytes accessed', 0.0))
    except Exception:
        fl = by = 0.0
    row = dict(name=name, sec_per_step=round(best, 4),
               sec_min=round(min(ts), 4), sec_max=round(max(ts), 4),
               reps=reps,
               spread_pct=round(100 * (max(ts) - min(ts)) / best, 1),
               batch=f'{B}x{R} rays, {S} samples (reference geometry)',
               tflops_per_step=round(fl / 1e12, 3),
               mfu_pct=round(100 * fl / best / TPU_V5E_PEAK_BF16, 2),
               hbm_util_pct=round(100 * by / best / TPU_V5E_HBM_BW, 2),
               flops_source='XLA cost_analysis of the compiled step')
    if quality:
        row['quality'] = quality
    return row


def main():
    # a still-running e2e training run would deadlock the axon tunnel (one
    # TPU client at a time); preempt it — its progress is checkpointed and
    # mirrored to results/<exp>/live every 10 min
    from relightableavatar_tpu.utils.preempt import preempt_training
    if preempt_training():
        print("# preempted an in-flight training run (see utils/preempt.py)")

    import jax
    from relightableavatar_tpu.renderer.orchestrate import (NovelLightRenderer,
                                                            SphereTracingRenderer)
    from relightableavatar_tpu.renderer.volume import VolumeRenderer
    from relightableavatar_tpu.utils.flops import (TPU_V5E_HBM_BW,
                                                   TPU_V5E_PEAK_BF16,
                                                   anisdf_hdq_flops, hbm_util,
                                                   mfu)

    model, ctx, make_cfg, make_params = _setup()
    rows = []

    # 1-2. AniSDF volume rendering (BASELINE.md configs 1-2)
    def _volume(H, label):
        cfg = make_cfg(relight=False)
        cfg.n_samples = 128
        params, mcfg = make_params(cfg, relight=False)
        batch, n = _rays(ctx, H, H)
        r = VolumeRenderer(cfg, params, mcfg)
        st, _ = _time(lambda: r.render(batch))
        rows.append(dict(name=label, **_trow(st),
                         fg_rays=n, rays_per_s=round(n / st['median']),
                         quality='exact (128-sample volume rendering)'))
        if H == 512:
            # sample-culled volume path: network eval on only the 32/128
            # samples per ray with the largest proxy compositing weight
            # (baked HDQ grid); measured 50.6 dB vs the exact render
            # (results/r4_features.json).  reps=7 + an extra warm rep: the
            # r4 measurement carried 24.5% spread (VERDICT r4 item 8).
            cfg.tpu.volume_cull = 32
            r = VolumeRenderer(cfg, params, mcfg)
            r.render(batch)                # extra warm rep (grid bake)
            st, _ = _time(lambda: r.render(batch), reps=7)
            rows.append(dict(name=label + '_cull32', **_trow(st),
                             fg_rays=n, rays_per_s=round(n / st['median']),
                             quality='50.6 dB vs exact (proxy-weight '
                                     'top-32 sample culling)'))

    _guarded(rows, 'volume_256', lambda: _volume(256, 'volume_256'))
    _guarded(rows, 'novel_view_512', lambda: _volume(512, 'novel_view_512'))

    # 3. sphere-tracing fast path, stage-1 network (BASELINE.md config 3)
    def _stage1_st():
        cfg = make_cfg(relight=False)
        cfg.n_samples = 3
        _accel_knobs(cfg, on=False)
        params, mcfg = make_params(cfg, relight=False)
        batch, n = _rays(ctx, 512, 512)
        r = SphereTracingRenderer(cfg, params, mcfg)
        st, _ = _time(lambda: r.render(batch))
        rows.append(dict(name='sphere_tracing_512', **_trow(st),
                         fg_rays=n, rays_per_s=round(n / st['median']),
                         quality='exact (16-it HDQ trace, 3-sample band)'))

    _guarded(rows, 'sphere_tracing_512', _stage1_st)

    batch, n = _rays(ctx, 512, 512)
    labels = _knob_quality_labels()

    def qlabel(key, fallback):
        m = labels.get(key)
        if not m:
            return fallback
        return (f"{m['psnr']:.2f} dB / SSIM {m['ssim']:.4f} vs exact-render "
                f"GT (tubeman eval protocol, results/knob_splits_r3.json)")

    # 4. relight, EXACT stack — speed at quality parity (floor 42.77 dB)
    def _exact():
        cfg = make_cfg(relight=True)
        cfg.n_samples = 3
        _accel_knobs(cfg, on=False)
        params, mcfg = make_params(cfg, relight=True)
        r = SphereTracingRenderer(cfg, params, mcfg)
        st_exact, _ = _time(lambda: r.render(batch))
        dt = st_exact['median']
        rows.append(dict(name='relight_512_exact', **_trow(st_exact),
                         fg_rays=n, rays_per_s=round(n / dt),
                         vs_baseline=round(REFERENCE_SEC_PER_FRAME_512 / dt, 2),
                         quality='exact stack, 42.77 dB (JPG/protocol '
                                 'ceiling)'))
        return dt

    dt_exact = _guarded(rows, 'relight_512_exact', _exact)

    # 5. relight, ACCELERATED stack — the headline (BASELINE.md config 4)
    def _accel():
        cfg = make_cfg(relight=True)
        cfg.n_samples = 3
        _accel_knobs(cfg, on=True)
        params, mcfg = make_params(cfg, relight=True)
        r = SphereTracingRenderer(cfg, params, mcfg)
        st_accel, _ = _time(lambda: r.render(batch))
        dt = st_accel['median']
        rows.append(dict(name='relight_512_accel', **_trow(st_accel),
                         fg_rays=n, rays_per_s=round(n / dt),
                         vs_baseline=round(REFERENCE_SEC_PER_FRAME_512 / dt, 2),
                         quality='accelerated stack, ' + qlabel(
                             'full_accel', '37.36 dB / SSIM 0.9962 vs '
                             'exact-render GT')))
        return dt, r, cfg, mcfg

    accel = _guarded(rows, 'relight_512_accel', _accel)
    dt_accel = accel[0] if accel else None

    # 5a. accel + the provably-exact miss skip (tracing.py
    # sphere_trace_miss_skip / orchestrate.py frame-global sort): clean
    # misses and padding lanes never enter the exact HDQ trace; pixels are
    # bit-identical to the accel row (measured 99 dB cap, r5)
    def _accel_skip():
        cfg = make_cfg(relight=True)
        cfg.n_samples = 3
        _accel_knobs(cfg, on=True)
        cfg.tpu.surf_miss_skip = True
        params, mcfg = make_params(cfg, relight=True)
        r = SphereTracingRenderer(cfg, params, mcfg)
        st, _ = _time(lambda: r.render(batch))
        dt = st['median']
        row = dict(name='relight_512_accel_skip', **_trow(st),
                   fg_rays=n, rays_per_s=round(n / dt),
                   vs_baseline=round(REFERENCE_SEC_PER_FRAME_512 / dt, 2),
                   quality='accelerated stack + exact miss skip '
                           '(bit-identical pixels to relight_512_accel)')
        if dt_accel is not None:
            row['speedup_vs_accel'] = round(dt_accel / dt, 2)
        rows.append(row)

    _guarded(rows, 'relight_512_accel_skip', _accel_skip)

    # XLA cost model for the headline frame: flops + bytes accessed summed
    # over every compiled executable of the frame (VERDICT r2 item 3)
    def _cost():
        dt, r, cfg, mcfg = accel
        r.collect_cost = True
        out = r.render(batch)
        jax.block_until_ready(out['rgb_map'])
        r.collect_cost = False
        fc = r.last_frame_cost or {'flops': 0.0, 'bytes': 0.0}
        mfu_pct = mfu(fc['flops'], dt, TPU_V5E_PEAK_BF16)
        hbm_pct = hbm_util(fc['bytes'], dt, TPU_V5E_HBM_BW)
        # analytic HDQ-stream count kept as a cross-check (under-estimate:
        # shading/sweep matmuls and gathers excluded)
        V = int(np.asarray(ctx['pverts']).shape[0])
        P = -(-n // int(cfg.tpu.ray_block)) * int(cfg.tpu.ray_block)
        n_hdq = P * 16 + P * cfg.n_samples
        fl = anisdf_hdq_flops(mcfg, n_hdq, V)
        if r._grid_res is not None:
            fl += anisdf_hdq_flops(mcfg, int(np.prod(r._grid_res)),
                                   max(V // 4, 1))
        return fc, mfu_pct, hbm_pct, mfu(fl, dt, TPU_V5E_PEAK_BF16)

    cost = _guarded(rows, 'frame_cost', _cost) if accel else None
    fc, mfu_pct, hbm_pct, mfu_analytic_pct = cost or (
        {'flops': 0.0, 'bytes': 0.0}, None, None, None)

    # 5b. per-knob splits: each lossy knob toggled off the accel stack,
    # timed live; dB labels from the committed knob-splits measurement
    KNOB_VARIANTS = {
        'accel_no_downscale': dict(lvis_downscale=1),
        'accel_grid128': dict(shadow_grid=128),
        'accel_no_sweep': dict(lvis_sweep=False, lvis_query_offset=0.5),
        'accel_no_distant': dict(distant_envmap=False),
    }

    def _knob(kname, kv):
        cfg = make_cfg(relight=True)
        cfg.n_samples = 3
        _accel_knobs(cfg, on=True)
        for k, v in kv.items():
            cfg.tpu[k] = v
        params, mcfg = make_params(cfg, relight=True)
        rk = SphereTracingRenderer(cfg, params, mcfg)
        st, _ = _time(lambda: rk.render(batch))
        row = dict(name=kname, **_trow(st),
                   quality=qlabel(kname, 'unmeasured — run '
                                  'scripts/bench_quality.py'))
        if dt_accel is not None:
            row['delta_vs_accel_s'] = round(st['median'] - dt_accel, 3)
        rows.append(row)

    for kname, kv in KNOB_VARIANTS.items():
        _guarded(rows, kname, lambda kn=kname, k=kv: _knob(kn, k))

    # 5c. recommended >=40 dB operating point: the fastest measured config
    # with psnr >= 40 from the knob-splits file, re-timed live here.  Each
    # measured row's `opts` is relative to the EXACT stack (the same way
    # scripts/bench_quality.py applied it).
    def _parse(v):
        if v in ('True', 'False'):
            return v == 'True'
        try:
            return int(v)
        except ValueError:
            return float(v)

    def _rec40(with_skip=False):
        candidates = [(nm, m) for nm, m in labels.items()
                      if m.get('psnr', 0) >= 40.0 and nm != 'exact'
                      and m.get('opts')]
        if not candidates:
            return
        op_name, op_m = min(candidates, key=lambda t: t[1]['sec_per_frame'])
        cfg = make_cfg(relight=True)
        cfg.n_samples = 3
        _accel_knobs(cfg, on=False)
        for k, v in op_m['opts'].items():
            assert k.startswith('tpu.'), k
            cfg.tpu[k[4:]] = _parse(v)
        name = 'relight_512_recommended_40db'
        q = qlabel(op_name, 'unmeasured')
        if with_skip:
            # exact miss skip keeps the measured quality label valid:
            # pixels are bit-identical to the row above.  The skip needs
            # the baked grid — if the base config doesn't already use one,
            # forcing it on would CHANGE shadow rendering and invalidate
            # the quoted dB label, so the row is skipped instead.
            if int(cfg.tpu.shadow_grid) == 0:
                return
            cfg.tpu.surf_miss_skip = True
            name += '_skip'
            q += ' + exact miss skip (bit-identical pixels)'
        params, mcfg = make_params(cfg, relight=True)
        rop = SphereTracingRenderer(cfg, params, mcfg)
        st, _ = _time(lambda: rop.render(batch))
        rows.append(dict(
            name=name, base_config=op_name, **_trow(st),
            vs_baseline=round(REFERENCE_SEC_PER_FRAME_512 / st['median'], 2),
            quality=q))

    _guarded(rows, 'relight_512_recommended_40db', _rec40)
    _guarded(rows, 'relight_512_recommended_40db_skip',
             lambda: _rec40(with_skip=True))

    # 6. 8-light sweep incl. OLAT (BASELINE.md config 5): one geometry +
    # visibility pass, per-light re-shade only (reference
    # novel_light_sphere_tracing.py:107-115 timing convention)
    def _sweep():
        cfg = make_cfg(relight=True)
        cfg.n_samples = 3
        _accel_knobs(cfg, on=True)
        cfg.test_light = ['gym_entrance', 'city_sky', 'sunset_road',
                          'studio', 'olat0000-0000', 'olat0000-0027',
                          'olat0002-0027', 'olat0006-0008']
        params, mcfg = make_params(cfg, relight=True)
        sbatch, sn = _rays(ctx, 512, 512)
        from relightableavatar_tpu.data.datasets import load_lighting
        sbatch.novel_lights = load_lighting(cfg)
        n_lights = len(sbatch.novel_lights)
        r = NovelLightRenderer(cfg, params, mcfg)
        st_total, out = _time(lambda: r.render(sbatch))
        dt_total = st_total['median']
        # per-light split from the MIN rep (out pairs with st_total['min']):
        # total and base-pass must come from one coherent rep
        base_t = float(out.diff)
        rows.append(dict(name='relight_sweep_8light', **_trow(st_total),
                         n_lights=n_lights, base_pass_s=round(base_t, 3),
                         per_light_reshade_s=round(
                             (st_total['min'] - base_t) / n_lights, 4),
                         fg_rays=sn,
                         vs_baseline=round(
                             n_lights * REFERENCE_SEC_PER_FRAME_512
                             / dt_total, 2),
                         quality='accelerated stack (re-shade reuses traced '
                                 'geometry+visibility exactly)'))

    _guarded(rows, 'relight_sweep_8light', _sweep)

    # 7. stage-1 train step at reference geometry (VERDICT r2 item 3)
    train_row = _guarded(rows, 'train_step_stage1',
                         lambda: _train_step_row(model, ctx))
    if train_row:
        rows.append(train_row)
    # fast-train config (r4 knee: bf16 activations + 8192-sample grad
    # chunks); quality label carries the r5 eval-parity A/B verdict when
    # results/fast_train_ab_r5.json exists (VERDICT r4 item 4)
    train_fast_row = _guarded(
        rows, 'train_step_stage1_fast',
        lambda: _train_step_row(
            model, ctx, name='train_step_stage1_fast', bf16_act=True,
            budget=8192, quality=_fast_train_quality_label()))
    if train_fast_row:
        rows.append(train_fast_row)

    # 8. golden gate: the tracked 64px bench-stack image must not have
    # drifted (VERDICT r2 item 8)
    def _golden():
        from relightableavatar_tpu.eval.golden import (check_golden,
                                                       render_benchstack_64)
        gimg, _ = render_benchstack_64('.')
        return check_golden(gimg)

    golden = _guarded(rows, 'golden_gate', _golden)
    golden_ok, golden_psnr = golden if golden else (None, None)

    accel_row = next((r_ for r_ in rows
                      if r_['name'] == 'relight_512_accel'
                      and 'error' not in r_), None)
    errors = [r_['name'] for r_ in rows if 'error' in r_]
    print(json.dumps({
        "metric": "relight_sec_per_frame_512",
        "value": accel_row["sec_per_frame"] if accel_row else None,
        "unit": (f"s/frame (512x512 full relight, accelerated stack; "
                 f"{n} fg rays, "
                 f"{accel_row['rays_per_s'] if accel_row else '?'} rays/s; "
                 f"exact stack "
                 f"{f'{dt_exact:.3f}' if dt_exact else '?'}s)"),
        "vs_baseline": accel_row["vs_baseline"] if accel_row else None,
        "mfu_pct": round(mfu_pct, 2) if mfu_pct else None,
        "hbm_util_pct": round(hbm_pct, 2) if hbm_pct else None,
        "frame_tflops": round(fc['flops'] / 1e12, 3),
        "frame_gbytes": round(fc['bytes'] / 1e9, 2),
        "flops_source": "XLA cost_analysis summed over the frame's compiled "
                        "executables (grid bake + sweep + ray blocks)",
        "mfu_analytic_pct": (round(mfu_analytic_pct, 2)
                             if mfu_analytic_pct else None),
        "train_sec_per_step": (train_row['sec_per_step']
                               if train_row else None),
        "train_mfu_pct": train_row['mfu_pct'] if train_row else None,
        "train_fast_sec_per_step": (train_fast_row['sec_per_step']
                                    if train_fast_row else None),
        "golden_ok": golden_ok,
        "golden_psnr": golden_psnr,
        "row_errors": errors,
        "configs": rows,
    }))


def _fast_train_quality_label():
    """Quality label for the fast-train row: prefer the r5 eval-parity A/B
    (results/fast_train_ab_r5.json, VERDICT r4 item 4) over the r4 2-epoch
    loss-curve check it superseded."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'results', 'fast_train_ab_r5.json')
    if os.path.exists(path):
        with open(path) as f:
            ab = json.load(f)
        if ab.get('verdict_label'):
            return ab['verdict_label']
    return ('UNVALIDATED at eval parity: 2-epoch loss-curve check only '
            '(18.65 vs 17.96 dB train PSNR); eval-parity A/B pending')


if __name__ == "__main__":
    main()
