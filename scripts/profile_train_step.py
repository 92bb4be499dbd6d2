"""Attribute the stage-1 train step's wall time (VERDICT r3 item 3).

Times the full jitted step against ablated variants at reference geometry
(batch 4 x 1024 rays x 128 samples) so optimization effort lands where the
time is:

  full            : value_and_grad + optimizer update (the production step)
  fwd             : loss_fn forward only (no grad, no update)
  grad            : value_and_grad only (no optimizer update)
  knn             : world_to_bigpose (KNN + inv-LBS warp) on B*R*S points
  mlp             : residual+SDF MLP stack on B*R*S canonical points
  budget=N        : the full step at alternate grad_sample_budget values
                    (fewer/bigger grad-accum chunks)
  bf16_act        : the full step with bfloat16 hidden activations

Writes results/train_phase_r4.json and optionally a jax.profiler trace
(--trace DIR).  Run on the TPU:  python scripts/profile_train_step.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def make_setup(B, R, S, budget=None, bf16_act=False):
    import jax
    import jax.numpy as jnp
    from relightableavatar_tpu.config import default_cfg
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.smpl.body_model import BodyModel
    from relightableavatar_tpu.train.trainer import Trainer
    from relightableavatar_tpu.utils.dotdict import dotdict

    model = BodyModel('fixtures/synthetic_body.npz')
    motion = dict(np.load('fixtures/synthetic_motion.npz'))
    sh = motion['shapes'][0]
    tv, tj, bA, _ = make_bigpose(model, sh)
    ctx = make_frame_context(model, tv, tj, bA, motion['poses'][0],
                             motion['Rh'][0], motion['Th'][0], sh)
    cfg = default_cfg()
    cfg.n_bones = model.n_bones
    cfg.cond_dim = model.n_bones * 3
    cfg.relighting = False
    cfg.n_samples = S
    cfg.train.batch_size = B
    cfg.record_dir = '/tmp/ra_tpu_prof_train'
    if budget is not None:
        cfg.tpu.grad_sample_budget = budget
    cfg.tpu.bf16_act = bf16_act
    mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=8)
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)
    trainer = Trainer(cfg, params, mcfg)

    rng = np.random.default_rng(0)
    center = np.asarray(ctx['Th']).reshape(3) + [0, 0, 1.0]
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
    return trainer, batch, ctx, mcfg


def timeit(fn, reps=5):
    import jax
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(min(ts)), float(max(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--B', type=int, default=4)
    ap.add_argument('--R', type=int, default=1024)
    ap.add_argument('--S', type=int, default=128)
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--trace', default='')
    ap.add_argument('--out', default='results/train_phase_r4.json')
    a = ap.parse_args()

    if os.environ.get('RA_PLATFORM', '') != 'cpu':
        # single-client axon tunnel: a live training run must be preempted
        # before this script touches the TPU.  NEVER on CPU smoke runs — a
        # cpu-platform invocation would still kill the training process
        # group (it did once; the gate is the fix).
        from relightableavatar_tpu.utils.preempt import preempt_training
        if preempt_training():
            print('# preempted an in-flight training run')

    import jax
    import jax.numpy as jnp
    from relightableavatar_tpu.models import anisdf

    rows = {}
    trainer, batch, ctx, mcfg = make_setup(a.B, a.R, a.S)
    step = trainer._build_step()
    key, it = jax.random.PRNGKey(0), jnp.asarray(0)

    state = {'p': trainer.params, 'o': trainer.opt_state}

    def full():
        state['p'], state['o'], stats = step(state['p'], state['o'],
                                             batch, key, it)
        return stats['loss']

    rows['full'] = timeit(full, a.reps)
    print('full step:', rows['full'], flush=True)
    params = state['p']

    if a.trace:
        with jax.profiler.trace(a.trace):
            for _ in range(3):
                full()
            jax.block_until_ready(state['p'])
        print(f'trace -> {a.trace}', flush=True)

    # forward-only and grad-only variants of the same loss
    from relightableavatar_tpu.train.loss import anisdf_losses
    from relightableavatar_tpu.renderer.volume import _render_block  # noqa
    from relightableavatar_tpu.train.trainer import _volume_forward
    from relightableavatar_tpu.utils.dotdict import dotdict as dd
    weights = trainer.weights
    S = a.S

    def loss_fn(p, b, k):
        def frame(ctx_f, rays, gt, kk):
            out = _volume_forward(p, trainer.mcfg, ctx_f, dd(rays), kk,
                                  S, float(trainer.cfg.bg_brightness), True)
            return anisdf_losses(weights, out,
                                 dd(gt, ray_d=rays['ray_d']), it)
        keys = jax.random.split(k, b.rgb.shape[0])
        losses, stats = jax.vmap(frame, in_axes=(0, 0, 0, 0))(
            b.ctx, dict(ray_o=b.ray_o, ray_d=b.ray_d, near=b.near,
                        far=b.far), dict(rgb=b.rgb, msk=b.msk), keys)
        return jnp.mean(losses)

    def attempt(name, thunk):
        # every variant is fail-tolerant: the one-shot grad at 4x1024x128
        # OOMs (f32 (4,131072,256) jvp temps) — that is itself a finding,
        # not a reason to lose the budget/bf16 rows after it.
        try:
            rows[name] = timeit(thunk, a.reps)
            print(f'{name}:', rows[name], flush=True)
        except Exception as e:  # noqa: BLE001
            rows[name] = ('OOM/fail: ' + str(e).split('\n')[0][:160],) * 3
            print(f'{name}: FAILED ({rows[name][0]})', flush=True)

    fwd = jax.jit(loss_fn)
    attempt('fwd', lambda: fwd(params, batch, key))
    gradf = jax.jit(jax.grad(loss_fn))
    attempt('grad_oneshot', lambda: jax.tree_util.tree_leaves(
        gradf(params, batch, key))[0])

    # isolated KNN warp and MLP stack at the same point count
    N = a.B * a.R * a.S
    pts = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (N, 3))) * 0.4
    pts = jnp.asarray(pts + np.asarray(ctx['Th']).reshape(3))
    ctx0 = jax.tree_util.tree_map(lambda x: x, ctx)

    warp = jax.jit(lambda x: anisdf.world_to_bigpose(mcfg, ctx0, x).bpts)
    attempt('knn_warp', lambda: warp(pts))

    mlp = jax.jit(lambda x: anisdf.observed_sdf(params, mcfg, ctx0, x))
    attempt('resd_sdf_mlp', lambda: mlp(pts))

    # grad-accum budget sweep + bf16 activations
    for budget in (262144, 524288):
        tr, b2, _, _ = make_setup(a.B, a.R, a.S, budget=budget)
        st2 = tr._build_step()
        s2 = {'p': tr.params, 'o': tr.opt_state}

        def f2():
            s2['p'], s2['o'], stats = st2(s2['p'], s2['o'], b2, key, it)
            return stats['loss']
        attempt(f'budget_{budget}', f2)

    def step_row(name, **kw):
        tr, b3, _, _ = make_setup(a.B, a.R, a.S, **kw)
        st3 = tr._build_step()
        s3 = {'p': tr.params, 'o': tr.opt_state}

        def f3():
            s3['p'], s3['o'], stats = st3(s3['p'], s3['o'], b3, key, it)
            return stats['loss']
        attempt(name, f3)

    step_row('budget_65536', budget=65536)
    step_row('bf16_act', bf16_act=True)
    # bf16 halves the jvp/remat temps that OOM the big budgets — the
    # budget x precision grid is not separable
    step_row('bf16_budget_65536', bf16_act=True, budget=65536)
    step_row('bf16_budget_262144', bf16_act=True, budget=262144)
    step_row('bf16_budget_524288', bf16_act=True, budget=524288)
    # SMALLER chunks are FASTER on this step (backward activations fit
    # on-chip instead of spilling to HBM; the scan's per-chunk overhead
    # only bites below ~8k samples) — sweep down to the knee
    step_row('f32_budget_16384', budget=16384)
    step_row('bf16_budget_16384', bf16_act=True, budget=16384)
    step_row('bf16_budget_8192', bf16_act=True, budget=8192)
    step_row('bf16_budget_4096', bf16_act=True, budget=4096)

    out = {k: (dict(median_s=round(v[0], 4), min_s=round(v[1], 4),
                    max_s=round(v[2], 4))
               if isinstance(v[0], float) else dict(error=v[0]))
           for k, v in rows.items()}
    out['geometry'] = f'{a.B}x{a.R} rays x {a.S} samples'
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, 'w') as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
