"""XLA cost-analysis accounting (VERDICT r2 item 3): the renderer can report
its own frame FLOPs / bytes-accessed totals from the compiled executables."""
import jax
import jax.numpy as jnp
import numpy as np

from relightableavatar_tpu.config import default_cfg
from relightableavatar_tpu.models import anisdf
from relightableavatar_tpu.models.anisdf import AniSDFConfig
from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
from relightableavatar_tpu.smpl import synthetic
from relightableavatar_tpu.utils.dotdict import dotdict
from relightableavatar_tpu.utils.flops import compiled_cost, hbm_util, mfu


def test_compiled_cost_counts_matmul():
    a = jnp.ones((128, 256), jnp.float32)
    b = jnp.ones((256, 64), jnp.float32)
    fn = jax.jit(lambda x, y: x @ y)
    fn(a, b)  # populate the executable cache
    c = compiled_cost(fn, a, b)
    # 2*M*N*K flops; cost models may fold minor ops, so lower-bound only
    assert c['flops'] >= 2 * 128 * 256 * 64 * 0.9
    assert c['bytes'] > 0


def test_mfu_hbm_helpers():
    assert abs(mfu(197e12, 1.0) - 100.0) < 1e-6
    assert abs(hbm_util(819e9, 1.0) - 100.0) < 1e-6
    assert mfu(None, 1.0) is None
    assert hbm_util(0.0, 1.0) is None


def test_renderer_collects_frame_cost():
    """collect_cost sums the XLA cost model over every jitted call of the
    frame (grid bake + sweep + ray blocks)."""
    from relightableavatar_tpu.renderer.orchestrate import SphereTracingRenderer

    model = synthetic.make_body_model(n_bones=52, target_verts=800, seed=0)
    motion = synthetic.make_motion(1, n_bones=52)
    tverts, tjoints, big_A, _ = make_bigpose(model, motion["shapes"][0])
    ctx = make_frame_context(model, tverts, tjoints, big_A,
                             motion["poses"][0], motion["Rh"][0],
                             motion["Th"][0], motion["shapes"][0])
    cfg = default_cfg()
    cfg.n_bones = 52
    cfg.cond_dim = 156
    cfg.relighting = True
    cfg.n_samples = 2
    cfg.env_h, cfg.env_w = 2, 4
    cfg.sphere_tracing.iter = 2
    cfg.obj_lvis.iter = 1
    cfg.tpu.ray_block = 64
    cfg.tpu.bf16_mlp = False
    cfg.tpu.shadow_grid = 16
    cfg.tpu.lvis_sweep = True
    cfg.tpu.lvis_downscale = 2
    cfg.tpu.lvis_query_offset = 0.0
    cfg.tpu.distant_envmap = True
    mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=6)
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)

    P = 64
    center = np.asarray(ctx["Th"]).reshape(3) + [0, 0, 1.0]
    rng = np.random.default_rng(0)
    ray_o = np.tile(center + [2.0, 0, 0], (P, 1)).astype(np.float32)
    tgt = center + rng.normal(0, 0.25, (P, 3))
    ray_d = (tgt - ray_o).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    batch = dotdict(ray_o=ray_o, ray_d=ray_d,
                    near=np.full(P, 0.5, np.float32),
                    far=np.full(P, 4.0, np.float32), ctx=ctx)

    r = SphereTracingRenderer(cfg, params, mcfg)
    out = r.render(batch)                     # no collection by default
    assert r.last_frame_cost is None
    r.collect_cost = True
    out = r.render(batch)
    jax.block_until_ready(out.rgb_map)
    assert r.last_frame_cost is not None
    assert r.last_frame_cost['flops'] > 0
    assert r.last_frame_cost['bytes'] > 0


import pytest


@pytest.mark.slow
def test_bench_train_step_row_smoke():
    """bench.py's train-step row (timing + step cost analysis) runs at tiny
    shapes and reports finite fields."""
    import bench
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.smpl.body_model import BodyModel

    model = BodyModel('fixtures/synthetic_body.npz')
    motion = dict(np.load('fixtures/synthetic_motion.npz'))
    sh = motion['shapes'][0]
    tv, tj, bA, _ = make_bigpose(model, sh)
    ctx = make_frame_context(model, tv, tj, bA, motion['poses'][0],
                             motion['Rh'][0], motion['Th'][0], sh)
    row = bench._train_step_row(model, ctx, B=1, R=64, S=4, reps=1)
    assert row['sec_per_step'] > 0
    assert row['tflops_per_step'] >= 0
    assert 'mfu_pct' in row and 'hbm_util_pct' in row


def test_bench_guarded_retry_and_error_rows():
    """bench._guarded (VERDICT r4 item 2): transient errors retry once with
    the failed attempt's partial rows dropped (no duplicates), non-transient
    errors become an error row, successes pass through."""
    import bench

    # success passes the return value through, no rows touched
    rows = []
    assert bench._guarded(rows, 'ok', lambda: 42) == 42
    assert rows == []

    # transient error retries once; the failed attempt's rows are dropped
    calls = {'n': 0}

    def flaky():
        rows.append(dict(name='partial', sec=1.0))
        calls['n'] += 1
        if calls['n'] == 1:
            raise RuntimeError('remote_compile: response body closed')
        rows.append(dict(name='second', sec=2.0))
        return 'done'

    assert bench._guarded(rows, 'flaky', flaky) == 'done'
    assert calls['n'] == 2
    assert [r['name'] for r in rows] == ['partial', 'second']  # no dupes

    # non-transient error -> error row, no retry, partial rows kept
    rows2 = []

    def dies():
        rows2.append(dict(name='measured_before_crash', sec=3.0))
        raise ValueError('genuine bug')

    assert bench._guarded(rows2, 'dies', dies) is None
    assert [r['name'] for r in rows2] == ['measured_before_crash', 'dies']
    assert 'genuine bug' in rows2[1]['error']

    # transient error on BOTH attempts -> error row after one retry
    rows3 = []
    n3 = {'n': 0}

    def always_transient():
        n3['n'] += 1
        raise RuntimeError('DEADLINE_EXCEEDED')

    assert bench._guarded(rows3, 'tt', always_transient) is None
    assert n3['n'] == 2 and rows3[0]['name'] == 'tt' and 'error' in rows3[0]


def test_bench_main_survives_total_section_failure(monkeypatch, capsys):
    """bench.main()'s glue (everything outside the _guarded sections) must
    print ONE valid summary JSON even when EVERY section fails — the exact
    contract BENCH_r04 broke (rc=1, parsed: null).  All renderer entry
    points and the train-step row are forced to raise; preempt is stubbed
    (a real preempt would kill any live training run)."""
    import json as _json
    import bench
    from relightableavatar_tpu.utils import preempt
    import relightableavatar_tpu.renderer.orchestrate as orch
    import relightableavatar_tpu.renderer.volume as vol

    monkeypatch.setattr(preempt, 'preempt_training', lambda: False)

    def boom(*a, **k):
        raise RuntimeError('forced section failure (test)')

    monkeypatch.setattr(vol, 'VolumeRenderer', boom)
    monkeypatch.setattr(orch, 'SphereTracingRenderer', boom)
    monkeypatch.setattr(orch, 'NovelLightRenderer', boom)
    monkeypatch.setattr(bench, '_train_step_row', boom)
    import relightableavatar_tpu.eval.golden as gold
    monkeypatch.setattr(gold, 'render_benchstack_64', boom)

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    summary = _json.loads(out[-1])          # the LAST line is the json
    assert summary['metric'] == 'relight_sec_per_frame_512'
    assert summary['value'] is None         # headline failed -> None
    assert summary['golden_ok'] is None
    assert summary['row_errors']            # every section reported
    names = [r['name'] for r in summary['configs']]
    assert len(names) == len(set(names))    # no duplicate rows
    for must in ('volume_256', 'relight_512_accel', 'relight_sweep_8light',
                 'train_step_stage1', 'golden_gate'):
        assert must in names, names
