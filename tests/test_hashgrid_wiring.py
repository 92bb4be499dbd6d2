"""e_type='hash' end-to-end wiring (VERDICT r1 item 9): the NGP hash grid
replaces positional encoding for the residual + SDF encoders and trains."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightableavatar_tpu.config import default_cfg
from relightableavatar_tpu.models import anisdf
from relightableavatar_tpu.models.anisdf import AniSDFConfig


def test_e_type_flows_from_cfg():
    cfg = default_cfg()
    cfg.e_type = 'hash'
    cfg.n_bones = 22
    cfg.cond_dim = 66
    mcfg = AniSDFConfig.from_cfg(cfg)
    assert mcfg.e_type == 'hash'
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)
    assert 'sdf_hash' in params and 'resd_hash' in params
    hcfg = mcfg.hash_cfg()
    # tables are stored FLAT (L, T*F): a small-F lane dim would pad 64x
    # under the TPU tiled layout (see ops/hashgrid.py:hash_encoding_init)
    assert params['sdf_hash'].shape == (hcfg.n_levels,
                                        hcfg.table_size * hcfg.n_features)


def test_hash_sdf_forward_and_spatial_gradient():
    mcfg = AniSDFConfig(n_bones=22, cond_dim=66, e_type='hash')
    params = anisdf.init_anisdf(jax.random.PRNGKey(1), mcfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, (64, 3)),
                    jnp.float32)
    sdf, feat = anisdf.sdf_feat(params, mcfg, x)
    assert sdf.shape == (64, 1) and feat.shape == (64, mcfg.feat_dim)
    from relightableavatar_tpu.ops.grads import spatial_gradient_fwd
    val, g = spatial_gradient_fwd(
        lambda p: anisdf.sdf_feat(params, mcfg, p)[0], x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0  # trilerp carries spatial gradient


@pytest.mark.slow
def test_hash_train_step_descends(tmp_path):
    from tests.test_training import _setup, _fake_items
    from relightableavatar_tpu.train.trainer import Trainer
    cfg, _, _, ctxs = _setup(tmp_path, relight=False)
    cfg.e_type = 'hash'
    mcfg = AniSDFConfig.from_cfg(cfg)
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)
    trainer = Trainer(cfg, params, mcfg)
    step = trainer._build_step()
    batch = trainer.collate(_fake_items(ctxs))
    losses = []
    p, o = trainer.params, trainer.opt_state
    # the step donates params/opt_state (tpu.donate) — snapshot the table
    # BEFORE stepping; trainer.params is deleted by the first call
    hash0 = np.asarray(p['sdf_hash'])
    for i in range(6):
        p, o, stats = step(p, o, batch, jax.random.PRNGKey(i), jnp.asarray(i))
        losses.append(float(stats['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # hash tables actually move
    d = float(np.abs(np.asarray(p['sdf_hash']) - hash0).max())
    assert d > 0
