"""Rebuild the flagship pretrained checkpoint from the distilled fixture params.

``data/trained_model/deform/tubeman/latest.npz`` is what run.py/train.py load
for the synthetic flagship.  A training drive with the default ``exp_name``
overwrites it; this script restores it from
``fixtures/synthetic_avatar_params.npz`` (the avatar that also renders the GT
images in scripts/make_synthetic_data.py, so evaluate metrics stay meaningful).

Usage: python scripts/restore_fixture_checkpoint.py
"""
from __future__ import annotations

import os
import sys
from os.path import dirname

sys.path.insert(0, dirname(dirname(os.path.abspath(__file__))))

os.environ.setdefault('RA_PLATFORM', 'cpu')  # host-only: init + file IO


def main():
    import jax
    from relightableavatar_tpu.config import default_cfg
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.smpl.body_model import BodyModel
    from relightableavatar_tpu.train.checkpoints import load_params, save_model

    model = BodyModel('fixtures/synthetic_body.npz')
    cfg = default_cfg()
    cfg.n_bones = model.n_bones
    cfg.cond_dim = model.n_bones * 3
    cfg.relighting = True
    cfg.dist_th = 0.125
    cfg.obj_lvis.dist_th = 0.125
    mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=8)
    params = load_params(anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg),
                         'fixtures/synthetic_avatar_params.npz')
    # the fixture params carry the full relight head set, so they are the
    # checkpoint for BOTH stages: deform/tubeman is what train.py stage-2
    # bootstraps from (geometry_pretrain), relight/tubeman_relight is what
    # `run.py ... relighting True` evals/visualizations load
    # (cfg.trained_model_dir) — without it the relight heads stay random.
    for d in ('data/trained_model/deform/tubeman',
              'data/trained_model/relight/tubeman_relight'):
        save_model(d, {'net': params}, epoch=400)
        print(f'restored {d}/latest.npz (epoch 400)')


if __name__ == '__main__':
    main()
