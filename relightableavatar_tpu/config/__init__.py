"""Config assembly: defaults + YAML chain + mode overlays + CLI opts.

Preserves the reference CLI and merge order exactly
(``lib/config/config.py:487-538``):

    python run.py -t visualize -c configs/exp.yaml key value key2 value2 ...

Merge order: code defaults -> parent_cfg chain -> experiment YAML -> CLI opts
-> mode overlays (relighting_cfg, pose_seq_cfg, novel_view_cfg, mesh_cfg,
sphere_tracing_cfg, novel_light_cfg) -> CLI opts again -> derived values.
"""
from __future__ import annotations

import argparse
import os
from os.path import join

import numpy as np

from relightableavatar_tpu.config.node import CN, load_cfg
from relightableavatar_tpu.config.defaults import Output, default_cfg
from relightableavatar_tpu.utils.log import log

# the process-global config; modules read this lazily (never at import time)
cfg = default_cfg()

# Platform override: some TPU plugins (axon) ignore JAX_PLATFORMS from the
# env; the config API always wins.  RA_PLATFORM=cpu forces CPU (e.g. an
# 8-virtual-device mesh via --xla_force_host_platform_device_count=8).
if os.environ.get('RA_PLATFORM'):
    import jax
    jax.config.update('jax_platforms', os.environ['RA_PLATFORM'])


def parse_cfg(cfg: CN, args=None) -> None:
    """Derived values (reference ``config.py:432-484``), without EasyMocap:
    n_bones comes from our own body-model npz when present."""
    if len(cfg.task) == 0:
        raise ValueError('task must be specified')

    if cfg.tpu.knn_impl not in ('auto', 'pallas', 'xla'):
        raise ValueError(
            f"tpu.knn_impl must be one of 'auto'|'pallas'|'xla', "
            f"got {cfg.tpu.knn_impl!r}")

    # body-model-driven n_bones (reference loads SMPL-H at config time)
    model_path = join(cfg.train_dataset.data_root, cfg.body_model)
    if os.path.exists(model_path):
        with np.load(model_path) as f:
            if 'weights' in f:
                cfg.n_bones = int(f['weights'].shape[1])

    # default visualization type
    types = [k for k in Output if cfg[f'vis_{k.name.lower()}_map']]
    if not types:
        cfg[f'vis_{Output.Rendering.name.lower()}_map'] = True
    if cfg.vis_ext in ('.exr', '.hdr'):
        cfg.tonemapping_rendering = False
        cfg.tonemapping_albedo = False

    if cfg.vis_ground_shading:
        cfg.store_alpha_channel = False

    if cfg.fixed_latent == -1:
        cfg.fixed_latent = 0 if cfg.test_novel_pose else -1

    if cfg.cond_dim < 0:
        cfg.cond_dim = cfg.n_bones * 3

    cfg.trained_model_dir = join(cfg.trained_model_dir, cfg.task, cfg.exp_name)
    cfg.record_dir = join(cfg.record_dir, cfg.task, cfg.exp_name)
    cfg.result_dir = join(cfg.result_dir, cfg.task, cfg.exp_name)

    cfg.local_rank = getattr(args, 'local_rank', 0) if args is not None else 0

    if cfg.profiling.enabled:
        cfg.train.epoch = 1
        cfg.ep_iter = cfg.profiling.skip_first + cfg.profiling.repeat * (
            cfg.profiling.wait + cfg.profiling.warmup + cfg.profiling.active)
        cfg.profiling.record_dir = cfg.record_dir


def update_cfg(cfg: CN, args) -> CN:
    """Reference ``config.py:487-519`` merge order, verbatim semantics."""
    cfg.merge_strain(args.cfg_file)
    cfg.merge_from_list(args.opts)

    if cfg.relighting and 'relighting_cfg' in cfg:
        cfg.merge_from_other_cfg(cfg.relighting_cfg)
    if cfg.vis_pose_sequence and 'pose_seq_cfg' in cfg:
        cfg.merge_from_other_cfg(cfg.pose_seq_cfg)
    if cfg.vis_novel_view and 'novel_view_cfg' in cfg:
        cfg.merge_from_other_cfg(cfg.novel_view_cfg)
    if (cfg.vis_tpose_mesh or cfg.vis_posed_mesh or cfg.vis_can_mesh) and 'mesh_cfg' in cfg:
        cfg.merge_from_other_cfg(cfg.mesh_cfg)
    if cfg.vis_sphere_tracing and 'sphere_tracing_cfg' in cfg:
        cfg.merge_from_other_cfg(cfg.sphere_tracing_cfg)
    if cfg.vis_novel_light and 'novel_light_cfg' in cfg:
        cfg.merge_from_other_cfg(cfg.novel_light_cfg)

    cfg.merge_from_list(args.opts)
    parse_cfg(cfg, args)
    return cfg


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument('-c', "--cfg_file", default="configs/default.yaml", type=str)
    parser.add_argument('-t', "--type", type=str, default="")
    parser.add_argument('-r', '--local_rank', type=int, default=0)
    parser.add_argument('-l', '--launcher', type=str, default='none', choices=['none', 'pytorch'])
    parser.add_argument("opts", default=[], nargs=argparse.REMAINDER)
    parser.add_argument('--test', action='store_true', dest='test', default=False)
    return parser


def maybe_init_distributed() -> None:
    """Multi-host process init — the reference's ``torchrun ... distributed
    True`` equivalent (``train.py:116-122``, ``lib/config/config.py:541-546``).

    Gated on the standard launcher env vars so single-host runs never touch
    ``jax.distributed``:

        RA_COORDINATOR=host:port RA_NUM_PROCESSES=N RA_PROCESS_ID=i python train.py ...

    (On Cloud TPU pods, plain ``jax.distributed.initialize()`` with no args
    auto-discovers the topology — set ``RA_DIST_AUTO=1`` for that.)  After
    init, ``jax.process_index()`` feeds the rank-strided TrainSampler
    (data/datasets.py) and rank-0 checkpointing, and the device mesh spans
    every host's chips.
    """
    import jax
    if os.environ.get('RA_DIST_AUTO'):
        jax.distributed.initialize()
        log(f'distributed: process {jax.process_index()}/{jax.process_count()} '
            f'(auto topology)', 'yellow')
    elif os.environ.get('RA_COORDINATOR'):
        jax.distributed.initialize(
            coordinator_address=os.environ['RA_COORDINATOR'],
            num_processes=int(os.environ['RA_NUM_PROCESSES']),
            process_id=int(os.environ['RA_PROCESS_ID']))
        log(f'distributed: process {jax.process_index()}/{jax.process_count()} '
            f'@ {os.environ["RA_COORDINATOR"]}', 'yellow')


def setup(argv=None):
    """Parse CLI and populate the global cfg in-place. Returns (cfg, args)."""
    maybe_init_distributed()
    args = make_parser().parse_args(argv)
    if len(args.type) > 0:
        cfg.task = "run"
    update_cfg(cfg, args)
    if cfg.fix_random:
        # reference fix_random seeds torch/cuda/numpy/random + cudnn.deterministic
        # (net_utils.py:1376-1384); here host-side RNGs — device randomness is
        # already deterministic via explicit PRNGKey(cfg.seed) threading
        import random as _random
        import numpy as _np
        _np.random.seed(int(cfg.get('seed', 42)))
        _random.seed(int(cfg.get('seed', 42)))
    log(cfg.exp_name, 'magenta')
    return cfg, args
