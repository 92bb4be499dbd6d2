"""Factories: config strings -> network params / renderer instances.

Replaces the reference importlib dispatch (``lib/networks/make_network.py``,
``make_renderer.py``) with the registry; reference module strings keep
working.  Checkpoint bootstrap follows the reference semantics: resume from
``cfg.trained_model_dir`` latest, and for the relight stage load the stage-1
geometry from ``cfg.geometry_pretrain`` with strict=False
(``relight_network.py:36-37``); a reference ``latest.pth`` in either dir is
imported through the torch converter.
"""
from __future__ import annotations

import os
from os.path import exists, join

import jax

from relightableavatar_tpu.models import anisdf
from relightableavatar_tpu.models.anisdf import AniSDFConfig
from relightableavatar_tpu.train.checkpoints import load_model, load_params, load_torch_pth
from relightableavatar_tpu.utils.log import log
from relightableavatar_tpu.utils.registry import register, resolve

# renderer registrations (import side effects register visualizers/datasets too)
from relightableavatar_tpu.renderer.volume import VolumeRenderer
from relightableavatar_tpu.renderer.orchestrate import (NovelLightRenderer,
                                                        SphereTracingRenderer)
from relightableavatar_tpu.renderer.mesh import MeshRenderer

register('renderer', 'lib.networks.renderer.base_renderer', 'base_renderer')(VolumeRenderer)
register('renderer', 'lib.networks.renderer.sphere_tracing_renderer', 'sphere_tracing_renderer')(SphereTracingRenderer)
register('renderer', 'lib.networks.renderer.novel_light_sphere_tracing', 'novel_light_sphere_tracing')(NovelLightRenderer)
register('renderer', 'lib.networks.renderer.mesh_renderer', 'mesh_renderer')(MeshRenderer)


def _try_load(params, model_dir: str, strict: bool = True):
    """Load newest checkpoint from model_dir into params (npz native or
    imported torch .pth). Returns (params, loaded: bool)."""
    if not model_dir:
        return params, False
    npz = join(model_dir, 'latest.npz')
    pth = join(model_dir, 'latest.pth')
    if exists(npz):
        try:
            state, _, _ = load_model(model_dir, dict(net=params))
            return state['net'], True
        except (KeyError, ValueError) as e:
            if strict:
                raise
            log(f'partial load from {npz}: {e}', 'yellow')
            return params, False
    if exists(pth):
        try:
            return load_torch_pth(params, pth), True
        except (KeyError, ValueError) as e:
            if strict:
                raise
            log(f'partial torch import from {pth}: {e}', 'yellow')
    # npz file directly (fixtures)
    if model_dir.endswith('.npz') and exists(model_dir):
        return load_params(params, model_dir), True
    return params, False


def make_network(cfg, seed: int = 0):
    """Returns (params, mcfg). network_module selects stage
    (deform vs relight) exactly like the reference config strings."""
    relight = ('relight' in cfg.network_module) or cfg.relighting
    cfg.relighting = cfg.relighting or relight
    mcfg = AniSDFConfig.from_cfg(cfg)
    params = anisdf.init_anisdf(jax.random.PRNGKey(seed), mcfg)

    if relight and cfg.geometry_pretrain:
        # stage-2 bootstraps stage-1 geometry (strict=False)
        geo_mcfg = mcfg._replace(relight=False)
        geo_params = {k: v for k, v in params.items()
                      if k in ('resd', 'sdf', 'beta', 'rgb')}
        geo_params, ok = _try_load(geo_params, cfg.geometry_pretrain, strict=False)
        if ok:
            params.update(geo_params)
            log(f'loaded geometry pretrain from {cfg.geometry_pretrain}', 'green')

    params, ok = _try_load(params, cfg.trained_model_dir, strict=False)
    if ok:
        log(f'loaded network from {cfg.trained_model_dir}', 'green')
    return params, mcfg


def make_renderer(cfg, params, mcfg):
    ctor = resolve('renderer', cfg.renderer_module)
    return ctor(cfg, params, mcfg)


def make_evaluator(cfg):
    import relightableavatar_tpu.eval.evaluator  # noqa: F401 registration
    return resolve('evaluator', cfg.evaluator_module)(cfg)


def make_visualizer(cfg):
    import relightableavatar_tpu.vis.visualizer  # noqa: F401 registration
    return resolve('visualizer', cfg.visualizer_module)(cfg)
