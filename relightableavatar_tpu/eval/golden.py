"""Golden bench-stack render, shared by tests/test_golden.py and bench.py
(VERDICT r2 item 8: the bench itself asserts the golden so perf work cannot
silently shift bench-path pixels between rounds).

The image is a 64px frame of the tracked fixture avatar through the FULL
orchestrator with the bench acceleration stack (lvis_sweep + shadow_grid +
lvis_downscale=2 + distant_envmap), f32-deterministic.  The golden file lives
at tests/golden_benchstack_64px.npy.
"""
from __future__ import annotations

import os

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), '..', '..', 'tests',
                           'golden_benchstack_64px.npy')


def render_benchstack_64(root: str = '.', cfg_overrides: dict | None = None):
    """(img (N,3) float32, n_fg_rays) — the deterministic bench-stack frame.

    ``cfg_overrides``: extra ``cfg.tpu`` knobs applied on top of the bench
    stack (used by tests to prove perf knobs like ``surf_miss_skip`` keep
    golden pixels)."""
    import jax
    from relightableavatar_tpu.config import default_cfg
    from relightableavatar_tpu.data.rays import get_full_near_far, get_rays
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import (make_bigpose,
                                                      make_frame_context)
    from relightableavatar_tpu.renderer.orchestrate import SphereTracingRenderer
    from relightableavatar_tpu.smpl import synthetic
    from relightableavatar_tpu.smpl.body_model import BodyModel
    from relightableavatar_tpu.train.checkpoints import load_params
    from relightableavatar_tpu.utils.dotdict import dotdict

    model = BodyModel(os.path.join(root, 'fixtures/synthetic_body.npz'))
    motion = dict(np.load(os.path.join(root, 'fixtures/synthetic_motion.npz')))
    sh = motion['shapes'][0]
    tv, tj, bA, _ = make_bigpose(model, sh)
    ctx = make_frame_context(model, tv, tj, bA, motion['poses'][0],
                             motion['Rh'][0], motion['Th'][0], sh)
    cfg = default_cfg()
    cfg.n_bones = model.n_bones
    cfg.cond_dim = model.n_bones * 3
    cfg.relighting = True
    cfg.n_samples = 3
    cfg.dist_th = 0.125
    cfg.obj_lvis.dist_th = 0.125
    cfg.sphere_tracing.iter = 6     # CPU-affordable; the STACK is the target
    cfg.obj_lvis.iter = 2
    cfg.tpu.ray_block = 1024
    cfg.tpu.bf16_mlp = False        # goldens stay f32-deterministic
    # the bench acceleration stack, scaled to 64px
    cfg.tpu.lvis_downscale = 2
    cfg.tpu.shadow_grid = 48
    cfg.tpu.lvis_sweep = True
    cfg.tpu.lvis_query_offset = 0.0
    cfg.tpu.distant_envmap = True
    cfg.tpu.surf_grid_iters = 0
    cfg.tpu.surf_exact_iters = 0
    for k, v in (cfg_overrides or {}).items():
        cfg.tpu[k] = v
    mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=8)
    params = load_params(
        anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg),
        os.path.join(root, 'fixtures/synthetic_avatar_params.npz'))

    H = W = 64
    cams = synthetic.make_cameras(4, H=H, W=W)
    K, R, T = cams['K'][0], cams['R'][0], cams['T'][0] / 1000.0
    ray_o, ray_d = get_rays(H, W, K, R, T)
    wb = np.asarray(ctx['wbounds'])
    near, far, mab = get_full_near_far(wb, ray_o.reshape(-1, 3),
                                       ray_d.reshape(-1, 3))
    batch = dotdict(ray_o=ray_o.reshape(-1, 3)[mab],
                    ray_d=ray_d.reshape(-1, 3)[mab],
                    near=near[mab], far=far[mab], ctx=ctx)
    # the goldens were generated with full-f32 matmuls (CPU); TPU MXU default
    # precision is bf16-pass, which would read as golden drift
    with jax.default_matmul_precision('highest'):
        out = SphereTracingRenderer(cfg, params, mcfg).render(batch)
        img = np.asarray(out.rgb_map, np.float32)
    return img, int(mab.sum())


def check_golden(img: np.ndarray, golden_path: str = GOLDEN_PATH,
                 min_psnr: float = 45.0):
    """(ok, psnr_vs_golden | None).  None when the golden is absent."""
    if not os.path.exists(golden_path):
        return False, None
    ref = np.load(golden_path)
    if img.shape != ref.shape:
        return False, 0.0
    mse = float(((img - ref) ** 2).mean())
    psnr = -10 * np.log10(mse + 1e-12)
    return bool(psnr > min_psnr), round(float(psnr), 2)
