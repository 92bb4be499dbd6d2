"""Ground-plane relighting pass (reference render_ground,
sphere_tracing_renderer.py:430-549): Möller–Trumbore plane hit, env light
visibility, distance blend, optional envmap-attached albedo."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    import os
    from relightableavatar_tpu.config import default_cfg
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.smpl.body_model import BodyModel
    from relightableavatar_tpu.train.checkpoints import load_params

    root = os.path.join(os.path.dirname(__file__), '..')
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
    cfg.tpu.lvis_downscale = 8
    cfg.tpu.distant_envmap = True
    cfg.env_lvis.iter = 2
    mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=8)
    params = load_params(
        anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg),
        os.path.join(root, 'fixtures/synthetic_avatar_params.npz'))
    return cfg, mcfg, params, ctx


@pytest.mark.parametrize("attach", [True, False])
def test_render_ground_block(setup, attach):
    from relightableavatar_tpu.ops.envmap import gen_light_xyz
    from relightableavatar_tpu.renderer.ground import render_ground_block
    from relightableavatar_tpu.renderer.sphere_tracing import RelightRenderConfig
    from relightableavatar_tpu.renderer.tracing import STConfig

    cfg, mcfg, params, ctx = setup
    P = 64
    rng = np.random.default_rng(3)
    center = np.asarray(ctx['Th']).reshape(3)
    ray_o = np.tile(center + [2.0, 0, 1.5], (P, 1)).astype(np.float32)
    # aim downward past the body so rays hit the ground plane
    tgt = center + rng.normal(0, 0.5, (P, 3)) * [1, 1, 0.2]
    ray_d = (tgt - ray_o).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)

    lx, la = gen_light_xyz(2, 4, 10.0)
    ls = 1.0 / jnp.sqrt(la / np.pi)
    st_env = STConfig.from_cfg({**dict(cfg.sphere_tracing),
                                **dict(cfg.env_lvis)})
    rcfg = RelightRenderConfig(shadow_block=512, distant_envmap=True,
                               lvis_downscale=1)
    probe = jnp.full((2, 4, 3), 0.5)
    out = render_ground_block(
        params, mcfg, ctx, jnp.asarray(ray_o), jnp.asarray(ray_d),
        jnp.ones(P), probe, probe, lx, la, ls,
        jnp.asarray(np.asarray(cfg.ground_normal, np.float32)),
        jnp.asarray(np.asarray(cfg.ground_origin, np.float32)),
        jnp.asarray(np.asarray(cfg.ground_albedo, np.float32)),
        st_env, rcfg, attach)
    img = np.asarray(out.rgb_map)
    assert img.shape == (P, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0  # lit ground is not black
