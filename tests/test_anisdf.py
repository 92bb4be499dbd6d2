"""Integration tests: AniSDF warping, HDQ SDF and the volume renderer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightableavatar_tpu.models import anisdf
from relightableavatar_tpu.models.anisdf import AniSDFConfig
from relightableavatar_tpu.models.context import make_frame_context, make_bigpose
from relightableavatar_tpu.smpl import synthetic


N_BONES = 52


@pytest.fixture(scope="module")
def setup():
    model = synthetic.make_body_model(n_bones=N_BONES, target_verts=1500, seed=0)
    motion = synthetic.make_motion(5, n_bones=N_BONES, seed=0)
    shapes = motion["shapes"][0]
    tverts, tjoints, big_A, _ = make_bigpose(model, shapes)
    ctx = make_frame_context(model, tverts, tjoints, big_A,
                             motion["poses"][2], motion["Rh"][2], motion["Th"][2],
                             shapes)
    mcfg = AniSDFConfig(n_bones=N_BONES, cond_dim=N_BONES * 3, sdf_res=6,
                        dist_th=0.1, bf16=False)
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)
    return model, ctx, mcfg, params


def test_world_to_bigpose_smpl_verts_map_near_canonical(setup):
    """Posed SMPL vertices warped world->bigpose should land near the
    canonical (bigpose) vertices."""
    model, ctx, mcfg, params = setup
    wverts = np.asarray(ctx["pverts"] @ ctx["R"].T + ctx["Th"])  # world verts
    sel = np.arange(0, len(wverts), 37)
    out = anisdf.world_to_bigpose(mcfg, ctx, jnp.asarray(wverts[sel]))
    bpts = np.asarray(out.bpts)
    tv = np.asarray(ctx["tverts"])[sel]
    err = np.linalg.norm(bpts - tv, axis=-1)
    # K=3 gaussian blending smooths; vertices should stay within ~2cm
    assert np.median(err) < 0.02, np.median(err)
    assert bool(np.asarray(out.mask).all())


def test_mask_far_points_inactive(setup):
    model, ctx, mcfg, params = setup
    far_pts = jnp.asarray(np.tile([5.0, 5.0, 5.0], (8, 1)).astype(np.float32))
    out = anisdf.world_to_bigpose(mcfg, ctx, far_pts)
    assert not bool(np.asarray(out.mask).any())
    # smpl fallback distance should be ~ distance to the body
    assert float(np.asarray(out.smpl_sdf).min()) > 1.0


def test_hdq_sdf_far_equals_smpl_distance(setup):
    model, ctx, mcfg, params = setup
    far_pts = jnp.asarray(np.tile([3.0, 0.0, 1.0], (4, 1)).astype(np.float32))
    sdf = np.asarray(anisdf.hdq_sdf(params, mcfg, ctx, far_pts))
    wverts = np.asarray(ctx["pverts"] @ ctx["R"].T + ctx["Th"])
    d_true = np.linalg.norm(wverts[None] - np.asarray(far_pts)[:, None], axis=-1).min(1)
    np.testing.assert_allclose(sdf[:, 0], d_true, atol=0.05)


def test_hdq_sdf_finite_everywhere(setup):
    model, ctx, mcfg, params = setup
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-2, 2, (256, 3)).astype(np.float32) + [0, 0, 1.0])
    sdf = np.asarray(anisdf.hdq_sdf(params, mcfg, ctx, pts))
    assert np.isfinite(sdf).all()


def test_forward_shapes(setup):
    model, ctx, mcfg, params = setup
    rng = np.random.default_rng(1)
    P = 64
    x = jnp.asarray(rng.uniform(-0.5, 0.5, (P, 3)).astype(np.float32) + [0, 0, 1.0])
    v = jnp.asarray(np.tile([0, 1.0, 0], (P, 1)).astype(np.float32))
    ret = anisdf.forward(params, mcfg, ctx, x, v, training=False)
    assert ret.raw.shape == (P, 3 + 3 + 3 + 3 + 3 + 1)  # cpts bpts resd norm rgb occ
    ret_t = anisdf.forward(params, mcfg, ctx, x, v, training=True)
    assert ret_t.raw.shape == (P, 7)
    assert ret_t.residuals.shape == (P, 3)
    assert ret_t.gradients.shape == (P, 3)
    assert np.isfinite(np.asarray(ret_t.gradients)).all()


def test_forward_relight_shapes(setup):
    model, ctx, mcfg, params = setup
    rmcfg = mcfg._replace(relight=True)
    rparams = dict(params)
    rparams.update(anisdf.init_relight_heads(jax.random.PRNGKey(1), rmcfg))
    P = 32
    x = jnp.asarray(np.zeros((P, 3), np.float32) + [0.1, 0, 1.0])
    ret = anisdf.forward(rparams, rmcfg, ctx, x, None, training=False)
    assert ret.raw.shape == (P, 3 + 3 + 3 + 3 + 1 + 3 + 1)
    albedo = anisdf.albedo_head(rparams, rmcfg, jnp.zeros((4, rmcfg.feat_dim)))
    assert (np.asarray(albedo) >= rmcfg.albedo_bias).all()
    assert (np.asarray(albedo) <= rmcfg.albedo_bias + rmcfg.albedo_slope).all()
    rough = anisdf.roughness_head(rparams, rmcfg, jnp.zeros((4, rmcfg.feat_dim)))
    assert (np.asarray(rough) >= rmcfg.roughness_bias).all()


def test_eikonal_property_of_hdq(setup):
    """Finite-difference gradient of the HDQ far from the body should have
    unit norm (it's a true euclidean distance there).

    eps is chosen above the hot path's bf16 KNN tie-swap scale (~3 mm,
    ops/knn.py fast-mode note): the far-field distance has sub-3 mm jumps
    at neighbour crossings, which a 1 mm probe would amplify 3x."""
    model, ctx, mcfg, params = setup
    p0 = jnp.asarray([[2.0, 0.0, 1.0]])
    eps = 5e-2
    grads = []
    for d in range(3):
        dp = np.zeros((1, 3), np.float32)
        dp[0, d] = eps
        s1 = float(anisdf.hdq_sdf(params, mcfg, ctx, p0 + dp)[0, 0])
        s0 = float(anisdf.hdq_sdf(params, mcfg, ctx, p0 - dp)[0, 0])
        grads.append((s1 - s0) / (2 * eps))
    gn = np.linalg.norm(grads)
    assert abs(gn - 1.0) < 0.1, gn


def test_volume_renderer_runs(setup):
    from relightableavatar_tpu.config import default_cfg
    from relightableavatar_tpu.renderer.volume import VolumeRenderer
    from relightableavatar_tpu.utils.dotdict import dotdict
    model, ctx, mcfg, params = setup
    cfg = default_cfg()
    cfg.n_samples = 16
    cfg.tpu.ray_block = 128
    r = VolumeRenderer(cfg, params, mcfg)
    # rays aimed at the body center from +x
    P = 200
    rng = np.random.default_rng(2)
    center = np.asarray(ctx["Th"]).reshape(3) + [0, 0, 0.0]
    ray_o = np.tile(center + [2.5, 0, 0], (P, 1)).astype(np.float32)
    target = center + rng.normal(0, 0.3, (P, 3))
    ray_d = (target - ray_o).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    batch = dotdict(ray_o=ray_o, ray_d=ray_d,
                    near=np.full(P, 1.0, np.float32),
                    far=np.full(P, 4.0, np.float32), ctx=ctx)
    out = r.render(batch, training=False)
    assert out.rgb_map.shape == (P, 3)
    assert out.acc_map.shape == (P,)
    assert np.isfinite(np.asarray(out.rgb_map)).all()
    assert out.norm_map.shape == (P, 3)
    assert out.depth_map.shape == (P,)


def test_smpl_distance_affects_hdq_not_volume_forward():
    """cfg.smpl_distance swaps the canonical SDF inside HDQ (the sphere-traced
    world-geometry query, base_network.py:417-427) but — like the reference —
    does NOT touch the volume-render forward path (forward_geometry queries
    the neural SDF directly)."""
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.smpl import synthetic
    model = synthetic.make_body_model(n_bones=52, target_verts=800, seed=0)
    motion = synthetic.make_motion(2, n_bones=52, seed=0)
    sh = motion['shapes'][0]
    tv, tj, bA, _ = make_bigpose(model, sh)
    ctx = make_frame_context(model, tv, tj, bA, motion['poses'][0],
                             motion['Rh'][0], motion['Th'][0], sh)
    m0 = AniSDFConfig(n_bones=52, cond_dim=156, sdf_res=6)
    m1 = m0._replace(smpl_distance=True)
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), m0)
    r = np.random.default_rng(0)
    x = jnp.asarray(np.asarray(ctx['Th']).reshape(1, 3)
                    + r.normal(0, 0.3, (64, 3)).astype(np.float32))
    a = anisdf.hdq_sdf(params, m0, ctx, x)
    b = anisdf.hdq_sdf(params, m1, ctx, x)
    assert float(jnp.abs(a - b).max()) > 1e-3, "flag must change HDQ"
    v = jnp.asarray(r.normal(size=(64, 3)).astype(np.float32))
    f0 = anisdf.forward(params, m0, ctx, x, v).raw
    f1 = anisdf.forward(params, m1, ctx, x, v).raw
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-6)
