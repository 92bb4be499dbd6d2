"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Validates (SURVEY.md §4 item 7) that the sharded compute paths produce the
same results as single-device execution and that the jitted train step
compiles + runs with rays sharded across the mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from relightableavatar_tpu.models import anisdf
from relightableavatar_tpu.models.anisdf import AniSDFConfig
from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
from relightableavatar_tpu.parallel.mesh import get_mesh, replicate, shard_rays
from relightableavatar_tpu.smpl import synthetic


@pytest.fixture(scope="module")
def setup():
    model = synthetic.make_body_model(n_bones=52, target_verts=800, seed=0)
    motion = synthetic.make_motion(1, n_bones=52)
    tverts, tjoints, big_A, _ = make_bigpose(model, motion["shapes"][0])
    ctx = make_frame_context(model, tverts, tjoints, big_A,
                             motion["poses"][0], motion["Rh"][0],
                             motion["Th"][0], motion["shapes"][0])
    mcfg = AniSDFConfig(n_bones=52, cond_dim=156, sdf_res=6)
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)
    return params, mcfg, ctx


def test_mesh_has_8_devices():
    mesh = get_mesh()
    assert mesh.devices.size == 8


def test_sharded_hdq_matches_single_device(setup):
    params, mcfg, ctx = setup
    mesh = get_mesh()
    rng = np.random.default_rng(0)
    P_pts = 8 * 64
    pts = jnp.asarray(rng.uniform(-1, 1, (P_pts, 3)).astype(np.float32) + [0, 0, 1])

    fn = jax.jit(lambda p, c, x: anisdf.hdq_sdf(p, mcfg, c, x))
    ref = np.asarray(fn(params, ctx, pts))

    pts_sharded = jax.device_put(pts, NamedSharding(mesh, P("rays")))
    params_r = replicate(mesh, params)
    ctx_r = replicate(mesh, ctx)
    out = np.asarray(fn(params_r, ctx_r, pts_sharded))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sharded_forward_matches(setup):
    params, mcfg, ctx = setup
    mesh = get_mesh()
    rng = np.random.default_rng(1)
    P_pts = 8 * 16
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (P_pts, 3)).astype(np.float32) + [0, 0, 1])
    v = jnp.asarray(np.tile([0, 1.0, 0], (P_pts, 1)).astype(np.float32))

    fn = jax.jit(lambda p, c, xx, vv: anisdf.forward(p, mcfg, c, xx, vv).raw)
    ref = np.asarray(fn(params, ctx, x, v))

    sh = NamedSharding(mesh, P("rays"))
    out = np.asarray(fn(replicate(mesh, params), replicate(mesh, ctx),
                        jax.device_put(x, sh), jax.device_put(v, sh)))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_grad_matches_single(setup):
    """Grad psum across the mesh must equal the single-device gradient."""
    params, mcfg, ctx = setup
    mesh = get_mesh()
    rng = np.random.default_rng(2)
    P_pts = 8 * 32
    x = jnp.asarray(rng.uniform(-0.3, 0.3, (P_pts, 3)).astype(np.float32) + [0, 0, 1])
    tgt = jnp.asarray(rng.random((P_pts, 1), np.float32))

    def loss(p, xx):
        sdf = anisdf.observed_sdf(p, mcfg, ctx, xx)
        return jnp.mean((sdf - tgt) ** 2)

    gfn = jax.jit(jax.grad(loss))
    g_ref = gfn(params, x)
    sh = NamedSharding(mesh, P("rays"))
    g_sh = gfn(replicate(mesh, params), jax.device_put(x, sh))
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)

@pytest.fixture(scope="module")
def relight_setup():
    """Tiny relight model + rays aimed at the body (VERDICT r2 item 4:
    multi-device coverage for the stage-2 compute paths — the reference's
    DDP wraps BOTH trainers, lib/train/trainers/trainer.py:23-29)."""
    model = synthetic.make_body_model(n_bones=52, target_verts=800, seed=0)
    motion = synthetic.make_motion(1, n_bones=52)
    tverts, tjoints, big_A, _ = make_bigpose(model, motion["shapes"][0])
    ctx = make_frame_context(model, tverts, tjoints, big_A,
                             motion["poses"][0], motion["Rh"][0],
                             motion["Th"][0], motion["shapes"][0])
    mcfg = AniSDFConfig(n_bones=52, cond_dim=156, sdf_res=6, relight=True,
                        env_h=2, env_w=4)
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)

    P_rays = 8 * 4
    center = np.asarray(ctx["Th"]).reshape(3) + [0, 0, 1.0]
    rng = np.random.default_rng(3)
    ray_o = np.tile(center + [2.0, 0, 0], (P_rays, 1)).astype(np.float32)
    tgt = center + rng.normal(0, 0.25, (P_rays, 3))
    ray_d = (tgt - ray_o).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    return params, mcfg, ctx, ray_o, ray_d


def test_sharded_render_human_block_matches(relight_setup):
    """The full relight render path (trace + light visibility + microfacet
    shading) must be ray-shardable: sharded output == single-device."""
    from relightableavatar_tpu.ops.envmap import gen_light_xyz
    from relightableavatar_tpu.renderer.sphere_tracing import (
        RelightRenderConfig, render_human_block)
    from relightableavatar_tpu.renderer.tracing import STConfig

    params, mcfg, ctx, ray_o, ray_d = relight_setup
    mesh = get_mesh()
    P_rays = ray_o.shape[0]

    xyz, area = gen_light_xyz(2, 4, 10.0)
    sharp = 1.0 / jnp.sqrt(area / np.pi)
    probe = jnp.ones((2, 4, 3)) * 0.5
    st_surf = STConfig(iter=3)
    st_obj = STConfig(iter=2, offset=0.01, near_offset=0.02, dist_th=0.05)
    rcfg = RelightRenderConfig(shadow_block=64, want_light_maps=True)

    def fn(p, c, ro, rd, nr, fr):
        return render_human_block(p, mcfg, c, ro, rd, nr, fr,
                                  probe, xyz, area, sharp,
                                  st_surf, st_obj, rcfg, False)

    fn = jax.jit(fn)
    near = jnp.full(P_rays, 0.5)
    far = jnp.full(P_rays, 4.0)
    ref = fn(params, ctx, jnp.asarray(ray_o), jnp.asarray(ray_d), near, far)

    sh = NamedSharding(mesh, P("rays"))
    pr, cr = replicate(mesh, params), replicate(mesh, ctx)
    out = fn(pr, cr,
             jax.device_put(jnp.asarray(ray_o), sh),
             jax.device_put(jnp.asarray(ray_d), sh),
             jax.device_put(near, sh), jax.device_put(far, sh))
    for k in ('rgb_map', 'acc_map', 'norm_map', 'albedo_map', 'lvis_map'):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=5e-4, err_msg=k)


def test_sharded_reshade_matches(relight_setup):
    """The novel-light re-shade (geometry/visibility cached, shading per
    light) must be ray-shardable (novel_light_sphere_tracing.py:21-98)."""
    from relightableavatar_tpu.ops.envmap import gen_light_xyz
    from relightableavatar_tpu.renderer.orchestrate import reshade_block
    from relightableavatar_tpu.renderer.sphere_tracing import RelightRenderConfig

    params, mcfg, ctx, ray_o, ray_d = relight_setup
    mesh = get_mesh()
    P_rays = ray_o.shape[0]
    rng = np.random.default_rng(4)
    L = 2 * 4

    xyz, area = gen_light_xyz(2, 4, 10.0)
    probe = jnp.asarray(rng.random((2, 4, 3)), jnp.float32)
    surf = jnp.asarray(ray_o + 1.5 * ray_d)
    norm = jnp.asarray(-ray_d)
    albedo = jnp.asarray(rng.random((P_rays, 3)), jnp.float32)
    rough = jnp.asarray(rng.uniform(0.2, 0.9, (P_rays, 1)), jnp.float32)
    lvis = jnp.asarray(rng.random((P_rays, L)), jnp.float32)
    ldot = jnp.asarray(rng.uniform(-1, 1, (P_rays, L)), jnp.float32)
    acc = jnp.asarray(rng.random(P_rays), jnp.float32)
    rcfg = RelightRenderConfig(tonemapping=True)

    ref = reshade_block(surf, norm, albedo, rough, lvis, ldot, acc,
                        jnp.asarray(ray_o), probe, xyz, area, rcfg)

    sh = NamedSharding(mesh, P("rays"))
    shd = lambda x: jax.device_put(x, sh)
    rep = lambda x: jax.device_put(x, NamedSharding(mesh, P()))
    out = reshade_block(shd(surf), shd(norm), shd(albedo), shd(rough),
                        shd(lvis), shd(ldot), shd(acc),
                        shd(jnp.asarray(ray_o)), rep(probe), rep(jnp.asarray(xyz)),
                        rep(jnp.asarray(area)), rcfg)
    np.testing.assert_allclose(np.asarray(out.rgb_map), np.asarray(ref.rgb_map),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.shade_map),
                               np.asarray(ref.shade_map), atol=2e-5)


def test_sharded_reshade_sweep_matches(relight_setup):
    """The BATCHED K-light sweep (reshade_sweep_block: all probes in one
    executable, r4) must shard over rays too — weights (P, L) split on P,
    probe stack replicated, outputs (K, P, 3) sharded on axis 1."""
    from relightableavatar_tpu.ops.envmap import gen_light_xyz
    from relightableavatar_tpu.renderer.orchestrate import reshade_sweep_block
    from relightableavatar_tpu.renderer.sphere_tracing import RelightRenderConfig

    params, mcfg, ctx, ray_o, ray_d = relight_setup
    mesh = get_mesh()
    P_rays = ray_o.shape[0]
    rng = np.random.default_rng(7)
    L, K = 2 * 4, 3

    xyz, area = gen_light_xyz(2, 4, 10.0)
    probes = jnp.asarray(rng.random((K, 2, 4, 3)), jnp.float32)
    surf = jnp.asarray(ray_o + 1.5 * ray_d)
    norm = jnp.asarray(-ray_d)
    albedo = jnp.asarray(rng.random((P_rays, 3)), jnp.float32)
    rough = jnp.asarray(rng.uniform(0.2, 0.9, (P_rays, 1)), jnp.float32)
    lvis = jnp.asarray(rng.random((P_rays, L)), jnp.float32)
    ldot = jnp.asarray(rng.uniform(-1, 1, (P_rays, L)), jnp.float32)
    acc = jnp.asarray(rng.random(P_rays), jnp.float32)

    for distant in (True, False):
        rcfg = RelightRenderConfig(tonemapping=True, distant_envmap=distant)
        ref = reshade_sweep_block(surf, norm, albedo, rough, lvis, ldot, acc,
                                  jnp.asarray(ray_o), probes,
                                  jnp.asarray(xyz), jnp.asarray(area), rcfg)
        sh = NamedSharding(mesh, P("rays"))
        shd = lambda x: jax.device_put(x, sh)
        rep = lambda x: jax.device_put(x, NamedSharding(mesh, P()))
        out = reshade_sweep_block(
            shd(surf), shd(norm), shd(albedo), shd(rough), shd(lvis),
            shd(ldot), shd(acc), shd(jnp.asarray(ray_o)), rep(probes),
            rep(jnp.asarray(xyz)), rep(jnp.asarray(area)), rcfg)
        np.testing.assert_allclose(np.asarray(out.rgb_map),
                                   np.asarray(ref.rgb_map), atol=2e-5,
                                   err_msg=f'distant={distant}')
        np.testing.assert_allclose(np.asarray(out.shade_map),
                                   np.asarray(ref.shade_map), atol=2e-5,
                                   err_msg=f'distant={distant}')
