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
