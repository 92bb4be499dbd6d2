"""Sphere tracer unit tests on analytic SDFs + relight pipeline smoke test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightableavatar_tpu.renderer.tracing import STConfig, sphere_trace, softer_shadow


def sphere_sdf(center, radius):
    c = jnp.asarray(center)
    return lambda x: (jnp.linalg.norm(x - c, axis=-1, keepdims=True) - radius)


def test_trace_hits_analytic_sphere():
    """Rays toward a unit sphere at origin from z=+3 must hit at z=1."""
    P = 16
    ray_o = jnp.asarray(np.tile([0, 0, 3.0], (P, 1)).astype(np.float32))
    ray_d = jnp.asarray(np.tile([0, 0, -1.0], (P, 1)).astype(np.float32))
    near = jnp.full((P, 1), 0.1)
    far = jnp.full((P, 1), 6.0)
    st = STConfig(iter=32, offset=0.0, relax=0.0)
    surf, edge, occ, st_t, ot_t = sphere_trace(sphere_sdf([0, 0, 0], 1.0),
                                               ray_o, ray_d, near, far, st)
    np.testing.assert_allclose(np.asarray(surf[:, 2]), 1.0, atol=1e-3)
    # hard-shadow occ should be ~0 (ray hits the surface)
    assert float(jnp.max(occ)) < 0.05


def test_trace_miss_keeps_occ_one():
    P = 4
    ray_o = jnp.asarray(np.tile([5, 5, 5.0], (P, 1)).astype(np.float32))
    ray_d = jnp.asarray(np.tile([0, 0, 1.0], (P, 1)).astype(np.float32))
    near = jnp.full((P, 1), 0.1)
    far = jnp.full((P, 1), 4.0)
    st = STConfig(iter=16)
    _, _, occ, _, _ = sphere_trace(sphere_sdf([0, 0, 0], 1.0),
                                   ray_o, ray_d, near, far, st)
    assert float(jnp.min(occ)) > 0.9


def test_trace_offset_surface_refinement():
    """With offset stepping, sign-flip interp should still land near surface."""
    P = 8
    ray_o = jnp.asarray(np.tile([0, 0, 3.0], (P, 1)).astype(np.float32))
    ray_d = jnp.asarray(np.tile([0, 0, -1.0], (P, 1)).astype(np.float32))
    near = jnp.full((P, 1), 0.1)
    far = jnp.full((P, 1), 6.0)
    st = STConfig(iter=16, offset=0.02)
    surf, *_ = sphere_trace(sphere_sdf([0, 0, 0], 1.0), ray_o, ray_d, near, far, st)
    np.testing.assert_allclose(np.asarray(surf[:, 2]), 1.0, atol=0.02)


def test_soft_shadow_penumbra_gradient():
    """Rays grazing a sphere blocker should get occ between 0 and 1, with
    closer misses darker (the DFSS cone)."""
    offsets = np.asarray([1.05, 1.3, 2.0], np.float32)  # lateral miss distances
    P = len(offsets)
    ray_o = jnp.asarray(np.stack([offsets, np.zeros(P), np.full(P, -3.0)], -1))
    ray_d = jnp.asarray(np.tile([0, 0, 1.0], (P, 1)).astype(np.float32))
    near = jnp.full((P, 1), 0.1)
    far = jnp.full((P, 1), 6.0)
    st = STConfig(iter=32, offset=0.0, shadow_skip_iter=0)
    tan_i = jnp.full((P, 1), 20.0)  # fairly soft light
    _, _, occ, _, _ = sphere_trace(sphere_sdf([0, 0, 0], 1.0), ray_o, ray_d,
                                   near, far, st, tan_i=tan_i, soft_shadow=True)
    occ = np.asarray(occ[:, 0])
    assert occ[0] < occ[1] < occ[2], occ
    assert occ[0] < 0.6 and occ[2] > 0.9


def test_softer_shadow_runs():
    P = 4
    ray_o = jnp.asarray(np.tile([2.0, 0, 0], (P, 1)).astype(np.float32))
    ray_d = jnp.asarray(np.tile([0, 0, 1.0], (P, 1)).astype(np.float32))
    near = jnp.full((P, 1), 0.1)
    far = jnp.full((P, 1), 4.0)
    st = STConfig(iter=8)
    _, _, occ, _, _ = softer_shadow(sphere_sdf([0, 0, 2.0], 1.0),
                                    ray_o, ray_d, near, far, st,
                                    tan_i=jnp.full((P, 1), 10.0))
    assert np.isfinite(np.asarray(occ)).all()


# ---------------------------------------------------------------- relight e2e
@pytest.mark.slow
def test_render_human_block_relight():
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.ops.envmap import gen_light_xyz
    from relightableavatar_tpu.renderer.sphere_tracing import (
        RelightRenderConfig, render_human_block)
    from relightableavatar_tpu.renderer.tracing import STConfig
    from relightableavatar_tpu.smpl import synthetic

    model = synthetic.make_body_model(n_bones=52, target_verts=1200, seed=0)
    motion = synthetic.make_motion(2, n_bones=52, seed=0)
    shapes = motion["shapes"][0]
    tverts, tjoints, big_A, _ = make_bigpose(model, shapes)
    ctx = make_frame_context(model, tverts, tjoints, big_A,
                             motion["poses"][0], motion["Rh"][0], motion["Th"][0],
                             shapes)
    mcfg = AniSDFConfig(n_bones=52, cond_dim=156, sdf_res=6, relight=True,
                        env_h=4, env_w=8)
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)

    P = 32
    center = np.asarray(ctx["Th"]).reshape(3) + [0, 0, 1.0]  # torso height
    rng = np.random.default_rng(0)
    ray_o = np.tile(center + [2.0, 0, 0], (P, 1)).astype(np.float32)
    tgt = center + rng.normal(0, 0.25, (P, 3))
    ray_d = (tgt - ray_o).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)

    xyz, area = gen_light_xyz(4, 8, 10.0)
    sharp = 1.0 / jnp.sqrt(area / np.pi)
    probe = jnp.ones((4, 8, 3)) * 0.5

    st_surf = STConfig(iter=4)
    st_obj = STConfig(iter=2, offset=0.01, near_offset=0.02, dist_th=0.05)
    rcfg = RelightRenderConfig(shadow_block=256, want_light_maps=True)

    out = render_human_block(params, mcfg, ctx,
                             jnp.asarray(ray_o), jnp.asarray(ray_d),
                             jnp.full(P, 0.5), jnp.full(P, 4.0),
                             probe, xyz, area, sharp,
                             st_surf, st_obj, rcfg, False)
    assert out.rgb_map.shape == (P, 3)
    assert out.albedo_map.shape == (P, 3)
    assert out.norm_map.shape == (P, 3)
    assert out.lvis_map.shape == (P, 32)
    assert np.isfinite(np.asarray(out.rgb_map)).all()
    assert np.isfinite(np.asarray(out.lvis_map)).all()
    assert (np.asarray(out.acc_map) >= 0).all()


def test_render_human_block_miss_skip_pixel_parity():
    """Full relight block with surf_miss_skip must reproduce the plain
    pipeline's pixels (the skip is provably exact; any drift here means the
    classification or the scatter is wrong)."""
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.ops.envmap import gen_light_xyz
    from relightableavatar_tpu.renderer.sphere_tracing import (
        RelightRenderConfig, render_human_block)
    from relightableavatar_tpu.smpl import synthetic

    model = synthetic.make_body_model(n_bones=52, target_verts=1200, seed=0)
    motion = synthetic.make_motion(2, n_bones=52, seed=0)
    shapes = motion["shapes"][0]
    tverts, tjoints, big_A, _ = make_bigpose(model, shapes)
    ctx = make_frame_context(model, tverts, tjoints, big_A,
                             motion["poses"][0], motion["Rh"][0],
                             motion["Th"][0], shapes)
    mcfg = AniSDFConfig(n_bones=52, cond_dim=156, sdf_res=6, relight=True,
                        env_h=4, env_w=8)
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)

    P = 64
    center = np.asarray(ctx["Th"]).reshape(3) + [0, 0, 1.0]
    rng = np.random.default_rng(1)
    ray_o = np.tile(center + [2.0, 0, 0], (P, 1)).astype(np.float32)
    # wide target spread: a mix of body hits and clean misses
    tgt = center + rng.normal(0, 0.6, (P, 3))
    ray_d = (tgt - ray_o).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)

    xyz, area = gen_light_xyz(4, 8, 10.0)
    sharp = 1.0 / jnp.sqrt(area / np.pi)
    probe = jnp.ones((4, 8, 3)) * 0.5
    st_surf = STConfig(iter=8)
    st_obj = STConfig(iter=2, offset=0.01, near_offset=0.02, dist_th=0.05)

    outs = {}
    for skip in (False, True):
        rcfg = RelightRenderConfig(shadow_block=256, shadow_grid=48,
                                   surf_miss_skip=skip, surf_skip_iters=24,
                                   surf_skip_block=16)
        outs[skip] = render_human_block(
            params, mcfg, ctx, jnp.asarray(ray_o), jnp.asarray(ray_d),
            jnp.full(P, 0.5), jnp.full(P, 4.0), probe, xyz, area, sharp,
            st_surf, st_obj, rcfg, False)
    acc0 = np.asarray(outs[False].acc_map)
    acc1 = np.asarray(outs[True].acc_map)
    # some rays are clean misses (so the skip path actually engaged)
    assert (acc0 < 0.005).sum() >= 5
    # survivors trace from their original near -> pixel parity everywhere
    np.testing.assert_allclose(acc1, acc0, atol=1e-5)
    rgb0 = np.asarray(outs[False].rgb_map)
    rgb1 = np.asarray(outs[True].rgb_map)
    np.testing.assert_allclose(rgb1, rgb0, atol=1e-4)


@pytest.mark.slow
def test_render_human_block_training_grads():
    """Gradient must flow through the relight training path."""
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.ops.envmap import gen_light_xyz
    from relightableavatar_tpu.renderer.sphere_tracing import (
        RelightRenderConfig, render_human_block)
    from relightableavatar_tpu.renderer.tracing import STConfig
    from relightableavatar_tpu.smpl import synthetic

    model = synthetic.make_body_model(n_bones=52, target_verts=800, seed=0)
    motion = synthetic.make_motion(2, n_bones=52, seed=0)
    shapes = motion["shapes"][0]
    tverts, tjoints, big_A, _ = make_bigpose(model, shapes)
    ctx = make_frame_context(model, tverts, tjoints, big_A,
                             motion["poses"][0], motion["Rh"][0], motion["Th"][0],
                             shapes)
    mcfg = AniSDFConfig(n_bones=52, cond_dim=156, sdf_res=6, relight=True,
                        env_h=2, env_w=4)
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)

    P = 8
    center = np.asarray(ctx["Th"]).reshape(3) + [0, 0, 1.0]  # torso height
    ray_o = np.tile(center + [2.0, 0, 0], (P, 1)).astype(np.float32)
    ray_o[:, 2] += np.linspace(-0.3, 0.3, P)  # spread over the torso
    ray_d = (center - ray_o).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)

    xyz, area = gen_light_xyz(2, 4, 10.0)
    sharp = 1.0 / jnp.sqrt(area / np.pi)
    st_surf = STConfig(iter=2)
    st_obj = STConfig(iter=1, dist_th=0.05)
    rcfg = RelightRenderConfig(shadow_block=64)

    def loss_fn(p):
        out = render_human_block(p, mcfg, ctx,
                                 jnp.asarray(ray_o), jnp.asarray(ray_d),
                                 jnp.full(P, 0.5), jnp.full(P, 4.0),
                                 anisdf.global_env_map(p, mcfg), xyz, area, sharp,
                                 st_surf, st_obj, rcfg, True)
        # untrained geometry produces no surface hits (HDQ has no zero
        # crossing until the SDF is trained), so shading carries no gradient;
        # assert flow through the differentiable acc + raw material outputs.
        return (jnp.mean(out.rgb_map ** 2) + jnp.mean(out.acc_map)
                + jnp.mean(out.albedo) + jnp.mean(out.gradients ** 2))

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    g_albedo = np.abs(np.asarray(g["albedo"]["layers"][0]["w"])).sum()
    assert g_albedo > 0
    g_sdf = np.abs(np.asarray(g["sdf"]["layers"][0]["v"])).sum()
    assert g_sdf > 0


def test_distant_envmap_matches_sampled_on_constant_probe():
    """With a CONSTANT probe, texel-center shading (distant_envmap) must be
    exactly equivalent to per-direction envmap resampling."""
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.ops.envmap import gen_light_xyz
    from relightableavatar_tpu.renderer.sphere_tracing import (
        RelightRenderConfig, render_human_block)
    from relightableavatar_tpu.renderer.tracing import STConfig
    from relightableavatar_tpu.smpl import synthetic

    model = synthetic.make_body_model(n_bones=52, target_verts=1200, seed=0)
    motion = synthetic.make_motion(2, n_bones=52, seed=0)
    shapes = motion["shapes"][0]
    tverts, tjoints, big_A, _ = make_bigpose(model, shapes)
    ctx = make_frame_context(model, tverts, tjoints, big_A,
                             motion["poses"][0], motion["Rh"][0],
                             motion["Th"][0], shapes)
    mcfg = AniSDFConfig(n_bones=52, cond_dim=156, sdf_res=6, relight=True,
                        env_h=4, env_w=8)
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)

    P = 16
    center = np.asarray(ctx["Th"]).reshape(3) + [0, 0, 1.0]
    rng = np.random.default_rng(1)
    ray_o = np.tile(center + [2.0, 0, 0], (P, 1)).astype(np.float32)
    tgt = center + rng.normal(0, 0.25, (P, 3))
    ray_d = (tgt - ray_o).astype(np.float32)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)

    xyz, area = gen_light_xyz(4, 8, 10.0)
    sharp = 1.0 / jnp.sqrt(area / np.pi)
    probe = jnp.full((4, 8, 3), 0.37)

    st_surf = STConfig(iter=4)
    st_obj = STConfig(iter=2, offset=0.01, near_offset=0.02, dist_th=0.05)
    args = (params, mcfg, ctx, jnp.asarray(ray_o), jnp.asarray(ray_d),
            jnp.full(P, 0.5), jnp.full(P, 4.0), probe, xyz, area, sharp,
            st_surf, st_obj)
    a = render_human_block(*args, RelightRenderConfig(shadow_block=256), False)
    b = render_human_block(*args, RelightRenderConfig(
        shadow_block=256, distant_envmap=True), False)
    np.testing.assert_allclose(np.asarray(a.rgb_map), np.asarray(b.rgb_map),
                               atol=1e-5)
    # upscaled probe (2x) averages back down to the light grid
    c = render_human_block(*args[:7], jnp.full((8, 16, 3), 0.37), *args[8:],
                           RelightRenderConfig(shadow_block=256,
                                               distant_envmap=True), False)
    np.testing.assert_allclose(np.asarray(a.rgb_map), np.asarray(c.rgb_map),
                               atol=1e-5)


def test_premarch_conservative_matches_plain_trace():
    """A pre-march on a conservative lower bound of the SDF tightens near
    without crossing the surface: with the full exact budget afterwards the
    result must match the plain trace to refinement tolerance, including
    grazing rays."""
    sdf = sphere_sdf([0, 0, 0], 1.0)
    bound = lambda x: sdf(x) - 0.05          # uniformly conservative bound
    offsets = np.asarray([0.0, 0.5, 0.9, 0.99, 1.01, 1.5], np.float32)
    P = len(offsets)
    ray_o = jnp.asarray(np.stack([offsets, np.zeros(P), np.full(P, 3.0)], -1))
    ray_d = jnp.asarray(np.tile([0, 0, -1.0], (P, 1)).astype(np.float32))
    near = jnp.full((P, 1), 0.1)
    far = jnp.full((P, 1), 6.0)
    st = STConfig(iter=16, offset=0.0, relax=0.0)
    ref = sphere_trace(sdf, ray_o, ray_d, near, far, st)
    pre = sphere_trace(sdf, ray_o, ray_d, near, far, st,
                       premarch_sdf_fn=bound, premarch_iter=12)
    # decided rays (solid hit occ=0 / solid miss occ=1) must agree exactly;
    # rays inside the sub-voxel silhouette-AA band (0 < occ < 1) are
    # sample-position-dependent even in the reference (the 16-sample cone
    # min), and the pre-march legitimately shifts where samples land there
    # — the renderer-level quality gate is the eval PSNR.
    r_occ, p_occ = np.asarray(ref[2]).ravel(), np.asarray(pre[2]).ravel()
    decided = (r_occ < 0.005) | (r_occ > 0.995)
    assert decided.sum() >= 4
    np.testing.assert_allclose(r_occ[decided], p_occ[decided], atol=5e-3)
    # solid hits must land on the same surface point; CLEAN misses
    # legitimately differ (the pre-march punches them through to far
    # instead of recording the closest approach — every consumer is gated
    # by acc > 0).
    hit = r_occ < 0.005
    np.testing.assert_allclose(np.asarray(ref[0])[hit],
                               np.asarray(pre[0])[hit], atol=5e-3)


def test_miss_skip_matches_plain_trace_and_is_safe():
    """sphere_trace_miss_skip: the provably-exact camera miss skip.  Skipped
    rays (march covered [near, far] with the margin intact) must be clean
    misses under the PLAIN trace; survivors must reproduce the plain trace's
    hit points and decided occ; the argsort scatter must restore ray order
    (caught by giving every ray a distinct lateral offset)."""
    from relightableavatar_tpu.renderer.tracing import sphere_trace_miss_skip
    sdf = sphere_sdf([0, 0, 0], 1.0)
    bound = lambda x: sdf(x) - 0.05          # conservative lower bound
    # offsets sweep hit center -> grazing -> near miss -> clean miss,
    # interleaved so active/miss rays alternate before the sort
    offsets = np.asarray([0.0, 2.5, 0.5, 3.0, 0.9, 1.2, 0.99, 2.0,
                          1.01, 4.0, 1.5, 0.3, 0.7, 5.0, 1.05], np.float32)
    P = len(offsets)                          # 15: exercises sub_block padding
    ray_o = jnp.asarray(np.stack([offsets, np.zeros(P), np.full(P, 3.0)], -1))
    ray_d = jnp.asarray(np.tile([0, 0, -1.0], (P, 1)).astype(np.float32))
    near = jnp.full((P, 1), 0.1)
    far = jnp.full((P, 1), 6.0)
    st = STConfig(iter=16, offset=0.0, relax=0.0)
    ref = sphere_trace(sdf, ray_o, ray_d, near, far, st)
    out = sphere_trace_miss_skip(sdf, bound, ray_o, ray_d, near, far, st,
                                 skip_iter=32, margin=0.01, sub_block=4)
    r_occ = np.asarray(ref[2]).ravel()
    o_occ = np.asarray(out[2]).ravel()
    # safety: every ray the skip declared a clean miss (st == ot == far)
    # is a clean miss under the plain trace too
    skipped = np.isclose(np.asarray(out[3]).ravel(), 6.0) & (o_occ == 1.0)
    assert skipped.sum() >= 4                # the clean misses got skipped
    np.testing.assert_allclose(r_occ[skipped], 1.0, atol=1e-6)
    # survivors trace from their original near -> EVERY ray matches the
    # plain trace (skipped rays are clean misses on both sides)
    np.testing.assert_allclose(o_occ, r_occ, atol=1e-6)
    hit = r_occ < 0.005
    assert hit.sum() >= 4
    np.testing.assert_allclose(np.asarray(ref[0])[hit],
                               np.asarray(out[0])[hit], atol=1e-6)


def test_premarch_never_crosses_surface():
    """Even with many pre-march steps the carried t stays outside: the hit
    point of a premarched trace with few exact iterations must still sit ON
    the sphere (not inside it)."""
    sdf = sphere_sdf([0, 0, 0], 1.0)
    bound = lambda x: sdf(x) - 0.02
    P = 8
    ray_o = jnp.asarray(np.tile([0, 0, 3.0], (P, 1)).astype(np.float32))
    ray_d = jnp.asarray(np.tile([0, 0, -1.0], (P, 1)).astype(np.float32))
    near = jnp.full((P, 1), 0.1)
    far = jnp.full((P, 1), 6.0)
    st = STConfig(iter=6, offset=0.0, relax=0.0)   # tiny exact budget
    surf, _, occ, *_ = sphere_trace(sdf, ray_o, ray_d, near, far, st,
                                    premarch_sdf_fn=bound, premarch_iter=24)
    np.testing.assert_allclose(np.asarray(surf[:, 2]), 1.0, atol=2e-3)
    assert float(jnp.max(occ)) < 0.05


@pytest.mark.parametrize("distant", [True, False])
@pytest.mark.parametrize("cancel", [True, False])
@pytest.mark.parametrize("lobe", ["full", "lambert", "glossy"])
def test_reshade_lminor_matches_dense(distant, cancel, lobe):
    """reshade_block's L-minor channel-decomposed contraction (lights in the
    lanes, GGX separated from the albedo channels, distant case as
    (P, L) @ (L, 3) matmuls) must match the reference-layout (P, L, 3)
    composition reshade_dense bit-tight — same normalize eps chain, same
    safe_divide clamps (VERDICT r3 item 2)."""
    from relightableavatar_tpu.ops.envmap import gen_light_xyz
    from relightableavatar_tpu.renderer.orchestrate import (reshade_block,
                                                            reshade_dense)
    from relightableavatar_tpu.renderer.sphere_tracing import (
        RelightRenderConfig)

    rng = np.random.default_rng(11)
    P, L = 53, 8
    xyz, area = gen_light_xyz(2, 4, 10.0)
    probe = jnp.asarray(rng.random((2, 4, 3)), jnp.float32)
    surf = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
    norm = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
    norm = norm / jnp.linalg.norm(norm, axis=-1, keepdims=True)
    albedo = jnp.asarray(rng.random((P, 3)), jnp.float32)
    rough = jnp.asarray(rng.uniform(0.2, 0.9, (P, 1)), jnp.float32)
    lvis = jnp.asarray(rng.random((P, L)), jnp.float32)
    ldot = jnp.asarray(rng.uniform(-1, 1, (P, L)), jnp.float32)
    acc = jnp.asarray(rng.random(P), jnp.float32)
    ray_o = jnp.asarray(rng.normal(size=(P, 3)) * 3, jnp.float32)
    rcfg = RelightRenderConfig(tonemapping=True, distant_envmap=distant,
                               cancel_cosine=cancel,
                               lambert_only=lobe == "lambert",
                               glossy_only=lobe == "glossy")

    args = (surf, norm, albedo, rough, lvis, ldot, acc, ray_o,
            probe, xyz, area, rcfg)
    ref = reshade_dense(*args)
    out = reshade_block(*args)

    assert out.rgb_map.shape == (P, 3) and out.shade_map.shape == (P, 3)
    np.testing.assert_allclose(np.asarray(out.rgb_map),
                               np.asarray(ref.rgb_map), atol=5e-6)
    np.testing.assert_allclose(np.asarray(out.shade_map),
                               np.asarray(ref.shade_map), atol=5e-6)


@pytest.mark.parametrize("distant", [True, False])
@pytest.mark.parametrize("lobe", ["full", "lambert", "glossy"])
def test_reshade_sweep_matches_per_light(distant, lobe):
    """reshade_sweep_block batches K envmaps into one executable by sharing
    the probe-independent (P, L) contraction weights; its per-light slices
    must match K independent reshade_block calls (distant case: the sweep's
    (P, L) @ (L, 3K) stacked matmul vs K separate (L, 3) matmuls)."""
    from relightableavatar_tpu.ops.envmap import gen_light_xyz
    from relightableavatar_tpu.renderer.orchestrate import (
        reshade_block, reshade_sweep_block)
    from relightableavatar_tpu.renderer.sphere_tracing import (
        RelightRenderConfig)

    rng = np.random.default_rng(7)
    P, L, K = 41, 8, 3
    xyz, area = gen_light_xyz(2, 4, 10.0)
    probes = jnp.asarray(rng.random((K, 2, 4, 3)), jnp.float32)
    surf = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
    norm = jnp.asarray(rng.normal(size=(P, 3)), jnp.float32)
    norm = norm / jnp.linalg.norm(norm, axis=-1, keepdims=True)
    albedo = jnp.asarray(rng.random((P, 3)), jnp.float32)
    rough = jnp.asarray(rng.uniform(0.2, 0.9, (P, 1)), jnp.float32)
    lvis = jnp.asarray(rng.random((P, L)), jnp.float32)
    ldot = jnp.asarray(rng.uniform(-1, 1, (P, L)), jnp.float32)
    acc = jnp.asarray(rng.random(P), jnp.float32)
    ray_o = jnp.asarray(rng.normal(size=(P, 3)) * 3, jnp.float32)
    rcfg = RelightRenderConfig(tonemapping=True, distant_envmap=distant,
                               lambert_only=lobe == "lambert",
                               glossy_only=lobe == "glossy")

    sweep = reshade_sweep_block(surf, norm, albedo, rough, lvis, ldot, acc,
                                ray_o, probes, xyz, area, rcfg)
    assert sweep.rgb_map.shape == (K, P, 3)
    for k in range(K):
        one = reshade_block(surf, norm, albedo, rough, lvis, ldot, acc,
                            ray_o, probes[k], xyz, area, rcfg)
        np.testing.assert_allclose(np.asarray(sweep.rgb_map[k]),
                                   np.asarray(one.rgb_map), atol=5e-6)
        np.testing.assert_allclose(np.asarray(sweep.shade_map[k]),
                                   np.asarray(one.shade_map), atol=5e-6)
