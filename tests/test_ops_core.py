"""Unit tests for the pure-jnp compute core: PE, MLPs, LBS, KNN, SDF, BRDF."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relightableavatar_tpu.ops import embedder, mlp, lbs, knn, sdf, aabb, brdf, envmap


# --------------------------------------------------------------- embedder
def test_pe_layout():
    x = jnp.array([[0.1, 0.2, 0.3]])
    out = embedder.positional_encoding(x, multires=2)
    assert out.shape == (1, 3 + 2 * 2 * 3)
    # layout: [x, sin(1*x)(3), cos(1*x)(3), sin(2*x)(3), cos(2*x)(3)]
    np.testing.assert_allclose(out[0, :3], x[0], rtol=1e-6)
    np.testing.assert_allclose(out[0, 3:6], np.sin(x[0]), rtol=1e-5)
    np.testing.assert_allclose(out[0, 6:9], np.cos(x[0]), rtol=1e-5)
    np.testing.assert_allclose(out[0, 9:12], np.sin(2 * np.asarray(x[0])), rtol=1e-5)
    np.testing.assert_allclose(out[0, 12:15], np.cos(2 * np.asarray(x[0])), rtol=1e-5)


def test_pe_dim_matches():
    fn, dim = embedder.get_embedder(10, 3)
    assert fn(jnp.zeros((5, 3))).shape == (5, dim)
    assert dim == 63


# --------------------------------------------------------------- mlp
def test_mlp_shapes_and_skip():
    key = jax.random.PRNGKey(0)
    p = mlp.mlp_init(key, input_ch=63, W=256, D=8, out_ch=3)
    y = mlp.mlp_apply(p, jnp.ones((7, 63)))
    assert y.shape == (7, 3)
    # layer 4 input dim must be input_ch + W
    assert p["layers"][4]["w"].shape[0] == 63 + 256


def test_ssdf_geometric_init_is_spherical():
    """Geometric init should make sdf(x) ~ |x| - bias for points on a sphere."""
    key = jax.random.PRNGKey(0)
    d_in = embedder.embed_dim(3, 6)
    p = mlp.ssdf_init(key, d_in=d_in, d_hidden=256, n_layers=8, d_out=257, bias=0.5)
    pts = np.random.default_rng(0).normal(size=(256, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    for r in (0.3, 0.5, 0.8):
        x = jnp.asarray(pts * r)
        emb = embedder.positional_encoding(x, 6)
        out = mlp.ssdf_apply(p, emb)
        sdf_vals = np.asarray(out[..., 0])
        # IDR init gives approximately radius - bias
        assert abs(sdf_vals.mean() - (r - 0.5)) < 0.12, (r, sdf_vals.mean())
    # zero-crossing ordering: closer in => more negative
    e1 = mlp.ssdf_apply(p, embedder.positional_encoding(jnp.asarray(pts) * 0.2, 6))[..., 0].mean()
    e2 = mlp.ssdf_apply(p, embedder.positional_encoding(jnp.asarray(pts) * 0.9, 6))[..., 0].mean()
    assert e1 < e2


def test_weight_norm_fold_equivalence():
    key = jax.random.PRNGKey(1)
    p = mlp.linear_init(key, 16, 8, weight_norm=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 16))
    y1 = mlp.linear_apply(p, x)
    y2 = mlp.linear_apply(mlp.fold_weight_norm(p), x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_softplus100_matches_torch_semantics():
    x = jnp.array([-0.1, -0.01, 0.0, 0.01, 0.3])
    y = mlp.softplus100(x)
    ref = np.log1p(np.exp(100 * np.asarray(x, np.float64))) / 100
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-6)


# --------------------------------------------------------------- lbs
def test_affine_inverse():
    rng = np.random.default_rng(0)
    aa = rng.normal(size=(5, 3))
    from relightableavatar_tpu.smpl.body_model import batch_rodrigues
    R = batch_rodrigues(aa)
    T = rng.normal(size=(5, 3, 1)).astype(np.float32)
    A = np.concatenate([np.concatenate([R, T], -1),
                        np.tile([[[0, 0, 0, 1.0]]], (5, 1, 1))], axis=1)
    Ainv = lbs.affine_inverse(jnp.asarray(A))
    eye = np.einsum('bij,bjk->bik', np.asarray(Ainv), A)
    np.testing.assert_allclose(eye, np.tile(np.eye(4), (5, 1, 1)), atol=1e-5)


def test_inverse_3x3():
    rng = np.random.default_rng(1)
    M = rng.normal(size=(10, 3, 3)).astype(np.float32) + np.eye(3) * 2
    Minv = lbs.inverse_3x3(jnp.asarray(M))
    eye = np.einsum('bij,bjk->bik', np.asarray(Minv), M)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (10, 1, 1)), atol=1e-4)


def test_lbs_point_roundtrip():
    """pose->tpose->pose must be identity for rigid blended transforms."""
    rng = np.random.default_rng(2)
    from relightableavatar_tpu.smpl.body_model import batch_rodrigues
    J = 4
    P = 64
    R = batch_rodrigues(rng.normal(size=(J, 3)) * 0.5)
    A = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
    A[:, :3, :3] = R
    A[:, :3, 3] = rng.normal(size=(J, 3)) * 0.1
    bw = rng.dirichlet(np.ones(J), size=P).astype(np.float32)
    A_bw = lbs.blend_transform(jnp.asarray(bw), jnp.asarray(A))
    pts = jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32))
    t = lbs.pose_points_to_tpose_points(pts, A_bw)
    back = lbs.tpose_points_to_pose_points(t, A_bw)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_lbs_dir_roundtrip():
    rng = np.random.default_rng(3)
    from relightableavatar_tpu.smpl.body_model import batch_rodrigues
    J, P = 3, 32
    A = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
    A[:, :3, :3] = batch_rodrigues(rng.normal(size=(J, 3)))
    bw = rng.dirichlet(np.ones(J), size=P).astype(np.float32)
    A_bw = lbs.blend_transform(jnp.asarray(bw), jnp.asarray(A))
    R_inv = lbs.inverse_3x3(A_bw[..., :3, :3])
    d = jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32))
    t = lbs.pose_dirs_to_tpose_dirs(d, A_bw)
    back = lbs.tpose_dirs_to_pose_dirs(t, A_bw, R_inv=R_inv)
    # dir transforms use transpose (exact inverse only for pure rotations);
    # blended rotations are near-rigid here so tolerance is loose
    cos = np.sum(np.asarray(back) * np.asarray(d), -1) / (
        np.linalg.norm(np.asarray(back), axis=-1) * np.linalg.norm(np.asarray(d), axis=-1))
    assert cos.min() > 0.98


def test_world_pose_roundtrip():
    rng = np.random.default_rng(4)
    from relightableavatar_tpu.smpl.body_model import batch_rodrigues
    R = jnp.asarray(batch_rodrigues(rng.normal(size=(1, 3)))[0])
    Th = jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    p = lbs.world_points_to_pose_points(w, R, Th)
    back = lbs.pose_points_to_world_points(p, R, Th)
    np.testing.assert_allclose(np.asarray(back), np.asarray(w), atol=1e-5)


# --------------------------------------------------------------- knn
def test_knn_vs_bruteforce():
    rng = np.random.default_rng(5)
    verts = rng.normal(size=(500, 3)).astype(np.float32)
    pts = rng.normal(size=(777, 3)).astype(np.float32)
    d2, idx = knn.knn(jnp.asarray(pts), jnp.asarray(verts), K=3, block=256)
    full = ((pts[:, None] - verts[None]) ** 2).sum(-1)
    ref_idx = np.argsort(full, axis=1)[:, :3]
    ref_d2 = np.take_along_axis(full, ref_idx, axis=1)
    # selection matrix is bf16 (ops/knn.py numerics note): near-ties in a
    # random gaussian cloud can swap at ~1% relative
    np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=2e-2, atol=1e-4)
    # indices may tie-break differently; compare distances of chosen indices
    got_d2 = np.take_along_axis(full, np.asarray(idx), axis=1)
    np.testing.assert_allclose(got_d2, ref_d2, rtol=2e-2, atol=1e-4)


def test_knn_near_surface_accuracy():
    """Near-surface selection (what the HDQ warp consumes) must be
    near-exact despite the bf16 selection matrix: the distance RATIOS
    between true neighbours are large there."""
    rng = np.random.default_rng(7)
    verts = rng.normal(size=(2000, 3)).astype(np.float32)
    pts = (verts[rng.integers(0, 2000, 1000)]
           + rng.normal(0, 0.02, (1000, 3))).astype(np.float32)
    d2, idx = knn.knn_unchunked(jnp.asarray(pts), jnp.asarray(verts), K=3)
    full = ((pts[:, None] - verts[None]) ** 2).sum(-1)
    ref_idx = np.argsort(full, axis=1)[:, :3]
    match = (np.asarray(idx) == ref_idx).mean()
    assert match > 0.95, match
    # chosen-neighbour distances within mm of the true top-3 (bf16 selection
    # near-ties on this synthetic random cloud; real meshes are denser)
    ref_d = np.sqrt(np.take_along_axis(full, ref_idx, 1))
    got_d = np.sqrt(np.take_along_axis(full, np.asarray(idx), 1))
    assert np.abs(got_d - ref_d).max() < 3e-3


def test_knn_grouped_vs_bruteforce():
    """Grouped two-level KNN (bounding-sphere group ranking) matches brute
    force near the surface; far queries stay within the SMPL-fallback
    tolerance (see ops/knn.py)."""
    rng = np.random.default_rng(8)
    verts = rng.normal(size=(1500, 3)).astype(np.float32)
    gvid, gmask = knn.build_vertex_groups(verts)
    gverts, gcent, gradius = knn.group_frame_arrays(verts, gvid, gmask)
    pts = (verts[rng.integers(0, 1500, 1000)]
           + rng.normal(0, 0.05, (1000, 3))).astype(np.float32)
    d2, idx = knn.knn_grouped(jnp.asarray(pts), jnp.asarray(gverts),
                              jnp.asarray(gcent), jnp.asarray(gradius),
                              jnp.asarray(gvid), K=3)
    full = ((pts[:, None] - verts[None]) ** 2).sum(-1)
    ref_idx = np.argsort(full, axis=1)[:, :3]
    match = (np.asarray(idx) == ref_idx).mean()
    assert match > 0.97, match


def test_knn_sorted_ascending():
    rng = np.random.default_rng(6)
    verts = rng.normal(size=(100, 3)).astype(np.float32)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    d2, _ = knn.knn(jnp.asarray(pts), jnp.asarray(verts), K=4, block=64)
    d2 = np.asarray(d2)
    assert (np.diff(d2, axis=1) >= -1e-6).all()


# --------------------------------------------------------------- sdf / volume rendering
def test_sdf_to_sigma_laplace():
    beta = jnp.asarray(0.1)
    s = jnp.array([-0.5, -0.01, 0.0, 0.01, 0.5])
    sig = np.asarray(sdf.sdf_to_sigma(s, beta))
    x = -np.asarray(s)
    ref = np.where(x <= 0, 0.5 / 0.1 * np.exp(x / 0.1),
                   1 / 0.1 * (1 - 0.5 * np.exp(-x / 0.1)))
    np.testing.assert_allclose(sig, ref, rtol=1e-5)


def test_volume_rendering_opaque_surface():
    """A single opaque sample should dominate the composite."""
    S = 16
    rgb = jnp.ones((1, 4, S, 3)) * jnp.arange(S)[None, None, :, None] / S
    alpha = jnp.zeros((1, 4, S)).at[..., 5].set(1.0)
    w, rgb_map, acc = sdf.volume_rendering(rgb, alpha)
    np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_map), 5 / S, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w[..., 5]), 1.0, atol=1e-5)


def test_volume_rendering_background():
    rgb = jnp.zeros((1, 2, 4, 3))
    alpha = jnp.zeros((1, 2, 4))
    _, rgb_map, acc = sdf.volume_rendering(rgb, alpha, bg_brightness=1.0)
    np.testing.assert_allclose(np.asarray(rgb_map), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)


# --------------------------------------------------------------- aabb
def test_aabb_hit():
    bounds = jnp.asarray([[[0, 0, 0], [1, 1, 1.0]]])
    ray_o = jnp.asarray([[[-1, 0.5, 0.5], [-1, 5.0, 5.0]]])
    ray_d = jnp.asarray([[[1, 0, 0.0], [1, 0, 0.0]]])
    near, far, hit = aabb.get_near_far_aabb(bounds, ray_o, ray_d)
    assert bool(hit[0, 0]) and not bool(hit[0, 1])
    np.testing.assert_allclose(float(near[0, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(far[0, 0]), 2.0, atol=1e-5)


# --------------------------------------------------------------- brdf
def test_brdf_lambert_only():
    P, L = 8, 4
    rng = np.random.default_rng(7)
    n = jnp.asarray(np.tile([0, 0, 1.0], (P, 1)).astype(np.float32))
    l = lbs.normalize(jnp.asarray(rng.normal(size=(P, L, 3)).astype(np.float32) + [0, 0, 2.0]))
    v = lbs.normalize(jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32) + [0, 0, 2.0]))
    albedo = jnp.full((P, 3), 0.6)
    rough = jnp.full((P, 1), 0.3)
    out = brdf.microfacet_brdf(l, v, n, albedo, rough, lambert_only=True, cancel_cosine=False)
    np.testing.assert_allclose(np.asarray(out), 0.6 / np.pi, atol=1e-5)


def test_brdf_glossy_peak_at_reflection():
    """Specular lobe should peak when l is the mirror of v."""
    n = jnp.asarray([[0, 0, 1.0]])
    v = lbs.normalize(jnp.asarray([[1.0, 0, 1.0]]))
    l_mirror = lbs.normalize(jnp.asarray([[[-1.0, 0, 1.0]]]))
    l_off = lbs.normalize(jnp.asarray([[[0.5, 0.5, 1.0]]]))
    albedo = jnp.zeros((1, 3))
    rough = jnp.full((1, 1), 0.2)
    b1 = brdf.microfacet_brdf(l_mirror, v, n, albedo, rough, glossy_only=True)
    b2 = brdf.microfacet_brdf(l_off, v, n, albedo, rough, glossy_only=True)
    assert float(b1[0, 0, 0]) > float(b2[0, 0, 0])


def test_safe_divide_semantics():
    a = jnp.array([0.0, 1e-12, -1e-12, 1.0])
    b = jnp.array([0.0, 0.0, 1.0, 2.0])
    out = np.asarray(brdf.safe_divide(a, b))
    np.testing.assert_allclose(out[3], 0.5, atol=1e-6)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[0], 1.0, atol=1e-6)  # eps/eps


# --------------------------------------------------------------- envmap
def test_gen_light_xyz_areas_sum():
    xyz, areas = envmap.gen_light_xyz(16, 32, env_r=10.0)
    assert xyz.shape == (16, 32, 3)
    np.testing.assert_allclose(float(jnp.sum(areas)), 4 * np.pi, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(xyz, axis=-1)), 10.0, rtol=1e-5)


def test_sample_envmap_poles_and_equator():
    H, W = 16, 32
    img = np.zeros((H, W, 3), np.float32)
    img[:H // 2] = 1.0  # top half bright (theta < pi/2 <=> z > 0)
    im = jnp.asarray(img)
    up = envmap.sample_envmap_image(im, jnp.asarray([[0, 0, 1.0]]))
    down = envmap.sample_envmap_image(im, jnp.asarray([[0, 0, -1.0]]))
    assert float(up[0, 0]) > 0.9 and float(down[0, 0]) < 0.1


def test_srgb_matches_reference_formulas():
    """The reference srgb2linear is deliberately NOT the exact inverse
    (relight_utils.py:199-204 simplifies to s**2.4); we must replicate it."""
    x = np.linspace(0, 1, 64, dtype=np.float32)
    y = np.asarray(envmap.linear2srgb(jnp.asarray(x)))
    ref = np.where(x <= 0.0031308, x * 12.92,
                   1.055 * (x + 1e-7) ** (1 / 2.4) - 0.055)
    np.testing.assert_allclose(y, ref, atol=1e-5)
    z = np.asarray(envmap.srgb2linear(jnp.asarray(x)))
    ref2 = np.where(x <= 0.04045, x / 12.92, x ** 2.4)
    np.testing.assert_allclose(z, ref2, atol=1e-5)


def test_shift_image_wraps():
    img = jnp.asarray(np.arange(8 * 16 * 3, dtype=np.float32).reshape(8, 16, 3))
    out = envmap.shift_image(img, 16.0)  # full wrap = identity
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_pallas_knn_exact_vs_bruteforce():
    """Fused Pallas KNN (interpret mode on CPU) must be EXACT — unlike the
    approx_min_k default path it guarantees the true top-3 neighbours
    (sample_utils.py:110-127's torch.cdist+topk semantics)."""
    from relightableavatar_tpu.ops.pallas_knn import knn_pallas
    r = np.random.default_rng(3)
    pts = r.normal(size=(700, 3)).astype(np.float32)     # pads 700 -> 1024
    verts = r.normal(size=(600, 3)).astype(np.float32)   # pads 600 -> 1024
    d2, idx = knn_pallas(jnp.asarray(pts), jnp.asarray(verts), k=3)
    D = ((pts[:, None, :] - verts[None, :, :]) ** 2).sum(-1)
    ref_idx = np.argsort(D, axis=1)[:, :3]
    ref_d2 = np.take_along_axis(D, ref_idx, 1)
    np.testing.assert_allclose(np.asarray(d2), ref_d2, atol=1e-5)
    assert (np.asarray(idx) == ref_idx).all()


def test_knn_unchunked_exact_flag_matches_default_neighbours():
    """exact=True (full top_k on CPU) and the approx path must agree on a
    sparse cloud where approx_min_k recall is 1."""
    r = np.random.default_rng(4)
    pts = r.normal(size=(64, 3)).astype(np.float32) * 10
    verts = r.normal(size=(128, 3)).astype(np.float32) * 10
    d2a, ia = knn.knn_unchunked(jnp.asarray(pts), jnp.asarray(verts), K=3)
    d2b, ib = knn.knn_unchunked(jnp.asarray(pts), jnp.asarray(verts), K=3,
                                exact=True)
    # the two exact formulas differ by f32 rounding (diff-of-squares vs
    # matmul identity); values here are O(10-100)
    np.testing.assert_allclose(np.asarray(d2a), np.asarray(d2b),
                               rtol=1e-5, atol=1e-4)


# --------------------------------------------------------------- hash grid
def test_hashgrid_shapes_and_determinism():
    from relightableavatar_tpu.ops import hashgrid as hg
    cfg = hg.HashGridConfig(n_levels=4, n_features=2, log2_hashmap_size=10,
                            base_resolution=4, growth=2.0)
    key = jax.random.PRNGKey(0)
    table = hg.hash_encoding_init(key, cfg)
    assert table.shape == (4, 1024 * 2)  # flat (L, T*F) layout
    x = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (5, 7, 3)),
                    jnp.float32)
    out = hg.hash_encode(table, cfg, x)
    assert out.shape == (5, 7, cfg.out_dim)
    out2 = hg.hash_encode(table, cfg, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_hashgrid_trilerp_exact_on_dense_level():
    """A 1-level dense grid is plain trilinear interpolation: must match a
    hand-rolled trilerp (the reference drops the z weight — embedder.py:184;
    we deliberately do full trilinear)."""
    from relightableavatar_tpu.ops import hashgrid as hg
    cfg = hg.HashGridConfig(n_levels=1, n_features=1, log2_hashmap_size=12,
                            base_resolution=5, sum_levels=True,
                            sum_over_features=True, include_input=False,
                            bounds_lo=(0, 0, 0), bounds_hi=(1, 1, 1))
    r = 5
    grid = np.random.default_rng(1).normal(size=(r, r, r)).astype(np.float32)
    table = np.zeros((1, cfg.table_size), np.float32)  # flat (L, T*F), F=1
    for i in range(r):
        for j in range(r):
            for k in range(r):
                table[0, (i * r + j) * r + k] = grid[i, j, k]
    pts = np.random.default_rng(2).uniform(0, 1, (50, 3)).astype(np.float32)
    out = np.asarray(hg.hash_encode(jnp.asarray(table), cfg,
                                    jnp.asarray(pts)))[:, 0]
    # scipy-free manual trilerp on the (r-1)-cell grid
    f = pts * (r - 1)
    b = np.clip(np.floor(f).astype(int), 0, r - 1)
    t = f - b
    ref = np.zeros(len(pts), np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                c = np.minimum(b + [dx, dy, dz], r - 1)
                w = (np.where(dx, t[:, 0], 1 - t[:, 0]) *
                     np.where(dy, t[:, 1], 1 - t[:, 1]) *
                     np.where(dz, t[:, 2], 1 - t[:, 2]))
                ref += w * grid[c[:, 0], c[:, 1], c[:, 2]]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_hashgrid_grad_flows_to_table_and_input():
    from relightableavatar_tpu.ops import hashgrid as hg
    cfg = hg.HashGridConfig(n_levels=3, n_features=2, log2_hashmap_size=8,
                            base_resolution=4, growth=1.5)
    table = hg.hash_encoding_init(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, (16, 3)),
                    jnp.float32)
    g_tab = jax.grad(lambda t: hg.hash_encode(t, cfg, x).sum())(table)
    assert float(jnp.abs(g_tab).sum()) > 0
    g_x = jax.grad(lambda p: hg.hash_encode(table, cfg, p).sum())(x)
    assert np.isfinite(np.asarray(g_x)).all()


# --------------------------------------------------------------- point-mesh
def _dense_tri_min_d2(pts, tris, n=60):
    """Approximate closest distance by dense barycentric sampling."""
    u = np.linspace(0, 1, n)
    uu, vv = np.meshgrid(u, u, indexing='ij')
    m = uu + vv <= 1.0
    uu, vv = uu[m], vv[m]
    samples = (tris[:, None, 0] * (1 - uu - vv)[None, :, None]
               + tris[:, None, 1] * uu[None, :, None]
               + tris[:, None, 2] * vv[None, :, None])   # (F, S, 3)
    samples = samples.reshape(-1, 3)
    d2 = ((pts[:, None] - samples[None]) ** 2).sum(-1)
    return d2.min(1)


def test_point_mesh_distance_matches_dense_sampling():
    from relightableavatar_tpu.ops import point_mesh as pm
    r = np.random.default_rng(0)
    verts = r.normal(size=(20, 3)).astype(np.float32)
    faces = r.integers(0, 20, (30, 3)).astype(np.int32)
    pts = r.normal(size=(40, 3)).astype(np.float32) * 1.5
    d2, cp, fid = pm.point_mesh_distance(jnp.asarray(pts), jnp.asarray(verts),
                                         jnp.asarray(faces), block=8)
    ref = _dense_tri_min_d2(pts, verts[faces])
    np.testing.assert_allclose(np.asarray(d2), ref, atol=2e-3)
    # closest point actually achieves the distance
    d2_cp = ((pts - np.asarray(cp)) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d2), d2_cp, atol=1e-5)


def test_signed_mesh_distance_sphere_sign_and_value():
    """Icosphere-ish mesh: inside points negative, outside positive, |d|
    close to analytic r - 1."""
    from relightableavatar_tpu.ops import point_mesh as pm
    # build a UV sphere mesh
    nu, nv = 24, 48
    th = np.linspace(1e-3, np.pi - 1e-3, nu)
    ph = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing='ij')
    verts = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                      np.cos(tt)], -1).reshape(-1, 3).astype(np.float32)
    idx = np.arange(nu * nv).reshape(nu, nv)
    quads = np.stack([idx[:-1], np.roll(idx, -1, 1)[:-1],
                      np.roll(idx, -1, 1)[1:], idx[1:]], -1).reshape(-1, 4)
    faces = np.concatenate([quads[:, [0, 2, 1]], quads[:, [0, 3, 2]]], 0)
    faces = faces.astype(np.int32)  # outward winding
    r = np.random.default_rng(1)
    dirs = r.normal(size=(50, 3)); dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    radii = np.concatenate([np.full(25, 0.5), np.full(25, 1.5)]).astype(np.float32)
    pts = (dirs * radii[:, None]).astype(np.float32)
    sd = np.asarray(pm.signed_mesh_distance(jnp.asarray(pts),
                                            jnp.asarray(verts),
                                            jnp.asarray(faces), block=256))
    assert (sd[:25] < 0).all(), "inside must be negative"
    assert (sd[25:] > 0).all(), "outside must be positive"
    np.testing.assert_allclose(np.abs(sd), np.abs(radii - 1.0), atol=0.02)


# --------------------------------------------------------------- sdf grid / lvis upsample
def test_sdf_grid_trilerp_exact_on_linear_field():
    """Trilinear interpolation reproduces a linear SDF exactly."""
    from relightableavatar_tpu.ops.sdf_grid import build_sdf_grid, grid_sdf
    lo = jnp.asarray([-1.0, -2.0, 0.0]); hi = jnp.asarray([1.0, 0.0, 3.0])
    plane = lambda p: (p @ jnp.asarray([0.3, -0.5, 0.2]) + 0.1)[:, None]
    grid = build_sdf_grid(plane, lo, hi, res=9, chunk=128)
    assert grid.shape == (9, 9, 9)
    pts = jnp.asarray(np.random.default_rng(0).uniform(
        [-1, -2, 0], [1, 0, 3], (200, 3)).astype(np.float32))
    out = grid_sdf(grid, lo, hi, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plane(pts)),
                               atol=2e-3)


def test_lvis_upsample_matrix_partition_of_unity_and_identity():
    from relightableavatar_tpu.ops.envmap import lvis_upsample_matrix
    U = lvis_upsample_matrix(8, 16, 16, 32)
    assert U.shape == (8 * 16, 16 * 32)
    np.testing.assert_allclose(U.sum(0), 1.0, atol=1e-5)  # each full texel: weights sum 1
    # k=1 mapping is the identity
    I = lvis_upsample_matrix(16, 32, 16, 32)
    np.testing.assert_allclose(I, np.eye(16 * 32), atol=1e-6)
    # constant visibility upsamples to the same constant
    lv = np.full((5, 8 * 16), 0.7, np.float32)
    np.testing.assert_allclose(lv @ U, 0.7, atol=1e-5)
