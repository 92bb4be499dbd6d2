"""Checkpoint I/O tests: native npz round trip + torch .pth import fidelity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightableavatar_tpu.models import anisdf
from relightableavatar_tpu.models.anisdf import AniSDFConfig
from relightableavatar_tpu.ops.mlp import linear_apply
from relightableavatar_tpu.train import checkpoints


MCFG = AniSDFConfig(n_bones=52, cond_dim=156, sdf_res=6, relight=True,
                    env_h=4, env_w=8)


def test_npz_roundtrip(tmp_path):
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), MCFG)
    path = str(tmp_path / "p.npz")
    checkpoints.save_params(params, path)
    params2 = checkpoints.load_params(params, path)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_load_model_epochs(tmp_path):
    params = anisdf.init_anisdf(jax.random.PRNGKey(0), MCFG)
    d = str(tmp_path / "model")
    checkpoints.save_model(d, dict(net=params), epoch=3)
    checkpoints.save_model(d, dict(net=params), epoch=7)
    state, epoch, aux = checkpoints.load_model(d, dict(net=params))
    assert epoch == 7
    assert state is not None
    assert aux == {}  # no aux written

    checkpoints.save_model(d, dict(net=params), epoch=8,
                           aux=dict(it=3, rng_key=[1, 2]))
    _, epoch, aux = checkpoints.load_model(d, dict(net=params))
    assert epoch == 8 and aux == dict(it=3, rng_key=[1, 2])


def _fake_reference_state_dict(mcfg):
    """Build a reference-shaped torch state dict with random weights."""
    import torch
    from relightableavatar_tpu.ops.embedder import embed_dim
    g = torch.Generator().manual_seed(0)
    sd = {}

    def lin(prefix, i, o, weight_norm=False):
        w = torch.randn(o, i, generator=g) * 0.1
        b = torch.randn(o, generator=g) * 0.01
        if weight_norm:
            # torch weight_norm parametrization: w = g * v / |v| (norm over dim 1)
            v = w
            gg = torch.linalg.norm(v, dim=1, keepdim=True) * (1 + 0.3 * torch.rand(o, 1, generator=g))
            sd[prefix + ".weight_v"] = v
            sd[prefix + ".weight_g"] = gg
        else:
            sd[prefix + ".weight"] = w
        sd[prefix + ".bias"] = b

    # resd MLP: input embed(3,10)+cond, 8 hidden of 256, skip at 4
    d_in = embed_dim(3, mcfg.xyz_res) + mcfg.cond_dim
    dims = []
    for i in range(9):
        I, O = 256, 256
        if i == 0:
            I = d_in
        if i == 4:
            I = d_in + 256
        if i == 8:
            O = 3
        lin(f"residual_deformation_network.mlp.linears.{i}", I, O)

    # sdf SSDF: 9 weight-normed lins, skip at 4 (lin3 outputs 256 - d_in)
    s_in = embed_dim(3, mcfg.sdf_res)
    dims = [s_in] + [256] * 8 + [1 + mcfg.feat_dim]
    for l in range(9):
        out_dim = dims[l + 1] - dims[0] if (l + 1) == 4 else dims[l + 1]
        lin(f"signed_distance_network.mlp.lin{l}", dims[l], out_dim, weight_norm=True)

    # rgb render net: 5 weight-normed lins
    in0 = 3 + mcfg.feat_dim + embed_dim(3, mcfg.view_res)
    lin("render_network.l0", in0, 256, weight_norm=True)
    lin("render_network.l1", 256, 256, weight_norm=True)
    lin("render_network.l2", 256, 256, weight_norm=True)
    lin("render_network.l3", 256 + mcfg.cond_dim, 256, weight_norm=True)
    lin("render_network.l4", 256, 3, weight_norm=True)

    # relight heads: D=2 MLPs (3 linears), no skip within depth... reference MLP
    # with D=2, skips=(4,) -> no skip triggered
    for head, out in (("albedo", 3), ("roughness", 1)):
        for i in range(3):
            I = mcfg.feat_dim if i == 0 else mcfg.relight_width
            O = out if i == 2 else mcfg.relight_width
            lin(f"{head}_network.mlp.linears.{i}", I, O)

    import torch as _t
    sd["signed_distance_network._beta"] = _t.tensor(0.037)
    sd["global_env_map_"] = _t.rand(mcfg.env_h * mcfg.envmap_upscale,
                                    mcfg.env_w * mcfg.envmap_upscale, 3,
                                    generator=g)
    return sd


def test_torch_import_weight_norm_fidelity(tmp_path):
    import torch
    sd = _fake_reference_state_dict(MCFG)
    path = str(tmp_path / "latest.pth")
    torch.save(dict(net=sd), path)

    template = anisdf.init_anisdf(jax.random.PRNGKey(1), MCFG)
    # relight heads in our init use skips=() at apply time; init template with
    # matching shapes (mlp_init with skips=(4,) and D=2 gives same shapes)
    params = checkpoints.load_torch_pth(template, path)

    # effective weight of a weight-normed torch linear == ours
    v = sd["render_network.l1.weight_v"].numpy()      # (O, I)
    gg = sd["render_network.l1.weight_g"].numpy()     # (O, 1)
    w_torch = v * (gg / np.linalg.norm(v, axis=1, keepdims=True))
    x = np.random.default_rng(0).normal(size=(5, v.shape[1])).astype(np.float32)
    y_torch = x @ w_torch.T + sd["render_network.l1.bias"].numpy()
    y_ours = np.asarray(linear_apply(params["rgb"]["l1"], jnp.asarray(x)))
    np.testing.assert_allclose(y_ours, y_torch, atol=1e-4)

    # beta + env map mapped
    np.testing.assert_allclose(float(params["beta"]), 0.037, atol=1e-6)
    assert params["env"].shape == sd["global_env_map_"].shape

    # plain linear transpose mapping
    w = sd["residual_deformation_network.mlp.linears.0.weight"].numpy()
    np.testing.assert_allclose(np.asarray(params["resd"]["layers"][0]["w"]),
                               w.T, atol=1e-6)

    # the imported model must run end-to-end
    ctx_src = _tiny_ctx()
    ret = anisdf.forward(params, MCFG, ctx_src, jnp.zeros((8, 3)), None)
    assert np.isfinite(np.asarray(ret.raw)).all()


def _tiny_ctx():
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.smpl import synthetic
    model = synthetic.make_body_model(n_bones=52, target_verts=800, seed=0)
    motion = synthetic.make_motion(1, n_bones=52)
    tverts, tjoints, big_A, _ = make_bigpose(model, motion["shapes"][0])
    return make_frame_context(model, tverts, tjoints, big_A,
                              motion["poses"][0], motion["Rh"][0],
                              motion["Th"][0], motion["shapes"][0])
