"""Tests for the host-side body model and synthetic data generator."""
import numpy as np
import pytest

from relightableavatar_tpu.smpl.body_model import (
    BodyModel, batch_rodrigues, get_rigid_transform, vertex_normals, get_bounds)
from relightableavatar_tpu.smpl import synthetic


@pytest.fixture(scope="module")
def model():
    return synthetic.make_body_model(n_bones=52, target_verts=2000, seed=0)


def test_rodrigues_orthogonal():
    aa = np.random.default_rng(0).normal(size=(10, 3))
    R = batch_rodrigues(aa)
    err = np.abs(np.einsum('bij,bkj->bik', R, R) - np.eye(3)).max()
    assert err < 1e-5


def test_rigid_transform_zero_pose_identity(model):
    J = model.joints()
    A, pj = get_rigid_transform(np.zeros((model.n_bones, 3)), J, model.parents)
    np.testing.assert_allclose(A, np.tile(np.eye(4), (model.n_bones, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(pj, J, atol=1e-5)


def test_forward_zero_pose_is_rest(model):
    v = model.forward(np.zeros(model.n_bones * 3))
    np.testing.assert_allclose(v, model.v_template, atol=1e-4)


def test_forward_posed_moves_limbs(model):
    poses = np.zeros((model.n_bones, 3))
    poses[16, 2] = 1.0  # rotate left shoulder
    v = model.forward(poses)
    moved = np.abs(v - model.v_template).max()
    assert moved > 0.05


def test_forward_rigid_global(model):
    Rh = np.array([0, 0, np.pi / 2])
    Th = np.array([1.0, 2.0, 3.0])
    v0 = model.forward(np.zeros(model.n_bones * 3))
    v1 = model.forward(np.zeros(model.n_bones * 3), Rh=Rh, Th=Th)
    R = batch_rodrigues(Rh[None])[0]
    np.testing.assert_allclose(v1, v0 @ R.T + Th, atol=1e-4)


def test_weights_normalized(model):
    np.testing.assert_allclose(model.weights.sum(1), 1.0, atol=1e-4)
    assert (model.weights >= 0).all()


def test_vertex_normals_unit(model):
    n = vertex_normals(model.v_template, model.faces)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)


def test_get_bounds(model):
    b = get_bounds(model.v_template)
    assert b.shape == (2, 3)
    assert (b[1] > b[0]).all()


def test_write_synthetic_dataset(tmp_path):
    root = str(tmp_path / "synt")
    synthetic.write_synthetic_dataset(root, n_frames=3, n_views=2, n_bones=52)
    import os
    assert os.path.exists(os.path.join(root, 'body_model.npz'))
    m = np.load(os.path.join(root, 'motion.npz'))
    assert m['poses'].shape == (3, 52 * 3)
    annots = np.load(os.path.join(root, 'annots.npy'), allow_pickle=True).item()
    assert len(annots['cams']['K']) == 2
    bm = BodyModel(os.path.join(root, 'body_model.npz'))
    v = bm.forward(m['poses'][0], shapes=m['shapes'][0], Rh=m['Rh'][0], Th=m['Th'][0])
    assert np.isfinite(v).all()
