"""use_geometry / geometry_mesh canonical-mesh prior (VERDICT r1 item 2).

The stage-2 geometry prior replaces the SMPL vertex cloud with the extracted
``can_mesh.npz`` (verts/weights/faces/tjoints/parents become the KNN/LBS/HDQ
reference) — reference ``lib/datasets/base_dataset.py:196-204,233-236`` and
``get_lbs_params`` (``:324-329``).
"""
import os

import numpy as np
import pytest

from relightableavatar_tpu.models.context import (
    make_bigpose, make_frame_context, make_frame_context_mesh)
from relightableavatar_tpu.smpl import synthetic


@pytest.fixture(scope="module")
def setup():
    model = synthetic.make_body_model(n_bones=22, target_verts=400, seed=3)
    motion = synthetic.make_motion(3, n_bones=22, seed=3)
    shapes = motion["shapes"][0]
    tverts, tjoints, big_A, _ = make_bigpose(model, shapes)
    return model, motion, shapes, tverts, tjoints, big_A


def _prior_from_model(model, tverts, tjoints):
    """A 'can_mesh' whose geometry is exactly the body model's bigpose cloud."""
    return dict(verts=tverts, weights=model.weights,
                faces=model.faces.astype(np.int64),
                tjoints=tjoints, parents=model.parents)


def test_mesh_prior_warp_roundtrip(setup):
    """LBS re-posing of the bigpose mesh must reproduce the body-model
    forward exactly when the prior IS the body-model cloud (pure LBS: the
    synthetic model has no pose blendshapes)."""
    model, motion, shapes, tverts, tjoints, big_A = setup
    prior = _prior_from_model(model, tverts, tjoints)
    for f in range(2):
        poses, Rh, Th = motion["poses"][f], motion["Rh"][f], motion["Th"][f]
        ctx_ref = make_frame_context(model, tverts, tjoints, big_A,
                                     poses, Rh, Th, shapes)
        ctx_mesh = make_frame_context_mesh(prior, poses, Rh, Th)
        np.testing.assert_allclose(np.asarray(ctx_mesh["pverts"]),
                                   np.asarray(ctx_ref["pverts"]),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(ctx_mesh["wbounds"]),
                                   np.asarray(ctx_ref["wbounds"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(ctx_mesh["A"]),
                                   np.asarray(ctx_ref["A"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ctx_mesh["big_A"]),
                                   np.asarray(ctx_ref["big_A"]), atol=1e-5)


def test_mesh_prior_decimated_mesh_shapes(setup):
    """A prior with a different vertex count than the body model must drive
    every context array (KNN tables, weights, normals) at the mesh's size."""
    model, motion, shapes, tverts, tjoints, big_A = setup
    keep = np.arange(0, len(tverts), 2)
    remap = -np.ones(len(tverts), np.int64)
    remap[keep] = np.arange(len(keep))
    fmask = np.all(np.isin(model.faces, keep), axis=1)
    faces = remap[model.faces[fmask]]
    prior = dict(verts=tverts[keep], weights=model.weights[keep],
                 faces=faces, tjoints=tjoints, parents=model.parents)
    ctx = make_frame_context_mesh(prior, motion["poses"][0],
                                  motion["Rh"][0], motion["Th"][0])
    V = len(keep)
    assert ctx["pverts"].shape == (V, 3)
    assert ctx["weights"].shape == (V, model.n_bones)
    assert ctx["knn_table"].shape == (V, 9 + model.n_bones)
    assert np.isfinite(np.asarray(ctx["pnorm"])).all()


def test_dataset_use_geometry_toggle(tmp_path):
    """BaseDataset with use_geometry consumes can_mesh.npz: the frame context
    is built from the mesh (vertex count, weights) instead of the SMPL model."""
    from relightableavatar_tpu.config import default_cfg, make_parser, update_cfg
    from relightableavatar_tpu.data.datasets import BaseDataset

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "tubeman")
    synthetic.write_synthetic_dataset(root, n_frames=2, n_views=2, n_bones=22,
                                      H=32, W=32)

    model = synthetic.make_body_model(n_bones=22, seed=0)
    motion = synthetic.make_motion(2, n_bones=22, seed=0)
    tverts, tjoints, _, _ = make_bigpose(model, motion["shapes"][0])
    keep = np.arange(0, len(tverts), 3)
    remap = -np.ones(len(tverts), np.int64)
    remap[keep] = np.arange(len(keep))
    fmask = np.all(np.isin(model.faces, keep), axis=1)
    mesh_path = str(tmp_path / "can_mesh.npz")
    np.savez(mesh_path, verts=tverts[keep], weights=model.weights[keep],
             faces=remap[model.faces[fmask]], tjoints=tjoints,
             parents=model.parents)

    cfg = default_cfg()
    args = make_parser().parse_args(
        ['-c', os.path.join(repo, 'configs/synthetic/tubeman.yaml'),
         '-t', 'visualize',
         'train_dataset.data_root', root, 'test_dataset.data_root', root,
         'num_train_frame', '2', 'num_eval_frame', '2',
         'use_geometry', 'True', 'geometry_mesh', mesh_path])
    os.chdir(repo)
    update_cfg(cfg, args)
    assert cfg.use_geometry and cfg.geometry_mesh == mesh_path

    ds = BaseDataset(cfg, root, 'tubeman', 'annots.npy', 'test')
    assert ds.body_model is None
    assert len(ds.weights) == len(keep)
    ctx = ds.frame_ctx(0)
    assert ctx["pverts"].shape == (len(keep), 3)

    item = ds[0]
    assert item.ctx["weights"].shape[0] == len(keep)


def test_dataset_warns_on_inward_windings(tmp_path, monkeypatch):
    """The loader's signed-volume sanity check must flag a prior whose faces
    are wound inward (HDQ derives its inside/outside sign from the mesh's
    vertex normals — scrambled or flipped windings break stage-2)."""
    from relightableavatar_tpu.config import default_cfg, make_parser, update_cfg
    from relightableavatar_tpu.data.datasets import BaseDataset

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "tubeman")
    synthetic.write_synthetic_dataset(root, n_frames=2, n_views=2, n_bones=22,
                                      H=32, W=32)
    model = synthetic.make_body_model(n_bones=22, seed=0)
    motion = synthetic.make_motion(2, n_bones=22, seed=0)
    tverts, tjoints, _, _ = make_bigpose(model, motion["shapes"][0])

    def make_cfg_for(mesh_path):
        cfg = default_cfg()
        args = make_parser().parse_args(
            ['-c', os.path.join(repo, 'configs/synthetic/tubeman.yaml'),
             '-t', 'visualize',
             'train_dataset.data_root', root, 'test_dataset.data_root', root,
             'num_train_frame', '2', 'num_eval_frame', '2',
             'use_geometry', 'True', 'geometry_mesh', mesh_path])
        os.chdir(repo)
        update_cfg(cfg, args)
        return cfg

    good = str(tmp_path / "good.npz")
    np.savez(good, verts=tverts, weights=model.weights,
             faces=model.faces.astype(np.int64), tjoints=tjoints,
             parents=model.parents)
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, verts=tverts, weights=model.weights,
             faces=model.faces[:, ::-1].astype(np.int64), tjoints=tjoints,
             parents=model.parents)

    msgs = []
    import relightableavatar_tpu.data.datasets as D
    monkeypatch.setattr(D, 'log', lambda *a, **k: msgs.append(' '.join(map(str, a))))

    BaseDataset(make_cfg_for(good), root, 'tubeman', 'annots.npy', 'test')
    assert not any('signed volume' in m for m in msgs)
    BaseDataset(make_cfg_for(bad), root, 'tubeman', 'annots.npy', 'test')
    assert any('non-positive signed volume' in m for m in msgs)
