"""FrameContext: per-frame pose/skinning state shipped to the device.

The reference carries these in the dataloader batch
(``lib/datasets/base_dataset.py:308-397`` get_blend): A, big_A, skinning
weights, posed/tpose verts + normals, R/Th, bounds, pose vector.  Here they
form a single static-shape pytree (dict of jnp arrays) that every jitted
render/train function takes as input — one HBM-resident context per frame.

Two front-ends build the context:

* :func:`make_frame_context` — SMPL-H body-model forward supplies the posed
  vertex cloud (the default, reference ``get_lbs_params`` else-branch,
  ``base_dataset.py:331-333``).
* :func:`make_frame_context_mesh` — a ``can_mesh.npz`` geometry prior (the
  stage-2 ``use_geometry`` path, reference ``base_dataset.py:196-204,233-236``
  + ``get_lbs_params:324-329``): the extracted canonical mesh replaces the
  SMPL vertex cloud, posed verts come from LBS through its transferred
  skinning weights.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from relightableavatar_tpu.smpl.body_model import (
    BodyModel, batch_rodrigues, get_rigid_transform, vertex_normals, get_bounds)


def _assemble_context(wverts: np.ndarray, pverts: np.ndarray, tverts: np.ndarray,
                      W: np.ndarray, faces: np.ndarray, R: np.ndarray,
                      Th: np.ndarray, poses: np.ndarray, A: np.ndarray,
                      big_A: np.ndarray) -> dict:
    """Shared context assembly from posed/canonical vertex clouds."""
    pverts = pverts.astype(np.float32)
    tverts = tverts.astype(np.float32)
    pnorm = vertex_normals(pverts, faces)
    tnorm = vertex_normals(tverts, faces)

    # grouped-KNN support arrays (cfg.tpu.knn_impl='grouped'): a balanced
    # k-d partition of the POSED verts (partitioning in query space keeps
    # groups compact; ~1 ms host-side per frame).
    from relightableavatar_tpu.ops.knn import build_vertex_groups, group_frame_arrays
    gvid, gmask = build_vertex_groups(pverts)
    gverts, gcent, gradius = group_frame_arrays(pverts, gvid, gmask)

    # spatially-uniform 1/4 vertex subsample for shadow-ray HDQ queries
    # (cfg.tpu.shadow_verts_sub): global ids, every 4th member per k-d leaf
    from relightableavatar_tpu.ops.knn import subsample_verts
    sub_ids = subsample_verts(gvid, gmask, 4)

    return {
        "knn_gvid": jnp.asarray(gvid),
        "knn_gverts": jnp.asarray(gverts),
        "knn_gcent": jnp.asarray(gcent),
        "knn_gradius": jnp.asarray(gradius),
        "knn_sub_ids": jnp.asarray(sub_ids),
        # fused per-vertex table [pverts | pnorm | tverts | weights]:
        # the HDQ gathers neighbour attributes in ONE (P, K, 9+J) gather —
        # irregular gathers are latency-bound on TPU, so 4 gathers -> 1
        # is a direct win (models/anisdf.py:_hdq_knn_stage)
        "knn_table": jnp.asarray(np.concatenate(
            [pverts, pnorm.astype(np.float32), tverts, W.astype(np.float32)],
            axis=-1)),
        "R": jnp.asarray(R),
        "Th": jnp.asarray(Th),
        "poses": jnp.asarray(poses),
        "A": jnp.asarray(A),
        "big_A": jnp.asarray(big_A),
        "weights": jnp.asarray(W.astype(np.float32)),
        "pverts": jnp.asarray(pverts),
        "pnorm": jnp.asarray(pnorm),
        "tverts": jnp.asarray(tverts),
        "tnorm": jnp.asarray(tnorm),
        "faces": jnp.asarray(faces.astype(np.int32)),
        "wbounds": jnp.asarray(get_bounds(wverts.astype(np.float32))),
        "tbounds": jnp.asarray(get_bounds(tverts)),
        "pbounds": jnp.asarray(get_bounds(pverts)),
    }


def make_frame_context(model: BodyModel, tverts: np.ndarray, tjoints: np.ndarray,
                       big_A: np.ndarray, poses: np.ndarray, Rh: np.ndarray,
                       Th: np.ndarray, shapes: np.ndarray | None = None) -> dict:
    """Build the device context for one motion frame.

    tverts/tjoints: canonical (bigpose) vertices/joints; big_A: bigpose bone
    transforms; poses (J, 3) axis-angle; Rh/Th global rigid.
    """
    poses = np.asarray(poses, np.float32).reshape(-1, 3)
    A, _ = get_rigid_transform(poses, tjoints, model.parents)
    R = batch_rodrigues(np.asarray(Rh, np.float32).reshape(1, 3))[0]
    Th = np.asarray(Th, np.float32).reshape(1, 3)

    # posed verts from the body model forward (reference base_dataset.py:330-333)
    wverts = model.forward(poses, shapes=shapes, Rh=Rh, Th=Th)
    pverts = (wverts - Th) @ R  # world -> pose (remove global rigid)

    return _assemble_context(wverts, pverts, tverts, model.weights, model.faces,
                             R, Th, poses, A, big_A)


def make_frame_context_mesh(prior: dict, poses: np.ndarray, Rh: np.ndarray,
                            Th: np.ndarray) -> dict:
    """Device context from a ``can_mesh.npz`` geometry prior.

    The prior's verts (bigpose canonical space), transferred skinning
    weights, faces, tjoints and parents replace the SMPL body model
    (reference ``base_dataset.py:196-204``).  Posed verts are produced by
    LBS: bigpose -> tpose through the blended inverse big_A, tpose -> pose
    through the blended A, pose -> world by the global rigid
    (``base_dataset.py:324-329``).
    """
    tverts = np.asarray(prior['verts'], np.float32)
    W = np.asarray(prior['weights'], np.float32)
    faces = np.asarray(prior['faces'], np.int64)
    tjoints = np.asarray(prior['tjoints'], np.float32)
    parents = np.asarray(prior['parents'], np.int64)

    poses = np.asarray(poses, np.float32).reshape(-1, 3)
    big_A, _ = bigpose_A(tjoints, parents)
    A, _ = get_rigid_transform(poses, tjoints, parents)
    R = batch_rodrigues(np.asarray(Rh, np.float32).reshape(1, 3))[0]
    Th = np.asarray(Th, np.float32).reshape(1, 3)

    pverts = lbs_bigpose_to_pose(tverts, W, big_A, A)
    wverts = pverts @ R.T + Th
    return _assemble_context(wverts, pverts, tverts, W, faces, R, Th,
                             poses, A, big_A)


def lbs_bigpose_to_pose(tverts: np.ndarray, W: np.ndarray, big_A: np.ndarray,
                        A: np.ndarray) -> np.ndarray:
    """Host-side LBS re-posing of a canonical (bigpose) vertex cloud.

    Mirrors the reference chain ``pose_points_to_tpose_points`` +
    ``tpose_points_to_pose_points`` with weight-blended bone transforms
    (``lib/utils/blend_utils.py:234-333``).
    """
    Abw_big = np.einsum('vj,jab->vab', W, big_A)
    txyz = np.einsum('vab,vb->va',
                     np.linalg.inv(Abw_big[:, :3, :3]),
                     tverts - Abw_big[:, :3, 3])
    Abw = np.einsum('vj,jab->vab', W, A)
    pverts = np.einsum('vab,vb->va', Abw[:, :3, :3], txyz) + Abw[:, :3, 3]
    return pverts.astype(np.float32)


def bigpose_vector(n_bones: int) -> np.ndarray:
    """Canonical big-pose axis-angles: 30 deg leg spread
    (reference base_dataset.py:222-228)."""
    big_poses = np.zeros(n_bones * 3, np.float32)
    angle = 30
    big_poses[5] = np.deg2rad(angle)
    big_poses[8] = np.deg2rad(-angle)
    return big_poses.reshape(-1, 3)


def bigpose_A(tjoints: np.ndarray, parents: np.ndarray):
    """Bigpose bone transforms from canonical joints (base_dataset.py:222-236)."""
    big_poses = bigpose_vector(len(tjoints))
    return get_rigid_transform(big_poses, tjoints, parents)


def make_bigpose(model: BodyModel, shapes: np.ndarray | None = None):
    """Canonical big-pose prep (reference base_dataset.py:222-241): 30 deg leg
    spread; returns (tverts, tjoints, big_A)."""
    tjoints = model.joints(shapes)
    big_A, big_joints = bigpose_A(tjoints, model.parents)

    # bigpose verts via the body model forward at big_poses
    tverts = model.forward(bigpose_vector(model.n_bones), shapes=shapes)
    return tverts.astype(np.float32), tjoints.astype(np.float32), big_A, big_joints
