"""FrameContext: per-frame pose/skinning state shipped to the device.

The reference carries these in the dataloader batch
(``lib/datasets/base_dataset.py:308-397`` get_blend): A, big_A, skinning
weights, posed/tpose verts + normals, R/Th, bounds, pose vector.  Here they
form a single static-shape pytree (dict of jnp arrays) that every jitted
render/train function takes as input — one HBM-resident context per frame.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from relightableavatar_tpu.smpl.body_model import (
    BodyModel, batch_rodrigues, get_rigid_transform, vertex_normals, get_bounds)


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
    W = model.weights
    wverts = model.forward(poses, shapes=shapes, Rh=Rh, Th=Th)
    pverts = (wverts - Th) @ R  # world -> pose (remove global rigid)

    pnorm = vertex_normals(pverts.astype(np.float32), model.faces)
    tnorm = vertex_normals(tverts.astype(np.float32), model.faces)

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
            [pverts.astype(np.float32), pnorm.astype(np.float32),
             tverts.astype(np.float32), W.astype(np.float32)],
            axis=-1)),
        "R": jnp.asarray(R),
        "Th": jnp.asarray(Th),
        "poses": jnp.asarray(poses),
        "A": jnp.asarray(A),
        "big_A": jnp.asarray(big_A),
        "weights": jnp.asarray(W),
        "pverts": jnp.asarray(pverts.astype(np.float32)),
        "pnorm": jnp.asarray(pnorm),
        "tverts": jnp.asarray(tverts.astype(np.float32)),
        "tnorm": jnp.asarray(tnorm),
        "faces": jnp.asarray(model.faces.astype(np.int32)),
        "wbounds": jnp.asarray(get_bounds(wverts.astype(np.float32))),
        "tbounds": jnp.asarray(get_bounds(tverts.astype(np.float32))),
        "pbounds": jnp.asarray(get_bounds(pverts.astype(np.float32))),
    }


def make_bigpose(model: BodyModel, shapes: np.ndarray | None = None):
    """Canonical big-pose prep (reference base_dataset.py:222-241): 30 deg leg
    spread; returns (tverts, tjoints, big_A)."""
    n_bones = model.n_bones
    big_poses = np.zeros(n_bones * 3, np.float32)
    angle = 30
    big_poses[5] = np.deg2rad(angle)
    big_poses[8] = np.deg2rad(-angle)
    big_poses = big_poses.reshape(-1, 3)

    tjoints = model.joints(shapes)
    big_A, big_joints = get_rigid_transform(big_poses, tjoints, model.parents)

    # bigpose verts via the body model forward at big_poses
    tverts = model.forward(big_poses, shapes=shapes)
    return tverts.astype(np.float32), tjoints.astype(np.float32), big_A, big_joints
