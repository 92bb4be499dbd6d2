"""Procedural humanoid body model + synthetic capture data.

The reference repo ships no data, checkpoints, or SMPL-H model files, so the
framework's tests and benchmarks run on a procedurally generated "tube-man":
a skeleton with SMPL-H topology (52 bones by default), tube vertices around
each bone segment (~6890 verts like SMPL-H), capsule-falloff skinning weights
and watertight-enough faces for vertex normals.  The generated model is a
valid ``BodyModel`` npz, and ``write_synthetic_dataset`` writes a full capture
layout (annots.npy cameras + motion.npz + body_model.npz) in the exact formats
the data layer consumes — the same formats the reference CLI consumes
(``scripts/tools/prepare_motion.py:219-223``).
"""
from __future__ import annotations

import os
from os.path import join

import numpy as np

from relightableavatar_tpu.smpl.body_model import BodyModel, get_rigid_transform

# SMPL-H-like skeleton: 22 body joints + 30 hand joints = 52.
# offsets are in meters, z-up, person standing along +z.
_BODY = [
    # name, parent, offset
    ("pelvis", -1, (0.0, 0.0, 1.0)),
    ("l_hip", 0, (0.08, 0.0, -0.05)),
    ("r_hip", 0, (-0.08, 0.0, -0.05)),
    ("spine1", 0, (0.0, 0.0, 0.12)),
    ("l_knee", 1, (0.0, 0.0, -0.40)),
    ("r_knee", 2, (0.0, 0.0, -0.40)),
    ("spine2", 3, (0.0, 0.0, 0.12)),
    ("l_ankle", 4, (0.0, 0.0, -0.42)),
    ("r_ankle", 5, (0.0, 0.0, -0.42)),
    ("spine3", 6, (0.0, 0.0, 0.12)),
    ("l_foot", 7, (0.0, 0.10, -0.05)),
    ("r_foot", 8, (0.0, 0.10, -0.05)),
    ("neck", 9, (0.0, 0.0, 0.10)),
    ("l_collar", 9, (0.06, 0.0, 0.06)),
    ("r_collar", 9, (-0.06, 0.0, 0.06)),
    ("head", 12, (0.0, 0.0, 0.12)),
    ("l_shoulder", 13, (0.12, 0.0, 0.0)),
    ("r_shoulder", 14, (-0.12, 0.0, 0.0)),
    ("l_elbow", 16, (0.26, 0.0, 0.0)),
    ("r_elbow", 17, (-0.26, 0.0, 0.0)),
    ("l_wrist", 18, (0.25, 0.0, 0.0)),
    ("r_wrist", 19, (-0.25, 0.0, 0.0)),
]


def _hand_joints(side: int, wrist_idx: int, start: int):
    """3 joints x 5 fingers, chained off the wrist."""
    joints = []
    sign = 1.0 if side == 0 else -1.0
    for f in range(5):
        y = (f - 2) * 0.018
        parent = wrist_idx
        for k in range(3):
            joints.append((f"hand{side}_{f}_{k}", parent,
                           (sign * 0.035, y if k == 0 else 0.0, 0.0)))
            parent = start + len(joints) - 1
    return joints


def make_skeleton(n_bones: int = 52):
    spec = list(_BODY)
    if n_bones > 22:
        spec += _hand_joints(0, 20, len(spec))
        spec += _hand_joints(1, 21, len(spec))
    spec = spec[:n_bones]
    parents = np.array([p for _, p, _ in spec], dtype=np.int64)
    offsets = np.array([o for _, _, o in spec], dtype=np.float32)
    joints = np.zeros_like(offsets)
    for i, p in enumerate(parents):
        joints[i] = offsets[i] + (joints[p] if p >= 0 else 0.0)
    return joints, parents


def _tube(p0: np.ndarray, p1: np.ndarray, radius: float, n_rings: int, n_seg: int,
          rng: np.random.Generator):
    """Vertices and faces of an open tube from p0 to p1."""
    axis = p1 - p0
    L = np.linalg.norm(axis)
    if L < 1e-6:
        axis = np.array([0, 0, 1.0], np.float32)
        L = 0.02
    z = axis / L
    x = np.cross(z, [0.0, 0.0, 1.0])
    if np.linalg.norm(x) < 1e-4:
        x = np.cross(z, [0.0, 1.0, 0.0])
    x /= np.linalg.norm(x)
    y = np.cross(z, x)

    ts = np.linspace(0, 1, n_rings)
    angles = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    verts = []
    for t in ts:
        c = p0 + t * (p1 - p0)
        r = radius * (0.8 + 0.4 * np.sin(np.pi * t))  # slight bulge
        ring = c[None] + r * (np.cos(angles)[:, None] * x[None]
                              + np.sin(angles)[:, None] * y[None])
        verts.append(ring)
    verts = np.concatenate(verts, axis=0)

    faces = []
    for i in range(n_rings - 1):
        for j in range(n_seg):
            a = i * n_seg + j
            b = i * n_seg + (j + 1) % n_seg
            c = (i + 1) * n_seg + j
            d = (i + 1) * n_seg + (j + 1) % n_seg
            faces.append([a, b, c])
            faces.append([b, d, c])
    return verts.astype(np.float32), np.array(faces, np.int64)


def _segment_dist(pts: np.ndarray, p0: np.ndarray, p1: np.ndarray) -> np.ndarray:
    d = p1 - p0
    L2 = max(float(d @ d), 1e-12)
    t = np.clip(((pts - p0) @ d) / L2, 0.0, 1.0)
    proj = p0[None] + t[:, None] * d[None]
    return np.linalg.norm(pts - proj, axis=-1)


def make_body_model(n_bones: int = 52, target_verts: int = 6890, seed: int = 0) -> BodyModel:
    """Build the synthetic humanoid as a BodyModel."""
    rng = np.random.default_rng(seed)
    joints, parents = make_skeleton(n_bones)

    radii = np.full(n_bones, 0.05, np.float32)
    radii[0] = 0.12   # pelvis
    radii[3] = 0.12
    radii[6] = 0.12
    radii[9] = 0.11   # torso
    radii[15] = 0.09  # head
    if n_bones > 22:
        radii[22:] = 0.012

    # budget rings per bone so total verts ~= target
    n_seg = 10
    seg_lengths = np.array(
        [np.linalg.norm(joints[i] - joints[parents[i]]) if parents[i] >= 0 else 0.15
         for i in range(n_bones)])
    rings = np.maximum(2, np.round(
        seg_lengths / seg_lengths.sum() * (target_verts / n_seg))).astype(int)
    # adjust to match target, never dropping below 2 rings per bone
    while (rings.sum() * n_seg) > target_verts and rings.max() > 2:
        rings[np.argmax(rings)] -= 1
    while (rings.sum() * n_seg) < target_verts - n_seg:
        rings[np.argmax(seg_lengths)] += 1

    all_v, all_f = [], []
    off = 0
    for i in range(n_bones):
        p = parents[i]
        p0 = joints[p] if p >= 0 else joints[i] - np.array([0, 0, 0.15], np.float32)
        v, f = _tube(p0, joints[i], radii[i], rings[i], n_seg, rng)
        all_v.append(v)
        all_f.append(f + off)
        off += len(v)
    verts = np.concatenate(all_v, axis=0)
    faces = np.concatenate(all_f, axis=0)

    # skinning weights: capsule falloff, top-4, normalized
    W = np.zeros((len(verts), n_bones), np.float32)
    for i in range(n_bones):
        p = parents[i]
        p0 = joints[p] if p >= 0 else joints[i]
        d = _segment_dist(verts, p0, joints[i])
        W[:, i] = np.exp(-(d / (radii[i] + 0.03)) ** 2)
    top4 = np.argsort(-W, axis=1)[:, :4]
    mask = np.zeros_like(W)
    np.put_along_axis(mask, top4, 1.0, axis=1)
    W = W * mask
    W /= W.sum(axis=1, keepdims=True) + 1e-12

    # joint regressor: rest joints as convex combo of nearest verts
    J_reg = np.zeros((n_bones, len(verts)), np.float32)
    for i in range(n_bones):
        d = np.linalg.norm(verts - joints[i][None], axis=-1)
        idx = np.argsort(d)[:8]
        w = np.exp(-d[idx] / 0.02)
        J_reg[i, idx] = w / w.sum()
    # correct the regressor so J_reg @ verts == joints exactly at rest:
    # add the residual onto the heaviest-weight vertex column is fragile;
    # instead store the rest joints and regress offsets from the mean vertex
    rest_est = J_reg @ verts
    correction = joints - rest_est  # folded into v_template adjustment below

    data = dict(
        v_template=verts,
        J_regressor=J_reg,
        weights=W,
        parents=parents,
        faces=faces,
        shapedirs=rng.normal(0, 0.004, (len(verts), 3, 10)).astype(np.float32),
    )
    model = BodyModel(data)
    # stash exact rest joints: BodyModel.joints() uses the regressor, so patch
    # the regressor error by storing a bias attribute used nowhere else —
    # instead simply accept the (<2mm) regressor error; it is consistent
    # between tpose/bigpose/posed computations so LBS round-trips stay exact.
    del correction
    return model


def save_body_model(model: BodyModel, path: str) -> None:
    np.savez(path,
             v_template=model.v_template,
             J_regressor=model.J_regressor,
             weights=model.weights,
             parents=model.parents,
             faces=model.faces,
             **({'shapedirs': model.shapedirs} if model.shapedirs is not None else {}))


def make_motion(n_frames: int, n_bones: int = 52, seed: int = 0):
    """Synthetic walking-ish motion in the reference motion.npz schema
    (prepare_motion.py:219-223): poses (N, J*3), Rh (N, 3), Th (N, 3),
    shapes (N, 10)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_frames, dtype=np.float32)
    poses = np.zeros((n_frames, n_bones, 3), np.float32)
    # swing hips/shoulders/elbows/knees sinusoidally
    swing = 0.4 * np.sin(2 * np.pi * t / 30)
    poses[:, 1, 0] = swing           # l_hip
    poses[:, 2, 0] = -swing          # r_hip
    poses[:, 4, 0] = 0.3 * np.abs(np.sin(2 * np.pi * t / 30))
    poses[:, 5, 0] = 0.3 * np.abs(np.cos(2 * np.pi * t / 30))
    if n_bones > 19:
        poses[:, 16, 2] = 0.6 + 0.2 * np.sin(2 * np.pi * t / 45)   # arms down-ish
        poses[:, 17, 2] = -0.6 - 0.2 * np.sin(2 * np.pi * t / 45)
        poses[:, 18, 1] = 0.3 * np.sin(2 * np.pi * t / 30)
        poses[:, 19, 1] = -0.3 * np.sin(2 * np.pi * t / 30)
    poses += rng.normal(0, 0.01, poses.shape).astype(np.float32)

    Rh = np.zeros((n_frames, 3), np.float32)
    Rh[:, 2] = 0.1 * np.sin(2 * np.pi * t / 90)
    Th = np.zeros((n_frames, 3), np.float32)
    Th[:, 0] = 0.02 * np.sin(2 * np.pi * t / 60)
    shapes = np.tile(rng.normal(0, 0.3, (1, 10)).astype(np.float32), (n_frames, 1))
    return dict(poses=poses.reshape(n_frames, -1), Rh=Rh, Th=Th, shapes=shapes)


def make_cameras(n_views: int, H: int = 512, W: int = 512, radius: float = 3.0,
                 center=(0.0, 0.0, 0.9)):
    """Ring of cameras looking at the body center; returns the annots.npy cams
    dict layout: K, R, T, D lists (world-to-cam, T in the reference's
    annots convention where T is stored x1000? — we store plain meters)."""
    Ks, Rs, Ts, Ds = [], [], [], []
    center = np.array(center, np.float32)
    for i in range(n_views):
        a = 2 * np.pi * i / n_views
        pos = center + radius * np.array([np.cos(a), np.sin(a), 0.05], np.float32)
        z = center - pos
        z = z / np.linalg.norm(z)
        up = np.array([0, 0, 1.0], np.float32)
        x = np.cross(z, up)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rw2c = np.stack([x, y, z])  # rows are camera axes
        T = (-Rw2c @ pos)[:, None] * 1000.0  # annots convention stores mm
        f = 0.9 * max(H, W)
        K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
        Ks.append(K)
        Rs.append(Rw2c.astype(np.float32))
        Ts.append(T.astype(np.float32))
        Ds.append(np.zeros((5, 1), np.float32))
    return dict(K=Ks, R=Rs, T=Ts, D=Ds)


def write_synthetic_dataset(root: str, n_frames: int = 30, n_views: int = 4,
                            n_bones: int = 52, H: int = 512, W: int = 512,
                            seed: int = 0) -> None:
    """Write body_model.npz + motion.npz + annots.npy under ``root``."""
    os.makedirs(root, exist_ok=True)
    model = make_body_model(n_bones=n_bones, seed=seed)
    save_body_model(model, join(root, 'body_model.npz'))
    motion = make_motion(n_frames, n_bones=n_bones, seed=seed)
    np.savez(join(root, 'motion.npz'), **motion)
    cams = make_cameras(n_views, H=H, W=W)
    annots = dict(cams=cams, ims=[
        dict(ims=[f'images/{v:02d}/{f:06d}.jpg' for v in range(n_views)])
        for f in range(n_frames)])
    np.save(join(root, 'annots.npy'), annots, allow_pickle=True)
