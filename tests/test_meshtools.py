"""Tests for offline mesh utilities (winding number, Loop subdivision,
QEM decimation) — reference mesh_utils.py / mesh_renderer.py:95-96."""
import numpy as np
import pytest

from relightableavatar_tpu.ops import meshtools


def _uv_sphere(nu=16, nv=32, r=1.0):
    th = np.linspace(1e-3, np.pi - 1e-3, nu)
    ph = np.linspace(0, 2 * np.pi, nv, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing='ij')
    verts = r * np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                          np.cos(tt)], -1).reshape(-1, 3).astype(np.float32)
    idx = np.arange(nu * nv).reshape(nu, nv)
    quads = np.stack([idx[:-1], np.roll(idx, -1, 1)[:-1],
                      np.roll(idx, -1, 1)[1:], idx[1:]], -1).reshape(-1, 4)
    faces = np.concatenate([quads[:, [0, 2, 1]], quads[:, [0, 3, 2]]], 0)
    return verts, faces.astype(np.int64)


def test_winding_number_inside_outside():
    verts, faces = _uv_sphere()
    r = np.random.default_rng(0)
    d = r.normal(size=(40, 3)); d /= np.linalg.norm(d, axis=-1, keepdims=True)
    inside = d * 0.5
    outside = d * 1.5
    w_in = meshtools.winding_number(inside, verts, faces)
    w_out = meshtools.winding_number(outside, verts, faces)
    assert (np.abs(w_in - 1.0) < 0.1).all(), w_in
    assert (np.abs(w_out) < 0.1).all(), w_out
    assert meshtools.inside_mesh(inside, verts, faces).all()
    assert not meshtools.inside_mesh(outside, verts, faces).any()


def test_loop_subdivide_quadruples_faces_and_stays_on_sphere():
    verts, faces = _uv_sphere(nu=10, nv=20)
    v2, f2 = meshtools.loop_subdivide(verts, faces)
    assert len(f2) == 4 * len(faces)
    assert f2.max() < len(v2)
    # subdivided unit sphere stays near radius 1 (slightly inside: Loop shrinks)
    rad = np.linalg.norm(v2, axis=-1)
    assert 0.9 < rad.min() and rad.max() < 1.01, (rad.min(), rad.max())


def test_decimate_hits_target_and_preserves_shape():
    verts, faces = _uv_sphere(nu=24, nv=48)
    target = 400
    v2, f2 = meshtools.decimate(verts, faces, target)
    assert len(f2) <= target * 1.05, len(f2)
    assert len(f2) >= target * 0.5, len(f2)   # didn't collapse to nothing
    # decimated verts still on the unit sphere (QEM keeps the surface)
    rad = np.linalg.norm(v2, axis=-1)
    assert 0.9 < rad.min() and rad.max() < 1.1, (rad.min(), rad.max())
    # no degenerate faces
    assert (f2[:, 0] != f2[:, 1]).all() and (f2[:, 1] != f2[:, 2]).all()


def test_decimate_noop_when_target_above_face_count():
    verts, faces = _uv_sphere(nu=8, nv=16)
    v2, f2 = meshtools.decimate(verts, faces, len(faces) + 100)
    assert len(f2) == len(faces)
