"""Marching tetrahedra tests: analytic surfaces, native vs numpy parity."""
import numpy as np
import pytest

from relightableavatar_tpu.ops.marching import (_marching_tets_numpy,
                                                largest_component,
                                                marching_tets)


def _sphere_grid(n=40, r=1.0, extent=1.3):
    x = np.linspace(-extent, extent, n).astype(np.float32)
    X, Y, Z = np.meshgrid(x, x, x, indexing='ij')
    sdf = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - r
    sp = float(x[1] - x[0])
    return sdf, (-extent, -extent, -extent), (sp, sp, sp)


def _euler(V, F):
    E = len(np.unique(np.sort(np.concatenate(
        [F[:, [0, 1]], F[:, [1, 2]], F[:, [0, 2]]]), axis=1), axis=0))
    return len(V) - E + len(F)


def test_sphere_surface_accuracy():
    sdf, o, s = _sphere_grid()
    V, F = marching_tets(sdf, 0.0, o, s)
    r = np.linalg.norm(V, axis=-1)
    assert abs(r.mean() - 1.0) < 1e-3
    assert r.std() < 1e-3
    assert _euler(V, F) == 2  # watertight sphere


def test_native_matches_numpy():
    sdf, o, s = _sphere_grid(n=32)
    Vn, Fn = _marching_tets_numpy(sdf, 0.0, o, s)
    V, F = marching_tets(sdf, 0.0, o, s)
    # same vertex set (dedup order may differ): compare sorted coordinates
    assert len(V) == len(Vn)
    assert len(F) == len(Fn)
    a = np.sort(V.round(4), axis=0)
    b = np.sort(Vn.round(4), axis=0)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_level_offset():
    sdf, o, s = _sphere_grid()
    V, F = marching_tets(sdf, 0.2, o, s)  # sdf=0.2 -> radius 1.2
    r = np.linalg.norm(V, axis=-1)
    assert abs(r.mean() - 1.2) < 2e-3


def test_largest_component_two_spheres():
    n = 48
    x = np.linspace(-2.5, 2.5, n).astype(np.float32)
    X, Y, Z = np.meshgrid(x, x, x, indexing='ij')
    s1 = np.sqrt((X + 1.3) ** 2 + Y ** 2 + Z ** 2) - 1.0   # big
    s2 = np.sqrt((X - 1.7) ** 2 + Y ** 2 + Z ** 2) - 0.4   # small
    sdf = np.minimum(s1, s2)
    sp = float(x[1] - x[0])
    V, F = marching_tets(sdf, 0.0, (-2.5,) * 3, (sp,) * 3)
    V2, F2 = largest_component(V, F)
    assert len(V2) < len(V)
    # remaining component is the big sphere (centered at -1.3)
    c = V2.mean(0)
    assert abs(c[0] + 1.3) < 0.05


def _face_outward_frac(V, F, center=(0.0, 0.0, 0.0)):
    n = np.cross(V[F[:, 1]] - V[F[:, 0]], V[F[:, 2]] - V[F[:, 0]])
    radial = V[F].mean(1) - np.asarray(center)[None]
    return float((np.sum(n * radial, -1) > 0).mean())


def test_faces_oriented_outward():
    """Windings must be consistent: the can_mesh prior derives HDQ sign from
    vertex normals (regression: sort-by-insideness emitted random parity)."""
    sdf, o, s = _sphere_grid()
    V, F = marching_tets(sdf, 0.0, o, s)
    assert _face_outward_frac(V, F) == 1.0
    # numpy fallback path goes through the same orientation pass
    import relightableavatar_tpu.ops.marching as M
    Vn, Fn = M._marching_tets_numpy(sdf, 0.0, o, s)
    Fn = M.orient_faces(Vn, Fn, sdf, o, s)
    assert _face_outward_frac(Vn, Fn) == 1.0


def test_orientation_survives_decimation():
    from relightableavatar_tpu.ops.meshtools import decimate
    sdf, o, s = _sphere_grid(n=48)
    V, F = marching_tets(sdf, 0.0, o, s)
    V2, F2 = decimate(V, F, 800)
    assert len(F2) <= 800
    assert _face_outward_frac(V2, F2) > 0.999


def test_vertex_normals_outward_after_extract():
    from relightableavatar_tpu.smpl.body_model import vertex_normals
    sdf, o, s = _sphere_grid()
    V, F = marching_tets(sdf, 0.0, o, s)
    n = vertex_normals(V, F)
    dot = np.sum(n * (V / np.linalg.norm(V, axis=-1, keepdims=True)), -1)
    assert float(dot.min()) > 0.5
