"""Sweep-based visibility volume vs brute-force ray sampling of the grid."""
import jax.numpy as jnp
import numpy as np
import pytest

from relightableavatar_tpu.ops.lvis_sweep import (query_ratio_volume,
                                                  sweep_ratio_volume)

NEAR = 0.02


def make_sphere_grid(res, lo, hi, r=0.5):
    ax = [np.linspace(lo[i], hi[i], res) for i in range(3)]
    X, Y, Z = np.meshgrid(*ax, indexing="ij")
    return (np.sqrt(X**2 + Y**2 + Z**2) - r).astype(np.float32)


def trilerp_np(grid, lo, hi, p):
    res = np.asarray(grid.shape)
    f = (p - lo) / (hi - lo) * (res - 1)
    f = np.clip(f, 0, res - 1 - 1e-4)
    b = np.floor(f).astype(int)
    t = f - b
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = ((t[0] if dx else 1 - t[0]) * (t[1] if dy else 1 - t[1])
                     * (t[2] if dz else 1 - t[2]))
                out += w * grid[b[0] + dx, b[1] + dy, b[2] + dz]
    return out


def ray_min_ratio(grid, lo, hi, p, d, h):
    """Reference: min over samples at t = k*h of clip(sdf,0)/max(t,NEAR)."""
    best = 1e6
    t = h
    while True:
        q = p + t * d
        if np.any(q < lo) or np.any(q > hi):
            break
        s = trilerp_np(grid, lo, hi, q)
        best = min(best, max(s, 0.0) / max(t, NEAR))
        t += h
    return best


def test_sweep_matches_ray_sampling():
    lo = np.array([-1.0, -1.0, -1.0], np.float32)
    hi = np.array([1.0, 1.0, 1.0], np.float32)
    res = 33
    grid = make_sphere_grid(res, lo, hi)
    voxel = (hi - lo) / (res - 1)

    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(8, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    vol = np.asarray(sweep_ratio_volume(jnp.asarray(grid), lo, hi, dirs, NEAR))
    assert vol.shape == (res, res, res, 8)

    # query at lattice nodes outside the sphere
    pts = []
    for _ in range(200):
        idx = rng.integers(2, res - 2, size=3)
        p = lo + idx * voxel
        if np.linalg.norm(p) > 0.62:
            pts.append((idx, p))
        if len(pts) == 40:
            break

    sharp = 6.0   # moderate cone sharpness
    errs = []
    for l, d in enumerate(dirs):
        a = np.argmax(np.abs(d))
        h = voxel[a] / abs(d[a])
        for idx, p in pts:
            r_ref = ray_min_ratio(grid, lo, hi, p, d, h)
            r_sw = vol[idx[0], idx[1], idx[2], l]
            occ_ref = np.clip(r_ref * sharp / 2, 0, 1)
            occ_sw = np.clip(r_sw * sharp / 2, 0, 1)
            errs.append(abs(occ_ref - occ_sw))
    errs = np.asarray(errs)
    # bulk agreement is exact (integer-lattice paths sample the same grid);
    # a thin tail at penumbra boundaries reflects the bounded half-voxel
    # path deviation of the Bresenham traversal — the frame-level PSNR gate
    # (bench quality runs) bounds its visual effect
    assert errs.mean() < 0.06, errs.mean()
    assert np.quantile(errs, 0.8) < 0.02, np.quantile(errs, 0.8)
    assert (errs > 0.1).mean() < 0.15, (errs > 0.1).mean()


def test_sweep_tight_on_cardinal_directions():
    lo = np.array([-1.0, -1.0, -1.0], np.float32)
    hi = np.array([1.0, 1.0, 1.0], np.float32)
    res = 33
    grid = make_sphere_grid(res, lo, hi)
    voxel = (hi - lo) / (res - 1)
    dirs = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                     [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
    vol = np.asarray(sweep_ratio_volume(jnp.asarray(grid), lo, hi, dirs, NEAR))
    rng = np.random.default_rng(3)
    errs = []
    for l, d in enumerate(dirs):
        a = np.argmax(np.abs(d))
        h = voxel[a] / abs(d[a])
        for _ in range(20):
            idx = rng.integers(2, res - 2, size=3)
            p = lo + idx * voxel
            if np.linalg.norm(p) < 0.6:
                continue
            r_ref = ray_min_ratio(grid, lo, hi, p, d, h)
            r_sw = vol[idx[0], idx[1], idx[2], l]
            errs.append(abs(min(r_ref, 10.0) - min(r_sw, 10.0)))
    errs = np.asarray(errs)
    # axis-aligned rays sample exact lattice points; the only remaining
    # slack is the 3-probe envelope approximation in deep penumbras
    assert errs.mean() < 0.01, errs.mean()
    assert errs.max() < 0.12, errs.max()


def test_query_matches_volume_at_nodes():
    lo = np.array([-1.0, -1.0, -1.0], np.float32)
    hi = np.array([1.0, 1.0, 1.0], np.float32)
    res = 17
    grid = make_sphere_grid(res, lo, hi)
    dirs = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0]], np.float32)
    vol = sweep_ratio_volume(jnp.asarray(grid), lo, hi, dirs, NEAR)

    voxel = (hi - lo) / (res - 1)
    idx = np.array([[4, 8, 12], [10, 3, 7]])
    pts = jnp.asarray(lo + idx * voxel, jnp.float32)
    out = np.asarray(query_ratio_volume(vol, jnp.asarray(lo), jnp.asarray(hi), pts))
    ref = np.asarray(vol)[idx[:, 0], idx[:, 1], idx[:, 2]]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
