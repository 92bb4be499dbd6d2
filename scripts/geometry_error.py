"""Direct geometry-error diagnostic for the two-stage gate (VERDICT r2 item 1
"diagnose where the dB is lost"): extract the canonical mesh from a trained
stage-1 checkpoint and score Chamfer/P2S (m) against the distilled fixture
avatar's canonical mesh — the sphere-traceability of the learned SDF is what
bounds the stage-2 relight eval, and this isolates it from materials/shading.

CPU-friendly (marching tets + brute NN).  Usage:
    python scripts/geometry_error.py --exp tubeman_e2eB [--ckpt path.npz]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def can_mesh_from_params(params_path: str, tag: str, res: int = 128):
    """Marching-tets canonical mesh of the checkpoint's SDF (the same
    band-filtered extraction run.py vis_can_mesh uses, renderer/mesh.py)."""
    import jax
    from relightableavatar_tpu.config import default_cfg
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import make_bigpose
    from relightableavatar_tpu.ops.marching import marching_tets
    from relightableavatar_tpu.smpl.body_model import BodyModel
    from relightableavatar_tpu.train.checkpoints import _unflatten_into

    cfg = default_cfg()
    model = BodyModel('data/synthetic/tubeman/body_model.npz')
    cfg.n_bones = model.n_bones
    cfg.cond_dim = model.n_bones * 3
    mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=8)
    template = anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg)
    with np.load(params_path) as f:
        flat = {k: f[k] for k in f.files}
    if any(k.startswith('net:') for k in flat):
        # training checkpoint (net:/opt:-prefixed state) vs flat param npz
        flat = {k[4:]: v for k, v in flat.items() if k.startswith('net:')}
    params = _unflatten_into(template, flat)

    motion = dict(np.load('data/synthetic/tubeman/motion.npz'))
    tverts, tjoints, big_A, _ = make_bigpose(model, motion['shapes'][0])
    lo = np.asarray(tverts).min(0) - 0.1
    hi = np.asarray(tverts).max(0) + 0.1
    xs = [np.linspace(lo[i], hi[i], res, dtype=np.float32) for i in range(3)]
    grid = np.stack(np.meshgrid(*xs, indexing='ij'), -1).reshape(-1, 3)

    import jax.numpy as jnp
    fn = jax.jit(lambda p, x: anisdf.canonical_sdf(p, mcfg, x))
    sdf = np.concatenate([
        np.asarray(fn(params, jnp.asarray(grid[i:i + 65536])))
        for i in range(0, len(grid), 65536)]).reshape(res, res, res)
    spacing = (hi - lo) / (res - 1)
    verts, faces = marching_tets(sdf, 0.0, origin=tuple(lo),
                                 spacing=tuple(spacing))
    verts = np.asarray(verts, np.float32)

    # band-filter to render-relevant surface: HDQ's geodesic KNN filter means
    # canonical SDF further than ~dist_th from the body is never queried at
    # render time — unconstrained junk out there must not count as geometry
    # error (same reason renderer/mesh.py band-filters before marching)
    tv = np.asarray(tverts, np.float32)
    keep = np.empty(len(verts), bool)
    for i in range(0, len(verts), 4096):
        d2 = ((verts[i:i + 4096, None] - tv[None]) ** 2).sum(-1)
        keep[i:i + 4096] = np.sqrt(d2.min(1)) < 0.2
    print(f'[geo] {tag}: {len(verts)} verts ({int(keep.sum())} within the '
          f'0.2 m render band) from {params_path}', flush=True)
    return verts[keep] if keep.any() else verts


def chamfer(a, b, n=10000, block=2048, seed=0):
    rng = np.random.default_rng(seed)
    a_s = a[rng.integers(len(a), size=min(n, len(a)))]
    b_s = b[rng.integers(len(b), size=min(n, len(b)))]

    def nn(x, y):
        out = np.empty(len(x), np.float32)
        for i in range(0, len(x), block):
            d2 = ((x[i:i + block, None] - y[None]) ** 2).sum(-1)
            out[i:i + block] = np.sqrt(d2.min(1))
        return out

    d_ab, d_ba = nn(a_s, b_s), nn(b_s, a_s)
    return dict(chamfer_m=round(float((d_ab.mean() + d_ba.mean()) / 2), 5),
                pred_to_gt_m=round(float(d_ab.mean()), 5),
                gt_to_pred_m=round(float(d_ba.mean()), 5),
                pred_to_gt_max_m=round(float(d_ab.max()), 5))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--exp', default='tubeman_e2eB')
    ap.add_argument('--ckpt', default='',
                    help='explicit stage-1 checkpoint npz (default: '
                         'data/trained_model/deform/<exp>/latest.npz, falling '
                         'back to results/<exp>/live/stage1_latest.npz)')
    ap.add_argument('--out', default='')
    ap.add_argument('--res', type=int, default=128,
                    help='marching grid resolution (64 for a CPU-light pass)')
    a = ap.parse_args()

    ckpt = a.ckpt
    if not ckpt:
        ckpt = f'data/trained_model/deform/{a.exp}/latest.npz'
        if not os.path.exists(ckpt):
            ckpt = f'results/{a.exp}/live/stage1_latest.npz'
    ref = 'fixtures/synthetic_avatar_params.npz'

    pred = can_mesh_from_params(ckpt, 'trained', res=a.res)
    gt = can_mesh_from_params(ref, 'distilled-fixture', res=a.res)
    m = chamfer(pred, gt)
    m['ckpt'] = ckpt
    epoch = None
    try:
        with np.load(ckpt) as f:
            epoch = int(f['epoch']) if 'epoch' in f.files else None
    except Exception:
        pass
    m['epoch'] = epoch
    print(json.dumps(m, indent=2))
    if a.out:
        with open(a.out, 'w') as f:
            json.dump(m, f, indent=2)


if __name__ == '__main__':
    main()
