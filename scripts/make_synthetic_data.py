"""Generate the synthetic tube-man capture: cameras/motion/body + GT images.

Writes ``data/synthetic/tubeman/`` with annots.npy, motion.npz,
body_model.npz, and images/masks rendered with the distilled fixture avatar
(sphere-traced relight renderer) — giving the training/eval pipelines real
pixels to fit and compare against.

Usage: python scripts/make_synthetic_data.py [--frames 30] [--views 4]
       [--size 512] [--root data/synthetic/tubeman]
"""
from __future__ import annotations

import argparse
import os
import sys
from os.path import dirname, exists, join

sys.path.insert(0, dirname(dirname(os.path.abspath(__file__))))

import cv2
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=30)
    ap.add_argument('--views', type=int, default=4)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--root', default='data/synthetic/tubeman')
    ap.add_argument('--fixture-params', default='fixtures/synthetic_avatar_params.npz')
    ap.add_argument('--skip-images', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from relightableavatar_tpu.config import default_cfg
    from relightableavatar_tpu.data.rays import get_rays, get_full_near_far
    from relightableavatar_tpu.models import anisdf
    from relightableavatar_tpu.models.anisdf import AniSDFConfig
    from relightableavatar_tpu.models.context import make_bigpose, make_frame_context
    from relightableavatar_tpu.renderer.orchestrate import SphereTracingRenderer
    from relightableavatar_tpu.smpl import synthetic
    from relightableavatar_tpu.smpl.body_model import BodyModel
    from relightableavatar_tpu.train.checkpoints import load_params
    from relightableavatar_tpu.utils.dotdict import dotdict

    H = W = args.size
    os.makedirs(args.root, exist_ok=True)

    # reuse the fixture body so the distilled params match the geometry
    if exists('fixtures/synthetic_body.npz'):
        model = BodyModel('fixtures/synthetic_body.npz')
        import shutil
        shutil.copy('fixtures/synthetic_body.npz', join(args.root, 'body_model.npz'))
        motion = dict(np.load('fixtures/synthetic_motion.npz'))
        if len(motion['poses']) < args.frames:
            motion = synthetic.make_motion(args.frames, n_bones=model.n_bones)
        np.savez(join(args.root, 'motion.npz'),
                 **{k: v[:args.frames] for k, v in motion.items()})
    else:
        synthetic.write_synthetic_dataset(args.root, args.frames, args.views,
                                          H=H, W=W)
        model = BodyModel(join(args.root, 'body_model.npz'))
        motion = dict(np.load(join(args.root, 'motion.npz')))

    cams = synthetic.make_cameras(args.views, H=H, W=W)
    annots = dict(cams=cams, ims=[
        dict(ims=[f'images/{v:02d}/{f:06d}.jpg' for v in range(args.views)])
        for f in range(args.frames)])
    np.save(join(args.root, 'annots.npy'), annots, allow_pickle=True)

    if args.skip_images:
        print('skipping image rendering')
        return

    # render GT with the distilled avatar (relight path -> realistic shading)
    cfg = default_cfg()
    cfg.n_bones = model.n_bones
    cfg.cond_dim = model.n_bones * 3
    cfg.relighting = True
    cfg.n_samples = 3
    cfg.dist_th = 0.125
    cfg.obj_lvis.dist_th = 0.125
    cfg.tpu.ray_block = 8192
    mcfg = AniSDFConfig.from_cfg(cfg)._replace(sdf_res=8)
    params = load_params(anisdf.init_anisdf(jax.random.PRNGKey(0), mcfg),
                         args.fixture_params)

    shapes = motion['shapes'][0]
    tverts, tjoints, big_A, _ = make_bigpose(model, shapes)
    renderer = SphereTracingRenderer(cfg, params, mcfg)

    for f in range(args.frames):
        ctx = make_frame_context(model, tverts, tjoints, big_A,
                                 motion['poses'][f], motion['Rh'][f],
                                 motion['Th'][f], shapes)
        wb = np.asarray(ctx['wbounds'])
        for v in range(args.views):
            K = cams['K'][v]
            R = cams['R'][v]
            T = cams['T'][v] / 1000.0
            ray_o, ray_d = get_rays(H, W, K, R, T)
            near, far, mab = get_full_near_far(wb, ray_o.reshape(-1, 3),
                                               ray_d.reshape(-1, 3))
            sel = mab
            batch = dotdict(ray_o=ray_o.reshape(-1, 3)[sel],
                            ray_d=ray_d.reshape(-1, 3)[sel],
                            near=near[sel], far=far[sel], ctx=ctx)
            out = renderer.render(batch)
            img = np.zeros((H * W, 3), np.float32)
            img[sel] = np.asarray(out.rgb_map)
            acc = np.zeros(H * W, np.float32)
            acc[sel] = np.asarray(out.acc_map)
            img = img.reshape(H, W, 3)
            msk = (acc.reshape(H, W) > 0.5).astype(np.uint8) * 255

            img_dir = join(args.root, 'images', f'{v:02d}')
            msk_dir = join(args.root, 'mask', f'{v:02d}')
            os.makedirs(img_dir, exist_ok=True)
            os.makedirs(msk_dir, exist_ok=True)
            cv2.imwrite(join(img_dir, f'{f:06d}.jpg'),
                        (np.clip(img, 0, 1) * 255).astype(np.uint8)[..., ::-1])
            cv2.imwrite(join(msk_dir, f'{f:06d}.png'), msk)
        print(f'frame {f + 1}/{args.frames} done')


if __name__ == '__main__':
    main()
