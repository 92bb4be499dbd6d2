"""Full-resolution (512x512) TPU golden check for the bench configuration
(VERDICT r1 item 8: perf work must not silently shift bench-path pixels).

Renders the bench.py headline frame (accelerated relight stack, exact
16-iteration tracer) on the current backend and compares against the stored
reference render.  Gate: PSNR > 45 dB against the stored uint16 PNG (allows
compiler-version numeric jitter; catches any real regression).

    python scripts/check_golden_512.py          # check
    python scripts/check_golden_512.py --regen  # after an INTENTIONAL change
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)
GOLDEN = os.path.join(REPO, 'fixtures', 'golden_relight_512.png')


def render():
    import jax
    import bench
    model, ctx, make_cfg, make_params = bench._setup()
    cfg = make_cfg(relight=True)
    cfg.n_samples = 3
    bench._accel_knobs(cfg, on=True)
    params, mcfg = make_params(cfg, relight=True)
    batch, n = bench._rays(ctx, 512, 512)
    from relightableavatar_tpu.renderer.orchestrate import SphereTracingRenderer
    out = SphereTracingRenderer(cfg, params, mcfg).render(batch)
    jax.block_until_ready(out.rgb_map)
    img = np.zeros((512 * 512, 3), np.float32)
    # scatter fg rays back for a stable full-frame comparison, using the
    # exact mask bench._rays built the ray set from
    mab = np.asarray(batch.mask_at_box)
    img[mab] = np.asarray(out.rgb_map)[:mab.sum(), :3]
    return np.clip(img.reshape(512, 512, 3), 0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--regen', action='store_true')
    a = ap.parse_args()
    import cv2
    img = render()
    if a.regen or not os.path.exists(GOLDEN):
        cv2.imwrite(GOLDEN, cv2.cvtColor(
            (img * 65535).astype(np.uint16), cv2.COLOR_RGB2BGR))
        print(f'golden written: {GOLDEN}')
        return
    ref = cv2.cvtColor(cv2.imread(GOLDEN, cv2.IMREAD_UNCHANGED),
                       cv2.COLOR_BGR2RGB).astype(np.float32) / 65535.0
    mse = float(((img - ref) ** 2).mean())
    psnr = -10 * np.log10(mse + 1e-12)
    status = 'OK' if psnr > 45.0 else 'DRIFT'
    print(f'golden 512: PSNR {psnr:.2f} dB vs stored render -> {status}')
    if psnr <= 45.0:
        raise SystemExit(1)


if __name__ == '__main__':
    main()
