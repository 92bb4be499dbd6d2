"""Export torchvision VGG16 + LPIPS linear weights to the npz schema that
``relightableavatar_tpu/eval/metrics.py`` consumes for EXACT LPIPS.

Run this on any machine with internet access and ``torchvision`` (and
optionally the ``lpips`` pip package for the learned linear weights):

    python scripts/tools/export_lpips_weights.py -o lpips_vgg16.npz

then point the evaluator at the file:

    RA_TPU_LPIPS_WEIGHTS=lpips_vgg16.npz python run.py -t evaluate ...

The evaluator reports ``lpips`` (exact) instead of ``lpips_rand`` (the
fixed-seed random-feature proxy) whenever the file is present.

Schema (see ``eval/metrics.py:_load_spec``):
  n_layers        int — number of convolutions
  w{i}, b{i}      conv i weight (O, C, 3, 3) / bias (O,), torch layout
  pool{i}         bool — 2x2 maxpool after conv i
  tap{i}          bool — emit a unit-normalized feature after relu of conv i
  lin{j}          (C_j,) — LPIPS learned 1x1 linear weights for tap j
  shift, scale    (3,) — LPIPS ScalingLayer input normalization

The exported stack reproduces the reference metric
(``lib/evaluators/base_evaluator.py:50-69``, lpips.LPIPS(net='vgg')):
VGG16 features tapped at relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3,
unit-normalized, squared-diff weighted by the learned linear layers,
spatially averaged and summed over taps.
"""
from __future__ import annotations

import argparse

import numpy as np

# torchvision vgg16.features conv indices, with (pool-after, tap-after) flags.
# Taps: relu1_2 (conv 2), relu2_2 (conv 7), relu3_3 (conv 14),
#       relu4_3 (conv 21), relu5_3 (conv 28).
VGG16_CONVS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
VGG16_TAPS = {2, 7, 14, 21, 28}
VGG16_POOLS = {2: True, 7: True, 14: True, 21: True, 28: False}

# LPIPS ScalingLayer constants (lpips/lpips.py ScalingLayer)
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def export(out_path: str) -> None:
    import torchvision  # noqa: deferred heavy import

    vgg = torchvision.models.vgg16(weights='IMAGENET1K_V1').features.eval()
    arrays: dict = {'n_layers': np.int64(len(VGG16_CONVS)),
                    'shift': SHIFT, 'scale': SCALE}
    for i, idx in enumerate(VGG16_CONVS):
        conv = vgg[idx]
        arrays[f'w{i}'] = conv.weight.detach().numpy().astype(np.float32)
        arrays[f'b{i}'] = conv.bias.detach().numpy().astype(np.float32)
        arrays[f'tap{i}'] = np.bool_(idx in VGG16_TAPS)
        arrays[f'pool{i}'] = np.bool_(VGG16_POOLS.get(idx, False))

    try:
        import lpips
        net = lpips.LPIPS(net='vgg', verbose=False)
        for j, lin in enumerate(net.lins):
            w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
            arrays[f'lin{j}'] = w.reshape(-1).astype(np.float32)
        print('exported LPIPS learned linear weights')
    except ImportError:
        print('WARNING: lpips package not installed — exporting VGG16 features '
              'only (unweighted distance; install `pip install lpips` for the '
              'exact metric)')

    np.savez(out_path, **arrays)
    print(f'wrote {out_path}')


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('-o', '--out', default='lpips_vgg16.npz')
    args = ap.parse_args()
    export(args.out)


if __name__ == '__main__':
    main()
