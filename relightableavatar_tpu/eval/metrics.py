"""Image quality metrics: PSNR, SSIM, LPIPS (self-contained).

Matches the reference evaluator math (``lib/evaluators/base_evaluator.py``):
- PSNR from numpy MSE (``:26-29``)
- SSIM matching the reference protocol exactly: the reference calls skimage's
  ``compare_ssim(img_pred, img_gt, channel_axis=-1, data_range=1)``
  (``:31-48``) whose DEFAULTS are a uniform 7x7 window with sample covariance
  (N/(N-1) normalization) and a (win_size-1)//2 border crop — re-implemented
  in numpy since skimage is not in the image.  Because the crop removes every
  border-touched pixel, padding mode cannot affect the value; the result is
  bit-comparable to skimage.  The ``gaussian_weights=True`` variant
  (sigma=1.5, truncate=3.5, population covariance) is kept as an option.
- LPIPS (``:50-69``): the exact AlexNet/VGG-feature metric requires pretrained
  weights which cannot be downloaded in this environment; ``lpips()`` computes
  the standard LPIPS formula from a weights file when provided
  (``RA_TPU_LPIPS_WEIGHTS`` env or explicit path) and otherwise falls back to
  a fixed-seed random-feature perceptual distance (clearly labeled in the
  summary as ``lpips_rand``) — random convolutional features are a known
  reasonable perceptual proxy.
"""
from __future__ import annotations

import os

import numpy as np


def psnr(img_pred: np.ndarray, img_gt: np.ndarray) -> float:
    mse = np.mean((img_pred - img_gt) ** 2)
    return float(-10 * np.log10(mse + 1e-12))


def _gaussian_kernel(sigma: float = 1.5, truncate: float = 3.5) -> np.ndarray:
    r = int(truncate * sigma + 0.5)
    x = np.arange(-r, r + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _filter2d_sep(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Separable 2D convolution with reflect padding, per channel."""
    r = len(k) // 2
    out = np.pad(img, ((r, r), (0, 0)), mode='symmetric')
    out = np.apply_along_axis(lambda m: np.convolve(m, k, mode='valid'), 0, out)
    out = np.pad(out, ((0, 0), (r, r)), mode='symmetric')
    out = np.apply_along_axis(lambda m: np.convolve(m, k, mode='valid'), 1, out)
    return out


def ssim(img_pred: np.ndarray, img_gt: np.ndarray, data_range: float = 1.0,
         gaussian_weights: bool = False) -> float:
    """Mean SSIM over channels, matching skimage ``structural_similarity``.

    Default (``gaussian_weights=False``) reproduces the reference protocol
    (``base_evaluator.py:47``): uniform 7x7 window, sample covariance.
    """
    if img_pred.ndim == 3:
        return float(np.mean([
            ssim(img_pred[..., c], img_gt[..., c], data_range, gaussian_weights)
            for c in range(img_pred.shape[-1])]))
    x = img_pred.astype(np.float64)
    y = img_gt.astype(np.float64)
    if gaussian_weights:
        k = _gaussian_kernel(1.5)
        cov_norm = 1.0          # skimage: use_sample_covariance=False
    else:
        k = np.full(7, 1.0 / 7)
        cov_norm = 49.0 / 48.0  # skimage default: N/(N-1), N=win_size**2
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2

    ux = _filter2d_sep(x, k)
    uy = _filter2d_sep(y, k)
    uxx = _filter2d_sep(x * x, k)
    uyy = _filter2d_sep(y * y, k)
    uxy = _filter2d_sep(x * y, k)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux ** 2 + uy ** 2 + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    # crop the filter radius like skimage (pad = r)
    r = len(k) // 2
    return float(S[r:-r, r:-r].mean())


# ------------------------------------------------------------------ lpips
_LPIPS_CACHE: dict = {}


def _conv2d(x, w, b, stride=1):
    """x (C, H, W), w (O, C, kh, kw) — simple im2col conv, numpy."""
    O, C, kh, kw = w.shape
    H, W = x.shape[1:]
    Ho = (H - kh) // stride + 1
    Wo = (W - kw) // stride + 1
    cols = np.lib.stride_tricks.sliding_window_view(x, (kh, kw), axis=(1, 2))
    cols = cols[:, ::stride, ::stride]                    # C, Ho, Wo, kh, kw
    cols = cols.transpose(1, 2, 0, 3, 4).reshape(Ho * Wo, C * kh * kw)
    out = cols @ w.reshape(O, -1).T + b
    return out.reshape(Ho, Wo, O).transpose(2, 0, 1)


def _lpips_features(img: np.ndarray, spec) -> list:
    """img (H, W, 3) in [0,1] -> list of normalized feature maps at taps.

    ``spec`` is a dict: ``convs`` = [(w, b, pool, tap), ...] applied as
    conv -> relu -> [emit normalized feature if tap] -> [maxpool2 if pool];
    optional ``shift``/``scale`` (3,) input normalization applied after the
    [0,1] -> [-1,1] map (the LPIPS ScalingLayer).
    """
    x = img.transpose(2, 0, 1) * 2.0 - 1.0
    if spec.get('shift') is not None:
        x = (x - spec['shift'][:, None, None]) / spec['scale'][:, None, None]
    feats = []
    for (w, b, pool, tap) in spec['convs']:
        pad = w.shape[-1] // 2
        xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad)))
        x = _conv2d(xp, w, b)
        x = np.maximum(x, 0)
        if tap:
            feats.append(x / (np.sqrt((x ** 2).sum(0, keepdims=True)) + 1e-10))
        if pool:
            H2, W2 = x.shape[1] // 2 * 2, x.shape[2] // 2 * 2
            x = x[:, :H2, :W2].reshape(x.shape[0], H2 // 2, 2, W2 // 2, 2).max((2, 4))
    return feats


def _default_spec(seed: int = 7):
    """Fixed-seed random conv stack (labelled fallback when no weights)."""
    if 'rand' in _LPIPS_CACHE:
        return _LPIPS_CACHE['rand']
    rng = np.random.default_rng(seed)
    cfgs = [(3, 32, True), (32, 64, True), (64, 128, True), (128, 192, False)]
    convs = []
    for cin, cout, pool in cfgs:
        w = rng.normal(0, np.sqrt(2.0 / (cin * 9)), (cout, cin, 3, 3)).astype(np.float32)
        b = np.zeros(cout, np.float32)
        convs.append((w, b, pool, True))
    spec = dict(convs=convs, lins=None, shift=None, scale=None)
    _LPIPS_CACHE['rand'] = spec
    return spec


def _load_spec(weights_path: str):
    """Load an LPIPS weights npz (schema below; produced by
    ``scripts/tools/export_lpips_weights.py``).

    Schema (all conv weights torch layout, float32):
      n_layers          int — number of convolutions
      w{i}, b{i}        (O, C, kh, kw), (O,) — conv i weight/bias
      pool{i}           bool — 2x2 maxpool AFTER conv i (+ tap)
      tap{i}            bool — emit a unit-normalized feature after relu of
                        conv i (optional; absent => every conv is a tap,
                        the legacy layout)
      lin{j}            (C_j,) — LPIPS learned linear weights for tap j
                        (optional; absent => unweighted squared distance)
      shift, scale      (3,) — ScalingLayer input normalization (optional)
    """
    key = ('file', weights_path)
    if key not in _LPIPS_CACHE:
        with np.load(weights_path) as f:
            n = int(f['n_layers'])
            convs = [(f[f'w{i}'], f[f'b{i}'], bool(f[f'pool{i}']),
                      bool(f[f'tap{i}']) if f'tap{i}' in f else True)
                     for i in range(n)]
            n_taps = sum(1 for c in convs if c[3])
            lins = ([f[f'lin{j}'] for j in range(n_taps)]
                    if 'lin0' in f else None)
            shift = f['shift'].astype(np.float32) if 'shift' in f else None
            scale = f['scale'].astype(np.float32) if 'scale' in f else None
        _LPIPS_CACHE[key] = dict(convs=convs, lins=lins, shift=shift, scale=scale)
    return _LPIPS_CACHE[key]


def lpips(img_pred: np.ndarray, img_gt: np.ndarray,
          weights_path: str | None = None) -> float:
    """Perceptual distance; exact LPIPS when pretrained weights are provided
    (npz produced by scripts/tools/export_lpips_weights.py — see
    ``_load_spec`` for the schema), random-feature proxy otherwise
    (reference ``base_evaluator.py:50-69``)."""
    weights_path = weights_path or os.environ.get('RA_TPU_LPIPS_WEIGHTS', '')
    if weights_path and os.path.exists(weights_path):
        spec = _load_spec(weights_path)
    else:
        spec = _default_spec()
    fa = _lpips_features(img_pred, spec)
    fb = _lpips_features(img_gt, spec)
    if spec['lins'] is not None:
        # exact LPIPS: per-tap 1x1 linear weighting, spatial mean, SUM over taps
        d = 0.0
        for a, b, lin in zip(fa, fb, spec['lins']):
            d += float((lin[:, None, None] * (a - b) ** 2).sum(0).mean())
        return d
    d = 0.0
    for a, b in zip(fa, fb):
        d += float(((a - b) ** 2).sum(0).mean())
    return d / len(fa)


def lpips_is_exact() -> bool:
    p = os.environ.get('RA_TPU_LPIPS_WEIGHTS', '')
    return bool(p and os.path.exists(p))
