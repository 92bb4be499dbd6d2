"""Metric protocol tests: SSIM (skimage-default parity), LPIPS exact path.

The reference protocol is skimage ``compare_ssim(..., channel_axis=-1,
data_range=1)`` — uniform 7x7 window, sample covariance, border crop
(``lib/evaluators/base_evaluator.py:47``) — and lpips.LPIPS(net='vgg')
(``:50-69``).
"""
import numpy as np
import pytest

from relightableavatar_tpu.eval import metrics


def _ssim_bruteforce(x, y, data_range=1.0, win=7):
    """Direct sliding-window SSIM with sample covariance — an independent
    re-derivation of skimage's default structural_similarity."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    N = win * win
    H, W = x.shape
    vals = []
    for i in range(H - win + 1):
        for j in range(W - win + 1):
            px = x[i:i + win, j:j + win].ravel()
            py = y[i:i + win, j:j + win].ravel()
            ux, uy = px.mean(), py.mean()
            vx = ((px - ux) ** 2).sum() / (N - 1)
            vy = ((py - uy) ** 2).sum() / (N - 1)
            vxy = ((px - ux) * (py - uy)).sum() / (N - 1)
            vals.append(((2 * ux * uy + C1) * (2 * vxy + C2))
                        / ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)))
    return float(np.mean(vals))


def test_psnr_known_value():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    assert metrics.psnr(a, b) == pytest.approx(20.0, abs=1e-3)


def test_ssim_matches_bruteforce_protocol(rng):
    x = rng.random((24, 20))
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1)
    got = metrics.ssim(x, y)
    want = _ssim_bruteforce(x, y)
    assert got == pytest.approx(want, abs=1e-10)


def test_ssim_identity_and_ordering(rng):
    x = rng.random((32, 32, 3))
    assert metrics.ssim(x, x) == pytest.approx(1.0, abs=1e-12)
    small = np.clip(x + rng.normal(0, 0.02, x.shape), 0, 1)
    large = np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1)
    assert metrics.ssim(x, small) > metrics.ssim(x, large)


def test_ssim_gaussian_variant_differs(rng):
    x = rng.random((32, 32))
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1)
    uni = metrics.ssim(x, y)
    gau = metrics.ssim(x, y, gaussian_weights=True)
    assert uni != pytest.approx(gau, abs=1e-6)


def _write_tiny_lpips_npz(path, with_lins=True, with_taps=True):
    """Tiny 3-conv stack exercising taps/pools/lins/scaling — the exact-path
    schema of scripts/tools/export_lpips_weights.py at toy scale."""
    rng = np.random.default_rng(11)
    arrays = {'n_layers': np.int64(3),
              'shift': np.array([-0.03, -0.088, -0.188], np.float32),
              'scale': np.array([0.458, 0.448, 0.450], np.float32)}
    chans = [(3, 4), (4, 6), (6, 8)]
    taps = [False, True, True] if with_taps else [True, True, True]
    pools = [False, True, False]
    for i, (cin, cout) in enumerate(chans):
        arrays[f'w{i}'] = rng.normal(0, 0.3, (cout, cin, 3, 3)).astype(np.float32)
        arrays[f'b{i}'] = rng.normal(0, 0.05, cout).astype(np.float32)
        arrays[f'tap{i}'] = np.bool_(taps[i])
        arrays[f'pool{i}'] = np.bool_(pools[i])
    if with_lins:
        n_taps = sum(taps)
        tap_chans = [c for (t, (_, c)) in zip(taps, chans) if t]
        for j in range(n_taps):
            arrays[f'lin{j}'] = rng.uniform(0, 1, tap_chans[j]).astype(np.float32)
    np.savez(path, **arrays)


def test_lpips_exact_path_with_weights_file(tmp_path, rng):
    path = str(tmp_path / 'lpips_tiny.npz')
    _write_tiny_lpips_npz(path)
    x = rng.random((16, 16, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)

    assert metrics.lpips(x, x, weights_path=path) == pytest.approx(0.0, abs=1e-10)
    d_small = metrics.lpips(x, np.clip(x + 0.01, 0, 1), weights_path=path)
    d_large = metrics.lpips(x, y.astype(np.float64), weights_path=path)
    assert 0 < d_small < d_large

    # deterministic across cache-cleared reloads
    metrics._LPIPS_CACHE.clear()
    assert metrics.lpips(x, y, weights_path=path) == pytest.approx(d_large, rel=1e-6)


def test_lpips_fallback_is_rand_labeled(rng, monkeypatch):
    monkeypatch.delenv('RA_TPU_LPIPS_WEIGHTS', raising=False)
    assert not metrics.lpips_is_exact()
    x = rng.random((16, 16, 3))
    d = metrics.lpips(x, np.clip(x + 0.05, 0, 1))
    assert d > 0


def test_fill_image_crop_bbox_roundtrip():
    """crop_bbox paste-back (reference base_evaluator.py:41-47)."""
    from relightableavatar_tpu.eval.evaluator import fill_image
    from relightableavatar_tpu.utils.dotdict import dotdict
    img = np.arange(4 * 6 * 3, dtype=np.float32).reshape(4, 6, 3)
    batch = dotdict(crop_bbox=np.array([[2, 1], [8, 5]]),  # (x0,y0),(x1,y1)
                    orig_H=10, orig_W=12, H=10, W=12)
    full = fill_image(img, batch, bg=0.3)
    assert full.shape == (10, 12, 3)
    np.testing.assert_array_equal(full[1:5, 2:8], img)
    assert (full[0] == 0.3).all() and (full[:, 0] == 0.3).all()
