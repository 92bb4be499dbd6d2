"""Environment map utilities: light grid, equirect sampling, sRGB (pure jnp).

Mirrors the reference semantics:
- ``gen_light_xyz`` lat-long grid + per-texel solid angles
  (``lib/utils/relight_utils.py:423-465``)
- ``sample_envmap_image`` equirect lookup (``relight_utils.py:106-127``),
  re-implemented as explicit bilinear gather (no grid_sample on TPU) with
  align_corners=False + border padding semantics.
- ``linear2srgb`` / ``srgb2linear`` (``relight_utils.py:179-208``)
- ``shift_image`` sub-texel envmap rotation (``relight_utils.py:55-103``)
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def gen_light_xyz(env_h: int, env_w: int, env_r: float = 1e2):
    """Returns xyz (eH, eW, 3) texel centers on a radius-r sphere and
    areas (eH, eW) solid angles, matching reference layout (z-up latlong)."""
    lat_half = math.pi / env_h / 2
    lng_half = 2 * math.pi / env_w / 2
    lats = np.linspace(math.pi / 2 - lat_half, -math.pi / 2 + lat_half, env_h)
    lngs = np.linspace(math.pi - lng_half, -math.pi + lng_half, env_w)
    lngs_g, lats_g = np.meshgrid(lngs, lats)  # 'xy' indexing: (eH, eW)

    z = env_r * np.sin(lats_g)
    x = env_r * np.cos(lats_g) * np.cos(lngs_g)
    y = env_r * np.cos(lats_g) * np.sin(lngs_g)
    xyz = np.stack([x, y, z], axis=-1)

    sin_colat = np.sin(math.pi / 2 - lats_g)
    areas = 4 * math.pi * sin_colat / np.sum(sin_colat)
    return jnp.asarray(xyz, jnp.float32), jnp.asarray(areas, jnp.float32)


def probe_at_texels(probe: jnp.ndarray, light_xyz: jnp.ndarray) -> jnp.ndarray:
    """Probe (eh, ew, 3) sampled at each light-grid texel center direction
    -> (L, 3).  Works for ANY probe resolution (only L tiny gathers), used
    by the distant-envmap shading shortcut in both render_human_block and
    reshade_block."""
    L = light_xyz.shape[0] * light_xyz.shape[1]
    d = light_xyz.reshape(L, 3)
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
    return sample_envmap_image(probe, d)


def lvis_upsample_matrix(hc: int, wc: int, H: int, W: int) -> np.ndarray:
    """(hc*wc, H*W) bilinear weights mapping a coarse lat-long light grid to
    the full grid (texel centers per gen_light_xyz; longitude wraps,
    latitude clamps).  Static numpy — applied as one (P, Lc) @ (Lc, L)
    matmul, so visibility upsampling rides the MXU instead of gathers."""
    U = np.zeros((hc * wc, H * W), np.float32)
    for i in range(H):
        y = (i + 0.5) * hc / H - 0.5
        y0 = int(np.floor(y))
        ty = y - y0
        ys = [(max(0, min(hc - 1, y0)), 1 - ty),
              (max(0, min(hc - 1, y0 + 1)), ty)]
        for j in range(W):
            x = (j + 0.5) * wc / W - 0.5
            x0 = int(np.floor(x))
            tx = x - x0
            xs = [(x0 % wc, 1 - tx), ((x0 + 1) % wc, tx)]
            for yy, wy in ys:
                for xx, wx in xs:
                    U[yy * wc + xx, i * W + j] += wy * wx
    return U


def _bilinear_sample(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """image (H, W, C); x, y continuous pixel coords (align_corners=False
    convention: pixel centers at i+0.5); border padding.  Returns (..., C)."""
    H, W = image.shape[:2]
    x0 = jnp.floor(x - 0.5)
    y0 = jnp.floor(y - 0.5)
    wx = (x - 0.5) - x0
    wy = (y - 0.5) - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)

    v00 = image[y0i, x0i]
    v01 = image[y0i, x1i]
    v10 = image[y1i, x0i]
    v11 = image[y1i, x1i]
    wx = wx[..., None]
    wy = wy[..., None]
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)


def sample_envmap_image(image: jnp.ndarray, ray_d: jnp.ndarray) -> jnp.ndarray:
    """image (eH, eW, 3) or (1, eH, eW, 3); ray_d (..., 3) -> (..., 3).

    Matches the reference's grid_sample call (relight_utils.py:106-127):
    grid_x = -phi/pi, grid_y = 2*theta/pi - 1 with align_corners=False and
    border padding.
    """
    if image.ndim == 4:
        image = image[0]
    H, W = image.shape[:2]
    d = ray_d / (jnp.linalg.norm(ray_d, axis=-1, keepdims=True) + 1e-13)
    theta = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0)) - 1e-6
    phi = jnp.arctan2(d[..., 1], d[..., 0])

    query_y = (theta / math.pi) * 2 - 1       # [-1, 1]
    query_x = -phi / math.pi                  # [-1, 1]
    # grid_sample align_corners=False: pix = (g + 1) / 2 * size  (continuous)
    px = (query_x + 1) * 0.5 * W
    py = (query_y + 1) * 0.5 * H
    return _bilinear_sample(image, px, py)


def shift_image(image: jnp.ndarray, shift: float) -> jnp.ndarray:
    """Horizontal sub-pixel wrap-around shift via bilinear resample
    (reference rotate_envmap's shift_image, relight_utils.py:79-99)."""
    H, W = image.shape[-3:-1]
    batched = image.ndim == 4
    if not batched:
        image = image[None]
    x = (jnp.arange(W, dtype=jnp.float32) + 0.5 + shift) % W
    y = jnp.arange(H, dtype=jnp.float32) + 0.5
    xx, yy = jnp.meshgrid(x, y)  # (H, W)
    out = jnp.stack([_bilinear_sample(im, xx, yy) for im in image])
    return out if batched else out[0]


def rotate_envmap_dict(novel_light: dict, index: int, repeat: int, probe_width: int):
    """Reference ``rotate_envmap`` (relight_utils.py:55-103): pick light i and
    sub-rotation j from a flat index; returns (name, envmap dict)."""
    keys = list(novel_light.keys())
    if repeat <= 0:
        return keys[index], novel_light[keys[index]]
    n_rotation = probe_width * repeat
    i = index // n_rotation
    j = index % n_rotation
    name = f'{keys[i]}-{j:04d}'
    envmap = novel_light[keys[i]]
    probe = envmap['probe']
    image = envmap['image']
    eW = probe.shape[-2]
    iW = image.shape[-2]
    uW = eW * repeat
    out = dict(probe=shift_image(probe, eW / uW * j),
               image=shift_image(image, iW / uW * j))
    return name, out


def linear2srgb(linear: jnp.ndarray) -> jnp.ndarray:
    linear = jnp.clip(linear, 0.0, 1.0)
    lin = linear * 12.92
    nonlin = 1.055 * jnp.power(linear + 1e-7, 1 / 2.4) - 0.055
    return jnp.where(linear <= 0.0031308, lin, nonlin)


def srgb2linear(srgb: jnp.ndarray) -> jnp.ndarray:
    srgb = jnp.clip(srgb, 0.0, 1.0)
    lin = srgb / 12.92
    nonlin = jnp.power(srgb, 2.4)  # reference's coeff cancels (relight_utils.py:199-204)
    return jnp.where(srgb <= 0.04045, lin, nonlin)


def reflect(ray_d: jnp.ndarray, norm: jnp.ndarray) -> jnp.ndarray:
    dot = jnp.sum(ray_d * norm, axis=-1, keepdims=True)
    return 2 * (norm * dot) - ray_d
