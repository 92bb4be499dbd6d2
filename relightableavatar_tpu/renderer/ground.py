"""Ground-plane shading pass for relit full-frame rendering.

Mirrors ``lib/networks/renderer/sphere_tracing_renderer.py:463-548``
(render_ground): Moller-Trumbore ray-plane hit, env-visibility shadow trace
with the ``env_lvis`` schedule, envmap-attached ground albedo, and a
distance-based blend into the background environment.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from relightableavatar_tpu.models.anisdf import AniSDFConfig
from relightableavatar_tpu.ops.brdf import evaluate_shade
from relightableavatar_tpu.ops.envmap import linear2srgb, sample_envmap_image
from relightableavatar_tpu.ops.lbs import normalize
from relightableavatar_tpu.renderer.sphere_tracing import (RelightRenderConfig,
                                                           light_visibility)
from relightableavatar_tpu.renderer.tracing import STConfig
from relightableavatar_tpu.utils.dotdict import dotdict


def moller_trumbore(ray_o, ray_d, tris, eps: float = 1e-8):
    """ray_o/ray_d (P, 3); tris (F, 3, 3) -> u, v, t each (P, F)
    (reference mesh_utils.py:710-739)."""
    E1 = tris[..., 1, :] - tris[..., 0, :]
    E2 = tris[..., 2, :] - tris[..., 0, :]
    N = jnp.cross(E1, E2)
    invdet = 1.0 / -(jnp.sum(ray_d[:, None, :] * N[None], axis=-1) + eps)
    A0 = ray_o[:, None, :] - tris[None, :, 0, :]
    DA0 = jnp.cross(A0, jnp.broadcast_to(ray_d[:, None, :], A0.shape))
    u = jnp.sum(DA0 * E2[None], axis=-1) * invdet
    v = -jnp.sum(DA0 * E1[None], axis=-1) * invdet
    t = jnp.sum(A0 * N[None], axis=-1) * invdet
    return u, v, t


def compute_ground_tris(orig: jnp.ndarray, norm: jnp.ndarray, key=None):
    """A big triangle spanning the ground plane (net_utils.py:392-396)."""
    n = normalize(jnp.asarray([0.3574, 0.8624, 0.3712]))  # fixed 'random' vector
    a = jnp.cross(norm, n)
    b = jnp.cross(norm, a)
    return jnp.stack([orig, orig + a, orig + b], axis=0)


@partial(jax.jit, static_argnames=("mcfg", "st_env", "rcfg", "attach_envmap"))
def render_ground_block(params, mcfg: AniSDFConfig, ctx,
                        ray_o, ray_d, acc,                 # (P,3) (P,3) (P,)
                        envmap_probe, envmap_image,
                        light_xyz, light_area, light_sharp,
                        ground_normal, ground_origin, ground_albedo,
                        st_env: STConfig, rcfg: RelightRenderConfig,
                        attach_envmap: bool = True):
    P = ray_o.shape[0]
    eH, eW = light_xyz.shape[:2]
    L = eH * eW
    xyz = light_xyz.reshape(L, 3)
    area = light_area.reshape(L)
    sharp = light_sharp.reshape(L)

    norm = normalize(ground_normal)
    tris = compute_ground_tris(ground_origin, norm)
    _, _, t = moller_trumbore(ray_o, ray_d, tris[None])
    t = t[:, 0:1]                                          # (P, 1)
    surf = ray_o + t * ray_d
    norm_p = jnp.broadcast_to(norm[None], (P, 3))

    bbox = ctx["wbounds"]
    bbox = bbox.at[0].add(-rcfg.bbox_margin).at[1].add(rcfg.bbox_margin)
    lvis, ldot = light_visibility(params, mcfg, ctx, surf, norm_p, acc,
                                  xyz, sharp, bbox, st_env, rcfg,
                                  soft_shadow=not rcfg.no_dfss)

    if attach_envmap:
        img = envmap_image if envmap_image is not None else envmap_probe
        albedo = sample_envmap_image(img, ray_d)
    else:
        albedo = jnp.broadcast_to(ground_albedo[None], (P, 3))

    # ease shading into the environment with distance (reference :504-509)
    dist = jnp.where(t[:, 0] <= 0, 1e9,
                     jnp.linalg.norm(surf - ground_origin[None], axis=-1))
    weight = jnp.clip((dist - rcfg.env_r) / rcfg.env_r, 0.0, 1.0)[:, None]

    ldot = jnp.sum(normalize(xyz)[None] * norm_p[:, None, :], axis=-1)  # (P, L)
    lvis = lvis * (1 - weight) + weight

    brdf = albedo[:, None, :] / np.pi                                    # (P, 1->L, 3)
    surf2light = normalize(xyz[None, :, :] - jnp.zeros_like(surf)[:, None, :])
    light = sample_envmap_image(envmap_probe, surf2light)                # (P, L, 3)
    if rcfg.only_visibility:
        ldot = jnp.ones_like(ldot)
        light = jnp.broadcast_to(jnp.mean(light, -1, keepdims=True), light.shape)
    shade = evaluate_shade(lvis, ldot, area, light)
    rgb = jnp.sum(brdf * shade, axis=-2)
    if rcfg.tonemapping:
        rgb = linear2srgb(rgb)
    shade_sum = jnp.sum(shade, axis=-2) * rcfg.shading_albedo / np.pi

    out = dotdict()
    out.rgb_map = rgb
    out.surf_map = surf
    out.albedo_map = albedo
    out.roughness_map = jnp.ones((P,))
    out.spec_map = shade_sum / 20
    out.norm_map = norm_p
    out.shade_map = shade_sum
    out.cpts_map = jnp.zeros_like(surf)
    out.bpts_map = jnp.zeros_like(surf)
    out.depth_map = jnp.clip(t[:, 0], -rcfg.env_r, rcfg.env_r)
    if rcfg.want_light_maps:
        out.lvis_map = lvis
        out.ldot_map = ldot
    return out
