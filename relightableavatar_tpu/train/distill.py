"""Geometry distillation: fit the canonical SDF MLP to a body point cloud.

Bootstraps stage-1 geometry so the tracer/renderer have a real zero-crossing
surface — the framework's replacement for "load a pretrained xuzhen
checkpoint" (the reference repo ships none).  Target signed distance comes
from the canonical vertex cloud + normals (the same signed-distance
construction as geodesic_knn, ``lib/utils/sample_utils.py:118-127``).

Runs as one jitted optax Adam loop; seconds on a TPU chip.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from relightableavatar_tpu.models import anisdf
from relightableavatar_tpu.models.anisdf import AniSDFConfig
from relightableavatar_tpu.ops.knn import knn_unchunked


def target_sdf(pts: jnp.ndarray, tverts: jnp.ndarray, tnorm: jnp.ndarray,
               K: int = 4) -> jnp.ndarray:
    """Signed distance to the canonical vertex cloud: distance to nearest
    verts, sign from normal alignment (majority over K)."""
    d2, nn = knn_unchunked(pts, tverts, K=K)
    dist = jnp.sqrt(d2[:, 0])
    dots = jnp.sum((pts[:, None, :] - tverts[nn]) * tnorm[nn], axis=-1)
    sign = jnp.sign(jnp.sum(jnp.sign(dots), axis=-1) + 0.5)
    return (dist * sign)[:, None]


def distill_geometry(params: dict, mcfg: AniSDFConfig, tverts: np.ndarray,
                     tnorm: np.ndarray, steps: int = 600, batch: int = 8192,
                     lr: float = 5e-4, seed: int = 0,
                     beta_final: float = 0.01, zero_residuals: bool = True):
    """Returns params with the SDF MLP fitted to the canonical body surface.

    Samples: surface-jittered points (sigma 2/8 cm) + uniform box points.
    Loss: L1 to target signed distance + eikonal on the jittered set.
    """
    tverts_j = jnp.asarray(tverts)
    tnorm_j = jnp.asarray(tnorm)
    lo = tverts_j.min(0) - 0.3
    hi = tverts_j.max(0) + 0.3

    opt = optax.adam(lr)
    # only optimize the sdf subtree
    sdf_params = params["sdf"]
    opt_state = opt.init(sdf_params)

    V = tverts_j.shape[0]

    def sample_batch(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        idx = jax.random.randint(k1, (batch // 2,), 0, V)
        near = tverts_j[idx] + jax.random.normal(k2, (batch // 2, 3)) * 0.02
        mid = tverts_j[jax.random.randint(k3, (batch // 4,), 0, V)] + \
            jax.random.normal(k4, (batch // 4, 3)) * 0.08
        unif = lo + (hi - lo) * jax.random.uniform(k1, (batch // 4, 3))
        return jnp.concatenate([near, mid, unif], axis=0)

    from relightableavatar_tpu.ops.embedder import positional_encoding
    from relightableavatar_tpu.ops.mlp import ssdf_apply

    def pred_sdf(sp, p):
        return ssdf_apply(sp, positional_encoding(p, mcfg.sdf_res))[..., :1]

    from relightableavatar_tpu.ops.grads import spatial_gradient_fwd

    def loss_fn(sp, pts):
        gt = target_sdf(pts, tverts_j, tnorm_j)
        pred, grad_p = spatial_gradient_fwd(lambda p: pred_sdf(sp, p), pts)
        l1 = jnp.mean(jnp.abs(pred - gt))
        eik = jnp.mean((jnp.linalg.norm(grad_p, axis=-1) - 1.0) ** 2)
        return l1 + 0.1 * eik

    @jax.jit
    def step(sp, opt_state, key):
        pts = sample_batch(key)
        loss, g = jax.value_and_grad(loss_fn)(sp, pts)
        updates, opt_state = opt.update(g, opt_state)
        sp = optax.apply_updates(sp, updates)
        return sp, opt_state, loss

    key = jax.random.PRNGKey(seed)
    for i in range(steps):
        key, sub = jax.random.split(key)
        sdf_params, opt_state, loss = step(sdf_params, opt_state, sub)

    out = dict(params)
    out["sdf"] = sdf_params
    out["beta"] = jnp.asarray(beta_final, jnp.float32)
    if zero_residuals:
        # zero the residual MLP's output layer: deterministic geometry
        resd = jax.tree_util.tree_map(lambda x: x, out["resd"])
        last = dict(resd["layers"][-1])
        for k in ("w", "v"):
            if k in last:
                last[k] = jnp.zeros_like(last[k])
        last["b"] = jnp.zeros_like(last["b"])
        resd["layers"] = list(resd["layers"][:-1]) + [last]
        out["resd"] = resd
    return out, float(loss)
