"""Spatial SDF gradients: forward-mode JVPs for trainable paths.

The reference takes autograd gradients of the SDF wrt input points
(``lib/utils/net_utils.py:564-578`` take_gradient) and backprops through them
for the eikonal losses — reverse-over-reverse.  On the axon TPU compiler,
reverse-over-reverse second-order autodiff SIGILLs; forward-over-reverse
(spatial gradient via 3 JVPs, then reverse-mode over params) compiles and is
the standard hessian-vector composition anyway.

``spatial_gradient``: reverse-mode (cheapest; inference-only paths).
``spatial_gradient_fwd``: forward-mode (safe under another reverse pass).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def spatial_gradient(f: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """Reverse-mode d f(x)[..., 0] / dx; f: (..., 3) -> (..., 1)."""
    return jax.grad(lambda p: jnp.sum(f(p)[..., 0]))(x)


def spatial_gradient_fwd(f: Callable[[jnp.ndarray], jnp.ndarray],
                         x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-mode spatial gradient; returns (value, grad) with
    value (..., 1) and grad (..., 3).

    ``jax.linearize`` evaluates the primal ONCE and reuses the saved
    linearization points for the 3 axis tangents (three separate ``jvp``
    calls re-trace the primal per tangent and leave dedup to XLA CSE —
    measured slower inside the training backward)."""
    primal, f_lin = jax.linearize(f, x)
    cols = [f_lin(jnp.zeros_like(x).at[..., d].set(1.0))[..., 0]
            for d in range(3)]
    return primal, jnp.stack(cols, axis=-1)


def spatial_gradient_fd(f, x, eps: float = 0.005) -> jnp.ndarray:
    """Finite-difference gradient (reference sdf_finite_diff option,
    base_network.py:111-119): forward differences, 4 evals."""
    f0 = f(x)[..., 0]
    cols = []
    for d in range(3):
        dx = jnp.zeros_like(x).at[..., d].set(eps)
        cols.append((f(x + dx)[..., 0] - f0) / eps)
    return jnp.stack(cols, axis=-1)
