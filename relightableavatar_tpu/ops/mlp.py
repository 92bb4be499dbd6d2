"""Functional MLP stack: params-as-pytrees, pure apply functions.

TPU-native replacement for the reference's nn.Module MLPs:
- ``MLP`` (reference ``lib/utils/net_utils.py:1242-1273``): D hidden layers of
  width W with a skip concat at layer 4, ReLU, optional weight norm.
- ``SphereSignedDistanceField`` (reference ``net_utils.py:1276-1352``): IDR
  geometric init, weight norm, skip concat divided by sqrt(2), softplus(100).

Weight norm is kept in (g, v) parametrization so training matches reference
dynamics; ``fold_weight_norm`` collapses it for inference. Matmuls optionally
run in bfloat16 on the MXU with float32 accumulation.
"""
from __future__ import annotations

import math
from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


# ------------------------------------------------------------------ linear
def linear_init(key, d_in: int, d_out: int, weight_norm: bool = False,
                w_init: str = "torch", bias_init: float = 0.0) -> Params:
    """Default init mirrors torch nn.Linear (kaiming-uniform fan_in)."""
    kw, kb = jax.random.split(key)
    if w_init == "torch":
        bound = 1.0 / math.sqrt(d_in)
        w = jax.random.uniform(kw, (d_in, d_out), minval=-bound, maxval=bound)
        b = jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)
    elif w_init == "kaiming_normal":
        # torch kaiming_normal_ on (out, in): std = sqrt(2 / fan_in) where
        # fan_in of the (out,in) weight is d_in; bias keeps nn.Linear default
        bound = 1.0 / math.sqrt(d_in)
        w = jax.random.normal(kw, (d_in, d_out)) * math.sqrt(2.0 / d_in)
        b = jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)
    else:
        raise ValueError(w_init)
    if bias_init != 0.0:
        b = jnp.full((d_out,), bias_init)
    p = {"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)}
    if weight_norm:
        p = to_weight_norm(p)
    return p


def to_weight_norm(p: Params) -> Params:
    """Split w into (g, v) as torch's nn.utils.weight_norm (norm over input dim)."""
    w = p["w"]
    g = jnp.linalg.norm(w, axis=0)  # (O,) — per output unit, like torch dim=1 on (O,I)
    return {"v": w, "g": g, "b": p["b"]}


def fold_weight_norm(p: Params) -> Params:
    if "v" in p:
        v = p["v"]
        w = v * (p["g"] / (jnp.linalg.norm(v, axis=0) + 1e-12))
        return {"w": w, "b": p["b"]}
    return p


def linear_apply(p: Params, x: jnp.ndarray, bf16: bool = False,
                 keep_bf16: bool = False) -> jnp.ndarray:
    """bf16: matmul in bfloat16 with f32 accumulation.  keep_bf16: also emit
    the layer output in bfloat16 so inter-layer activations stay half-width
    in HBM (the MLP chain is bandwidth-bound at ~1M-point batches)."""
    if "v" in p:
        v = p["v"]
        w = v * (p["g"] / (jnp.linalg.norm(v, axis=0) + 1e-12))
    else:
        w = p["w"]
    if bf16:
        y = jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        y = x @ w
    y = y + p["b"]
    return y.astype(jnp.bfloat16) if (bf16 and keep_bf16) else y


# ------------------------------------------------------------------ activations
def softplus100(x):
    """softplus with beta=100 and torch's threshold=20 linearization."""
    bx = 100.0 * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / 100.0)


ACTVN: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "softplus100": softplus100,
    "identity": lambda x: x,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


# ------------------------------------------------------------------ MLP
def mlp_init(key, input_ch: int, W: int = 256, D: int = 8, out_ch: int = 257,
             skips: Sequence[int] = (4,), weight_norm: bool = False,
             w_init: str = "torch", zero_out_bias: bool = False) -> Params:
    """Reference MLP (net_utils.py:1242-1262): D+1 linears, skip concat before
    layer i for i in skips."""
    keys = jax.random.split(key, D + 1)
    layers: List[Params] = []
    for i in range(D + 1):
        I, O = W, W
        if i == 0:
            I = input_ch
        if i in skips:
            I = input_ch + W
        if i == D:
            O = out_ch
        layers.append(linear_init(keys[i], I, O, weight_norm=weight_norm, w_init=w_init))
    if zero_out_bias:  # ResidualDeformation zeroes the last bias (base_network.py:32)
        layers[-1]["b"] = jnp.zeros_like(layers[-1]["b"])
    return {"layers": layers}


def mlp_apply(p: Params, x: jnp.ndarray, actvn: str = "relu",
              out_actvn: str = "identity", bf16: bool = False,
              bf16_act: bool = False,
              skips: Sequence[int] = (4,)) -> jnp.ndarray:
    """bf16_act keeps hidden activations in bfloat16 between layers (the
    final layer always emits float32)."""
    inp = x
    layers = p["layers"]
    act = ACTVN[actvn]
    oact = ACTVN[out_actvn]
    for i, l in enumerate(layers):
        if i in skips:
            x = jnp.concatenate([x, inp.astype(x.dtype)], axis=-1)
        last = i == len(layers) - 1
        x = linear_apply(l, x, bf16=bf16, keep_bf16=bf16_act and not last)
        x = oact(x) if last else act(x)
    return x


# ------------------------------------------------------------------ SSDF
def ssdf_init(key, d_in: int, d_hidden: int = 256, n_layers: int = 8,
              d_out: int = 257, skips: Sequence[int] = (4,), bias: float = 0.5) -> Params:
    """IDR geometric init + weight norm (reference net_utils.py:1276-1334).

    Layer l before a skip outputs (d_hidden - d_in); the first 3 input columns
    carry xyz, remaining are PE features zeroed at init.
    """
    dims = [d_in] + [d_hidden] * n_layers + [d_out]
    num_layers = len(dims)
    keys = jax.random.split(key, num_layers - 1)
    layers: List[Params] = []
    for l in range(num_layers - 1):
        if l + 1 in skips:
            out_dim = dims[l + 1] - dims[0]
        else:
            out_dim = dims[l + 1]
        in_dim = dims[l]
        k = keys[l]
        if l == num_layers - 2:
            w = jax.random.normal(k, (in_dim, out_dim)) * 1e-4 + math.sqrt(math.pi) / math.sqrt(in_dim)
            b = jnp.full((out_dim,), -bias)
        elif l == 0:
            w = jnp.zeros((in_dim, out_dim))
            w = w.at[:3, :].set(jax.random.normal(k, (3, out_dim)) * (math.sqrt(2) / math.sqrt(out_dim)))
            b = jnp.zeros((out_dim,))
        elif l in skips:
            w = jax.random.normal(k, (in_dim, out_dim)) * (math.sqrt(2) / math.sqrt(out_dim))
            w = w.at[-(dims[0] - 3):, :].set(0.0)  # zero PE part of the skip input
            b = jnp.zeros((out_dim,))
        else:
            w = jax.random.normal(k, (in_dim, out_dim)) * (math.sqrt(2) / math.sqrt(out_dim))
            b = jnp.zeros((out_dim,))
        layers.append(to_weight_norm({"w": w.astype(jnp.float32), "b": b.astype(jnp.float32)}))
    return {"layers": layers}


def ssdf_apply(p: Params, x: jnp.ndarray, bf16: bool = False,
               bf16_act: bool = False,
               skips: Sequence[int] = (4,)) -> jnp.ndarray:
    """Returns (..., d_out) = [sdf, features]. Skip concat divided by sqrt(2)
    (reference net_utils.py:1345-1346).  bf16_act: half-width hidden
    activations (final sdf/feature output stays float32)."""
    inp = x
    layers = p["layers"]
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    for l, lay in enumerate(layers):
        if l in skips:
            x = jnp.concatenate([x, inp.astype(x.dtype)], axis=-1) * inv_sqrt2
        last = l == len(layers) - 1
        x = linear_apply(lay, x, bf16=bf16, keep_bf16=bf16_act and not last)
        if not last:
            x = softplus100(x)
    return x
