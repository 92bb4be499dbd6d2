"""NeRF positional encoding (pure jnp).

Matches the reference encoding layout exactly (``lib/networks/embedder.py:12-37``):
output = [x, sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...] where each sin/cos
block spans all input dims for one frequency — i.e. per frequency i the layout is
[sin(fi*x), sin(fi*y), sin(fi*z), cos(fi*x), cos(fi*y), cos(fi*z)].
This ordering matters for checkpoint import parity.
"""
from __future__ import annotations

import jax.numpy as jnp


def embed_dim(input_dims: int, multires: int, retain_input: bool = True) -> int:
    return multires * 2 * input_dims + (input_dims if retain_input else 0)


def positional_encoding(x: jnp.ndarray, multires: int, retain_input: bool = True) -> jnp.ndarray:
    """x: (..., D) -> (..., D + multires*2*D)."""
    if multires <= 0:
        return x if retain_input else x[..., :0]
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)          # (L,)
    xb = x[..., None, :] * freqs[:, None]                        # (..., L, D)
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)         # (..., L, 2, D)
    enc = enc.reshape(*x.shape[:-1], multires * 2 * x.shape[-1])
    if retain_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def get_embedder(multires: int, input_dims: int = 3, retain_input: bool = True):
    """Returns (embed_fn, out_dim) mirroring reference get_embedder."""
    def fn(x):
        return positional_encoding(x, multires, retain_input)
    return fn, embed_dim(input_dims, multires, retain_input)
