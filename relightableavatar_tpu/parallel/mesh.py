"""Device mesh + sharding helpers: ray/data-parallel training and rendering.

The reference's only parallelism is DDP gradient all-reduce over NCCL
(SURVEY.md §2.8; ``train.py:116-122``).  TPU-native equivalent: a 1-D
``jax.sharding.Mesh`` over all chips with the RAY axis sharded and params
replicated — XLA emits the grad psum over ICI automatically when a jitted
loss consumes sharded rays with replicated params.  The same mesh shards
rendering blocks at test time (each chip owns a slice of pixels).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(cfg=None, n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if cfg is not None:
        shape = list(cfg.tpu.mesh_shape)
        if len(shape) == 1 and shape[0] == -1:
            shape = [len(devs)]
        n = int(np.prod(shape))
        devs = devs[:n]
    return Mesh(np.array(devs), axis_names=("rays",))


def shard_rays(mesh: Mesh, tree):
    """Put a pytree of (P, ...) ray arrays with the leading axis sharded."""
    sharding = NamedSharding(mesh, P("rays"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(arr: np.ndarray, m: int, axis: int = 0, value=0.0):
    pad = (-arr.shape[axis]) % m
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=value)
