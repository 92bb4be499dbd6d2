"""Checkpoint save/load: flattened-npz param pytrees + torch .pth import.

Replaces the reference's ``load_model/save_model/load_network``
(``lib/utils/net_utils.py:1386-1584``): epoch-numbered + ``latest`` files, GC
of old epochs, partial loads.  Native format is a flat .npz keyed by pytree
paths (fast, dependency-free, mmap-able); ``load_torch_pth`` imports reference
PyTorch checkpoints (weight-norm ``_g``/``_v`` parametrization and linear
weight transposes handled explicitly).
"""
from __future__ import annotations

import os
import re
from os.path import exists, join

import numpy as np
import jax.numpy as jnp
import jax.tree_util as jtu

from relightableavatar_tpu.utils.log import log


def _flatten(params) -> dict:
    flat = {}
    for path, leaf in jtu.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_into(template, flat: dict):
    leaves, treedef = jtu.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in leaves:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key in flat:
            arr = flat[key]
            if arr.shape != np.asarray(leaf).shape:
                raise ValueError(f"shape mismatch for {key}: ckpt {arr.shape} vs model {np.asarray(leaf).shape}")
            new_leaves.append(jnp.asarray(arr))
        else:
            raise KeyError(f"missing key in checkpoint: {key}")
    return jtu.tree_unflatten(jtu.tree_structure(template), new_leaves)


def _atomic_savez(path: str, flat: dict) -> None:
    """Write-to-tmp + os.replace so readers (and the live-snapshot daemon)
    never observe a half-written .npz — a crash mid-save must not leave a
    truncated ``latest.npz`` as the only durable copy (ADVICE r2)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def save_params(params, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    _atomic_savez(path, _flatten(params))


def load_params(template, path: str):
    with np.load(path) as f:
        flat = {k: f[k] for k in f.files}
    return _unflatten_into(template, flat)


# -------------------------------------------------------------- train states
def save_model(model_dir: str, state: dict, epoch: int, latest: bool = True,
               keep: int = 20, aux: dict | None = None) -> None:
    """state: dict of pytrees (params, opt_state, epoch...). Mirrors
    net_utils.py:1463-1492 (epoch files + latest + GC).

    ``aux`` is an optional JSON-serializable dict of non-pytree training
    state (recorder windows, RNG key, iteration-in-epoch) — the analogue of
    the reference checkpointing ``{scheduler, recorder}`` alongside the
    net/optim states (net_utils.py:1473-1479); stored as a JSON string so
    the npz stays a flat array archive."""
    os.makedirs(model_dir, exist_ok=True)
    flat = {"epoch": np.asarray(epoch)}
    if aux is not None:
        import json
        flat["aux"] = np.asarray(json.dumps(aux))
    for name, tree in state.items():
        if name == "epoch":
            continue
        for k, v in _flatten(tree).items():
            flat[f"{name}:{k}"] = v
    _atomic_savez(join(model_dir, "latest.npz" if latest else f"{epoch}.npz"), flat)
    if not latest:
        return
    _atomic_savez(join(model_dir, f"{epoch}.npz"), flat)
    # GC old epochs
    eps = sorted(int(m.group(1)) for f in os.listdir(model_dir)
                 if (m := re.match(r"^(\d+)\.npz$", f)))
    for e in eps[:-keep]:
        os.remove(join(model_dir, f"{e}.npz"))


def load_model(model_dir: str, templates: dict, epoch: int = -1):
    """Returns (state dict, epoch, aux dict) or (None, 0, {}) when absent.
    ``aux`` is the JSON side-channel written by save_model (empty for
    checkpoints that predate it)."""
    if not exists(model_dir):
        return None, 0, {}
    if epoch == -1 and exists(join(model_dir, "latest.npz")):
        path = join(model_dir, "latest.npz")
    else:
        eps = sorted(int(m.group(1)) for f in os.listdir(model_dir)
                     if (m := re.match(r"^(\d+)\.npz$", f)))
        if not eps:
            return None, 0, {}
        e = epoch if epoch != -1 and epoch in eps else eps[-1]
        path = join(model_dir, f"{e}.npz")
    with np.load(path) as f:
        flat = {k: f[k] for k in f.files}
    loaded_epoch = int(flat.pop("epoch", 0))
    aux = {}
    if "aux" in flat:
        import json
        aux = json.loads(str(flat.pop("aux")))
    state = {}
    for name, template in templates.items():
        sub = {k.split(":", 1)[1]: v for k, v in flat.items()
               if k.startswith(f"{name}:")}
        state[name] = _unflatten_into(template, sub)
    log(f"loaded checkpoint {path} (epoch {loaded_epoch})", "green")
    return state, loaded_epoch, aux


# -------------------------------------------------------------- torch import
def load_torch_pth(template, path: str, mcfg=None):
    """Import a reference PyTorch ``latest.pth`` into our param pytree.

    Key mapping (reference module tree -> ours):
      residual_deformation_network.mlp.linears.{i} -> resd/layers/{i}
      signed_distance_network.mlp.lin{l} (weight-norm _g/_v) -> sdf/layers/{l}
      signed_distance_network._beta -> beta
      render_network.l{i} (weight-norm) -> rgb/l{i}
      albedo_network.mlp.linears.{i} -> albedo/layers/{i}
      roughness_network.mlp.linears.{i} -> roughness/layers/{i}
      global_env_map_ -> env
    torch Linear stores (out, in); ours is (in, out) -> transpose. torch
    weight_norm stores weight_g (O, 1) + weight_v (O, I); ours g (O,), v (I, O).
    """
    import torch
    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("net", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    flat = {}

    def put_linear(dst, w_key, b_key, weight_norm=False):
        if weight_norm:
            g = sd[w_key + "_g"]  # (O, 1)
            v = sd[w_key + "_v"]  # (O, I)
            flat[f"{dst}/g"] = g.reshape(-1)
            flat[f"{dst}/v"] = v.T
        else:
            flat[f"{dst}/w"] = sd[w_key].T
        flat[f"{dst}/b"] = sd[b_key]

    for k in list(sd):
        m = re.match(r"residual_deformation_network\.mlp\.linears\.(\d+)\.weight$", k)
        if m:
            i = m.group(1)
            put_linear(f"resd/layers/{i}",
                       f"residual_deformation_network.mlp.linears.{i}.weight",
                       f"residual_deformation_network.mlp.linears.{i}.bias")
        m = re.match(r"signed_distance_network\.mlp\.lin(\d+)\.weight_g$", k)
        if m:
            l = m.group(1)
            put_linear(f"sdf/layers/{l}",
                       f"signed_distance_network.mlp.lin{l}.weight",
                       f"signed_distance_network.mlp.lin{l}.bias", weight_norm=True)
        m = re.match(r"render_network\.l(\d+)\.weight_g$", k)
        if m:
            i = m.group(1)
            put_linear(f"rgb/l{i}", f"render_network.l{i}.weight",
                       f"render_network.l{i}.bias", weight_norm=True)
        for head in ("albedo", "roughness"):
            m = re.match(rf"{head}_network\.mlp\.linears\.(\d+)\.weight$", k)
            if m:
                i = m.group(1)
                put_linear(f"{head}/layers/{i}",
                           f"{head}_network.mlp.linears.{i}.weight",
                           f"{head}_network.mlp.linears.{i}.bias")

    if "signed_distance_network._beta" in sd:
        flat["beta"] = np.asarray(sd["signed_distance_network._beta"]).reshape(())
    if "global_env_map_" in sd:
        flat["env"] = sd["global_env_map_"]

    return _unflatten_into(template, flat)
