"""Config tree with yacs-compatible semantics.

Re-implements the behaviors the framework needs from the reference's yacs fork
(``lib/config/yacs.py``): an attribute-access config node (CN), recursive
``parent_cfg``/``parent_cfgs`` inheritance (reference ``yacs.py:285-294``
``merge_strain``), recursive merging of overlay sub-configs, and
``merge_from_list`` CLI ``k v`` pairs with type coercion
(reference ``yacs.py:177``).

Unlike yacs we always allow new keys when merging from files: the reference
experiment YAMLs freely introduce keys beyond the code defaults.
"""
from __future__ import annotations

import ast
import copy
import os
from typing import Any, List

import yaml

from relightableavatar_tpu.utils.dotdict import dotdict


class CN(dotdict):
    """Config node: a dotdict with yacs-style merge operations."""

    def __init__(self, init: dict | None = None):
        super().__init__()
        if init:
            for k, v in init.items():
                self[k] = CN(v) if isinstance(v, dict) and not isinstance(v, CN) else v

    # ------------------------------------------------------------------ clone
    def clone(self) -> "CN":
        return copy.deepcopy(self)

    # ------------------------------------------------------------------ merge
    def merge_from_other_cfg(self, other: dict) -> None:
        """Recursively merge ``other`` into self (other wins)."""
        _merge_into(self, other)

    def merge_from_file(self, path: str) -> None:
        with open(path, "r") as f:
            data = yaml.safe_load(f) or {}
        _merge_into(self, data)

    def merge_strain(self, cfg_or_path) -> None:
        """Merge a YAML config, first recursively merging its parent chain.

        Mirrors reference ``yacs.py:285-294``: a config may name
        ``parent_cfg`` (str) or ``parent_cfgs`` (list of str); parents are
        merged first (deepest ancestor first), then the config itself.
        """
        if isinstance(cfg_or_path, str):
            with open(cfg_or_path, "r") as f:
                data = yaml.safe_load(f) or {}
        else:
            data = dict(cfg_or_path)

        parents: List[str] = []
        if "parent_cfg" in data:
            parents.append(data.pop("parent_cfg"))
        if "parent_cfgs" in data:
            parents.extend(data.pop("parent_cfgs"))
        for p in parents:
            if os.path.exists(p):
                self.merge_strain(p)

        _merge_into(self, data)

    def merge_from_list(self, opts: List[str]) -> None:
        """Merge flat ``[k, v, k, v, ...]`` command-line pairs."""
        if not opts:
            return
        assert len(opts) % 2 == 0, f"override list must be key/value pairs, got {opts}"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for part in parts[:-1]:
                if part not in node or not isinstance(node[part], dict):
                    node[part] = CN()
                node = node[part]
            leaf = parts[-1]
            old = node.get(leaf, None)
            node[leaf] = _coerce(value, old)


def _merge_into(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict):
            if k in dst and isinstance(dst[k], dict):
                _merge_into(dst[k], v)
            else:
                dst[k] = CN(v)
        else:
            if k in dst and dst[k] is not None and v is not None:
                dst[k] = _coerce_typed(v, dst[k])
            else:
                dst[k] = v


def _coerce(value: str, old: Any):
    """Parse a CLI string literal, then coerce toward the old value's type."""
    try:
        parsed = ast.literal_eval(value)
    except (ValueError, SyntaxError):
        parsed = value
    if old is None:
        return parsed
    return _coerce_typed(parsed, old)


def _coerce_typed(new: Any, old: Any):
    """Best-effort type reconciliation matching yacs's coercion rules."""
    if isinstance(old, bool) and isinstance(new, (int, str)):
        if isinstance(new, str):
            if new.lower() in ("true", "1"):
                return True
            if new.lower() in ("false", "0"):
                return False
            return new
        return bool(new)
    if isinstance(old, float) and isinstance(new, int):
        return float(new)
    if isinstance(old, int) and isinstance(new, float) and new.is_integer():
        # keep float if user explicitly passed one with fraction; else int
        return int(new)
    if isinstance(old, tuple) and isinstance(new, list):
        return tuple(new)
    return new


def load_cfg(path_or_file) -> CN:
    if hasattr(path_or_file, "read"):
        return CN(yaml.safe_load(path_or_file) or {})
    with open(path_or_file, "r") as f:
        return CN(yaml.safe_load(f) or {})
