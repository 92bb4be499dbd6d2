"""Attribute-access dict container used throughout the framework.

Mirrors the semantics of the reference's ``lib/utils/base_utils.py:7-83`` dotdict:
a plain ``dict`` whose items are also reachable as attributes, recursively
wrapping nested dicts on access. Used for batches, render outputs and configs.
"""
from __future__ import annotations

from typing import Any


class dotdict(dict):
    """dict with attribute access; nested dicts are wrapped lazily."""

    def __getattr__(self, name: str) -> Any:
        try:
            value = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        if isinstance(value, dict) and not isinstance(value, dotdict):
            value = dotdict(value)
            self[name] = value
        return value

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def copy(self) -> "dotdict":
        return dotdict(dict.copy(self))


# dotdicts flow through jit boundaries (frame contexts, render outputs) —
# register as a pytree node; dict subclasses are NOT automatic in JAX.
try:
    import jax.tree_util as _jtu

    _jtu.register_pytree_with_keys(
        dotdict,
        lambda d: (tuple((_jtu.DictKey(k), d[k]) for k in sorted(d)),
                   tuple(sorted(d))),
        lambda keys, values: dotdict(zip(keys, values)),
    )
except ImportError:  # pragma: no cover - jax always present in this image
    pass


def make_dotdict(obj: Any) -> Any:
    """Recursively convert nested plain dicts into dotdicts."""
    if isinstance(obj, dict):
        return dotdict({k: make_dotdict(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(make_dotdict(v) for v in obj)
    return obj


default_dotdict = dotdict
