"""Nested-dict utilities (reference common/pytorch_util.py equivalents)."""

from __future__ import annotations

from typing import Any, Callable, Dict


def dict_apply(d: Dict[str, Any], fn: Callable) -> Dict[str, Any]:
    """Apply fn to every non-dict leaf, recursing through nested dicts."""
    out = {}
    for k, v in d.items():
        out[k] = dict_apply(v, fn) if isinstance(v, dict) else fn(v)
    return out


def dict_apply_split(
    d: Dict[str, Any], split_fn: Callable[[Any], Dict[str, Any]]
) -> Dict[str, Dict[str, Any]]:
    """Split every leaf into named parts; returns {part: {key: value}}."""
    results: Dict[str, Dict[str, Any]] = {}
    for key, value in d.items():
        for rk, rv in split_fn(value).items():
            results.setdefault(rk, {})[key] = rv
    return results


def dict_apply_reduce(
    dicts, reduce_fn: Callable
) -> Dict[str, Any]:
    """Reduce a list of dicts key-wise."""
    result = {}
    for key in dicts[0]:
        result[key] = reduce_fn([d[key] for d in dicts])
    return result
