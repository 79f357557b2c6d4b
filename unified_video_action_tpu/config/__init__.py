"""Minimal hydra-compatible config system.

The reference wires everything through hydra + OmegaConf (SURVEY.md §5.6):
top-level ``uva_<task>.yaml`` composes ``task/*.yaml`` + ``model/uva.yaml``,
``${a.b}`` interpolation, dotted CLI overrides, and ``_target_``-driven class
instantiation. hydra/omegaconf aren't available in this environment, so this
module re-implements the subset the framework needs:

* ``load_config(name)`` — load a top-level yaml, compose its ``defaults`` list
  (``task: X`` / ``model: Y`` entries resolve to ``task/X.yaml`` etc.),
  ``_self_`` ordering respected.
* ``${a.b}`` interpolation (whole-value and embedded), resolved lazily after
  composition + overrides.
* ``apply_overrides(cfg, ["a.b=3", "task=pusht"])`` — dotted assignments with
  YAML-typed values.
* ``instantiate(cfg)`` — ``_target_`` lookup in this framework's registry
  (reference class paths are aliased so reference config files keep working).

Configs are plain nested dicts wrapped in ``Cfg`` for attribute access.
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Callable, Dict, List, Optional

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "yaml")


class Cfg(dict):
    """Dict with attribute access, recursively."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj):
        if isinstance(obj, dict):
            return Cfg({k: Cfg.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Cfg.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> dict:
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)


def _load_yaml(path: str) -> dict:
    assert yaml is not None, "pyyaml required"
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(
    name: str,
    overrides: Optional[List[str]] = None,
    config_root: str = CONFIG_ROOT,
) -> Cfg:
    """Load ``<config_root>/<name>.yaml``, composing its defaults list."""
    if not name.endswith(".yaml"):
        name = name + ".yaml"
    raw = _load_yaml(os.path.join(config_root, name))
    defaults = raw.pop("defaults", [])

    # apply group choices from overrides like "task=pusht" before composition
    group_over = {}
    plain_overrides = []
    for ov in overrides or []:
        k, _, v = ov.partition("=")
        if "." not in k and any(
            isinstance(d, dict) and k in d for d in defaults
        ):
            group_over[k] = v
        else:
            plain_overrides.append(ov)

    cfg: dict = {}
    self_merged = False
    for d in defaults:
        if d == "_self_":
            cfg = _deep_merge(cfg, raw)
            self_merged = True
            continue
        assert isinstance(d, dict) and len(d) == 1, f"bad defaults entry: {d}"
        group, choice = next(iter(d.items()))
        choice = group_over.get(group, choice)
        sub = _load_yaml(os.path.join(config_root, group, choice + ".yaml"))
        cfg = _deep_merge(cfg, {group: sub})
    if not self_merged:
        cfg = _deep_merge(cfg, raw)

    cfg = Cfg.wrap(cfg)
    if plain_overrides:
        apply_overrides(cfg, plain_overrides)
    resolve_interpolations(cfg)
    return cfg


def _parse_value(s: str) -> Any:
    if yaml is not None:
        return yaml.safe_load(s)
    return s


def apply_overrides(cfg: Cfg, overrides: List[str]) -> None:
    for ov in overrides:
        key, _, val = ov.partition("=")
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], dict):
                node[p] = Cfg()
            node = node[p]
        node[parts[-1]] = Cfg.wrap(_parse_value(val))


_INTERP = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _lookup(root: Cfg, dotted: str) -> Any:
    node: Any = root
    for p in dotted.split("."):
        node = node[p]
    return node


def resolve_interpolations(cfg: Cfg, max_passes: int = 8) -> None:
    def resolve(node, root):
        changed = False
        if isinstance(node, dict):
            for k, v in list(node.items()):
                if isinstance(v, str):
                    m = _INTERP.fullmatch(v)
                    if m:
                        node[k] = copy.deepcopy(_lookup(root, m.group(1)))
                        changed = True
                    elif _INTERP.search(v):
                        node[k] = _INTERP.sub(
                            lambda mm: str(_lookup(root, mm.group(1))), v
                        )
                        changed = True
                elif isinstance(v, (dict, list)):
                    changed |= resolve(v, root)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                if isinstance(v, str):
                    m = _INTERP.fullmatch(v)
                    if m:
                        node[i] = copy.deepcopy(_lookup(root, m.group(1)))
                        changed = True
                elif isinstance(v, (dict, list)):
                    changed |= resolve(v, root)
        return changed

    for _ in range(max_passes):
        if not resolve(cfg, cfg):
            break


# ---------------------------------------------------------------------------
# Registry / instantiate
# ---------------------------------------------------------------------------

_REGISTRY: Dict[str, Callable] = {}

# reference-config class paths -> this framework's equivalents, so yaml files
# written for the reference keep working unchanged
_ALIASES: Dict[str, str] = {
    "unified_video_action.dataset.pusht_image_dataset.PushTImageDataset":
        "unified_video_action_tpu.data.pusht_dataset.PushTImageDataset",
    "unified_video_action.dataset.robomimic_replay_image_dataset.RobomimicReplayImageDataset":
        "unified_video_action_tpu.data.robomimic_dataset.RobomimicReplayImageDataset",
    "unified_video_action.dataset.libero_replay_image_dataset.LiberoReplayImageDataset":
        "unified_video_action_tpu.data.libero_dataset.LiberoReplayImageDataset",
    "unified_video_action.env_runner.pusht_image_runner.PushTImageRunner":
        "unified_video_action_tpu.runners.pusht_runner.PushTImageRunner",
    "unified_video_action.env_runner.robomimic_image_runner.RobomimicImageRunner":
        "unified_video_action_tpu.runners.robomimic_runner.RobomimicImageRunner",
    "unified_video_action.env_runner.libero_image_runner.LiberoImageRunner":
        "unified_video_action_tpu.runners.libero_runner.LiberoImageRunner",
    "unified_video_action.policy.unified_video_action_policy.UnifiedVideoActionPolicy":
        "unified_video_action_tpu.policy.policy.UnifiedVideoActionPolicy",
}


def register(*names: str) -> Callable:
    def deco(fn):
        for n in names:
            _REGISTRY[n] = fn
        return fn

    return deco


def get_class(target: str) -> Callable:
    target = _ALIASES.get(target, target)
    if target in _REGISTRY:
        return _REGISTRY[target]
    # fall back to import path resolution within this framework
    module, _, attr = target.rpartition(".")
    import importlib

    try:
        mod = importlib.import_module(module)
        return getattr(mod, attr)
    except Exception as e:
        raise KeyError(
            f"_target_ {target!r} not in registry and not importable: {e}"
        ) from e


def instantiate(cfg: Any, **kwargs) -> Any:
    assert isinstance(cfg, dict) and "_target_" in cfg, cfg
    cls = get_class(cfg["_target_"])
    args = {k: v for k, v in cfg.items() if k != "_target_"}
    args.update(kwargs)
    return cls(**args)
