"""Experiment trackers: wandb-compatible metric/video logging.

The reference logs through ``accelerator.init_trackers`` → wandb with
step_log keys train_loss / diffusion_loss / action_loss / lr / video_fvd /
val_action_l2_distances / train|test_mean_score / per-seed rewards and
rollout videos (reference workspace/train_unified_video_action_workspace.py:
103-113,331,418). Here the tracker stack is:

- :class:`WandbTracker` — the real ``wandb`` package when it is installed
  (``mode: online|offline`` straight from the config's logging block).
- :class:`OfflineRunTracker` — a from-scratch wandb-workalike used when the
  package is absent (this environment) or ``mode: disabled``: it writes a
  run directory ``<output>/tracker/`` with ``config.json``,
  ``metrics.jsonl`` (one json per step, wandb history format: metric keys +
  ``_step``), ``summary.json`` (last value per key), and ``media/`` holding
  copied video artifacts referenced from the history rows — the exact data
  a wandb sync would upload, greppable offline.
- :class:`MultiTracker` fans out to several sinks; the workspace always
  keeps the flat ``logs.jsonl`` alongside for backward compatibility.

Videos: ``log_video(key, path)`` registers an mp4/gif produced by the eval
stack (eval/offline.py grids, runner recordings) into the media dir and
emits ``{key: {"_type": "video-file", "path": ...}}`` in the history, the
same shape wandb.Video rows take.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import numpy as np


def _jsonable(v: Any) -> Any:
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    if hasattr(v, "item") and getattr(v, "ndim", None) == 0:
        return v.item()
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    # Never let one odd metric/config leaf crash the epoch loop: degrade
    # vectors to lists and anything else to its repr (mirrors the
    # json.dump(default=str) behavior used downstream).
    try:
        return float(v)
    except Exception:
        if isinstance(v, np.ndarray):
            return v.tolist()
        if hasattr(v, "tolist"):
            try:
                return v.tolist()
            except Exception:
                pass
        return str(v)


class Tracker:
    def log(self, data: Dict[str, Any], step: Optional[int] = None) -> None:
        raise NotImplementedError

    def log_video(self, key: str, path: str, step: Optional[int] = None) -> None:
        pass

    def finish(self) -> None:
        pass


class OfflineRunTracker(Tracker):
    """wandb-workalike run directory (no external dependency)."""

    def __init__(
        self,
        output_dir: str,
        config: Optional[Dict[str, Any]] = None,
        name: Optional[str] = None,
        project: Optional[str] = None,
    ):
        self.run_dir = os.path.join(output_dir, "tracker")
        self.media_dir = os.path.join(self.run_dir, "media")
        os.makedirs(self.media_dir, exist_ok=True)
        meta = {"name": name, "project": project}
        if config is not None:
            meta["config"] = _jsonable(config)
        with open(os.path.join(self.run_dir, "config.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
        self._hist = open(
            os.path.join(self.run_dir, "metrics.jsonl"), "a", buffering=1
        )
        self._summary: Dict[str, Any] = {}

    def log(self, data: Dict[str, Any], step: Optional[int] = None) -> None:
        rec = {k: _jsonable(v) for k, v in data.items()}
        if step is not None:
            rec["_step"] = int(step)
        self._hist.write(json.dumps(rec, default=str) + "\n")
        self._summary.update(rec)
        with open(os.path.join(self.run_dir, "summary.json"), "w") as f:
            json.dump(self._summary, f, indent=2, default=str)

    def log_video(self, key: str, path: str, step: Optional[int] = None) -> None:
        if not os.path.exists(path):
            return
        base = f"{step if step is not None else 0}_{key.replace('/', '_')}" + (
            os.path.splitext(path)[1]
        )
        dst = os.path.join(self.media_dir, base)
        shutil.copyfile(path, dst)
        self.log(
            {key: {"_type": "video-file", "path": os.path.relpath(dst, self.run_dir)}},
            step=step,
        )

    def finish(self) -> None:
        self._hist.close()


class WandbTracker(Tracker):
    def __init__(self, output_dir: str, config=None, name=None, project=None,
                 mode: str = "offline"):
        import wandb  # gated: caller checks availability

        self._wandb = wandb
        self.run = wandb.init(
            dir=output_dir, config=_jsonable(config) if config else None,
            name=name, project=project, mode=mode,
        )

    def log(self, data, step=None):
        self.run.log({k: _jsonable(v) for k, v in data.items()}, step=step)

    def log_video(self, key, path, step=None):
        if os.path.exists(path):
            self.run.log({key: self._wandb.Video(path)}, step=step)

    def finish(self):
        self.run.finish()


class MultiTracker(Tracker):
    def __init__(self, *trackers: Tracker):
        self.trackers = [t for t in trackers if t is not None]

    def log(self, data, step=None):
        for t in self.trackers:
            t.log(data, step=step)

    def log_video(self, key, path, step=None):
        for t in self.trackers:
            t.log_video(key, path, step=step)

    def finish(self):
        for t in self.trackers:
            t.finish()


def build_tracker(
    logging_cfg: Optional[Dict[str, Any]],
    output_dir: str,
    config: Optional[Dict[str, Any]] = None,
) -> Tracker:
    """Resolve the tracker from the config's ``logging`` block
    (reference uva_*.yaml logging: {name, project, mode})."""
    cfg = dict(logging_cfg or {})
    mode = str(cfg.get("mode", "offline"))
    name = cfg.get("name")
    project = cfg.get("project")
    if mode == "disabled":
        return MultiTracker()
    if mode in ("online", "wandb"):
        try:
            return WandbTracker(
                output_dir, config=config, name=name, project=project,
                mode="online",
            )
        except ImportError:
            pass  # fall through to the offline workalike
    try:
        import wandb  # noqa: F401  — prefer real wandb offline when present

        return WandbTracker(
            output_dir, config=config, name=name, project=project, mode="offline"
        )
    except ImportError:
        return OfflineRunTracker(
            output_dir, config=config, name=name, project=project
        )
