"""Checkpoint save/restore + top-k management.

Equivalent of the reference's dill checkpoint payload + TopKCheckpointManager
(workspace/base_workspace.py:33-124, common/checkpoint_util.py:5-60):
a checkpoint carries {mar params, EMA params, optimizer state, step, epoch},
the resolved config, and the fitted normalizer — so checkpoints double as the
deployment format. Storage is orbax (async-capable, TPU-native) plus sidecar
json/npz for cfg and normalizer."""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from unified_video_action_tpu.data.normalizer import LinearNormalizer


_CKPTR: Optional[ocp.StandardCheckpointer] = None
# async saves land in "<path>.tmp" and are renamed into place only after the
# orbax write commits — the previous checkpoint at <path> survives any crash
# mid-save, so resume never sees a partial directory
_PENDING: list = []  # [(tmp_path, final_path)]


def _checkpointer() -> ocp.StandardCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def _finalize_pending() -> None:
    """Rename committed tmp saves into place. Only call after
    wait_until_finished() — the rename is what publishes the checkpoint."""
    while _PENDING:
        tmp, final = _PENDING.pop()
        if not os.path.exists(tmp):
            continue
        # Rename-aside publish: at no instant is there NO checkpoint at
        # either <final> or <final>.old — a crash between the two renames
        # leaves the previous checkpoint recoverable (load_checkpoint falls
        # back to .old/.tmp when <final> is absent).
        old = final + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(final):
            os.replace(final, old)
        os.replace(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old)


def wait_for_checkpoints() -> None:
    """Block until any in-flight async save has committed and been published
    (call at train end and before reading back a just-written checkpoint)."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()
    _finalize_pending()


def save_checkpoint(
    path: str,
    state,
    cfg: Optional[dict] = None,
    normalizer: Optional[LinearNormalizer] = None,
    epoch: int = 0,
    blocking: bool = True,
) -> None:
    """Write a checkpoint; with ``blocking=False`` the orbax array write runs
    in the background (the reference saves in a thread,
    base_workspace.py:65-69 — here orbax's async machinery does it with
    device-buffer snapshotting, so the train loop continues immediately).
    Either way the write goes to a temp directory and is renamed into place
    only once fully committed, so the previous checkpoint at ``path`` is
    never destroyed by a crash mid-save."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    # a previous async save may still hold a directory; publish it first
    ckptr.wait_until_finished()
    _finalize_pending()
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    payload = {
        "step": state.step,
        "mar_params": state.mar_params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
        # frozen VAE params travel with the checkpoint so eval does not
        # depend on the autoencoder_path file still existing (the reference
        # similarly embeds everything needed in the ckpt, eval_sim.py:29-47)
        "vae_params": state.vae_params,
    }
    # Materialize leaf-wise on host BEFORE handing to orbax: orbax's own
    # async D2H issues large monolithic transfers that collapse through the
    # axon host link (measured: 113 MB moves at ~19 MB/s vs ~600 MB/s for
    # MB-sized buffers) and contend with training dispatches for the whole
    # drain — a ~1.8 GB train state stalled epochs for tens of minutes.
    # Leaf-wise fetches stay in the fast regime (seconds), and the
    # background orbax write then touches only host memory + disk.
    payload = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), payload)
    ckptr.save(os.path.join(tmp, "state"), payload)
    meta = {"epoch": int(epoch), "step": int(jax.device_get(state.step))}
    if cfg is not None:
        meta["cfg"] = cfg
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    if normalizer is not None:
        normalizer.save(os.path.join(tmp, "normalizer.npz"))
    _PENDING.append((tmp, path))
    if blocking:
        ckptr.wait_until_finished()
        _finalize_pending()


def load_checkpoint(path: str, state):
    """Restore into an existing state template; returns (state, meta, normalizer)."""
    wait_for_checkpoints()  # the path may have an async save in flight
    path = os.path.abspath(path)
    if not os.path.exists(path):
        # crash mid-publish: fall back to the rename-aside survivor
        for cand in (path + ".old", path + ".tmp"):
            if os.path.exists(cand):
                path = cand
                break
    ckptr = ocp.StandardCheckpointer()
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    norm_path = os.path.join(path, "normalizer.npz")
    normalizer = LinearNormalizer.load(norm_path) if os.path.exists(norm_path) else None
    if meta.get("slim"):
        # Deployment export (scripts/export_flagship.py): EMA weights +
        # frozen VAE only — no optimizer moments, no raw params. Loadable
        # for eval/serving; resuming *training* from a slim export restarts
        # the optimizer from init (the step counter is preserved for
        # provenance, not schedule continuity).
        import jax.numpy as jnp

        restored = ckptr.restore(os.path.join(path, "state"))
        ema = restored.get("ema_params") or restored["mar_params"]
        as_jax = lambda t: jax.tree.map(jnp.asarray, t)
        state = state.replace(
            step=jnp.asarray(restored.get("step", 0)),
            mar_params=as_jax(ema),
            ema_params=as_jax(ema),
            vae_params=(
                as_jax(restored["vae_params"])
                if "vae_params" in restored
                else state.vae_params
            ),
        )
        return state, meta, normalizer
    template = {
        "step": state.step,
        "mar_params": state.mar_params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
        "vae_params": state.vae_params,
    }
    try:
        restored = ckptr.restore(os.path.join(path, "state"), template)
    except Exception as first_err:
        # pre-round-3 checkpoints have no vae_params item; anything else
        # (shape mismatch, truncated orbax dir) must surface the ORIGINAL
        # error, not a confusing second failure from the retry
        template.pop("vae_params")
        try:
            restored = ckptr.restore(os.path.join(path, "state"), template)
        except Exception:
            raise first_err
    state = state.replace(
        step=restored["step"],
        mar_params=restored["mar_params"],
        ema_params=restored["ema_params"],
        opt_state=restored["opt_state"],
        vae_params=restored.get("vae_params", state.vae_params),
    )
    return state, meta, normalizer


class TopKCheckpointManager:
    """Keep the k best checkpoints by a monitored metric (reference
    common/checkpoint_util.py semantics: mode max/min, formatted names)."""

    def __init__(
        self,
        save_dir: str,
        monitor_key: str,
        mode: str = "max",
        k: int = 1,
        format_str: str = "epoch={epoch:04d}-{monitor:.3f}",
    ):
        assert mode in ("max", "min")
        self.save_dir = save_dir
        self.monitor_key = monitor_key
        self.mode = mode
        self.k = k
        self.format_str = format_str
        self.kept: Dict[str, float] = {}

    def get_ckpt_path(self, data: Dict[str, Any]) -> Optional[str]:
        if self.k <= 0 or self.monitor_key not in data:
            return None
        value = float(data[self.monitor_key])
        name = self.format_str.format(**data)
        path = os.path.join(self.save_dir, name)
        if len(self.kept) < self.k:
            self.kept[path] = value
            return path
        sorted_kept = sorted(
            self.kept.items(), key=lambda kv: kv[1], reverse=(self.mode == "min")
        )
        worst_path, worst_val = sorted_kept[0]
        better = value > worst_val if self.mode == "max" else value < worst_val
        if not better:
            return None
        del self.kept[worst_path]
        if os.path.exists(worst_path):
            shutil.rmtree(worst_path, ignore_errors=True)
        self.kept[path] = value
        return path


class JsonLogger:
    """Line-buffered jsonl metric logger (offline-friendly wandb stand-in)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def log(self, data: Dict[str, Any], step: Optional[int] = None) -> None:
        rec = {
            k: (float(v) if isinstance(v, (int, float, np.floating)) or hasattr(v, "item") else v)
            for k, v in data.items()
        }
        if step is not None:
            rec["_step"] = int(step)
        self._f.write(json.dumps(rec, default=float) + "\n")

    def close(self):
        self._f.close()
