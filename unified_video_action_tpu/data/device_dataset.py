"""Device-resident replay dataset.

TPU-first input path for small replay datasets (PushT-scale): the whole
uint8 frame store plus the action/state tracks live in HBM, and per train
step the host ships only a batch of int32 sample indices (+ the 8-frame
selection and 3 augmentation scalars per sample). This removes the host
DataLoader, the per-step H2D image transfer, and all host-side gather work —
the dominant costs on a 1-vCPU host feeding a tunneled chip (see PERF.md
round 3). The reference has no equivalent component; its DataLoader workers
re-read and collate every batch on host (dataset/pusht_image_dataset.py:19-146).

The per-sample window gather (``window_index_table``) replicates
``SequenceSampler``'s edge-replication padding exactly (reference
common/sampler.py:142-182), so a device gather of ``table[idx]`` equals
``sampler.sample_sequence(idx)`` — pinned in tests/test_device_dataset.py.

Opt-in via ``dataloader.device_resident: true``; the workspace falls back to
the host loader when the store exceeds the HBM budget.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unified_video_action_tpu.parallel import mesh as mesh_lib

__all__ = [
    "DeviceLiberoDataset",
    "DeviceReplayDataset",
    "make_device_dataset",
    "window_index_table",
]


def window_index_table(sampler) -> np.ndarray:
    """(n_samples, sequence_length) absolute buffer indices per sample.

    Row ``i`` lists the replay-buffer step index for every slot of sample
    ``i``'s horizon window, with out-of-episode slots clamped to the episode
    edge — numerically identical to SequenceSampler.sample_sequence's
    edge-replication padding.
    """
    L = int(sampler.sequence_length)
    n = len(sampler.indices)
    table = np.empty((n, L), dtype=np.int32)
    for i, (bs, be, ss, se) in enumerate(sampler.indices):
        bs, be, ss, se = int(bs), int(be), int(ss), int(se)
        row = table[i]
        row[:ss] = bs
        row[ss:se] = np.arange(bs, be, dtype=np.int32)
        row[se:] = be - 1
    return table


class DeviceLiberoDataset:
    """Device-resident store for LIBERO-layout language-conditioned replay
    datasets (data/libero_dataset.py) — the kitchen-suite training input path.

    The training loss consumes exactly three leaves from a libero batch
    (policy/policy.py compute_loss): the main rgb track, the full-horizon
    action window, and the per-episode CLIP text latent. All three live in
    HBM; per step the host ships only sample indices + the 8-frame selection,
    same contract as :class:`DeviceReplayDataset`. Low-dim obs and language
    tokens are train-loss-inert for this task family and stay host-side (the
    val/rollout paths use the host loader). The reference streams full
    float32 horizons through its DataLoader workers every step
    (libero_replay_image_dataset.py:315-439).
    """

    def __init__(self, dataset, max_bytes: Optional[int] = None):
        rb = dataset.replay_buffer
        img_key = dataset.rgb_keys[0]
        img = np.asarray(rb[img_key])        # (N, H, W, C) uint8
        action = np.asarray(rb["action"]).astype(np.float32)
        table = window_index_table(dataset.sampler)
        if dataset.episode_latents is None:
            raise ValueError(
                "device-resident libero store needs "
                "task.dataset.emit_language_latents=true"
            )
        latents = np.asarray(dataset.episode_latents, dtype=np.float32)
        # per-sample episode row for the text-latent lookup — same
        # searchsorted the host __getitem__ uses
        starts = np.asarray(
            [int(idx[0]) for idx in dataset.sampler.indices], dtype=np.int64
        )
        ep_of_sample = np.searchsorted(
            rb.episode_ends, starts, side="right"
        ).astype(np.int32)

        nbytes = (
            img.nbytes + action.nbytes + table.nbytes
            + latents.nbytes + ep_of_sample.nbytes
        )
        if max_bytes is not None and nbytes > max_bytes:
            raise ValueError(
                f"device-resident store ({nbytes/1e9:.2f} GB) exceeds the "
                f"HBM budget ({max_bytes/1e9:.2f} GB)"
            )
        self.nbytes = nbytes
        self.horizon = int(dataset.horizon)
        self.img_key = img_key
        self.data_aug = False  # kitchen recipe ships raw uint8 (no host jitter)

        self.img = jax.device_put(img)
        self.action = jax.device_put(action)
        self.table = jax.device_put(table)
        self.latents = jax.device_put(latents)
        self.ep_of_sample = jax.device_put(ep_of_sample)
        self._n = table.shape[0]

    def __len__(self) -> int:
        return self._n

    # resident arrays are traced arguments, not closed-over constants — see
    # the NOTE on DeviceReplayDataset._gather
    @staticmethod
    @jax.jit
    def _gather(
        img: jnp.ndarray,            # (N, H, W, C) uint8 resident store
        action: jnp.ndarray,         # (N, Da) float32
        table: jnp.ndarray,          # (n_samples, L) int32
        latents: jnp.ndarray,        # (n_episodes, D) float32
        ep_of_sample: jnp.ndarray,   # (n_samples,) int32
        idxs: jnp.ndarray,           # (B,) int32
        frame_indices: jnp.ndarray,  # (F,) int32
    ):
        rows = table[idxs]                       # (B, L)
        img_rows = rows[:, frame_indices]        # (B, F)
        image = jnp.transpose(img[img_rows], (0, 1, 4, 2, 3))  # uint8 BFCHW
        return {
            "image": image,
            "action": action[rows],
            "language_latents": latents[ep_of_sample[idxs]],
        }

    def gather(
        self,
        idxs: np.ndarray,
        frame_indices: Optional[np.ndarray] = None,
        aug: Optional[Dict[str, np.ndarray]] = None,
        mesh=None,
    ) -> Dict[str, Any]:
        idxs = np.asarray(idxs, dtype=np.int32)
        if frame_indices is None:
            frame_indices = np.arange(self.horizon, dtype=np.int32)
        frame_indices = np.asarray(frame_indices, dtype=np.int32)
        out = self._gather(
            self.img, self.action, self.table, self.latents,
            self.ep_of_sample, idxs, frame_indices,
        )
        batch = {
            "obs": {self.img_key: out["image"]},
            "action": out["action"],
            "language_latents": out["language_latents"],
        }
        if mesh is not None and mesh.size > 1:
            batch = jax.device_put(batch, mesh_lib.batch_sharding(mesh))
        return batch


def make_device_dataset(dataset):
    """Device-resident store matching the dataset family: LIBERO-layout
    datasets (rgb_keys + per-episode text latents) get the language-
    conditioned store, PushT-style replay datasets the img/state/action one."""
    if hasattr(dataset, "rgb_keys"):
        return DeviceLiberoDataset(dataset)
    return DeviceReplayDataset(dataset)


class DeviceReplayDataset:
    """Replay buffer + sample-window table resident in device memory.

    Parameters
    ----------
    dataset:
        A PushT-style image dataset exposing ``replay_buffer`` (keys img /
        state / action), ``sampler``, ``horizon``, ``agent_pos_dim``,
        ``data_aug`` / ``device_aug``.
    max_bytes:
        HBM budget guard; raises ValueError instead of uploading when the
        resident store would exceed it.
    """

    def __init__(self, dataset, max_bytes: Optional[int] = None):
        rb = dataset.replay_buffer
        img = np.asarray(rb["img"])          # (N, H, W, C) uint8
        state = np.asarray(rb["state"]).astype(np.float32)
        action = np.asarray(rb["action"]).astype(np.float32)
        table = window_index_table(dataset.sampler)

        nbytes = img.nbytes + state.nbytes + action.nbytes + table.nbytes
        if max_bytes is not None and nbytes > max_bytes:
            raise ValueError(
                f"device-resident store ({nbytes/1e9:.2f} GB) exceeds the "
                f"HBM budget ({max_bytes/1e9:.2f} GB)"
            )
        self.nbytes = nbytes
        self.horizon = int(dataset.horizon)
        self.agent_pos_dim = int(getattr(dataset, "agent_pos_dim", 2))
        self.data_aug = bool(
            getattr(dataset, "data_aug", False)
            and getattr(dataset, "device_aug", True)
        )

        self.img = jax.device_put(img)
        self.state = jax.device_put(state)
        self.action = jax.device_put(action)
        self.table = jax.device_put(table)
        self._n = table.shape[0]

    def __len__(self) -> int:
        return self._n

    # NOTE: the resident arrays are TRACED arguments, never closed-over
    # constants — a `self`-static jit would bake the full frame store into
    # the HLO as a literal, which the axon remote-compile tunnel rejects
    # outright (HTTP 413 on a 0.69 GB request body) and which would bloat
    # any executable cache. Passing them as args keeps the compiled program
    # small and reuses the already-device-resident buffers by reference.
    @staticmethod
    @partial(jax.jit, static_argnames=("agent_pos_dim", "data_aug"))
    def _gather(
        img: jnp.ndarray,         # (N, H, W, C) uint8 resident store
        state: jnp.ndarray,       # (N, Ds) float32
        action: jnp.ndarray,      # (N, Da) float32
        table: jnp.ndarray,       # (n_samples, L) int32 window table
        idxs: jnp.ndarray,        # (B,) int32 sample indices
        frame_indices: jnp.ndarray,  # (F,) int32 horizon slots for images
        aug_top: jnp.ndarray,     # (B,) int32 (zeros when aug unused)
        aug_left: jnp.ndarray,    # (B,) int32
        aug_sigma: jnp.ndarray,   # (B,) float32
        *,
        agent_pos_dim: int,
        data_aug: bool,
    ) -> Dict[str, Any]:
        rows = table[idxs]                            # (B, L)
        img_rows = rows[:, frame_indices]             # (B, F)
        # (B, F, H, W, C) uint8 -> (B, F, C, H, W); stays uint8 through the
        # batch (train_step normalizes via image_util.to_unit_float)
        image = jnp.transpose(img[img_rows], (0, 1, 4, 2, 3))
        obs = {
            "image": image,
            "agent_pos": state[rows][..., :agent_pos_dim],
        }
        if data_aug:
            obs["aug_top"] = aug_top
            obs["aug_left"] = aug_left
            obs["aug_sigma"] = aug_sigma
        return {"obs": obs, "action": action[rows]}

    def gather(
        self,
        idxs: np.ndarray,
        frame_indices: Optional[np.ndarray] = None,
        aug: Optional[Dict[str, np.ndarray]] = None,
        mesh=None,
    ) -> Dict[str, Any]:
        """Fetch a batch entirely on device.

        ``frame_indices`` selects which horizon slots of the image track to
        materialize (None = all); actions/agent_pos always cover the full
        horizon, matching the host ``__getitem__`` + ``prepare`` contract
        (pregathered=True). ``aug`` carries per-sample crop/blur scalars for
        the in-graph augmentation. With a multi-device ``mesh`` the result is
        laid out batch-sharded over the data axis.
        """
        idxs = np.asarray(idxs, dtype=np.int32)
        if frame_indices is None:
            frame_indices = np.arange(self.horizon, dtype=np.int32)
        frame_indices = np.asarray(frame_indices, dtype=np.int32)
        B = idxs.shape[0]
        if aug is None:
            top = np.zeros(B, np.int32)
            left = np.zeros(B, np.int32)
            sigma = np.zeros(B, np.float32)
        else:
            top = aug["aug_top"]
            left = aug["aug_left"]
            sigma = aug["aug_sigma"]
        batch = self._gather(
            self.img, self.state, self.action, self.table,
            idxs, frame_indices, top, left, sigma,
            agent_pos_dim=self.agent_pos_dim, data_aug=self.data_aug,
        )
        if mesh is not None and mesh.size > 1:
            batch = jax.device_put(batch, mesh_lib.batch_sharding(mesh))
        return batch
