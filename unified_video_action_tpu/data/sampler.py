"""Sequence sampler over replay-buffer episodes.

Equivalent of the reference's numba-JIT ``SequenceSampler``
(common/sampler.py:12-182): builds (buffer_start, buffer_end, sample_start,
sample_end) index tuples over episodes with pad_before/pad_after, slices with
edge-replication padding, and provides seeded validation masks. The numba
kernel is init-time only; plain vectorized numpy is equally fast here.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from unified_video_action_tpu.data.replay_buffer import ReplayBuffer


def create_indices(
    episode_ends: np.ndarray,
    sequence_length: int,
    episode_mask: np.ndarray,
    pad_before: int = 0,
    pad_after: int = 0,
) -> np.ndarray:
    pad_before = min(max(pad_before, 0), sequence_length - 1)
    pad_after = min(max(pad_after, 0), sequence_length - 1)
    rows = []
    for i in range(len(episode_ends)):
        if not episode_mask[i]:
            continue
        start_idx = 0 if i == 0 else int(episode_ends[i - 1])
        end_idx = int(episode_ends[i])
        episode_length = end_idx - start_idx
        min_start = -pad_before
        max_start = episode_length - sequence_length + pad_after
        for idx in range(min_start, max_start + 1):
            buffer_start = max(idx, 0) + start_idx
            buffer_end = min(idx + sequence_length, episode_length) + start_idx
            start_offset = buffer_start - (idx + start_idx)
            end_offset = (idx + sequence_length + start_idx) - buffer_end
            sample_start = start_offset
            sample_end = sequence_length - end_offset
            rows.append((buffer_start, buffer_end, sample_start, sample_end))
    return np.asarray(rows, dtype=np.int64).reshape(-1, 4)


def get_val_mask(n_episodes: int, val_ratio: float, seed: int = 0) -> np.ndarray:
    val_mask = np.zeros(n_episodes, dtype=bool)
    if val_ratio <= 0:
        return val_mask
    n_val = min(max(1, round(n_episodes * val_ratio)), n_episodes - 1)
    rng = np.random.default_rng(seed=seed)
    val_idxs = rng.choice(n_episodes, size=n_val, replace=False)
    val_mask[val_idxs] = True
    return val_mask


def downsample_mask(mask: np.ndarray, max_n: Optional[int], seed: int = 0) -> np.ndarray:
    train_mask = mask
    if (max_n is not None) and (mask.sum() > max_n):
        n_train = int(max_n)
        curr_train_idxs = np.nonzero(mask)[0]
        rng = np.random.default_rng(seed=seed)
        train_idxs_idx = rng.choice(len(curr_train_idxs), size=n_train, replace=False)
        train_idxs = curr_train_idxs[train_idxs_idx]
        train_mask = np.zeros_like(mask)
        train_mask[train_idxs] = True
    return train_mask


class SequenceSampler:
    def __init__(
        self,
        replay_buffer: ReplayBuffer,
        sequence_length: int,
        pad_before: int = 0,
        pad_after: int = 0,
        keys=None,
        episode_mask: Optional[np.ndarray] = None,
    ):
        if keys is None:
            keys = list(replay_buffer.keys())
        if episode_mask is None:
            episode_mask = np.ones(replay_buffer.n_episodes, dtype=bool)
        self.indices = (
            create_indices(
                replay_buffer.episode_ends,
                sequence_length=sequence_length,
                pad_before=pad_before,
                pad_after=pad_after,
                episode_mask=episode_mask,
            )
            if episode_mask.any()
            else np.zeros((0, 4), dtype=np.int64)
        )
        self.keys = list(keys)
        self.sequence_length = sequence_length
        self.replay_buffer = replay_buffer

    def __len__(self) -> int:
        return len(self.indices)

    def sample_sequence(self, idx: int) -> Dict[str, np.ndarray]:
        buffer_start, buffer_end, sample_start, sample_end = self.indices[idx]
        result = {}
        for key in self.keys:
            arr = self.replay_buffer[key]
            sample = arr[buffer_start:buffer_end]
            if sample_start > 0 or sample_end < self.sequence_length:
                # edge-replication padding (reference sampler.py:159-174)
                data = np.zeros(
                    (self.sequence_length,) + arr.shape[1:], dtype=arr.dtype
                )
                if sample_start > 0:
                    data[:sample_start] = sample[0]
                if sample_end < self.sequence_length:
                    data[sample_end:] = sample[-1]
                data[sample_start:sample_end] = sample
                result[key] = data
            else:
                result[key] = sample
        return result
