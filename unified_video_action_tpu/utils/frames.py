"""Frame-index selection for training/eval clips.

Equivalent of the reference's ``select_frames`` + the precomputed
``combinations_with_replacement`` history-frequency table
(utils/data_utils.py:14-16,140-158): a 32-frame clip yields 8 training frames
(4 conditioning + 4 target) at stride T/8, or 4 eval frames at stride T/4;
``different_history_freq`` replaces the 4 history indices with a random
non-decreasing 4-tuple from [0, 15] ending at 15.

Index selection happens on host (numpy) — indices feed a device-side gather.
"""

from __future__ import annotations

from itertools import combinations_with_replacement
from typing import Optional, Tuple

import numpy as np

# all non-decreasing 4-tuples over 0..15 ending at 15 (reference table)
HISTORY_COMBINATIONS = np.array(
    [c for c in combinations_with_replacement(range(16), 4) if c[-1] == 15],
    dtype=np.int64,
)


def select_frame_indices(
    total_frames: int,
    eval: bool = False,
    select_timesteps: int = 4,
    different_history_freq: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    if eval:
        idx = (
            np.arange(0, total_frames, total_frames // select_timesteps)
            + select_timesteps
            - 1
        )
    else:
        idx = (
            np.arange(0, total_frames, total_frames // (select_timesteps * 2))
            + select_timesteps
            - 1
        )
        if different_history_freq:
            rng = rng or np.random.default_rng()
            hist = HISTORY_COMBINATIONS[rng.integers(len(HISTORY_COMBINATIONS))]
            idx = np.concatenate([hist, idx[len(idx) // 2 :]])
    return idx.astype(np.int64)


def split_trajectory(
    actions: np.ndarray,
    total_frames: int,
    shift_action: bool,
    use_history_action: bool = False,
) -> Tuple[Optional[np.ndarray], np.ndarray]:
    """History/future action split (reference get_trajectory,
    data_utils.py:368-388). ``actions``: (B, T, A)."""
    T = total_frames
    if use_history_action:
        if shift_action:
            history = actions[:, : T // 2]
            future = actions[:, T // 2 : -1]
        else:
            trimmed = actions[:, 1:]
            half = trimmed.shape[1] // 2
            history, future = trimmed[:, :half], trimmed[:, half:]
        return history, future
    if shift_action:
        return None, actions[:, T // 2 - 1 : -1]
    half = actions.shape[1] // 2
    return None, actions[:, half:]
