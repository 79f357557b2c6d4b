"""Robomimic-format dataset (toolhang et al.).

Equivalent of the reference's ``RobomimicReplayImageDataset``
(dataset/robomimic_replay_image_dataset.py:36-412): ingest a robomimic hdf5
(``data/demo_N/{obs/<key>, actions}``) into a replay buffer, convert absolute
actions' axis-angle rotation to rot6d (10-D actions: pos3 + rot6d + gripper),
fit per-key normalizers (pos range-only, quat/gripper identity-style, abs-
action scheme), and sample horizon windows with the standard train/val episode
split. The reference's Jpeg2k-zarr caching layer maps onto this framework's
HDF5 replay store (data/replay_buffer.py).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

from unified_video_action_tpu.data.normalizer import (
    LinearNormalizer,
    NormalizerField,
    fit_field,
)
from unified_video_action_tpu.data.replay_buffer import ReplayBuffer
from unified_video_action_tpu.data.sampler import (
    SequenceSampler,
    downsample_mask,
    get_val_mask,
)
from unified_video_action_tpu.utils.rotation import RotationTransformer


def convert_robomimic_actions(
    raw_actions: np.ndarray, abs_action: bool = True
) -> np.ndarray:
    """(N, 7) [pos3, axis_angle3, gripper1] -> (N, 10) [pos3, rot6d, gripper]
    when abs_action (reference _convert_actions, :241-260)."""
    if not abs_action:
        return raw_actions.astype(np.float32)
    tf = RotationTransformer("axis_angle", "rotation_6d")
    is_dual = raw_actions.shape[-1] == 14
    acts = raw_actions.reshape(-1, 2, 7) if is_dual else raw_actions[:, None]
    pos, rot, grip = acts[..., :3], acts[..., 3:6], acts[..., 6:]
    rot6 = tf.forward(rot)
    out = np.concatenate([pos, rot6, grip], axis=-1).astype(np.float32)
    return out.reshape(raw_actions.shape[0], -1)


def load_robomimic_hdf5(
    path: str,
    obs_keys: Sequence[str],
    abs_action: bool = True,
    image_keys: Sequence[str] = (),
) -> ReplayBuffer:
    """Read all demos into a ReplayBuffer (keys: each obs key + 'action')."""
    assert h5py is not None
    buffer = ReplayBuffer.create_empty()
    with h5py.File(path, "r") as f:
        demos = sorted(f["data"].keys(), key=lambda s: int(s.split("_")[1]))
        for demo in demos:
            g = f["data"][demo]
            episode: Dict[str, np.ndarray] = {}
            for k in obs_keys:
                arr = g["obs"][k][:]
                if k in image_keys and arr.dtype != np.uint8:
                    arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
                episode[k] = arr
            episode["action"] = convert_robomimic_actions(
                g["actions"][:], abs_action=abs_action
            )
            buffer.add_episode(episode)
    return buffer


class RobomimicReplayImageDataset:
    def __init__(
        self,
        dataset_path: str,
        shape_meta: dict,
        horizon: int = 32,
        pad_before: int = 0,
        pad_after: int = 0,
        n_obs_steps: Optional[int] = None,
        abs_action: bool = True,
        seed: int = 42,
        val_ratio: float = 0.0,
        max_train_episodes: Optional[int] = None,
        normalizer_type: str = "all",
        **kwargs,
    ):
        obs_meta = shape_meta["obs"]
        self.rgb_keys = [k for k, v in obs_meta.items() if v.get("type") == "rgb"]
        self.lowdim_keys = [
            k for k, v in obs_meta.items() if v.get("type") == "low_dim"
        ]
        self.replay_buffer = load_robomimic_hdf5(
            dataset_path,
            obs_keys=self.rgb_keys + self.lowdim_keys,
            abs_action=abs_action,
            image_keys=self.rgb_keys,
        )
        val_mask = get_val_mask(self.replay_buffer.n_episodes, val_ratio, seed)
        train_mask = downsample_mask(~val_mask, max_train_episodes, seed)
        self.sampler = SequenceSampler(
            self.replay_buffer,
            sequence_length=horizon,
            pad_before=pad_before,
            pad_after=pad_after,
            episode_mask=train_mask,
        )
        self.horizon = horizon
        self.pad_before, self.pad_after = pad_before, pad_after
        self.train_mask, self.val_mask = train_mask, val_mask
        self.abs_action = abs_action
        self.n_obs_steps = n_obs_steps
        self.normalizer_type = normalizer_type

    def get_validation_dataset(self) -> "RobomimicReplayImageDataset":
        val = object.__new__(RobomimicReplayImageDataset)
        val.__dict__.update(self.__dict__)
        val.sampler = SequenceSampler(
            self.replay_buffer,
            sequence_length=self.horizon,
            pad_before=self.pad_before,
            pad_after=self.pad_after,
            episode_mask=self.val_mask,
        )
        val.train_mask = self.val_mask
        return val

    def get_normalizer(self) -> LinearNormalizer:
        """Per-key schemes (reference :159-198): abs-action pos-range-only,
        eef pos range, quats identity, gripper range, images range."""
        n = LinearNormalizer()
        action = self.replay_buffer["action"]
        if self.abs_action:
            n.fields["action"] = _abs_action_normalizer(action)
        else:
            n.fields["action"] = fit_field(action, mode="limits")
        for k in self.lowdim_keys:
            data = self.replay_buffer[k]
            if "pos" in k or "qpos" in k or "width" in k:
                n.fields[k] = fit_field(data, mode="limits")
            else:  # quaternions and other unit-norm features stay raw
                n.fields[k] = NormalizerField.identity(data.shape[-1])
        for k in self.rgb_keys:
            n.fields[k] = NormalizerField.image_range()
        return n

    def __len__(self) -> int:
        return len(self.sampler)

    def __getitem__(self, idx: int) -> Dict:
        sample = self.sampler.sample_sequence(idx)
        T = self.horizon
        n_obs = self.n_obs_steps or T
        obs: Dict[str, np.ndarray] = {}
        for k in self.rgb_keys:
            img = sample[k].astype(np.float32) / 255.0
            obs[k] = np.moveaxis(img, -1, 1)  # (T, C, H, W)
        for k in self.lowdim_keys:
            obs[k] = sample[k].astype(np.float32)
        return {"obs": obs, "action": sample["action"].astype(np.float32)}

    def undo_transform_action(self, action: np.ndarray) -> np.ndarray:
        """rot6d abs actions back to axis-angle for the env
        (reference robomimic_image_runner.py:368-385)."""
        if not self.abs_action:
            return action
        tf = RotationTransformer("axis_angle", "rotation_6d")
        d = action.shape[-1]
        is_dual = d == 20
        a = action.reshape(*action.shape[:-1], 2, 10) if is_dual else action[..., None, :]
        pos, rot6, grip = a[..., :3], a[..., 3:9], a[..., 9:]
        rot = tf.inverse(rot6)
        out = np.concatenate([pos, rot, grip], axis=-1)
        return out.reshape(*action.shape[:-1], -1)


def _abs_action_normalizer(action: np.ndarray) -> NormalizerField:
    """Position dims range-normalized, rotation dims identity, gripper range
    (reference robomimic_abs_action scheme, common/normalize_util.py)."""
    d = action.shape[-1]
    scale = np.ones(d, np.float32)
    offset = np.zeros(d, np.float32)
    stats = {
        "min": action.min(axis=0),
        "max": action.max(axis=0),
        "mean": action.mean(axis=0),
        "std": action.std(axis=0),
    }
    n_arm = 2 if d == 20 else 1
    per = d // n_arm
    for arm in range(n_arm):
        base = arm * per
        for dims in (slice(base, base + 3), slice(base + 9, base + per)):
            lo = action[:, dims].min(axis=0)
            hi = action[:, dims].max(axis=0)
            rng = np.maximum(hi - lo, 1e-4)
            scale[dims] = 2.0 / rng
            offset[dims] = -1.0 - scale[dims] * lo
    return NormalizerField(scale=scale, offset=offset, input_stats=stats)
