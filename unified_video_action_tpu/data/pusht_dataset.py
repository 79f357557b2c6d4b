"""PushT image dataset.

Equivalent of the reference's ``PushTImageDataset``
(dataset/pusht_image_dataset.py:19-146): horizon-32 sequences from a replay
buffer of (img, state, action), limits-fit normalizers for action/agent_pos,
video-consistent augmentation (per-sample seeded random crop 95% → resize →
gaussian blur), and a seeded train/val episode split.

Two data sources:
* ``dataset_path`` — an HDF5 replay buffer (convert the reference's zarr with
  scripts/convert_zarr_dataset.py on a machine that has zarr).
* ``synthetic: N`` — N scripted-policy episodes rolled out in this framework's
  own PushT env (tests/demo; no external data needed).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

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


class PushTImageDataset:
    def __init__(
        self,
        dataset_path: str,
        horizon: int = 32,
        pad_before: int = 0,
        pad_after: int = 0,
        seed: int = 42,
        val_ratio: float = 0.0,
        max_train_episodes: Optional[int] = None,
        data_aug: bool = False,
        normalizer_type: str = "all",
        synthetic: Optional[int] = None,
        agent_pos_dim: int = 2,   # 14 for the human_pp keypoint variant
        **kwargs,
    ):
        self.agent_pos_dim = agent_pos_dim
        if synthetic is not None:
            self.replay_buffer = make_synthetic_pusht(
                n_episodes=synthetic, seed=seed, agent_pos_dim=agent_pos_dim
            )
        else:
            assert os.path.exists(dataset_path), dataset_path
            self.replay_buffer = ReplayBuffer.load(
                dataset_path, keys=["img", "state", "action"]
            )

        val_mask = get_val_mask(
            n_episodes=self.replay_buffer.n_episodes, val_ratio=val_ratio, seed=seed
        )
        train_mask = ~val_mask
        train_mask = downsample_mask(train_mask, max_train_episodes, seed=seed)

        self.sampler = SequenceSampler(
            self.replay_buffer,
            sequence_length=horizon,
            pad_before=pad_before,
            pad_after=pad_after,
            episode_mask=train_mask,
        )
        self.train_mask = train_mask
        self.val_mask = val_mask
        self.horizon = horizon
        self.pad_before = pad_before
        self.pad_after = pad_after
        self.data_aug = data_aug
        self.device_aug = bool(kwargs.get("device_aug", True))
        self.normalizer_type = normalizer_type
        self.seed = seed

    def get_validation_dataset(self) -> "PushTImageDataset":
        val = object.__new__(PushTImageDataset)
        val.__dict__.update(self.__dict__)
        val.sampler = SequenceSampler(
            self.replay_buffer,
            sequence_length=self.horizon,
            pad_before=self.pad_before,
            pad_after=self.pad_after,
            episode_mask=self.val_mask,
        )
        val.train_mask = self.val_mask
        val.data_aug = False
        return val

    def get_normalizer(self) -> LinearNormalizer:
        n = LinearNormalizer()
        n.fit(
            {
                "action": self.replay_buffer["action"],
                "agent_pos": self.replay_buffer["state"][..., : self.agent_pos_dim],
            },
            last_n_dims=1,
            mode="limits",
        )
        n.fields["image"] = NormalizerField.image_range()
        return n

    def __len__(self) -> int:
        return len(self.sampler)

    def __getitem__(self, idx: int) -> Dict:
        sample = self.sampler.sample_sequence(idx)
        agent_pos = sample["state"][:, : self.agent_pos_dim].astype(np.float32)
        # images stay native uint8 through collate + H2D (4x narrower than
        # float32, no host-side divide); every device consumer normalizes via
        # image_util.to_unit_float
        image = np.ascontiguousarray(np.moveaxis(sample["img"], -1, 1))

        # data_aug is applied ON DEVICE inside the train step (the workspace
        # draws per-sample crop/blur params and compute_loss applies
        # image_util.augment_video) — see device_aug; the cv2 path below is
        # kept for hosts that prefer CPU aug (device_aug=False)
        if self.data_aug and not self.device_aug:
            image = self._augment(image, idx)

        return {
            "obs": {"image": image, "agent_pos": agent_pos},
            "action": sample["action"].astype(np.float32),
        }

    def _augment(self, video: np.ndarray, idx: int) -> np.ndarray:
        """Video-consistent aug: one seeded crop/blur for the whole clip
        (reference pusht_image_dataset.py:93-130)."""
        if cv2 is None:
            return video
        rng = np.random.default_rng((self.seed, idx))
        T, C, H, W = video.shape
        ch, cw = int(H * 0.95), int(W * 0.95)
        top = rng.integers(0, H - ch + 1)
        left = rng.integers(0, W - cw + 1)
        sigma = float(rng.uniform(0.1, 2.0))
        out = np.empty_like(video)
        for t in range(T):
            frame = np.moveaxis(video[t], 0, -1)
            crop = frame[top : top + ch, left : left + cw]
            resized = cv2.resize(crop, (W, H), interpolation=cv2.INTER_LINEAR)
            blurred = cv2.GaussianBlur(resized, (5, 5), sigmaX=sigma)
            out[t] = np.moveaxis(blurred, -1, 0)
        return out


def make_synthetic_pusht(
    n_episodes: int = 8,
    max_steps: int = 60,
    seed: int = 42,
    render_size: int = 96,
    agent_pos_dim: int = 2,
) -> ReplayBuffer:
    """Roll out a scripted pusher in the framework's own PushT env to build a
    small replay buffer (test/demo stand-in for the reference's
    pusht_cchi_v7_replay data).

    ``agent_pos_dim > 2`` fabricates the human_pp keypoint variant: the 2-D
    agent/action tracks expand to K = agent_pos_dim // 2 keypoints (agent
    position plus fixed in-plane offsets), matching the reference's 14-wide
    hand-keypoint action space (dataset/human_image_dataset.py)."""
    from unified_video_action_tpu.envs.pusht import PushTEnv

    buffer = ReplayBuffer.create_empty()
    rng = np.random.default_rng(seed)
    for ep in range(n_episodes):
        env = PushTEnv(render_size=render_size, render_action=False)
        env.seed(int(rng.integers(0, 10_000)))
        env.reset()
        imgs, states, actions = [], [], []
        goal = env.goal_pose[:2]
        for t in range(max_steps):
            block = np.asarray(env.block.position)
            agent = np.asarray(env.agent.position)
            # scripted: push the block toward the goal from the far side
            push_dir = goal - block
            push_dir = push_dir / (np.linalg.norm(push_dir) + 1e-6)
            target = block - push_dir * 40 + rng.normal(0, 4, 2)
            action = np.clip(agent + (target - agent) * 0.5, 10, 500)
            states.append(np.concatenate([agent, block, [env.block.angle]]))
            imgs.append(env.render("rgb_array"))
            actions.append(action)
            _, _, done, _, _ = env.step(action)
            if done:
                break
        state_arr = np.asarray(states, dtype=np.float32)
        action_arr = np.asarray(actions, dtype=np.float32)
        if agent_pos_dim > 2:
            k = agent_pos_dim // 2
            offs = rng.uniform(-20, 20, (1, k, 2)).astype(np.float32)

            def expand(xy):
                pts = xy[:, None, :] + offs  # (T, K, 2) keypoints
                return np.clip(pts, 0, 511).reshape(len(xy), 2 * k)
            action_arr = expand(action_arr)
            state_arr = np.concatenate(
                [expand(state_arr[:, :2]), state_arr[:, 2:]], axis=1
            )
        buffer.add_episode(
            {
                "img": np.asarray(imgs, dtype=np.uint8),
                "state": state_arr,
                "action": action_arr,
            }
        )
    return buffer
