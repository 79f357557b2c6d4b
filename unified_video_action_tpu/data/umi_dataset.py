"""UMI lazy dataset family (the scale training path).

Equivalents of the reference's schema-driven lazy readers
(dataset/base_lazy_dataset.py:19-676, umi_lazy_dataset.py:16-336,
umi_multi_dataset.py:15-183):

* per-episode index pools with starting-percentile windows and a seeded
  train/val episode split;
* per-item gathers at *relative* frame indices (camera at
  range(-12,17,4)·down_sample -> 8 frames; proprioception over the 32-step
  window range(-15,17)), clamp-padded at episode edges;
* optional random history-frame sampling: the 4 history camera frames drawn
  from [-15, 0] with the 4 future frames fixed (umi_lazy_dataset.py:271-287),
  emitting ``img_indices`` consumed by the policy's gather;
* relative-pose processing: pose10d wrt the current frame, actions = last-16
  pose10d+gripper, rot-wrt-(noise-jittered)-episode-start conditioning
  (umi_lazy_dataset.py:107-243);
* optional mirror masking of the fisheye image (draw_predefined_mask
  equivalent);
* ``UmiMultiDataset``: N datasets with a merged index pool and per-dataset
  CLIP language latents.

Storage is the framework's HDF5 replay format (or any dict of arrays); the
reference's /dev/shm-zarr staging maps onto local-SSD HDF5 files.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import numpy as np

from unified_video_action_tpu.data.replay_buffer import ReplayBuffer
from unified_video_action_tpu.utils.pose import (
    convert_pose_mat_rep,
    mat_to_pose10d,
    pose_to_mat,
)

CAMERA_KEY = "camera0_rgb"
PROPRIO_WINDOW = list(range(-15, 17))  # 32 steps around the current frame
CAMERA_INDICES = list(range(-12, 17, 4))  # 8 frames
ACTION_LEN = 32  # full window; the policy halves it with shift_action=False
OBS_LEN = 16


def draw_mirror_mask(img: np.ndarray) -> np.ndarray:
    """Black out the side-mirror regions of the fisheye frame (equivalent of
    umi/common/cv_util.draw_predefined_mask(mirror=True)): two lateral
    quadrilaterals spanning the left/right edges."""
    h, w = img.shape[:2]
    out = img.copy()
    lw = int(w * 0.2)
    top = int(h * 0.25)
    try:
        import cv2

        left = np.array(
            [[0, top], [lw, int(h * 0.4)], [lw, int(h * 0.75)], [0, h - 1]], np.int32
        )
        right = np.array(
            [[w - 1, top], [w - lw, int(h * 0.4)], [w - lw, int(h * 0.75)],
             [w - 1, h - 1]], np.int32
        )
        cv2.fillPoly(out, [left.reshape(-1, 1, 2)], 0)
        cv2.fillPoly(out, [right.reshape(-1, 1, 2)], 0)
    except ImportError:
        out[top:, :lw] = 0
        out[top:, -lw:] = 0
    return out


@dataclasses.dataclass
class UmiLazyDataset:
    """One UMI task's episodes."""

    replay_buffer: ReplayBuffer
    name: str = "umi"
    down_sample_steps: int = 1
    random_img_sampling: bool = False
    mask_mirror: bool = False
    use_relative_pose: bool = True
    start_pose_noise: float = 0.05
    val_ratio: float = 0.05
    seed: int = 42
    split: str = "train"
    starting_percentile_low: float = 0.0
    starting_percentile_high: float = 1.0

    def __post_init__(self):
        # Per-item randomness (history sampling, start-pose jitter) is drawn
        # from a rng keyed on (seed, epoch, item index) — identical for any
        # worker count or worker model, unlike the reference's per-worker
        # torch seeds. ``set_epoch`` refreshes the jitter each epoch.
        self.epoch = 0
        ends = self.replay_buffer.episode_ends
        starts = np.concatenate([[0], ends[:-1]])
        self.episode_starts = starts
        self.episode_lengths = ends - starts

        n_ep = self.replay_buffer.n_episodes
        rng = np.random.default_rng(self.seed)
        val = np.zeros(n_ep, dtype=bool)
        n_val = int(round(n_ep * self.val_ratio))
        if n_val > 0:
            val[rng.choice(n_ep, size=n_val, replace=False)] = True
        use = ~val if self.split == "train" else val

        # index pool: (episode, frame) pairs within a starting-percentile window
        pool = []
        for ep in range(n_ep):
            if not use[ep]:
                continue
            L = int(self.episode_lengths[ep])
            lo = int(L * self.starting_percentile_low)
            hi = int(L * self.starting_percentile_high)
            for t in range(lo, hi):
                pool.append((ep, t))
        self.index_pool = np.asarray(pool, dtype=np.int64).reshape(-1, 2)

    def __len__(self) -> int:
        return len(self.index_pool)

    def split_val(self) -> "UmiLazyDataset":
        return dataclasses.replace(self, split="val")

    # BaseImageDataset surface name (reference dataset/base_dataset.py:7-76)
    def get_validation_dataset(self) -> "UmiLazyDataset":
        return self.split_val()

    def _gather(self, key: str, ep: int, t: int, rel_indices: Sequence[int]):
        L = int(self.episode_lengths[ep])
        start = int(self.episode_starts[ep])
        idx = [min(max(t + i, 0), L - 1) + start for i in rel_indices]
        arr = self.replay_buffer[key]
        return np.asarray([arr[i] for i in idx])

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __getitem__(self, idx: int) -> Dict:
        ep, t = self.index_pool[idx]
        d = self.down_sample_steps
        item_rng = np.random.default_rng((self.seed, self.epoch, int(idx)))

        cam_rel = [i * d for i in CAMERA_INDICES]
        if self.random_img_sampling:
            hist = sorted(
                item_rng.choice(np.arange(-15, 1), size=4, replace=False) * d
            )
            cam_rel = list(hist) + cam_rel[4:]
        img_indices = (np.asarray(cam_rel, np.float64) / d + 15).astype(np.int32)

        frames = self._gather(CAMERA_KEY, ep, t, cam_rel)
        if self.mask_mirror:
            frames = np.asarray([draw_mirror_mask(f) for f in frames])

        prop_rel = [i * d for i in PROPRIO_WINDOW]
        pos = self._gather("robot0_eef_pos", ep, t, prop_rel)
        rot = self._gather("robot0_eef_rot_axis_angle", ep, t, prop_rel)
        grip = self._gather("robot0_gripper_width", ep, t, prop_rel)

        pose_mat = pose_to_mat(np.concatenate([pos, rot], axis=-1))
        zero_idx = PROPRIO_WINDOW.index(0)
        if self.use_relative_pose:
            rel = convert_pose_mat_rep(pose_mat, pose_mat[zero_idx], "relative")
            pose10d = mat_to_pose10d(rel)
        else:
            pose10d = mat_to_pose10d(pose_mat)

        obs = {
            CAMERA_KEY: np.moveaxis(frames.astype(np.float32) / 255.0, -1, 1),
            "robot0_eef_pos": pose10d[:OBS_LEN, :3],
            "robot0_eef_rot_axis_angle": pose10d[:OBS_LEN, 3:],
            "robot0_gripper_width": grip[:OBS_LEN].astype(np.float32),
            "img_indices": img_indices[:, None].astype(np.float32),
        }

        # wrt episode start (rotation part only), jittered
        if "robot0_demo_start_pose" in self.replay_buffer:
            start_pose = np.array(
                self.replay_buffer["robot0_demo_start_pose"][
                    int(self.episode_starts[ep])
                ],
                dtype=np.float64,
            )
            start_pose = start_pose + item_rng.normal(
                scale=self.start_pose_noise, size=start_pose.shape
            )
            rel_start = convert_pose_mat_rep(
                pose_mat, pose_to_mat(start_pose), "relative"
            )
            wrt = mat_to_pose10d(rel_start)
            obs["robot0_eef_rot_axis_angle_wrt_start"] = wrt[:OBS_LEN, 3:]

        action = np.concatenate(
            [pose10d[-ACTION_LEN:], grip[-ACTION_LEN:].astype(np.float32)], axis=-1
        )  # (32, 10): the 32-step window; future chunk = last 16 after split
        return {"obs": obs, "action": action, "dataset_name": self.name}


class UmiMultiDataset:
    """N task datasets with a merged index pool + per-task language latents
    (umi_multi_dataset.py:15-183)."""

    def __init__(
        self,
        datasets: Dict[str, UmiLazyDataset],
        language_prompts: Optional[Dict[str, str]] = None,
        text_encoder=None,
        seed: int = 42,
    ):
        self.datasets = datasets
        self.names = list(datasets)
        pool = []
        for di, name in enumerate(self.names):
            for i in range(len(datasets[name])):
                pool.append((di, i))
        self.index_pool = np.asarray(pool, dtype=np.int64).reshape(-1, 2)

        self.language_latents: Dict[str, np.ndarray] = {}
        if language_prompts:
            if text_encoder is None:
                from unified_video_action_tpu.utils.language import HashTextEncoder

                text_encoder = HashTextEncoder()
            for name, prompt in language_prompts.items():
                self.language_latents[name] = text_encoder.encode(prompt)[0]

    def __len__(self) -> int:
        return len(self.index_pool)

    def set_epoch(self, epoch: int) -> None:
        for ds in self.datasets.values():
            ds.set_epoch(epoch)

    def __getitem__(self, idx: int) -> Dict:
        di, i = self.index_pool[idx]
        name = self.names[di]
        item = self.datasets[name][int(i)]
        if name in self.language_latents:
            item["language_latents"] = self.language_latents[name]
        return item

    def split_val(self) -> "UmiMultiDataset":
        # carry the precomputed latents over — val items must have the same
        # schema as train items (the val loop feeds the same train_step)
        val = UmiMultiDataset(
            {k: v.split_val() for k, v in self.datasets.items()},
            language_prompts=None,
        )
        val.language_latents = self.language_latents
        return val

    # BaseImageDataset surface name (reference dataset/base_dataset.py:7-76)
    # — the trainer calls get_validation_dataset() on every dataset family;
    # for UMI it is the unused-episode split (umi_multi_dataset.py:150-166).
    def get_validation_dataset(self) -> "UmiMultiDataset":
        return self.split_val()

    def get_normalizer(self):
        """normalizer_type 'none' for umi (task/umi_multi.yaml:
        relative-pose data is already unit-scale)."""
        from unified_video_action_tpu.data.normalizer import (
            LinearNormalizer,
            NormalizerField,
        )

        first = self.datasets[self.names[0]]
        action_dim = first[0]["action"].shape[-1]
        return LinearNormalizer({"action": NormalizerField.identity(action_dim)})


def make_synthetic_umi(
    n_episodes: int = 4, episode_len: int = 80, seed: int = 0,
    image_size: int = 64,
) -> ReplayBuffer:
    """Small synthetic UMI-format buffer (smooth eef trajectories) for tests."""
    rng = np.random.default_rng(seed)
    buf = ReplayBuffer.create_empty()
    for _ in range(n_episodes):
        t = np.linspace(0, 2 * np.pi, episode_len)[:, None]
        pos = np.concatenate(
            [np.sin(t), np.cos(t), 0.1 * t], axis=-1
        ).astype(np.float32) + rng.normal(0, 0.01, (episode_len, 3)).astype(np.float32)
        rot = (0.2 * np.concatenate([t, -t, 0.5 * t], axis=-1)).astype(np.float32)
        grip = np.abs(np.sin(t)).astype(np.float32)
        start_pose = np.concatenate([pos[0], rot[0]]).astype(np.float64)
        buf.add_episode(
            {
                CAMERA_KEY: rng.integers(
                    0, 255, (episode_len, image_size, image_size, 3), dtype=np.uint8
                ),
                "robot0_eef_pos": pos,
                "robot0_eef_rot_axis_angle": rot,
                "robot0_gripper_width": grip,
                "robot0_demo_start_pose": np.tile(start_pose, (episode_len, 1)),
            }
        )
    return buf


def build_umi_multi_from_config(
    datasets_cfg: Dict[str, dict],
    val_ratio: float = 0.02,
    random_img_sampling: bool = False,
    seed: int = 42,
    text_encoder=None,
    **kwargs,
) -> "UmiMultiDataset":
    """Construct UmiMultiDataset from the task config's ``datasets`` block
    ({name: {path, mask_mirror, prompt}}) — config-level equivalent of the
    reference's UmiMultiDataset(dataset_root_dir=..., dataset_names=...)."""
    datasets: Dict[str, UmiLazyDataset] = {}
    prompts: Dict[str, str] = {}
    for name, spec in datasets_cfg.items():
        # zarr stores (the reference's native UMI format) stay lazy: chunks
        # stream from disk per index instead of materializing the episode
        # store in RAM (reference umi_lazy_dataset.py:298-300).
        lazy = bool(spec.get("lazy", ReplayBuffer._is_zarr(spec["path"])))
        buf = ReplayBuffer.load(spec["path"], lazy=lazy)
        datasets[name] = UmiLazyDataset(
            buf,
            name=name,
            mask_mirror=bool(spec.get("mask_mirror", False)),
            random_img_sampling=random_img_sampling,
            val_ratio=val_ratio,
            seed=seed,
        )
        if "prompt" in spec:
            prompts[name] = spec["prompt"]
    return UmiMultiDataset(datasets, language_prompts=prompts,
                           text_encoder=text_encoder, seed=seed)
