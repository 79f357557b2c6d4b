"""LIBERO dataset: a directory of per-task robomimic-format hdf5 demos with
language conditioning.

Equivalent of the reference's ``LiberoReplayImageDataset``
(dataset/libero_replay_image_dataset.py:39-509): glob ``*.hdf5`` under a
directory, derive the language instruction from each filename
("..._SCENE1_pick_up_the_book_demo.hdf5" -> "pick up the book"), attach
tokenized language per step (stacked input_ids+attention_mask as the
``language`` obs key, :315-439), fix the upside-down agentview render
(rot180, :222-223), and optionally color-jitter.
"""

from __future__ import annotations

import glob
import os

# never hit the network for tokenizers/weights (zero-egress environments hang)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import re
from typing import Dict, List, Optional

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

from unified_video_action_tpu.data.augmentation import VideoTransforms
from unified_video_action_tpu.data.normalizer import (
    LinearNormalizer,
    NormalizerField,
    fit_field,
)
from unified_video_action_tpu.data.replay_buffer import ReplayBuffer
from unified_video_action_tpu.data.robomimic_dataset import convert_robomimic_actions
from unified_video_action_tpu.data.sampler import (
    SequenceSampler,
    get_val_mask,
)


def language_from_filename(path: str) -> str:
    """'KITCHEN_SCENE1_put_the_black_bowl_demo.hdf5' -> 'put the black bowl'
    (reference derives the instruction after the SCENE marker, :326-333)."""
    stem = os.path.basename(path)
    stem = re.sub(r"\.hdf5$", "", stem)
    stem = re.sub(r"_demo$", "", stem)
    m = re.search(r"SCENE\d+_(.*)", stem)
    text = m.group(1) if m else stem
    return text.replace("_", " ").strip()


def prompt_from_filename(path: str) -> str:
    """Natural-language instruction for a demo file — the SAME string the
    eval runner conditions on (runners/libero_runner.py:62,89), so the
    training latents and eval latents come from identical prompts even under
    the offline hash-encoder fallback (which hashes the raw string)."""
    from unified_video_action_tpu.envs.kitchen_env import (
        KITCHEN_TASK_PROMPTS,
        task_from_name,
    )

    task = task_from_name(path)
    if task is not None:
        return KITCHEN_TASK_PROMPTS[task]
    return language_from_filename(path)


def tokenize_language(text: str, max_length: int = 77) -> np.ndarray:
    """(2, max_length) stacked [input_ids; attention_mask]. Uses the CLIP
    tokenizer when available, else a deterministic hash tokenizer."""
    try:
        from transformers import CLIPTokenizer

        # local_files_only guards even when transformers was imported before
        # the offline env vars were set (its constants are read at import
        # time); zero-egress hosts otherwise hang in the hub connect
        tok = CLIPTokenizer.from_pretrained(
            "openai/clip-vit-base-patch32", local_files_only=True
        )
        out = tok(
            text, padding="max_length", max_length=max_length,
            truncation=True, return_tensors="np",
        )
        return np.stack(
            [out["input_ids"][0], out["attention_mask"][0]], axis=0
        ).astype(np.int64)
    except Exception:
        words = text.split()
        ids = np.zeros(max_length, np.int64)
        mask = np.zeros(max_length, np.int64)
        for i, w in enumerate(words[:max_length]):
            ids[i] = (hash(w) % 30000) + 1
            mask[i] = 1
        return np.stack([ids, mask], axis=0)


class LiberoReplayImageDataset:
    def __init__(
        self,
        dataset_dir: str,
        shape_meta: dict,
        horizon: int = 32,
        pad_before: int = 0,
        pad_after: int = 0,
        abs_action: bool = True,
        seed: int = 42,
        val_ratio: float = 0.0,
        max_episodes_per_task: Optional[int] = None,
        data_aug: bool = False,
        language_max_length: int = 77,
        emit_language_latents: bool = False,
        **kwargs,
    ):
        assert h5py is not None
        files = sorted(glob.glob(os.path.join(dataset_dir, "*.hdf5")))
        assert files, f"no hdf5 files under {dataset_dir}"

        obs_meta = shape_meta["obs"]
        self.rgb_keys = [k for k, v in obs_meta.items() if v.get("type") == "rgb"]
        self.lowdim_keys = [
            k for k, v in obs_meta.items()
            if v.get("type") == "low_dim" and k != "language"
        ]

        # Per-episode text latents for the training batches: the reference
        # conditions the MAR on CLIP text features during libero training
        # (libero_replay_image_dataset.py:315-439 feeds tokens; the policy
        # encodes them) — here the dataset pre-encodes once per task file
        # with the same encoder the policy/eval runner uses (hash fallback
        # offline), mirroring UmiMultiDataset.get_language_latent.
        self.emit_language_latents = bool(emit_language_latents)
        text_encoder = None
        if self.emit_language_latents:
            from unified_video_action_tpu.utils.language import get_text_encoder

            text_encoder, _ = get_text_encoder("libero", "clip")

        self.replay_buffer = ReplayBuffer.create_empty()
        episode_language: List[np.ndarray] = []
        episode_latents: List[np.ndarray] = []
        for path in files:
            prompt = prompt_from_filename(path)
            tokens = tokenize_language(prompt, language_max_length)
            latent = (
                text_encoder.encode(prompt)[0].astype(np.float32)
                if text_encoder is not None
                else None
            )
            with h5py.File(path, "r") as f:
                demos = sorted(
                    f["data"].keys(), key=lambda s: int(s.split("_")[-1])
                )
                if max_episodes_per_task is not None:
                    demos = demos[:max_episodes_per_task]
                for demo in demos:
                    g = f["data"][demo]
                    ep: Dict[str, np.ndarray] = {}
                    for k in self.rgb_keys:
                        img = g["obs"][k][:]
                        # agentview renders bottom-up; the reference's
                        # rot180-then-horizontal-flip (:218-223) nets out to
                        # a vertical flip only — same as the eval adapter's
                        # obs path (runners/libero_runner.py `img[::-1]`)
                        ep[k] = img[:, ::-1, :]
                    for k in self.lowdim_keys:
                        ep[k] = g["obs"][k][:]
                    ep["action"] = convert_robomimic_actions(
                        g["actions"][:], abs_action=abs_action
                    )
                    n = len(ep["action"])
                    ep["language"] = np.tile(tokens[None], (n, 1, 1))
                    self.replay_buffer.add_episode(ep)
                    episode_language.append(tokens)
                    if latent is not None:
                        episode_latents.append(latent)
        self.episode_latents = (
            np.stack(episode_latents) if episode_latents else None
        )

        val_mask = get_val_mask(self.replay_buffer.n_episodes, val_ratio, seed)
        self.train_mask = ~val_mask
        self.val_mask = val_mask
        self.sampler = SequenceSampler(
            self.replay_buffer,
            sequence_length=horizon,
            pad_before=pad_before,
            pad_after=pad_after,
            episode_mask=self.train_mask,
        )
        self.horizon = horizon
        self.pad_before, self.pad_after = pad_before, pad_after
        self.abs_action = abs_action
        self.seed = seed
        self.transforms = (
            VideoTransforms(
                [{"name": "ColorJitter", "brightness": 0.3, "contrast": 0.4,
                  "saturation": 0.5, "hue": 0.08, "p": 0.8}],
                seed=seed,
            )
            if data_aug
            else None
        )

    def get_validation_dataset(self) -> "LiberoReplayImageDataset":
        val = object.__new__(LiberoReplayImageDataset)
        val.__dict__.update(self.__dict__)
        val.sampler = SequenceSampler(
            self.replay_buffer,
            sequence_length=self.horizon,
            pad_before=self.pad_before,
            pad_after=self.pad_after,
            episode_mask=self.val_mask,
        )
        val.transforms = None
        return val

    def get_normalizer(self) -> LinearNormalizer:
        from unified_video_action_tpu.data.robomimic_dataset import (
            _abs_action_normalizer,
        )

        n = LinearNormalizer()
        action = self.replay_buffer["action"]
        n.fields["action"] = (
            _abs_action_normalizer(action)
            if self.abs_action
            else fit_field(action, mode="limits")
        )
        for k in self.rgb_keys:
            n.fields[k] = NormalizerField.image_range()
        for k in self.lowdim_keys:
            n.fields[k] = fit_field(self.replay_buffer[k], mode="limits")
        return n

    def __len__(self) -> int:
        return len(self.sampler)

    def __getitem__(self, idx: int) -> Dict:
        sample = self.sampler.sample_sequence(idx)
        obs: Dict[str, np.ndarray] = {}
        for k in self.rgb_keys:
            if self.transforms is not None:
                img = sample[k].astype(np.float32) / 255.0
                img = np.moveaxis(img, -1, 1)
                img = self.transforms(img, sample_seed=idx)
            else:
                # no host-side transform -> ship native uint8 (4x fewer
                # bytes over the host link; train_step normalizes on device
                # via image_util.to_unit_float, same as the PushT path)
                img = np.moveaxis(sample[k], -1, 1)
            obs[k] = img
        for k in self.lowdim_keys:
            obs[k] = sample[k].astype(np.float32)
        obs["language"] = sample["language"].astype(np.int64)
        item = {"obs": obs, "action": sample["action"].astype(np.float32)}
        if self.emit_language_latents and self.episode_latents is not None:
            buffer_start = int(self.sampler.indices[idx][0])
            ep_idx = int(
                np.searchsorted(
                    self.replay_buffer.episode_ends, buffer_start, side="right"
                )
            )
            item["language_latents"] = self.episode_latents[ep_idx]
        return item
