"""Image preprocessing as pure jittable functions.

Equivalent of the reference's ``resize_image`` / ``resize_image_eval``
(utils/data_utils.py:19-125): per-task camera-key remapping + bilinear resize
to 256×256 (torch ``align_corners=False`` == jax half-pixel 'linear'). Runs on
device inside the jitted policy/train step, so H2D traffic carries the small
native-resolution frames, not the upscaled ones.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jax.Array

# per-task main/wrist camera key remaps (reference data_utils.py:19-125)
TASK_IMAGE_KEYS = {
    "libero": {"agentview_rgb": "image", "agentview_image": "image"},
    "umi": {"camera0_rgb": "image"},
    "toolhang": {
        "sideview_image": "image",
        "robot0_eye_in_hand_image": "wrist_image",
    },
}


def remap_image_keys(task_name: str, obs: Dict[str, Array]) -> Dict[str, Array]:
    mapping = {}
    for task, m in TASK_IMAGE_KEYS.items():
        if task in task_name:
            mapping = m
            break
    out = dict(obs)
    for src, dst in mapping.items():
        if src in out:
            out[dst] = out.pop(src)
    return out


def resize_video(x: Array, size: int = 256) -> Array:
    """(B, T, C, H, W) -> (B, T, C, size, size), bilinear half-pixel."""
    B, T, C, H, W = x.shape
    if H == size and W == size:
        return x
    flat = x.reshape(B * T, C, H, W)
    out = jax.image.resize(
        flat, (B * T, C, size, size), method="linear", antialias=False
    )
    return out.reshape(B, T, C, size, size)


def to_model_range(x: Array) -> Array:
    """[0, 1] float frames -> [-1, 1] (reference: x·255/127.5 − 1)."""
    return x * (255.0 / 127.5) - 1.0
