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
    # kitchen suite reuses the LIBERO demo/obs conventions
    # (envs/kitchen_env.py, scripts/gen_kitchen_demos.py)
    "kitchen": {"agentview_rgb": "image", "agentview_image": "image"},
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


def main_image_key(task_name: str, obs: Dict) -> str:
    """The raw-batch key that ``remap_image_keys`` would map to ``image``
    (host-side callers gather frames before the remap happens on device)."""
    for task, m in TASK_IMAGE_KEYS.items():
        if task in task_name:
            for src, dst in m.items():
                if dst == "image" and src in obs:
                    return src
    return "image"


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


# train-aug crop fraction (reference pusht_image_dataset.py:93-130); shared
# by the host param draw and the device crop so their ranges always agree
AUG_CROP_FRAC = 0.95


def aug_margins(H: int, W: int, crop_frac: float = AUG_CROP_FRAC):
    """Exclusive upper bounds for the (top, left) crop-corner draws matching
    augment_video's crop size."""
    return (
        H - int(round(H * crop_frac)) + 1,
        W - int(round(W * crop_frac)) + 1,
    )


def augment_video(
    x: Array, top: Array, left: Array, sigma: Array,
    crop_frac: float = AUG_CROP_FRAC,
) -> Array:
    """Video-consistent train augmentation ON DEVICE (the reference applies
    the same crop+blur per clip host-side with cv2, pusht_image_dataset.py:
    93-130 — thousands of per-frame cv2 calls per batch, which saturates a
    small host; here the host only draws 3 scalars per sample and the TPU
    does the work inside the jitted train step).

    x: (B, T, C, H, W) float [0,1]; top/left: (B,) int32 crop corners in
    [0, H - crop], sigma: (B,) float blur widths. Crop ``crop_frac`` of the
    frame, resize back bilinear, then a 5-tap separable gaussian built from
    the traced sigma (cv2 getGaussianKernel formula, reflect-101 border)."""
    B, T, C, H, W = x.shape
    ch, cw = int(round(H * crop_frac)), int(round(W * crop_frac))

    def crop_one(v, t, l):
        return jax.lax.dynamic_slice(v, (0, 0, t, l), (T, C, ch, cw))

    crops = jax.vmap(crop_one)(x, top, left)
    flat = crops.reshape(B * T, C, ch, cw)
    r = jax.image.resize(
        flat, (B * T, C, H, W), method="linear", antialias=False
    ).reshape(B, T, C, H, W)

    xs = jnp.arange(-2.0, 3.0, dtype=r.dtype)
    k = jnp.exp(-(xs[None, :] ** 2) / (2.0 * sigma[:, None].astype(r.dtype) ** 2))
    k = k / k.sum(-1, keepdims=True)  # (B, 5)
    kb = k[:, :, None, None, None, None]
    p = jnp.pad(r, ((0, 0), (0, 0), (0, 0), (2, 2), (0, 0)), mode="reflect")
    r = sum(kb[:, i] * p[:, :, :, i : i + H, :] for i in range(5))
    p = jnp.pad(r, ((0, 0), (0, 0), (0, 0), (0, 0), (2, 2)), mode="reflect")
    r = sum(kb[:, i] * p[:, :, :, :, i : i + W] for i in range(5))
    return r


def to_unit_float(x: Array, dtype=jnp.float32) -> Array:
    """uint8 frames -> [0, 1] float on device; float passes through.

    Datasets may ship uint8 video (4x narrower H2D + no host-side float
    conversion on the 1-CPU input path); every consumer normalizes through
    this chokepoint."""
    if x.dtype == jnp.uint8:
        return x.astype(dtype) / 255.0
    return x
