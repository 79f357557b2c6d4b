"""Video-consistent image augmentation pipeline.

Equivalent of the reference's kornia ``VideoSequential`` transforms
(base_lazy_dataset.py:365-411; config/task/umi_lazy.yaml pipeline: RandomCrop
208 -> Resize 224 -> ColorJitter -> RandomSharpness -> RandomAutoContrast ->
RandomGrayscale -> GaussianBlur) and the PushT per-sample seeded crop/blur.
kornia is not part of this framework's dependency set; transforms are
numpy/cv2 with ONE random draw per clip so every frame of a video gets the
same transform (video consistency), matching kornia's same_on_frame behavior.

Each transform takes/returns (T, C, H, W) float32 in [0, 1].
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _to_hwc(v):  # (T, C, H, W) -> list of (H, W, C)
    return np.moveaxis(v, 1, -1)


def _to_chw(v):
    return np.moveaxis(v, -1, 1)


@dataclasses.dataclass
class RandomCrop:
    size: Tuple[int, int]
    p: float = 1.0

    def __call__(self, v: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.uniform() > self.p:
            return v
        T, C, H, W = v.shape
        ch, cw = self.size
        top = int(rng.integers(0, H - ch + 1))
        left = int(rng.integers(0, W - cw + 1))
        return v[:, :, top : top + ch, left : left + cw]


@dataclasses.dataclass
class Resize:
    size: Tuple[int, int]
    antialias: bool = True

    def __call__(self, v: np.ndarray, rng) -> np.ndarray:
        T = v.shape[0]
        out = np.empty((T, v.shape[1], self.size[0], self.size[1]), v.dtype)
        hwc = _to_hwc(v)
        interp = cv2.INTER_AREA if (
            self.antialias and self.size[0] < v.shape[2]
        ) else cv2.INTER_LINEAR
        for t in range(T):
            out[t] = np.moveaxis(
                cv2.resize(hwc[t], (self.size[1], self.size[0]), interpolation=interp),
                -1, 0,
            )
        return out


@dataclasses.dataclass
class ColorJitter:
    brightness: float = 0.0
    contrast: float = 0.0
    saturation: float = 0.0
    hue: float = 0.0
    p: float = 1.0

    def __call__(self, v: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.uniform() > self.p:
            return v
        b = 1 + rng.uniform(-self.brightness, self.brightness)
        c = 1 + rng.uniform(-self.contrast, self.contrast)
        s = 1 + rng.uniform(-self.saturation, self.saturation)
        h = rng.uniform(-self.hue, self.hue)
        out = v * b
        mean = out.mean(axis=(2, 3), keepdims=True)
        out = (out - mean) * c + mean
        gray = out.mean(axis=1, keepdims=True)
        out = (out - gray) * s + gray
        if abs(h) > 1e-6 and cv2 is not None and v.shape[1] == 3:
            hwc = np.clip(_to_hwc(out), 0, 1)
            shifted = np.empty_like(hwc)
            for t in range(v.shape[0]):
                hsv = cv2.cvtColor(hwc[t], cv2.COLOR_RGB2HSV)
                hsv[..., 0] = (hsv[..., 0] + h * 360.0) % 360.0
                shifted[t] = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
            out = _to_chw(shifted)
        return np.clip(out, 0, 1)


@dataclasses.dataclass
class RandomSharpness:
    sharpness: float = 0.5
    p: float = 0.5

    def __call__(self, v: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.uniform() > self.p or cv2 is None:
            return v
        factor = rng.uniform(0, self.sharpness)
        hwc = _to_hwc(v)
        out = np.empty_like(hwc)
        for t in range(v.shape[0]):
            blur = cv2.GaussianBlur(hwc[t], (5, 5), 1.0)
            out[t] = np.clip(hwc[t] + factor * (hwc[t] - blur), 0, 1)
        return _to_chw(out)


@dataclasses.dataclass
class RandomAutoContrast:
    p: float = 0.5

    def __call__(self, v: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.uniform() > self.p:
            return v
        lo = v.min(axis=(0, 2, 3), keepdims=True)
        hi = v.max(axis=(0, 2, 3), keepdims=True)
        return (v - lo) / np.maximum(hi - lo, 1e-6)


@dataclasses.dataclass
class RandomGrayscale:
    p: float = 0.1

    def __call__(self, v: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.uniform() > self.p or v.shape[1] != 3:
            return v
        w = np.array([0.299, 0.587, 0.114], v.dtype).reshape(1, 3, 1, 1)
        gray = (v * w).sum(axis=1, keepdims=True)
        return np.repeat(gray, 3, axis=1)


@dataclasses.dataclass
class GaussianBlur:
    kernel_size: Tuple[int, int] = (5, 5)
    sigma: Tuple[float, float] = (0.1, 2.0)
    p: float = 0.5

    def __call__(self, v: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if rng.uniform() > self.p or cv2 is None:
            return v
        sigma = float(rng.uniform(*self.sigma))
        hwc = _to_hwc(v)
        out = np.empty_like(hwc)
        for t in range(v.shape[0]):
            out[t] = cv2.GaussianBlur(hwc[t], tuple(self.kernel_size), sigma)
        return _to_chw(out)


_REGISTRY = {
    "RandomCrop": RandomCrop,
    "Resize": Resize,
    "ColorJitter": ColorJitter,
    "RandomSharpness": RandomSharpness,
    "RandomAutoContrast": RandomAutoContrast,
    "RandomGrayscale": RandomGrayscale,
    "GaussianBlur": GaussianBlur,
}


class VideoTransforms:
    """Compose transforms from config dicts ({'name': ..., **kwargs})."""

    def __init__(self, specs: Sequence[dict], seed: int = 0):
        self.transforms = []
        for spec in specs:
            spec = dict(spec)
            name = spec.pop("name")
            cls = _REGISTRY[name]
            for key in ("size", "kernel_size", "sigma"):
                if key in spec and isinstance(spec[key], list):
                    spec[key] = tuple(spec[key])
            self.transforms.append(cls(**spec))
        self.seed = seed

    def __call__(self, video: np.ndarray, sample_seed: int = 0) -> np.ndarray:
        rng = np.random.default_rng((self.seed, sample_seed))
        for t in self.transforms:
            video = t(video, rng)
        return video
