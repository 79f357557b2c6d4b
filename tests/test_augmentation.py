"""Video augmentation pipeline: shapes, determinism, video consistency."""

import numpy as np

from unified_video_action_tpu.data.augmentation import VideoTransforms

UMI_PIPELINE = [
    {"name": "RandomCrop", "size": [24, 24], "p": 0.5},
    {"name": "Resize", "size": [32, 32], "antialias": True},
    {"name": "ColorJitter", "brightness": 0.3, "contrast": 0.4,
     "saturation": 0.5, "hue": 0.08},
    {"name": "RandomSharpness", "sharpness": 0.5, "p": 0.5},
    {"name": "RandomAutoContrast", "p": 0.5},
    {"name": "RandomGrayscale", "p": 0.2},
    {"name": "GaussianBlur", "kernel_size": [5, 5], "sigma": [0.1, 2.0], "p": 0.5},
]


def _video():
    rng = np.random.RandomState(0)
    return rng.rand(6, 3, 32, 32).astype(np.float32)


def test_pipeline_shapes_and_range():
    tf = VideoTransforms(UMI_PIPELINE, seed=1)
    out = tf(_video(), sample_seed=3)
    assert out.shape == (6, 3, 32, 32)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_determinism_per_sample_seed():
    tf = VideoTransforms(UMI_PIPELINE, seed=1)
    a = tf(_video(), sample_seed=5)
    b = tf(_video(), sample_seed=5)
    c = tf(_video(), sample_seed=6)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_video_consistency():
    """A static video must stay static (same transform on every frame)."""
    frame = np.random.RandomState(1).rand(1, 3, 32, 32).astype(np.float32)
    video = np.repeat(frame, 8, axis=0)
    tf = VideoTransforms(UMI_PIPELINE, seed=2)
    out = tf(video, sample_seed=0)
    for t in range(1, 8):
        np.testing.assert_allclose(out[0], out[t], atol=1e-6)
