"""Device-side train augmentation (utils/image.py:augment_video) vs the cv2
host reference semantics (crop 95% -> bilinear resize back -> 5x5 gaussian,
reference pusht_image_dataset.py:93-130)."""

import numpy as np
import pytest

from unified_video_action_tpu.utils import image as image_util

cv2 = pytest.importorskip("cv2")


def _cv2_aug(video, top, left, sigma, crop_frac=0.95):
    T, C, H, W = video.shape
    ch, cw = int(round(H * crop_frac)), int(round(W * crop_frac))
    out = np.empty_like(video)
    for t in range(T):
        frame = np.moveaxis(video[t], 0, -1)
        crop = frame[top : top + ch, left : left + cw]
        resized = cv2.resize(crop, (W, H), interpolation=cv2.INTER_LINEAR)
        blurred = cv2.GaussianBlur(resized, (5, 5), sigmaX=sigma)
        out[t] = np.moveaxis(blurred, -1, 0)
    return out


def test_matches_cv2_reference():
    rng = np.random.default_rng(0)
    B, T, C, H, W = 3, 4, 3, 32, 32
    video = rng.random((B, T, C, H, W), dtype=np.float32)
    m = H - int(round(H * 0.95)) + 1
    top = rng.integers(0, m, B).astype(np.int32)
    left = rng.integers(0, m, B).astype(np.int32)
    sigma = rng.uniform(0.1, 2.0, B).astype(np.float32)

    got = np.asarray(image_util.augment_video(video, top, left, sigma))
    want = np.stack(
        [_cv2_aug(video[b], int(top[b]), int(left[b]), float(sigma[b]))
         for b in range(B)]
    )
    # bilinear-resize half-pixel conventions differ slightly between cv2 and
    # jax.image.resize; the gaussian kernel + reflect-101 border match exactly
    assert np.abs(got - want).mean() < 5e-3
    assert np.abs(got - want).max() < 8e-2


def test_video_consistent_and_batched():
    rng = np.random.default_rng(1)
    frame = rng.random((1, 1, 3, 16, 16), dtype=np.float32)
    video = np.repeat(frame, 6, axis=1)
    out = np.asarray(
        image_util.augment_video(
            video,
            np.array([1], np.int32),
            np.array([0], np.int32),
            np.array([1.2], np.float32),
        )
    )
    for t in range(1, 6):
        np.testing.assert_allclose(out[0, 0], out[0, t], atol=1e-6)
