"""Offline metrics: frechet distance sanity + action L2."""

import os

import numpy as np

from unified_video_action_tpu.eval.metrics import (
    action_l2,
    frechet_distance,
    pixel_embeddings,
    video_fvd,
)


def test_frechet_identical_is_zero():
    x = np.random.RandomState(0).randn(256, 16)
    assert abs(frechet_distance(x, x.copy())) < 1e-6


def test_frechet_mean_shift():
    rng = np.random.RandomState(1)
    x = rng.randn(4096, 8)
    y = rng.randn(4096, 8) + 2.0
    d = frechet_distance(x, y)
    # analytic: ||mu_diff||^2 = 8 * 4 = 32 (+ small covariance noise)
    assert 28 < d < 36


def test_action_l2():
    pred = np.zeros((2, 16, 10))
    target = np.ones((2, 16, 10))
    assert abs(action_l2(pred, target) - 1.0) < 1e-9
    # only first 9 dims count
    target2 = np.zeros((2, 16, 10)); target2[..., 9] = 100.0
    assert action_l2(pred, target2) == 0.0


def test_video_fvd_pixel_fallback():
    rng = np.random.RandomState(2)
    real = rng.randint(0, 255, (16, 8, 32, 32, 3)).astype(np.float32)
    out = video_fvd(real, real.copy(), embedder=pixel_embeddings)
    assert abs(out["video_fvd"] if "video_fvd" in out else out["video_fvd_pixel"]) < 1e-6


def test_vae_latent_embeddings_shape_and_moments():
    from unified_video_action_tpu.eval.metrics import vae_latent_embeddings

    rng = np.random.RandomState(3)
    z = rng.randn(6, 4, 16, 6, 6).astype(np.float32)
    e = vae_latent_embeddings(z)
    assert e.shape == (6, 2 * 4 * 16)
    # first half = spatial means, second half = spatial stds
    np.testing.assert_allclose(e[0, 0], z[0, 0, 0].mean(), rtol=1e-5)
    np.testing.assert_allclose(e[0, 64], z[0, 0, 0].std(), rtol=1e-5)


def test_vae_latent_frechet_orders_by_corruption():
    """The metric must rank a lightly-corrupted latent set closer to the real
    one than a heavily-corrupted set — the property the raw-pixel fallback
    lost in practice (TRAINRUN r3: pixel-FVD rose while the loss improved)."""
    from unified_video_action_tpu.eval.metrics import vae_latent_embeddings

    rng = np.random.RandomState(4)
    real = rng.randn(64, 4, 16, 6, 6).astype(np.float32)
    e_real = vae_latent_embeddings(real)
    prev = 0.0
    for noise in (0.1, 0.5, 2.0):
        pred = real + noise * rng.randn(*real.shape).astype(np.float32)
        d = frechet_distance(e_real, vae_latent_embeddings(pred))
        assert d > prev, f"noise {noise}: distance {d} not > {prev}"
        prev = d


def test_keypoint_overlay_video(tmp_path):
    """human_pp keypoints.eval mode: gt/pred overlay gif written from frames
    + action chunks (reference eval/eval.py keypoint branch)."""
    from unified_video_action_tpu.eval.offline import _write_keypoint_overlay

    rng = np.random.RandomState(0)
    frames = rng.rand(6, 3, 32, 32).astype(np.float32)
    gt = rng.uniform(0, 512, (6, 4)).astype(np.float32)      # 2 keypoints
    pred = gt + rng.randn(6, 4).astype(np.float32) * 10
    path = str(tmp_path / "kp.gif")
    _write_keypoint_overlay(frames, gt, pred, path)
    assert os.path.exists(path) and os.path.getsize(path) > 0

    import imageio.v2 as imageio

    vid = imageio.mimread(path)
    assert len(vid) == 6
    # overlay drew green (gt) and red (pred) marks somewhere
    arr = np.stack([np.asarray(f)[..., :3] for f in vid])
    green = (arr[..., 1] > 200) & (arr[..., 0] < 80)
    red = (arr[..., 0] > 200) & (arr[..., 1] < 80)
    assert green.any() and red.any()
