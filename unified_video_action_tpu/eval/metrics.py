"""Offline evaluation metrics.

Equivalents of the reference's eval stack (eval/eval.py:29-417, fvd/fvd.py):
* ``action_l2``: RMSE between predicted and GT action chunks over the first 9
  dims -> ``val_action_l2_distances``.
* ``frechet_distance``: TF-GAN-style FVD between embedding sets (matrix sqrt
  via eigendecomposition of the symmetrized product).
* ``test_video_fvd`` / ``test_action_l2``: batched driver loops around the
  policy's sampling paths.

The I3D embedder lives in eval/i3d.py; when its pretrained weights are absent
(offline), FVD falls back to raw-pixel-statistics Fréchet distance so the
video-quality regression signal still exists (clearly labeled in the output).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import numpy as np


def action_l2(pred: np.ndarray, target: np.ndarray, n_dims: int = 9) -> float:
    """RMSE over the first min(n_dims, A) action dims (eval/eval.py:364-368)."""
    n = min(pred.shape[-1], n_dims)
    d = pred[..., :n] - target[..., :n]
    return float(np.sqrt((d ** 2).mean()))


def frechet_distance(x: np.ndarray, y: np.ndarray, eps: float = 1e-10) -> float:
    """Fréchet distance between gaussians fit to two embedding sets
    (fvd/fvd.py:54-115 semantics)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    mu_x, mu_y = x.mean(axis=0), y.mean(axis=0)
    cov_x = np.cov(x, rowvar=False)
    cov_y = np.cov(y, rowvar=False)
    diff = mu_x - mu_y

    # sqrt of cov_x @ cov_y via eigendecomposition of the symmetrized product
    prod = cov_x @ cov_y
    eigvals = np.linalg.eigvals(prod)
    sqrt_trace = np.sum(np.sqrt(np.clip(eigvals.real, 0, None)))
    return float(diff @ diff + np.trace(cov_x) + np.trace(cov_y) - 2 * sqrt_trace)


def pixel_embeddings(videos: np.ndarray) -> np.ndarray:
    """Fallback 'embedding': per-video downsampled pixel statistics. Only used
    when I3D weights are unavailable; labeled as video_fvd_pixel."""
    v = np.asarray(videos, np.float32)  # (B, T, H, W, 3) in [0, 255]
    B = v.shape[0]
    v = v / 255.0
    # coarse spatio-temporal pooling -> 400-d-ish vector
    T, H, W = v.shape[1:4]
    th, sh, sw = max(T // 4, 1), max(H // 8, 1), max(W // 8, 1)
    pooled = v[:, : th * 4, : sh * 8, : sw * 8]
    pooled = pooled.reshape(B, 4, th, 8, sh, 8, sw, 3).mean(axis=(2, 4, 6))
    return pooled.reshape(B, -1)


def vae_latent_embeddings(latents: np.ndarray) -> np.ndarray:
    """(B, T, C, h, w) frozen-VAE latents -> (B, 2*T*C) pooled statistics.

    The stage-1 video-quality fallback metric (VERDICT r3 item 5): the KL-VAE
    encoder is trusted + frozen, so Fréchet distance in its latent space
    tracks generation quality where raw-pixel statistics are noise (TRAINRUN
    r3: pixel-FVD went 96->163 while the diffusion loss improved
    monotonically). Per frame and channel we take the spatial mean and std —
    first and second moments of the latent field — giving a 128-d embedding
    at (T=4, C=16) that a ~64-video eval set can estimate a covariance for.
    """
    z = np.asarray(latents, np.float32)
    B, T, C = z.shape[:3]
    flat = z.reshape(B, T * C, -1)
    mean = flat.mean(axis=-1)
    std = flat.std(axis=-1)
    return np.concatenate([mean, std], axis=-1)


def get_video_embedder() -> Callable[[np.ndarray], np.ndarray]:
    """Returns an (B, T, H, W, 3)->(B, D) embedder: I3D if weights exist,
    pixel-statistics fallback otherwise."""
    try:
        from unified_video_action_tpu.eval.i3d import load_i3d_embedder

        return load_i3d_embedder()
    except Exception:
        return pixel_embeddings


def video_fvd(
    real_videos: np.ndarray, pred_videos: np.ndarray,
    embedder: Optional[Callable] = None,
) -> Dict[str, float]:
    embedder = embedder or get_video_embedder()
    e_real = embedder(real_videos)
    e_pred = embedder(pred_videos)
    key = "video_fvd" if embedder is not pixel_embeddings else "video_fvd_pixel"
    return {key: frechet_distance(e_real, e_pred)}
