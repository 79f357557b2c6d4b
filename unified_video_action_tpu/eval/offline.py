"""Offline evaluation drivers: FVD on generated video, action-chunk L2.

Equivalents of the reference's eval loops (eval/eval.py:128-280 test_video_fvd,
:282-417 test_action_l2): take validation batches, run the policy's sampling
paths (full_dynamic_model for video, policy_model for actions), decode frame
latents through the VAE, compute FVD / RMSE, and write side-by-side
real-vs-predicted video grids (gif + mp4)."""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from unified_video_action_tpu.eval.metrics import (
    action_l2,
    get_video_embedder,
    frechet_distance,
    pixel_embeddings,
    vae_latent_embeddings,
)
from unified_video_action_tpu.models.mar import Mar
from unified_video_action_tpu.models.vae import KLVae, LATENT_SCALE
from unified_video_action_tpu.utils import frames as frame_util
from unified_video_action_tpu.utils import image as image_util


def _decode_frames(policy, vae_params, latents: np.ndarray) -> np.ndarray:
    """(N, C, h, w) scaled latents -> (N, H, W, 3) uint8 frames."""
    import jax.numpy as jnp

    z = jnp.asarray(latents) / LATENT_SCALE
    dec = policy.vae.apply({"params": vae_params}, z, method=KLVae.decode)
    img = np.asarray(jax.device_get(dec))
    img = np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)
    return np.moveaxis(img, 1, -1)


def test_video_fvd(
    policy,
    params,
    val_batches: Iterable[Dict],
    key,
    num_batches: int = 4,
    num_iter: int = 1,
    output_dir: Optional[str] = None,
) -> Dict[str, float]:
    """Generate future frames conditioned on past frames; FVD vs ground truth.

    Deterministic eval windows (VERDICT r3 item 5): the sampling and VAE
    posterior keys are derived from a FIXED seed folded with the batch index
    — not from the caller's training key — so epoch-over-epoch readings of
    this metric differ only through the model weights, never through fresh
    noise draws. (The caller's ``key`` is accepted for API compatibility.)
    Reports ``video_fvd_vae`` (Fréchet in the frozen VAE's latent space)
    always; I3D ``video_fvd`` when its weights exist; the legacy raw-pixel
    ``video_fvd_pixel`` otherwise.
    """
    import jax.numpy as jnp

    real_videos, pred_videos = [], []
    real_lat, pred_lat = [], []
    c = policy.mar_cfg

    sample_fn = None
    for bi, batch in enumerate(val_batches):
        if bi >= num_batches:
            break
        obs_in = image_util.remap_image_keys(
            policy.task_name, dict(batch["obs"])
        )
        image = image_util.to_unit_float(jnp.asarray(obs_in["image"]))
        image = image_util.resize_video(image, c.img_size)
        T = image.shape[1]
        idx = frame_util.select_frame_indices(T, eval=False)
        frames = image_util.to_model_range(image[:, jnp.asarray(idx)])
        n_sel = len(idx)
        cond_f, target_f = frames[:, : n_sel // 2], frames[:, n_sel // 2 :]

        bkey = jax.random.fold_in(jax.random.PRNGKey(0), bi)
        k1, k2, k3 = jax.random.split(bkey, 3)
        cond = policy._encode_frames(params["vae"], cond_f, k1)

        if sample_fn is None:
            def sample_fn(mar_params, cond, k):
                return policy.mar.apply(
                    {"params": mar_params}, cond, k,
                    num_iter=num_iter,
                    temperature=float(policy.amp.get("temperature", 1.0)),
                    task_mode="full_dynamic_model"
                    if c.predict_action
                    else "video_model",
                    method=Mar.sample_video,
                )
            sample_fn = jax.jit(sample_fn)

        gen_latents, _ = sample_fn(params["mar"], cond, k2)
        pred = _decode_frames(policy, params["vae"], np.asarray(gen_latents))
        B = cond.shape[0]
        pred = pred.reshape(B, c.n_frames, *pred.shape[1:])

        # VAE-latent-space embeddings: GT target frames through the frozen
        # encoder vs the generated latents themselves (same space/scale)
        target_lat = policy._encode_frames(params["vae"], target_f, k3)
        real_lat.append(np.asarray(jax.device_get(target_lat)))
        pred_lat.append(
            np.asarray(gen_latents).reshape(B, c.n_frames, *gen_latents.shape[1:])
        )

        real = np.asarray(jax.device_get(target_f))
        real = np.clip((np.moveaxis(real, 2, -1) + 1) * 127.5, 0, 255).astype(np.uint8)
        real_videos.append(real)
        pred_videos.append(pred)

    real_videos = np.concatenate(real_videos, axis=0)
    pred_videos = np.concatenate(pred_videos, axis=0)

    if output_dir is not None:
        save_video_grid(
            np.concatenate([real_videos, pred_videos], axis=3),
            os.path.join(output_dir, "real_vs_pred.gif"),
        )

    out = {
        "video_fvd_vae": frechet_distance(
            vae_latent_embeddings(np.concatenate(real_lat, axis=0)),
            vae_latent_embeddings(np.concatenate(pred_lat, axis=0)),
        )
    }
    embedder = get_video_embedder()
    e_real = embedder(real_videos)
    e_pred = embedder(pred_videos)
    metric = "video_fvd" if embedder is not pixel_embeddings else "video_fvd_pixel"
    out[metric] = frechet_distance(e_real, e_pred)
    return out


def test_action_l2(
    policy,
    params,
    val_batches: Iterable[Dict],
    key,
    num_batches: int = 8,
    keypoint_video_path: Optional[str] = None,
) -> Dict[str, float]:
    """policy_model sampling vs ground-truth future chunk -> RMSE.

    With ``keypoint_video_path`` (human_pp's ``keypoints.eval`` mode,
    reference eval/eval.py:282-417), the first batch's frames are written as
    an overlay video: ground-truth keypoints green, predicted red."""
    dists = []
    for bi, batch in enumerate(val_batches):
        if bi >= num_batches:
            break
        obs = image_util.remap_image_keys(policy.task_name, dict(batch["obs"]))
        T = obs["image"].shape[1]
        obs_dict = {k: np.asarray(v[:, : T // 2]) for k, v in obs.items()}
        key, sub = jax.random.split(key)
        result = policy.predict_action(params, obs_dict, sub)
        _, future = frame_util.split_trajectory(
            np.asarray(batch["action"]), T, policy.shift_action,
            policy.use_history_action,
        )
        dists.append(action_l2(result["action_pred"], future))
        if bi == 0 and keypoint_video_path is not None:
            _write_keypoint_overlay(
                np.asarray(obs["image"][0]),
                future[0],
                result["action_pred"][0],
                keypoint_video_path,
            )
    return {"val_action_l2_distances": float(np.mean(dists))}


def _write_keypoint_overlay(
    frames: np.ndarray,
    gt_actions: np.ndarray,
    pred_actions: np.ndarray,
    path: str,
    scale: float = 512.0,
) -> None:
    """(T, 3, H, W) frames + (T', K*2) keypoint chunks -> overlay video
    (gt green / pred red), one overlaid frame per predicted step."""
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    T = min(len(gt_actions), len(pred_actions), len(frames))
    H, W = frames.shape[-2:]
    out = []
    for t in range(T):
        fr = np.moveaxis(np.asarray(frames[t]), 0, -1)
        if fr.dtype != np.uint8:
            fr = (fr * 255.0).astype(np.uint8)
        img = np.ascontiguousarray(fr).copy()
        for kp, color in ((gt_actions[t], (0, 255, 0)),
                          (pred_actions[t], (255, 0, 0))):
            pts = np.asarray(kp, np.float64).reshape(-1, 2) / scale
            for x, y in pts:
                xi, yi = int(x * W), int(y * H)
                if 0 <= xi < W and 0 <= yi < H:
                    img[max(yi - 1, 0): yi + 2, max(xi - 1, 0): xi + 2] = color
        out.append(img)
    imageio.mimwrite(path, out, fps=5)


def save_video_grid(videos: np.ndarray, path: str, fps: int = 10) -> None:
    """(B, T, H, W, 3) uint8 -> animated gif (+ mp4 when cv2 available);
    reference utils/data_utils.py:429-458 equivalent."""
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    B, T, H, W, C = videos.shape
    gw = int(np.ceil(np.sqrt(B)))
    gh = int(np.ceil(B / gw))
    pad = gw * gh - B
    if pad:
        videos = np.concatenate(
            [videos, np.zeros((pad, T, H, W, C), videos.dtype)], axis=0
        )
    grid = videos.reshape(gh, gw, T, H, W, C)
    grid = grid.transpose(2, 0, 3, 1, 4, 5).reshape(T, gh * H, gw * W, C)

    frames = [Image.fromarray(grid[t]) for t in range(T)]
    frames[0].save(
        path, save_all=True, append_images=frames[1:],
        duration=int(1000 / fps), loop=0,
    )
    try:
        import cv2

        mp4 = path.rsplit(".", 1)[0] + ".mp4"
        writer = cv2.VideoWriter(
            mp4, cv2.VideoWriter_fourcc(*"mp4v"), fps, (gw * W, gh * H)
        )
        for t in range(T):
            writer.write(cv2.cvtColor(grid[t], cv2.COLOR_RGB2BGR))
        writer.release()
    except Exception:
        pass
