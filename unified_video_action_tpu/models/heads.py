"""Per-token diffusion heads: video (DiffLoss) and action/proprioception
(DiffActLoss) equivalents.

Reference behavior (diffusion_loss.py:8-90, diffusion_action_loss.py:9-233):
* Video head: flatten (B, L, C) tokens to (B·L, C); per-token 1000-step cosine
  training diffusion; 100-step respaced ancestral sampling with temperature,
  clip_denoised=False; loss masked-mean over predicted tokens.
* Action head: pool the 1024 decoder tokens into 16 action-slot latents first
  (``conv_fc``: per-frame 3×3 conv → 4×4 avg-pool → MLP → linear frame→slot
  interpolation → refine MLP), then the same per-token diffusion over action
  chunks; sampling uses clip_denoised=True.

TPU-native: the samplers are ``lax.scan`` bodies over static step counts; the
pooling path is NHWC; everything jits into a single XLA computation.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unified_video_action_tpu.models.denoiser import MlpDenoiser, cfg_denoise_fn
from unified_video_action_tpu.models.diffusion import GaussianDiffusion, create_diffusion

Array = jax.Array


class VideoDiffusionHead(nn.Module):
    """DiffLoss equivalent."""

    target_channels: int  # 16 (token embed dim)
    z_channels: int       # decoder width (768)
    width: int            # 1024
    depth: int            # 6
    num_sampling_steps: str = "100"
    dtype: jnp.dtype = jnp.float32
    quant: bool = False  # int8 W8A8 denoiser (serving; param-compatible)

    def setup(self):
        self.net = MlpDenoiser(
            in_channels=self.target_channels,
            model_channels=self.width,
            out_channels=self.target_channels * 2,
            z_channels=self.z_channels,
            depth=self.depth,
            dtype=self.dtype,
            quant=self.quant,
        )
        self.train_diffusion = create_diffusion("", noise_schedule="cosine")
        self.gen_diffusion = create_diffusion(
            self.num_sampling_steps, noise_schedule="cosine"
        )

    def __call__(self, target: Array, z: Array, mask: Array, key: Array) -> Array:
        """Masked-mean diffusion loss. target/z: (B, L, C)/(B, L, D); mask (B, L)."""
        B, L, C = target.shape
        target = target.reshape(B * L, C)
        z = z.reshape(B * L, -1)
        mask = mask.reshape(B * L)
        t_key, noise_key = jax.random.split(key)
        t = jax.random.randint(
            t_key, (B * L,), 0, self.train_diffusion.num_timesteps
        )
        denoise = lambda x_t, tt: self.net(x_t, tt, z)
        out = self.train_diffusion.training_losses(denoise, target, t, noise_key)
        loss = out["loss"]
        return (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)

    def sample(
        self,
        z: Array,
        key: Array,
        temperature: float = 1.0,
        cfg: float = 1.0,
    ) -> Array:
        """z: (N, D) conditioning -> (N, C) sampled tokens."""
        noise_key, loop_key = jax.random.split(key)
        if cfg != 1.0:
            n = z.shape[0] // 2
            noise = jax.random.normal(noise_key, (n, self.target_channels))
            noise = jnp.concatenate([noise, noise], axis=0)
            base = lambda x_t, tt, c: self.net(x_t, tt, c)
            guided = cfg_denoise_fn(base, cfg, self.target_channels)
            denoise = lambda x_t, tt: guided(x_t, tt, z)
        else:
            noise = jax.random.normal(noise_key, (z.shape[0], self.target_channels))
            denoise = lambda x_t, tt: self.net(x_t, tt, z)
        return self.gen_diffusion.p_sample_loop(
            denoise, noise, loop_key, clip_denoised=False, temperature=temperature
        )


def _adaptive_pool_matrix(W: int, out: int) -> "np.ndarray":
    """(out, W) row-stochastic matrix implementing torch AdaptiveAvgPool1d
    windows along one axis."""
    import numpy as np

    P = np.zeros((out, W), np.float32)
    for i in range(out):
        a = (i * W) // out
        b = -(-((i + 1) * W) // out)
        P[i, a:b] = 1.0 / (b - a)
    return P


class ConvFcPool(nn.Module):
    """``conv_fc`` token pooling: (B, T·S, D) decoder tokens -> (B, 16, D)
    action-slot latents (diffusion_action_loss.py:35-61,112-124)."""

    z_channels: int
    n_frames: int = 4
    num_actions: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        B, TS, D = z.shape
        T = self.n_frames
        S = TS // T
        W = int(round(S ** 0.5))
        assert W * W == S, (TS, T, S)
        z = z.reshape(B * T, W, W, D)  # NHWC, spatial (w, h) row-major
        z = nn.Conv(D, (3, 3), padding=1, dtype=self.dtype, name="conv")(z)
        z = nn.relu(z)
        # adaptive avg pool to 4x4 (reference AdaptiveAvgPool2d((4,4))): true
        # torch semantics for ANY grid width — window i spans
        # [floor(iW/4), ceil((i+1)W/4)), overlapping when W % 4 != 0 (e.g.
        # the 6x6 grid of the 96px single-chip config) and reducing to the
        # plain strided mean when W % 4 == 0 (256px/16 -> 16x16)
        P = jnp.asarray(_adaptive_pool_matrix(W, 4), dtype=z.dtype)
        z = jnp.einsum("iw,bwhd,jh->bijd", P, z, P)
        # flatten in torch (c, w, h) order to keep fc weights compatible
        z = jnp.transpose(z, (0, 3, 1, 2)).reshape(B * T, D * 16)
        z = nn.Dense(D, dtype=self.dtype, name="fc1")(z)
        z = nn.relu(z)
        z = nn.Dense(D, dtype=self.dtype, name="fc2")(z)
        z = z.reshape(B, T, D)
        # linear interpolation over the frame axis: T slots -> num_actions slots
        z = jnp.swapaxes(z, 1, 2)  # (B, D, T)
        z = nn.Dense(self.num_actions, dtype=self.dtype, name="interpolate")(z)
        z = jnp.swapaxes(z, 1, 2)  # (B, num_actions, D)
        z = nn.Dense(D, dtype=self.dtype, name="refine1")(z)
        z = nn.relu(z)
        z = nn.Dense(D, dtype=self.dtype, name="refine2")(z)
        return z


class ConvOriPool(nn.Module):
    """``conv_ori`` variant: temporal ConvTranspose3d (4 frames -> 16 slots)
    + global spatial average (diffusion_action_loss.py:63-72,126-135)."""

    z_channels: int
    n_frames: int = 4
    num_actions: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        B, TS, D = z.shape
        T = self.n_frames
        S = TS // T
        W = int(round(S ** 0.5))
        z = z.reshape(B, T, W, W, D)  # NDHWC
        z = nn.ConvTranspose(
            D, kernel_size=(4, 1, 1), strides=(4, 1, 1), dtype=self.dtype,
            name="conv_transpose3d",
        )(z)
        return z.mean(axis=(2, 3))  # (B, 16, D)


class Conv2Pool(nn.Module):
    """``conv2`` variant: tokens-as-channels Conv1d stack 1024 -> 256 -> 16
    convolving along the feature axis (diffusion_action_loss.py:74-79)."""

    z_channels: int
    num_actions: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        # (B, TS, D) -> (B, D, TS): conv along D with TS input channels
        x = jnp.swapaxes(z, 1, 2)
        x = nn.Conv(256, kernel_size=(7,), padding=3, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_actions, kernel_size=(7,), padding=3,
                    dtype=self.dtype, name="conv2")(x)
        return jnp.swapaxes(x, 1, 2)  # (B, 16, D)


class Fc2Pool(nn.Module):
    """``fc2`` variant: token-mixing MLP 1024 -> 256 -> 16
    (diffusion_action_loss.py:81-86)."""

    z_channels: int
    num_actions: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        x = jnp.swapaxes(z, 1, 2)  # (B, D, TS)
        x = nn.Dense(256, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_actions, dtype=self.dtype, name="fc2")(x)
        return jnp.swapaxes(x, 1, 2)


class ActionDiffusionHead(nn.Module):
    """DiffActLoss equivalent (``conv_fc`` variant; also used for proprioception)."""

    target_channels: int  # action dim
    z_channels: int
    width: int
    depth: int
    n_frames: int = 4
    num_actions: int = 16
    act_diff_training_steps: int = 1000
    act_diff_testing_steps: str = "100"
    act_model_type: str = "conv_fc"
    dtype: jnp.dtype = jnp.float32
    quant: bool = False  # int8 W8A8 denoiser (serving; param-compatible)

    def setup(self):
        pool_cls = {
            "conv_fc": ConvFcPool,
            "conv_ori": ConvOriPool,
            "conv2": Conv2Pool,
            "fc2": Fc2Pool,
        }
        if self.act_model_type not in pool_cls:
            raise NotImplementedError(self.act_model_type)
        kwargs = dict(num_actions=self.num_actions, dtype=self.dtype)
        if self.act_model_type in ("conv_fc", "conv_ori"):
            kwargs["n_frames"] = self.n_frames
        self.pool = pool_cls[self.act_model_type](self.z_channels, **kwargs)
        self.net = MlpDenoiser(
            in_channels=self.target_channels,
            model_channels=self.width,
            out_channels=self.target_channels * 2,
            z_channels=self.z_channels,
            depth=self.depth,
            dtype=self.dtype,
            quant=self.quant,
        )
        self.train_diffusion = create_diffusion(
            "", noise_schedule="cosine", diffusion_steps=self.act_diff_training_steps
        )
        self.gen_diffusion = create_diffusion(
            self.act_diff_testing_steps, noise_schedule="cosine"
        )

    def __call__(self, target: Array, z: Array, key: Array) -> Array:
        """target: (B, num_actions, A); z: (B, T·S, D) decoder tokens."""
        B, L, A = target.shape
        assert L == self.num_actions, (
            f"action chunk length {L} != head num_actions {self.num_actions}; "
            "horizon must be 2*num_actions (reference horizon 32 -> 16-step chunk)"
        )
        pooled = self.pool(z).reshape(B * L, -1)
        target = target.reshape(B * L, A)
        t_key, noise_key = jax.random.split(key)
        t = jax.random.randint(
            t_key, (B * L,), 0, self.train_diffusion.num_timesteps
        )
        denoise = lambda x_t, tt: self.net(x_t, tt, pooled)
        out = self.train_diffusion.training_losses(denoise, target, t, noise_key)
        return out["loss"].mean()

    def sample(
        self,
        z: Array,
        key: Array,
        temperature: float = 1.0,
        cfg: float = 1.0,
    ) -> Array:
        """z: (B, T·S, D) -> (B, num_actions, A) sampled action chunk."""
        B = z.shape[0]
        pooled = self.pool(z)
        L = pooled.shape[1]
        cond = pooled.reshape(B * L, -1)
        noise_key, loop_key = jax.random.split(key)
        if cfg != 1.0:
            n = cond.shape[0] // 2
            noise = jax.random.normal(noise_key, (n, self.target_channels))
            noise = jnp.concatenate([noise, noise], axis=0)
            base = lambda x_t, tt, c: self.net(x_t, tt, c)
            guided = cfg_denoise_fn(base, cfg, self.target_channels)
            denoise = lambda x_t, tt: guided(x_t, tt, cond)
        else:
            noise = jax.random.normal(noise_key, (B * L, self.target_channels))
            denoise = lambda x_t, tt: self.net(x_t, tt, cond)
        out = self.gen_diffusion.p_sample_loop(
            denoise, noise, loop_key, clip_denoised=True, temperature=temperature
        )
        return out.reshape(B, L, self.target_channels)
