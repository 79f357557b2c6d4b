"""KL-16 image tokenizer (LDM-style conv VAE), TPU-native.

Behavioral equivalent of the reference's frozen ``AutoencoderKL``
(unified_video_action/vae/vaekl.py:1-504): 256×256×3 -> 16×16×16 latents
(stride 16), GroupNorm(32, eps=1e-6) + swish, attention at resolution 16 in the
encoder and in both mid blocks, asymmetric (0,1,0,1) zero-pad before the
stride-2 downsample conv, nearest ×2 upsampling in the decoder.

TPU-first design choices:
* NHWC layout end-to-end (XLA's native conv layout on TPU); NCHW adapters at
  the API boundary so callers keep the reference's tensor convention.
* 1×1 convolutions (attention q/k/v/proj, quant convs, nin shortcuts) are
  ``nn.Dense`` over the channel axis — identical math, cleaner fusion.
* Params fp32, compute dtype configurable (bf16 inference path).

The VAE is always frozen in this framework (as in the reference); weights come
from ``torch_import.import_kl_vae`` applied to the ``kl16.ckpt`` state dict.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _swish(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_channels = x.shape[-1]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = _swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = _swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Dense(self.out_channels, dtype=self.dtype, name="shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        q = nn.Dense(C, dtype=self.dtype, name="q")(h).reshape(B, H * W, C)
        k = nn.Dense(C, dtype=self.dtype, name="k")(h).reshape(B, H * W, C)
        v = nn.Dense(C, dtype=self.dtype, name="v")(h).reshape(B, H * W, C)
        attn = jnp.einsum("bqc,bkc->bqk", q, k) * (C ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        h = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(B, H, W, C)
        h = nn.Dense(C, dtype=self.dtype, name="proj_out")(h)
        return x + h


class Downsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # reference uses asymmetric (0,1,0,1) zero pad then VALID stride-2 conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            x.shape[-1], (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    resolution: int = 256
    z_channels: int = 16
    double_z: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        curr_res = self.resolution
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * mult, dtype=self.dtype, name=f"down_{i}_block_{j}")(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, name=f"down_{i}_attn_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        h = _swish(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()  # reference decoder has no per-level attn
    resolution: int = 256
    out_ch: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        n_levels = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr_res = self.resolution // 2 ** (n_levels - 1)
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, dtype=self.dtype, name="mid_block_2")(h)
        for i in reversed(range(n_levels)):
            block_out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = ResnetBlock(block_out, dtype=self.dtype, name=f"up_{i}_block_{j}")(h)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype, name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i}_upsample")(h)
                curr_res *= 2
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm_out")(h)
        h = _swish(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class KLVae(nn.Module):
    """AutoencoderKL. Public API is NCHW to match the reference convention;
    internally NHWC. ``encode`` returns (mean, logvar); sampling is explicit."""

    embed_dim: int = 16
    ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    resolution: int = 256
    ch: int = 128
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch,
            ch_mult=self.ch_mult,
            z_channels=self.embed_dim,
            resolution=self.resolution,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=self.ch,
            ch_mult=self.ch_mult,
            resolution=self.resolution,
            dtype=self.dtype,
        )
        self.quant_conv = nn.Dense(2 * self.embed_dim, dtype=self.dtype)
        self.post_quant_conv = nn.Dense(self.embed_dim, dtype=self.dtype)

    def encode(self, x_nchw: Array) -> Tuple[Array, Array]:
        """x: (B, 3, H, W) in [-1, 1] -> (mean, logvar) each (B, C, h, w)."""
        x = jnp.transpose(x_nchw, (0, 2, 3, 1)).astype(self.dtype)
        moments = self.quant_conv(self.encoder(x))
        moments = jnp.transpose(moments, (0, 3, 1, 2)).astype(jnp.float32)
        mean, logvar = jnp.split(moments, 2, axis=1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def decode(self, z_nchw: Array) -> Array:
        z = jnp.transpose(z_nchw, (0, 2, 3, 1)).astype(self.dtype)
        dec = self.decoder(self.post_quant_conv(z))
        return jnp.transpose(dec, (0, 3, 1, 2)).astype(jnp.float32)

    def __call__(self, x_nchw: Array, key: Array) -> Array:
        mean, logvar = self.encode(x_nchw)
        z = sample_posterior(mean, logvar, key)
        return self.decode(z)


def sample_posterior(mean: Array, logvar: Array, key: Array) -> Array:
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)


# The reference scales sampled latents by 0.2325 before the MAR and divides back
# before decoding (utils/data_utils.py:396, eval/eval.py:204).
LATENT_SCALE = 0.2325
