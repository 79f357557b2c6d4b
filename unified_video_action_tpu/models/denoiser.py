"""Per-token AdaLN-modulated MLP denoiser.

Behavioral equivalent of the reference's ``SimpleMLPAdaLN``
(unified_video_action/model/autoregressive/diffusion_loss.py:192-293), re-designed
for TPU: a pure flax module whose whole forward is a chain of (N, W) matmuls — the
MXU-friendly shape — applied inside a ``lax.scan`` diffusion sampler. Parameters are
fp32; compute dtype is configurable (bf16 for throughput, fp32 for parity testing).

Output convention: ``2 * out_channels`` on the last axis (epsilon ‖ learned-range v).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def timestep_embedding(t: Array, dim: int, max_period: float = 10000.0) -> Array:
    """Sinusoidal timestep embedding, [cos ‖ sin] ordering (GLIDE convention)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def _modulate(x: Array, shift: Array, scale: Array) -> Array:
    return x * (1.0 + scale) + shift


class TimestepEmbed(nn.Module):
    hidden: int
    freq_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: Array) -> Array:
        emb = timestep_embedding(t, self.freq_dim).astype(self.dtype)
        emb = nn.Dense(
            self.hidden,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.02),
            name="fc1",
        )(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(
            self.hidden,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.02),
            name="fc2",
        )(emb)
        return emb


def _dense_cls(quant: bool):
    if quant:
        from unified_video_action_tpu.models.transformer import QuantDense

        return QuantDense
    return nn.Dense


class AdaLNResBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        dense = _dense_cls(self.quant)
        mod = dense(
            3 * self.channels,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="ada_mod",
        )(nn.silu(y))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(x)
        h = _modulate(h, shift, scale)
        h = dense(
            self.channels,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc1",
        )(h)
        h = nn.silu(h)
        h = dense(
            self.channels,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc2",
        )(h)
        return x + gate * h


class AdaLNFinal(nn.Module):
    channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        mod = _dense_cls(self.quant)(
            2 * self.channels,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="ada_mod",
        )(nn.silu(y))
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype, name="ln"
        )(x)
        h = _modulate(h, shift, scale)
        return nn.Dense(
            self.out_channels,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="proj",
        )(h)


class MlpDenoiser(nn.Module):
    """AdaLN MLP denoiser for per-token diffusion.

    Args (mirroring the reference's semantics):
      in_channels: token channel count (16 for video latents; action_dim for actions)
      model_channels: MLP width (1024 in uva.yaml)
      out_channels: usually 2 * in_channels (eps ‖ v)
      z_channels: conditioning width from the MAR decoder (768)
      depth: number of residual blocks (6 in uva.yaml)
    """

    in_channels: int
    model_channels: int
    out_channels: int
    z_channels: int
    depth: int
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # int8 W8A8 dense layers for serving: the N-step sampler scan re-reads
    # every weight each step, so at small token counts the head is
    # weights-traffic bound (PERF.md) — int8 kernels quarter that traffic.
    # Parameter-compatible with the fp path (QuantDense shares names/shapes).
    quant: bool = False

    @nn.compact
    def __call__(self, x: Array, t: Array, c: Array) -> Array:
        """x: (N, in_channels); t: (N,) original timesteps; c: (N, z_channels)."""
        dense = _dense_cls(self.quant)
        h = dense(
            self.model_channels,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="input_proj",
        )(x)
        t_emb = TimestepEmbed(self.model_channels, dtype=self.dtype, name="time_embed")(t)
        c_emb = dense(
            self.model_channels,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="cond_embed",
        )(c)
        y = t_emb + c_emb

        block_cls = AdaLNResBlock
        if self.remat:
            block_cls = nn.remat(AdaLNResBlock)
        for i in range(self.depth):
            h = block_cls(
                self.model_channels, dtype=self.dtype, quant=self.quant,
                name=f"block_{i}",
            )(h, y)
        out = AdaLNFinal(
            self.model_channels, self.out_channels, dtype=self.dtype,
            quant=self.quant, name="final",
        )(h, y)
        return out.astype(jnp.float32)


def cfg_denoise_fn(apply_fn, cfg_scale: float, in_channels: int):
    """Classifier-free-guidance wrapper matching the reference's forward_with_cfg
    (diffusion_loss.py:285-293): first half of the batch is conditional, second
    unconditional; both halves receive the guided epsilon."""

    def fn(x: Array, t: Array, c: Array) -> Array:
        n = x.shape[0] // 2
        half = x[:n]
        combined = jnp.concatenate([half, half], axis=0)
        out = apply_fn(combined, t, c)
        eps, rest = out[:, :in_channels], out[:, in_channels:]
        cond_eps, uncond_eps = eps[:n], eps[n:]
        guided = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([guided, guided], axis=0)
        return jnp.concatenate([eps, rest], axis=1)

    return fn
