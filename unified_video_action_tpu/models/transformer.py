"""ViT encoder/decoder blocks for the MAR unified transformer.

Behavioral equivalent of timm's ``vision_transformer.Block`` as used by the
reference (mar_con_unified.py:200-252): pre-LN (eps=1e-6), multi-head attention
with a fused qkv projection (qkv_bias=True), 4× GELU MLP, residual adds,
attention/projection dropout. LayerScale and drop-path are disabled in the
reference's configuration and therefore omitted.

TPU-first: the fused qkv keeps one big (N, 3D) matmul on the MXU; attention is
jnp einsum by default with an optional Pallas flash-attention path
(ops/attention.py) selected via ``attn_impl``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def tied_dropout(
    module: nn.Module, x: Array, rate: float, deterministic: bool
) -> Array:
    """Dropout whose mask generation is data-dependent on ``x``.

    ``nn.Dropout``'s mask depends only on the fold-in RNG key, so XLA's
    scheduler is free to hoist every block's mask generation to program
    start — at mar_base/256px each attention mask's raw bits are a
    u32[B, H, 1024, 1024] temp (768 MB at B=16), and with all ~24 blocks'
    bits coexisting the program needs >25 GB HBM and fails to compile
    (artifacts/round4/mar_base_256_gc_on_b16.log). An
    ``optimization_barrier`` tying the key to the block input makes each
    mask's lifetime track its block, so peak temp memory is one mask.

    Distribution-identical to ``nn.Dropout`` (same ``make_rng('dropout')``
    stream, same bernoulli draw, same 1/keep scaling).
    """
    if deterministic or rate == 0.0:
        return x
    rng = module.make_rng("dropout")
    rng, x = jax.lax.optimization_barrier((rng, x))
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


class QuantDense(nn.Module):
    """Dense layer that runs its matmul int8 on the MXU (W8A8 serving).

    Parameter-compatible with ``nn.Dense`` (fp ``kernel`` + ``bias``), so a
    trained tree drives it unchanged; weights are quantized inside the jitted
    program (per-output-channel symmetric int8 — sub-ms for MAR-Base, hoisted
    traffic ~0.3 GB/step) and activations per-token dynamically. The v5e MXU
    runs int8×int8→int32 at 2× its bf16 rate (ops/quant.py).
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from unified_video_action_tpu.ops.quant import int8_matmul, quantize_weight

        kernel = self.param(
            "kernel",
            self.kernel_init,
            (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        wq = quantize_weight(kernel)
        y = int8_matmul(x, wq["kernel_q"], wq["scale"])
        return y + bias.astype(y.dtype)


class MultiHeadAttention(nn.Module):
    dim: int
    num_heads: int
    attn_dropout: float = 0.0
    proj_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # "xla" | "pallas" | "ring[:axis]" — ring runs sequence-parallel exact
    # attention (parallel/ring_attention.py) and requires being applied
    # under shard_map with the named mesh axis sharding the token dim; all
    # token-local ops (qkv/proj/mlp/LN) are unchanged under that sharding
    attn_impl: str = "xla"
    quant: bool = False  # int8 W8A8 dense projections (serving only)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        B, N, D = x.shape
        H = self.num_heads
        hd = D // H
        dense = QuantDense if self.quant else nn.Dense
        qkv = dense(3 * D, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)

        if self.attn_impl == "pallas":
            from unified_video_action_tpu.ops.attention import flash_attention

            out = flash_attention(q, k, v)  # (B, N, H, hd)
        elif self.attn_impl.startswith("ring"):
            from unified_video_action_tpu.parallel.ring_attention import (
                ring_attention_local,
            )

            assert self.attn_dropout == 0.0 or deterministic, (
                "ring attention has no attention-weight dropout"
            )
            axis = (
                self.attn_impl.split(":", 1)[1]
                if ":" in self.attn_impl else "seq"
            )
            out = ring_attention_local(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                axis_name=axis,
            ).transpose(0, 2, 1, 3)  # back to (B, N, H, hd)
        else:
            scale = hd ** -0.5
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
                self.dtype
            )
            attn = tied_dropout(self, attn, self.attn_dropout, deterministic)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)

        out = out.reshape(B, N, D)
        out = dense(D, dtype=self.dtype, name="proj")(out)
        out = tied_dropout(self, out, self.proj_dropout, deterministic)
        return out


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    attn_dropout: float = 0.0
    proj_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    quant: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        dense = QuantDense if self.quant else nn.Dense
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(
            self.dim,
            self.num_heads,
            self.attn_dropout,
            self.proj_dropout,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            quant=self.quant,
            name="attn",
        )(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        h = dense(hidden, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        h = tied_dropout(self, h, self.proj_dropout, deterministic)
        return x + h


class TransformerStack(nn.Module):
    depth: int
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    attn_dropout: float = 0.0
    proj_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    quant: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        block_cls = ViTBlock
        if self.remat:
            block_cls = nn.remat(ViTBlock, static_argnums=(2,))
        for i in range(self.depth):
            x = block_cls(
                self.dim,
                self.num_heads,
                self.mlp_ratio,
                self.attn_dropout,
                self.proj_dropout,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                quant=self.quant,
                name=f"block_{i}",
            )(x, deterministic)
        return x
