"""CLIP text tower in flax (TPU-native language conditioning).

The reference encodes language goals with the frozen HF
``openai/clip-vit-base-patch32`` text model on the GPU
(utils/language_model.py:7-33, policy/unified_video_action_policy.py:71-78).
Here the tower itself is a jax/flax module so goal encoding runs on-device
under jit with the rest of the policy; pretrained HF torch weights load via
``models/torch_import.import_clip_text``. Architecture (public CLIP):
token+position embeddings → pre-LN causal transformer (quick-GELU MLP) →
final LN → EOT-token pooling → linear projection to the 512-d joint space.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_layers: int = 12
    num_heads: int = 8
    max_position_embeddings: int = 77
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    dtype: Any = jnp.float32


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class ClipAttention(nn.Module):
    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, x: Array, causal_mask: Array) -> Array:
        c = self.cfg
        B, N, D = x.shape
        H = c.num_heads
        hd = D // H
        dense = lambda name: nn.Dense(D, dtype=c.dtype, name=name)
        q = dense("q_proj")(x).reshape(B, N, H, hd)
        k = dense("k_proj")(x).reshape(B, N, H, hd)
        v = dense("v_proj")(x).reshape(B, N, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
        logits = jnp.where(causal_mask, logits, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            c.dtype
        )
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, D)
        return dense("out_proj")(out)


class ClipLayer(nn.Module):
    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, x: Array, causal_mask: Array) -> Array:
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         name="layer_norm1")(x)
        x = x + ClipAttention(c, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="fc2")(h)
        return x + h


class ClipTextModel(nn.Module):
    """input_ids (B, N) int32 → text_embeds (B, projection_dim)."""

    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, input_ids: Array) -> Array:
        c = self.cfg
        B, N = input_ids.shape
        tok = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (c.vocab_size, c.hidden_size),
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (c.max_position_embeddings, c.hidden_size),
        )
        x = tok[input_ids] + pos[None, :N]
        x = x.astype(c.dtype)
        causal = jnp.tril(jnp.ones((N, N), bool))[None, None]
        for i in range(c.num_layers):
            x = ClipLayer(c, name=f"layer_{i}")(x, causal)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=c.dtype, name="final_layer_norm"
        )(x)
        # EOT pooling at the FIRST eos token (HF semantics; for the released
        # openai CLIP vocab eos = 49407 = the highest id, so this matches the
        # legacy argmax pooling too)
        eot = jnp.argmax(
            (input_ids == c.eos_token_id).astype(jnp.int32), axis=-1
        )
        pooled = x[jnp.arange(B), eot]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(0.02),
            (c.hidden_size, c.projection_dim),
        )
        return pooled @ proj.astype(pooled.dtype)
