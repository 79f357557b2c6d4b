"""Pallas kernels: correctness vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unified_video_action_tpu.ops.attention import flash_attention


def _reference_attention(q, k, v):
    D = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (D ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("N", [128, 200, 1088])
def test_flash_attention_matches_reference(N):
    B, H, D = 2, 3, 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, N, H, D))
    k = jax.random.normal(k2, (B, N, H, D))
    v = jax.random.normal(k3, (B, N, H, D))
    want = _reference_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=2e-5)


def test_flash_attention_bf16():
    B, N, H, D = 1, 256, 2, 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(k1, (B, N, H, D), dtype=jnp.bfloat16)
    k = jax.random.normal(k2, (B, N, H, D), dtype=jnp.bfloat16)
    v = jax.random.normal(k3, (B, N, H, D), dtype=jnp.bfloat16)
    want = _reference_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    got = flash_attention(q, k, v, interpret=True).astype(jnp.float32)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=3e-2)
