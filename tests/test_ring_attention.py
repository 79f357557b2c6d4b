"""Ring attention (parallel/ring_attention.py) vs dense attention on the
8-virtual-device CPU mesh: exactness of the streaming-softmax ring pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unified_video_action_tpu.parallel.mesh import make_mesh
from unified_video_action_tpu.parallel.ring_attention import ring_attention


def _dense(q, k, v):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (q.shape[-1] ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("L", [64, 128])
def test_matches_dense(L):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=8)
    rng = np.random.default_rng(0)
    B, H, Dh = 2, 3, 16
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
        for _ in range(3)
    )
    got = ring_attention(q, k, v, mesh, axis="data")
    want = _dense(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_jit_and_grad():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=8)
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 2, 64, 8)), jnp.float32)
        for _ in range(3)
    )

    @jax.jit
    def loss(q, k, v):
        return ring_attention(q, k, v, mesh).sum()

    g = jax.grad(loss)(q, k, v)
    def dense_loss(q, k, v):
        return _dense(q, k, v).sum()
    g_want = jax.grad(dense_loss)(q, k, v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_want), atol=2e-4)
