"""Pallas int8 matmul kernel (ops/int8_mm.py): interpret-mode correctness vs
the XLA int8 dot, including non-tile-multiple shapes and the full W8A8 op."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from unified_video_action_tpu.ops.int8_mm import (  # noqa: E402
    HAVE_PALLAS,
    int8_matmul_pallas,
    w8a8_matmul,
)
from unified_video_action_tpu.ops.quant import int8_matmul, quantize_weight  # noqa: E402

pytestmark = pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")


@pytest.mark.parametrize("shape", [(256, 768, 256), (100, 128, 130)])
def test_int8_mm_matches_xla(shape):
    M, K, N = shape
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, (M, K)).astype(np.int8)
    w = rng.integers(-127, 128, (K, N)).astype(np.int8)
    want = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    got = int8_matmul_pallas(x, w, bm=128, bn=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_w8a8_backends_agree():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 96, 768)).astype(np.float32)
    w = rng.standard_normal((768, 512)).astype(np.float32) * 0.05
    q = quantize_weight(jnp.asarray(w))
    ref = int8_matmul(jnp.asarray(x), q["kernel_q"], q["scale"])
    via_xla = w8a8_matmul(jnp.asarray(x), q["kernel_q"], q["scale"], backend="xla")
    via_pl = w8a8_matmul(
        jnp.asarray(x), q["kernel_q"], q["scale"], backend="pallas", interpret=True
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(via_xla), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(via_pl), rtol=1e-5)
