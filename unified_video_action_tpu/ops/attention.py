"""Pallas TPU flash attention for the MAR encoder/decoder blocks.

The MAR attends over 1088 tokens (64 text + 4×256 video) at d=768 / 12 heads
(SURVEY.md §5.7) — small enough that one (q-block × full-KV) streaming pass per
grid cell is optimal. This kernel:

* tiles queries into MXU-aligned blocks and streams K/V blocks with an online
  (log-sum-exp) softmax — no (N, N) attention matrix ever hits HBM;
* accumulates in fp32 regardless of the bf16 input dtype;
* handles non-multiple-of-block sequence lengths by padding + masking the
  final KV block (1088 = 8.5 × 128).

Layout: q/k/v are (B, N, H, D) as produced by the fused qkv projection;
the kernel runs on a (B·H, num_q_blocks) grid.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
NEG_INF = -1e30


def _attn_kernel_single_pass(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len):
    """One q-block vs the WHOLE (VMEM-resident) KV, exact softmax in one pass.

    At the MAR's sequence lengths the full K/V for one (batch, head) is a few
    hundred KB — far under VMEM — so the online-softmax streaming schedule
    (repeated max/exp rescaling + a fori_loop Mosaic can't software-pipeline
    well) is pure overhead. Two big matmuls + one plain softmax instead.
    q_ref: (1, block_q, d); k_ref/v_ref: (1, padded_seq, d).
    """
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    block_q = q.shape[0]
    padded_seq = k.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, padded_seq) fp32, lives in VMEM only
    if padded_seq != seq_len:
        kv_idx = jax.lax.broadcasted_iota(
            jnp.int32, (block_q, padded_seq), 1
        )
        s = jnp.where(kv_idx < seq_len, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, :, :] = (acc / l).astype(o_ref.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, seq_len):
    """One q-block vs all kv-blocks, online softmax.

    q_ref: (block_q, d); k_ref/v_ref: (padded_seq, d); o_ref: (block_q, d).
    """
    # Keep matmul INPUTS in the model dtype (bf16): the MXU runs bf16×bf16
    # at 2× its fp32 rate; accumulation stays fp32 via preferred_element_type.
    # (Casting q/k/v to fp32 before the dots — the round-1 version — halved
    # MXU throughput, which is why pallas measured no better than XLA then.)
    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)
    block_q, d = q.shape
    padded_seq = k_ref.shape[1]
    num_kv = padded_seq // block_k

    m = jnp.full((block_q, 1), NEG_INF, dtype=jnp.float32)
    l = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc = jnp.zeros((block_q, d), dtype=jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k) fp32
        # mask padded kv positions
        kv_idx = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = jnp.where(kv_idx < seq_len, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m, l, acc))
    o_ref[0, :, :] = (acc / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret", "single_pass")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    single_pass: Optional[bool] = None,
) -> jax.Array:
    """q, k, v: (B, N, H, D) -> (B, N, H, D). Full (non-causal) attention.

    ``single_pass`` selects the whole-KV-in-VMEM exact-softmax kernel; by
    default it is used whenever the padded KV for one head fits comfortably
    in VMEM (true for every MAR configuration — ctx ≤ 2048).
    """
    B, N, H, D = q.shape
    scale = D ** -0.5

    block_q = min(block_q, _round_up(N, 128))
    block_k = min(block_k, _round_up(N, 128))
    padded = _round_up(N, max(block_q, block_k))
    if single_pass is None:
        single_pass = padded <= 2048

    def prep(x):
        x = jnp.swapaxes(x, 1, 2).reshape(B * H, N, D)
        if padded != N:
            x = jnp.pad(x, ((0, 0), (0, padded - N), (0, 0)))
        return x

    qf, kf, vf = prep(q), prep(k), prep(v)

    grid = (B * H, padded // block_q)
    if single_pass:
        kernel = functools.partial(
            _attn_kernel_single_pass, scale=scale, seq_len=N
        )
    else:
        kernel = functools.partial(
            _attn_kernel, scale=scale, block_k=block_k, seq_len=N
        )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * H, padded, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, D), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, padded, D), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, padded, D), lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, D), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * D,
            bytes_accessed=(3 * B * H * N * D + B * H * N * D) * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
    )(qf, kf, vf)
    out = out[:, :N, :].reshape(B, H, N, D)
    return jnp.swapaxes(out, 1, 2)
