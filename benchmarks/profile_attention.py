"""Attention implementations on the real chip at the MAR's shape.

(B, N, H, D) = (32, 1088, 12, 64), bf16. Compares XLA einsum attention
(fp32 softmax materializing the (N, N) logits) vs the Pallas flash kernel
(online softmax, bf16 matmul inputs). Honest timing via benchmark_fn
(per-iteration input perturbation beats the axon relay's memoization).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")

from unified_video_action_tpu.ops.attention import flash_attention
from unified_video_action_tpu.utils.profiling import benchmark_fn

B, N, H, D = (int(x) for x in os.environ.get("SHAPE", "32,1088,12,64").split(","))
key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (B, N, H, D), jnp.bfloat16)
k = jax.random.normal(kk, (B, N, H, D), jnp.bfloat16)
v = jax.random.normal(kv, (B, N, H, D), jnp.bfloat16)

flops = 4 * B * H * N * N * D


@jax.jit
def xla_attn(q, k, v):
    scale = D ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


@jax.jit
def pallas_attn(q, k, v):
    return flash_attention(q, k, v)


# parity first
o1 = jax.device_get(xla_attn(q, k, v)).astype("float32")
o2 = jax.device_get(pallas_attn(q, k, v)).astype("float32")
import numpy as np

err = np.abs(o1 - o2).max()
print(f"max |xla - pallas| = {err:.3e}")
assert err < 2e-2, err

# The ~33 ms fixed dispatch cost (PERF.md) swamps a single op; chain the op
# REPS times inside one program (output feeds back as q) so compute dominates.
REPS = int(os.environ.get("REPS", "12"))


def chained(fn):
    @jax.jit
    def run(q, k, v):
        def body(qc, _):
            o = fn(qc, k, v)
            return o, ()

        out, _ = jax.lax.scan(body, q, None, length=REPS)
        return out

    return run


for name, fn in [("xla", xla_attn), ("pallas", pallas_attn)]:
    r = benchmark_fn(chained(fn), q, k, v, iters=6)
    t = r["p50_s"] / REPS
    print(f"{name:8s}: {t*1e3:7.2f} ms/op  {flops/t/1e12:6.1f} TF/s", flush=True)


# stock jax pallas flash attention (B, H, N, D layout); seq padded to a
# multiple of 128 with segment-id masking (1088 -> 1152)
from jax.experimental.pallas.ops.tpu.flash_attention import (
    SegmentIds,
    flash_attention as jax_flash,
)

PAD = (-N) % 128


@jax.jit
def stock_attn(q, k, v):
    def prep(x):
        x = jnp.swapaxes(x, 1, 2)
        return jnp.pad(x, ((0, 0), (0, 0), (0, PAD), (0, 0)))

    seg = jnp.concatenate(
        [jnp.ones((B, N), jnp.int32), jnp.full((B, PAD), 2, jnp.int32)], axis=1
    )
    o = jax_flash(
        prep(q), prep(k), prep(v), causal=False, sm_scale=D ** -0.5,
        segment_ids=SegmentIds(q=seg, kv=seg),
    )
    return jnp.swapaxes(o[:, :, :N], 1, 2)


o3 = jax.device_get(stock_attn(q, k, v)).astype("float32")
print(f"max |xla - stock| = {np.abs(o1 - o3).max():.3e}", flush=True)
r = benchmark_fn(chained(stock_attn), q, k, v, iters=6)
t = r["p50_s"] / REPS
print(f"{'stock':8s}: {t*1e3:7.2f} ms/op  {flops/t/1e12:6.1f} TF/s", flush=True)


@jax.jit
def pallas_384(q, k, v):
    return flash_attention(q, k, v, block_q=384, block_k=384)


@jax.jit
def pallas_1152_128(q, k, v):
    return flash_attention(q, k, v, block_q=1152, block_k=128)


@jax.jit
def xla_bf16_softmax(q, k, v):
    scale = D ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    attn = jax.nn.softmax(logits, axis=-1)  # bf16 end-to-end
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


for name, fn in [
    ("pl384", pallas_384),
    ("pl1152q", pallas_1152_128),
    ("xla_bf16", xla_bf16_softmax),
]:
    o = jax.device_get(jax.jit(fn)(q, k, v)).astype("float32")
    err2 = np.abs(o1 - o).max()
    r = benchmark_fn(chained(fn), q, k, v, iters=6)
    t = r["p50_s"] / REPS
    print(
        f"{name:8s}: {t*1e3:7.2f} ms/op  {flops/t/1e12:6.1f} TF/s  err {err2:.1e}",
        flush=True,
    )
