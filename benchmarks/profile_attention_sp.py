"""Single-pass (whole-KV-in-VMEM) flash attention vs XLA at serving batch."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")

from unified_video_action_tpu.ops.attention import flash_attention
from unified_video_action_tpu.utils.profiling import benchmark_fn

B, N, H, D = (int(x) for x in os.environ.get("SHAPE", "128,1088,12,64").split(","))
REPS = int(os.environ.get("REPS", "8"))
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


def chained(fn):
    @jax.jit
    def run(q, k, v):
        def body(qc, _):
            return fn(qc, k, v), ()

        out, _ = jax.lax.scan(body, q, None, length=REPS)
        return out

    return run


o1 = jax.device_get(xla_attn(q, k, v)).astype("float32")

variants = [("xla", xla_attn)]
for bq in (128, 256, 512):
    variants.append(
        (
            f"sp{bq}",
            (lambda bq: jax.jit(
                lambda q, k, v: flash_attention(
                    q, k, v, block_q=bq, single_pass=True
                )
            ))(bq),
        )
    )

for name, fn in variants:
    o = jax.device_get(fn(q, k, v)).astype("float32")
    err = np.abs(o1 - o).max()
    r = benchmark_fn(chained(fn), q, k, v, iters=6)
    t = r["p50_s"] / REPS
    print(
        f"{name:8s}: {t*1e3:7.2f} ms/op  {flops/t/1e12:6.1f} TF/s  err {err:.1e}",
        flush=True,
    )
