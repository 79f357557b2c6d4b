"""Int8 vs bf16 matmul rate at MAR serving shapes, and the W8A8 dense op."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")

from unified_video_action_tpu.ops.quant import int8_matmul, quantize_weight
from unified_video_action_tpu.utils.profiling import benchmark_fn

# MAR-Base serving: tokens = B*N = 128*1088, fused qkv-like (768 -> 2304)
M = int(os.environ.get("M", str(128 * 1088)))
K = int(os.environ.get("K", "768"))
N = int(os.environ.get("N", "2304"))
REPS = int(os.environ.get("REPS", "8"))

kx, kw = jax.random.split(jax.random.PRNGKey(0))
x_bf = jax.random.normal(kx, (M, K), jnp.bfloat16)
w_bf = jax.random.normal(kw, (K, N), jnp.bfloat16) * 0.02
x_i8 = jnp.clip(jnp.round(x_bf.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
w_i8 = jnp.clip(jnp.round(w_bf.astype(jnp.float32) * 500), -127, 127).astype(jnp.int8)
wq = quantize_weight(w_bf.astype(jnp.float32))
flops = 2 * M * K * N


def chain(fn, x0):
    @jax.jit
    def run(x, w):
        def body(xc, _):
            y = fn(xc, w)
            # feed a slice back so the chain stays shape-stable
            return y[:, :K].astype(x0.dtype), ()

        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return out

    return run


@jax.jit
def bf16_mm(x, w):
    return jax.lax.dot(x, w, precision=None)


@jax.jit
def int8_mm(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


@jax.jit
def w8a8(x, w):
    del w
    return int8_matmul(x, wq["kernel_q"], wq["scale"])


for name, fn, x, w in [
    ("bf16", bf16_mm, x_bf, w_bf),
    ("int8-raw", int8_mm, x_i8, w_i8),
    ("w8a8-op", w8a8, x_bf, w_bf),
]:
    r = benchmark_fn(chain(fn, x), x, w, iters=6)
    t = r["p50_s"] / REPS
    print(f"{name:9s}: {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)
