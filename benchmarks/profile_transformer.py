import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import numpy as np
from unified_video_action_tpu.utils.profiling import benchmark_fn
from unified_video_action_tpu.models.transformer import TransformerStack

B, N, D, H = 32, 1088, 768, 12
x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D), dtype=jnp.bfloat16)

for impl in ["xla", "pallas"]:
    stack = TransformerStack(depth=12, dim=D, num_heads=H, attn_dropout=0.0,
                             proj_dropout=0.0, dtype=jnp.bfloat16, attn_impl=impl)
    params = stack.init(jax.random.PRNGKey(1), x, True)["params"]
    @jax.jit
    def run(p, x):
        return stack.apply({"params": p}, x, True)
    r = benchmark_fn(run, params, x, warmup=2, iters=10)
    print(f"12-block stack ({impl}): {r['p50_s']*1e3:.2f} ms", flush=True)

# pure matmul reference: what does this chip actually deliver?
w = jax.random.normal(jax.random.PRNGKey(2), (D, 4*D), dtype=jnp.bfloat16)
xx = x.reshape(B*N, D)
@jax.jit
def mm(a, b):
    return a @ b
r = benchmark_fn(mm, xx, w, warmup=2, iters=20)
flops = 2 * B*N * D * 4*D
print(f"(34816x768)@(768x3072) matmul: {r['p50_s']*1e6:.1f} us -> {flops/r['p50_s']/1e12:.1f} TF/s", flush=True)
