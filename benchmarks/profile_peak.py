import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")
from unified_video_action_tpu.utils.profiling import benchmark_fn

# chain of matmuls inside one program: overhead amortized
for (M, K, N, iters) in [(4096, 768, 768, 200), (8192, 1024, 1024, 200), (8192, 4096, 4096, 50)]:
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16) * 0.01
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)

    @jax.jit
    def chain(x, w):
        def body(c, _):
            y = c @ w
            return y[:, :K] if N != K else y, None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    r = benchmark_fn(chain, x, w, warmup=2, iters=5)
    fl = 2 * M * K * N * iters
    print(f"scan {iters}x ({M}x{K})@({K}x{N}): {r['p50_s']*1e3:.1f} ms -> {fl/r['p50_s']/1e12:.1f} TF/s", flush=True)
