import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")
from unified_video_action_tpu.utils.profiling import benchmark_fn

for n in [128, 1024, 8192, 32768]:
    x = jax.random.normal(jax.random.PRNGKey(0), (n, 768), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (768, 3072), jnp.bfloat16)
    r = benchmark_fn(lambda a, b: a @ b, x, w, warmup=2, iters=10)
    fl = 2 * n * 768 * 3072
    print(f"matmul M={n}: {r['p50_s']*1e3:.2f} ms  ({fl/r['p50_s']/1e12:.2f} TF/s)", flush=True)
