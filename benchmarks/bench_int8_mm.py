#!/usr/bin/env python
"""Int8 matmul backend shootout on the real chip: XLA dot vs Pallas kernel.

Chases the v5e MXU's native 2x int8 rate (PERF.md r2: the XLA lowering of
int8 dot_general measures at bf16 speed, suggesting an upcast). Measures
raw TF/s at serving-relevant shapes with the memoization-proof harness
(fresh operand slices per iteration) and prints one JSON line.

Usage: python benchmarks/bench_int8_mm.py
"""

import json
import time

import numpy as np


def bench(fn, args_list, iters=20, warmup=5):
    import jax

    for i in range(warmup):
        jax.block_until_ready(fn(*args_list[i % len(args_list)]))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")

    from unified_video_action_tpu.ops.int8_mm import int8_matmul_pallas

    M, K, N = 139264, 768, 2304  # the serving dense-chain shape (PERF.md)
    rng = np.random.default_rng(0)
    # memoization-proof: distinct operand sets round-robined
    xs = [
        jax.device_put(rng.integers(-127, 128, (M, K)).astype(np.int8))
        for _ in range(3)
    ]
    ws = [
        jax.device_put(rng.integers(-127, 128, (K, N)).astype(np.int8))
        for _ in range(3)
    ]
    bf_xs = [x.astype(jnp.bfloat16) for x in xs]
    bf_ws = [w.astype(jnp.bfloat16) for w in ws]
    flops = 2 * M * K * N

    @jax.jit
    def xla_int8(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    @jax.jit
    def xla_bf16(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    results = {}
    for name, fn, a, b in (
        ("xla_bf16", xla_bf16, bf_xs, bf_ws),
        ("xla_int8", xla_int8, xs, ws),
        ("pallas_int8", lambda x, w: int8_matmul_pallas(x, w, bm=512, bn=768),
         xs, ws),
    ):
        try:
            dt = bench(fn, list(zip(a, b)))
            results[name + "_tf_per_s"] = round(flops / dt / 1e12, 1)
            print(f"{name}: {flops/dt/1e12:.1f} TF/s", flush=True)
        except Exception as e:
            results[name + "_error"] = str(e)[:200]
            print(f"{name}: FAILED {e}", flush=True)

    print(json.dumps({"bench": "int8_mm_backends", "shape": [M, K, N],
                      **results}))


if __name__ == "__main__":
    main()
