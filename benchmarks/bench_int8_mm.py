#!/usr/bin/env python
"""Int8 matmul backend shootout on the real chip: XLA dot vs Pallas kernel.

Chases the v5e MXU's native 2x int8 rate (PERF.md r2: the XLA lowering of
int8 dot_general measures at bf16 speed, suggesting an upcast). Measures
raw TF/s at serving-relevant shapes and prints one JSON line.

Measurement methodology (PERF.md "Environment gotchas"): through the axon
tunnel `block_until_ready` is a no-op (block-on-last AND block-on-all both
measured ~100x hardware peak) and each dispatch+fetch round trip costs
~33 ms (a single 2.5 ms matmul measures 10x UNDER peak). So each backend is
timed as ONE jitted program chaining REPS matmuls over per-step-perturbed
operands (perturbation defeats both XLA CSE and the relay's (program,
inputs) memoization), forced by fetching the final float32 scalar — the
same scanned-chain methodology as PERF.md "Measured chip ceiling".

Usage: python benchmarks/bench_int8_mm.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

REPS = 32  # matmuls chained per program: ~80-160ms of compute vs ~33ms overhead


def bench(fn, args_list, iters=5, warmup=2):
    """fn must return a float32 SCALAR; float() is the only reliable sync."""
    for i in range(warmup):
        float(fn(*args_list[i % len(args_list)]))
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(iters):
        acc += float(fn(*args_list[i % len(args_list)]))
    dt = (time.perf_counter() - t0) / iters
    assert acc == acc  # keep the fetch observable
    return dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/uva_xla_cache")

    from unified_video_action_tpu.ops.int8_mm import int8_matmul_pallas

    M, K, N = 139264, 768, 2304  # the serving dense-chain shape (PERF.md)
    rng = np.random.default_rng(0)
    # memoization-proof: distinct operand sets round-robined across calls
    xs = [
        jax.device_put(rng.integers(-127, 128, (M, K)).astype(np.int8))
        for _ in range(2)
    ]
    ws = [
        jax.device_put(rng.integers(-127, 128, (K, N)).astype(np.int8))
        for _ in range(2)
    ]
    bf_xs = [x.astype(jnp.bfloat16) for x in xs]
    bf_ws = [w.astype(jnp.bfloat16) for w in ws]
    flops = 2 * M * K * N * REPS

    def chained(matmul, perturb):
        """One program: REPS matmuls over per-step-perturbed x, scalar out."""

        @jax.jit
        def fn(x, w):
            def body(carry, i):
                out = matmul(perturb(x, i), w)
                return carry + jnp.sum(out.astype(jnp.float32)), None

            total, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(REPS, dtype=jnp.int32)
            )
            return total

        return fn

    def dot_int8(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    def dot_bf16(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    perturb_i8 = lambda x, i: x + i.astype(jnp.int8)  # wraparound is fine
    perturb_bf = lambda x, i: x + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)

    results = {"reps_per_program": REPS}
    for name, fn, a, b in (
        ("xla_bf16", chained(dot_bf16, perturb_bf), bf_xs, bf_ws),
        ("xla_int8", chained(dot_int8, perturb_i8), xs, ws),
        ("pallas_int8",
         chained(lambda x, w: int8_matmul_pallas(x, w, bm=512, bn=768),
                 perturb_i8),
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
