"""Tracing / profiling harness.

The reference has no profiling support (SURVEY.md §5.1 — commented @profile
hooks only). This framework makes it first-class:

* ``Timer`` — wall-clock block timer with ``block_until_ready`` so device work
  is actually measured, keeping running stats (count/mean/p50/p95).
* ``trace`` — context manager around ``jax.profiler`` writing a TensorBoard-
  loadable trace for a region.
* ``benchmark_fn`` — compile-then-measure helper returning steady-state stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np


class Timer:
    def __init__(self):
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def time(self, name: str, sync: Any = None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def stats(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.records.items():
            arr = np.asarray(xs)
            out[name] = {
                "count": len(arr),
                "mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p95_s": float(np.percentile(arr, 95)),
                "total_s": float(arr.sum()),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.stats().items()):
            lines.append(
                f"{name:40s} n={s['count']:<5d} mean={s['mean_s']*1e3:8.2f}ms "
                f"p50={s['p50_s']*1e3:8.2f}ms p95={s['p95_s']*1e3:8.2f}ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/uva_trace"):
    """Capture a jax.profiler trace (open with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(
    fn: Callable,
    *args,
    warmup: int = 2,
    iters: int = 10,
    vary: bool = True,
) -> Dict[str, float]:
    """Compile + steady-state timing of a device function.

    IMPORTANT: remote execution backends (axon) memoize identical
    (program, inputs) executions, so repeated calls with the SAME inputs
    report fantasy throughput. With ``vary=True`` (default) the first array
    argument is perturbed per iteration to force real execution, and the
    result is materialized with device_get as the sync point.
    """
    import jax.numpy as jnp

    args = list(args)

    def call(i):
        if vary:
            for j, a in enumerate(args):
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
                    args[j] = a + jnp.asarray(i * 1e-6, a.dtype)
                    break
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0]))
        return out

    for i in range(warmup):
        call(i)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        call(warmup + i)
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {
        "mean_s": float(arr.mean()),
        "p50_s": float(np.percentile(arr, 50)),
        "min_s": float(arr.min()),
        "iters": iters,
    }
