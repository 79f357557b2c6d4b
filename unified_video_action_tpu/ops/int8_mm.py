"""Pallas int8 matmul: chase the v5e MXU's native 2x int8 rate.

Written to chase a round-2 measurement where the XLA lowering of
``lax.dot_general(int8, int8, preferred=int32)`` appeared stuck at bf16
speed. That measurement was a sync artifact (PERF.md round-3 addenda): with
the corrected scanned-chain harness, XLA's own int8 dot reaches 212 TF/s at
the serving shape (1.43x bf16 — the MXU int8 rate engages) while this kernel
measures 107 TF/s. The default therefore stays on the XLA dot; the kernel
remains available via ``UVA_INT8_BACKEND=pallas`` in ``ops.quant`` and as
the reference point for benchmarks/bench_int8_mm.py.

Grid: (M/bm, N/bn), K unsplit (serving K <= 4096 fits VMEM comfortably:
bm*K + K*bn int8 + bm*bn int32 < 2 MB at the default tile). M/N are padded
up to tile multiples in the wrapper (int8 min tile is (32, 128))."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas needs a TPU (or interpret mode); import lazily-safe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _mm_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def int8_matmul_pallas(
    x_q: jax.Array,
    w_q: jax.Array,
    bm: int = 256,
    bn: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """(M, K) int8 @ (K, N) int8 -> (M, N) int32 on the MXU.

    M and N are zero-padded up to the (bm, bn) tile grid; K is taken whole
    per tile (pad K to a lane multiple of 128 in the caller if needed —
    dense-layer widths here are already multiples)."""
    assert x_q.dtype == jnp.int8 and w_q.dtype == jnp.int8
    M, K = x_q.shape
    K2, N = w_q.shape
    assert K == K2, (K, K2)
    Mp = -(-M // bm) * bm
    Np = -(-N // bn) * bn
    if Mp != M:
        x_q = jnp.pad(x_q, ((0, Mp - M), (0, 0)))
    if Np != N:
        w_q = jnp.pad(w_q, ((0, 0), (0, Np - N)))

    out = pl.pallas_call(
        _mm_kernel,
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.int32),
        grid=(Mp // bm, Np // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x_q, w_q)
    if (Mp, Np) != (M, N):
        out = out[:M, :N]
    return out


def w8a8_matmul(
    x: jax.Array,
    kernel_q: jax.Array,
    scale: jax.Array,
    backend: str = "xla",
    interpret: bool = False,
) -> jax.Array:
    """Full W8A8 layer matmul with a selectable int8-dot backend.

    Same contract as ops.quant.int8_matmul: x (..., in) float, kernel_q
    (in, out) int8, scale (out,) per-channel weight scales."""
    orig_dtype = x.dtype
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    x_scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    if backend == "pallas":
        y = int8_matmul_pallas(x_q, kernel_q, interpret=interpret)
    else:
        y = jax.lax.dot_general(
            x_q, kernel_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    y = (y.astype(jnp.float32) * x_scale * scale).astype(orig_dtype)
    return y.reshape(*lead, -1)
