"""Int8 weight+activation quantization for TPU serving.

The v5e MXU runs int8×int8→int32 at twice its bf16 rate, and the MAR's
serving cost is dominated by the encoder/decoder dense projections
(PERF.md round-2 stage breakdown). This module provides:

* ``quantize_weight``  — symmetric per-output-channel int8 weights,
* ``int8_matmul``      — dynamic per-row activation quantization + int8
                          MXU matmul + fp rescale (the standard W8A8 scheme),
* ``quantize_dense_tree`` — one-time conversion of a trained fp param tree
                          into the quantized layout consumed by QuantDense.

Training and the diffusion samplers stay bf16/fp32; this is a serving-only
path selected by the policy's ``serving_quant="int8"`` option and covered by
action-parity tests (tests/test_quant.py). The reference has no equivalent
(torch fp16 serving only) — this is a TPU-native capability on top of parity.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_weight(w: Array) -> Dict[str, Array]:
    """Symmetric per-output-channel int8 quantization of a (in, out) kernel."""
    w = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0  # (1, out)
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"kernel_q": w_q, "scale": scale[0]}


def int8_matmul(x: Array, kernel_q: Array, scale: Array) -> Array:
    """W8A8 matmul: per-row dynamic activation quant, int8 MXU dot, rescale.

    x: (..., in) float; kernel_q: (in, out) int8; scale: (out,) fp32
    per-output-channel weight scales. Returns (..., out) in x.dtype.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    x_scale = jnp.maximum(x_scale, 1e-12)
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q,
        kernel_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * x_scale * scale).astype(orig_dtype)


def _is_dense_params(node: Any) -> bool:
    return (
        isinstance(node, dict)
        and "kernel" in node
        and getattr(node["kernel"], "ndim", 0) == 2
    )


def quantize_dense_tree(params: Any) -> Any:
    """Convert every 2-D Dense kernel in a param tree to the quant layout.

    ``{"kernel": w, "bias": b}`` → ``{"kernel_q": int8, "scale": f32,
    "bias": b}``. Non-Dense leaves (LayerNorm, conv, embeddings) pass
    through untouched, so the same tree drives a quant-enabled module whose
    non-dense submodules read their original params.
    """
    if _is_dense_params(params):
        out = dict(quantize_weight(params["kernel"]))
        if "bias" in params:
            out["bias"] = params["bias"]
        return out
    if isinstance(params, dict):
        return {k: quantize_dense_tree(v) for k, v in params.items()}
    return params
