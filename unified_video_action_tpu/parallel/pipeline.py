"""GPipe-style pipeline parallelism over transformer blocks.

The MAR trunk (models/transformer.py TransformerStack) is a uniform stack of
pre-LN ViT blocks, which pipelines cleanly: shard the DEPTH dimension over
the mesh's ``model`` axis (S stages, depth/S blocks per device) and stream M
microbatches through with ``lax.ppermute`` hops between stages. The schedule
is the classic GPipe fill/drain: T = M + S - 1 ticks, device s working on
microbatch t - s at tick t. Activations ride the ICI; XLA overlaps the
permute with the next tick's block compute.

TPU-first notes:
- the whole schedule is ONE ``lax.scan`` inside ONE ``shard_map`` region —
  no per-tick dispatches, no host control flow;
- per-stage block application is itself a ``lax.scan`` over the stage's
  stacked block parameters (depth/S identical blocks -> one compiled body);
- backward comes from ``jax.grad`` through the scan: ppermute's transpose is
  the reverse permute, so the drain phase of the backward pass is the mirror
  image of the forward fill — correct (if not 1F1B-interleaved) pipeline
  training with zero extra code.

Reference parity: the reference trains with torch DDP only
(train.py:70-90); pipeline sharding is beyond-reference scale-out for the
deeper video trunks, same spirit as parallel/tp_rules.py and
parallel/ring_attention.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def stack_block_params(stack_params: dict, depth: int) -> Any:
    """Stack a TransformerStack's ``block_0..block_{depth-1}`` param subtrees
    into one pytree with a leading depth axis (the axis pipeline stages shard).
    """
    blocks = [stack_params[f"block_{i}"] for i in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def unstack_block_params(stacked: Any, depth: int) -> dict:
    """Inverse of :func:`stack_block_params` (for checkpoint round-trips)."""
    return {
        f"block_{i}": jax.tree.map(lambda x, i=i: x[i], stacked)
        for i in range(depth)
    }


def _apply_stage(block, stage_params: Any, x: Array) -> Array:
    """Run one pipeline stage: scan ``x`` through the stage's stacked blocks."""

    def body(h, p):
        return block.apply({"params": p}, h), None

    y, _ = lax.scan(body, x, stage_params)
    return y


def pipeline_spmd(block, stage_params: Any, microbatches: Array,
                  axis_name: str = "model") -> Array:
    """SPMD pipeline body — call under ``shard_map`` with ``axis_name`` laid
    over the stage dimension.

    Args:
      block: a ViTBlock (or any module applying ``(params, x) -> y`` with
        shape-preserving ``x``).
      stage_params: this device's stacked block params, leading dim =
        depth // n_stages (shard_map slices the global stack).
      microbatches: (M, mb, N, D) — the full microbatch queue, replicated
        (every stage sees it; only stage 0 reads from it).

    Returns (M, mb, N, D), replicated (psum-combined from the last stage).
    """
    s = lax.axis_index(axis_name)
    n_stages = lax.axis_size(axis_name)
    M = microbatches.shape[0]
    T = M + n_stages - 1
    fwd = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(carry, t):
        buf, outs = carry
        # stage 0 reads microbatch t from the queue; others use the buffer
        # that arrived over ICI last tick (clip keeps the index static-safe
        # during the drain phase; drained garbage never reaches the output)
        feed = lax.dynamic_index_in_dim(
            microbatches, jnp.clip(t, 0, M - 1), 0, keepdims=False
        )
        x = jnp.where(s == 0, feed, buf)
        y = _apply_stage(block, stage_params, x)
        # the last stage finishes microbatch t - (S-1) at tick t
        out_t = t - (n_stages - 1)
        write = jnp.logical_and(s == n_stages - 1, out_t >= 0)
        outs = lax.dynamic_update_index_in_dim(
            outs,
            jnp.where(
                write,
                y,
                lax.dynamic_index_in_dim(
                    outs, jnp.clip(out_t, 0, M - 1), 0, keepdims=False
                ),
            ),
            jnp.clip(out_t, 0, M - 1),
            0,
        )
        buf = lax.ppermute(y, axis_name, fwd)
        return (buf, outs), None

    mb_shape = microbatches.shape[1:]
    buf0 = jnp.zeros(mb_shape, microbatches.dtype)
    outs0 = jnp.zeros_like(microbatches)
    (_, outs), _ = lax.scan(tick, (buf0, outs0), jnp.arange(T))
    # only the last stage holds real outputs; psum replicates them everywhere
    outs = jnp.where(s == n_stages - 1, outs, jnp.zeros_like(outs))
    return lax.psum(outs, axis_name)


def pipeline_apply(block, stacked_params: Any, x: Array, *, mesh: Mesh,
                   n_microbatches: int, axis_name: str = "model") -> Array:
    """Run ``x`` (B, N, D) through ``depth`` stacked blocks, pipelined over
    ``mesh[axis_name]``. B must divide into ``n_microbatches``."""
    B = x.shape[0]
    assert B % n_microbatches == 0, (B, n_microbatches)
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    n_stages = mesh.shape[axis_name]
    assert depth % n_stages == 0, (depth, n_stages)
    mbs = x.reshape(n_microbatches, B // n_microbatches, *x.shape[1:])

    fn = jax.shard_map(
        lambda p, q: pipeline_spmd(block, p, q, axis_name),
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(),
        check_vma=False,
    )
    stacked_params = jax.device_put(
        stacked_params,
        jax.tree.map(
            lambda _: NamedSharding(mesh, P(axis_name)), stacked_params
        ),
    )
    out = fn(stacked_params, mbs)
    return out.reshape(B, *x.shape[1:])
