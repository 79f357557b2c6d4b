"""Ring attention: sequence-parallel exact attention over a mesh axis.

A TPU-native scaling capability beyond the reference (which is single-device
attention over its ~1k-token context — SURVEY §2.9 lists no sequence
parallelism): shard the sequence across devices, keep Q resident, and rotate
the K/V shards around the ring with ``jax.lax.ppermute`` while accumulating
the softmax in flash-attention streaming form (running max + denominator).
Each hop's collective rides the ICI neighbor link; compute on the current
block overlaps the next block's transfer under XLA's latency-hiding
scheduler.

Exactness: the streaming accumulation is algebraically the full softmax —
pinned against dense attention on an 8-virtual-device CPU mesh in
tests/test_ring_attention.py.

Intended for long-context video training (frames x 256 tokens/frame grows
linearly with horizon); at the PushT serving context (~1k tokens) a single
chip is faster — this is the scale-out path, not a default.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attend(q, k, v, scale, m_prev, l_prev, o_prev):
    """One flash-style accumulation step of q against a (k, v) block.

    q: (B, H, Lq, Dh); k/v: (B, H, Lk, Dh); m/l running max/denominator
    (B, H, Lq, 1); o running unnormalized output (B, H, Lq, Dh)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    correction = jnp.exp(m_prev - m_new)
    l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
    o_new = o_prev * correction + jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return m_new, l_new, o_new


def ring_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    scale: Optional[float] = None,
):
    """Per-shard body (call under shard_map over ``axis_name``).

    q/k/v: the LOCAL sequence shard (B, H, L/P, Dh). Returns the local
    attention output (B, H, L/P, Dh) of the exact global attention."""
    P_ = jax.lax.psum(1, axis_name)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, H, Lq, Dh = q.shape
    neg_inf = jnp.finfo(q.dtype).min
    m0 = jnp.full((B, H, Lq, 1), neg_inf, q.dtype)
    l0 = jnp.zeros((B, H, Lq, 1), q.dtype)
    o0 = jnp.zeros_like(q)

    def body(i, carry):
        m, l, o, kv = carry
        k_blk, v_blk = kv
        m, l, o = _block_attend(q, k_blk, v_blk, scale, m, l, o)
        # rotate KV one hop around the ring (device d -> d+1); the last
        # iteration's rotation is dead but keeps the loop shape static —
        # XLA overlaps it with the final accumulation anyway
        perm = [(j, (j + 1) % P_) for j in range(P_)]
        kv = jax.tree.map(
            lambda x: jax.lax.ppermute(x, axis_name, perm), (k_blk, v_blk)
        )
        return m, l, o, kv

    m, l, o, _ = jax.lax.fori_loop(0, P_, body, (m0, l0, o0, (k, v)))
    return o / l


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    scale: Optional[float] = None,
):
    """Global entry: q/k/v (B, H, L, Dh) sequence-sharded over ``axis``.

    L must divide by the axis size. Output has the same sharding as q."""
    spec = P(None, None, axis, None)
    fn = functools.partial(ring_attention_local, axis_name=axis, scale=scale)
    sharded = jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    q, k, v = (
        jax.device_put(x, NamedSharding(mesh, spec)) for x in (q, k, v)
    )
    return sharded(q, k, v)
