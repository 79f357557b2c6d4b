"""tied_dropout: distribution-identical to flax nn.Dropout, but its mask
generation is data-dependent (optimization_barrier) so XLA cannot hoist every
block's (B, H, N, N) mask bits to program start — the compile-time OOM that
killed mar_base@256 b16 training (artifacts/round4/mar_base_256_gc_on_b16.log,
25.56G of 15.75G HBM). Reference dropout sites: mar_con_unified.py:200-252
(timm Block attn_drop/proj_drop)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import pytest

from unified_video_action_tpu.models.transformer import ViTBlock, tied_dropout


class _Tied(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, deterministic=False):
        return tied_dropout(self, x, self.rate, deterministic)


def test_dropout_semantics():
    """Bernoulli(keep) zeroing + 1/keep inverted scaling, same as
    nn.Dropout (exact masks differ only by make_rng path fold — nn.Dropout
    is a child module; tied_dropout draws from its caller's path)."""
    x = jax.random.normal(jax.random.key(0), (64, 64, 8))
    x = jnp.where(x == 0, 1.0, x)  # make zeros unambiguous
    y = _Tied(0.3).apply({}, x, rngs={"dropout": jax.random.key(7)})
    drop_frac = float(jnp.mean(y == 0))
    assert abs(drop_frac - 0.3) < 0.01
    kept = y != 0
    assert jnp.allclose(y[kept], x[kept] / 0.7, rtol=1e-6)


def test_deterministic_and_rate0_are_identity():
    x = jnp.ones((2, 3))
    assert jnp.array_equal(_Tied(0.5).apply({}, x, deterministic=True), x)
    # rate==0 must not consume an rng (no 'dropout' rng provided)
    assert jnp.array_equal(_Tied(0.0).apply({}, x), x)


def test_vit_block_dropout_masks_are_barrier_tied():
    """The compiled training-path HLO must contain optimization-barrier ops
    tying each dropout mask to its block input (anti-hoisting)."""
    block = ViTBlock(dim=32, num_heads=4, attn_dropout=0.1, proj_dropout=0.1)
    x = jnp.zeros((2, 8, 32))
    params = block.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, False
    )

    def f(p, x):
        return block.apply(p, x, False, rngs={"dropout": jax.random.key(2)})

    hlo = jax.jit(f).lower(params, x).as_text()
    assert "opt-barrier" in hlo or "optimization_barrier" in hlo


def test_vit_block_train_eval_paths_still_work():
    block = ViTBlock(dim=32, num_heads=4, attn_dropout=0.1, proj_dropout=0.1)
    x = jax.random.normal(jax.random.key(3), (2, 8, 32))
    params = block.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, False
    )
    y_eval = block.apply(params, x, True)
    assert y_eval.shape == x.shape
    y_tr = block.apply(params, x, False, rngs={"dropout": jax.random.key(2)})
    assert y_tr.shape == x.shape
    assert not jnp.allclose(y_tr, y_eval)
