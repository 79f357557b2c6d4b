"""Training internals: EMA decay schedule, optimizer decay mask, LR schedule,
topk manager, checkpoint roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unified_video_action_tpu.training.ema import EmaConfig, ema_decay, ema_update
from unified_video_action_tpu.training.optim import (
    cosine_warmup_schedule,
    decay_mask,
    make_optimizer,
)
from unified_video_action_tpu.training.checkpoint import TopKCheckpointManager


def test_ema_decay_schedule():
    """Matches the reference Crowson formula (ema_model.py:6-89):
    decay = 1 - (1 + step/inv_gamma)^-power, clamped."""
    cfg = EmaConfig(power=0.75, inv_gamma=1.0, max_value=0.9999)
    assert float(ema_decay(jnp.asarray(1), cfg)) == 0.0  # warmup start
    d10 = float(ema_decay(jnp.asarray(10), cfg))
    want = 1 - (1 + 9) ** -0.75
    assert abs(d10 - want) < 1e-6
    d_large = float(ema_decay(jnp.asarray(10**7), cfg))
    assert abs(d_large - 0.9999) < 1e-6  # clamped (fp32)


def test_ema_update_moves_toward_params():
    ema = {"w": jnp.zeros(4)}
    new = {"w": jnp.ones(4)}
    out = ema_update(ema, new, jnp.asarray(100), EmaConfig())
    d = float(ema_decay(jnp.asarray(100), EmaConfig()))
    np.testing.assert_allclose(np.asarray(out["w"]), 1 - d, rtol=1e-6)


def test_decay_mask():
    params = {"dense": {"kernel": jnp.zeros((4, 4)), "bias": jnp.zeros(4)},
              "ln": {"scale": jnp.zeros(4)}}
    m = decay_mask(params)
    assert m["dense"]["kernel"] is True
    assert m["dense"]["bias"] is False
    assert m["ln"]["scale"] is False


def test_cosine_warmup_schedule():
    s = cosine_warmup_schedule(1e-4, warmup_steps=10, total_steps=110)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 1e-4) < 1e-9
    assert float(s(60)) < 1e-4           # decaying
    assert float(s(110)) < 2e-6          # ~0 at the end


def test_optimizer_step_changes_params():
    tx = make_optimizer(learning_rate=1e-2, warmup_steps=0, total_steps=10)
    params = {"k": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"k": jnp.ones((4, 4))}
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(new["k"]), 1.0)


def test_topk_manager(tmp_path):
    m = TopKCheckpointManager(str(tmp_path), "score", mode="max", k=2,
                              format_str="ep{epoch}-{score:.2f}")
    p1 = m.get_ckpt_path({"epoch": 1, "score": 0.5})
    p2 = m.get_ckpt_path({"epoch": 2, "score": 0.3})
    assert p1 and p2
    os.makedirs(p1); os.makedirs(p2)
    # worse than both kept -> rejected
    assert m.get_ckpt_path({"epoch": 3, "score": 0.2}) is None
    # better than worst -> evicts 0.3
    p4 = m.get_ckpt_path({"epoch": 4, "score": 0.9})
    assert p4 is not None
    assert not os.path.exists(p2)
