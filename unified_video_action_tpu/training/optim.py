"""Optimizer + LR schedule construction.

Equivalent of the reference's AdamW setup (policy:326-360: no weight decay on
biases and 1-D params) and its diffusers cosine-with-warmup schedule
(model/common/lr_scheduler.py:10-59): linear warmup to peak then cosine to 0.
Built on optax with a param-label mask."""

from __future__ import annotations

from typing import Tuple

import jax
import optax


def decay_mask(params) -> dict:
    """True (decay) for rank>=2 kernels, False for biases/norms/1-D params —
    mirrors the reference's add_weight_decay split."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def cosine_warmup_schedule(
    learning_rate: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    warmup = optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1))
    decay_steps = max(total_steps - warmup_steps, 1)
    cosine = optax.cosine_decay_schedule(learning_rate, decay_steps)
    return optax.join_schedules([warmup, cosine], [warmup_steps])


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.02,
    betas: Tuple[float, float] = (0.9, 0.95),
    warmup_steps: int = 1000,
    total_steps: int = 1_000_000,
    schedule: str = "cosine",
    grad_accum: int = 1,
    max_grad_norm: float | None = None,
) -> optax.GradientTransformation:
    if schedule == "cosine":
        lr = cosine_warmup_schedule(learning_rate, warmup_steps, total_steps)
    elif schedule == "constant":
        lr = optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
                optax.constant_schedule(learning_rate),
            ],
            [warmup_steps],
        )
    else:
        raise ValueError(schedule)

    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            lr,
            b1=betas[0],
            b2=betas[1],
            weight_decay=weight_decay,
            mask=decay_mask,
        )
    )
    tx = optax.chain(*chain)
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx
