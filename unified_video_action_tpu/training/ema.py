"""Exponential moving average of params with Crowson-style warmup.

Equivalent of the reference's ``EMAModel`` (model/autoregressive/ema_model.py:
6-89): decay = 1 - (1 + step/inv_gamma)^(-power), clamped to
[min_value, max_value], counted from ``update_after_step``. Re-designed as a
pure pytree update that runs inside the jitted train step (the reference walks
module parameters on host every step)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EmaConfig:
    update_after_step: int = 0
    inv_gamma: float = 1.0
    power: float = 0.75
    min_value: float = 0.0
    max_value: float = 0.9999


def ema_decay(step: jnp.ndarray, cfg: EmaConfig) -> jnp.ndarray:
    """Decay at optimization step ``step`` (traced-friendly)."""
    s = jnp.maximum(0, step - cfg.update_after_step - 1)
    value = 1.0 - (1.0 + s / cfg.inv_gamma) ** (-cfg.power)
    value = jnp.where(s <= 0, 0.0, value)
    return jnp.clip(value, cfg.min_value, cfg.max_value)


def ema_update(ema_params, new_params, step, cfg: EmaConfig):
    d = ema_decay(step, cfg)
    return jax.tree.map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, new_params
    )
