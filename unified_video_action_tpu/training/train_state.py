"""Train state + the jitted train step factory.

The whole optimization step — loss over the selected task mode, grads, AdamW
update, EMA — is ONE jitted program per (task_mode, frame-index tuple), with
the batch sharded over the mesh's data axis and params replicated; XLA inserts
the gradient all-reduce (the TPU-native replacement for the reference's
Accelerate/DDP NCCL path, workspace/train_unified_video_action_workspace.py:
207-302)."""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from unified_video_action_tpu.parallel import mesh as mesh_lib
from unified_video_action_tpu.training.ema import EmaConfig, ema_update


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    mar_params: Any
    ema_params: Any
    opt_state: Any
    vae_params: Any


def create_train_state(
    policy, params: Dict[str, Any], tx, mesh=None, shard_opt_state: bool = False
) -> TrainState:
    """Build the train state. With ``shard_opt_state`` + a mesh, AdamW moments
    are sharded over the data axis (ZeRO-2 equivalent: optimizer state is the
    dominant memory term; params stay replicated and XLA partitions the
    elementwise update across chips)."""
    mar_params = params["mar"]
    opt_state = tx.init(mar_params)
    if shard_opt_state and mesh is not None:
        from unified_video_action_tpu.parallel.mesh import opt_state_sharding

        shardings = opt_state_sharding(mesh, opt_state)
        opt_state = jax.tree.map(jax.device_put, opt_state, shardings)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        mar_params=mar_params,
        # real copy — aliased buffers would break buffer donation in the step
        ema_params=jax.tree.map(jnp.copy, mar_params),
        opt_state=opt_state,
        vae_params=params["vae"],
    )


def make_train_step(
    policy,
    tx: optax.GradientTransformation,
    ema_cfg: EmaConfig,
    mesh=None,
    donate: bool = True,
) -> Callable:
    """Returns train_step(state, batch, key, task_mode, frame_indices) with a
    per-(mode, indices) jit cache."""

    cache: Dict[Tuple, Callable] = {}

    def build(task_mode: str, n_indices: int, pregathered: bool = False):
        def step_fn(state: TrainState, batch, key, frame_indices):
            def loss_fn(mar_params):
                params = {"mar": mar_params, "vae": state.vae_params}
                loss, (vl, al) = policy.compute_loss(
                    params, batch, key, task_mode,
                    frame_indices=frame_indices,
                    pregathered=pregathered,
                )
                return loss, (vl, al)

            (loss, (vl, al)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.mar_params
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.mar_params)
            new_params = optax.apply_updates(state.mar_params, updates)
            new_step = state.step + 1
            new_ema = ema_update(state.ema_params, new_params, new_step, ema_cfg)
            metrics = {
                "train_loss": loss,
                "diffusion_loss": vl,
                "action_loss": al,
                "grad_norm": optax.global_norm(grads),
            }
            new_state = state.replace(
                step=new_step,
                mar_params=new_params,
                ema_params=new_ema,
                opt_state=new_opt,
            )
            return new_state, metrics

        kwargs = {}
        if donate:
            kwargs["donate_argnums"] = (0,)
        return jax.jit(step_fn, **kwargs)

    def train_step(state, batch, key, task_mode, frame_indices,
                   pregathered=False):
        # frame indices are a TRACED argument (one program per task mode, not
        # one per index combination — different_history_freq draws a fresh
        # random history set every batch, utils/data_utils.py:140-158)
        idx = jnp.asarray(frame_indices, dtype=jnp.int32)
        k = (task_mode, int(idx.shape[0]), bool(pregathered))
        if k not in cache:
            cache[k] = build(*k)
        return cache[k](state, batch, key, idx)

    return train_step
