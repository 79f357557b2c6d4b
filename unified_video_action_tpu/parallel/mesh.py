"""Device mesh construction and sharding helpers.

The reference's distribution story is DP via HF Accelerate/DeepSpeed over NCCL
(SURVEY.md §2.9). The TPU-native equivalent: a ``jax.sharding.Mesh`` whose
``data`` axis spans all chips (ICI), batches sharded on that axis, params
replicated, and XLA emitting the gradient all-reduce under ``jit``. A ``model``
axis is reserved for tensor-parallel sharding of the MAR/denoiser matmuls at
larger scales.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int = -1, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data == -1:
        n_data = n // n_model
    assert n_data * n_model == n, (n_data, n_model, n)
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch pytree on the mesh, leading axis over data."""
    sh = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def opt_state_sharding(mesh: Mesh, opt_state: Any) -> Any:
    """ZeRO-style optimizer-state sharding spec: shard the leading axis of
    rank>=1 moment tensors across the data axis when divisible (reference's
    DeepSpeed ZeRO-2 analog — optimizer state is the dominant memory term)."""
    n_data = mesh.shape[DATA_AXIS]

    def spec(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n_data == 0:
            return NamedSharding(mesh, P(DATA_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, opt_state)
