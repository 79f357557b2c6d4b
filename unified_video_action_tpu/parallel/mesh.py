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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization (the reference's accelerate/SLURM multi-node
    analog, SURVEY.md §2.9): call once per host before building the mesh; the
    mesh then spans all hosts' devices, with the data axis riding ICI within a
    slice and DCN across slices. No-ops on single-host setups and reads the
    standard cluster env (coordinator/process vars) when args are omitted."""
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        # single-host / already initialized
        print(f"[distributed] not initialized ({e}); continuing single-host")


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-sharded batch this host should load (per-host
    data loading for multi-host DP)."""
    import jax

    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
