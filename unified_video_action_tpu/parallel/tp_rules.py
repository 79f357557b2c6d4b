"""Tensor-parallel sharding rules for the MAR parameter tree.

Megatron-style column/row sharding over the mesh's ``model`` axis, expressed
as per-path NamedShardings and applied at device_put time — XLA's sharding
propagation then inserts the all-gather/reduce-scatter collectives inside the
jitted step. No model-code changes: rules key off the flax param paths.

Layout per transformer block:
* attn.qkv kernel  (D, 3D)   -> column-sharded P(None, model)  (heads split)
* attn.proj kernel (D, D)    -> row-sharded    P(model, None)
* mlp_fc1 kernel   (D, 4D)   -> column-sharded
* mlp_fc2 kernel   (4D, D)   -> row-sharded
* matching biases: column-sharded layers shard their bias, row-sharded don't.
Denoiser MLP blocks (fc1/fc2, ada_mod) follow the same pattern. Everything
else (embeddings, norms, heads' pools) replicates — at MAR-B scale the block
matmuls are ~95% of the FLOPs.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unified_video_action_tpu.parallel.mesh import MODEL_AXIS

COLUMN_KERNELS = ("qkv", "mlp_fc1", "fc1", "ada_mod")
ROW_KERNELS = ("proj", "mlp_fc2", "fc2")


def _spec_for_path(path: tuple, leaf) -> P:
    keys = [getattr(p, "key", str(p)) for p in path]
    leaf_name = keys[-1]
    parent = keys[-2] if len(keys) > 1 else ""
    ndim = getattr(leaf, "ndim", 0)

    if parent in COLUMN_KERNELS:
        if leaf_name == "kernel" and ndim == 2:
            return P(None, MODEL_AXIS)
        if leaf_name == "bias" and ndim == 1:
            return P(MODEL_AXIS)
    if parent in ROW_KERNELS and leaf_name == "kernel" and ndim == 2:
        return P(MODEL_AXIS, None)
    return P()


def mar_param_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree for a Mar param tree under ``mesh``. Falls back to
    replication for any dim not divisible by the model-axis size."""
    n_model = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        spec = _spec_for_path(path, leaf)
        # divisibility guard
        for axis_idx, axis_name in enumerate(spec):
            if axis_name == MODEL_AXIS and leaf.shape[axis_idx] % n_model != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(rule, params)


def apply_tp(mesh: Mesh, params: Any) -> Any:
    """Place a Mar param tree with TP shardings."""
    return jax.tree.map(
        jax.device_put, params, mar_param_shardings(mesh, params)
    )
