"""Context-parallel ViT block: the same params applied sequence-sharded over
a data x seq mesh (ring attention, attn_impl='ring:seq') must reproduce the
single-device dense output exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from unified_video_action_tpu.models.transformer import ViTBlock
from unified_video_action_tpu.parallel import mesh as mesh_lib


def test_vit_block_context_parallel_matches_dense():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = mesh_lib.make_mesh(n_data=2, n_model=4, devices=jax.devices()[:8])
    # reuse the model axis as the sequence axis name
    seq_axis = "model"

    D, H_heads = 32, 4
    dense_block = ViTBlock(dim=D, num_heads=H_heads, attn_impl="xla")
    ring_block = ViTBlock(
        dim=D, num_heads=H_heads, attn_impl=f"ring:{seq_axis}"
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 64, D)), jnp.float32)
    params = dense_block.init(jax.random.PRNGKey(0), x)["params"]

    want = dense_block.apply({"params": params}, x)

    def local_fn(p, xs):
        return ring_block.apply({"params": p}, xs)

    spec = P("data", seq_axis, None)
    sharded = jax.shard_map(
        local_fn, mesh=mesh, in_specs=(P(), spec), out_specs=spec,
        check_vma=False,
    )
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    got = sharded(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
