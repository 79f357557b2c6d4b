"""Tensor-parallel sharding rules: correct specs per param path + executable."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from unified_video_action_tpu.parallel.mesh import make_mesh
from unified_video_action_tpu.parallel.tp_rules import mar_param_shardings


def test_specs_and_execution():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "encoder_blocks": {
            "block_0": {
                "attn": {
                    "qkv": {"kernel": jnp.zeros((64, 192)), "bias": jnp.zeros(192)},
                    "proj": {"kernel": jnp.zeros((64, 64)), "bias": jnp.zeros(64)},
                },
                "mlp_fc1": {"kernel": jnp.zeros((64, 256)), "bias": jnp.zeros(256)},
                "mlp_fc2": {"kernel": jnp.zeros((256, 64)), "bias": jnp.zeros(64)},
                "norm1": {"scale": jnp.zeros(64), "bias": jnp.zeros(64)},
            }
        },
        "spatial_pos_embed": jnp.zeros((1, 16, 64)),
        # odd dim -> divisibility fallback to replication
        "odd": {"fc1": {"kernel": jnp.zeros((64, 63))}},
    }
    sh = mar_param_shardings(mesh, params)
    blk = sh["encoder_blocks"]["block_0"]
    assert blk["attn"]["qkv"]["kernel"].spec == P(None, "model")
    assert blk["attn"]["qkv"]["bias"].spec == P("model")
    assert blk["attn"]["proj"]["kernel"].spec == P("model", None)
    assert blk["attn"]["proj"]["bias"].spec == P()
    assert blk["mlp_fc1"]["kernel"].spec == P(None, "model")
    assert blk["mlp_fc2"]["kernel"].spec == P("model", None)
    assert blk["norm1"]["scale"].spec == P()
    assert sh["spatial_pos_embed"].spec == P()
    assert sh["odd"]["fc1"]["kernel"].spec == P()  # 63 not divisible by 2

    # placed params execute a sharded matmul without error
    placed = jax.tree.map(jax.device_put, params, sh)
    x = jnp.ones((8, 64))

    @jax.jit
    def fwd(p, x):
        h = x @ p["encoder_blocks"]["block_0"]["attn"]["qkv"]["kernel"]
        return h.sum()

    out = fwd(placed, x)
    assert np.isfinite(float(out))
