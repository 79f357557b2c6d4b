"""Pipeline parallelism (parallel/pipeline.py): GPipe microbatch schedule
over the model axis must be EXACT vs the dense TransformerStack, and
differentiable (backward rides the transposed ppermute scan).

Runs on the conftest-forced 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unified_video_action_tpu.models.transformer import TransformerStack, ViTBlock
from unified_video_action_tpu.parallel import mesh as mesh_lib
from unified_video_action_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_block_params,
    unstack_block_params,
)

DEPTH, DIM, HEADS = 8, 32, 4


@pytest.fixture(scope="module")
def setup():
    stack = TransformerStack(depth=DEPTH, dim=DIM, num_heads=HEADS)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 16, DIM)), jnp.float32
    )
    params = stack.init(jax.random.PRNGKey(0), x)["params"]
    want = stack.apply({"params": params}, x)
    return stack, params, x, want


def test_stack_unstack_roundtrip(setup):
    _, params, _, _ = setup
    stacked = stack_block_params(params, DEPTH)
    assert jax.tree.leaves(stacked)[0].shape[0] == DEPTH
    back = unstack_block_params(stacked, DEPTH)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        assert jnp.array_equal(a, b)


@pytest.mark.parametrize("n_model,n_mb", [(4, 4), (2, 8), (4, 2)])
def test_pipeline_matches_dense(setup, n_model, n_mb):
    _, params, x, want = setup
    mesh = mesh_lib.make_mesh(n_data=8 // n_model, n_model=n_model)
    block = ViTBlock(dim=DIM, num_heads=HEADS)
    stacked = stack_block_params(params, DEPTH)
    got = pipeline_apply(
        block, stacked, x, mesh=mesh, n_microbatches=n_mb
    )
    assert float(jnp.max(jnp.abs(got - want))) < 1e-4


def test_pipeline_gradients_match_dense(setup):
    stack, params, x, _ = setup
    mesh = mesh_lib.make_mesh(n_data=2, n_model=4)
    block = ViTBlock(dim=DIM, num_heads=HEADS)

    def loss_dense(p):
        return jnp.mean(stack.apply({"params": p}, x) ** 2)

    def loss_pipe(stacked):
        y = pipeline_apply(block, stacked, x, mesh=mesh, n_microbatches=4)
        return jnp.mean(y ** 2)

    g_dense = jax.grad(loss_dense)(params)
    g_pipe = jax.grad(loss_pipe)(stack_block_params(params, DEPTH))
    g_pipe = unstack_block_params(g_pipe, DEPTH)
    flat_d, _ = jax.tree_util.tree_flatten_with_path(g_dense)
    flat_p = dict(jax.tree_util.tree_flatten_with_path(g_pipe)[0])
    # compare every leaf by path
    paths = dict(flat_d)
    assert set(paths) == set(flat_p)
    for k, vd in paths.items():
        vp = flat_p[k]
        err = float(jnp.max(jnp.abs(vd - vp)))
        scale = float(jnp.max(jnp.abs(vd))) + 1e-8
        assert err / scale < 1e-3, (k, err, scale)
