"""Int8 W8A8 serving path (ops/quant.py + transformer.QuantDense).

The reference serves fp16 only; the int8 path is a TPU-native addition
(v5e MXU int8 at 2x bf16 rate). These tests bound its quantization error at
the op level and at the policy's action output, and pin that the quantized
Mar consumes the SAME param tree as the fp Mar (no conversion step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unified_video_action_tpu.ops.quant import (
    int8_matmul,
    quantize_dense_tree,
    quantize_weight,
)



pytestmark = pytest.mark.slow

def test_int8_matmul_accuracy():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (64, 768), jnp.float32)
    w = jax.random.normal(k2, (768, 512), jnp.float32) * 0.02
    wq = quantize_weight(w)
    y_q = int8_matmul(x, wq["kernel_q"], wq["scale"])
    y = x @ w
    rel = float(jnp.linalg.norm(y_q - y) / jnp.linalg.norm(y))
    assert rel < 0.02, rel


def test_int8_matmul_outlier_rows():
    """Per-row activation scales keep error bounded when row norms differ."""
    x = np.random.RandomState(0).randn(16, 256).astype(np.float32)
    x[3] *= 1000.0
    x[7] *= 1e-3
    w = np.random.RandomState(1).randn(256, 128).astype(np.float32)
    wq = quantize_weight(jnp.asarray(w))
    y_q = np.asarray(int8_matmul(jnp.asarray(x), wq["kernel_q"], wq["scale"]))
    y = x @ w
    for row in (3, 7):
        rel = np.linalg.norm(y_q[row] - y[row]) / np.linalg.norm(y[row])
        assert rel < 0.03, (row, rel)


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(2), (128, 64)) * 0.1
    wq = quantize_weight(w)
    assert wq["kernel_q"].dtype == jnp.int8
    w_back = wq["kernel_q"].astype(jnp.float32) * wq["scale"]
    assert float(jnp.abs(w_back - w).max()) < float(wq["scale"].max()) + 1e-6


def test_quantize_dense_tree_structure():
    tree = {
        "blocks": {
            "attn": {"qkv": {"kernel": jnp.ones((8, 24)), "bias": jnp.zeros(24)}},
            "norm": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
        },
        "conv": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.zeros(8)},
    }
    out = quantize_dense_tree(tree)
    assert out["blocks"]["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    assert "scale" in out["blocks"]["attn"]["qkv"]
    # LayerNorm and 4-D conv kernels pass through untouched
    assert "scale" in out["blocks"]["norm"]
    assert out["conv"]["kernel"].shape == (3, 3, 4, 8)


@pytest.fixture(scope="module")
def tiny_policies():
    from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy

    common = dict(
        shape_meta={"action": {"shape": [2]}},
        vae_model_params={
            "autoencoder_path": None,
            "ddconfig": {"vae_embed_dim": 8, "ch_mult": [1, 1, 2, 2], "ch": 32},
        },
        autoregressive_model_params={
            "model_size": "custom",
            "encoder_embed_dim": 64, "encoder_depth": 2, "encoder_num_heads": 4,
            "decoder_embed_dim": 64, "decoder_depth": 2, "decoder_num_heads": 4,
            "img_size": 32, "vae_stride": 8, "vae_embed_dim": 8,
            "diffloss_d": 1, "diffloss_w": 32,
            "diffloss_act_d": 1, "diffloss_act_w": 32,
            "num_sampling_steps": "2", "act_diff_testing_steps": "2",
            "attn_dropout": 0.0, "proj_dropout": 0.0,
            "pretrained_model_path": None,
        },
        action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
        task_name="pusht",
        compute_dtype="float32",
    )
    fp = UnifiedVideoActionPolicy(**common)
    q = UnifiedVideoActionPolicy(**common, serving_quant="int8")
    params = fp.init_params(jax.random.PRNGKey(0))
    return fp, q, params


def test_quant_policy_same_param_tree(tiny_policies):
    """The int8 Mar consumes the fp param tree unchanged (same names/shapes
    in the encoder/decoder stacks, where QuantDense substitutes nn.Dense)."""
    fp, q, params = tiny_policies

    def init_shapes(mar):
        tree = mar.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 4, 8, 4, 4)),
            jax.random.PRNGKey(2),
            method=type(mar).sample_policy,
        )["params"]
        return jax.tree.map(jnp.shape, tree)

    shapes_fp, shapes_q = init_shapes(fp.mar), init_shapes(q.mar_serving)
    assert shapes_fp == shapes_q
    for stack in ("encoder_blocks", "decoder_blocks"):
        assert shapes_fp[stack] == jax.tree.map(
            jnp.shape, params["mar"][stack]
        )


def test_quant_policy_action_parity(tiny_policies):
    """W8A8 serving matches fp serving closely on identical RNG."""
    fp, q, params = tiny_policies
    obs = {
        "image": np.random.RandomState(0)
        .randint(0, 255, (2, 16, 3, 96, 96))
        .astype(np.uint8)
    }
    key = jax.random.PRNGKey(3)
    a_fp = fp.predict_action(params, obs, key)["action_pred"]
    a_q = q.predict_action(params, obs, key)["action_pred"]
    assert a_q.shape == a_fp.shape
    denom = float(np.abs(a_fp).mean()) + 1e-6
    rel = float(np.abs(a_q - a_fp).mean()) / denom
    assert rel < 0.15, rel


def test_serving_quant_rejects_unknown():
    from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy

    with pytest.raises(ValueError):
        UnifiedVideoActionPolicy(
            shape_meta={"action": {"shape": [2]}},
            vae_model_params={"autoencoder_path": None, "ddconfig": {}},
            autoregressive_model_params={"model_size": "mar_tiny",
                                         "pretrained_model_path": None},
            action_model_params={"predict_action": True},
            serving_quant="fp4",
        )


def test_quant_denoiser_param_compatible():
    """The int8 denoiser consumes the fp param tree unchanged and its output
    stays within W8A8 quantization error of the fp forward (the N-step
    sampler scan is weights-traffic bound at small batch — PERF.md)."""
    from unified_video_action_tpu.models.denoiser import MlpDenoiser

    kwargs = dict(
        in_channels=8, model_channels=128, out_channels=16, z_channels=64,
        depth=2,
    )
    fp = MlpDenoiser(**kwargs)
    q = MlpDenoiser(**kwargs, quant=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (32, 8))
    t = jnp.arange(32) % 1000
    c = jax.random.normal(jax.random.fold_in(key, 2), (32, 64))
    params = fp.init(key, x, t, c)["params"]
    y_fp = fp.apply({"params": params}, x, t, c)
    y_q = q.apply({"params": params}, x, t, c)
    rel = float(jnp.linalg.norm(y_q - y_fp) / (jnp.linalg.norm(y_fp) + 1e-9))
    assert rel < 0.05, rel
