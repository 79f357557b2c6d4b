"""Latent-cache serving path: mechanics + runner integration on tiny config."""

import jax
import numpy as np
import pytest

from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy



pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def tiny_policy():
    policy = UnifiedVideoActionPolicy(
        shape_meta={"action": {"shape": [2]}},
        vae_model_params={
            "autoencoder_path": None,
            "ddconfig": {"vae_embed_dim": 8, "ch_mult": [1, 1, 2, 2], "ch": 32},
        },
        autoregressive_model_params={
            "model_size": "custom",
            "encoder_embed_dim": 64, "encoder_depth": 1, "encoder_num_heads": 4,
            "decoder_embed_dim": 64, "decoder_depth": 1, "decoder_num_heads": 4,
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
    params = policy.init_params(jax.random.PRNGKey(0))
    return policy, params


def test_cached_predict_roundtrip(tiny_policy):
    policy, params = tiny_policy
    rng = np.random.RandomState(0)
    B, T = 2, 16
    obs = {"image": rng.rand(B, T, 3, 32, 32).astype(np.float32)}
    key = jax.random.PRNGKey(1)

    # first call: cache miss -> full encode, returns the cond latents
    result, cache = policy.predict_action_cached(params, obs, key, cache=None)
    assert result["action"].shape == (B, 8, 2)
    assert cache.shape == (B, 4, 8, 4, 4)

    # second call: 2 of 4 frames reuse the cache
    obs2 = {"image": rng.rand(B, T, 3, 32, 32).astype(np.float32)}
    key2 = jax.random.PRNGKey(2)
    result2, cache2 = policy.predict_action_cached(
        params, obs2, key2, cache=cache, n_shift=8
    )
    assert result2["action"].shape == (B, 8, 2)
    assert cache2.shape == cache.shape
    # the reused slots of the new cache ARE the old cache's last two latents
    np.testing.assert_allclose(cache2[:, 0], cache[:, 2], atol=1e-6)
    np.testing.assert_allclose(cache2[:, 1], cache[:, 3], atol=1e-6)
    # and the new slots differ (fresh frames)
    assert not np.allclose(cache2[:, 2], cache[:, 2])


def test_runner_with_latent_cache(tiny_policy):
    from unified_video_action_tpu.runners.pusht_runner import PushTImageRunner

    policy, params = tiny_policy
    runner = PushTImageRunner(
        n_train=1, n_test=1, max_steps=16, n_obs_steps=16, n_action_steps=8,
        latent_cache=True,
    )
    log = runner.run(policy, params, jax.random.PRNGKey(0))
    assert "test/mean_score" in log and np.isfinite(log["test/mean_score"])


def test_cached_equals_uncached_same_key(tiny_policy):
    """With cache=None both paths encode the SAME 4 selected frames with the
    same key-split structure, so the actions must be bit-identical."""
    policy, params = tiny_policy
    rng = np.random.RandomState(5)
    obs = {"image": rng.rand(2, 16, 3, 32, 32).astype(np.float32)}
    key = jax.random.PRNGKey(9)
    ref = policy.predict_action(params, obs, key)
    cached, _ = policy.predict_action_cached(params, obs, key, cache=None)
    np.testing.assert_array_equal(ref["action_pred"], cached["action_pred"])


@pytest.fixture(scope="module")
def toolhang_policy():
    policy = UnifiedVideoActionPolicy(
        shape_meta={"action": {"shape": [10]}},
        vae_model_params={
            "autoencoder_path": None,
            "ddconfig": {"vae_embed_dim": 8, "ch_mult": [1, 1, 2, 2], "ch": 32},
        },
        autoregressive_model_params={
            "model_size": "custom",
            "encoder_embed_dim": 64, "encoder_depth": 1, "encoder_num_heads": 4,
            "decoder_embed_dim": 64, "decoder_depth": 1, "decoder_num_heads": 4,
            "img_size": 32, "vae_stride": 8, "vae_embed_dim": 8,
            "diffloss_d": 1, "diffloss_w": 32,
            "diffloss_act_d": 1, "diffloss_act_w": 32,
            "num_sampling_steps": "2", "act_diff_testing_steps": "2",
            "attn_dropout": 0.0, "proj_dropout": 0.0,
            "pretrained_model_path": None,
        },
        action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
        task_name="toolhang",
        use_proprioception=True,
        normalizer_type="none",
        compute_dtype="float32",
    )
    params = policy.init_params(jax.random.PRNGKey(0))
    return policy, params


def _toolhang_obs(rng, B=2, T=16):
    return {
        "sideview_image": rng.rand(B, T, 3, 32, 32).astype(np.float32),
        "robot0_eye_in_hand_image": rng.rand(B, T, 3, 32, 32).astype(np.float32),
        "robot0_eef_pos": rng.randn(B, T, 3).astype(np.float32),
        "robot0_eef_quat": rng.randn(B, T, 4).astype(np.float32),
        "robot0_gripper_qpos": rng.randn(B, T, 2).astype(np.float32),
    }


def test_toolhang_predict_action_with_wrist(toolhang_policy):
    """Eval-side wrist-camera conditioning: the wrist frames are frame-
    selected and VAE-encoded inside the predict fn (this used to KeyError)."""
    policy, params = toolhang_policy
    rng = np.random.RandomState(1)
    result = policy.predict_action(
        params, _toolhang_obs(rng), jax.random.PRNGKey(2)
    )
    assert result["action"].shape == (2, 8, 10)
    assert np.isfinite(result["action_pred"]).all()


def test_toolhang_cached_full_modalities(toolhang_policy):
    """The latent-cache path carries proprio + wrist like the uncached one:
    identical actions at cache miss, working reuse at the second call."""
    policy, params = toolhang_policy
    rng = np.random.RandomState(2)
    obs = _toolhang_obs(rng)
    key = jax.random.PRNGKey(3)
    ref = policy.predict_action(params, obs, key)
    cached, cache = policy.predict_action_cached(params, obs, key, cache=None)
    np.testing.assert_array_equal(ref["action_pred"], cached["action_pred"])

    obs2 = _toolhang_obs(rng)
    result2, cache2 = policy.predict_action_cached(
        params, obs2, jax.random.PRNGKey(4), cache=cache, n_shift=8
    )
    assert result2["action"].shape == (2, 8, 10)
    assert np.isfinite(result2["action_pred"]).all()
    np.testing.assert_allclose(cache2[:, :2], cache[:, 2:], atol=1e-6)


def test_vae_encode_chunk_remainder(tiny_policy):
    """Chunked VAE encode must cover non-divisible frame counts (regression:
    the chunk gate required n % chunk == 0 and silently fell back to the
    full-batch encode — the OOM the option exists to prevent)."""
    policy, params = tiny_policy
    rng = np.random.RandomState(3)
    frames = jax.numpy.asarray(rng.rand(7, 2, 3, 32, 32).astype(np.float32))
    key = jax.random.PRNGKey(5)
    ref = policy._encode_frames(params["vae"], frames, key)
    policy.vae_encode_chunk = 4  # 14 frames -> 3 chunks of 4 + tail of 2
    try:
        out = policy._encode_frames(params["vae"], frames, key)
    finally:
        policy.vae_encode_chunk = None
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.fixture(scope="module")
def umi_language_policy():
    policy = UnifiedVideoActionPolicy(
        shape_meta={"action": {"shape": [10]}},
        vae_model_params={
            "autoencoder_path": None,
            "ddconfig": {"vae_embed_dim": 8, "ch_mult": [1, 1, 2, 2], "ch": 32},
        },
        autoregressive_model_params={
            "model_size": "custom",
            "encoder_embed_dim": 64, "encoder_depth": 1, "encoder_num_heads": 4,
            "decoder_embed_dim": 64, "decoder_depth": 1, "decoder_num_heads": 4,
            "img_size": 32, "vae_stride": 8, "vae_embed_dim": 8,
            "diffloss_d": 1, "diffloss_w": 32,
            "diffloss_act_d": 1, "diffloss_act_w": 32,
            "num_sampling_steps": "2", "act_diff_testing_steps": "2",
            "attn_dropout": 0.0, "proj_dropout": 0.0,
            "pretrained_model_path": None,
        },
        action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
        task_name="umi",
        language_emb_model="clip",
        normalizer_type="none",
        compute_dtype="float32",
    )
    params = policy.init_params(jax.random.PRNGKey(0))
    return policy, params


def test_umi_predict_without_goal_is_unconditional(umi_language_policy):
    """umi serving with language_goal omitted must sample unconditionally
    (regression: jnp.asarray(None) crashed both predict paths)."""
    policy, params = umi_language_policy
    rng = np.random.RandomState(4)
    obs = {"image": rng.rand(2, 16, 3, 32, 32).astype(np.float32)}
    key = jax.random.PRNGKey(5)
    ref = policy.predict_action(params, obs, key)
    assert np.isfinite(ref["action_pred"]).all()
    cached, cache = policy.predict_action_cached(params, obs, key, cache=None)
    np.testing.assert_array_equal(ref["action_pred"], cached["action_pred"])

    # and the goal-conditioned path still works alongside it (the tiny
    # clipped model saturates to ±1 so value differences are not asserted)
    goal = rng.randn(2, 512).astype(np.float32)
    with_goal = policy.predict_action(params, obs, key, language_goal=goal)
    assert np.isfinite(with_goal["action_pred"]).all()
