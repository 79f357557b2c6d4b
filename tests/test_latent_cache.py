"""Latent-cache serving path: mechanics + runner integration on tiny config."""

import jax
import numpy as np
import pytest

from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy


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
