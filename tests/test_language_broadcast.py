"""A single task prompt must condition a whole vector-env rollout batch.

Regression for the kitchen-suite rollout crash: LiberoImageRunner passes ONE
``language_goal`` string while the obs batch holds n_envs frames (reference
repeats the goal per env, env_runner/libero_image_runner.py:332-338); the
(1, 512) CLIP latent must be tiled to the obs batch before it reaches the
MAR text buffer concat (models/mar.py forward_encoder).
"""

import jax
import numpy as np

from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy

TINY_AMP = {
    "model_size": "custom",
    "encoder_embed_dim": 64, "encoder_depth": 1, "encoder_num_heads": 4,
    "decoder_embed_dim": 64, "decoder_depth": 1, "decoder_num_heads": 4,
    "img_size": 32, "vae_stride": 8, "vae_embed_dim": 8,
    "diffloss_d": 1, "diffloss_w": 32,
    "diffloss_act_d": 1, "diffloss_act_w": 32,
    "num_sampling_steps": "2", "act_diff_testing_steps": "2",
    "attn_dropout": 0.0, "proj_dropout": 0.0,
    "pretrained_model_path": None,
}
TINY_VAE = {
    "autoencoder_path": None,
    "ddconfig": {"vae_embed_dim": 8, "ch_mult": [1, 1, 2, 2], "ch": 32},
}


def _tiny_policy():
    return UnifiedVideoActionPolicy(
        shape_meta={"action": {"shape": [9]}},
        vae_model_params=TINY_VAE,
        autoregressive_model_params=TINY_AMP,
        action_model_params={"predict_action": True,
                             "act_model_type": "conv_fc"},
        task_name="kitchen",
        normalizer_type="none",
        language_emb_model="clip",   # hash fallback offline
        compute_dtype="float32",
    )


def test_single_latent_tiled_to_batch():
    policy = _tiny_policy()
    one = np.random.RandomState(0).randn(1, 512).astype(np.float32)
    out = policy._encode_language_goal(one, batch=3)
    assert out.shape == (3, 512)
    assert np.allclose(np.asarray(out[0]), np.asarray(out[2]))
    # already-batched latents pass through untouched
    three = np.random.RandomState(1).randn(3, 512).astype(np.float32)
    assert policy._encode_language_goal(three, batch=3).shape == (3, 512)


def test_predict_action_one_goal_many_envs():
    policy = _tiny_policy()
    params = policy.init_params(jax.random.PRNGKey(0))
    B = 3
    obs = {
        "agentview_rgb": np.random.RandomState(0)
        .rand(B, 16, 3, 32, 32).astype(np.float32),
    }
    result = policy.predict_action(
        params, obs, jax.random.PRNGKey(1),
        language_goal="open the slide cabinet",
    )
    assert result["action"].shape == (B, 8, 9)
    assert np.isfinite(result["action_pred"]).all()
