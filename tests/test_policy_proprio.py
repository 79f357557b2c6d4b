"""Per-task proprio/wrist training wiring through policy.compute_loss."""

import jax
import numpy as np
import pytest

from unified_video_action_tpu.policy.policy import UnifiedVideoActionPolicy


pytestmark = pytest.mark.slow

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


def test_umi_proprio_loss():
    from unified_video_action_tpu.data.umi_dataset import (
        UmiLazyDataset, make_synthetic_umi,
    )
    from unified_video_action_tpu.data.loader import DataLoader

    policy = UnifiedVideoActionPolicy(
        shape_meta={"action": {"shape": [10]}},
        vae_model_params=TINY_VAE,
        autoregressive_model_params=TINY_AMP,
        action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
        task_name="umi",
        use_proprioception=True,
        normalizer_type="none",
        shift_action=False,   # umi stage-2 convention (32-step window -> 16)
        compute_dtype="float32",
    )
    params = policy.init_params(jax.random.PRNGKey(0))
    ds = UmiLazyDataset(make_synthetic_umi(2, 60, image_size=32), val_ratio=0.2)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    batch = next(iter(loader))
    batch = {"obs": batch["obs"], "action": batch["action"]}  # drop dataset_name str
    batch = jax.tree.map(lambda x: jax.numpy.asarray(x), batch)
    # umi images arrive as 8 frames already; action chunk 16
    for mode in ("policy_model", "full_dynamic_model"):
        loss, (vl, al) = policy.compute_loss(
            params, {"obs": batch["obs"], "action": batch["action"]},
            jax.random.PRNGKey(1), mode,
            frame_indices=np.arange(8),  # umi: dataset already frame-selected
        )
        assert np.isfinite(float(loss)), mode


def test_toolhang_wrist_proprio_loss():
    policy = UnifiedVideoActionPolicy(
        shape_meta={"action": {"shape": [10]}},
        vae_model_params=TINY_VAE,
        autoregressive_model_params=TINY_AMP,
        action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
        task_name="toolhang",
        use_proprioception=True,
        predict_wrist_img=True,
        predict_proprioception=True,
        compute_dtype="float32",
    )
    params = policy.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    B, T = 2, 32
    batch = {
        "obs": {
            "sideview_image": rng.rand(B, T, 3, 32, 32).astype(np.float32),
            "robot0_eye_in_hand_image": rng.rand(B, T, 3, 32, 32).astype(np.float32),
            "robot0_eef_pos": rng.randn(B, T, 3).astype(np.float32),
            "robot0_eef_quat": rng.randn(B, T, 4).astype(np.float32),
            "robot0_gripper_qpos": rng.randn(B, T, 2).astype(np.float32),
        },
        "action": rng.randn(B, T, 10).astype(np.float32),
    }
    batch = jax.tree.map(jax.numpy.asarray, batch)
    loss, (vl, al) = policy.compute_loss(
        params, batch, jax.random.PRNGKey(1), "full_dynamic_model"
    )
    assert np.isfinite(float(loss))
    assert float(vl) > 0.0 and float(al) > 0.0


def test_umi_predict_action_with_proprio():
    """Eval-path proprio conditioning (umi): predict_action consumes the
    relative-pose obs dict."""
    policy = UnifiedVideoActionPolicy(
        shape_meta={"action": {"shape": [10]}},
        vae_model_params=TINY_VAE,
        autoregressive_model_params=TINY_AMP,
        action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
        task_name="umi",
        use_proprioception=True,
        normalizer_type="none",
        shift_action=False,
        language_emb_model="clip",   # 64-token text buffer + hash fallback
        compute_dtype="float32",
    )
    params = policy.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    B = 2
    obs = {
        "camera0_rgb": rng.rand(B, 16, 3, 32, 32).astype(np.float32),
        "robot0_eef_pos": rng.randn(B, 16, 3).astype(np.float32),
        "robot0_eef_rot_axis_angle": rng.randn(B, 16, 6).astype(np.float32),
        "robot0_gripper_width": rng.rand(B, 16, 1).astype(np.float32),
        "robot0_eef_rot_axis_angle_wrt_start": rng.randn(B, 16, 6).astype(np.float32),
    }
    lang = rng.randn(B, 512).astype(np.float32)
    result = policy.predict_action(
        params, obs, jax.random.PRNGKey(1), language_goal=lang
    )
    assert result["action"].shape == (B, 8, 10)
    assert np.isfinite(result["action_pred"]).all()


def test_umi_stage2_different_history_freq_trains():
    """umi stage-2 recipe: shift_action=False + per-sample random history
    sampling (dataset random_img_sampling -> img_indices) + policy
    different_history_freq. The proprio stream is gathered per sample at the
    4 history-image times (reference data_utils.py:326-350) and the traced
    frame-index design compiles ONE program per task mode regardless of which
    history combination each batch draws."""
    from unified_video_action_tpu.data.loader import DataLoader
    from unified_video_action_tpu.data.umi_dataset import (
        UmiLazyDataset, make_synthetic_umi,
    )
    from unified_video_action_tpu.training.ema import EmaConfig
    from unified_video_action_tpu.training.optim import make_optimizer
    from unified_video_action_tpu.training.train_state import (
        create_train_state, make_train_step,
    )
    from unified_video_action_tpu.utils import frames as frame_util

    policy = UnifiedVideoActionPolicy(
        shape_meta={"action": {"shape": [10]}},
        vae_model_params=TINY_VAE,
        autoregressive_model_params=TINY_AMP,
        action_model_params={"predict_action": True, "act_model_type": "conv_fc"},
        task_name="umi",
        use_proprioception=True,
        different_history_freq=True,
        normalizer_type="none",
        shift_action=False,
        compute_dtype="float32",
    )
    assert policy.mar_cfg.different_history_freq
    params = policy.init_params(jax.random.PRNGKey(0))
    ds = UmiLazyDataset(
        make_synthetic_umi(2, 60, image_size=32), val_ratio=0.2,
        random_img_sampling=True,
    )
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)

    tx = make_optimizer(total_steps=10, warmup_steps=1)
    state = create_train_state(policy, params, tx)
    train_step = make_train_step(policy, tx, EmaConfig())

    rng = np.random.default_rng(0)
    it = iter(loader)
    for step in range(3):
        batch = next(it)
        batch = {"obs": batch["obs"], "action": batch["action"]}
        batch = jax.tree.map(jax.numpy.asarray, batch)
        T = batch["obs"]["image" if "image" in batch["obs"] else "camera0_rgb"].shape[1]
        # pre-gathered umi frames -> identity indices; per-sample history
        # lives in obs["img_indices"]
        frame_indices = np.arange(T)
        mode = ("policy_model", "full_dynamic_model")[step % 2]
        state, metrics = train_step(
            state, batch, jax.random.PRNGKey(step), mode, frame_indices
        )
        assert np.isfinite(float(jax.device_get(metrics["train_loss"]))), step

    # per-sample random history must actually vary between items
    a = ds[0]["obs"]["img_indices"]
    b = ds[1]["obs"]["img_indices"]
    assert a.shape[0] == 8
    assert not np.array_equal(a, b) or not np.array_equal(
        ds[2]["obs"]["img_indices"], a
    )
