"""End-to-end integration on the tiny config: full debug train loop (dataset ->
jitted train steps -> EMA -> checkpoint -> rollout) plus offline evals.
This is the CPU-mesh miniature of the real PushT pipeline."""

import os

import jax
import numpy as np
import pytest

from unified_video_action_tpu.config import Cfg, load_config


def _tiny_cfg(tmp_path):
    cfg = load_config(
        "uva_pusht",
        overrides=[
            "training.debug=true",
            "training.seed=7",
            "task.dataset.synthetic=3",
            "task.dataset.val_ratio=0.34",
            "task.dataset.data_aug=false",
            "model.policy.action_model_params.predict_action=true",
            "model.policy.compute_dtype=float32",
            # tiny model
            "model.policy.autoregressive_model_params.model_size=custom",
            "model.policy.autoregressive_model_params.encoder_embed_dim=64",
            "model.policy.autoregressive_model_params.encoder_depth=1",
            "model.policy.autoregressive_model_params.encoder_num_heads=4",
            "model.policy.autoregressive_model_params.decoder_embed_dim=64",
            "model.policy.autoregressive_model_params.decoder_depth=1",
            "model.policy.autoregressive_model_params.decoder_num_heads=4",
            "model.policy.autoregressive_model_params.img_size=32",
            "model.policy.autoregressive_model_params.vae_stride=8",
            "model.policy.autoregressive_model_params.vae_embed_dim=8",
            "model.policy.autoregressive_model_params.diffloss_d=1",
            "model.policy.autoregressive_model_params.diffloss_w=32",
            "model.policy.autoregressive_model_params.diffloss_act_d=1",
            "model.policy.autoregressive_model_params.diffloss_act_w=32",
            "model.policy.autoregressive_model_params.num_sampling_steps=2",
            "model.policy.autoregressive_model_params.act_diff_testing_steps=2",
            "model.policy.autoregressive_model_params.attn_dropout=0.0",
            "model.policy.autoregressive_model_params.proj_dropout=0.0",
            "model.policy.autoregressive_model_params.pretrained_model_path=null",
            "model.policy.vae_model_params.autoencoder_path=null",
            "model.policy.vae_model_params.ddconfig.vae_embed_dim=8",
            "model.policy.vae_model_params.ddconfig.ch=32",
            "model.policy.vae_model_params.ddconfig.ch_mult=[1,1,2,2]",
            "dataloader.num_workers=1",
            f"output_dir={tmp_path}/run",
        ],
    )
    return cfg


@pytest.mark.slow
def test_debug_train_and_eval(tmp_path):
    from unified_video_action_tpu.training.workspace import TrainWorkspace

    cfg = _tiny_cfg(tmp_path)
    ws = TrainWorkspace(cfg, output_dir=str(tmp_path / "run"))
    metrics = ws.run()

    assert np.isfinite(metrics["train_loss"])
    assert "val_action_l2_distances" in metrics
    assert "test_mean_score" in metrics
    assert os.path.exists(tmp_path / "run" / "checkpoints" / "latest" / "meta.json")

    # resume path: a fresh workspace picks up the checkpoint
    ws2 = TrainWorkspace(cfg, output_dir=str(tmp_path / "run"))
    cfg["training"]["num_epochs"] = 2  # noop; debug already caps at 2
    m2 = ws2.run()
    assert np.isfinite(m2["train_loss"])

    # offline evals on the trained state
    from unified_video_action_tpu.data.pusht_dataset import PushTImageDataset
    from unified_video_action_tpu.data.loader import DataLoader
    from unified_video_action_tpu.eval.offline import test_action_l2, test_video_fvd

    ds = PushTImageDataset(dataset_path="", synthetic=2, val_ratio=0.5, horizon=32)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    params = {"mar": ws2.state.ema_params, "vae": ws2.state.vae_params}
    key = jax.random.PRNGKey(0)

    l2 = test_action_l2(ws2.policy, params, loader, key, num_batches=1)
    assert np.isfinite(l2["val_action_l2_distances"])

    fvd = test_video_fvd(
        ws2.policy, params, loader, key, num_batches=1,
        output_dir=str(tmp_path / "vis"),
    )
    assert "video_fvd_vae" in fvd  # the trusted-fallback stage-1 metric
    assert all(np.isfinite(v) for v in fvd.values())
    assert os.path.exists(tmp_path / "vis" / "real_vs_pred.gif")

    # deterministic eval windows: a different caller key must not change the
    # reading (VERDICT r3 item 5 — epoch-over-epoch deltas are model signal)
    fvd2 = test_video_fvd(
        ws2.policy, params, loader, jax.random.PRNGKey(123), num_batches=1,
    )
    assert fvd2["video_fvd_vae"] == pytest.approx(fvd["video_fvd_vae"])
