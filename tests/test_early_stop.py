"""training.early_stop_patience: stop when the rollout score stops improving.

Long imitation runs overfit past the score peak (TRAINRUN.md: peak at epoch 8
of 40, then decay); patience ends the run near the peak while top-k keeps the
best weights. Units: consecutive rollout evals without a new best
test_mean_score."""

import numpy as np
import pytest

from tests.test_end_to_end import _tiny_cfg


def _non_debug(cfg, tmp_path, epochs=8, patience=2, rollout_every=1):
    t = cfg["training"]
    t["debug"] = False
    t["num_epochs"] = epochs
    t["max_train_steps"] = 2
    t["max_val_steps"] = 1
    t["rollout_every"] = rollout_every
    t["early_stop_patience"] = patience
    t["checkpoint_every"] = 1
    t["val_every"] = 1000  # skip the val loop; rollout is the signal here
    t["sample_every"] = 1000  # skip FVD
    return cfg


@pytest.mark.slow
def test_early_stop_on_declining_score(tmp_path, monkeypatch):
    from unified_video_action_tpu.runners import base as runners_base
    from unified_video_action_tpu.training.workspace import TrainWorkspace

    scores = iter([0.5, 0.4, 0.45, 0.3, 0.2, 0.1, 0.05, 0.01])
    calls = []

    def fake_rollout(policy, params, runner, key):
        s = next(scores)
        calls.append(s)
        return {"test/mean_score": s, "env_backend": "real"}

    monkeypatch.setattr(runners_base, "env_rollout", fake_rollout)

    cfg = _non_debug(_tiny_cfg(tmp_path), tmp_path)
    ws = TrainWorkspace(cfg, output_dir=str(tmp_path / "run"))
    metrics = ws.run()

    # best=0.5 at epoch 0; epochs 1,2 are stale (0.4, 0.45) -> stop after 3
    assert len(calls) == 3
    assert ws.epoch == 3
    assert metrics.get("early_stopped") is True
    assert np.isfinite(metrics["train_loss"])
    # the interrupted run still publishes a resumable latest checkpoint
    assert (tmp_path / "run" / "checkpoints" / "latest" / "meta.json").exists()


@pytest.mark.slow
def test_no_early_stop_while_improving(tmp_path, monkeypatch):
    from unified_video_action_tpu.runners import base as runners_base
    from unified_video_action_tpu.training.workspace import TrainWorkspace

    calls = []

    def fake_rollout(policy, params, runner, key):
        calls.append(len(calls))
        return {"test/mean_score": 0.1 * (len(calls)), "env_backend": "real"}

    monkeypatch.setattr(runners_base, "env_rollout", fake_rollout)

    cfg = _non_debug(_tiny_cfg(tmp_path), tmp_path, epochs=4)
    ws = TrainWorkspace(cfg, output_dir=str(tmp_path / "run"))
    metrics = ws.run()
    assert len(calls) == 4  # ran to num_epochs; never stopped
    assert "early_stopped" not in metrics


@pytest.mark.slow
def test_stub_backend_scores_never_trip_early_stop(tmp_path, monkeypatch):
    """ADVICE r3: stub-env scores are a policy-independent seed schedule
    (effectively constant) — with patience set, a stub fallback must not
    halt the run after `patience` meaningless rollouts."""
    from unified_video_action_tpu.runners import base as runners_base
    from unified_video_action_tpu.training.workspace import TrainWorkspace

    calls = []

    def fake_rollout(policy, params, runner, key):
        calls.append(len(calls))
        return {"test/mean_score": 0.3, "env_backend": "stub:libero"}

    monkeypatch.setattr(runners_base, "env_rollout", fake_rollout)

    cfg = _non_debug(_tiny_cfg(tmp_path), tmp_path, epochs=5, patience=2)
    ws = TrainWorkspace(cfg, output_dir=str(tmp_path / "run"))
    metrics = ws.run()
    assert len(calls) == 5  # constant stub scores, yet the run completed
    assert "early_stopped" not in metrics


@pytest.mark.slow
def test_metric_early_stop_without_rollouts(tmp_path, monkeypatch):
    """Rollout-free runs (stage-1 video pretrain) early-stop on the topk
    monitor metric plateau instead (VERDICT r4 #3: convergence = plateau,
    not a fixed epoch count). Monitor mode=min is sign-normalized."""
    from unified_video_action_tpu.training.workspace import TrainWorkspace

    cfg = _non_debug(_tiny_cfg(tmp_path), tmp_path, epochs=8, patience=2,
                     rollout_every=0)
    cfg["checkpoint"]["topk"]["monitor_key"] = "video_fvd_vae"
    cfg["checkpoint"]["topk"]["mode"] = "min"
    cfg["checkpoint"]["topk"]["format_str"] = (
        "epoch={epoch:04d}-fvd={video_fvd_vae:.0f}"
    )
    cfg["training"]["sample_every"] = 1  # FVD every epoch is the signal

    fvds = iter([100.0, 80.0, 85.0, 90.0, 70.0, 60.0, 50.0, 40.0])
    calls = []

    def fake_fvd(policy, params, loader, key, **kw):
        v = next(fvds)
        calls.append(v)
        return {"video_fvd_vae": v}

    from unified_video_action_tpu.eval import offline as offline_mod

    monkeypatch.setattr(offline_mod, "test_video_fvd", fake_fvd)

    ws = TrainWorkspace(cfg, output_dir=str(tmp_path / "run"))
    metrics = ws.run()
    # best=80 at epoch 1; epochs 2,3 stale (85, 90) -> stop after 4 evals
    assert len(calls) == 4
    assert ws.epoch == 4
    assert metrics.get("early_stopped") is True
