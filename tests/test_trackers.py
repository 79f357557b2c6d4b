"""Tracker stack (training/trackers.py): wandb-workalike offline run dirs.

Mirrors the reference's wandb logging surface
(workspace/train_unified_video_action_workspace.py:103-113,331,418):
step_log metric history, config capture, video artifacts.
"""

import json
import os

import numpy as np

from unified_video_action_tpu.training.trackers import (
    MultiTracker,
    OfflineRunTracker,
    build_tracker,
)


def test_offline_tracker_history_and_summary(tmp_path):
    out = str(tmp_path)
    t = OfflineRunTracker(
        out, config={"lr": 1e-4, "task": "pusht"}, name="run1", project="uva"
    )
    t.log({"train_loss": np.float32(0.5), "lr": 1e-4}, step=10)
    t.log({"train_loss": 0.4, "test_mean_score": 0.9}, step=20)
    t.finish()

    run = os.path.join(out, "tracker")
    cfg = json.load(open(os.path.join(run, "config.json")))
    assert cfg["name"] == "run1" and cfg["config"]["task"] == "pusht"

    rows = [json.loads(l) for l in open(os.path.join(run, "metrics.jsonl"))]
    assert rows[0] == {"train_loss": 0.5, "lr": 1e-4, "_step": 10}
    assert rows[1]["_step"] == 20

    summary = json.load(open(os.path.join(run, "summary.json")))
    assert summary["train_loss"] == 0.4  # last value wins
    assert summary["test_mean_score"] == 0.9


def test_offline_tracker_video(tmp_path):
    out = str(tmp_path)
    vid = tmp_path / "rollout.gif"
    vid.write_bytes(b"GIF89a fake")
    t = OfflineRunTracker(out)
    t.log_video("test/rollout_video", str(vid), step=5)
    t.finish()

    run = os.path.join(out, "tracker")
    rows = [json.loads(l) for l in open(os.path.join(run, "metrics.jsonl"))]
    entry = rows[0]["test/rollout_video"]
    assert entry["_type"] == "video-file"
    media = os.path.join(run, entry["path"])
    assert os.path.exists(media)
    assert open(media, "rb").read() == b"GIF89a fake"


def test_build_tracker_falls_back_offline(tmp_path):
    # wandb is not installed in this environment -> offline workalike
    t = build_tracker({"mode": "online", "name": "n", "project": "p"}, str(tmp_path))
    t.log({"a": 1}, step=0)
    t.finish()
    assert os.path.exists(os.path.join(str(tmp_path), "tracker", "metrics.jsonl"))


def test_build_tracker_disabled(tmp_path):
    t = build_tracker({"mode": "disabled"}, str(tmp_path))
    assert isinstance(t, MultiTracker) and not t.trackers
    t.log({"a": 1})  # no-op, no files
    assert not os.path.exists(os.path.join(str(tmp_path), "tracker"))


def test_missing_video_is_ignored(tmp_path):
    t = OfflineRunTracker(str(tmp_path))
    t.log_video("x", str(tmp_path / "nope.mp4"), step=1)
    t.finish()
    rows = list(open(os.path.join(str(tmp_path), "tracker", "metrics.jsonl")))
    assert rows == []
