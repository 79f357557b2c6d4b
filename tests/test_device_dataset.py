"""Device-resident replay dataset (data/device_dataset.py): index-table
equivalence with SequenceSampler's edge-padded gather, batch gather parity
with the host __getitem__ path, and an end-to-end debug train run."""

import numpy as np

from unified_video_action_tpu.data.device_dataset import (
    DeviceReplayDataset,
    window_index_table,
)
from unified_video_action_tpu.data.pusht_dataset import PushTImageDataset


def _dataset(**kw):
    return PushTImageDataset(
        dataset_path="", synthetic=3, horizon=8, pad_before=1, pad_after=7,
        seed=7, **kw
    )


def test_window_table_matches_sample_sequence():
    ds = _dataset()
    table = window_index_table(ds.sampler)
    assert table.shape == (len(ds.sampler), 8)
    img = np.asarray(ds.replay_buffer["img"])
    act = np.asarray(ds.replay_buffer["action"])
    for idx in [0, 1, len(table) // 2, len(table) - 2, len(table) - 1]:
        want = ds.sampler.sample_sequence(idx)
        np.testing.assert_array_equal(img[table[idx]], want["img"])
        np.testing.assert_array_equal(act[table[idx]], want["action"])


def test_gather_matches_host_getitem():
    ds = _dataset()
    dd = DeviceReplayDataset(ds)
    idxs = np.array([0, 3, len(ds) - 1])
    fi = np.array([0, 2, 5, 7])
    batch = dd.gather(idxs, fi)
    for row, idx in enumerate(idxs):
        host = ds[int(idx)]
        np.testing.assert_array_equal(
            np.asarray(batch["obs"]["image"][row]),
            host["obs"]["image"][fi],
        )
        np.testing.assert_allclose(
            np.asarray(batch["action"][row]), host["action"], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(batch["obs"]["agent_pos"][row]),
            host["obs"]["agent_pos"],
            rtol=1e-6,
        )


def test_budget_guard():
    ds = _dataset()
    try:
        DeviceReplayDataset(ds, max_bytes=1024)
    except ValueError as e:
        assert "budget" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_train_debug_run_device_resident(tmp_path):
    from unified_video_action_tpu.config import Cfg, load_config

    cfg = load_config(
        "uva_pusht_small",
        overrides=[
            "model.policy.selected_training_mode=video_model",
            "model.policy.action_model_params.predict_action=false",
            "model.policy.vae_model_params.autoencoder_path=null",
            "training.debug=true",
            "dataloader.device_resident=true",
            "task.dataset.dataset_path=",
            "task.dataset.synthetic=2",
        ],
    )
    from unified_video_action_tpu.training.workspace import TrainWorkspace

    ws = TrainWorkspace(cfg, output_dir=str(tmp_path))
    m = ws.run()
    assert np.isfinite(m["train_loss"])
