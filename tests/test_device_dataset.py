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


def _libero_dataset(tmp_path):
    import h5py

    rng = np.random.RandomState(0)
    for name in ["KITCHEN_SCENE1_open_the_drawer_demo.hdf5",
                 "KITCHEN_SCENE2_close_the_jar_demo.hdf5"]:
        with h5py.File(tmp_path / name, "w") as f:
            data = f.create_group("data")
            for i in range(2):
                n = 40
                g = data.create_group(f"demo_{i}")
                obs = g.create_group("obs")
                obs.create_dataset(
                    "agentview_rgb",
                    data=rng.randint(0, 255, (n, 16, 16, 3), dtype=np.uint8),
                )
                g.create_dataset(
                    "actions", data=rng.randn(n, 7).astype(np.float32)
                )
    from unified_video_action_tpu.data.libero_dataset import (
        LiberoReplayImageDataset,
    )

    shape_meta = {
        "action": {"shape": [10]},
        "obs": {
            "agentview_rgb": {"shape": [3, 16, 16], "type": "rgb"},
            "language": {"shape": [15], "type": "low_dim"},
        },
    }
    return LiberoReplayImageDataset(
        str(tmp_path), shape_meta, horizon=16, pad_before=1, pad_after=7,
        val_ratio=0.25, emit_language_latents=True,
    )


def test_libero_gather_matches_host_getitem(tmp_path):
    from unified_video_action_tpu.data.device_dataset import (
        DeviceLiberoDataset,
        make_device_dataset,
    )

    ds = _libero_dataset(tmp_path)
    dd = make_device_dataset(ds)
    assert isinstance(dd, DeviceLiberoDataset)
    idxs = np.array([0, 3, len(ds) - 1])
    fi = np.array([0, 2, 5, 15])
    batch = dd.gather(idxs, fi)
    assert batch["obs"]["agentview_rgb"].dtype == np.uint8
    for row, idx in enumerate(idxs):
        host = ds[int(idx)]
        np.testing.assert_array_equal(
            np.asarray(batch["obs"]["agentview_rgb"][row]),
            host["obs"]["agentview_rgb"][fi],
        )
        np.testing.assert_allclose(
            np.asarray(batch["action"][row]), host["action"], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(batch["language_latents"][row]),
            host["language_latents"],
            rtol=1e-6,
        )
