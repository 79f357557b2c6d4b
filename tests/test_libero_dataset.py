"""LIBERO dataset on synthetic per-task hdf5 files."""

import numpy as np
import h5py
import pytest

from unified_video_action_tpu.data.libero_dataset import (
    LiberoReplayImageDataset,
    language_from_filename,
)

SHAPE_META = {
    "action": {"shape": [10]},
    "obs": {
        "agentview_rgb": {"shape": [3, 16, 16], "type": "rgb"},
        "language": {"shape": [15], "type": "low_dim"},
    },
}


def test_language_from_filename():
    assert (
        language_from_filename("KITCHEN_SCENE1_put_the_black_bowl_demo.hdf5")
        == "put the black bowl"
    )
    assert language_from_filename("LIVING_ROOM_SCENE12_pick_up_the_book_demo.hdf5") == "pick up the book"


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("libero")
    rng = np.random.RandomState(0)
    for name in ["KITCHEN_SCENE1_open_the_drawer_demo.hdf5",
                 "KITCHEN_SCENE2_close_the_jar_demo.hdf5"]:
        with h5py.File(d / name, "w") as f:
            data = f.create_group("data")
            for i in range(2):
                n = 40
                g = data.create_group(f"demo_{i}")
                obs = g.create_group("obs")
                obs.create_dataset(
                    "agentview_rgb",
                    data=rng.randint(0, 255, (n, 16, 16, 3), dtype=np.uint8),
                )
                g.create_dataset("actions", data=rng.randn(n, 7).astype(np.float32))
    return str(d)


def test_libero_dataset(dataset_dir):
    ds = LiberoReplayImageDataset(
        dataset_dir, SHAPE_META, horizon=16, pad_before=1, pad_after=7,
        val_ratio=0.25,
    )
    assert ds.replay_buffer.n_episodes == 4
    item = ds[0]
    assert item["obs"]["agentview_rgb"].shape == (16, 3, 16, 16)
    assert item["obs"]["language"].shape == (16, 2, 77)
    assert item["action"].shape == (16, 10)
    # language mask marks some tokens
    assert item["obs"]["language"][0, 1].sum() > 0
    val = ds.get_validation_dataset()
    assert len(val) > 0
    n = ds.get_normalizer()
    assert np.isfinite(n["action"].normalize(item["action"])).all()
