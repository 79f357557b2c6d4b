"""Robomimic dataset on a synthetic robomimic-format hdf5."""

import numpy as np
import h5py
import pytest

from unified_video_action_tpu.data.robomimic_dataset import (
    RobomimicReplayImageDataset,
    convert_robomimic_actions,
)

SHAPE_META = {
    "action": {"shape": [10]},
    "obs": {
        "sideview_image": {"shape": [3, 24, 24], "type": "rgb"},
        "robot0_eef_pos": {"shape": [3], "type": "low_dim"},
        "robot0_eef_quat": {"shape": [4], "type": "low_dim"},
        "robot0_gripper_qpos": {"shape": [2], "type": "low_dim"},
    },
}


@pytest.fixture(scope="module")
def hdf5_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("rm") / "demo.hdf5"
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        for i in range(3):
            n = 40 + i * 5
            g = data.create_group(f"demo_{i}")
            obs = g.create_group("obs")
            obs.create_dataset(
                "sideview_image", data=rng.randint(0, 255, (n, 24, 24, 3), dtype=np.uint8)
            )
            obs.create_dataset("robot0_eef_pos", data=rng.randn(n, 3).astype(np.float32))
            q = rng.randn(n, 4); q /= np.linalg.norm(q, axis=-1, keepdims=True)
            obs.create_dataset("robot0_eef_quat", data=q.astype(np.float32))
            obs.create_dataset("robot0_gripper_qpos", data=rng.rand(n, 2).astype(np.float32))
            g.create_dataset("actions", data=rng.randn(n, 7).astype(np.float32))
    return str(path)


def test_action_conversion_roundtrip():
    rng = np.random.RandomState(1)
    raw = rng.randn(16, 7).astype(np.float32)
    conv = convert_robomimic_actions(raw, abs_action=True)
    assert conv.shape == (16, 10)
    np.testing.assert_allclose(conv[:, :3], raw[:, :3], atol=1e-6)
    np.testing.assert_allclose(conv[:, 9:], raw[:, 6:], atol=1e-6)


def test_dataset_loading(hdf5_path):
    ds = RobomimicReplayImageDataset(
        hdf5_path, SHAPE_META, horizon=16, pad_before=1, pad_after=7,
        val_ratio=0.34, n_obs_steps=8,
    )
    assert ds.replay_buffer.n_episodes == 3
    assert len(ds) > 0
    item = ds[0]
    assert item["obs"]["sideview_image"].shape == (16, 3, 24, 24)
    assert item["action"].shape == (16, 10)
    val = ds.get_validation_dataset()
    assert len(val) > 0

    n = ds.get_normalizer()
    a = n["action"].normalize(item["action"])
    assert np.isfinite(a).all()
    # positions mapped into [-1, 1]
    alla = n["action"].normalize(ds.replay_buffer["action"])
    assert alla[:, :3].min() >= -1.001 and alla[:, :3].max() <= 1.001
    # rot6d dims untouched
    np.testing.assert_allclose(alla[:, 3:9], ds.replay_buffer["action"][:, 3:9], atol=1e-6)


def test_undo_transform_action(hdf5_path):
    ds = RobomimicReplayImageDataset(
        hdf5_path, SHAPE_META, horizon=16, val_ratio=0.34
    )
    rng = np.random.RandomState(2)
    raw = rng.randn(5, 7).astype(np.float32)
    conv = convert_robomimic_actions(raw)
    back = ds.undo_transform_action(conv)
    # rotation roundtrips up to axis-angle equivalence
    from scipy.spatial.transform import Rotation as R
    r1 = R.from_rotvec(raw[:, 3:6]).as_matrix()
    r2 = R.from_rotvec(back[:, 3:6]).as_matrix()
    np.testing.assert_allclose(r1, r2, atol=1e-4)
