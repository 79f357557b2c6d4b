"""UMI lazy dataset: schema, relative poses, random history sampling, multi."""

import numpy as np
import pytest

from unified_video_action_tpu.data.umi_dataset import (
    UmiLazyDataset,
    UmiMultiDataset,
    make_synthetic_umi,
)


@pytest.fixture(scope="module")
def buf():
    return make_synthetic_umi(n_episodes=3, episode_len=60, image_size=32)


def test_item_schema(buf):
    ds = UmiLazyDataset(buf, val_ratio=0.34)
    item = ds[10]
    obs = item["obs"]
    assert obs["camera0_rgb"].shape == (8, 3, 32, 32)
    assert obs["robot0_eef_pos"].shape == (16, 3)
    assert obs["robot0_eef_rot_axis_angle"].shape == (16, 6)
    assert obs["robot0_gripper_width"].shape == (16, 1)
    assert obs["robot0_eef_rot_axis_angle_wrt_start"].shape == (16, 6)
    assert obs["img_indices"].shape == (8, 1)
    np.testing.assert_array_equal(
        obs["img_indices"][:, 0], [3, 7, 11, 15, 19, 23, 27, 31]
    )
    assert item["action"].shape == (32, 10)


def test_relative_pose_identity_at_current(buf):
    ds = UmiLazyDataset(buf, val_ratio=0.34)
    item = ds[20]
    # index 15 of the proprio window is the current frame -> relative pose = id
    pos15 = item["obs"]["robot0_eef_pos"][15]
    rot15 = item["obs"]["robot0_eef_rot_axis_angle"][15]
    np.testing.assert_allclose(pos15, 0.0, atol=1e-5)
    np.testing.assert_allclose(rot15, [1, 0, 0, 0, 1, 0], atol=1e-5)


def test_random_history_sampling(buf):
    ds = UmiLazyDataset(buf, val_ratio=0.34, random_img_sampling=True, seed=1)
    item = ds[5]
    idx = item["obs"]["img_indices"][:, 0]
    # last 4 fixed, first 4 from [0, 15], ascending
    np.testing.assert_array_equal(idx[4:], [19, 23, 27, 31])
    assert (idx[:4] >= 0).all() and (idx[:4] <= 15).all()
    assert (np.diff(idx[:4]) > 0).all()


def test_train_val_split(buf):
    tr = UmiLazyDataset(buf, val_ratio=0.34)
    va = tr.split_val()
    assert len(tr) > 0 and len(va) > 0
    assert len(tr) + len(va) == buf.n_steps


def test_multi_dataset(buf):
    m = UmiMultiDataset(
        {"cup": UmiLazyDataset(buf, name="cup", val_ratio=0.34),
         "towel": UmiLazyDataset(buf, name="towel", val_ratio=0.34)},
        language_prompts={"cup": "pick up the cup", "towel": "fold the towel"},
    )
    item = m[0]
    assert item["dataset_name"] in ("cup", "towel")
    assert item["language_latents"].shape == (512,)
    n = m.get_normalizer()
    a = n["action"].normalize(item["action"])
    np.testing.assert_allclose(a, item["action"])  # identity for umi


def test_trainer_dataset_surface(buf):
    """The trainer calls get_validation_dataset() on every dataset family
    (workspace.py:116) — the UMI classes must expose the BaseImageDataset
    surface, not just split_val (regression: round-4 chip drive crashed
    here)."""
    lazy = UmiLazyDataset(buf, val_ratio=0.34)
    m = UmiMultiDataset(
        {"cup": UmiLazyDataset(buf, name="cup", val_ratio=0.34)},
        language_prompts={"cup": "pick up the cup"},
    )
    for ds in (lazy, m):
        va = ds.get_validation_dataset()
        assert len(va) > 0
        # identical item schema: the val loop feeds the same train_step
        assert set(va[0].keys()) == set(ds[0].keys())
        assert va[0]["action"].shape == ds[0]["action"].shape
