"""Process-worker DataLoader (data/loader.py worker_mode="process").

The reference's UMI scale path uses 14 torch DataLoader worker processes
(config/task/umi_lazy.yaml:126-132) because zarr decode + pose math are
GIL-bound. These tests pin the process mode's contract: same batches as the
thread mode (order, determinism), zarr-lazy datasets survive the fork, and
worker errors surface in the parent.
"""

import numpy as np
import pytest

from unified_video_action_tpu.data.loader import DataLoader


class SquareDataset:
    def __init__(self, n=37):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "y": np.array([i * i], np.int64)}


def _materialize(loader):
    return [
        {k: v.copy() for k, v in batch.items()} for batch in loader
    ]


def test_process_mode_matches_thread_mode():
    kw = dict(batch_size=5, shuffle=True, seed=3, num_workers=3, prefetch=2)
    thread_batches = _materialize(DataLoader(SquareDataset(), worker_mode="thread", **kw))
    proc_batches = _materialize(DataLoader(SquareDataset(), worker_mode="process", **kw))
    assert len(thread_batches) == len(proc_batches) == 7
    for a, b in zip(thread_batches, proc_batches):
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["y"], b["y"])


def test_process_mode_multiple_epochs_reshuffle():
    dl = DataLoader(
        SquareDataset(20), batch_size=4, shuffle=True, seed=0,
        num_workers=2, worker_mode="process",
    )
    e1 = np.concatenate([b["x"][:, 0] for b in dl])
    e2 = np.concatenate([b["x"][:, 0] for b in dl])
    assert sorted(e1) == sorted(e2)
    assert not np.array_equal(e1, e2), "epochs must reshuffle"


def test_process_mode_worker_error_propagates():
    class Exploding(SquareDataset):
        def __getitem__(self, i):
            if i == 7:
                raise ValueError("boom at 7")
            return super().__getitem__(i)

    dl = DataLoader(
        Exploding(16), batch_size=4, shuffle=False, num_workers=2,
        worker_mode="process",
    )
    with pytest.raises(RuntimeError, match="boom at 7"):
        _materialize(dl)


def test_process_mode_with_lazy_zarr_umi_dataset(tmp_path):
    """The actual UMI scale path: zarr-lazy dataset forked into workers.
    Exercises ZarrArray chunk reads (and the fork-reopen path in ZipStore)."""
    from unified_video_action_tpu.data.umi_dataset import (
        UmiLazyDataset,
        make_synthetic_umi,
    )

    buf = make_synthetic_umi(n_episodes=2, episode_len=50, seed=1, image_size=24)
    zpath = str(tmp_path / "umi.zarr")
    buf.save_zarr(zpath)

    from unified_video_action_tpu.data.replay_buffer import ReplayBuffer

    lazy_buf = ReplayBuffer.copy_from_path(zpath, lazy=True)
    ds = UmiLazyDataset(lazy_buf, name="umi", val_ratio=0.0, seed=1)
    dl = DataLoader(
        ds, batch_size=8, shuffle=True, seed=2, num_workers=2,
        worker_mode="process",
    )
    batches = _materialize(dl)
    assert len(batches) == len(ds) // 8
    ref_ds = UmiLazyDataset(buf, name="umi", val_ratio=0.0, seed=1)
    ref_dl = DataLoader(
        ref_ds, batch_size=8, shuffle=True, seed=2, num_workers=2,
        worker_mode="thread",
    )
    def assert_tree_equal(a, b, path=""):
        if isinstance(a, dict):
            assert set(a) == set(b), path
            for k in a:
                assert_tree_equal(a[k], b[k], f"{path}/{k}")
        elif getattr(np.asarray(a), "dtype", None) is not None and np.asarray(
            a
        ).dtype.kind in "fc":
            np.testing.assert_allclose(a, b, err_msg=path)
        else:
            np.testing.assert_array_equal(a, b, err_msg=path)

    for a, b in zip(batches, _materialize(ref_dl)):
        assert_tree_equal(a, b)
