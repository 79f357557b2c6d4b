"""Loader cooperative shutdown: a stalled data path must not block preemption.

Round-4 UMI chip drive postmortem: SIGTERM arrived while the step pipeline
was blocked waiting on worker results; the preempt flag is polled at step
boundaries, so the process wedged until SIGKILL. The fix gives DataLoader a
``stop_event`` the preemption handler sets — iterators poll it at every
bounded queue wait and exit promptly instead of blocking indefinitely.
"""

import threading
import time

import numpy as np
import pytest

from unified_video_action_tpu.data.loader import DataLoader


class _StallDataset:
    """First ``fast`` items return instantly; later items block on an event
    (set at teardown so thread-pool workers never outlive the test)."""

    def __init__(self, n=64, fast=4, release=None):
        self.n = n
        self.fast = fast
        self.release = release or threading.Event()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i >= self.fast:
            self.release.wait(timeout=300)
        return {"x": np.full((3,), i, dtype=np.float32)}


@pytest.mark.parametrize("mode", ["thread", "process"])
def test_stop_event_unblocks_stalled_iterator(mode):
    release = threading.Event()
    ds = _StallDataset(n=64, fast=2, release=release)
    loader = DataLoader(
        ds, batch_size=2, shuffle=False, num_workers=2, prefetch=1,
        worker_mode=mode,
    )
    got = []
    done = threading.Event()

    def consume():
        for batch in loader:
            got.append(batch)
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    # let it drain the fast items and block on the stalled ones
    deadline = time.time() + 60
    while not got and time.time() < deadline:
        time.sleep(0.1)
    assert got, "loader never produced the fast batches"

    loader.stop_event.set()
    # poll window is 5s; allow slack for worker teardown on a loaded host
    assert done.wait(timeout=30), "iterator did not exit after stop_event"
    release.set()  # let any in-flight thread workers finish (thread mode)
    t.join(timeout=10)


def test_stop_event_before_iteration_still_yields_ready_items():
    # stop set mid-stream must not corrupt already-delivered batches
    ds = _StallDataset(n=8, fast=8)  # nothing stalls
    loader = DataLoader(
        ds, batch_size=2, shuffle=False, num_workers=2, prefetch=1,
        worker_mode="thread",
    )
    out = list(loader)
    assert len(out) == 4
    assert out[0]["x"].shape == (2, 3)
