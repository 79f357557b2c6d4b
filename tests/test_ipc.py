"""Native shared-memory IPC: ring/queue semantics incl. cross-process."""

import multiprocessing as mp
import numpy as np
import pytest

from unified_video_action_tpu.ipc.shm import (
    SharedMemoryQueue,
    SharedMemoryRingBuffer,
)

EXAMPLES = {"pose": np.zeros(6, np.float32), "ts": np.zeros((), np.float64)}


def test_ring_basic():
    rb = SharedMemoryRingBuffer("/uva_test_ring", EXAMPLES, buffer_size=16)
    try:
        assert rb.count == 0
        for i in range(5):
            rb.put({"pose": np.full(6, i, np.float32), "ts": float(i)})
        assert rb.count == 5
        out = rb.get_last_k(3)
        np.testing.assert_array_equal(out["ts"], [2.0, 3.0, 4.0])
        np.testing.assert_array_equal(out["pose"][-1], np.full(6, 4.0))
        last = rb.get()
        assert float(last["ts"][0]) == 4.0
    finally:
        rb.close(unlink=True)


def test_ring_wraparound():
    rb = SharedMemoryRingBuffer("/uva_test_ring2", EXAMPLES, buffer_size=8)
    try:
        for i in range(100):
            rb.put({"pose": np.full(6, i, np.float32), "ts": float(i)})
        out = rb.get_last_k(4)
        np.testing.assert_array_equal(out["ts"], [96.0, 97.0, 98.0, 99.0])
    finally:
        rb.close(unlink=True)


def test_queue_fifo_and_full():
    q = SharedMemoryQueue("/uva_test_q", EXAMPLES, buffer_size=4)
    try:
        assert q.get() is None
        for i in range(4):
            assert q.put({"pose": np.full(6, i, np.float32), "ts": float(i)})
        assert not q.put({"pose": np.zeros(6, np.float32), "ts": 9.0})  # full
        vals = []
        while (item := q.get()) is not None:
            vals.append(float(item["ts"]))
        assert vals == [0.0, 1.0, 2.0, 3.0]
    finally:
        q.close(unlink=True)


def _writer_proc(n):
    rb = SharedMemoryRingBuffer.open("/uva_test_xproc", EXAMPLES)
    for i in range(n):
        rb.put({"pose": np.full(6, i, np.float32), "ts": float(i)})
    rb.close()


def test_ring_cross_process():
    rb = SharedMemoryRingBuffer("/uva_test_xproc", EXAMPLES, buffer_size=64)
    try:
        p = mp.get_context("spawn").Process(target=_writer_proc, args=(50,))
        p.start()
        p.join(timeout=30)
        assert p.exitcode == 0
        assert rb.count == 50
        out = rb.get_last_k(2)
        np.testing.assert_array_equal(out["ts"], [48.0, 49.0])
    finally:
        rb.close(unlink=True)
