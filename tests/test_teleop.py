"""Teleop inputs (real/teleop.py) driven cross-process over the C++ ring."""

import threading
import time

import numpy as np
import pytest

from unified_video_action_tpu.real.teleop import (
    KeystrokeCounter,
    ScriptedSpacemouseBackend,
    SpacemouseProcess,
)

pytestmark = pytest.mark.slow


def test_spacemouse_stream_and_deadzone():
    script = [
        (np.array([0.5, -0.3, 0.0, 0.01, 0.0, 0.9]), np.array([0, 0])),
        (np.array([0.02, 0.0, 0.7, 0.0, -0.04, 0.0]), np.array([1, 0])),
    ] * 50
    sm = SpacemouseProcess(
        ScriptedSpacemouseBackend(script), frequency=100.0, deadzone=0.05
    )
    sm.start_wait()
    try:
        time.sleep(0.3)
        m = sm.get_motion_state()
        # deadzone zeroes the tiny axes on whichever sample is latest
        assert np.all(np.abs(m[np.abs(m) < 0.05]) == 0.0)
        assert np.abs(m).max() <= 1.0
        states = sm.ring.get_last_k(8)
        assert states["motion_event"].shape == (8, 6)
        assert states["receive_timestamp"].shape == (8,)
        # buttons from the scripted stream
        assert sm.is_button_pressed(0) in (True, False)
    finally:
        sm.stop_wait()


def test_spacemouse_transformed():
    script = [(np.array([1.0, 0, 0, 0, 1.0, 0]), np.array([0, 0]))] * 100
    sm = SpacemouseProcess(ScriptedSpacemouseBackend(script), frequency=200.0)
    sm.start_wait()
    try:
        rot = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
        m = sm.get_motion_state_transformed(rot)
        assert np.allclose(m[:3], [0, 1, 0])
        assert np.allclose(m[3:], [-1, 0, 0])
    finally:
        sm.stop_wait()


def test_keystroke_counter_threads():
    kc = KeystrokeCounter()

    def worker(key, n):
        for _ in range(n):
            kc.push(key)

    ts = [threading.Thread(target=worker, args=(k, 100)) for k in "abc"]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert kc.count("a") == kc.count("b") == kc.count("c") == 100
    events = kc.get_press_events()
    assert len(events) == 300
    assert kc.get_press_events() == []  # drained
    kc.clear()
    assert kc.count("a") == 0
