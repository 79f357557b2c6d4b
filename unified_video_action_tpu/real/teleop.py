"""Teleoperation input devices: spacemouse stream + keystroke counter.

Capability parity with the reference's demonstration-collection inputs
(umi/real_world/spacemouse_shared_memory.py:14-167: a process polling a
6-DoF HID device into a shared-memory ring with deadzone filtering and axis
remapping; keystroke_counter.py:6-48: a pynput listener queuing key events).
Rebuilt on this package's lock-free C++ ring (ipc/shm) with pluggable
backends — a real HID backend needs hardware, so tests drive the software
``ScriptedSpacemouseBackend``.
"""

from __future__ import annotations

import collections
import multiprocessing as mp
import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from unified_video_action_tpu.ipc.shm import SharedMemoryRingBuffer
from unified_video_action_tpu.real.controller import _unique_name


class ScriptedSpacemouseBackend:
    """Software spacemouse: replays a fixed sequence of (motion6, buttons2)."""

    def __init__(self, script: Sequence[Tuple[np.ndarray, np.ndarray]]):
        self.script = list(script)
        self._i = 0

    def open(self) -> None:
        pass

    def read(self) -> Tuple[np.ndarray, np.ndarray]:
        motion, buttons = self.script[min(self._i, len(self.script) - 1)]
        self._i += 1
        return np.asarray(motion, np.float64), np.asarray(buttons, np.int64)

    def close(self) -> None:
        pass


class SpacemouseProcess(mp.Process):
    """Polls a 6-DoF input backend into the shared ring at ``frequency``.

    State layout matches the reference's: ``motion_event`` = [tx ty tz rx ry
    rz] in [-1, 1] after deadzone suppression, ``button_state`` = 2 ints,
    ``receive_timestamp``. ``get_motion_state`` returns the latest filtered
    motion; ``is_button_pressed(i)`` the latest button state.
    """

    def __init__(
        self,
        backend,
        frequency: float = 200.0,
        deadzone: float = 0.05,
        max_value: float = 1.0,
        get_max_k: int = 64,
    ):
        super().__init__(daemon=True)
        self.backend = backend
        self.frequency = float(frequency)
        self.deadzone = float(deadzone)
        self.max_value = float(max_value)
        self.ring = SharedMemoryRingBuffer(
            _unique_name("spacemouse"),
            {
                "motion_event": np.zeros(6, np.float64),
                "button_state": np.zeros(2, np.int64),
                "receive_timestamp": np.zeros((), np.float64),
            },
            get_max_k=get_max_k,
        )
        self.ready_event = mp.Event()
        self._stop_event = mp.Event()

    # -- parent-side API ----------------------------------------------------

    def start_wait(self, timeout: float = 10.0) -> None:
        self.start()
        if not self.ready_event.wait(timeout):
            raise RuntimeError("spacemouse failed to become ready")

    def stop_wait(self, timeout: float = 5.0) -> None:
        self._stop_event.set()
        self.join(timeout)
        if self.is_alive():
            self.terminate()

    def get_motion_state(self) -> np.ndarray:
        state = self.ring.get_last_k(1)
        return state["motion_event"][0]

    def get_motion_state_transformed(
        self, rotation: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Motion with translation/rotation axes remapped by a 3×3 matrix
        (the reference applies a fixed frame rotation per robot mount)."""
        m = self.get_motion_state()
        if rotation is None:
            return m
        out = np.empty(6)
        out[:3] = rotation @ m[:3]
        out[3:] = rotation @ m[3:]
        return out

    def is_button_pressed(self, idx: int) -> bool:
        state = self.ring.get_last_k(1)
        return bool(state["button_state"][0][idx])

    # -- child-side loop ----------------------------------------------------

    def run(self):  # pragma: no cover - exercised via integration test
        self.backend.open()
        dt = 1.0 / self.frequency
        t0 = time.monotonic()
        i = 0
        while not self._stop_event.is_set():
            motion, buttons = self.backend.read()
            m = np.clip(motion / self.max_value, -1.0, 1.0)
            m = np.where(np.abs(m) < self.deadzone, 0.0, m)
            self.ring.put(
                {
                    "motion_event": m.astype(np.float64),
                    "button_state": buttons.astype(np.int64),
                    "receive_timestamp": np.float64(time.time()),
                }
            )
            if i == 0:
                self.ready_event.set()
            i += 1
            sleep = (t0 + i * dt) - time.monotonic()
            if sleep > 0:
                time.sleep(sleep)
        self.backend.close()


class KeystrokeCounter:
    """Counts key events from a pluggable source (reference: pynput listener).

    ``push(key)`` may be called from any thread (a real keyboard listener's
    callback, or tests); ``count(key)`` returns presses seen so far and
    ``get_press_events()`` drains the event queue — the two reads the
    reference's recording loop uses to trigger episode start/stop/drop.
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._counts: Dict[str, int] = collections.defaultdict(int)
        self._events: List[str] = []

    def push(self, key: str) -> None:
        with self._lock:
            self._counts[key] += 1
            self._events.append(key)

    def count(self, key: str) -> int:
        with self._lock:
            return self._counts[key]

    def get_press_events(self) -> List[str]:
        with self._lock:
            out, self._events = self._events, []
            return out

    def clear(self) -> None:
        with self._lock:
            self._counts.clear()
            self._events.clear()

    def attach_pynput(self):  # pragma: no cover - needs a display/keyboard
        """Start a pynput keyboard listener feeding ``push`` (optional)."""
        from pynput import keyboard

        def on_press(key):
            self.push(getattr(key, "char", None) or str(key))

        listener = keyboard.Listener(on_press=on_press)
        listener.start()
        return listener
