"""Timed-waypoint device controller processes over the native C++ IPC.

Equivalent capability to the reference's per-device ``mp.Process`` controllers
(rtde_interpolation_controller.py:23-376, wsg_controller.py:19-241): a child
process runs a fixed-frequency control loop that (a) drains a shared-memory
command queue (SERVO / SCHEDULE_WAYPOINT / STOP), (b) maintains a
time-parameterized trajectory, (c) servos the hardware backend at the
interpolated setpoint, and (d) publishes timestamped state into the lock-free
C++ SPMC ring buffer (native/shm_ipc.cpp) for any number of readers.

Command ``target_time`` is wall-clock (time.time()); the loop converts to the
monotonic clock internally so control never runs backward (reference
rtde_interpolation_controller.py:344-352).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import time
from typing import Any, Dict, Optional

import numpy as np

from unified_video_action_tpu.ipc.shm import (
    SharedMemoryQueue,
    SharedMemoryRingBuffer,
)
from unified_video_action_tpu.real.trajectory import (
    PoseTrajectory,
    ScalarTrajectory,
)

CMD_STOP = 0
CMD_SERVO = 1
CMD_SCHEDULE_WAYPOINT = 2

_uid_counter = mp.Value("i", 0)


def _unique_name(tag: str) -> str:
    with _uid_counter.get_lock():
        _uid_counter.value += 1
        n = _uid_counter.value
    return f"uva_{tag}_{os.getpid()}_{n}"


class _BaseController(mp.Process):
    """Shared process scaffolding: IPC setup, start/stop protocol, pacing."""

    #: width of the command target vector (6 pose / 1 width)
    target_dim = 6

    def __init__(self, backend, frequency: float = 125.0,
                 get_max_k: int = 128, tag: str = "ctrl", verbose: bool = False):
        super().__init__(daemon=True)
        self.backend = backend
        self.frequency = float(frequency)
        self.verbose = verbose
        self._name = _unique_name(tag)
        cmd_examples = {
            "cmd": np.zeros((), np.int32),
            "target": np.zeros(self.target_dim, np.float64),
            "target_time": np.zeros((), np.float64),
            "duration": np.zeros((), np.float64),
        }
        self.input_queue = SharedMemoryQueue(
            self._name + "_q", cmd_examples, buffer_size=256
        )
        self.ring = SharedMemoryRingBuffer(
            self._name + "_r", self._state_examples(), get_max_k=get_max_k
        )
        self.get_max_k = get_max_k
        self.ready_event = mp.Event()
        self._stop_event = mp.Event()

    # -- subclass surface ---------------------------------------------------

    def _state_examples(self) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def _init_trajectory(self, t0: float):
        raise NotImplementedError

    def _servo(self, setpoint: np.ndarray) -> None:
        raise NotImplementedError

    def _read_state(self) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def _apply_command(self, traj, msg, t_now: float, mono_minus_wall: float):
        raise NotImplementedError

    # -- parent-side API ------------------------------------------------------

    def start_wait(self, timeout: float = 10.0) -> None:
        self.start()
        if not self.ready_event.wait(timeout):
            raise RuntimeError(f"{type(self).__name__} failed to become ready")

    def stop_wait(self, timeout: float = 5.0) -> None:
        self.input_queue.put({
            "cmd": np.int32(CMD_STOP),
            "target": np.zeros(self.target_dim),
            "target_time": 0.0, "duration": 0.0,
        })
        self._stop_event.set()
        self.join(timeout)
        if self.is_alive():
            self.terminate()

    def get_state(self, k: int = 1) -> Dict[str, np.ndarray]:
        return self.ring.get_last_k(k)

    def get_all_state(self) -> Dict[str, np.ndarray]:
        k = min(self.ring.count, self.get_max_k)
        return self.ring.get_last_k(max(k, 1))

    @property
    def is_ready(self) -> bool:
        return self.ready_event.is_set()

    # -- child-side loop ------------------------------------------------------

    def run(self):  # pragma: no cover - exercised via integration tests
        self.backend.connect()
        dt = 1.0 / self.frequency
        t0 = time.monotonic()
        traj = self._init_trajectory(t0)
        mono_minus_wall = time.monotonic() - time.time()
        iter_idx = 0
        running = True
        while running and not self._stop_event.is_set():
            t_now = time.monotonic()
            self._servo(np.asarray(traj(t_now)))
            state = self._read_state()
            state["timestamp"] = np.float64(time.time())
            self.ring.put(state)

            if iter_idx == 0:
                self.ready_event.set()
            iter_idx += 1

            while True:
                msg = self.input_queue.get()
                if msg is None:
                    break
                if int(msg["cmd"]) == CMD_STOP:
                    running = False
                    break
                traj = self._apply_command(traj, msg, t_now, mono_minus_wall)

            t_next = t0 + iter_idx * dt
            sleep = t_next - time.monotonic()
            if sleep > 0:
                time.sleep(sleep)
        self.backend.close()


class PoseInterpolationController(_BaseController):
    """6-DoF arm controller: servoes the interpolated pose trajectory and
    publishes {pose, timestamp} (reference RTDEInterpolationController)."""

    target_dim = 6

    def __init__(self, backend, frequency: float = 125.0,
                 max_pos_speed: float = 0.25, max_rot_speed: float = 0.6,
                 **kw):
        super().__init__(backend, frequency=frequency, tag="arm", **kw)
        self.max_pos_speed = max_pos_speed
        self.max_rot_speed = max_rot_speed

    def _state_examples(self):
        return {
            "ActualTCPPose": np.zeros(6, np.float64),
            "timestamp": np.zeros((), np.float64),
        }

    def _init_trajectory(self, t0):
        pose = np.asarray(self.backend.get_pose(), np.float64)
        self._last_waypoint_time = t0
        return PoseTrajectory([t0], pose[None])

    def _servo(self, setpoint):
        self.backend.servo_pose(setpoint)

    def _read_state(self):
        return {"ActualTCPPose": np.asarray(self.backend.get_pose(), np.float64)}

    def _apply_command(self, traj, msg, t_now, mono_minus_wall):
        cmd = int(msg["cmd"])
        pose = np.asarray(msg["target"], np.float64).reshape(6)
        if cmd == CMD_SERVO:
            duration = float(msg["duration"])
            traj = traj.drive_to_waypoint(
                pose, t_now + duration, t_now,
                max_pos_speed=self.max_pos_speed,
                max_rot_speed=self.max_rot_speed,
            )
            self._last_waypoint_time = t_now + duration
        elif cmd == CMD_SCHEDULE_WAYPOINT:
            target_mono = float(msg["target_time"]) + mono_minus_wall
            traj = traj.schedule_waypoint(
                pose, target_mono, curr_time=t_now,
                max_pos_speed=self.max_pos_speed,
                max_rot_speed=self.max_rot_speed,
                last_waypoint_time=self._last_waypoint_time,
            )
            self._last_waypoint_time = max(self._last_waypoint_time, target_mono)
        return traj

    # convenience send APIs (reference :180-205)
    def servo_pose(self, pose, duration: float = 0.1) -> None:
        self.input_queue.put({
            "cmd": np.int32(CMD_SERVO),
            "target": np.asarray(pose, np.float64).reshape(6),
            "target_time": 0.0, "duration": float(duration),
        })

    def schedule_waypoint(self, pose, target_time: float) -> None:
        self.input_queue.put({
            "cmd": np.int32(CMD_SCHEDULE_WAYPOINT),
            "target": np.asarray(pose, np.float64).reshape(6),
            "target_time": float(target_time), "duration": 0.0,
        })


class WidthController(_BaseController):
    """Gripper width controller (reference WSGController semantics: scheduled
    width waypoints; state = {gripper_position, timestamp})."""

    target_dim = 1

    def __init__(self, backend, frequency: float = 30.0,
                 max_speed: float = 0.2, **kw):
        super().__init__(backend, frequency=frequency, tag="grip", **kw)
        self.max_speed = max_speed

    def _state_examples(self):
        return {
            "gripper_position": np.zeros((), np.float64),
            "timestamp": np.zeros((), np.float64),
        }

    def _init_trajectory(self, t0):
        w = float(self.backend.get_width())
        return ScalarTrajectory([t0], np.array([[w]]))

    def _servo(self, setpoint):
        self.backend.servo_width(float(np.atleast_1d(setpoint)[0]))

    def _read_state(self):
        return {"gripper_position": np.float64(self.backend.get_width())}

    def _apply_command(self, traj, msg, t_now, mono_minus_wall):
        cmd = int(msg["cmd"])
        width = float(np.asarray(msg["target"]).reshape(1)[0])
        if cmd in (CMD_SERVO, CMD_SCHEDULE_WAYPOINT):
            if cmd == CMD_SERVO:
                target_mono = t_now + float(msg["duration"])
            else:
                target_mono = float(msg["target_time"]) + mono_minus_wall
            traj = traj.schedule_waypoint(
                width, target_mono, curr_time=t_now, max_speed=self.max_speed
            )
        return traj

    def schedule_waypoint(self, pos, target_time: float) -> None:
        self.input_queue.put({
            "cmd": np.int32(CMD_SCHEDULE_WAYPOINT),
            "target": np.asarray([float(np.ravel(pos)[0])], np.float64),
            "target_time": float(target_time), "duration": 0.0,
        })
