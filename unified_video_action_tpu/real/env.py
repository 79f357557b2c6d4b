"""UmiRealEnv: latency-aligned observation assembly + timed action execution.

Equivalent of the reference's ``UmiEnv`` orchestration
(umi/real_world/umi_env.py:26-603):

* ``get_obs()``: 'current' time is the align-camera's last frame timestamp;
  camera horizons pick nearest-timestamp frames, low-dim horizons (robot pose,
  gripper width) interpolate their controller state streams at the aligned
  times (umi_env.py:359-464).
* ``exec_actions(actions, timestamps)``: drops already-stale actions and
  schedules pose + gripper waypoints at the remaining wall-clock target times,
  optionally compensating per-device action latency (umi_env.py:465-497).
* episode accumulators record timestamped obs/action streams for replay-buffer
  logging (start/stop/drop, umi_env.py:502-601).

Hardware enters only through the controller/camera backends, so the whole
stack runs (and is tested) against the simulated devices in real/sim.py.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import numpy as np

from unified_video_action_tpu.real.camera import CameraProcess
from unified_video_action_tpu.real.controller import (
    PoseInterpolationController,
    WidthController,
)
from unified_video_action_tpu.real.trajectory import (
    PoseTrajectory,
    ScalarTrajectory,
)


class _Accumulator:
    """Timestamped stream store (reference TimestampObsAccumulator role)."""

    def __init__(self):
        self.data: Dict[str, List[np.ndarray]] = {}
        self.timestamps: Dict[str, List[float]] = {}

    def put(self, data: Dict[str, np.ndarray], timestamps: np.ndarray) -> None:
        ts = np.atleast_1d(np.asarray(timestamps, np.float64))
        for k, v in data.items():
            v = np.asarray(v)
            if v.shape[0] != len(ts):
                v = np.broadcast_to(v, (len(ts), *v.shape))
            self.data.setdefault(k, []).extend(list(v))
            self.timestamps.setdefault(k, []).extend(ts.tolist())

    def arrays(self) -> Dict[str, np.ndarray]:
        out = {}
        for k in self.data:
            out[k] = np.asarray(self.data[k])
            out[k + "_timestamp"] = np.asarray(self.timestamps[k])
        return out


class UmiRealEnv:
    def __init__(
        self,
        robot: PoseInterpolationController,
        gripper: WidthController,
        cameras: Sequence[CameraProcess],
        frequency: float = 10.0,
        camera_obs_horizon: int = 2,
        robot_obs_horizon: int = 2,
        gripper_obs_horizon: int = 2,
        camera_down_sample_steps: int = 1,
        robot_down_sample_steps: int = 1,
        gripper_down_sample_steps: int = 1,
        align_camera_idx: int = 0,
        robot_action_latency: float = 0.0,
        gripper_action_latency: float = 0.0,
    ):
        assert len(cameras) >= 1
        self.robot = robot
        self.gripper = gripper
        self.cameras = list(cameras)
        self.frequency = float(frequency)
        self.camera_obs_horizon = camera_obs_horizon
        self.robot_obs_horizon = robot_obs_horizon
        self.gripper_obs_horizon = gripper_obs_horizon
        self.camera_down_sample_steps = camera_down_sample_steps
        self.robot_down_sample_steps = robot_down_sample_steps
        self.gripper_down_sample_steps = gripper_down_sample_steps
        self.align_camera_idx = align_camera_idx
        self.robot_action_latency = robot_action_latency
        self.gripper_action_latency = gripper_action_latency
        self.obs_accumulator: Optional[_Accumulator] = None
        self.action_accumulator: Optional[_Accumulator] = None

    # -- lifecycle ------------------------------------------------------------

    def start(self, timeout: float = 10.0) -> None:
        for cam in self.cameras:
            cam.start_wait(timeout)
        self.robot.start_wait(timeout)
        self.gripper.start_wait(timeout)

    def stop(self) -> None:
        self.robot.stop_wait()
        self.gripper.stop_wait()
        for cam in self.cameras:
            cam.stop_wait()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.stop()

    @property
    def is_ready(self) -> bool:
        return (
            all(c.is_ready for c in self.cameras)
            and self.robot.is_ready
            and self.gripper.is_ready
        )

    # -- observation ----------------------------------------------------------

    def get_obs(self) -> Dict[str, np.ndarray]:
        assert self.is_ready
        dt = 1.0 / self.frequency

        # pull enough frames to cover the aligned horizon at EACH camera's own
        # rate (a 60 fps wrist camera needs twice the frames of a 30 fps
        # scene camera for the same time window)
        def k_for(cam):
            k = int(np.ceil(
                self.camera_obs_horizon * self.camera_down_sample_steps
                * max(cam.fps * dt, 1.0)
            )) + 2
            return min(k, cam.get_max_k)

        cam_data = [cam.get(k_for(cam)) for cam in self.cameras]

        robot_state = self.robot.get_all_state()
        gripper_state = self.gripper.get_all_state()

        last_timestamp = float(cam_data[self.align_camera_idx]["timestamp"][-1])

        camera_obs_timestamps = last_timestamp - (
            np.arange(self.camera_obs_horizon)[::-1]
            * self.camera_down_sample_steps * dt
        )
        obs: Dict[str, np.ndarray] = {}
        for idx, value in enumerate(cam_data):
            ts = value["timestamp"]
            nn = [int(np.argmin(np.abs(ts - t))) for t in camera_obs_timestamps]
            obs[f"camera{idx}_rgb"] = value["color"][nn]

        robot_obs_timestamps = last_timestamp - (
            np.arange(self.robot_obs_horizon)[::-1]
            * self.robot_down_sample_steps * dt
        )
        pose_interp = PoseTrajectory(
            robot_state["timestamp"], robot_state["ActualTCPPose"]
        )
        robot_pose = np.atleast_2d(pose_interp(robot_obs_timestamps))
        obs["robot0_eef_pos"] = robot_pose[..., :3]
        obs["robot0_eef_rot_axis_angle"] = robot_pose[..., 3:]

        gripper_obs_timestamps = last_timestamp - (
            np.arange(self.gripper_obs_horizon)[::-1]
            * self.gripper_down_sample_steps * dt
        )
        g_interp = ScalarTrajectory(
            gripper_state["timestamp"],
            gripper_state["gripper_position"][..., None],
        )
        obs["robot0_gripper_width"] = np.atleast_2d(
            g_interp(gripper_obs_timestamps)
        )
        obs["timestamp"] = camera_obs_timestamps

        if self.obs_accumulator is not None:
            self.obs_accumulator.put(
                {"robot0_eef_pose": robot_state["ActualTCPPose"]},
                timestamps=robot_state["timestamp"],
            )
            self.obs_accumulator.put(
                {"robot0_gripper_width":
                 gripper_state["gripper_position"][..., None]},
                timestamps=gripper_state["timestamp"],
            )
        return obs

    def get_robot_state(self) -> Dict[str, np.ndarray]:
        return self.robot.get_state()

    # -- action ---------------------------------------------------------------

    def exec_actions(
        self,
        actions: np.ndarray,
        timestamps: np.ndarray,
        compensate_latency: bool = False,
    ) -> int:
        """actions: (N, 7) = pose6 + width1 at wall-clock ``timestamps``.
        Returns the number of still-fresh actions actually scheduled."""
        assert self.is_ready
        actions = np.asarray(actions, np.float64)
        timestamps = np.asarray(timestamps, np.float64)
        receive_time = time.time()
        is_new = timestamps > receive_time
        new_actions = actions[is_new]
        new_timestamps = timestamps[is_new]

        r_lat = self.robot_action_latency if compensate_latency else 0.0
        g_lat = self.gripper_action_latency if compensate_latency else 0.0
        for a, t in zip(new_actions, new_timestamps):
            self.robot.schedule_waypoint(pose=a[:6], target_time=t - r_lat)
            self.gripper.schedule_waypoint(pos=a[6:], target_time=t - g_lat)

        if self.action_accumulator is not None:
            self.action_accumulator.put(
                {"action": new_actions}, timestamps=new_timestamps
            )
        return int(len(new_actions))

    # -- episode logging --------------------------------------------------------

    def start_episode(self) -> None:
        self.obs_accumulator = _Accumulator()
        self.action_accumulator = _Accumulator()

    def end_episode(self) -> Dict[str, np.ndarray]:
        out = {}
        if self.obs_accumulator is not None:
            out.update(self.obs_accumulator.arrays())
        if self.action_accumulator is not None:
            out.update(self.action_accumulator.arrays())
        self.obs_accumulator = None
        self.action_accumulator = None
        return out

    def drop_episode(self) -> None:
        self.obs_accumulator = None
        self.action_accumulator = None
