"""Real-robot runtime, fully in software: trajectory math unit tests +
controller/camera processes over the C++ shared-memory IPC + the
latency-aligned UmiRealEnv obs->policy->timed-execution loop
(reference umi/real_world/umi_env.py:359-497 semantics)."""

import time

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from unified_video_action_tpu.real.trajectory import (
    PoseTrajectory,
    ScalarTrajectory,
)


# ----------------------------------------------------------------------
# trajectory math
# ----------------------------------------------------------------------

def test_pose_trajectory_interpolates_and_clamps():
    poses = np.array([
        [0, 0, 0, 0, 0, 0],
        [1, 0, 0, 0, 0, np.pi / 2],
    ], dtype=np.float64)
    traj = PoseTrajectory([0.0, 1.0], poses)
    mid = traj(0.5)
    np.testing.assert_allclose(mid[:3], [0.5, 0, 0], atol=1e-9)
    # slerp: half the rotation
    np.testing.assert_allclose(mid[3:], [0, 0, np.pi / 4], atol=1e-9)
    # end clamping (constant extrapolation)
    np.testing.assert_allclose(traj(5.0), poses[1], atol=1e-9)
    np.testing.assert_allclose(traj(-5.0), poses[0], atol=1e-9)


def test_pose_trajectory_slerp_shortest_path():
    a = Rotation.from_euler("z", 170, degrees=True).as_rotvec()
    b = Rotation.from_euler("z", -170, degrees=True).as_rotvec()
    traj = PoseTrajectory([0.0, 1.0], np.array([[0, 0, 0, *a], [0, 0, 0, *b]]))
    mid = Rotation.from_rotvec(np.asarray(traj(0.5))[3:])
    # shortest path crosses 180, not 0
    assert abs(mid.magnitude() - np.pi) < 1e-6


def test_schedule_waypoint_preserves_past_replaces_future():
    traj = PoseTrajectory(
        [0.0, 1.0, 2.0],
        np.array([[0, 0, 0, 0, 0, 0], [1, 0, 0, 0, 0, 0], [2, 0, 0, 0, 0, 0]],
                 dtype=np.float64),
    )
    new = traj.schedule_waypoint(
        np.array([5, 0, 0, 0, 0, 0.0]), target_time=1.5, curr_time=0.5
    )
    # value at curr_time unchanged; future replaced by the new waypoint
    np.testing.assert_allclose(np.asarray(new(0.5))[:3], [0.5, 0, 0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(new(1.5))[:3], [5, 0, 0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(new(3.0))[:3], [5, 0, 0], atol=1e-9)


def test_schedule_waypoint_respects_speed_limit():
    traj = PoseTrajectory([0.0], np.zeros((1, 6)))
    new = traj.schedule_waypoint(
        np.array([1.0, 0, 0, 0, 0, 0]), target_time=0.1, curr_time=0.0,
        max_pos_speed=0.5,
    )
    # 1 m at 0.5 m/s needs 2 s: the arrival is pushed out
    assert new.times[-1] >= 2.0 - 1e-9
    np.testing.assert_allclose(np.asarray(new(1.0))[0], 0.5, atol=1e-6)


def test_scalar_trajectory_schedule():
    traj = ScalarTrajectory([0.0], np.array([[0.08]]))
    new = traj.schedule_waypoint(0.0, target_time=1.0, curr_time=0.0,
                                 max_speed=0.2)
    # linear to arrive AT the target time (speed limit only delays arrival)
    np.testing.assert_allclose(float(np.ravel(new(0.5))[0]), 0.04, atol=1e-6)
    np.testing.assert_allclose(float(np.ravel(new(10.0))[0]), 0.0, atol=1e-9)
    # below the speed limit the arrival gets pushed out: 0.08 m at 0.2 m/s
    fast = traj.schedule_waypoint(0.0, target_time=0.1, curr_time=0.0,
                                  max_speed=0.2)
    assert fast.times[-1] >= 0.4 - 1e-9


# ----------------------------------------------------------------------
# controller + camera processes over the C++ IPC
# ----------------------------------------------------------------------

def _make_env(**kw):
    from unified_video_action_tpu.real import (
        CameraProcess, PoseInterpolationController, UmiRealEnv, WidthController,
    )
    from unified_video_action_tpu.real.sim import (
        SimArmBackend, SimCameraBackend, SimGripperBackend,
    )

    robot = PoseInterpolationController(
        SimArmBackend(init_pose=np.zeros(6), tau=0.01), frequency=125.0,
        max_pos_speed=2.0, max_rot_speed=4.0,
    )
    gripper = WidthController(
        SimGripperBackend(init_width=0.08, max_speed=1.0), frequency=60.0,
        max_speed=1.0,
    )
    cam = CameraProcess(SimCameraBackend((32, 32), seed=1),
                        resolution=(32, 32), fps=60.0)
    return UmiRealEnv(robot, gripper, [cam], frequency=10.0,
                      camera_obs_horizon=2, robot_obs_horizon=2,
                      gripper_obs_horizon=2, **kw)


@pytest.mark.slow
def test_umi_real_env_obs_and_timed_execution():
    env = _make_env()
    with env:
        time.sleep(0.3)  # let streams fill

        obs = env.get_obs()
        assert obs["camera0_rgb"].shape == (2, 32, 32, 3)
        assert obs["robot0_eef_pos"].shape == (2, 3)
        assert obs["robot0_eef_rot_axis_angle"].shape == (2, 3)
        assert obs["robot0_gripper_width"].shape == (2, 1)
        # aligned timestamps: strictly increasing, spaced by 1/frequency
        ts = obs["timestamp"]
        np.testing.assert_allclose(np.diff(ts), 0.1, atol=1e-6)
        # alignment: obs timestamps end at the camera's newest frame time and
        # are close to 'now'
        assert abs(ts[-1] - time.time()) < 0.5

        env.start_episode()
        # scripted "policy": move +x 10 cm and close the gripper over 0.5 s
        t0 = time.time()
        action_times = t0 + 0.15 + np.arange(4) * 0.1
        target = np.array([0.10, 0.0, 0.0, 0.0, 0.0, 0.0])
        actions = np.concatenate(
            [np.linspace(np.zeros(6), target, 4),
             np.linspace([[0.08]], [[0.02]], 4).reshape(4, 1)], axis=1
        )
        n = env.exec_actions(actions, action_times)
        assert n == 4

        # stale actions (timestamps in the past) are dropped
        assert env.exec_actions(actions, action_times - 100.0) == 0

        time.sleep(0.8)  # let the waypoints play out
        state = env.get_robot_state()
        pose = np.asarray(state["ActualTCPPose"]).reshape(-1)[:6]
        np.testing.assert_allclose(pose[:3], target[:3], atol=0.02)
        gobs = env.get_obs()
        assert abs(float(gobs["robot0_gripper_width"][-1, 0]) - 0.02) < 0.01

        ep = env.end_episode()
        assert ep["action"].shape == (4, 7)
        assert len(ep["robot0_eef_pose"]) > 10
        # recorded obs timestamps are monotone
        assert np.all(np.diff(ep["robot0_eef_pose_timestamp"]) >= 0)


@pytest.mark.slow
def test_timed_waypoints_reach_on_schedule():
    """The scheduled waypoint is reached close to its target time, not as fast
    as possible: at half of the (future) schedule the arm must be mid-way."""
    from unified_video_action_tpu.real import PoseInterpolationController
    from unified_video_action_tpu.real.sim import SimArmBackend

    robot = PoseInterpolationController(
        SimArmBackend(init_pose=np.zeros(6), tau=0.005), frequency=250.0,
        max_pos_speed=10.0, max_rot_speed=10.0,
    )
    robot.start_wait()
    try:
        time.sleep(0.1)
        t0 = time.time()
        robot.schedule_waypoint(np.array([0.2, 0, 0, 0, 0, 0.0]), t0 + 0.6)
        time.sleep(0.3)
        mid = np.asarray(robot.get_state()["ActualTCPPose"]).reshape(-1)
        assert 0.04 < mid[0] < 0.16, mid  # mid-flight, not teleported
        time.sleep(0.5)
        end = np.asarray(robot.get_state()["ActualTCPPose"]).reshape(-1)
        np.testing.assert_allclose(end[:3], [0.2, 0, 0], atol=0.01)
    finally:
        robot.stop_wait()
