"""Two-arm orchestration on simulated backends (reference
bimanual_umi_env.py:25-695) + headless multi-camera grid visualizer."""

import os
import time

import numpy as np
import pytest

from unified_video_action_tpu.real.bimanual import (
    BimanualUmiEnv,
    MultiCameraVisualizer,
    select_align_camera,
)


def _make_env(n_cams_extra=0, **kw):
    from unified_video_action_tpu.real.camera import CameraProcess
    from unified_video_action_tpu.real.controller import (
        PoseInterpolationController, WidthController,
    )
    from unified_video_action_tpu.real.sim import (
        SimArmBackend, SimCameraBackend, SimGripperBackend,
    )

    robots = [
        PoseInterpolationController(
            SimArmBackend(init_pose=np.r_[0.1 * i, 0, 0, 0, 0, 0], tau=0.01),
            frequency=125.0, max_pos_speed=2.0, max_rot_speed=4.0,
        )
        for i in range(2)
    ]
    grippers = [
        WidthController(
            SimGripperBackend(init_width=0.08, max_speed=1.0),
            frequency=60.0, max_speed=1.0,
        )
        for _ in range(2)
    ]
    cams = [
        CameraProcess(SimCameraBackend((24, 24), seed=i),
                      resolution=(24, 24), fps=60.0)
        for i in range(2 + n_cams_extra)
    ]
    return BimanualUmiEnv(robots, grippers, cams, frequency=10.0,
                          camera_obs_horizon=2, robot_obs_horizon=2,
                          gripper_obs_horizon=2, **kw)


def test_select_align_camera_prefers_least_stale():
    now = 100.0
    mk = lambda *ts: {"timestamp": np.asarray(ts)}
    # aligning on camera0's newest (100.0) forces a 1.0s fallback to
    # camera1's newest older frame; aligning on camera1's newest (99.05)
    # finds a 0.05s-stale frame in camera0 -> camera1 wins
    data = [mk(98.9, 99.0, 100.0), mk(98.95, 99.05)]
    assert select_align_camera(data, 2) == 1
    # symmetric check: swapping the lists flips the winner
    assert select_align_camera(data[::-1], 2) == 0


@pytest.mark.slow
def test_bimanual_obs_namespacing_and_timed_execution():
    env = _make_env()
    with env:
        time.sleep(0.4)
        obs = env.get_obs()
        for i in range(2):
            assert obs[f"camera{i}_rgb"].shape == (2, 24, 24, 3)
            assert obs[f"robot{i}_eef_pos"].shape == (2, 3)
            assert obs[f"robot{i}_eef_rot_axis_angle"].shape == (2, 3)
            assert obs[f"robot{i}_gripper_width"].shape == (2, 1)
        # arms are distinct streams (different init poses)
        assert obs["robot0_eef_pos"][-1, 0] != pytest.approx(
            obs["robot1_eef_pos"][-1, 0], abs=1e-3
        )

        # 14-dim interleaved action chunk: move each arm to a distinct
        # target and close gripper 1 only
        t0 = time.time()
        targets = np.zeros((3, 14))
        targets[:, 0] = 0.30   # arm0 x
        targets[:, 6] = 0.08   # arm0 width stays open
        targets[:, 7] = -0.20  # arm1 x
        targets[:, 13] = 0.02  # arm1 width closes
        n = env.exec_actions(
            targets, t0 + np.array([0.25, 0.45, 0.65]),
        )
        assert n == 3
        time.sleep(1.2)
        obs = env.get_obs()
        assert obs["robot0_eef_pos"][-1, 0] == pytest.approx(0.30, abs=0.02)
        assert obs["robot1_eef_pos"][-1, 0] == pytest.approx(-0.20, abs=0.02)
        assert obs["robot0_gripper_width"][-1, 0] == pytest.approx(0.08, abs=0.01)
        assert obs["robot1_gripper_width"][-1, 0] == pytest.approx(0.02, abs=0.01)


@pytest.mark.slow
def test_bimanual_episode_logging_roundtrip():
    env = _make_env()
    with env:
        time.sleep(0.3)
        env.start_episode()
        t0 = time.time()
        acts = np.tile(np.r_[np.zeros(6), 0.05, np.zeros(6), 0.03], (2, 1))
        env.exec_actions(acts, t0 + np.array([0.2, 0.35]))
        env.get_obs()
        time.sleep(0.5)
        env.get_obs()
        ep = env.end_episode()
        assert ep["action"].shape == (2, 14)
        for i in range(2):
            k = f"robot{i}_eef_pose"
            assert k in ep and len(ep[k]) == len(ep[k + "_timestamp"]) > 0
        assert env.obs_accumulator is None

        # stale actions (past timestamps) are dropped
        env.start_episode()
        n = env.exec_actions(acts, time.time() - np.array([1.0, 0.5]))
        assert n == 0
        env.drop_episode()


def test_exec_actions_rejects_wrong_width():
    env = _make_env()
    with pytest.raises(AssertionError):
        # not started -> is_ready False fires first; so start minimal check
        env.exec_actions(np.zeros((1, 7)), np.array([time.time() + 1]))


@pytest.mark.slow
def test_multi_camera_visualizer_file_sink(tmp_path):
    from unified_video_action_tpu.real.camera import CameraProcess
    from unified_video_action_tpu.real.sim import SimCameraBackend

    cams = [
        CameraProcess(SimCameraBackend((16, 16), seed=i),
                      resolution=(16, 16), fps=30.0)
        for i in range(3)
    ]
    for c in cams:
        c.start_wait(10.0)
    out = str(tmp_path / "grid.npy")
    try:
        vis = MultiCameraVisualizer(cams, row=2, col=2, vis_fps=20.0,
                                    sink="file", out_path=out)
        with vis:
            deadline = time.monotonic() + 5.0
            while not os.path.exists(out) and time.monotonic() < deadline:
                time.sleep(0.05)
        assert os.path.exists(out)
        grid = np.load(out)
        assert grid.shape == (32, 32, 3) and grid.dtype == np.uint8
        # the unused bottom-right cell stays at fill_value
        assert (grid[16:, 16:] == 0).all()
        # at least one real frame cell is non-constant
        assert grid[:16, :16].std() > 0
    finally:
        for c in cams:
            c.stop_wait()
