"""Franka RPC middle layer: method surface, tip/flange convention, servoing.

Runs against the scripted FakeFrankaServer (real/franka.py) over real ZMQ
sockets — the no-hardware strategy shared with the WSG and RTDE drivers.
Capability parity target: reference franka_interpolation_controller.py:40-70
(FrankaInterface RPC surface + flange↔tip transform) and :234-273 (impedance
start + servo loop).
"""

import time

import numpy as np
import pytest

from unified_video_action_tpu.real.franka import (
    FakeFrankaServer,
    FrankaArmBackend,
    FrankaRpcClient,
    FrankaRpcError,
    tx_flange_tip,
)
from unified_video_action_tpu.utils.pose import mat_to_pose, pose_to_mat


def test_tx_flange_tip_matches_reference_construction():
    # reference franka_interpolation_controller.py:25-37: 45deg z, 90deg x,
    # tip offset (-0.0336, 0, 0.247); orthonormal rotation, det +1
    R = tx_flange_tip[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(R) == pytest.approx(1.0)
    # the z offset dominates the translation (tool ahead of the flange)
    assert abs(tx_flange_tip[2, 3]) < 0.26 and tx_flange_tip[:3, 3].any()


def test_rpc_roundtrip_and_fault_contract():
    with FakeFrankaServer() as srv:
        cli = FrankaRpcClient("127.0.0.1", srv.port)
        cli.connect()
        try:
            q = cli.get_joint_positions()
            assert q.shape == (7,)
            cli.move_to_joint_positions(np.arange(7.0), 2.0)
            np.testing.assert_allclose(cli.get_joint_positions(),
                                       np.arange(7.0))
            # errors travel back as RPC faults, not hangs
            with pytest.raises(FrankaRpcError, match="unknown RPC method"):
                cli.call("no_such_method")
            # setpoints before start_cartesian_impedance are rejected
            with pytest.raises(FrankaRpcError, match="impedance"):
                cli.update_desired_ee_pose(np.zeros(6))
        finally:
            cli.close()


def test_tip_flange_conversion_is_consistent():
    """get_ee_pose returns TIP; update_desired_ee_pose takes TIP — sending
    back what you read must leave the flange pose fixed on the wire."""
    with FakeFrankaServer() as srv:
        cli = FrankaRpcClient("127.0.0.1", srv.port)
        cli.connect()
        try:
            cli.start_cartesian_impedance(np.ones(6), np.ones(6))
            tip = cli.get_ee_pose()
            flange_before = np.asarray(cli.call("get_ee_pose"))
            cli.update_desired_ee_pose(tip)
            np.testing.assert_allclose(srv.desired, flange_before, atol=1e-9)
            # and the tip relation itself holds
            np.testing.assert_allclose(
                tip, mat_to_pose(pose_to_mat(flange_before) @ tx_flange_tip),
                atol=1e-12,
            )
        finally:
            cli.close()


def test_backend_servo_converges_on_fake_hardware():
    with FakeFrankaServer(tau=0.02) as srv:
        backend = FrankaArmBackend("127.0.0.1", srv.port,
                                   joints_init=np.zeros(7))
        backend.connect()
        try:
            assert "start_cartesian_impedance" in srv.calls
            assert "move_to_joint_positions" in srv.calls
            start_tip = backend.get_pose()
            target = start_tip + np.array([0.05, -0.03, 0.02, 0, 0, 0.1])
            deadline = time.monotonic() + 3.0
            while time.monotonic() < deadline:
                backend.servo_pose(target)
                if np.allclose(backend.get_pose(), target, atol=1e-3):
                    break
                time.sleep(0.01)
            np.testing.assert_allclose(backend.get_pose(), target, atol=1e-3)
        finally:
            backend.close()
        assert "terminate_current_policy" in srv.calls


@pytest.mark.slow
def test_pose_controller_rides_franka_backend():
    from unified_video_action_tpu.real import PoseInterpolationController

    with FakeFrankaServer(tau=0.02) as srv:
        backend = FrankaArmBackend("127.0.0.1", srv.port)
        robot = PoseInterpolationController(
            backend, frequency=60.0, max_pos_speed=2.0, max_rot_speed=4.0,
        )
        robot.start_wait()
        try:
            start = np.ravel(robot.get_state()["ActualTCPPose"])
            target = start + np.array([0.04, 0.02, -0.02, 0, 0, 0.05])
            robot.schedule_waypoint(target, time.time() + 0.5)
            time.sleep(1.2)
            state = robot.get_state()
            np.testing.assert_allclose(
                np.ravel(state["ActualTCPPose"]), target, atol=5e-2
            )
        finally:
            robot.stop_wait()
