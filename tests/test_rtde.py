"""RTDE wire protocol: framing, negotiation, streaming, servo round-trip.

Protocol-level tests against the scripted FakeURServer (real/rtde.py) — the
same no-hardware strategy as the WSG gripper driver tests. Capability parity
target: the reference's ur_rtde usage in rtde_interpolation_controller.py
(:247 getActualTCPPose via streamed outputs, :268 servoL via the input
register convention).
"""

import socket
import struct
import time

import numpy as np
import pytest

from unified_video_action_tpu.real.rtde import (
    FakeURServer,
    PacketType,
    RtdeClient,
    RtdeError,
    URArmBackend,
    encode_packet,
    read_packet,
    _pack_values,
    _unpack_values,
)


# ---------------------------------------------------------------------------
# unit: packet + value codecs
# ---------------------------------------------------------------------------


def test_packet_roundtrip_over_socketpair():
    a, b = socket.socketpair()
    try:
        payload = b"\x01\x02\x03hello"
        a.sendall(encode_packet(PacketType.DATA_PACKAGE, payload))
        ptype, rp = read_packet(b)
        assert ptype == PacketType.DATA_PACKAGE
        assert rp == payload
    finally:
        a.close()
        b.close()


def test_packet_header_is_big_endian_size_prefixed():
    pkt = encode_packet(PacketType.CONTROL_PACKAGE_START, b"xy")
    size, ptype = struct.unpack(">HB", pkt[:3])
    assert size == len(pkt) == 5
    assert ptype == PacketType.CONTROL_PACKAGE_START


def test_value_codec_roundtrip_all_types():
    types = ["DOUBLE", "VECTOR6D", "INT32", "UINT64", "VECTOR3D", "BOOL",
             "UINT8", "VECTOR6INT32", "UINT32"]
    values = [1.5, np.arange(6.0), -7, 2**40, np.array([0.1, 0.2, 0.3]),
              True, 200, np.arange(6), 12345]
    blob = _pack_values(types, values)
    out = _unpack_values(types, blob)
    assert out[0] == 1.5
    np.testing.assert_allclose(out[1], np.arange(6.0))
    assert out[2] == -7 and out[3] == 2**40
    np.testing.assert_allclose(out[4], [0.1, 0.2, 0.3])
    assert out[5] is True and out[6] == 200
    np.testing.assert_array_equal(out[7], np.arange(6))
    assert out[8] == 12345


def test_value_codec_rejects_wrong_arity_and_trailing_bytes():
    with pytest.raises(RtdeError):
        _pack_values(["VECTOR6D"], [np.arange(3.0)])
    with pytest.raises(RtdeError):
        _unpack_values(["DOUBLE"], b"\x00" * 9)


# ---------------------------------------------------------------------------
# client <-> fake controller
# ---------------------------------------------------------------------------


def test_handshake_and_controller_version():
    with FakeURServer() as srv:
        with RtdeClient("127.0.0.1", srv.port) as cli:
            major, minor, bugfix, build = cli.get_controller_version()
            assert (major, minor) == (5, 12)


def test_protocol_v1_rejected_by_v2_only_controller():
    with FakeURServer(min_protocol=2) as srv:
        cli = RtdeClient("127.0.0.1", srv.port)
        cli.sock = socket.create_connection(("127.0.0.1", srv.port), 2.0)
        try:
            assert cli.negotiate_protocol_version(1) is False
            assert cli.negotiate_protocol_version(2) is True
        finally:
            cli.close()


def test_setup_outputs_unknown_variable_raises():
    with FakeURServer() as srv:
        with RtdeClient("127.0.0.1", srv.port) as cli:
            with pytest.raises(RtdeError, match="no_such_var"):
                cli.setup_outputs(["actual_TCP_pose", "no_such_var"])


def test_output_stream_decodes_by_recipe():
    with FakeURServer(initial_pose=(1, 2, 3, 0.1, 0.2, 0.3)) as srv:
        with RtdeClient("127.0.0.1", srv.port) as cli:
            cli.setup_outputs(
                ["timestamp", "actual_TCP_pose", "robot_mode"],
                frequency=250.0,
            )
            cli.start()
            s1 = cli.receive()
            s2 = cli.receive()
            np.testing.assert_allclose(
                s1["actual_TCP_pose"], [1, 2, 3, 0.1, 0.2, 0.3]
            )
            assert s2["timestamp"] > s1["timestamp"]
            assert s1["robot_mode"] == 7
            cli.pause()


def test_servo_registers_move_fake_robot():
    target = np.array([0.5, 0.1, 0.3, 0.0, 3.14, 0.0])
    with FakeURServer(max_speed=10.0) as srv:
        backend = URArmBackend("127.0.0.1", srv.port, frequency=250.0)
        backend.connect()
        try:
            start = backend.get_pose()
            assert start.shape == (6,)
            deadline = time.monotonic() + 3.0
            while time.monotonic() < deadline:
                backend.servo_pose(target)
                if np.allclose(backend.get_pose(), target, atol=1e-3):
                    break
                time.sleep(0.01)
            np.testing.assert_allclose(backend.get_pose(), target, atol=1e-3)
            # the register convention was exercised, not some side channel
            assert len(srv.received_setpoints) > 0
            np.testing.assert_allclose(srv.received_setpoints[-1], target)
        finally:
            backend.close()


@pytest.mark.slow
def test_pose_controller_rides_rtde_backend():
    """The generic timed-waypoint controller process (real/controller.py)
    drives a UR arm purely through the RTDE wire protocol."""
    from unified_video_action_tpu.real import PoseInterpolationController

    target = np.array([0.6, -0.1, 0.4, 0.0, 3.0, 0.1])
    with FakeURServer(max_speed=10.0) as srv:
        robot = PoseInterpolationController(
            URArmBackend("127.0.0.1", srv.port, frequency=250.0),
            frequency=60.0, max_pos_speed=2.0, max_rot_speed=4.0,
        )
        robot.start_wait()
        try:
            robot.schedule_waypoint(target, time.time() + 0.5)
            time.sleep(1.2)
            state = robot.get_state()
            np.testing.assert_allclose(
                np.ravel(state["ActualTCPPose"]), target, atol=5e-2
            )
        finally:
            robot.stop_wait()
