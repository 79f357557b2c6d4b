"""WSG-50 binary protocol driver tests against the scripted fake firmware.

Protocol parity target: umi/real_world/wsg_binary_driver.py:266-631 (CRC16
framing, pending-command handshake, cmd_measure.lua script payloads)."""

import struct
import time

import numpy as np
import pytest

from unified_video_action_tpu.real.wsg import (
    Cmd,
    FakeWsgServer,
    StatusCode,
    WsgClient,
    WsgError,
    WsgGripperBackend,
    crc16_ccitt,
    encode_frame,
)


def test_crc16_known_seed():
    # CRC of the 3-byte 0xAA preamble is the reference's hard-coded header
    # seed (wsg_binary_driver.py:385 header_checksum = 0x50F5)
    assert crc16_ccitt(b"\xaa\xaa\xaa") == 0x50F5
    # self-verification property: CRC over message + its LE CRC is 0
    msg = b"\xaa\xaa\xaa\x20\x01\x00\x01"
    full = msg + struct.pack("<H", crc16_ccitt(msg))
    assert crc16_ccitt(full) == 0


def test_crc16_matches_reference_table():
    from tests._reference import reference_available, import_reference_module

    if not reference_available():
        pytest.skip("reference unavailable")
    ref = import_reference_module("umi.real_world.wsg_binary_driver")
    rng = np.random.default_rng(0)
    for n in (1, 7, 64, 300):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert crc16_ccitt(data) == ref.checksum_update_crc16(data)


def test_frame_encode_structure():
    frame = encode_frame(Cmd.HOMING, b"\x01")
    assert frame[:3] == b"\xaa\xaa\xaa"
    assert frame[3] == 0x20
    assert struct.unpack("<H", frame[4:6])[0] == 1
    assert frame[6] == 0x01
    assert crc16_ccitt(frame) == 0


@pytest.fixture()
def server():
    with FakeWsgServer() as srv:
        yield srv


def test_homing_and_preposition_roundtrip(server):
    with WsgClient("127.0.0.1", server.port) as cli:
        msg = cli.homing()
        assert msg["status"] == StatusCode.E_SUCCESS
        assert server.homed
        # command travels through the pending handshake: PENDING then SUCCESS
        cli.pre_position(width_mm=40.0, speed_mm_s=1e6)
        time.sleep(0.02)
        info = cli.script_query()
        assert info["position"] == pytest.approx(40.0, abs=1.0)


def test_position_pd_converges(server):
    with WsgClient("127.0.0.1", server.port) as cli:
        cli.homing()
        deadline = time.monotonic() + 2.0
        info = None
        while time.monotonic() < deadline:
            info = cli.script_position_pd(position_mm=25.0,
                                          velocity_mm_s=400.0)
            if abs(info["position"] - 25.0) < 0.5 and not info["is_moving"]:
                break
            time.sleep(0.01)
        assert info is not None and info["position"] == pytest.approx(25.0, abs=0.5)


def test_out_of_range_width_rejected(server):
    with WsgClient("127.0.0.1", server.port) as cli:
        with pytest.raises(WsgError, match="RANGE_ERROR"):
            cli.pre_position(width_mm=500.0, speed_mm_s=50.0)


def test_corrupted_reply_detected():
    with FakeWsgServer(corrupt_every=1) as srv:
        with WsgClient("127.0.0.1", srv.port) as cli:
            with pytest.raises(WsgError, match="CRC"):
                cli.script_query()


def test_server_naks_corrupted_request(server):
    import socket as socket_mod

    sock = socket_mod.create_connection(("127.0.0.1", server.port), timeout=2.0)
    try:
        frame = bytearray(encode_frame(Cmd.SCRIPT_QUERY, b"\x00"))
        frame[-1] ^= 0xFF  # corrupt the CRC
        sock.sendall(bytes(frame))
        from unified_video_action_tpu.real.wsg import read_frame

        msg = read_frame(sock)
        assert msg["status"] == StatusCode.E_CHECKSUM_ERROR
    finally:
        sock.close()


def test_width_controller_rides_wsg_backend(server):
    """The full gripper stack — WidthController process loop over the C++
    shared-memory ring — driven by the WSG protocol against the fake
    firmware (reference wsg_controller.py:19-241 semantics)."""
    from unified_video_action_tpu.real.controller import WidthController

    backend = WsgGripperBackend("127.0.0.1", server.port,
                                move_max_speed_m_s=0.5)
    ctrl = WidthController(backend, frequency=30.0, max_speed=0.5)
    ctrl.start_wait()
    try:
        t0 = time.time()
        ctrl.schedule_waypoint(0.03, t0 + 0.4)
        time.sleep(0.8)
        state = ctrl.get_state()
        pos = float(np.ravel(state["gripper_position"])[0])
        assert pos == pytest.approx(0.03, abs=0.005)
        # position flowed through the real protocol, not the sim backend
        pd_cmds = [c for c, _ in server.received if c == Cmd.SCRIPT_POSITION_PD]
        assert len(pd_cmds) > 3
    finally:
        ctrl.stop_wait()
