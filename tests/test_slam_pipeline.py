"""SLAM-pipeline QA utilities (real/slam_pipeline.py): ArUco localization on
a synthetic pinhole scene, gripper-width recovery, masks, loaders, timecode
math, latency cross-correlation."""

import datetime

import numpy as np
import pytest

from unified_video_action_tpu.real import slam_pipeline as sp

cv2 = pytest.importorskip("cv2")


def _intr(f=600.0, cx=320.0, cy=240.0):
    K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float64)
    return {"K": K, "D": np.zeros((4, 1))}


def test_aruco_detect_and_localize():
    cfg = sp.parse_aruco_config({
        "aruco_dict": {"predefined": "DICT_4X4_50"},
        "marker_size_map": {"default": 0.1},
    })
    assert cfg["marker_size_map"][7] == 0.1
    # marker of size 0.1 m at z=0.5 in front of a 600 px pinhole camera:
    # projects to a 120 px square centered on the principal point
    marker = cv2.aruco.generateImageMarker(cfg["aruco_dict"], 7, 120)
    img = np.full((480, 640), 255, np.uint8)
    img[240 - 60 : 240 + 60, 320 - 60 : 320 + 60] = marker
    tags = sp.detect_aruco_tags(
        img, cfg["aruco_dict"], cfg["marker_size_map"], fisheye_intr=_intr()
    )
    assert 7 in tags
    np.testing.assert_allclose(tags[7]["tvec"], [0, 0, 0.5], atol=0.01)
    # plain pinhole model path
    tags_p = sp.detect_aruco_tags(
        img, cfg["aruco_dict"], cfg["marker_size_map"],
        pinhole_intr={"K": _intr()["K"]},
    )
    np.testing.assert_allclose(tags_p[7]["tvec"], [0, 0, 0.5], atol=0.01)
    # missing intrinsics is an error, not a silent identity-K localization
    with pytest.raises(ValueError):
        sp.detect_aruco_tags(img, cfg["aruco_dict"], cfg["marker_size_map"])


def test_gripper_width():
    mk = lambda x, z: {"tvec": np.array([x, 0.0, z])}
    tags = {0: mk(-0.04, 0.072), 1: mk(0.04, 0.072)}
    assert sp.gripper_width_from_tags(tags, 0, 1) == pytest.approx(0.08)
    # one finger occluded -> symmetric assumption
    assert sp.gripper_width_from_tags({0: mk(-0.04, 0.072)}, 0, 1) == pytest.approx(0.08)
    # outlier depth rejected
    assert sp.gripper_width_from_tags({0: mk(-0.04, 0.3)}, 0, 1) is None


def test_inpaint_tag():
    img = np.zeros((64, 64, 3), np.uint8)
    img[:, :] = (100, 150, 200)
    img[20:40, 20:40] = (255, 255, 255)  # the "tag"
    corners = np.array([[20, 20], [40, 20], [40, 40], [20, 40]], np.float64)
    out = sp.inpaint_tag(img.copy(), corners)
    assert (out[25:35, 25:35] == (100, 150, 200)).all()


def test_masks_and_crops():
    img = np.full((507, 676, 3), 255, np.uint8)  # 1/4 rig resolution
    out = sp.draw_predefined_mask(img.copy())
    frac = (out == 0).all(axis=-1).mean()
    assert 0.1 < frac < 0.6  # mirror+gripper+finger cover a large lower band
    sl = sp.mirror_crop_slices((1080, 1920), left=True)
    assert sl[0].stop > sl[0].start and sl[1].stop > sl[1].start
    # right mirror is the left one reflected about the vertical center line
    sr = sp.mirror_crop_slices((1080, 1920), left=False)
    assert sr[0] == sl[0]
    assert abs((1920 - sr[1].stop) - sl[1].start) <= 1


def test_image_transform():
    tf = sp.image_transform((1920, 1080), (640, 480), crop_ratio=0.9,
                            bgr_to_rgb=True)
    img = np.zeros((1080, 1920, 3), np.uint8)
    img[..., 0] = 255  # blue in BGR
    out = tf(img)
    assert out.shape == (480, 640, 3)
    assert out[0, 0, 2] == 255 and out[0, 0, 0] == 0  # now red channel


def test_tum_and_slam_csv_loaders(tmp_path):
    t = np.arange(3, dtype=np.float64)
    rows = np.column_stack([
        t, np.arange(3), np.zeros(3), np.zeros(3),
        np.zeros(3), np.zeros(3), np.zeros(3), np.ones(3),  # identity quat
    ])
    p = tmp_path / "traj.txt"
    np.savetxt(p, rows, delimiter=" ")
    out = sp.load_tum_trajectory(str(p))
    assert out["pose"].shape == (3, 4, 4)
    np.testing.assert_allclose(out["pose"][1, :3, 3], [1, 0, 0])
    np.testing.assert_allclose(out["pose"][0, :3, :3], np.eye(3), atol=1e-6)

    csv = tmp_path / "camera_trajectory.csv"
    csv.write_text(
        "timestamp,x,y,z,q_x,q_y,q_z,q_w,is_lost\n"
        "0.0,0,0,0,0,0,0,1,False\n"
        "0.1,1,2,3,0,0,0,1,True\n"
        "0.2,4,5,6,0,0,0,1,False\n"
    )
    out = sp.load_slam_csv_trajectory(str(csv))
    assert out["pose"].shape == (2, 4, 4)  # lost row dropped
    np.testing.assert_allclose(out["pose"][1, :3, 3], [4, 5, 6])


def test_mocap_loader(tmp_path):
    csv = tmp_path / "take.csv"
    csv.write_text(
        "Format Version,1.23,Capture Start Time,2024-03-01 02.30.15.123 PM\n"
        "junk\n"
        ",gripper,gripper,gripper,gripper,gripper,gripper,gripper\n"
        "junk2\n"
        ",Rotation,Rotation,Rotation,Rotation,Position,Position,Position\n"
        "Frame,Time (Seconds),X,Y,Z,W,X,Y,Z\n"
    )
    # pandas multi-header parsing is exercised with a real OptiTrack layout;
    # here we only pin the metadata path (layout fixtures are large)
    start = sp.mocap_start_datetime(str(csv))
    assert start == datetime.datetime(2024, 3, 1, 14, 30, 15, 123000)


def test_timecode():
    assert sp.timecode_to_seconds("00:00:01:00", 30) == pytest.approx(1.0)
    # 29.97 NDF: frame count at 30, stretched by the true rate
    assert sp.timecode_to_seconds("01:00:00:00", 29.97) == pytest.approx(
        3600 * 30 / 29.97
    )


def test_measure_latency():
    t = np.arange(0, 2, 0.005)
    lag = 0.037
    x_cmd = np.sin(2 * np.pi * 3 * t)
    x_act = np.sin(2 * np.pi * 3 * (t - lag))
    latency, info = sp.measure_latency(x_cmd, t, x_act, t, force_positive=True)
    assert latency == pytest.approx(lag, abs=0.002)
    assert len(info["correlation"]) == len(info["lags"])
