"""Fisheye rectification (real/fisheye.py).

Capability pinned against the properties the UMI pipeline depends on
(umi/common/cv_util.py): calibration parsing, center-preserving rectification,
and straightening of radially-distorted straight lines.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unified_video_action_tpu.real.fisheye import (
    FisheyeRectConverter,
    parse_fisheye_intrinsics,
)

CAL = {
    "intrinsic_type": "FISHEYE_KANNALA_BRANDT",
    "intrinsics": {
        "fx": 180.0, "fy": 180.0, "cx": 160.0, "cy": 120.0,
        "k1": 0.05, "k2": 0.01, "k3": 0.0, "k4": 0.0,
    },
    "image_width": 320,
    "image_height": 240,
}


def test_parse_intrinsics():
    out = parse_fisheye_intrinsics(CAL)
    assert out["K"].shape == (3, 3) and out["K"][0, 0] == 180.0
    assert out["D"].shape == (4,) and out["D"][0] == 0.05
    assert tuple(out["resolution"]) == (320, 240)


def test_parse_rejects_pinhole():
    with pytest.raises(ValueError):
        parse_fisheye_intrinsics({"intrinsic_type": "PINHOLE", "intrinsics": {}})


def _project_fisheye(pts3d, K, D):
    rvec = np.zeros(3)
    tvec = np.zeros(3)
    img_pts, _ = cv2.fisheye.projectPoints(
        pts3d.reshape(-1, 1, 3), rvec, tvec, K, D.reshape(4, 1)
    )
    return img_pts.reshape(-1, 2)


def test_rectified_lines_are_straight():
    """Points on a 3-D line project curved through the fisheye model but
    must be collinear after rectification (the pinhole property)."""
    cal = parse_fisheye_intrinsics(CAL)
    K, D = cal["K"], cal["D"]
    conv = FisheyeRectConverter(
        K, D, in_size=(320, 240), out_size=(224, 224), out_fov=90.0
    )

    # a world-space straight line in front of the camera
    zs = np.full(9, 2.0)
    xs = np.linspace(-1.2, 1.2, 9)
    ys = 0.4 * xs + 0.3
    pts3d = np.stack([xs, ys, zs], axis=1)
    fish_px = _project_fisheye(pts3d, K, D)

    # mark the projected points in a source image, rectify, find them back
    src = np.zeros((240, 320, 3), np.uint8)
    for u, v in fish_px:
        if 2 <= u < 318 and 2 <= v < 238:
            cv2.circle(src, (int(round(u)), int(round(v))), 2, (255, 255, 255), -1)
    out = conv(src)

    ys_, xs_ = np.nonzero(out[..., 0] > 64)
    assert len(xs_) > 20  # most markers landed inside the output
    # fit a line; residual must be tiny (collinearity)
    A = np.stack([xs_, np.ones_like(xs_)], axis=1).astype(np.float64)
    coef, res, *_ = np.linalg.lstsq(A, ys_.astype(np.float64), rcond=None)
    rmse = float(np.sqrt(res[0] / len(xs_))) if len(res) else 0.0
    assert rmse < 2.0, rmse


def test_output_shape_and_center():
    cal = parse_fisheye_intrinsics(CAL)
    conv = FisheyeRectConverter(
        cal["K"], cal["D"], (320, 240), out_size=(128, 96), out_fov=80.0
    )
    src = np.zeros((240, 320, 3), np.uint8)
    src[118:122, 158:162] = 255  # blob at the distortion center
    out = conv(src)
    assert out.shape == (96, 128, 3)
    ys, xs = np.nonzero(out[..., 0] > 0)
    assert len(xs) > 0
    # distortion center maps to the output principal point (image center)
    assert abs(xs.mean() - 63.5) < 3 and abs(ys.mean() - 47.5) < 3


def test_cal_size_rescaling():
    """K calibrated at one resolution must be rescaled to the capture stream's
    resolution (regression: in_size was ignored)."""
    cal = parse_fisheye_intrinsics(CAL)
    # stream at half resolution: the distortion-center blob must STILL land
    # at the output principal point
    conv = FisheyeRectConverter(
        cal["K"], cal["D"], in_size=(160, 120), out_size=(128, 96),
        out_fov=80.0, cal_size=(320, 240),
    )
    src = np.zeros((120, 160, 3), np.uint8)
    src[58:62, 78:82] = 255  # center blob at the scaled principal point
    out = conv(src)
    ys, xs = np.nonzero(out[..., 0] > 0)
    assert len(xs) > 0
    assert abs(xs.mean() - 63.5) < 3 and abs(ys.mean() - 47.5) < 3
