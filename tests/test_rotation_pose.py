"""Rotation/pose math vs scipy golden outputs + round-trips."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyR

from unified_video_action_tpu.utils import rotation as rot
from unified_video_action_tpu.utils import pose as pose_util


RNG = np.random.RandomState(0)
AA = RNG.randn(32, 3) * 1.5


def test_axis_angle_to_matrix_vs_scipy():
    want = ScipyR.from_rotvec(AA).as_matrix()
    got = rot.axis_angle_to_matrix(AA)
    np.testing.assert_allclose(want, got, atol=1e-10)


def test_quaternion_vs_scipy():
    want = ScipyR.from_rotvec(AA).as_quat()  # xyzw
    got = rot.axis_angle_to_quaternion(AA)  # wxyz
    got_xyzw = np.concatenate([got[:, 1:], got[:, :1]], axis=-1)
    # sign-invariant comparison
    dots = np.abs(np.sum(want * got_xyzw, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-10)


def test_matrix_quaternion_roundtrip():
    R = ScipyR.from_rotvec(AA).as_matrix()
    q = rot.matrix_to_quaternion(R)
    R2 = rot.quaternion_to_matrix(q)
    np.testing.assert_allclose(R, R2, atol=1e-9)


def test_rotation6d_roundtrip():
    R = ScipyR.from_rotvec(AA).as_matrix()
    d6 = rot.matrix_to_rotation_6d(R)
    R2 = rot.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(R, R2, atol=1e-9)


def test_axis_angle_roundtrip_through_everything():
    t = rot.RotationTransformer("axis_angle", "rotation_6d")
    d6 = t.forward(AA)
    back = t.inverse(d6)
    R1 = ScipyR.from_rotvec(AA).as_matrix()
    R2 = ScipyR.from_rotvec(back).as_matrix()
    np.testing.assert_allclose(R1, R2, atol=1e-5)


def test_euler_vs_scipy():
    angles = RNG.uniform(-np.pi, np.pi, (16, 3))
    want = ScipyR.from_euler("XYZ", angles).as_matrix()
    got = rot.euler_to_matrix(angles, "XYZ")
    np.testing.assert_allclose(want, got, atol=1e-10)


def test_pose_mat_roundtrip():
    poses = np.concatenate([RNG.randn(8, 3) * 0.5, AA[:8]], axis=-1)
    mats = pose_util.pose_to_mat(poses)
    back = pose_util.mat_to_pose(mats)
    R1 = ScipyR.from_rotvec(poses[:, 3:]).as_matrix()
    R2 = ScipyR.from_rotvec(back[:, 3:]).as_matrix()
    np.testing.assert_allclose(poses[:, :3], back[:, :3], atol=1e-9)
    np.testing.assert_allclose(R1, R2, atol=1e-8)


def test_pose10d_roundtrip():
    poses = np.concatenate([RNG.randn(8, 3), AA[:8]], axis=-1)
    mats = pose_util.pose_to_mat(poses)
    d10 = pose_util.mat_to_pose10d(mats)
    assert d10.shape == (8, 9)
    back = pose_util.pose10d_to_mat(d10)
    np.testing.assert_allclose(mats, back, atol=1e-5)


def test_relative_pose_representation():
    poses = np.concatenate([RNG.randn(8, 3), AA[:8]], axis=-1)
    mats = pose_util.pose_to_mat(poses)
    base = mats[0]
    rel = pose_util.convert_pose_mat_rep(mats, base, "relative")
    np.testing.assert_allclose(rel[0], np.eye(4), atol=1e-10)
    back = pose_util.convert_pose_mat_rep(rel, base, "relative", backward=True)
    np.testing.assert_allclose(mats, back, atol=1e-9)


def test_matrix_to_euler_roundtrip():
    from unified_video_action_tpu.utils.rotation import (
        euler_to_matrix,
        matrix_to_euler,
    )

    rng = np.random.RandomState(0)
    for conv in ("XYZ", "ZYX", "XZY"):
        ang = rng.uniform(-1.2, 1.2, (20, 3))  # away from gimbal lock
        R = euler_to_matrix(ang, conv)
        back = matrix_to_euler(R, conv)
        np.testing.assert_allclose(back, ang, atol=1e-9)


def test_rotation_transformer_to_euler():
    from unified_video_action_tpu.utils.rotation import RotationTransformer

    rt = RotationTransformer("euler_angles", "rotation_6d",
                             from_convention="XYZ")
    ang = np.random.RandomState(1).uniform(-1.0, 1.0, (8, 3)).astype(np.float32)
    six = rt.forward(ang)
    back = rt.inverse(six)  # exercises matrix->euler
    np.testing.assert_allclose(back, ang, atol=1e-5)


def test_pose_delta_roundtrip():
    from unified_video_action_tpu.utils.pose import convert_pose_mat_rep
    from unified_video_action_tpu.utils.rotation import euler_to_matrix

    rng = np.random.RandomState(2)

    def rand_pose(n):
        out = np.tile(np.eye(4), (n, 1, 1))
        out[:, :3, :3] = euler_to_matrix(rng.uniform(-1, 1, (n, 3)))
        out[:, :3, 3] = rng.randn(n, 3)
        return out

    base = rand_pose(1)[0]
    poses = rand_pose(6)
    delta = convert_pose_mat_rep(poses, base, pose_rep="delta")
    back = convert_pose_mat_rep(delta, base, pose_rep="delta", backward=True)
    np.testing.assert_allclose(back, poses, atol=1e-10)
    # Reference semantics (pose_repr_util.py:72-88): world-frame position
    # diff + left-multiplied rotation delta curr @ inv(prev).
    np.testing.assert_allclose(
        delta[0, :3, 3], poses[0, :3, 3] - base[:3, 3], atol=1e-10
    )
    np.testing.assert_allclose(
        delta[3, :3, :3],
        poses[3, :3, :3] @ np.linalg.inv(poses[2, :3, :3]),
        atol=1e-10,
    )


def test_pose_delta_matches_reference():
    """Pin 'delta' forward AND backward against the reference implementation
    (common/pose_repr_util.py:55-122) on random trajectories."""
    from tests._reference import reference_available, import_reference_module

    if not reference_available():
        import pytest

        pytest.skip("reference unavailable")
    ref = import_reference_module("unified_video_action.common.pose_repr_util")
    from unified_video_action_tpu.utils.pose import convert_pose_mat_rep
    from unified_video_action_tpu.utils.rotation import euler_to_matrix

    rng = np.random.RandomState(7)
    poses = np.tile(np.eye(4), (8, 1, 1))
    poses[:, :3, :3] = euler_to_matrix(rng.uniform(-1, 1, (8, 3)))
    poses[:, :3, 3] = rng.randn(8, 3)
    base = np.eye(4)
    base[:3, :3] = euler_to_matrix(rng.uniform(-1, 1, (3,)))
    base[:3, 3] = rng.randn(3)

    for rep in ("abs", "relative", "delta"):
        fwd_ref = ref.convert_pose_mat_rep(poses, base, rep, backward=False)
        fwd = convert_pose_mat_rep(poses, base, rep, backward=False)
        np.testing.assert_allclose(fwd, fwd_ref, atol=1e-10)
        bwd_ref = ref.convert_pose_mat_rep(fwd_ref, base, rep, backward=True)
        bwd = convert_pose_mat_rep(fwd, base, rep, backward=True)
        np.testing.assert_allclose(bwd, bwd_ref, atol=1e-10)
