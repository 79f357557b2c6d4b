"""Trajectory evaluation metrics (utils/traj_eval.py) — analytic properties."""

import numpy as np

from unified_video_action_tpu.utils.traj_eval import ate, rpe, umeyama_alignment


def _random_traj(n=200, seed=0):
    rng = np.random.RandomState(seed)
    return np.cumsum(rng.randn(n, 3) * 0.05, axis=0)


def test_umeyama_recovers_similarity():
    gt = _random_traj()
    rng = np.random.RandomState(1)
    # random rotation via QR
    Q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    est = ((gt - t_true[None]) / s_true) @ Q  # inverse transform of gt
    R, t, s = umeyama_alignment(est, gt)
    back = (s * (R @ est.T)).T + t
    assert np.abs(back - gt).max() < 1e-9
    assert abs(s - s_true) < 1e-9


def test_umeyama_handles_reflection():
    gt = _random_traj(seed=2)
    est = gt * np.array([1.0, 1.0, -1.0])  # mirrored
    R, t, s = umeyama_alignment(est, gt)
    assert np.linalg.det(R) > 0  # proper rotation, never a reflection


def test_ate_zero_for_similarity_transformed():
    gt = _random_traj(seed=3)
    est = gt * 0.3 + np.array([5.0, 5.0, 5.0])
    m = ate(est, gt, align=True)
    assert m["rmse"] < 1e-9
    m_noalign = ate(est, gt, align=False)
    assert m_noalign["rmse"] > 1.0


def test_ate_without_scale():
    gt = _random_traj(seed=4)
    est = gt * 2.0
    assert ate(est, gt, with_scale=True)["rmse"] < 1e-9
    assert ate(est, gt, with_scale=False)["rmse"] > 0.01


def test_rpe_detects_drift():
    gt = _random_traj(seed=5)
    drift = np.linspace(0, 1, len(gt))[:, None] * np.array([0.01, 0, 0])
    est = gt + drift
    clean = rpe(gt, gt, delta=10)
    drifty = rpe(est, gt, delta=10)
    assert clean["rmse"] < 1e-12
    assert drifty["rmse"] > 1e-5
    # per-step drift of 0.01/199 in x over delta=10 frames
    expected = 0.01 / 199 * 10
    assert abs(drifty["mean"] - expected) < 1e-6
