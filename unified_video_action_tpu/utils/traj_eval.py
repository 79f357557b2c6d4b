"""SLAM trajectory evaluation: alignment + ATE/RPE metrics.

Capability parity with the reference's ``umi/traj_eval`` toolkit (Umeyama
similarity alignment and absolute/relative trajectory error, used as
data-pipeline QA on SLAM tracks before training). Rebuilt directly from the
published algorithms on numpy/scipy — the reference vendors a 2.5k-LoC
transformations library; the live surface is these three functions.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def umeyama_alignment(
    x: np.ndarray, y: np.ndarray, with_scale: bool = True
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Least-squares similarity transform aligning ``x`` onto ``y``.

    x, y: (N, 3) point sets (estimated and ground-truth positions).
    Returns (R (3,3), t (3,), s) minimizing ||y - (s R x + t)||².
    (Umeyama 1991 — the standard ATE pre-alignment.)
    """
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    assert x.shape == y.shape and x.shape[1] == 3
    n = x.shape[0]
    mx, my = x.mean(0), y.mean(0)
    xc, yc = x - mx, y - my
    cov = yc.T @ xc / n
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    var_x = (xc ** 2).sum() / n
    s = float(np.trace(np.diag(d) @ S) / var_x) if with_scale else 1.0
    t = my - s * R @ mx
    return R, t, s


def ate(
    est: np.ndarray,
    gt: np.ndarray,
    align: bool = True,
    with_scale: bool = True,
) -> Dict[str, float]:
    """Absolute trajectory error of (N, 3) position tracks.

    Optionally Umeyama-aligns est onto gt first (the monocular-SLAM
    convention: scale is unobservable). Returns rmse/mean/median/max [m].
    """
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    if align:
        R, t, s = umeyama_alignment(est, gt, with_scale=with_scale)
        est = (s * (R @ est.T)).T + t
    err = np.linalg.norm(est - gt, axis=1)
    return {
        "rmse": float(np.sqrt((err ** 2).mean())),
        "mean": float(err.mean()),
        "median": float(np.median(err)),
        "max": float(err.max()),
    }


def rpe(
    est: np.ndarray,
    gt: np.ndarray,
    delta: int = 1,
) -> Dict[str, float]:
    """Relative pose error over position tracks: drift per ``delta`` frames.

    Compares the relative displacement vectors est[i+d]-est[i] vs
    gt[i+d]-gt[i] (translation part of the classical RPE; rotation tracks are
    not produced by the UMI pipeline's QA step). Returns rmse/mean/max [m].
    """
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    d_est = est[delta:] - est[:-delta]
    d_gt = gt[delta:] - gt[:-delta]
    err = np.linalg.norm(d_est - d_gt, axis=1)
    return {
        "rmse": float(np.sqrt((err ** 2).mean())),
        "mean": float(err.mean()),
        "max": float(err.max()),
    }
