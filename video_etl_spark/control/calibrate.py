"""DLT homography calibration (SURVEY.md U13; reference
`workloads/covid/calibrate_camera.py:49-142`).

Fits the 3×3 projective matrix H mapping image points to world-plane points
from ≥4 correspondences via the standard Direct Linear Transform: stack the
2N×9 constraint matrix, take the right singular vector of the smallest
singular value, reshape to 3×3.  Runs driver-side (it's a one-time, tiny
least-squares problem — the reference computes it once per camera); the
*application* of H to millions of detections is the engine-side
`homography_project` query (P12).
"""

from __future__ import annotations

import numpy as np


def fit_homography(
    image_pts: np.ndarray, world_pts: np.ndarray
) -> np.ndarray:
    """DLT fit: image (N,2) → world (N,2); returns H (3,3), H[2,2] == 1."""
    image_pts = np.asarray(image_pts, dtype=float)
    world_pts = np.asarray(world_pts, dtype=float)
    n = image_pts.shape[0]
    if n < 4:
        raise ValueError("need >= 4 correspondences for a homography")

    rows = []
    for (x, y), (u, v) in zip(image_pts, world_pts):
        rows.append([-x, -y, -1, 0, 0, 0, u * x, u * y, u])
        rows.append([0, 0, 0, -x, -y, -1, v * x, v * y, v])
    a = np.array(rows)
    _, _, vt = np.linalg.svd(a)
    h = vt[-1].reshape(3, 3)
    if abs(h[2, 2]) < 1e-12:
        raise ValueError("degenerate correspondences")
    return h / h[2, 2]


def project(h: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply H to (N,2) points (the reference's per-detection projection,
    `covid_measures.py:239-244`)."""
    pts = np.asarray(pts, dtype=float)
    homog = np.hstack([pts, np.ones((pts.shape[0], 1))])
    mapped = homog @ h.T
    return mapped[:, :2] / mapped[:, 2:3]


def reprojection_error(
    h: np.ndarray, image_pts: np.ndarray, world_pts: np.ndarray
) -> float:
    """Mean L2 reprojection error (`calibrate_camera.py:117-122`)."""
    pred = project(h, image_pts)
    return float(np.mean(np.linalg.norm(pred - np.asarray(world_pts), axis=1)))
