"""Constant-velocity Kalman filter over bounding boxes (SURVEY.md D14/W2).

Re-derives the reference's per-track Kalman state (`sort.py:94-151`, which
follows the public SORT formulation, Bewley et al. 2016): state
x = [cx, cy, s, r, vcx, vcy, vs] — box center, scale (area), aspect ratio,
and their velocities (r assumed constant) — with a linear constant-velocity
transition and direct observation of [cx, cy, s, r].

Pure numpy (no scipy/filterpy); the standard predict/update equations:

    predict:  x ← F x;        P ← F P Fᵀ + Q
    update:   y = z − H x;    S = H P Hᵀ + R
              K = P Hᵀ S⁻¹;   x ← x + K y;   P ← (I − K H) P

Covariance constants follow the SORT convention (`sort.py:104-112`): high
uncertainty on unobservable initial velocities, larger measurement noise on
scale/ratio.
"""

from __future__ import annotations

import numpy as np

_DIM_X, _DIM_Z = 7, 4

_F = np.eye(_DIM_X)
_F[0, 4] = _F[1, 5] = _F[2, 6] = 1.0  # cx+=vcx, cy+=vcy, s+=vs

_H = np.zeros((_DIM_Z, _DIM_X))
_H[0, 0] = _H[1, 1] = _H[2, 2] = _H[3, 3] = 1.0

_R = np.diag([1.0, 1.0, 10.0, 10.0])
_Q = np.diag([1.0, 1.0, 1.0, 1.0, 0.01, 0.01, 0.0001])
_P0 = np.diag([10.0, 10.0, 10.0, 10.0, 1e4, 1e4, 1e4])


def box_to_z(box: tuple) -> np.ndarray:
    """[x0,y0,x1,y1] → measurement [cx,cy,s,r] (`sort.py:66-77`)."""
    x0, y0, x1, y1 = box
    w, h = x1 - x0, y1 - y0
    return np.array([x0 + w / 2.0, y0 + h / 2.0, w * h, w / h])


def z_to_box(z: np.ndarray) -> tuple:
    """[cx,cy,s,r] → [x0,y0,x1,y1] (`sort.py:80-91`)."""
    cx, cy, s, r = float(z[0]), float(z[1]), float(z[2]), float(z[3])
    s = max(s, 1e-6)
    r = max(r, 1e-6)
    w = (s * r) ** 0.5
    h = s / w
    return (cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0)


class KalmanBoxFilter:
    """One track's motion state (the reference's KalmanBoxTracker core)."""

    def __init__(self, box: tuple) -> None:
        self.x = np.zeros(_DIM_X)
        self.x[:_DIM_Z] = box_to_z(box)
        self.P = _P0.copy()

    def predict(self) -> tuple:
        # keep scale non-negative after velocity step (`sort.py:122-124`)
        if self.x[2] + self.x[6] <= 0:
            self.x[6] = 0.0
        self.x = _F @ self.x
        self.P = _F @ self.P @ _F.T + _Q
        return z_to_box(self.x[:_DIM_Z])

    def update(self, box: tuple) -> None:
        z = box_to_z(box)
        y = z - _H @ self.x
        S = _H @ self.P @ _H.T + _R
        K = self.P @ _H.T @ np.linalg.inv(S)
        self.x = self.x + K @ y
        self.P = (np.eye(_DIM_X) - K @ _H) @ self.P

    def box(self) -> tuple:
        return z_to_box(self.x[:_DIM_Z])
