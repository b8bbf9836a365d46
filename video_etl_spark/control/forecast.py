"""U15 — workload-mixture forecaster as a pure-numpy feed-forward net.

The reference's KnobPlanner loads a small Keras FFN (in -> 16 -> 8 ->
softmax; `/root/reference/code/src/online/knob_plan.py:3-4,67,313-317`,
paper §K.1) that maps a window of recent content-category histograms to the
forecast mixture for the next planning horizon.  Keras/TF are not in this
container, so the same architecture is implemented directly in numpy —
forward pass, softmax + cross-entropy backprop, and a plain-SGD training
loop (the reference trains with `fit(epochs=20, batch_size=128)`,
`knob_plan.py:307-309`).

The training table is engine-side: any Spark query producing an ordered
series of category histograms (e.g. the 2 s chunk histograms behind
`histogram_forecast_ma`) collects to a (T, C) array — bounded, one row per
planning interval — and feeds :meth:`FFNForecaster.fit`.

``FFNForecaster`` is directly pluggable as ``KnobPlanner.forecast_fn``: it
keeps a rolling window of the histograms it has been shown and predicts the
next mixture, falling back to persistence until the window fills.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Sequence

import numpy as np


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


def _normalize(h: np.ndarray) -> np.ndarray:
    s = h.sum(axis=-1, keepdims=True)
    return np.divide(h, s, out=np.full_like(h, 1.0 / h.shape[-1]), where=s > 0)


class FFNForecaster:
    """in -> 16 -> 8 -> softmax(C) mixture forecaster (reference U15).

    Input is the last ``window`` histograms (each L1-normalized), flattened
    to ``window * n_categories`` features; output is the predicted next
    mixture (sums to 1 by construction).
    """

    def __init__(
        self,
        n_categories: int,
        window: int = 8,
        hidden: tuple[int, int] = (16, 8),
        lr: float = 0.05,
        epochs: int = 200,
        batch_size: int = 128,
        seed: int = 42,
    ) -> None:
        self.n_categories = n_categories
        self.window = window
        self.lr = lr
        self.epochs = epochs
        self.batch_size = batch_size
        rng = np.random.default_rng(seed)
        d_in = window * n_categories
        h1, h2 = hidden
        # He init for the relu layers, Xavier-ish for the softmax head
        self.w1 = rng.normal(0, np.sqrt(2.0 / d_in), (d_in, h1))
        self.b1 = np.zeros(h1)
        self.w2 = rng.normal(0, np.sqrt(2.0 / h1), (h1, h2))
        self.b2 = np.zeros(h2)
        self.w3 = rng.normal(0, np.sqrt(1.0 / h2), (h2, n_categories))
        self.b3 = np.zeros(n_categories)
        self._rng = rng
        self._history: deque[np.ndarray] = deque(maxlen=window)
        self.trained = False

    # ---------------------------------------------------------------- forward
    def _forward(self, x: np.ndarray):
        a1 = np.maximum(x @ self.w1 + self.b1, 0.0)
        a2 = np.maximum(a1 @ self.w2 + self.b2, 0.0)
        p = _softmax(a2 @ self.w3 + self.b3)
        return a1, a2, p

    def predict_window(self, recent: np.ndarray) -> np.ndarray:
        """Forecast the next mixture from a (window, C) histogram block."""
        x = _normalize(np.asarray(recent, dtype=float)).reshape(1, -1)
        return self._forward(x)[2][0]

    # --------------------------------------------------------------- training
    def _examples(self, series: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        series = _normalize(np.asarray(series, dtype=float))
        xs, ys = [], []
        for t in range(self.window, len(series)):
            xs.append(series[t - self.window : t].reshape(-1))
            ys.append(series[t])
        return np.asarray(xs), np.asarray(ys)

    def fit(self, series: Sequence[Sequence[float]]) -> float:
        """Train on an ordered (T, C) histogram series; returns final
        training cross-entropy.  Targets are mixtures, so the loss is the
        soft-label cross-entropy H(y, p) and the softmax gradient is the
        usual (p - y)."""
        x_all, y_all = self._examples(np.asarray(series, dtype=float))
        if len(x_all) == 0:
            raise ValueError(
                f"need more than window={self.window} histograms to train"
            )
        n = len(x_all)
        loss = float("nan")
        for _ in range(self.epochs):
            order = self._rng.permutation(n)
            for start in range(0, n, self.batch_size):
                idx = order[start : start + self.batch_size]
                x, y = x_all[idx], y_all[idx]
                a1, a2, p = self._forward(x)
                dz3 = (p - y) / len(x)
                dw3 = a2.T @ dz3
                dz2 = (dz3 @ self.w3.T) * (a2 > 0)
                dw2 = a1.T @ dz2
                dz1 = (dz2 @ self.w2.T) * (a1 > 0)
                dw1 = x.T @ dz1
                self.w3 -= self.lr * dw3
                self.b3 -= self.lr * dz3.sum(axis=0)
                self.w2 -= self.lr * dw2
                self.b2 -= self.lr * dz2.sum(axis=0)
                self.w1 -= self.lr * dw1
                self.b1 -= self.lr * dz1.sum(axis=0)
            _, _, p = self._forward(x_all)
            loss = float(-(y_all * np.log(p + 1e-12)).sum(axis=1).mean())
        self.trained = True
        return loss

    # ------------------------------------------------- KnobPlanner plug-in API
    def __call__(self, histogram: Sequence[float]) -> list[float]:
        """``KnobPlanner.forecast_fn`` contract: observe the latest
        histogram, return the forecast mixture for the next interval.
        Persistence fallback until the rolling window fills (or before
        :meth:`fit`)."""
        h = _normalize(np.asarray(histogram, dtype=float))
        self._history.append(h)
        if not self.trained or len(self._history) < self.window:
            return [float(v) for v in h]
        return [
            float(v) for v in self.predict_window(np.stack(self._history))
        ]
