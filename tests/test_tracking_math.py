"""Hungarian assignment + Kalman filter unit/property tests (J2/D14).

Hypothesis property tests verify Hungarian optimality against brute-force
permutation search, and Kalman convergence on linear motion."""

import itertools
import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from video_etl_spark.operators.assignment import assignment_cost, hungarian
from video_etl_spark.operators.kalman import KalmanBoxFilter, box_to_z, z_to_box


def _brute_force_min(cost):
    n, m = len(cost), len(cost[0])
    k = min(n, m)
    best = None
    rows = range(n)
    cols = range(m)
    for rsel in itertools.combinations(rows, k):
        for csel in itertools.permutations(cols, k):
            total = sum(cost[r][c] for r, c in zip(rsel, csel))
            if best is None or total < best:
                best = total
    return best


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 5),
    st.integers(1, 5),
    st.integers(0, 10_000),
)
def test_hungarian_is_optimal(n, m, seed):
    rng = random.Random(seed)
    cost = [[rng.uniform(-10, 10) for _ in range(m)] for _ in range(n)]
    pairs = hungarian(cost)
    assert len(pairs) == min(n, m)
    assert len({r for r, _ in pairs}) == len(pairs)
    assert len({c for _, c in pairs}) == len(pairs)
    assert assignment_cost(cost, pairs) == pytest.approx(
        _brute_force_min(cost), abs=1e-9
    )


def test_hungarian_identity_case():
    cost = [[0.0, 1.0, 1.0], [1.0, 0.0, 1.0], [1.0, 1.0, 0.0]]
    assert hungarian(cost) == [(0, 0), (1, 1), (2, 2)]


def test_hungarian_rectangular():
    # 2 rows, 3 cols: best picks col 2 for row 0 (-5) and col 0 for row 1 (-4)
    cost = [[0.0, 0.0, -5.0], [-4.0, 0.0, -3.0]]
    assert hungarian(cost) == [(0, 2), (1, 0)]


def test_box_z_roundtrip():
    box = (10.0, 20.0, 50.0, 60.0)
    out = z_to_box(box_to_z(box))
    assert out == pytest.approx(box, abs=1e-9)


def test_kalman_converges_on_linear_motion():
    # object moving +2px/frame in x; filter should learn the velocity
    kf = KalmanBoxFilter((0.0, 0.0, 10.0, 10.0))
    for f in range(1, 20):
        kf.predict()
        kf.update((2.0 * f, 0.0, 10.0 + 2.0 * f, 10.0))
    pred = kf.predict()
    # next prediction should be close to the next true position (x0=40)
    assert pred[0] == pytest.approx(40.0, abs=1.0)
    assert pred[1] == pytest.approx(0.0, abs=0.5)


def test_kalman_covariance_shrinks_with_updates():
    kf = KalmanBoxFilter((0.0, 0.0, 10.0, 10.0))
    p_before = float(np.trace(kf.P))
    for f in range(1, 10):
        kf.predict()
        kf.update((2.0 * f, 0.0, 10.0 + 2.0 * f, 10.0))
    assert float(np.trace(kf.P)) < p_before


def test_tracker_kalman_hungarian_crossing_objects(spark):
    """Two objects crossing paths: Kalman+Hungarian must keep identities
    (constant-velocity prediction carries each track through the crossing)."""
    from video_etl_spark.operators.tracking import sort_tracker

    rows = []
    for f in range(12):
        # A moves right, B moves left; they pass near frame 6
        rows.append(("s0", f, 10.0 + 4 * f, 10.0, 22.0 + 4 * f, 22.0))
        rows.append(("s0", f, 58.0 - 4 * f, 12.0, 70.0 - 4 * f, 24.0))
    df = spark.createDataFrame(
        rows, "stream string, frame_no long, x0 double, y0 double, x1 double, y1 double"
    )
    out = sort_tracker(df).collect()
    by_track = {}
    for r in out:
        by_track.setdefault(r["track_id"], []).append(r)
    assert len(by_track) == 2
    # each track's x-motion must be monotone (identities not swapped)
    for frames in by_track.values():
        xs = [r["x0"] for r in sorted(frames, key=lambda r: r["frame_no"])]
        diffs = [b - a for a, b in zip(xs, xs[1:])]
        assert all(d > 0 for d in diffs) or all(d < 0 for d in diffs)
