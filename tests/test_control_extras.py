"""Tests for DLT calibration (U13), KMeans categories (U14), and the static
baseline runner (C6)."""

import numpy as np
import pytest

from video_etl_spark.control.baseline import run_static_baseline
from video_etl_spark.control.calibrate import (
    fit_homography,
    project,
    reprojection_error,
)
from video_etl_spark.control.switcher import Profile


# ------------------------------------------------------------------ U13 DLT
def _true_h():
    return np.array([[0.8, 0.05, 12.0], [-0.02, 1.1, 3.0], [0.0005, 0.0002, 1.0]])


def test_dlt_recovers_exact_homography():
    rng = np.random.default_rng(42)
    img = rng.uniform(0, 1000, size=(12, 2))
    world = project(_true_h(), img)
    h = fit_homography(img, world)
    assert np.allclose(h, _true_h(), atol=1e-8)
    assert reprojection_error(h, img, world) < 1e-9


def test_dlt_requires_four_points():
    with pytest.raises(ValueError):
        fit_homography(np.zeros((3, 2)), np.zeros((3, 2)))


def test_dlt_noisy_fit_small_error():
    rng = np.random.default_rng(7)
    img = rng.uniform(0, 1000, size=(30, 2))
    world = project(_true_h(), img) + rng.normal(0, 0.01, size=(30, 2))
    h = fit_homography(img, world)
    assert reprojection_error(h, img, world) < 0.1


# --------------------------------------------------------------- U14 KMeans
def test_kmeans_recovers_separated_clusters(spark):
    from video_etl_spark.control.categories import assign_categories, fit_categories

    rng = np.random.default_rng(42)
    true_centers = [[0.1, 0.1, 0.1], [0.5, 0.5, 0.5], [0.9, 0.9, 0.9]]
    rows = []
    for c in true_centers:
        for _ in range(50):
            rows.append((([float(x + rng.normal(0, 0.02)) for x in c]),))
    df = spark.createDataFrame(rows, "scores array<double>")
    centers = fit_categories(df, k=3)
    assert len(centers) == 3
    for found, true in zip(centers, true_centers):
        assert np.allclose(found, true, atol=0.05)
    # Eq. 5 assignment: every point lands in its generating cluster
    assigned = assign_categories(df, centers)
    counts = {r["category"]: 1 for r in assigned.select("category").distinct().collect()}
    assert set(counts) == {0, 1, 2}
    first_vals = [
        r["category"]
        for r in assigned.select("scores", "category").collect()
    ]
    assert len(first_vals) == 150


# ------------------------------------------------------------- C6 baseline
def _profile():
    return Profile(
        runtime=(1.9, 1.0, 0.4),
        cloud_cost=(0.0, 0.0, 0.0),
        knob_config=(0, 1, 2),
        size_bytes=(1e8, 1e8, 1e8),
    )


def test_static_baseline_bookkeeping():
    scores = [[0.9, 0.6, 0.2]] * 10
    res = run_static_baseline(_profile(), scores, config=0, buffer_space=1e12)
    assert res.n_chunks == 10
    assert res.score_sum == pytest.approx(9.0)
    assert res.cloud_cost_sum == 0.0
    assert not res.overflowed


def test_static_baseline_cheap_config_lower_quality():
    scores = [[0.9, 0.6, 0.2]] * 20
    rich = run_static_baseline(_profile(), scores, config=0, buffer_space=1e12)
    cheap = run_static_baseline(_profile(), scores, config=2, buffer_space=1e12)
    assert cheap.score_sum < rich.score_sum
    # cheap config runs under realtime (0.4 < 2s) -> no lag accumulates
    assert cheap.max_lag_seconds <= 2.0


def test_static_baseline_unknown_config_raises():
    with pytest.raises(ValueError):
        run_static_baseline(_profile(), [[0.5, 0.5, 0.5]], config=9, buffer_space=1e9)
