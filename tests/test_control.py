"""Control-plane tests: simulator golden + properties, LP optimality,
switcher/buffer behavior, knob hashing round-trips (SURVEY.md §5 pyramid
layer 3)."""

import itertools

import pytest

from video_etl_spark.control.buffer import ProcessingBuffer
from video_etl_spark.control.planner import (
    InfeasibleBudgetError,
    KnobPlanner,
    assign_knobs_linear,
)
from video_etl_spark.control.simulator import (
    CLOUD,
    Task,
    covid_pipeline,
    detect_to_track,
    simulate,
    simulate_cost,
    simulate_runtime,
)
from video_etl_spark.control.switcher import KnobSwitcher, Profile
from video_etl_spark.control.tuner import Knob, MultiKnob, hill_climb


# ---------------------------------------------------------------- simulator
def test_simulator_golden_detect_to_track():
    # Reference __main__ (`execution_utils.py:293-296`) prints (32110.5, 0).
    assert simulate(detect_to_track(60, 120), cores=4) == (32110.5, 0)


def test_simulator_single_task():
    assert simulate_runtime([Task(0, 100.0, 100.0, 100.0)], cores=4) == 100.0


def test_simulator_all_on_prem_cost_zero():
    # `execution_utils.py:236-242`: cost counts only cloud tasks.
    assert simulate_cost(detect_to_track(30, 120)) == 0.0


def test_simulator_cloud_cost():
    tasks = [Task(0, 100.0, 100.0, 100.0, placement=CLOUD)]
    assert simulate_cost(tasks) == 100.0


def test_simulator_runtime_monotone_in_tasks():
    small = detect_to_track(60, 60)
    large = detect_to_track(60, 120)
    assert simulate_runtime(large, 4) >= simulate_runtime(small, 4)


def test_simulator_chain_serializes():
    chain = [
        Task(0, 10.0, 10.0, 10.0),
        Task(1, 10.0, 10.0, 10.0, deps=(0,)),
        Task(2, 10.0, 10.0, 10.0, deps=(1,)),
    ]
    assert simulate_runtime(chain, cores=8) == 30.0


def test_simulator_cloud_roundtrip_added_for_sources():
    t = [Task(0, 100.0, 100.0, 100.0, placement=CLOUD)]
    assert simulate_runtime(t, 4, cloud_roundtrip=160.0) == 260.0


def test_simulator_covid_pipeline_runs():
    rt, cost = simulate(covid_pipeline(4), cores=4)
    assert rt > 0 and cost == 0


# ------------------------------------------------------------------ planner
def _brute_force_lp(quality, knob_cost, mixture, budget, h, ti, grid=200):
    """Brute-force the 2-category LP on a fine grid for optimality checks."""
    h_scale, s_scale = h * 3600.0, h * 3600.0 / ti
    best = None
    n_cfg = len(knob_cost)
    # enumerate per-category vertex pairs + fractional mixes over the grid
    options = []
    for c in range(len(quality)):
        opts = []
        for a, b in itertools.product(range(n_cfg), repeat=2):
            for g in range(grid + 1):
                f = g / grid
                cost = (
                    mixture[c] * (f * knob_cost[a] + (1 - f) * knob_cost[b]) * h_scale
                )
                val = (
                    mixture[c]
                    * (f * quality[c][a] + (1 - f) * quality[c][b])
                    * s_scale
                )
                opts.append((cost, val))
        options.append(opts)
    for combo in itertools.product(*options):
        cost = sum(c for c, _ in combo)
        val = sum(v for _, v in combo)
        if cost <= budget + 1e-6 and (best is None or val > best):
            best = val
    return best


def test_lp_matches_brute_force():
    quality = [[0.9, 0.5, 0.2], [0.4, 0.35, 0.1]]
    knob_cost = [1.9, 1.0, 0.3]
    mixture = [0.6, 0.4]
    h, ti = 1.0, 2.0
    budget = 0.8 * 3600.0 * (0.6 * 1.9 + 0.4 * 1.9)  # between min and max
    plan, score = assign_knobs_linear(quality, knob_cost, mixture, budget, h, ti)
    for row in plan:
        assert abs(sum(row) - 1.0) < 1e-9
        assert all(-1e-12 <= x <= 1 + 1e-12 for x in row)
    bf = _brute_force_lp(quality, knob_cost, mixture, budget, h, ti)
    assert score >= bf - 1e-6  # greedy LP must not be beaten by grid search
    # and must respect the budget
    h_scale = h * 3600.0
    spent = sum(
        mixture[c] * knob_cost[k] * h_scale * plan[c][k]
        for c in range(2)
        for k in range(3)
    )
    assert spent <= budget + 1e-6


def test_lp_unlimited_budget_picks_best_quality():
    quality = [[0.9, 0.5], [0.2, 0.8]]
    plan, _ = assign_knobs_linear(quality, [1.0, 1.0], [0.5, 0.5], 1e12, 24, 2)
    assert plan[0][0] == pytest.approx(1.0)
    assert plan[1][1] == pytest.approx(1.0)


def test_lp_infeasible_raises():
    # Mirrors `knob_plan.py:116-118`.
    with pytest.raises(InfeasibleBudgetError):
        assign_knobs_linear([[0.9]], [10.0], [1.0], budget=1.0,
                            hours_plan_ahead=24, time_interval=2)


def test_planner_normalizes_histogram():
    p = KnobPlanner([[0.9, 0.1]], [1.0, 0.5], 1.0, 2.0)
    plan, score = p.plan([10.0, 0.0] if False else [10.0], budget=1e9)
    assert abs(sum(plan[0]) - 1.0) < 1e-9


# ------------------------------------------------------------------- buffer
def _buffer(space=100.0, sizes=None, interval=2.0):
    return ProcessingBuffer(space, sizes or {0: 10.0, 1: 5.0}, interval)


def test_buffer_time_cap():
    b = _buffer(space=100.0, sizes={0: 10.0})
    assert b.time_cap == pytest.approx(100.0 / (10.0 / 2.0))  # 20 s


def test_buffer_fits_and_drain():
    b = _buffer()
    assert b.fits(5.0)
    b.update(0, 3.0)  # 3 s of work queued, 2 s drained -> 1 s left
    assert b.lag_seconds() == pytest.approx(1.0)
    b.update(0, 1.0)  # +1 s, drain 2 s -> empty
    assert b.lag_seconds() == pytest.approx(0.0)
    assert not b.overflowed


def test_buffer_partial_head_shrinks_bytes():
    b = _buffer()
    b.update(0, 4.0)  # head now 2 s remaining, bytes scaled by 2/4
    assert b.obj_times == [pytest.approx(2.0)]
    assert b.obj_sizes == [pytest.approx(5.0)]


def test_buffer_overflow_flag():
    b = ProcessingBuffer(8.0, {0: 10.0})
    b.update(0, 100.0)
    b.update(0, 100.0)
    assert b.overflowed


def test_buffer_planner_charge():
    b = _buffer()
    b.update(0, 6.0)
    before = b.lag_seconds()
    b.computed_plan()
    assert b.lag_seconds() == pytest.approx(before + 0.5)


# ----------------------------------------------------------------- switcher
def _make_switcher(cloud_budget=0.0, buffer_space=1e9):
    # 3 categories x 3 configs; config 0 best quality, 2 cheapest.
    quality = [[0.9, 0.6, 0.2], [0.7, 0.5, 0.1], [0.3, 0.2, 0.05]]
    profile = Profile(
        runtime=(1.9, 1.0, 0.4, 1.2, 0.7, 0.3),
        cloud_cost=(0.0, 0.0, 0.0, 2.0, 1.5, 1.0),
        knob_config=(0, 1, 2, 0, 1, 2),
        size_bytes=(100.0, 100.0, 100.0, 100.0, 100.0, 100.0),
    )
    buf = ProcessingBuffer(buffer_space, profile.config_sizes())
    return KnobSwitcher(
        quality,
        profile,
        buf,
        cloud_budget=cloud_budget,
        planning_interval=10,
        initial_histogram=[1.0, 1.0, 1.0],
    )


def test_switcher_emits_valid_decisions():
    sw = _make_switcher()
    scores = [0.9, 0.85, 0.3, 0.1, 0.7, 0.6, 0.2, 0.9, 0.05, 0.5] * 3
    decisions = [sw.switch(s) for s in scores]
    assert len(decisions) == 30
    for i, d in enumerate(decisions):
        assert d.chunk_id == i
        assert 0 <= d.config <= 2
        assert 0 <= d.placement <= 5
        assert d.runtime > 0


def test_switcher_plan_rows_sum_to_one():
    sw = _make_switcher()
    sw.switch(0.5)
    for row in sw.plan:
        assert abs(sum(row) - 1.0) < 1e-9


def test_switcher_classify_nearest_center():
    sw = _make_switcher()
    sw.cur_knob = 0
    assert sw.classify(0.88) == 0   # centers along knob 0: 0.9, 0.7, 0.3
    assert sw.classify(0.65) == 1
    assert sw.classify(0.0) == 2


def test_switcher_zero_budget_stays_on_prem():
    sw = _make_switcher(cloud_budget=0.0)
    # huge budget from on-prem term still allows config 0 on-prem; cloud
    # placements cost >0 so with runtime-fitting buffer we never need them.
    decisions = [sw.switch(s) for s in [0.9, 0.1, 0.5] * 10]
    assert all(d.cloud_cost == 0.0 for d in decisions)


def test_switcher_tight_buffer_falls_back():
    # time_cap = 80/(100/2) = 1.6 s < config 0's on-prem runtime (1.9 s), so
    # the Alg. 1 fallback walk must skip to a placement that fits (the cloud
    # placement of config 0 at 1.2 s, cloud_cost 2.0).
    sw = _make_switcher(buffer_space=80.0)
    decisions = [sw.switch(0.9) for _ in range(5)]
    assert all(d.runtime <= sw.buffer.time_cap for d in decisions)
    assert any(d.cloud_cost > 0 for d in decisions)
    assert not sw.buffer.overflowed


# -------------------------------------------------------------------- tuner
def test_knob_hash_roundtrip():
    k = Knob("framerate", [5, 10, 15, 30, 50, 75, 100, 150, 200, 300, 400])
    assert k.hash_len == 2  # 11 values -> 2 digits (`knob_tuner.py:29`)
    for v in k.domain:
        assert k.dehash(k.hash(v)) == v


def test_multiknob_hash_roundtrip_and_neighbours():
    mk = MultiKnob([
        Knob("framerate", [5, 15, 30]),
        Knob("tiles", [1, 4]),
    ])
    for a in mk.enumerate():
        assert tuple(mk.dehash(mk.hash(a))) == a
    nbrs = mk.neighbours([15, 1])
    assert sorted(map(tuple, nbrs)) == [(5, 1), (15, 4), (30, 1)]


def test_hill_climb_finds_unimodal_peak():
    mk = MultiKnob([Knob("a", list(range(10))), Knob("b", list(range(10)))])
    peak = (7, 3)
    score = lambda a: -((a[0] - peak[0]) ** 2 + (a[1] - peak[1]) ** 2)
    best, s = hill_climb(mk, [0, 0], score, max_iter=50)
    assert tuple(best) == peak and s == 0


def test_evaluate_assignments_parallel(spark):
    mk = MultiKnob([Knob("a", [1, 2, 3]), Knob("b", [10, 20])])
    df = __import__("video_etl_spark.control.tuner", fromlist=["evaluate_assignments"]).evaluate_assignments(
        spark, mk, mk.enumerate(), lambda a: (a[0] * a[1], a[0] + a[1])
    )
    rows = {r["assign_hash"]: (r["accuracy"], r["cost"]) for r in df.collect()}
    assert rows[mk.hash((3, 20))] == (60.0, 23.0)
    assert len(rows) == 6


# ---------------------------------------------------------------- forecaster
def _drift_series(T=400, C=3, period=40.0, seed=3):
    """Synthetic predictable drift: mixture rotates smoothly between
    categories — persistence lags by one step, a trained net should not."""
    import numpy as np

    t = np.arange(T)
    raw = np.stack(
        [1.5 + np.sin(2 * np.pi * (t / period + c / C)) for c in range(C)],
        axis=1,
    )
    rng = np.random.default_rng(seed)
    raw = raw + rng.normal(0, 0.02, raw.shape)
    raw = np.clip(raw, 1e-3, None)
    return raw / raw.sum(axis=1, keepdims=True)


def test_ffn_forecaster_beats_persistence():
    import numpy as np

    from video_etl_spark.control.forecast import FFNForecaster

    series = _drift_series()
    train, test = series[:300], series[300:]
    f = FFNForecaster(n_categories=3, window=8, seed=0)
    f.fit(train)

    ffn_err, persist_err = [], []
    for t in range(8, len(test)):
        pred = f.predict_window(test[t - 8 : t])
        ffn_err.append(np.abs(pred - test[t]).mean())
        persist_err.append(np.abs(test[t - 1] - test[t]).mean())
    assert np.mean(ffn_err) <= np.mean(persist_err), (
        f"FFN MAE {np.mean(ffn_err):.4f} worse than persistence "
        f"{np.mean(persist_err):.4f}"
    )


def test_ffn_forecaster_outputs_valid_mixture():
    import numpy as np

    from video_etl_spark.control.forecast import FFNForecaster

    f = FFNForecaster(n_categories=4, window=4, epochs=30, seed=1)
    f.fit(_drift_series(T=120, C=4))
    p = f.predict_window(_drift_series(T=4, C=4))
    assert p.shape == (4,)
    assert abs(p.sum() - 1.0) < 1e-9
    assert (p >= 0).all()


def test_ffn_plugs_into_knob_planner():
    """forecast_fn contract: persistence until window fills, NN after."""
    from video_etl_spark.control.forecast import FFNForecaster

    series = _drift_series(T=200, C=3)
    f = FFNForecaster(n_categories=3, window=8, epochs=50, seed=0)
    f.fit(series[:150])
    planner = KnobPlanner(
        quality=[[0.9, 0.5], [0.8, 0.4], [0.7, 0.3]],
        knob_cost=[2.0, 1.0],
        hours_plan_ahead=1.0,
        time_interval=2.0,
        forecast_fn=f,
    )
    for h in series[150:170]:
        plan, score = planner.plan(list(h), budget=1e9)
        assert all(abs(sum(row) - 1.0) < 1e-9 for row in plan)
        assert score > 0


# ------------------------------------------------------------ E3 end-to-end
def test_e3_tuning_pipeline_golden(spark):
    """hill_climb → Spark fan-out eval → simulate → Pareto/arg-best, on the
    detect→track DAG: the greedy climbs and the exact lattice arg-best must
    agree on the known-optimal config."""
    from video_etl_spark.control.simulator import detect_to_track, simulate
    from video_etl_spark.control.tuner import (
        Knob,
        MultiKnob,
        run_tuning_pipeline,
    )

    mk = MultiKnob(
        [Knob("detect_every", [30, 60, 120]), Knob("cores", [2, 4, 8])]
    )
    # accuracy: detect more often -> better; cost: simulated runtime (ms)
    acc_table = {30: 0.95, 60: 0.90, 120: 0.70}

    def eval_fn(assignment):
        knob, cores = assignment
        runtime, _cloud = simulate(detect_to_track(knob, 120), cores=cores)
        return acc_table[knob], runtime / 1e5

    result = run_tuning_pipeline(
        spark, mk, eval_fn, eta=0.5,
        starts=[[120, 2], [30, 8], [60, 4]],
    )
    # brute-force golden: enumerate in python
    best_cfg, best_score = None, float("-inf")
    for a in mk.enumerate():
        acc, cost = eval_fn(list(a))
        if acc - 0.5 * cost > best_score:
            best_cfg, best_score = list(a), acc - 0.5 * cost
    assert mk.dehash(result["best"]["assign_hash"]) == best_cfg
    assert result["best"]["score"] == pytest.approx(best_score)
    # every greedy climb reaches the global optimum on this unimodal lattice
    for cfg, score in result["climbed"]:
        assert score == pytest.approx(best_score)
        assert cfg == best_cfg
    # Pareto frontier: contains the best config, no dominated rows
    pareto = result["pareto"].collect()
    hashes = {r["assign_hash"] for r in pareto}
    assert result["best"]["assign_hash"] in hashes
    for r in pareto:
        for o in pareto:
            dominates = (
                o["accuracy"] >= r["accuracy"] and o["cost"] <= r["cost"]
                and (o["accuracy"] > r["accuracy"] or o["cost"] < r["cost"])
            )
            assert not dominates, (r, o)


# ------------------------------------------------------------ U17 knapsack
def test_knapsack_matches_bruteforce():
    """Exact integral MCKP vs full enumeration on random instances."""
    import itertools
    import random

    from video_etl_spark.control.planner import assign_knobs_knapsack

    rng = random.Random(11)
    for _ in range(25):
        n_cat, n_cfg = rng.randint(1, 4), rng.randint(1, 4)
        quality = [
            [rng.uniform(0, 1) for _ in range(n_cfg)] for _ in range(n_cat)
        ]
        cost = [rng.uniform(0.1, 2.0) for _ in range(n_cfg)]
        mix = [rng.uniform(0.1, 1.0) for _ in range(n_cat)]
        budget = rng.uniform(0.5, 4.0)

        # brute force over the exact (unquantized) costs
        best = None
        for combo in itertools.product(range(n_cfg), repeat=n_cat):
            c_tot = sum(mix[c] * cost[k] for c, k in enumerate(combo))
            if c_tot <= budget + 1e-12:
                v = sum(mix[c] * quality[c][k] for c, k in enumerate(combo))
                if best is None or v > best:
                    best = v
        from video_etl_spark.control.planner import InfeasibleBudgetError

        try:
            choice, score = assign_knobs_knapsack(
                quality, cost, mix, budget, grid=20_000
            )
        except InfeasibleBudgetError:
            assert best is None
            continue
        assert best is not None
        # DP choice must be affordable on TRUE costs (ceil quantization
        # guarantees it) and within a quantization hair of the optimum
        true_cost = sum(mix[c] * cost[k] for c, k in enumerate(choice))
        assert true_cost <= budget + 1e-9
        assert score <= best + 1e-9
        assert score >= best - best * 5e-3 - 1e-9


def test_knapsack_integral_vs_lp_bound():
    """The LP relaxation upper-bounds the integral optimum."""
    from video_etl_spark.control.planner import (
        assign_knobs_knapsack,
        assign_knobs_linear,
    )

    quality = [[0.3, 0.7, 0.95], [0.2, 0.5, 0.9]]
    cost = [1.0, 2.0, 4.0]
    mix = [0.6, 0.4]
    budget = 2.0
    choice, v_int = assign_knobs_knapsack(quality, cost, mix, budget)
    _, v_lp = assign_knobs_linear(
        quality, cost, mix, budget, hours_plan_ahead=1 / 3600.0, time_interval=1.0
    )
    assert v_int <= v_lp + 1e-9
    assert len(choice) == 2 and all(0 <= k <= 2 for k in choice)
