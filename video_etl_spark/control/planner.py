"""Knob planner: forecast → linear program → per-category config mixture
(SURVEY.md U16/C2; paper §4.1 Eq. 2-4; reference `knob_plan.py:72-132`).

The LP:  maximize   Σ_c Σ_k α[c,k] · m[c] · q[c,k] · S
         subject to Σ_k α[c,k] = 1            for every category c
                    Σ_{c,k} α[c,k] · m[c] · r[k] · H ≤ budget
                    0 ≤ α ≤ 1
with m = forecast mixture, q = per-category per-config quality (the KMeans
centers matrix, D7), r = per-config on-prem runtime (knob cost), and the
reference's exact scale factors H = hours_plan_ahead·3600 and
S = hours_plan_ahead·3600/time_interval (`knob_plan.py:90, 97-98`).

scipy isn't available in this environment, so instead of calling
``linprog`` we solve the LP *exactly* with the classic greedy algorithm for
the LP relaxation of the multiple-choice knapsack problem (each category
independently picks a point on the convex hull of its (cost, value)
options; remaining budget is spent on hull upgrade segments in globally
decreasing value/cost ratio).  For this constraint structure — one coupling
budget row + per-category simplex rows — the greedy solution is an optimal
LP vertex (standard MCKP-relaxation result), so the optimum value matches
what linprog would return; tests assert optimality against brute-force
enumeration on small instances.

Like the reference, an infeasible budget raises (`knob_plan.py:116-118`).
The NN forecaster (U15) is a pluggable callable here — Keras isn't shipped;
the default is a persistence forecast (use the observed histogram), and any
``fn(histogram) -> histogram`` (e.g. a numpy MLP) can be swapped in.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence


class InfeasibleBudgetError(Exception):
    """Raised when even the cheapest per-category assignment exceeds budget
    (mirrors `knob_plan.py:116-118`)."""


def _convex_hull(points: list[tuple[float, float, int]]) -> list[tuple[float, float, int]]:
    """Upper-left convex hull of (cost, value, idx): increasing cost,
    increasing value, decreasing marginal ratio."""
    pts = sorted(points, key=lambda p: (p[0], -p[1]))
    # Drop dominated points (same-or-higher cost with same-or-lower value).
    frontier: list[tuple[float, float, int]] = []
    best_v = float("-inf")
    for c, v, i in pts:
        if v > best_v:
            frontier.append((c, v, i))
            best_v = v
    # Keep only concave-down (decreasing-slope) chain.
    hull: list[tuple[float, float, int]] = []
    for p in frontier:
        while len(hull) >= 2:
            (c1, v1, _), (c2, v2, _) = hull[-2], hull[-1]
            # slope to p must be below slope hull[-2]→hull[-1]
            if (v2 - v1) * (p[0] - c2) <= (p[1] - v2) * (c2 - c1):
                hull.pop()
            else:
                break
        hull.append(p)
    return hull


def assign_knobs_linear(
    quality: Sequence[Sequence[float]],
    knob_cost: Sequence[float],
    mixture: Sequence[float],
    budget: float,
    hours_plan_ahead: float,
    time_interval: float,
) -> tuple[list[list[float]], float]:
    """Solve the knob-assignment LP exactly.

    Returns (plan, expected_score): plan[c][k] = fraction of category-c
    chunks to run with config k (rows sum to 1).
    """
    n_cat = len(quality)
    n_cfg = len(knob_cost)
    h_scale = hours_plan_ahead * 3600.0
    s_scale = hours_plan_ahead * 3600.0 / time_interval

    plan = [[0.0] * n_cfg for _ in range(n_cat)]
    score = 0.0
    spent = 0.0
    upgrades: list[tuple[float, float, float, int, int, int]] = []

    hulls = []
    for c in range(n_cat):
        points = [
            (mixture[c] * knob_cost[k] * h_scale, mixture[c] * quality[c][k] * s_scale, k)
            for k in range(n_cfg)
        ]
        hull = _convex_hull(points)
        hulls.append(hull)
        # Start every category at its cheapest hull point.
        c0, v0, k0 = hull[0]
        plan[c][k0] = 1.0
        spent += c0
        score += v0

    if spent > budget + 1e-9:
        raise InfeasibleBudgetError(
            "Linear program is infeasible: cheapest assignment costs "
            f"{spent:.2f} > budget {budget:.2f}; increase budget or cores."
        )

    # Upgrade segments (Δcost, Δvalue) between consecutive hull points,
    # taken in globally decreasing Δv/Δc ratio (ties: category, config).
    for c, hull in enumerate(hulls):
        for (c1, v1, k1), (c2, v2, k2) in zip(hull, hull[1:]):
            dc, dv = c2 - c1, v2 - v1
            if dc <= 0:
                continue
            upgrades.append((-(dv / dc), dc, dv, c, k1, k2))
    upgrades.sort(key=lambda u: (u[0], u[3], u[5]))

    remaining = budget - spent
    for _neg_ratio, dc, dv, c, k_from, k_to in upgrades:
        if remaining <= 1e-12:
            break
        frac = min(1.0, remaining / dc)
        plan[c][k_from] -= frac
        plan[c][k_to] += frac
        score += frac * dv
        remaining -= frac * dc
        if plan[c][k_from] < 1e-12:
            plan[c][k_from] = 0.0

    return plan, score


class KnobPlanner:
    """C2: periodic planning step — forecast the content-category mixture,
    then assign configs by LP (reference `knob_plan.py:320-336`)."""

    def __init__(
        self,
        quality: Sequence[Sequence[float]],
        knob_cost: Sequence[float],
        hours_plan_ahead: float,
        time_interval: float,
        forecast_fn: Callable[[Sequence[float]], Sequence[float]] | None = None,
    ) -> None:
        self.quality = [list(row) for row in quality]
        self.knob_cost = list(knob_cost)
        self.hours_plan_ahead = hours_plan_ahead
        self.time_interval = time_interval
        # Persistence forecast by default (the NN forecaster U15 is
        # pluggable; see module docstring).
        self.forecast_fn = forecast_fn or (lambda h: h)

    def plan(
        self, histogram: Sequence[float], budget: float
    ) -> tuple[list[list[float]], float]:
        mixture = list(self.forecast_fn(list(histogram)))
        total = sum(mixture)
        if total > 0:
            mixture = [m / total for m in mixture]
        return assign_knobs_linear(
            self.quality,
            self.knob_cost,
            mixture,
            budget,
            self.hours_plan_ahead,
            self.time_interval,
        )


# ---------------------------------------------------------------------------
# U17 — 0-1 knapsack alternative planner (reference `knob_plan.py:135-177`
# left this path unfinished/NotImplementedError; this is the completed
# exact form).  Integral assignment: each category picks EXACTLY one config
# (no fractional mixing as in the LP above) maximizing expected quality
# under the cost budget — the multiple-choice knapsack (MCKP) solved by DP
# over a quantized budget grid.  Driver-side: the knob lattice is
# control-plane sized (categories x configs), never data-sized.
def assign_knobs_knapsack(
    quality: Sequence[Sequence[float]],
    knob_cost: Sequence[float],
    mixture: Sequence[float],
    budget: float,
    grid: int = 1000,
) -> tuple[list[int], float]:
    """Exact integral MCKP via DP.

    Returns (choice, expected_score): choice[c] = config index for
    category c.  Costs are quantized onto ``grid`` budget steps (ceil —
    never overspends).  Raises InfeasibleBudgetError when even the
    cheapest per-category picks exceed the budget.
    """
    n_cat = len(quality)
    n_cfg = len(knob_cost)
    if budget <= 0:
        raise InfeasibleBudgetError("budget must be positive")
    step = budget / grid
    # integer costs, rounded UP so a DP-feasible plan is truly affordable
    cost_q = [
        [int(-(-(mixture[c] * knob_cost[k]) // step)) for k in range(n_cfg)]
        for c in range(n_cat)
    ]
    value = [
        [mixture[c] * quality[c][k] for k in range(n_cfg)] for c in range(n_cat)
    ]
    if sum(min(row) for row in cost_q) > grid:
        raise InfeasibleBudgetError(
            "knapsack infeasible: cheapest integral assignment exceeds budget"
        )
    neg = float("-inf")
    # dp[b] = best value using categories 0..c at total quantized cost <= b
    dp = [0.0] + [neg] * grid
    back: list[list[int]] = []
    for c in range(n_cat):
        ndp = [neg] * (grid + 1)
        choice_at = [-1] * (grid + 1)
        for b in range(grid + 1):
            if dp[b] == neg:
                continue
            for k in range(n_cfg):
                nb = b + cost_q[c][k]
                if nb <= grid and dp[b] + value[c][k] > ndp[nb]:
                    ndp[nb] = dp[b] + value[c][k]
                    choice_at[nb] = k
        dp = ndp
        back.append(choice_at)
    best_b = max(range(grid + 1), key=lambda b: (dp[b], -b))
    if dp[best_b] == neg:
        raise InfeasibleBudgetError("knapsack infeasible at this grid")
    # backtrack
    choice = [0] * n_cat
    b = best_b
    for c in range(n_cat - 1, -1, -1):
        k = back[c][b]
        choice[c] = k
        b -= cost_q[c][k]
    return choice, dp[best_b]
