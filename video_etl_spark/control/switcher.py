"""Knob switcher: per-chunk reactive config/placement choice (SURVEY.md C1;
paper §4.2 Eq. 5-6, Alg. 1; reference `src/online/knob_switcher.py`).

Every chunk (2 s of stream) the switcher:
1. every ``planning_interval`` chunks: normalizes the category counter into a
   histogram and asks the planner (C2) for a fresh plan (`:81-86`);
2. classifies content by nearest category center along the current knob's
   quality dimension — Eq. 5 (`:88`);
3. picks the config whose planned-vs-used ratio deficit is largest — Eq. 6
   (`:91-93`);
4. walks the per-category priority list (quality desc, cost asc — `:35-51`)
   from that config until a placement's runtime fits the buffer (`:100-102`);
5. updates counters and the buffer (`:110-114`).

In the Spark engine this runs inside ``foreachBatch`` over the 2 s windowed
aggregates (streaming/pipeline.py); state (counters, plan) lives on the
driver exactly like the reference keeps it in-process.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from video_etl_spark.control.buffer import ProcessingBuffer
from video_etl_spark.control.planner import KnobPlanner


@dataclass(frozen=True)
class Profile:
    """D9 profile table: parallel lists indexed by placement id
    (`examples/COVID/prof.json` shape)."""

    runtime: tuple[float, ...]
    cloud_cost: tuple[float, ...]
    knob_config: tuple[int, ...]
    size_bytes: tuple[float, ...]

    def config_sizes(self) -> dict[int, float]:
        return dict(zip(self.knob_config, self.size_bytes))

    def on_prem_knob_cost(self, n_configs: int) -> list[float]:
        """Per-config on-prem runtime (rows with cloud_cost == 0) — the
        planner's knob_cost vector (`knob_switcher.py:54-57`)."""
        cost = [0.0] * n_configs
        for r, c, cfg in zip(self.runtime, self.cloud_cost, self.knob_config):
            if c == 0:
                cost[cfg] = r
        return cost


@dataclass(frozen=True)
class SwitchDecision:
    """D15 switch-log row (`simulate.py:24`)."""

    chunk_id: int
    config: int
    placement: int
    cloud_cost: float
    runtime: float


class KnobSwitcher:
    def __init__(
        self,
        quality: Sequence[Sequence[float]],
        profile: Profile,
        buffer: ProcessingBuffer,
        cloud_budget: float,
        planning_interval: int,
        initial_histogram: Sequence[float],
        plan_ahead_hours: float = 24.0,
        time_interval: float = 2.0,
        forecast_fn=None,
    ) -> None:
        self.quality = [list(row) for row in quality]
        self.n_categories = len(self.quality)
        self.n_configs = len(self.quality[0])
        self.profile = profile
        self.buffer = buffer
        self.planning_interval = planning_interval
        self.time_interval = time_interval
        # On-prem compute budget for the horizon plus the cloud allowance
        # (`knob_switcher.py:23`: plan_ahead·3600·interval + cloud_budget).
        self.budget = plan_ahead_hours * 3600.0 * time_interval + cloud_budget

        # Per-category priority list: configs by quality desc, then
        # placements by (cloud_cost, placement_id) asc (`:35-51`).
        self.config_prio: list[list[tuple[float, int, float, int]]] = []
        for cat in range(self.n_categories):
            order = sorted(
                range(self.n_configs), key=lambda k: (-self.quality[cat][k], k)
            )
            prio: list[tuple[float, int, float, int]] = []
            for cfg in order:
                rows = [
                    (co, p, r, cfg)
                    for p, (r, co, c) in enumerate(
                        zip(profile.runtime, profile.cloud_cost, profile.knob_config)
                    )
                    if c == cfg
                ]
                prio += sorted(rows)
            self.config_prio.append(prio)

        self.planner = KnobPlanner(
            quality,
            profile.on_prem_knob_cost(self.n_configs),
            hours_plan_ahead=plan_ahead_hours,
            time_interval=time_interval,
            forecast_fn=forecast_fn,
        )

        self.cur_knob = 0
        self.counter = 0
        self.category_counter = [float(x) for x in initial_histogram]
        self.used_configs_counter = [
            [1.0] * self.n_configs for _ in range(self.n_categories)
        ]
        self.plan: list[list[float]] | None = None

    def _reset_counts(self) -> None:
        self.category_counter = [0.0] * self.n_categories
        self.used_configs_counter = [
            [1.0] * self.n_configs for _ in range(self.n_categories)
        ]

    def classify(self, cur_score: float) -> int:
        """Eq. 5: nearest center along the current knob's dimension."""
        return min(
            range(self.n_categories),
            key=lambda c: (abs(self.quality[c][self.cur_knob] - cur_score), c),
        )

    def switch(self, cur_score: float) -> SwitchDecision:
        if self.counter % self.planning_interval == 0:
            total = sum(self.category_counter) or 1.0
            histogram = [x / total for x in self.category_counter]
            self.plan, _ = self.planner.plan(histogram, self.budget)
            self._reset_counts()
            self.buffer.computed_plan()

        category = self.classify(cur_score)

        # Eq. 6: config with max planned-minus-used ratio deficit.
        used = self.used_configs_counter[category]
        used_total = sum(used)
        deficits = [
            self.plan[category][k] - used[k] / used_total
            for k in range(self.n_configs)
        ]
        target = max(range(self.n_configs), key=lambda k: (deficits[k], -k))

        prio = self.config_prio[category]
        idx = 0
        while prio[idx][3] != target:
            idx += 1
        # Alg. 1 fallback: walk the priority list until the buffer fits.
        while not self.buffer.fits(prio[idx][2]) and idx < len(prio) - 1:
            idx += 1

        cloud_cost, placement, runtime, config = prio[idx]
        self.cur_knob = config
        self.category_counter[category] += 1
        self.used_configs_counter[category][config] += 1
        self.buffer.update(config, runtime)
        decision = SwitchDecision(
            chunk_id=self.counter,
            config=config,
            placement=placement,
            cloud_cost=cloud_cost,
            runtime=runtime,
        )
        self.counter += 1
        return decision
