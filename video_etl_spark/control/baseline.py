"""Static-baseline runner (SURVEY.md C6; reference `simulate.py:49-89`).

Replays a chunk stream with one fixed config/placement — the "Static"
comparison row of the paper's Table 2 — accounting quality, cloud cost, and
realtime violations through the same buffer model the switcher uses, so
Skyscraper-vs-static comparisons are apples-to-apples.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from video_etl_spark.control.buffer import ProcessingBuffer
from video_etl_spark.control.switcher import Profile


@dataclass(frozen=True)
class BaselineResult:
    n_chunks: int
    score_sum: float
    cloud_cost_sum: float
    overflowed: bool
    max_lag_seconds: float


def run_static_baseline(
    profile: Profile,
    chunk_scores: Sequence[Sequence[float]],
    config: int,
    buffer_space: float,
) -> BaselineResult:
    """Replay chunks with a pinned config (cheapest placement offering it).

    ``chunk_scores[i][k]`` = quality of chunk i under config k (the sim-file
    shape, D3/`simulate.py:27-35`).
    """
    placements = [
        (co, p, r)
        for p, (r, co, c) in enumerate(
            zip(profile.runtime, profile.cloud_cost, profile.knob_config)
        )
        if c == config
    ]
    if not placements:
        raise ValueError(f"profile has no placement for config {config}")
    cloud_cost, _placement, runtime = sorted(placements)[0]

    buf = ProcessingBuffer(buffer_space, profile.config_sizes())
    score_sum = 0.0
    cost_sum = 0.0
    max_lag = 0.0
    for scores in chunk_scores:
        score_sum += scores[config]
        cost_sum += cloud_cost
        buf.update(config, runtime)
        max_lag = max(max_lag, buf.lag_seconds())
    return BaselineResult(
        n_chunks=len(chunk_scores),
        score_sum=score_sum,
        cloud_cost_sum=cost_sum,
        overflowed=buf.overflowed,
        max_lag_seconds=max_lag,
    )
