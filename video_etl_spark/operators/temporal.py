"""Reusable temporal operators: as-of join, sessionization, fill-forward.

These are the Spark-native re-expressions of the reference's time-series
manipulations (SURVEY.md J8, W3, W7; score time-series D12 at
`src/online/knob_plan.py:242-275`, segment carry-forward at
`workloads/streaming/social_workload.py:147-159`).

Scale notes (100 TB posture):
* ``merge_asof`` is a single shuffle on the key + one ordered window pass —
  O(n log n) per key, no quadratic candidate join.  This is the classic
  union-merge as-of strategy; it beats a range-join + dedup when the right
  side is large.
* ``sessionize`` is one window pass (lag + running sum), the gaps-and-islands
  formulation; batch-equivalent of Structured Streaming's
  ``session_window`` (used in streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "_asof_tag"
_T = "_asof_t"
_S = "_asof_payload"


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    pickup: dict[str, str],
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the newest right row with
    ``right_ts <= left_ts`` (per join key); left rows without a match keep
    nulls (left-join semantics).

    ``pickup`` maps right-side source column -> output alias.  Ties on
    ``right_ts`` resolve to the greatest ``right_tiebreak`` value so results
    are deterministic.

    All pickup columns travel as ONE struct filled forward with a single
    ``last(ignorenulls=True)``, so every left row receives all its values
    from the same right row — per-column fill-forward would silently mix
    right rows whenever a newer right row holds NULL in one pickup column.
    """
    right_tiebreak = right_tiebreak or []
    r = right.select(
        *keys,
        F.col(right_ts).alias(_T),
        F.lit(0).alias(_TAG),
        F.struct(
            *[F.col(src).alias(dst) for src, dst in pickup.items()]
        ).alias(_S),
    )
    l = left.withColumn(_T, F.col(left_ts)).withColumn(_TAG, F.lit(1))
    # left rows get a NULL payload struct; right rows always have a non-null
    # struct (even when individual fields are NULL), so the fill below is
    # row-atomic.
    unioned = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at equal timestamps (inclusive <=);
    # among right ties the greatest tiebreak lands last, so `last()` picks it.
    order: list[Column] = [F.col(_T), F.col(_TAG)]
    order += [
        F.col(f"{_S}.{pickup[c]}").asc_nulls_first() for c in right_tiebreak
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(_S, F.last(_S, ignorenulls=True).over(w))
    out = filled.filter(F.col(_TAG) == 1)
    for dst in pickup.values():
        out = out.withColumn(dst, F.col(f"{_S}.{dst}"))
    return out.drop(_TAG, _T, _S)


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gaps-and-islands session ids: a new session starts when the gap
    to the previous event (per key) exceeds ``gap_seconds``.

    Adds a ``session_id`` column (0-based per key).  Comparison is done on
    integer microseconds so the result is engine-exact.
    """
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    micros = F.unix_micros(F.col(ts))
    prev = F.lag(micros).over(w)
    new_session = F.when(
        prev.isNull() | ((micros - prev) > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(
        "session_id", (F.sum(new_session).over(run) - 1).cast("long")
    )


def fill_forward(
    df: DataFrame,
    key: str,
    ts: str,
    col: str,
    out: str,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Carry the last non-null value of ``col`` forward per key (W3,
    `social_workload.py:147-159`'s segment-skip carry-forward)."""
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out, F.last(F.col(col), ignorenulls=True).over(w))
