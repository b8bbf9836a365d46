"""Offline knob tuning: configuration space, hashing, hill climbing
(SURVEY.md U19; reference `src/offline/knob_tuner.py`).

The reference encodes a knob assignment as a concatenated zero-padded
digit string of per-knob domain indices (`knob_tuner.py:45-52`), enumerates
neighbours by stepping one knob up/down (`:30-40, 65-77`), and hill-climbs
on score = accuracy − η·cost (`:291-406`).  The expensive part — evaluating
candidate assignments against sample videos — is embarrassingly parallel;
here it fans out as a Spark job over a candidates DataFrame
(``evaluate_assignments``), which is the re-architecture SURVEY §3/E3 calls
for (the reference evaluates serially on the driver).
"""

from __future__ import annotations

import itertools
import math
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


class Knob:
    """One tunable knob: a name and an ordered value domain."""

    def __init__(self, name: str, domain: Sequence) -> None:
        if len(domain) < 2:
            raise ValueError("knob domain needs >= 2 values")
        self.name = name
        self.domain = list(domain)
        self.hash_len = max(1, math.ceil(math.log10(len(self.domain))))

    def neighbour_values(self, value) -> list:
        idx = self.domain.index(value)
        lo = [self.domain[idx - 1]] if idx > 0 else []
        hi = [self.domain[idx + 1]] if idx < len(self.domain) - 1 else []
        return lo + hi

    def hash(self, value) -> str:
        return str(self.domain.index(value)).zfill(self.hash_len)

    def dehash(self, enc: str):
        return self.domain[int(enc)]


class MultiKnob:
    """A joint configuration space over several knobs with the reference's
    digit-string hashing (round-trippable, order-preserving)."""

    def __init__(self, knobs: Sequence[Knob]) -> None:
        self.knobs = list(knobs)

    def hash(self, assignment: Sequence) -> str:
        return "".join(k.hash(v) for k, v in zip(self.knobs, assignment))

    def dehash(self, enc: str) -> list:
        expected = sum(k.hash_len for k in self.knobs)
        if len(enc) != expected:
            raise ValueError(f"hash length {len(enc)} != {expected}")
        out, start = [], 0
        for k in self.knobs:
            out.append(k.dehash(enc[start : start + k.hash_len]))
            start += k.hash_len
        return out

    def neighbours(self, assignment: Sequence) -> list[list]:
        result = []
        for i, k in enumerate(self.knobs):
            for v in k.neighbour_values(assignment[i]):
                cand = list(assignment)
                cand[i] = v
                result.append(cand)
        return result

    def enumerate(self) -> list[tuple]:
        return list(itertools.product(*[k.domain for k in self.knobs]))


def evaluate_assignments(
    spark: SparkSession,
    multiknob: MultiKnob,
    assignments: Sequence[Sequence],
    eval_fn: Callable[[list], tuple[float, float]],
) -> DataFrame:
    """Fan candidate evaluations out as a Spark job (E3 step 2 re-architected).

    ``eval_fn(assignment) -> (accuracy, cost)`` runs on executors; the result
    is a DataFrame ``(assign_hash, accuracy, cost)`` ready for the Pareto
    (A9) / arg-best (A10) reductions in queries/relational.py.
    """
    hashes = [multiknob.hash(a) for a in assignments]
    sc = spark.sparkContext
    mk = multiknob  # captured by closure; knobs are tiny

    def run(h: str) -> tuple[str, float, float]:
        acc, cost = eval_fn(mk.dehash(h))
        return (h, float(acc), float(cost))

    rows = sc.parallelize(hashes, min(len(hashes), 64)).map(run)
    return spark.createDataFrame(rows, "assign_hash string, accuracy double, cost double")


def hill_climb(
    multiknob: MultiKnob,
    start: Sequence,
    score_fn: Callable[[list], float],
    max_iter: int = 20,
) -> tuple[list, float]:
    """Greedy hill climbing over the knob lattice
    (`knob_tuner.py:366-394`): move to the best-scoring neighbour until no
    improvement or ``max_iter``."""
    cur = list(start)
    cur_score = score_fn(cur)
    seen = {multiknob.hash(cur)}
    for _ in range(max_iter):
        best, best_score = None, cur_score
        for cand in multiknob.neighbours(cur):
            h = multiknob.hash(cand)
            if h in seen:
                continue
            seen.add(h)
            s = score_fn(cand)
            if s > best_score:
                best, best_score = cand, s
        if best is None:
            break
        cur, cur_score = best, best_score
    return cur, cur_score


# ---------------------------------------------------------------------------
# E3 assembled end-to-end (reference `knob_tuner.py:413-416`: build workload,
# tune knobs, score = accuracy − η·cost `:409-410`).
def pareto_frontier(evaluated: DataFrame) -> DataFrame:
    """A9 dominance reduction over an evaluated-candidates DataFrame
    ``(assign_hash, accuracy, cost)``: keep rows no other row dominates
    (≥ accuracy AND ≤ cost, strictly better somewhere).

    The dominance join is O(n²) over the *candidate set* (bounded by the
    knob lattice, thousands at most — never data-sized), mirroring
    `knob_tuner.py:214-237`."""
    from pyspark.sql import functions as F

    other = evaluated.select(
        F.col("accuracy").alias("o_acc"), F.col("cost").alias("o_cost")
    )
    dominated = evaluated.join(
        other,
        (F.col("o_acc") >= F.col("accuracy"))
        & (F.col("o_cost") <= F.col("cost"))
        & (
            (F.col("o_acc") > F.col("accuracy"))
            | (F.col("o_cost") < F.col("cost"))
        ),
        "left_semi",
    )
    return evaluated.join(dominated, ["assign_hash"], "left_anti")


def argbest_assignment(evaluated: DataFrame, eta: float) -> DataFrame:
    """A10 arg-best: the single row maximizing the reference's score
    ``accuracy − η·cost`` (`knob_tuner.py:409-410`), hash tiebreak."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    scored = evaluated.withColumn(
        "score", F.col("accuracy") - F.lit(eta) * F.col("cost")
    )
    w = Window.orderBy(F.desc("score"), F.col("assign_hash"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def run_tuning_pipeline(
    spark: SparkSession,
    multiknob: MultiKnob,
    eval_fn: Callable[[list], tuple[float, float]],
    eta: float,
    starts: Sequence[Sequence],
    max_iter: int = 20,
) -> dict:
    """E3 end-to-end: hill-climbs (driver-side walks, U19) propose optima,
    the full candidate lattice fans out for exact evaluation as a Spark job
    (``evaluate_assignments``), and the A9/A10 reductions pick the Pareto
    set and the score-optimal config — the composition the reference runs
    in `knob_tuner.py:291-416` with serial evaluation.

    Returns {"best": row, "pareto": DataFrame, "climbed": [(assignment,
    score), ...]} — ``best`` is exact (computed over the enumerated
    lattice), climbs are the greedy approximations to compare against.
    """
    from video_etl_spark.session import ensure_executor_package

    ensure_executor_package(spark)

    def score_fn(a: list) -> float:
        acc, cost = eval_fn(a)
        return acc - eta * cost

    climbed = [
        hill_climb(multiknob, start, score_fn, max_iter=max_iter)
        for start in starts
    ]
    evaluated = evaluate_assignments(
        spark, multiknob, multiknob.enumerate(), eval_fn
    )
    evaluated = evaluated.persist()  # two consumers: pareto + argbest
    best = argbest_assignment(evaluated, eta).collect()[0]
    pareto = pareto_frontier(evaluated)
    return {"best": best, "pareto": pareto, "climbed": climbed}
