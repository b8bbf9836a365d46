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
