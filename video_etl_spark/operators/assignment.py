"""Optimal bipartite assignment (SURVEY.md J2).

The reference associates detections to tracks by solving min-cost bipartite
assignment on the negated IoU matrix (`sort.py:36-44` uses `lap`/scipy when
available and degrades otherwise; scipy isn't shipped here).  This is a
clean O(n³) Hungarian implementation (the standard potentials +
augmenting-shortest-path formulation) so association quality matches the
reference's optimal path; tests verify optimality against brute-force
permutation search.

Driver/executor-side helper: association matrices are per-frame tiny
(tens of boxes), so this runs inside the applyInPandas tracker, never as a
distributed op.
"""

from __future__ import annotations

import numpy as np

INF = float("inf")


def hungarian(cost) -> list[tuple[int, int]]:
    """Min-cost assignment on an n×m cost matrix (nested lists or ndarray).

    Returns [(row, col)] pairs covering min(n, m) rows/cols, sorted by row.

    The column scans of the augmenting-path search are numpy-vectorized
    (the tracker calls this once per frame on boxes×tracks matrices;
    Python-level scans were the per-frame hot spot).  Tie-breaking matches
    the scalar reference exactly: the pivot column is the FIRST index
    attaining the minimum reduced cost (np.argmin's first-occurrence rule
    = the ascending scan's strict `<` update).
    """
    C = np.asarray(cost, dtype=np.float64)
    if C.size == 0:
        return []
    n, m = C.shape
    transposed = n > m
    if transposed:
        C = C.T
        n, m = m, n

    u = np.zeros(n + 1)
    v = np.zeros(m + 1)
    p = np.zeros(m + 1, dtype=np.int64)  # p[j] = row matched to col j (1-based)
    way = np.zeros(m + 1, dtype=np.int64)  # predecessor col on augmenting path

    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(m + 1, INF)
        used = np.zeros(m + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            # reduced costs of row i0 against every unused column
            cur = np.full(m + 1, INF)
            cur[1:] = C[i0 - 1] - u[i0] - v[1:]
            cur[used] = INF
            improve = cur < minv
            way[improve] = j0
            np.minimum(minv, cur, out=minv)
            scan = np.where(used, INF, minv)
            j1 = int(np.argmin(scan))
            delta = scan[j1]
            u[p[used]] += delta
            v[used] -= delta
            minv[~used] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = int(way[j0])
            p[j0] = p[j1]
            j0 = j1

    pairs = []
    for j in range(1, m + 1):
        if p[j]:
            r, c = int(p[j]) - 1, j - 1
            pairs.append((c, r) if transposed else (r, c))
    return sorted(pairs)


def assignment_cost(cost: list[list[float]], pairs: list[tuple[int, int]]) -> float:
    return sum(cost[r][c] for r, c in pairs)
