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

INF = float("inf")


def hungarian(cost: list[list[float]]) -> list[tuple[int, int]]:
    """Min-cost assignment on an n×m cost matrix.

    Returns [(row, col)] pairs covering min(n, m) rows/cols, sorted by row.
    """
    n = len(cost)
    if n == 0 or len(cost[0]) == 0:
        return []
    m = len(cost[0])
    transposed = n > m
    if transposed:
        cost = [[cost[i][j] for i in range(n)] for j in range(m)]
        n, m = m, n

    u = [0.0] * (n + 1)
    v = [0.0] * (m + 1)
    p = [0] * (m + 1)  # p[j] = row (1-based) matched to col j; p[0] = work row
    way = [0] * (m + 1)  # predecessor column on the augmenting path

    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (m + 1)
        used = [False] * (m + 1)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = 0
            for j in range(1, m + 1):
                if used[j]:
                    continue
                cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                if cur < minv[j]:
                    minv[j] = cur
                    way[j] = j0
                if minv[j] < delta:
                    delta = minv[j]
                    j1 = j
            for j in range(m + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1

    pairs = []
    for j in range(1, m + 1):
        if p[j]:
            r, c = p[j] - 1, j - 1
            pairs.append((c, r) if transposed else (r, c))
    return sorted(pairs)


def assignment_cost(cost: list[list[float]], pairs: list[tuple[int, int]]) -> float:
    return sum(cost[r][c] for r, c in pairs)
