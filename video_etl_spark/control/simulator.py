"""Runtime/cost simulator for task DAGs (SURVEY.md U20).

Re-implements the semantics of the reference's list-scheduling simulator
(`src/offline/execution_utils.py:136-248`): a DAG of tasks, each either
on-prem (choosing 1 core vs all cores) or cloud (paying a roundtrip plus a
per-millisecond token-bucket bandwidth model), scheduled greedily in
ready-time order.  The paper validates this model to ≤9 % error on-prem
(paper §M.2).

This is a *clean rewrite*, not a translation: tasks are immutable dataclass
rows (the D5 task-graph schema), the scheduler keeps an explicit ready heap,
and the whole thing is a pure function so it can be property-tested and
fanned out over candidate configurations as a Spark job (see tuner.py).

Semantics preserved from the reference:
* single-core vs all-core choice: a task runs single-core iff
  ``|rt_all - rt_single| < 0.5 * rt_single`` (`execution_utils.py:172`);
  all-core mode adds ``rt_all/cores`` to every core's queue.
* cloud tasks pay ``cloud_roundtrip`` iff they are sources or have at least
  one on-prem dependency (`execution_utils.py:147-154`), and stream their
  input through a per-ms bandwidth token bucket only when the roundtrip was
  added (`:197-204`); output bytes always stream (`:209-215`).
* dependents become dispatchable at the finisher's finish time (`:64-70`).
* cost = Σ rt_single over cloud-placed tasks (`:236-242`).

Golden parity: ``simulate(detect_to_track(60, 120), cores=4)`` returns
(32110.5, 0), the reference's own output for its ``__main__`` example.
"""

from __future__ import annotations

import heapq
from collections import defaultdict
from dataclasses import dataclass, field

ON_PREM = 0
CLOUD = 1

DEFAULT_CLOUD_ROUNDTRIP_MS = 160.0
DEFAULT_BANDWIDTH_BPS = 1_850_000.0

# Hard-coded reference task costs (ms) — `execution_utils.py:286-290`,
# `covid_measures.py:128-137`.
YOLO_MS = (721.0, 1941.0)
KCF_MS = (519.0, 519.0)
FACE_DET_MS = (850.0, 3000.0)
MASK_CLS_MS = (320.0, 1300.0)


@dataclass(frozen=True)
class Task:
    """One node of the D5 task-graph schema."""

    task_id: int
    rt_single: float
    rt_all: float
    rt_cloud: float
    deps: tuple[int, ...] = ()
    placement: int = ON_PREM
    in_bytes: int = 0
    out_bytes: int = 0


@dataclass
class _Sched:
    dispatchable: float
    n_deps: int
    task: Task = field(compare=False)


def simulate_runtime(
    tasks: list[Task],
    cores: int,
    cloud_roundtrip: float = DEFAULT_CLOUD_ROUNDTRIP_MS,
    bandwidth_bps: float = DEFAULT_BANDWIDTH_BPS,
) -> float:
    """Total makespan of the DAG under greedy list scheduling."""
    bandwidth_per_ms = bandwidth_bps / 1000.0
    by_id = {t.task_id: t for t in tasks}

    # Effective cloud runtime: add the roundtrip for sources and for tasks
    # with at least one on-prem dependency.
    eff_cloud: dict[int, float] = {}
    for t in tasks:
        rt = t.rt_cloud
        if not t.deps or any(by_id[d].placement == ON_PREM for d in t.deps):
            rt += cloud_roundtrip
        eff_cloud[t.task_id] = rt

    n_deps = {t.task_id: len(t.deps) for t in tasks}
    dependents: dict[int, list[int]] = defaultdict(list)
    for t in tasks:
        for d in t.deps:
            dependents[d].append(t.task_id)

    dispatchable: dict[int, float] = {
        t.task_id: 0.0 if not t.deps else -1.0 for t in tasks
    }
    # Ready heap ordered by (dispatchable, task_id) — the reference's sort
    # picks the minimum-dispatchable ready node (`execution_utils.py:80-92`).
    ready = [
        (0.0, t.task_id) for t in tasks if not t.deps
    ]
    heapq.heapify(ready)

    core_q = [0.0] * cores
    bandwidth_usage: dict[float, float] = defaultdict(float)
    total_runtime = 0.0
    done = 0

    while ready:
        cur_time, tid = heapq.heappop(ready)
        t = by_id[tid]

        if t.placement == ON_PREM:
            if abs(t.rt_all - t.rt_single) < 0.5 * t.rt_single:
                core = min(range(cores), key=lambda i: core_q[i])
                core_q[core] = max(cur_time, core_q[core]) + t.rt_single
                finish = core_q[core]
            else:
                finish = 0.0
                for i in range(cores):
                    core_q[i] = max(cur_time, core_q[i]) + t.rt_all / cores
                    finish = max(finish, core_q[i])
        else:
            transfer = 0
            if eff_cloud[tid] > t.rt_single + 10:  # roundtrip was added
                remaining = float(t.in_bytes)
                while remaining > 0:
                    avail = bandwidth_per_ms - bandwidth_usage[cur_time + transfer]
                    moved = min(avail, remaining)
                    remaining -= moved
                    bandwidth_usage[cur_time + transfer] += moved
                    transfer += 1
            finish = cur_time + eff_cloud[tid] + transfer
            remaining = float(t.out_bytes)
            while remaining > 0:
                avail = bandwidth_per_ms - bandwidth_usage[finish]
                moved = min(avail, remaining)
                remaining -= moved
                bandwidth_usage[finish] += moved
                finish += 1

        total_runtime = max(total_runtime, finish)
        done += 1

        for child in dependents[tid]:
            n_deps[child] -= 1
            if n_deps[child] == 0:
                dispatchable[child] = max(dispatchable[child], finish)
                heapq.heappush(ready, (dispatchable[child], child))

    if done != len(tasks):
        raise ValueError("task graph has a cycle or missing dependency")
    return total_runtime


def simulate_cost(tasks: list[Task]) -> float:
    """Cloud cost: Σ rt_single over cloud-placed tasks (core-milliseconds)."""
    return sum(t.rt_single for t in tasks if t.placement == CLOUD)


def simulate(tasks: list[Task], cores: int = 4, **kw) -> tuple[float, float]:
    return simulate_runtime(tasks, cores, **kw), simulate_cost(tasks)


def detect_to_track(knob: int, num_frames: int) -> list[Task]:
    """The reference's detect→track example DAG
    (`execution_utils.py:280-291`): one YOLO per `knob` frames, followed by a
    *chain* of `knob` tracker tasks — each tracker depends on the previous
    node (KCF tracking is sequential per frame), so every group is
    yolo → t1 → t2 → … → t_knob."""
    if num_frames % knob != 0:
        raise ValueError("num_frames must be a multiple of knob")
    tasks: list[Task] = []
    tid = 0
    for _ in range(num_frames // knob):
        tasks.append(Task(tid, *YOLO_MS, YOLO_MS[0]))
        tid += 1
        for _ in range(knob):
            tasks.append(Task(tid, *KCF_MS, KCF_MS[0], deps=(tid - 1,)))
            tid += 1
    return tasks


def covid_pipeline(n_chunks: int, people_per_frame: int = 2) -> list[Task]:
    """A COVID-workload-shaped DAG (detect → per-person mask classify),
    mirroring the node costs of `covid_measures.py:121-140`."""
    tasks: list[Task] = []
    tid = 0
    for _ in range(n_chunks):
        det_id = tid
        tasks.append(Task(tid, *FACE_DET_MS, FACE_DET_MS[0]))
        tid += 1
        for _ in range(people_per_frame):
            tasks.append(Task(tid, *MASK_CLS_MS, MASK_CLS_MS[0], deps=(det_id,)))
            tid += 1
    return tasks
