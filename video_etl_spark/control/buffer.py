"""Byte-bounded ingestion buffer accounting (SURVEY.md C5/W6/D11;
reference `src/simulations/buffer.py:9-75`).

Models the reference's throughput guarantee (paper §2.1 Eq. 1): raw chunks
queue in a bounded buffer while the pipeline works; a knob choice "fits" iff
the queued work plus its runtime stays under the buffer's time capacity.

Semantics preserved:
* capacity is converted bytes → seconds via the *largest* chunk size in the
  profile: ``time_cap = space / (max_size / interval)`` (`buffer.py:22-24`);
* the planner's own runtime is charged to the head item when a re-plan
  happens (`buffer.py:27-29`, PLANNER_RUNTIME = 0.5 s);
* each tick drains ``interval`` seconds of queued work, shrinking a
  partially-processed head item's byte size proportionally
  (`buffer.py:53-64`).  (The reference subtracts the full interval from the
  head even when part of the tick was already consumed — `buffer.py:61`
  uses SWITCHER_TIME_INTERVAL where the remaining `processed` is meant; we
  drain the remainder, which is the conservative/consistent reading.)
* overflow is reported, not fatal (`buffer.py:67-69`).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

SWITCHER_TIME_INTERVAL = 2.0  # seconds per chunk (`buffer.py:6`)
PLANNER_RUNTIME = 0.5  # seconds (`buffer.py:7`)


class ProcessingBuffer:
    def __init__(
        self,
        space_bytes: float,
        config_sizes: Mapping[int, float],
        interval: float = SWITCHER_TIME_INTERVAL,
    ) -> None:
        """space_bytes: buffer capacity; config_sizes: knob config -> bytes
        per chunk (the profile's `size` column, D9)."""
        self.space = float(space_bytes)
        self.config_sizes = dict(config_sizes)
        self.interval = interval
        self.obj_sizes: list[float] = []
        self.obj_times: list[float] = []
        max_size = max(self.config_sizes.values())
        self.time_cap = self.space / (max_size / interval)
        self.overflowed = False

    def computed_plan(self) -> None:
        """Charge the planner's runtime to the queue head (C2 just ran)."""
        if self.obj_times:
            self.obj_times[0] += PLANNER_RUNTIME

    def fits(self, runtime: float) -> bool:
        """Would processing a chunk with this runtime keep us under cap?"""
        return sum(self.obj_times) + runtime <= self.time_cap

    def update(self, config: int, runtime: float) -> float:
        """Enqueue one chunk processed with `config`, drain one tick of
        work; returns remaining byte space (negative ⇒ overflow)."""
        self.obj_sizes.append(self.config_sizes[config])
        self.obj_times.append(float(runtime))

        processed = self.interval
        while processed > 0 and self.obj_sizes:
            if processed >= self.obj_times[0]:
                processed -= self.obj_times[0]
                self.obj_times.pop(0)
                self.obj_sizes.pop(0)
            else:
                new_time = self.obj_times[0] - processed
                self.obj_sizes[0] *= new_time / self.obj_times[0]
                self.obj_times[0] = new_time
                break

        space_used = sum(self.obj_sizes)
        if space_used > self.space:
            self.overflowed = True
        return self.space - space_used

    def lag_seconds(self) -> float:
        """Current queued work — the streaming watermark-lag analog."""
        return sum(self.obj_times)
