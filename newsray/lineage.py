"""Lineage/metrics collector actor (north_rule: per-partition lineage +
metrics). Stage functions push counter increments fire-and-forget (one tiny
RPC per batch); the driver folds the totals into each wave's checkpoint
manifest and the run report."""

from __future__ import annotations

from collections import defaultdict

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self) -> None:
        self.counters: dict = defaultdict(int)

    def incr(self, wave: int, name: str, n: int) -> None:
        self.counters[(wave, name)] += n

    def snapshot(self) -> dict:
        return {f"{w}:{n}": v for (w, n), v in sorted(self.counters.items())}

    def wave_totals(self, wave: int) -> dict:
        return {n: v for (w, n), v in self.counters.items() if w == wave}
