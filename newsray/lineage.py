"""Lineage/metrics collector actor (north_rule: per-partition lineage +
metrics). Stage functions push ONE batched increment RPC per batch and
``ray.get`` it before returning, so by the time the enclosing execution's
materialize barrier completes every increment is durable — the driver's
``wave_totals`` read cannot race ahead of in-flight counts."""

from __future__ import annotations

from collections import defaultdict

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self) -> None:
        self.counters: dict = defaultdict(int)

    def incr(self, wave: int, name: str, n: int) -> None:
        self.counters[(wave, name)] += n

    def incr_many(self, wave: int, counts: dict) -> None:
        for name, n in counts.items():
            self.counters[(wave, name)] += n

    def snapshot(self) -> dict:
        return {f"{w}:{n}": v for (w, n), v in sorted(self.counters.items())}

    def wave_totals(self, wave: int) -> dict:
        return {n: v for (w, n), v in self.counters.items() if w == wave}
