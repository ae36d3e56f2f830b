"""Crawl policy shared by the Ray pipeline and the sequential oracle.

Frozen-now, politeness delays, robots disallow rules and per-host fetch
budgets are all explicit parameters (never wall clock / global state), which
is what makes crawl equality reproducible (SURVEY.md §7.5.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from .datefns import DEFAULT_NOW


@dataclass(frozen=True)
class CrawlPolicy:
    now: datetime = DEFAULT_NOW
    # robots: path prefixes disallowed on every host (per-host overrides via map)
    robots_disallow: tuple[str, ...] = ("/priv/",)
    robots_disallow_per_host: dict[str, tuple[str, ...]] = field(default_factory=dict)
    # per-host fetch budget per run (None = unlimited, the reference-equivalent)
    host_budget: int | None = None
    max_waves: int = 16

    def allowed(self, host: str, path: str) -> bool:
        for pref in self.robots_disallow:
            if path.startswith(pref):
                return False
        for pref in self.robots_disallow_per_host.get(host, ()):
            if path.startswith(pref):
                return False
        return True
