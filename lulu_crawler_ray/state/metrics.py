"""Per-crawl metrics actor (A5) — BASELINE.json:6 "per-partition
lineage + metrics". Stages fire-and-forget batched increments; the
driver snapshots per wave into the checkpoint manifest."""

from __future__ import annotations

from collections import defaultdict

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self._c: dict[str, int] = defaultdict(int)

    def incr(self, counts: dict[str, int]) -> None:
        for k, v in counts.items():
            self._c[k] += v

    def snapshot(self) -> dict[str, int]:
        return dict(self._c)

    def reset(self, counts: dict[str, int] | None = None) -> None:
        self._c = defaultdict(int)
        if counts:
            self._c.update(counts)
