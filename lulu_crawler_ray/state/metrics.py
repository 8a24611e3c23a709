"""Per-crawl metrics actor (A5) — BASELINE.json:6 "per-partition
lineage + metrics". Stages fire-and-forget batched increments tagged
with the wave whose processing emitted them; the manifest for
enter_wave=W snapshots totals over tags < W — so a background image
sink of wave W-1 (which may finish after the wave's data write) still
lands in the manifest, while the already-overlapping wave W compute
does not (its re-run on resume would double-count otherwise)."""

from __future__ import annotations

from collections import defaultdict

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        # bucket -1 holds untagged/baseline counts (seed admission,
        # restored totals); bucket w holds wave w's increments
        self._w: dict[int, dict[str, int]] = {}

    def incr(self, counts: dict[str, int], wave: int = -1) -> None:
        d = self._w.setdefault(wave, defaultdict(int))
        for k, v in counts.items():
            d[k] += v

    def snapshot(self, upto_wave: int | None = None) -> dict[str, int]:
        """Totals over buckets with wave < upto_wave (None = all)."""
        out: dict[str, int] = defaultdict(int)
        for w, d in self._w.items():
            if upto_wave is None or w < upto_wave:
                for k, v in d.items():
                    out[k] += v
        return dict(out)

    def reset(self, counts: dict[str, int] | None = None) -> None:
        self._w = {}
        if counts:
            self._w[-1] = defaultdict(int, counts)
