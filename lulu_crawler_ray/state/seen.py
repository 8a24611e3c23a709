"""Sharded cuckoo-filter URL-seen set (A1) — BASELINE.json:6
"sharded cuckoo-filter URL-seen set (canonicalized + SHA-1-hashed URLs,
10^10-entry capacity) held in actor-pool stages ... range-partitioned by
host-hash".

Shard k owns the host_hash range [k * 2^64 / K, (k+1) * 2^64 / K): all
URLs of one host land on one shard, so a host's admission decisions are
serialized through a single actor (single-threaded per shard => no
races). The dedup stage is a *semi-join against actor state*, not a Ray
shuffle: tasks sub-batch their rows per shard and make one admit() call
per shard per batch (SURVEY.md §2.3 A1).

Exactness: the crawl's seen-set equality criterion is exact
(BASELINE.json:6), so the cuckoo filter screens lookups ("definitely
not seen" fast path) and an exact fingerprint store settles
filter-positive probes. In this sandbox the exact store is an in-memory
set (20 B/key); at 10^10 scale it becomes per-shard sorted spill runs
on local disk, probed only at the cuckoo's ~2^-13 false-positive rate —
i.e. ~10^-4 of lookups touch disk. Namespaces separate URL-seen from
image-seen ("url" / "img").
"""

from __future__ import annotations

import os
import pickle

import ray

from ..functions.cuckoo import CuckooFilter


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One seen-set shard; admit() is the only hot-path method."""

    def __init__(self, shard_id: int, capacity: int = 1 << 20):
        self.shard_id = shard_id
        self.capacity = capacity
        self._filters: dict[str, CuckooFilter] = {}
        self._exact: dict[str, set[bytes]] = {}
        self._delta: dict[str, list[bytes]] = {}  # keys since last checkpoint

    def _ns(self, ns: str) -> tuple[CuckooFilter, set]:
        if ns not in self._filters:
            self._filters[ns] = CuckooFilter(self.capacity, seed=self.shard_id)
            self._exact[ns] = set()
        return self._filters[ns], self._exact[ns]

    def admit(self, ns: str, keys: list[bytes]) -> list[bool]:
        """For each key: True (first sighting, now marked seen) or False
        (already seen). Exact — a VECTORIZED cuckoo screen resolves the
        (typical) definitely-new majority in one pass; only
        filter-positive keys touch the exact store. Duplicate keys
        WITHIN one call are handled exactly too (the screen is computed
        before any insert, so a per-call set tracks same-batch admits)."""
        filt, exact = self._ns(ns)
        delta = self._delta.setdefault(ns, [])
        maybe = filt.contains_many_np(keys)
        out = []
        batch_new: set[bytes] = set()
        for k, m in zip(keys, maybe):
            if (m and k in exact) or k in batch_new:
                out.append(False)
            else:
                filt.add(k)
                exact.add(k)
                delta.append(k)
                batch_new.add(k)
                out.append(True)
        return out

    def contains(self, ns: str, keys: list[bytes]) -> list[bool]:
        filt, exact = self._ns(ns)
        return [(k in filt and k in exact) for k in keys]

    def count(self, ns: str) -> int:
        return len(self._exact.get(ns, ()))

    def dump_keys(self, ns: str) -> list[bytes]:
        """Sorted key dump — small-scale/debug form (whole shard through
        one RPC). The T5 finalize uses dump_parquet instead."""
        return sorted(self._exact.get(ns, ()))

    def dump_parquet(self, ns: str, path: str) -> int:
        """T5 spill: write this shard's keys, sorted by sha1, to its own
        parquet file — the keys never pass through the driver (at 10^10
        URLs the union is ~200 GB; per-shard spill keeps finalize
        parallel and driver-memory-flat). Atomic via tmp+rename."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        keys = sorted(self._exact.get(ns, ()))
        t = pa.table({"url_sha1": pa.array(keys, pa.binary(20))})
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return len(keys)

    # -- checkpoint (S5): INCREMENTAL — each wave's file holds only the
    # keys admitted since the previous checkpoint, so per-wave IO scales
    # with new URLs, not total seen-set size; restore replays the delta
    # chain and rebuilds the cuckoo filter from the exact keys. A FULL
    # snapshot (``full=True``, written on frontier-compaction waves)
    # contains the whole store and resets the replay chain — restore
    # cost stays bounded by the compaction cadence instead of growing
    # with crawl length.
    def checkpoint(self, path: str, full: bool = False) -> int:
        tmp = path + ".tmp"
        src = self._exact if full else self._delta
        payload = {ns: (len(ks), b"".join(sorted(ks) if full else ks)) for ns, ks in src.items()}
        with open(tmp, "wb") as f:
            pickle.dump(
                {"shard_id": self.shard_id, "capacity": self.capacity, "delta": payload},
                f,
                protocol=pickle.HIGHEST_PROTOCOL,
            )
        os.replace(tmp, path)
        self._delta = {}
        return sum(len(s) for s in self._exact.values())

    def restore(self, paths: list[str] | str) -> None:
        """Replay the delta chain (all sealed checkpoints, in wave
        order) into fresh state."""
        if isinstance(paths, str):
            paths = [paths]
        self._filters, self._exact, self._delta = {}, {}, {}
        for path in paths:
            with open(path, "rb") as f:
                st = pickle.load(f)
            self.shard_id = st["shard_id"]
            self.capacity = st["capacity"]
            for ns, (n, blob) in st["delta"].items():
                filt, exact = self._ns(ns)
                keys = [blob[i * 20 : (i + 1) * 20] for i in range(n)]
                exact.update(keys)
                filt.add_many(keys)  # vectorized bulk insert


def load_seen(out_dir: str):
    """Audit reader for the T5 spill: the sha1-sorted union of the
    per-shard files under ``out_dir``/seen/. Shards partition by
    host_hash (NOT sha1), so the global sha1 order needs a merge — done
    eagerly here because audits run at result scale; a 10^10-key audit
    would instead compare per-shard files pairwise (the shard layout is
    a pure function of (key, num_shards)) or run a distributed sort."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    t = pads.dataset(os.path.join(out_dir, "seen"), format="parquet").to_table()
    return t.take(pc.sort_indices(t, sort_keys=[("url_sha1", "ascending")]))


def shard_of(host_hash: int, num_shards: int) -> int:
    """Range partition of the uint64 host-hash space."""
    return min(num_shards - 1, host_hash * num_shards >> 64)


def make_shards(num_shards: int, capacity_per_shard: int = 1 << 20) -> list:
    return [
        SeenShard.options(max_restarts=0).remote(k, capacity_per_shard)
        for k in range(num_shards)
    ]
