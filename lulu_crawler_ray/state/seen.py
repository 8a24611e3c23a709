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
filter-positive probes. The exact store (SpillExactStore) is
SPILL-BACKED: an in-memory buffer of at most ``buffer_max`` keys that
flushes as immutable sha1-SORTED RUNS to local disk (numpy |S20
memmaps), probed by vectorized binary search — and probed only at the
cuckoo's ~2^-13 false-positive rate, i.e. ~10^-4 of lookups touch
disk at all. No run merging is needed: runs per shard stay bounded by
total/buffer (10^10/64 shards at a 2^20 buffer = ~150 runs), and a
probe costs runs x O(log) page touches at the FP rate. Memory per
shard is buffer + cuckoo table, independent of crawl length — the
executable form of the 10^10-entry capacity claim. Namespaces
separate URL-seen from image-seen ("url" / "img").
"""

from __future__ import annotations

import os
import pickle
import shutil
import tempfile

import numpy as np
import ray

from ..functions.cuckoo import CuckooFilter


class SpillExactStore:
    """Exact byte-key membership with bounded memory (see module doc).

    Contract: ``add_many`` is only called with keys KNOWN to be absent
    (the shard's admit path establishes this: cuckoo has no false
    negatives, so any present key is filter-positive and settled by
    ``contains_many`` first) — so inserts never probe disk.
    """

    KEY = 20  # sha1 bytes

    def __init__(self, spill_dir: str, buffer_max: int = 1 << 18):
        os.makedirs(spill_dir, exist_ok=True)
        self.dir = spill_dir
        self.buffer_max = max(int(buffer_max), 1)
        self.buf: set[bytes] = set()
        self._mm: list[np.ndarray] = []  # sorted |S20 memmaps, oldest first
        self.n = 0

    def _flush(self) -> None:
        if not self.buf:
            return
        arr = np.array(sorted(self.buf), dtype="|S20")
        p = os.path.join(self.dir, f"run-{len(self._mm):05d}.npy")
        tmp = p + ".tmp.npy"
        np.save(tmp, arr)
        os.replace(tmp, p)
        self._mm.append(np.load(p, mmap_mode="r"))
        self.buf.clear()

    def add_many(self, keys) -> None:
        """Bulk insert of known-absent keys; flushes whenever the
        buffer reaches buffer_max (chunked so peak memory stays at one
        buffer even for a huge restore replay)."""
        it = iter(keys)
        while True:
            room = self.buffer_max - len(self.buf)
            chunk = [k for _, k in zip(range(room), it)]
            if not chunk:
                break
            self.buf.update(chunk)
            self.n += len(chunk)
            if len(self.buf) >= self.buffer_max:
                self._flush()

    def contains_many(self, keys: list[bytes]) -> np.ndarray:
        out = np.fromiter((k in self.buf for k in keys), bool, len(keys))
        if not self._mm or out.all():
            return out
        arr = np.array(keys, dtype="|S20")
        for mm in self._mm:
            if out.all():
                break
            idx = np.searchsorted(mm, arr)
            idc = np.clip(idx, 0, len(mm) - 1)
            out |= (idx < len(mm)) & (np.asarray(mm)[idc] == arr)
        return out

    def __contains__(self, k: bytes) -> bool:
        return bool(self.contains_many([k])[0])

    def sorted_keys(self) -> list[bytes]:
        """All keys, sha1-sorted — the T5/full-checkpoint finalize path
        (whole-shard by nature; runs hold no duplicates by contract)."""
        parts = [np.array(sorted(self.buf), dtype="|S20")] if self.buf else []
        parts += [np.asarray(mm) for mm in self._mm]
        if not parts:
            return []
        # NOT .tolist(): numpy |S20 strips trailing NUL bytes on the way
        # back to python; slice the raw fixed-width buffer instead
        blob = np.sort(np.concatenate(parts)).tobytes()
        return [blob[i * 20 : (i + 1) * 20] for i in range(len(blob) // 20)]

    def close(self) -> None:
        self._mm = []
        shutil.rmtree(self.dir, ignore_errors=True)


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One seen-set shard; admit() is the only hot-path method."""

    def __init__(
        self, shard_id: int, capacity: int = 1 << 20, buffer_max: int = 1 << 18
    ):
        self.shard_id = shard_id
        self.capacity = capacity
        self.buffer_max = buffer_max
        self._filters: dict[str, CuckooFilter] = {}
        self._exact: dict[str, SpillExactStore] = {}
        self._delta: dict[str, list[bytes]] = {}  # keys since last checkpoint
        self._spill_root = tempfile.mkdtemp(prefix=f"lulu-seen-shard{shard_id}-")

    def _ns(self, ns: str) -> tuple[CuckooFilter, SpillExactStore]:
        if ns not in self._filters:
            self._filters[ns] = CuckooFilter(self.capacity, seed=self.shard_id)
            self._exact[ns] = SpillExactStore(
                os.path.join(self._spill_root, ns), self.buffer_max
            )
        return self._filters[ns], self._exact[ns]

    def admit(self, ns: str, keys: list[bytes]) -> list[bool]:
        """For each key: True (first sighting, now marked seen) or False
        (already seen). Exact — a VECTORIZED cuckoo screen resolves the
        (typical) definitely-new majority in one pass; only
        filter-positive keys probe the (spill-backed) exact store, also
        vectorized. Duplicate keys WITHIN one call are handled exactly
        too (the screen is computed before any insert, so a per-call
        set tracks same-batch admits)."""
        filt, exact = self._ns(ns)
        delta = self._delta.setdefault(ns, [])
        maybe = filt.contains_many_np(keys)
        pos = np.flatnonzero(maybe)
        seen = np.zeros(len(keys), bool)
        if len(pos):
            seen[pos] = exact.contains_many([keys[i] for i in pos])
        fresh = [keys[i] for i in np.flatnonzero(~seen)]
        if len(set(fresh)) == len(fresh):
            # fast path (the wave dedup upstream sends each key once, but
            # exactness is VERIFIED here, not assumed): one vectorized
            # filter insert instead of a per-key add loop — the admit
            # results are identical because they are decided by `seen`
            # alone; filter slot layout only moves the FP rate.
            filt.add_many(fresh)
            delta.extend(fresh)
            exact.add_many(fresh)
            return (~seen).tolist()
        out = []
        fresh = []
        batch_new: set[bytes] = set()
        for k, s in zip(keys, seen):
            if s or k in batch_new:
                out.append(False)
            else:
                filt.add(k)
                fresh.append(k)
                delta.append(k)
                batch_new.add(k)
                out.append(True)
        exact.add_many(fresh)
        return out

    def contains(self, ns: str, keys: list[bytes]) -> list[bool]:
        filt, exact = self._ns(ns)
        maybe = filt.contains_many_np(keys)
        pos = [i for i, m in enumerate(maybe) if m]
        res = np.zeros(len(keys), bool)
        if pos:
            res[pos] = exact.contains_many([keys[i] for i in pos])
        return res.tolist()

    def count(self, ns: str) -> int:
        return self._exact[ns].n if ns in self._exact else 0

    def spill_stats(self, ns: str) -> dict:
        """Test/diagnostic hook: buffer occupancy + run count."""
        if ns not in self._exact:
            return {"buffer": 0, "runs": 0, "n": 0}
        st = self._exact[ns]
        return {"buffer": len(st.buf), "runs": len(st._mm), "n": st.n}

    def dump_keys(self, ns: str) -> list[bytes]:
        """Sorted key dump — small-scale/debug form (whole shard through
        one RPC). The T5 finalize uses dump_parquet instead."""
        return self._exact[ns].sorted_keys() if ns in self._exact else []

    def dump_parquet(self, ns: str, path: str) -> int:
        """T5 spill: write this shard's keys, sorted by sha1, to its own
        parquet file — the keys never pass through the driver (at 10^10
        URLs the union is ~200 GB; per-shard spill keeps finalize
        parallel and driver-memory-flat). Atomic via tmp+rename."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        keys = self._exact[ns].sorted_keys() if ns in self._exact else []
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
        if full:
            payload = {
                ns: (st.n, b"".join(st.sorted_keys())) for ns, st in self._exact.items()
            }
        else:
            payload = {ns: (len(ks), b"".join(ks)) for ns, ks in self._delta.items()}
        with open(tmp, "wb") as f:
            pickle.dump(
                {"shard_id": self.shard_id, "capacity": self.capacity, "delta": payload},
                f,
                protocol=pickle.HIGHEST_PROTOCOL,
            )
        os.replace(tmp, path)
        self._delta = {}
        return sum(st.n for st in self._exact.values())

    def restore(self, paths: list[str] | str) -> None:
        """Replay the delta chain (all sealed checkpoints, in wave
        order) into fresh state. Keys are unique across the chain
        (admits are first-sighting-only and a full snapshot resets it),
        so the replay is a pure bulk insert."""
        if isinstance(paths, str):
            paths = [paths]
        for st in self._exact.values():
            st.close()
        self._filters, self._exact, self._delta = {}, {}, {}
        for path in paths:
            with open(path, "rb") as f:
                st = pickle.load(f)
            self.shard_id = st["shard_id"]
            self.capacity = st["capacity"]
            for ns, (n, blob) in st["delta"].items():
                filt, exact = self._ns(ns)
                keys = [blob[i * 20 : (i + 1) * 20] for i in range(n)]
                exact.add_many(keys)
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


def make_shards(
    num_shards: int, capacity_per_shard: int = 1 << 20, buffer_max: int = 1 << 18
) -> list:
    return [
        SeenShard.options(max_restarts=0).remote(k, capacity_per_shard, buffer_max)
        for k in range(num_shards)
    ]
