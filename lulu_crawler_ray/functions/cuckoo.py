"""Cuckoo filter — the 10^10-capacity URL-seen structure (BASELINE.json:6
"sharded cuckoo-filter URL-seen set ... 10^10-entry capacity").

Design (SURVEY.md §5.3 capacity math): 4-way buckets, 16-bit
fingerprints => ~2.1 bytes/entry at 0.95 load; 10^10 entries ~= 25 GB
across K=64 shards (~400 MB each) — each shard's table is a single
numpy uint16 array, serializable for checkpoints.

The filter answers "definitely not seen" with zero false negatives and
false-positive rate ~ 2^-13 at 4x16-bit. Because the crawl's seen-set
equality criterion is EXACT (BASELINE.json:6), the owning shard actor
pairs the filter with an exact fingerprint store consulted only on
filter-positive probes (state/seen.py) — the filter screens ~all
lookups, the exact store settles the rare positives.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MAX_KICKS = 500

_FP_HASH_TABLE: np.ndarray | None = None


def _fp_hash_table() -> np.ndarray:
    """uint64 sha1-prefix for every 16-bit fingerprint — precomputed
    once per process so the alt-index computation vectorizes."""
    global _FP_HASH_TABLE
    if _FP_HASH_TABLE is None:
        t = np.empty(1 << 16, np.uint64)
        for fp in range(1 << 16):
            t[fp] = int.from_bytes(
                hashlib.sha1(fp.to_bytes(2, "big")).digest()[:8], "big"
            )
        _FP_HASH_TABLE = t
    return _FP_HASH_TABLE


class CuckooFilter:
    """4-way, 16-bit-fingerprint cuckoo filter over 20-byte keys."""

    def __init__(self, capacity: int, seed: int = 0):
        nb = 1
        while nb * 4 < capacity / 0.95:
            nb *= 2
        self.nbuckets = nb
        self.table = np.zeros((nb, 4), np.uint16)  # 0 == empty slot
        self.size = 0
        self._rng = np.random.default_rng(seed)  # eviction-slot choice only

    # -- hashing ---------------------------------------------------------
    def _fp_and_index(self, key: bytes) -> tuple[int, int]:
        h = hashlib.sha1(key).digest() if len(key) != 20 else key
        fp = int.from_bytes(h[0:2], "big") or 1  # fingerprint never 0
        i1 = int.from_bytes(h[2:10], "big") % self.nbuckets
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        # partial-key cuckoo: i2 = i XOR hash(fp)
        fp_h = int.from_bytes(hashlib.sha1(fp.to_bytes(2, "big")).digest()[:8], "big")
        return (i ^ fp_h) % self.nbuckets

    # -- ops -------------------------------------------------------------
    def add(self, key: bytes) -> bool:
        fp, i1 = self._fp_and_index(key)
        return self._add_fp(fp, i1)

    def _add_fp(self, fp: int, i1: int) -> bool:
        i2 = self._alt_index(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.size += 1
                return True
        # evict
        i = i1 if (self._rng.integers(2) == 0) else i2
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(4))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._alt_index(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                self.size += 1
                return True
        return False  # table effectively full

    def add_many(self, keys: list[bytes]) -> None:
        """Bulk insert of 20-byte keys — the checkpoint-restore fast
        path. Bucket rows are dense-prefix by construction (add fills
        the first empty slot, eviction swaps in place, no deletes), so
        keys whose primary bucket has room scatter in ONE vectorized
        pass (slot = occupancy + within-bucket position); only bucket-
        overflow keys fall back to the per-key cuckoo walk."""
        if not keys:
            return
        fp, i1 = self._fp_i1_many(keys)
        order = np.argsort(i1, kind="stable")
        fi, ii = fp[order].astype(np.uint16), i1[order]
        starts = np.r_[True, ii[1:] != ii[:-1]]
        gid = np.cumsum(starts) - 1
        pos = np.arange(len(ii)) - np.flatnonzero(starts)[gid]
        occ = (self.table[ii] != 0).sum(axis=1)
        slot = occ + pos
        ok = slot < 4
        self.table[ii[ok], slot[ok]] = fi[ok]
        self.size += int(ok.sum())
        for j in np.flatnonzero(~ok):
            self._add_fp(int(fi[j]), int(ii[j]))

    def __contains__(self, key: bytes) -> bool:
        fp, i1 = self._fp_and_index(key)
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def contains_many(self, keys: list[bytes]) -> np.ndarray:
        return np.fromiter((k in self for k in keys), bool, count=len(keys))

    # -- vectorized lookup (the A1 admit hot path at 10^10 scale) --------
    def _fp_i1_many(self, keys: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized (fingerprint, primary index) — bit-identical to
        _fp_and_index for 20-byte keys."""
        arr = np.frombuffer(b"".join(keys), np.uint8).reshape(-1, 20)
        fp = (arr[:, 0].astype(np.uint16) << np.uint16(8)) | arr[:, 1]
        fp[fp == 0] = 1
        i1 = np.zeros(len(keys), np.uint64)
        for b in range(2, 10):
            i1 = (i1 << np.uint64(8)) | arr[:, b].astype(np.uint64)
        return fp, (i1 % np.uint64(self.nbuckets)).astype(np.int64)

    def contains_many_np(self, keys: list[bytes]) -> np.ndarray:
        """Vectorized membership over 20-byte keys: two fancy-indexed
        bucket gathers instead of per-key sha1 calls."""
        if not keys:
            return np.zeros(0, bool)
        fp, i1 = self._fp_i1_many(keys)
        i2 = (
            (i1.astype(np.uint64) ^ _fp_hash_table()[fp.astype(np.intp)])
            % np.uint64(self.nbuckets)
        ).astype(np.int64)
        m1 = (self.table[i1] == fp[:, None]).any(axis=1)
        m2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return m1 | m2

    # -- checkpoint ------------------------------------------------------
    def dump(self) -> bytes:
        return self.nbuckets.to_bytes(8, "big") + self.size.to_bytes(8, "big") + self.table.tobytes()

    @classmethod
    def load(cls, data: bytes, seed: int = 0) -> "CuckooFilter":
        nb = int.from_bytes(data[:8], "big")
        obj = cls.__new__(cls)
        obj.nbuckets = nb
        obj.size = int.from_bytes(data[8:16], "big")
        obj.table = np.frombuffer(data, np.uint16, offset=16).reshape(nb, 4).copy()
        obj._rng = np.random.default_rng(seed)
        return obj
