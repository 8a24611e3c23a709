"""Durable, bucket-partitioned ANN index artifact (the 100-TB index
shape): the exploded (bucket/cid, vec_id, emb-blob) index is written
ONCE as hive-partitioned parquet — ``<root>/data/shard=K/*.parquet`` —
with a sealed ``manifest.json``, so

- a probe computes its target buckets -> target shards -> READS only
  those shard directories (IO pruning at read time; round 2 scanned
  every index block and masked with np.isin — compute was pruned, IO
  was not), then masks within-shard rows by exact bucket as before;
- the index survives the Ray session (round 2's materialized Dataset
  died with it): a rebuild request with a matching manifest digest is
  a pure load, and the whole artifact is resumable/shippable like any
  other parquet table.

The manifest (written last, atomic rename) is the commit record, same
discipline as the crawl checkpoints (SURVEY.md §4.4).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable

import numpy as np
import ray.data

_DEFAULT_ROOT = "/tmp/lulu_ann_index"


def _shard_of(keys: np.ndarray, n_shards: int, identity: bool) -> np.ndarray:
    """Shard id per bucket key. Identity for dense small key spaces
    (IVF cids 0..k-1); Fibonacci multiplicative hash otherwise (LSH
    bucket ids are structured — table<<32 | bits — and a plain modulus
    would alias whole tables onto few shards)."""
    k = keys.astype(np.uint64)
    if identity:
        return (k % np.uint64(n_shards)).astype(np.int64)
    return (
        ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) % np.uint64(n_shards)
    ).astype(np.int64)


class BucketIndexArtifact:
    """A parquet index partitioned by a shard of its bucket key.

    ``build_or_load`` is the only constructor path: if ``root`` holds a
    sealed manifest whose digest matches, the build function is never
    called (cross-session durability); otherwise the exploded index
    dataset is written hive-partitioned and the manifest sealed.
    """

    def __init__(self, root: str, key_col: str, n_shards: int, identity: bool):
        self.root = root
        self.key_col = key_col
        self.n_shards = n_shards
        self.identity = identity
        # test/diagnostic hooks: shard dirs touched by the last probe
        self.last_probe_shards: list[int] = []

    # ---------------------------------------------------------------- build
    @classmethod
    def build_or_load(
        cls,
        root: str,
        digest: str,
        key_col: str,
        build_fn: Callable[[], ray.data.Dataset],
        n_shards: int = 32,
        identity: bool = False,
    ) -> tuple["BucketIndexArtifact", bool]:
        """Returns (artifact, built): built=False when a sealed matching
        manifest already existed and the build was skipped."""
        man_path = os.path.join(root, "manifest.json")
        if os.path.exists(man_path):
            with open(man_path) as f:
                man = json.load(f)
            # a matching manifest only counts as sealed if the data dir
            # survived with it — an interrupted rmtree (killed process)
            # can leave manifest.json with data/ already gone, and
            # trusting it would crash the first probe
            if man.get("digest") == digest and os.path.isdir(
                os.path.join(root, "data")
            ):
                return (
                    cls(root, man["key_col"], man["n_shards"], man["identity"]),
                    False,
                )
            shutil.rmtree(root)  # stale or corrupt artifact
        elif os.path.exists(root):
            shutil.rmtree(root)  # unsealed partial build
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

        ds = build_fn()

        def add_shard(t):
            import pyarrow as pa

            keys = t[key_col].to_numpy()
            return t.append_column(
                "shard", pa.array(_shard_of(keys, n_shards, identity))
            )

        ds.map_batches(add_shard, batch_format="pyarrow").write_parquet(
            os.path.join(root, "data"), partition_cols=["shard"]
        )
        man = {
            "digest": digest,
            "key_col": key_col,
            "n_shards": n_shards,
            "identity": identity,
        }
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f)
        os.replace(tmp, man_path)  # seal
        return cls(root, key_col, n_shards, identity), True

    # ---------------------------------------------------------------- probe
    def _shard_dirs(self) -> dict[int, str]:
        base = os.path.join(self.root, "data")
        if not os.path.isdir(base):
            raise ValueError(
                f"index artifact at {self.root} was removed from disk after "
                "this handle was built — rebuild via build_or_load (a cached "
                "index object does not survive artifact cleanup)"
            )
        out = {}
        for d in os.listdir(base):
            if d.startswith("shard="):
                out[int(d.split("=", 1)[1])] = os.path.join(base, d)
        return out

    def read_for(self, buckets: np.ndarray) -> ray.data.Dataset:
        """Dataset over ONLY the shard directories that can contain the
        given bucket keys. Empty probe set -> empty-selecting read of
        one shard (keeps downstream schemas typed)."""
        dirs = self._shard_dirs()
        want = np.unique(_shard_of(np.asarray(buckets, np.int64), self.n_shards, self.identity))
        hit = [s for s in want.tolist() if s in dirs]
        self.last_probe_shards = hit
        # read_parquet with a path LIST wants files, not directories
        def files(d: str) -> list[str]:
            return [
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            ]

        paths = [p for s in hit for p in files(dirs[s])]
        if not paths:  # no shard holds any probed bucket
            self.last_probe_shards = []
            ds = ray.data.read_parquet(files(dirs[min(dirs)]))
            return ds.limit(0)
        return ray.data.read_parquet(paths)

    def num_shards_on_disk(self) -> int:
        return len(self._shard_dirs())
