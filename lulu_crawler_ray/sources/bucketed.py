"""Bucketed, resumable parquet sink (SURVEY.md §2.1 / §4.4).

Generalizes the crawl's wave-partitioned + manifest-sealed output
layout into a reusable sink: rows hash-bucket by a key column, the
grouped shuffle co-locates each bucket, and every bucket writes its own
``bucket=NNNN/data.parquet`` followed by a ``.done`` marker. A re-run
of the same write skips buckets whose marker exists — the resume unit
is the bucket, so a failed 100-TB job redoes only unfinished key
ranges, never one giant file. Co-location is the contract downstream:
ALL rows of a key live in exactly one bucket dir, so per-bucket
grouped ops need no further shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_MIX = np.uint64(0x9E3779B97F4A7C15)


def bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket id per int key — Fibonacci multiplicative
    hash (builtin hash() is per-process salted; plain ``% n`` aliases
    structured keys)."""
    return (
        ((keys.astype(np.uint64) * _MIX) >> np.uint64(32)) % np.uint64(num_buckets)
    ).astype(np.int64)


def write_bucketed(ds, out_dir: str, key: str, num_buckets: int = 64) -> dict:
    """Write ``ds`` hash-bucketed by int column ``key``. Returns
    {"written": n, "skipped": n}. Idempotent: re-running after a crash
    rewrites only buckets without a ``.done`` marker (bucket content is
    a deterministic function of the input, so a partial earlier run
    never leaves a wrong sealed bucket — only unsealed ones, which are
    overwritten)."""
    os.makedirs(out_dir, exist_ok=True)
    done = {
        int(d.split("=")[1])
        for d in os.listdir(out_dir)
        if d.startswith("bucket=")
        and os.path.exists(os.path.join(out_dir, d, ".done"))
    }

    def add_bucket(t: pa.Table) -> pa.Table:
        b = bucket_of(t[key].to_numpy(), num_buckets)
        return t.append_column("__bucket", pa.array(b))

    def write_group(t: pa.Table) -> pa.Table:
        b = int(t["__bucket"][0].as_py())
        if b in done:  # sealed by a previous run — resume skips it
            return pa.table({"bucket": pa.array([b], pa.int64()),
                             "rows": pa.array([0], pa.int64()),
                             "skipped": pa.array([True])})
        d = os.path.join(out_dir, f"bucket={b:04d}")
        os.makedirs(d, exist_ok=True)
        t = t.drop_columns(["__bucket"])
        pq.write_table(t, os.path.join(d, "data.parquet"))
        with open(os.path.join(d, ".done"), "w") as f:
            f.write(str(t.num_rows))
        return pa.table({"bucket": pa.array([b], pa.int64()),
                         "rows": pa.array([t.num_rows], pa.int64()),
                         "skipped": pa.array([False])})

    stats = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(write_group, batch_format="pyarrow")
        .to_pandas()
    )
    return {
        "written": int((~stats["skipped"]).sum()),
        "skipped": int(stats["skipped"].sum()),
        "rows": int(stats["rows"].sum()),
    }


def read_bucketed(out_dir: str, columns: list[str] | None = None):
    """Read a bucketed sink back as one Dataset (bucket dirs are plain
    parquet; a per-bucket consumer instead globs one ``bucket=NNNN``)."""
    import ray.data

    paths = sorted(
        os.path.join(out_dir, d, "data.parquet")
        for d in os.listdir(out_dir)
        if d.startswith("bucket=")
        and os.path.exists(os.path.join(out_dir, d, ".done"))
    )
    ds = ray.data.read_parquet(paths, columns=columns)
    if columns is None:
        # drop the hive-inferred bucket=NNNN path column — the layout
        # detail, not the data
        ds = ds.map_batches(
            lambda t: t.drop_columns(["bucket"]) if "bucket" in t.column_names else t,
            batch_format="pyarrow",
        )
    return ds
