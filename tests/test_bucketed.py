"""Bucketed resumable sink (sources/bucketed.py): roundtrip equality,
per-key co-location, and crash-resume bucket skipping."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from lulu_crawler_ray.sources.bucketed import bucket_of, read_bucketed, write_bucketed

SF = "/root/testdata/sf0.001"


def _make_ds(n=5000, seed=3):
    import ray.data

    rng = np.random.default_rng(seed)
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 700, n), pa.int64()),
            "v": pa.array(rng.standard_normal(n)),
        }
    )
    return ray.data.from_arrow(t).repartition(8), t


def test_roundtrip_and_colocation(tmp_path, ray_session):
    ds, t = _make_ds()
    out = str(tmp_path / "b")
    stats = write_bucketed(ds, out, "k", num_buckets=16)
    assert stats["rows"] == t.num_rows and stats["skipped"] == 0
    back = read_bucketed(out).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    want = t.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert back.equals(want)
    # co-location: every key's rows live in exactly ONE bucket dir,
    # and in the dir its hash names
    for d in os.listdir(out):
        if not d.startswith("bucket="):
            continue
        b = int(d.split("=")[1])
        import pyarrow.parquet as pq

        keys = pq.read_table(os.path.join(out, d, "data.parquet"))["k"].to_numpy()
        assert (bucket_of(keys, 16) == b).all()


def test_resume_skips_sealed_buckets(tmp_path, ray_session):
    ds, t = _make_ds()
    out = str(tmp_path / "b")
    write_bucketed(ds, out, "k", num_buckets=16)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    n_buckets = len(dirs)
    # simulate a crash: two buckets never sealed (marker gone, data
    # partial/corrupt)
    for d in dirs[:2]:
        os.remove(os.path.join(out, d, ".done"))
        with open(os.path.join(out, d, "data.parquet"), "w") as f:
            f.write("torn write")
    stats = write_bucketed(ds, out, "k", num_buckets=16)
    assert stats["written"] == 2 and stats["skipped"] == n_buckets - 2
    back = read_bucketed(out).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    want = t.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert back.equals(want)
