"""Crawl-output analytics (G1/G2 — per-host counts driving hot-domain
monitoring, per-wave histograms) over a finished crawl's T4 ledger."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from .relational import grouped_agg


def ledger_dataset(out_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{out_dir}/ledger", partitioning=None)


def host_counts(out_dir: str, top_k: int | None = None) -> pa.Table:
    """G1 — fetched URLs per host (the skew monitor feeding hot-domain
    handling, SURVEY.md §4.3); optional O2 top-k by count."""
    ds = grouped_agg(
        ledger_dataset(out_dir).select_columns(["host"]),
        ["host"],
        [("n", "count", None)],
    )
    t = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=65536))
        or [pa.table({"host": pa.array([], pa.string()), "n": pa.array([], pa.int64())})]
    )
    import pyarrow.compute as pc

    t = t.take(pc.sort_indices(t, sort_keys=[("n", "descending"), ("host", "ascending")]))
    return t.slice(0, top_k) if top_k else t


def wave_histogram(out_dir: str) -> pa.Table:
    """G2 — fetched URLs per wave."""
    ds = grouped_agg(
        ledger_dataset(out_dir).select_columns(["wave"]),
        ["wave"],
        [("n", "count", None)],
    )
    t = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=65536))
        or [pa.table({"wave": pa.array([], pa.int32()), "n": pa.array([], pa.int64())})]
    )
    import pyarrow.compute as pc

    return t.take(pc.sort_indices(t, sort_keys=[("wave", "ascending")]))
