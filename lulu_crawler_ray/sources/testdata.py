"""S7 — driver-provided TPC-H-ish harness tables (TESTDATA.md)."""

from __future__ import annotations

import ray.data

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned parquet read of one harness table."""
    if name not in TABLES:
        raise KeyError(name)
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def table_rows(sf_dir: str, name: str) -> int:
    """Row count straight from parquet footer metadata (microseconds,
    no scan) — used to size shuffle partition counts to the data
    instead of a CPU-count constant."""
    import pyarrow.parquet as pq

    if name not in TABLES:
        raise KeyError(name)
    return pq.ParquetFile(f"{sf_dir}/{name}.parquet").metadata.num_rows


def read_table_filtered(
    sf_dir: str, name: str, columns: list[str] | None, filter_expr
) -> ray.data.Dataset:
    """Predicate-pushdown read: the pyarrow expression reaches the
    parquet scanner, so row groups whose min/max statistics exclude
    the predicate never leave storage — at 100 TB the difference
    between scanning a date range and scanning the table. Use for
    selective scans; `filter_expr` is a pyarrow.dataset expression
    (e.g. pc.field("o_orderdate") >= pa.scalar(ts))."""
    if name not in TABLES:
        raise KeyError(name)
    return ray.data.read_parquet(
        f"{sf_dir}/{name}.parquet", columns=columns, filter=filter_expr
    )
