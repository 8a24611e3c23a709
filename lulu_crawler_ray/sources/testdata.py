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
