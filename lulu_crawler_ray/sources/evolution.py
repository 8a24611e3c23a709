"""Schema-evolution-tolerant parquet scan: read a directory whose
older files predate a later-added column as ONE Dataset with the
UNION schema (missing columns fill with nulls) — the lake-format
migration read every long-lived corpus eventually needs (new crawl
waves gain columns; historical shards must stay readable in the same
scan). Ray's read_parquet infers the schema from the first fragment,
so a bare read either drops the new column or fails depending on file
order; this helper makes the union explicit and deterministic.

No reference file:line citations are possible — /root/reference is
empty (SURVEY.md §0)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def list_parquet_files(root: str) -> list[str]:
    out: list[str] = []
    for base, _dirs, files in os.walk(root):
        for f in sorted(files):
            if f.endswith(".parquet"):
                out.append(os.path.join(base, f))
    return sorted(out)


def unified_schema(files: list[str]) -> pa.Schema:
    """Footer-only scan (no data IO): unify every file's schema. Raises
    on true type CONFLICTS (same column, incompatible types) — schema
    evolution adds columns, it does not reinterpret them."""
    return pa.unify_schemas([pq.read_schema(f) for f in files])


def read_parquet_union(root: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a mixed-schema parquet tree under the union schema; files
    missing a column yield typed nulls for it. Column pruning still
    pushes down (the union schema is projected before the read)."""
    files = list_parquet_files(root)
    schema = unified_schema(files)
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return ray.data.read_parquet(files, schema=schema, columns=columns)
