"""Declared Arrow schemas — the single source of truth (SURVEY.md §1.1/§1.4).

Every stage validates its batch schema against these; the
equality-vs-oracle tests are byte-level, so silent widening would
produce false diffs.
"""

from __future__ import annotations

import pyarrow as pa

# T1 — frontier row (the unit flowing between crawl stages)
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("url_sha1", pa.binary(20)),  # SHA-1 of canonical URL (BASELINE.json:6)
        ("host", pa.string()),
        ("host_hash", pa.uint64()),  # range-partitioning key (BASELINE.json:6)
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("seq", pa.int64()),  # deterministic discovery sequence (SURVEY §3.2.3)
        ("parent_sha1", pa.binary(20)),
        ("wave", pa.int32()),
    ]
)

# T2 — fetch result = FRONTIER + rank + fetch columns
FETCHED = pa.schema(
    list(FRONTIER)
    + [
        ("rank", pa.int64()),
        ("status", pa.int32()),
        ("content_type", pa.string()),
        ("body", pa.binary()),
    ]
)

# refs — parse/extract output (links and image refs, unified)
REFS = pa.schema(
    [
        ("kind", pa.string()),  # "link" | "image"
        ("url", pa.string()),  # canonical absolute target
        ("url_sha1", pa.binary(20)),
        ("host", pa.string()),
        ("host_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("seq", pa.int64()),  # (rank+1)*L + position-in-document
        ("parent_sha1", pa.binary(20)),
        ("wave", pa.int32()),
        ("caption", pa.string()),  # alt text for images, anchor text for links
    ]
)

# T3 — image output table: exactly input_hint (BASELINE.json:15)
IMAGE_TABLE = pa.schema(
    [
        ("image_id", pa.string()),  # hex SHA-1 of canonical image URL
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),  # "raw" | "ppm" | "png"
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# T4 — crawl-order ledger (compared byte-for-byte vs the oracle).
# parent_sha1/depth are the durable per-rank fetch lineage
# (BASELINE.json:6 "fetch lineage"): every fetched URL records which
# page discovered it.
LEDGER = pa.schema(
    [
        ("rank", pa.int64()),
        ("url", pa.string()),
        ("url_sha1", pa.binary(20)),
        ("wave", pa.int32()),
        ("host", pa.string()),
        ("seq", pa.int64()),
        ("parent_sha1", pa.binary(20)),
        ("depth", pa.int32()),
    ]
)

# T5 — URL-seen dump: sorted url_sha1 (the auditable form of the cuckoo set)
SEEN_DUMP = pa.schema([("url_sha1", pa.binary(20))])


def check(table: pa.Table, schema: pa.Schema, stage: str) -> pa.Table:
    """Assert a batch matches its declared schema (cheap equality check)."""
    if not table.schema.equals(schema):
        raise TypeError(
            f"stage {stage}: schema mismatch\n  got: {table.schema}\n  want: {schema}"
        )
    return table
