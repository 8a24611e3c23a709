"""ImageTableIO — the Lance seam (S2/S3, SURVEY.md §0.2).

The spec'd storage for image+caption rows is a Lance table
(BASELINE.json:14 "over Lance tables of image + caption pairs"); the
``lance`` wheel is not installed in this sandbox and there is no
network, so: write/read Lance when importable, else Parquet at the same
path root with the identical IMAGE_TABLE schema. Call sites never
branch — they use write_images/read_images.
"""

from __future__ import annotations

import importlib.util

import ray.data

LANCE_AVAILABLE = importlib.util.find_spec("lance") is not None


def write_images(ds: ray.data.Dataset, path: str) -> None:
    """Append-style write of T3 rows to ``path`` (one dir per wave —
    the resumable layout of SURVEY.md §4.4)."""
    if LANCE_AVAILABLE:
        ds.write_lance(path)
    else:
        ds.write_parquet(path)


def read_images(path: str) -> ray.data.Dataset:
    if LANCE_AVAILABLE:
        return ray.data.read_lance(path)
    return ray.data.read_parquet(path)
