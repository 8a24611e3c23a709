"""S1 — seed-list readers: text (one URL per line) or parquet with a
``url`` column -> T1 frontier rows in file order (SURVEY.md §2.1)."""

from __future__ import annotations

import pyarrow.dataset as pads

from ..config import CrawlConfig


def read_seed_list(path: str) -> list[str]:
    """Load seed URLs preserving file order (seq = file order is the
    §3.2.2 seed semantic, so ordering here is load-bearing)."""
    if path.endswith(".parquet"):
        t = pads.dataset(path, format="parquet").to_table(columns=["url"])
        return t["url"].to_pylist()
    with open(path) as f:
        return [line.strip() for line in f if line.strip() and not line.startswith("#")]


def seeds_dataset(path: str, cfg: CrawlConfig):
    """Seed file -> T1 frontier Dataset (for standalone inspection; the
    crawl itself admits seeds driver-side — pipelines/crawl.py)."""
    import ray.data

    from ..stages.crawl_stages import seeds_to_frontier

    return ray.data.from_arrow(seeds_to_frontier(read_seed_list(path), cfg))
