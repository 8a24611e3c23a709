"""User-extension surface (SURVEY.md §2.9): PipelineStep protocol and a
config-driven step chain — the seam where the reference's site-specific
spiders live (pluggable parser / priority / url-filter / fetcher).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Protocol, runtime_checkable

import pyarrow as pa
import ray.data


@runtime_checkable
class PipelineStep(Protocol):
    """One named transform over a Dataset with declared schemas."""

    name: str
    schema_in: pa.Schema | None
    schema_out: pa.Schema | None

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset: ...


@dataclass
class MapBatchesStep:
    """The workhorse step: a vectorized Arrow-batch function, with
    optional schema validation on entry (cheap equality check,
    SURVEY.md §1.4)."""

    name: str
    fn: Callable[[pa.Table], pa.Table]
    schema_in: pa.Schema | None = None
    schema_out: pa.Schema | None = None
    batch_size: int | None = None
    concurrency: int | None = None

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        fn, schema_in, name = self.fn, self.schema_in, self.name

        def run(t: pa.Table) -> pa.Table:
            if schema_in is not None and not t.schema.equals(schema_in):
                raise TypeError(f"step {name}: schema mismatch: {t.schema}")
            return fn(t)

        kwargs: dict = {"batch_format": "pyarrow"}
        if self.batch_size is not None:
            kwargs["batch_size"] = self.batch_size
        if self.concurrency is not None:
            kwargs["concurrency"] = self.concurrency
        return ds.map_batches(run, **kwargs)


def run_chain(ds: ray.data.Dataset, steps: list[PipelineStep]) -> ray.data.Dataset:
    """reader -> transform-chain -> (caller-owned writer)."""
    for step in steps:
        ds = step.apply(ds)
    return ds


# ── pluggable crawl hooks (SURVEY.md §2.9): the CrawlConfig carries the
# priority function; the Fetcher seam lives here.
@runtime_checkable
class Fetcher(Protocol):
    """A fetch stage: T1-ranked batch in, T2 batch out. The crawl uses
    stages.crawl_stages.PageFetcher (synthetic); a real deployment drops
    in an HTTP implementation with the same shape."""

    def __call__(self, t: pa.Table) -> pa.Table: ...


class HttpFetcher:
    """Live-web fetcher stub — this sandbox has no network, so the
    constructor raises; the class documents the exact seam (same
    __call__ contract as PageFetcher, held in an actor pool with a
    connection pool in __init__)."""

    def __init__(self, *, timeout_s: float = 10.0, max_connections: int = 64):
        raise NotImplementedError(
            "no network in this sandbox — implement with aiohttp/httpx; "
            "__call__(T1 batch + rank) -> T2 batch (status, content_type, body)"
        )
