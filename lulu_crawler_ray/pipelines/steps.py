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
    """Live-web fetcher over stdlib urllib — the real implementation of
    the Fetcher seam (same __call__ contract as the synthetic
    PageFetcher: T1-ranked batch in, T2 batch out). Held in an actor
    pool: the opener is built once per actor in __init__.

    Semantics (tested against an in-process localhost server — the
    sandbox has no external network, but loopback sockets work):
      - per-request ``timeout_s``;
      - bounded retries (``max_retries``) with linear backoff on
        connection errors, timeouts, and ``retry_statuses`` (5xx);
      - redirects followed by the opener (urllib default);
      - a non-retryable HTTP error (e.g. 404) is recorded once, its
        status and body kept;
      - a request that exhausts retries records status 0, empty body.
    Exactly one output row per input row in input order — retries are
    WITHIN-stage, so crawl ordering (a pure function of the parsed
    bodies) is unaffected by flaky transports; a permanently failing
    URL yields a 0/None row rather than stalling the wave."""

    def __init__(
        self,
        *,
        timeout_s: float = 10.0,
        max_retries: int = 2,
        backoff_s: float = 0.05,
        retry_statuses: tuple[int, ...] = (500, 502, 503, 504),
        user_agent: str = "lulu-crawler-ray/0.2",
    ):
        import urllib.request

        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.retry_statuses = set(retry_statuses)
        self.opener = urllib.request.build_opener()
        self.opener.addheaders = [("User-Agent", user_agent)]

    def _fetch(self, url: str) -> tuple[int, str, bytes]:
        import time
        import urllib.error

        last: tuple[int, str, bytes] = (0, "", b"")
        for attempt in range(self.max_retries + 1):
            try:
                with self.opener.open(url, timeout=self.timeout_s) as r:
                    return int(r.status), r.headers.get("Content-Type", ""), r.read()
            except urllib.error.HTTPError as e:
                body = e.read() if e.fp is not None else b""
                last = (int(e.code), e.headers.get("Content-Type", "") if e.headers else "", body)
                if e.code not in self.retry_statuses:
                    return last  # non-retryable (4xx): record once
            except (urllib.error.URLError, TimeoutError, OSError):
                last = (0, "", b"")
            if attempt < self.max_retries:
                time.sleep(self.backoff_s * (attempt + 1))
        return last

    def __call__(self, t: pa.Table) -> pa.Table:
        statuses, ctypes, bodies = [], [], []
        for url in t["url"].to_pylist():
            s, ct, body = self._fetch(url)
            statuses.append(s)
            ctypes.append(ct)
            bodies.append(body)
        return (
            t.append_column("status", pa.array(statuses, pa.int32()))
            .append_column("content_type", pa.array(ctypes, pa.string()))
            .append_column("body", pa.array(bodies, pa.binary()))
        )
