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


def make_rate_limiter(delay_s: float):
    """Create the global HostRateLimiter actor (token-reservation per
    host). Defined as a factory so the module stays importable without
    an active Ray session."""
    import ray

    @ray.remote(num_cpus=0)
    class HostRateLimiter:
        """Global per-host fetch pacing: reserve(host, n) hands out a
        contiguous window of n fetch slots spaced ``delay_s`` apart and
        returns the window's start (unix time). Single actor => one
        clock; per-host windows never overlap across fetch actors."""

        def __init__(self, delay: float):
            self.delay = delay
            self.next_free: dict[str, float] = {}

        def reserve(self, host: str, n: int) -> float:
            import time

            start = max(time.time(), self.next_free.get(host, 0.0))
            self.next_free[host] = start + n * self.delay
            return start

        def reset(self) -> None:
            """Clear reservations — called at crawl start so a second
            run_crawl in the same Ray job doesn't inherit the previous
            crawl's per-host windows (wall-clock only; order unaffected)."""
            self.next_free.clear()

    return HostRateLimiter.remote(delay_s)


class PacedFetcher:
    """Wall-clock politeness pacing layered on any Fetcher (SURVEY.md
    §2.8 "real-time pacing can be layered on A2 later without changing
    order"): the admitted set and its rank order are fixed BEFORE the
    fetch stage runs, so pacing delays wall time but cannot change
    crawl order or the seen set. Per batch: group rows by host, reserve
    a slot window from the global HostRateLimiter, fetch each row at
    its slot (>= delay_s apart per host, across ALL fetch actors)."""

    def __init__(self, inner: "Fetcher", limiter, delay_s: float):
        self.inner = inner
        self.limiter = limiter
        self.delay = delay_s

    def __call__(self, t: pa.Table) -> pa.Table:
        import time

        import numpy as np
        import ray

        if self.delay <= 0 or self.limiter is None or t.num_rows == 0:
            return self.inner(t)
        hosts = np.asarray(t["host"].to_pylist(), dtype=object)
        order = np.argsort(hosts, kind="stable")
        outs: list[pa.Table] = []
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and hosts[order[j]] == hosts[order[i]]:
                j += 1
            idx = order[i:j]
            start = ray.get(self.limiter.reserve.remote(str(hosts[idx[0]]), len(idx)))
            for k, row in enumerate(idx):
                wait = start + k * self.delay - time.time()
                if wait > 0:
                    time.sleep(wait)
                outs.append(self.inner(t.slice(int(row), 1)))
            i = j
        out = pa.concat_tables(outs)
        # rows were emitted in `order`; invert the permutation to keep
        # the contract: one row per input row, input order
        inv = np.empty(len(order), np.int64)
        inv[order] = np.arange(len(order))
        return out.take(pa.array(inv))


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
