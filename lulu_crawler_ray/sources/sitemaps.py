"""Sitemap seed SOURCE: read a directory of sitemap XML files (plain or
gzipped, urlset or sitemapindex) into the crawl seed table
(url, host, lastmod) with exact max-lastmod dedup — the standard
crawler bootstrap beside the flat seed list (sources/seeds.py).

Distributed shape: ray.data.read_binary_files streams the FILES (the
natural unit — one parse per file, never per row), a task-pool
map_batches parses each document with the stdlib ElementTree kernel,
and the exact dedup is one combiner-first grouped Max keyed by url.
Index documents are validated (their child locs counted) but
contribute no URLs themselves, exactly like a production fetcher that
expands an index into fetches of its children.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.sitemap import parse_sitemap


def write_sitemap_fixture(out_dir: str, **kw) -> list[tuple[str, str]]:
    """Materialize the deterministic fixture; returns the generator's
    ground-truth (url, max lastmod) list for tests."""
    import os

    from ..functions.sitemap import build_sitemap_fixture

    files, truth = build_sitemap_fixture(**kw)
    os.makedirs(out_dir, exist_ok=True)
    for name, data in files.items():
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(data)
    return truth


def read_sitemap_seeds(path: str) -> ray.data.Dataset:
    """(url, host, lastmod) per DISTINCT url, lastmod = max over all
    listings (a url re-listed with a newer lastmod wins), host pulled
    with the RE2 kernel. Malformed documents raise (loudly) in the
    parse task."""
    from ..pipelines.relational import grouped_agg

    raw = ray.data.read_binary_files(path, include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        lms: list[str] = []
        for data in t["bytes"].to_pylist():
            kind, entries = parse_sitemap(data)
            if kind != "urlset":
                continue  # index: validated by the parse, no URLs
            for loc, lm in entries:
                urls.append(loc)
                lms.append(lm if lm is not None else "")
        return pa.table(
            {"url": pa.array(urls, pa.string()), "lastmod": pa.array(lms, pa.string())}
        )

    entries = raw.map_batches(parse, batch_format="pyarrow")
    dedup = grouped_agg(
        entries, ["url"], [("lastmod", "max", "lastmod")], round_to=None
    )

    def decorate(t: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(t["url"], r"^https?://(?P<g>[^/]+)"), 0
        )
        return pa.table({"url": t["url"], "host": host, "lastmod": t["lastmod"]})

    return dedup.map_batches(decorate, batch_format="pyarrow")


def s17_sitemap_seeds(sf: str):
    """queries() entry: deterministic fixture -> distributed sitemap
    reader -> ONE order-independent digest row (golden-pin oracle; the
    constants are validated against the GENERATOR's ground truth by
    tests/test_sitemaps.py, so a driver hash-match is a bit-exact
    regression check on the whole parse/dedup path). ``sf`` is unused —
    the fixture is self-contained, like the img/audio digest family."""
    import os
    import tempfile

    from ..functions.sitemap import url_hash_u64

    d = os.path.join(tempfile.gettempdir(), "lulu-sitemap-fixture-v1")
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        write_sitemap_fixture(d)
        with open(marker, "w") as f:
            f.write("ok")
    from ..pipelines.relational import grouped_agg

    ds = read_sitemap_seeds(os.path.join(d, "")).materialize()
    # distinct-host count via a grouped count (NOT summed per-batch
    # set sizes — a host's urls may span batches after the dedup
    # shuffle); the fixture's host table is tiny
    n_hosts = grouped_agg(ds, ["host"], [("n", "count", None)], round_to=None).count()

    def digest(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        lms = t["lastmod"].to_pylist()
        h = np.uint64(0)
        lm_mix = np.uint64(0)
        with np.errstate(over="ignore"):
            for u, lm in zip(urls, lms):
                h ^= np.uint64(url_hash_u64(u))
                lm_mix ^= np.uint64(url_hash_u64(u + "|" + lm))
        return pa.table(
            {
                "n_urls": pa.array([len(urls)], pa.int64()),
                "url_mix": pa.array([int(h) % (1 << 63)], pa.int64()),
                "lastmod_mix": pa.array([int(lm_mix) % (1 << 63)], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        def mix(col: str) -> int:
            if t.num_rows == 0:
                return 0
            v = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
            return int(np.bitwise_xor.reduce(v) % (1 << 63))

        return pa.table(
            {
                "n_urls": pa.array([int(pc.sum(t["n_urls"]).as_py() or 0)], pa.int64()),
                "n_hosts": pa.array([int(n_hosts)], pa.int64()),
                "url_mix": pa.array([mix("url_mix")], pa.int64()),
                "lastmod_mix": pa.array([mix("lastmod_mix")], pa.int64()),
            }
        )

    return (
        ds.map_batches(digest, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )
