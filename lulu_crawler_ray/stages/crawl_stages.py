"""Crawl pipeline stages — map_batches functions / callable classes
(SURVEY.md §3.1 ①-⑧). All hot-path stages are vectorized over Arrow
batches (``batch_format="pyarrow"``); per-row Python appears only where
URL/HTML logic demands it (canonicalize, regex parse) and then inside a
batched loop with precompiled state held per actor.

Stage -> operator map: RobotsScopeFilter = M5+M6, DedupClient = A1
client (J1 semi-join against actor state), PageFetcher = A3,
PageParser = M7+M9+M1-M4, ImageFetcher = A3(image)+M8+M10+F6,
partial_top_b / select_top_b = A2 politeness selection,
combine_first_by_seq + minseq filter = D1/D2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import CrawlConfig
from ..functions import htmlparse, pagegen, robots, urlnorm
from ..functions.imagecodec import decode
from ..functions.phash import phash64
from .. import schemas

_ZERO20 = b"\x00" * 20


def _sorted_by(t: pa.Table, keys: list[tuple[str, str]]) -> pa.Table:
    return t.take(pc.sort_indices(t, sort_keys=keys))


def _run_starts(col: np.ndarray) -> np.ndarray:
    """Boolean mask: True where a sorted column starts a new run."""
    if len(col) == 0:
        return np.zeros(0, bool)
    return np.r_[True, col[1:] != col[:-1]]


# ----------------------------------------------------------- politeness (A2)
def topb_per_host(t: pa.Table, budget: int) -> pa.Table:
    """Keep the first ``budget`` rows per host by (priority, seq) —
    vectorized (sort + run-length positions). Used both as the per-batch
    combiner pre-pass and as the per-group finalizer: top-B of per-batch
    top-Bs == global top-B, so the result is independent of batching
    (SURVEY.md §3.2.4 parallelism-independence)."""
    if t.num_rows == 0:
        return t
    t = _sorted_by(
        t, [("host", "ascending"), ("priority", "ascending"), ("seq", "ascending")]
    )
    host = np.asarray(t["host"].to_pylist(), dtype=object)
    starts = _run_starts(host)
    gid = np.cumsum(starts) - 1
    pos = np.arange(len(host)) - np.flatnonzero(starts)[gid]
    return t.filter(pa.array(pos < budget))


# ------------------------------------------------------- first-by-seq (D1/D2)
def combine_first_by_seq(t: pa.Table, keys: str | list[str] = "url_sha1") -> pa.Table:
    """Within-batch combiner: keep the min-seq row per key (composite
    keys supported). Because seq values are globally unique (SURVEY.md
    §3.2.3), the global min-seq row per key survives any composition of
    per-batch combining followed by a grouped Min("seq") filter."""
    if t.num_rows == 0:
        return t
    if isinstance(keys, str):
        keys = [keys]
    t = _sorted_by(t, [(k, "ascending") for k in keys] + [("seq", "ascending")])
    starts = np.zeros(t.num_rows, bool)
    starts[0] = True
    for k in keys:
        starts |= _run_starts(np.asarray(t[k].to_pylist(), dtype=object))
    return t.filter(pa.array(starts))


_REMOTE_FNS = None  # lazy ray.remote registration (module stays Ray-import-free at import time for kernels reuse)


def _minseq_finalize_impl(key_list, *blocks):
    if not blocks:
        return np.array([], np.int64)
    comb = pa.concat_tables(blocks).combine_chunks()
    idx = pc.sort_indices(
        comb, sort_keys=[(k, "ascending") for k in key_list] + [("seq", "ascending")]
    )
    srt = comb.take(idx)
    n = srt.num_rows
    starts = np.zeros(n, bool)
    starts[0] = True
    for k in key_list:
        a = srt[k].combine_chunks()
        starts[1:] |= pc.not_equal(a.slice(1), a.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    return np.sort(srt["seq"].to_numpy()[starts])


def dedup_first_by_seq(ds, keys: str | list[str] = "url_sha1", driver_max: int = 5_000_000):
    """D1/D2 — exact global first-by-seq dedup, fully vectorized:
    per-batch combiner -> min-seq-per-key -> broadcast min-seq set ->
    filter. seq uniqueness makes the min-seq set identify winner rows
    exactly; the broadcast is 8 bytes per distinct key (SURVEY.md §2.7).

    The min-seq computation gathers only (keys, seq) columns; when the
    combined set fits under ``driver_max`` rows it is finalized in one
    remote pyarrow sort task and broadcast (no shuffle at all). ABOVE
    ``driver_max`` — billions of distinct URLs, where any single
    min-seq object is itself the scale-killer — the combined rows
    hash-co-partition by key (generic key_hash_u64: works for the
    fixed-binary sha1 and composite [kind, sha1] keys) and each
    partition keeps its min-seq row per key in one vectorized pass:
    one full-row shuffle, zero driver state, no broadcast."""
    import ray

    key_list = [keys] if isinstance(keys, str) else list(keys)
    # NOTE: combined stays lazy on purpose — materializing it (measured)
    # costs more in object-store traffic than the per-consumer re-run of
    # the vectorized per-batch sort
    combined = ds.map_batches(
        lambda t: combine_first_by_seq(t, key_list), batch_format="pyarrow"
    )

    global _REMOTE_FNS
    if _REMOTE_FNS is None:
        _REMOTE_FNS = (
            ray.remote(lambda t: t.num_rows),
            ray.remote(num_cpus=1)(_minseq_finalize_impl),
        )
    _nrows, _minseq_finalize = _REMOTE_FNS

    # route on the pruned (keys, seq) projection: parallel materialize
    # into object-store refs (the data never crosses the driver — a
    # streaming iter_batches count was measured 40% slower on the
    # crawl's per-wave dedup because it serializes every batch through
    # the driver); only per-block row COUNTS are gathered
    blocks = combined.select_columns(key_list + ["seq"]).materialize().to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in blocks])
    refs = [r for r, c in zip(blocks, counts) if c > 0]  # empty blocks lose schema
    n = sum(counts)

    if n > driver_max:
        from ..pipelines.relational import _hash_partitioned_any, _npart

        def part_first(t: pa.Table) -> pa.Table:
            t = _sorted_by(
                t, [(k, "ascending") for k in key_list] + [("seq", "ascending")]
            )
            m = t.num_rows
            starts = np.zeros(m, bool)
            starts[0] = True
            for k in key_list:
                a = t[k].combine_chunks()
                starts[1:] |= pc.not_equal(a.slice(1), a.slice(0, m - 1)).to_numpy(
                    zero_copy_only=False
                )
            return t.filter(pa.array(starts)).drop_columns(["__part"])

        return _hash_partitioned_any(combined, key_list, _npart()).map_groups(
            part_first, batch_format="pyarrow"
        )

    # finalize in one remote task: pyarrow C++ sort over the pruned
    # (keys, seq) columns; the min-seq set never touches the driver
    ref = _minseq_finalize.remote(key_list, *refs) if refs else ray.put(np.array([], np.int64))

    def keep_winners(t: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        s = t["seq"].to_numpy()
        if len(wanted) == 0:
            return t.slice(0, 0)
        idx = np.clip(np.searchsorted(wanted, s), 0, len(wanted) - 1)
        return t.filter(pa.array(wanted[idx] == s))

    return combined.map_batches(keep_winners, batch_format="pyarrow")


# --------------------------------------------------------- scope+robots (M5/M6)
class RobotsScopeFilter:
    """Actor-pool filter: scope allowlist + robots.txt longest-prefix
    rules, robots rules cached per host per actor (A4). Metrics are
    batched fire-and-forget increments to the named metrics actor."""

    def __init__(self, cfg: CrawlConfig, metrics=None, wave: int = -1):
        self.cfg = cfg
        self.cache: dict[str, list] = {}
        self.metrics = metrics
        self.wave = wave

    def _rules(self, host: str):
        r = self.cache.get(host)
        if r is None:
            r = self.cache[host] = pagegen.robots_rules(self.cfg.seed, host)
        return r

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        cfg = self.cfg
        urls = t["url"].to_pylist()
        hosts = t["host"].to_pylist()
        depths = t["depth"].to_numpy()
        scope = np.fromiter(
            (
                u.startswith(("http://", "https://")) and h.endswith(cfg.allowed_suffixes)
                for u, h in zip(urls, hosts)
            ),
            bool,
            count=len(urls),
        )
        scope &= depths <= cfg.max_depth
        rob = np.fromiter(
            (
                (not s) or robots.allowed(urlnorm.path_of(u), self._rules(h))
                for u, h, s in zip(urls, hosts, scope)
            ),
            bool,
            count=len(urls),
        )
        mask = scope & rob
        if self.metrics is not None:
            self.metrics.incr.remote(
                {
                    "out_of_scope": int((~scope).sum()),
                    "robots_blocked": int((scope & ~rob).sum()),
                },
                self.wave,
            )
        return t.filter(pa.array(mask))


# ------------------------------------------------------------ dedup client (A1)
class DedupClient:
    """Routes each batch's keys to their owning SeenShard by host-hash
    range and keeps only first-sighting rows. One admit() RPC per shard
    per batch — thousands of URLs per hop (SURVEY.md §7 hard part 3).
    num_shards must be a power of two (vectorized shift routing)."""

    def __init__(self, shards: list, num_shards: int, ns: str):
        assert num_shards & (num_shards - 1) == 0, "num_shards must be a power of 2"
        self.shards = shards
        self.num_shards = num_shards
        # num_shards == 1 would need shift 64 — C-level UB on uint64 —
        # so single-shard routing is special-cased to sid = 0
        self.shift = np.uint64(64 - (num_shards.bit_length() - 1)) if num_shards > 1 else None
        self.ns = ns

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray

        if t.num_rows == 0:
            return t
        if self.shift is None:
            sid = np.zeros(t.num_rows, np.int64)
        else:
            hh = t["host_hash"].to_numpy().astype(np.uint64)
            sid = (hh >> self.shift).astype(np.int64)
        keys = t["url_sha1"].to_pylist()
        mask = np.zeros(t.num_rows, bool)
        futs, idxs = [], []
        for s in np.unique(sid):
            ix = np.flatnonzero(sid == s)
            futs.append(self.shards[int(s)].admit.remote(self.ns, [keys[i] for i in ix]))
            idxs.append(ix)
        for fut, ix in zip(futs, idxs):
            mask[ix] = ray.get(fut)
        return t.filter(pa.array(mask))


# ---------------------------------------------------------------- fetch (A3)
class PageFetcher:
    """Synthetic fetcher over the deterministic page generator — the
    sandbox stand-in for an HTTP pool behind the Fetcher seam
    (SURVEY.md §0.2). Emits T2 = frontier + rank + status/ct/body."""

    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg

    def __call__(self, t: pa.Table) -> pa.Table:
        cfg = self.cfg
        bodies = [
            pagegen.page_bytes(
                cfg.seed, u, n_hosts=cfg.n_hosts, alpha=cfg.zipf_alpha,
                max_links=cfg.max_links_per_page, formats=cfg.image_formats,
            )
            for u in t["url"].to_pylist()
        ]
        n = t.num_rows
        return (
            t.append_column("status", pa.array([200] * n, pa.int32()))
            .append_column("content_type", pa.array(["text/html"] * n, pa.string()))
            .append_column("body", pa.array(bodies, pa.binary()))
        )


# ---------------------------------------------------------------- parse (M7)
class PageParser:
    """M7+M9+M1-M4: body -> REFS rows (links + image refs), canonical
    absolute targets, captions normalized, deterministic seq =
    (rank + 1) * link_bound + document-position."""

    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg

    def __call__(self, t: pa.Table) -> pa.Table:
        cfg = self.cfg
        cols: dict[str, list] = {f.name: [] for f in schemas.REFS}
        for url, sha, depth, rank, wave, body in zip(
            t["url"].to_pylist(),
            t["url_sha1"].to_pylist(),
            t["depth"].to_pylist(),
            t["rank"].to_pylist(),
            t["wave"].to_pylist(),
            t["body"].to_pylist(),
        ):
            for j, kind, target, caption in htmlparse.extract_refs(body):
                try:
                    c = urlnorm.resolve(url, target)
                except ValueError:
                    continue
                host = urlnorm.host_of(c)
                cols["kind"].append(kind)
                cols["url"].append(c)
                cols["url_sha1"].append(urlnorm.sha1_bytes(c))
                cols["host"].append(host)
                cols["host_hash"].append(urlnorm.host_hash(host))
                cols["depth"].append(depth + 1)
                cols["priority"].append(cfg.priority(depth + 1))
                cols["seq"].append((rank + 1) * cfg.link_bound + j)
                cols["parent_sha1"].append(sha)
                cols["wave"].append(wave + 1)
                cols["caption"].append(caption)
        return pa.Table.from_pydict(
            {f.name: pa.array(cols[f.name], f.type) for f in schemas.REFS},
            schema=schemas.REFS,
        )


# --------------------------------------------------------------- images (M8+)
class ImageFetcher:
    """Fetch+decode+validate+phash for admitted image refs -> T3 rows
    (image_id, bytes, w, h, fmt, caption, phash). Decode failures are
    dropped and counted (M10)."""

    def __init__(self, cfg: CrawlConfig, metrics=None, wave: int = -1):
        self.cfg = cfg
        self.metrics = metrics
        self.wave = wave

    def __call__(self, t: pa.Table) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in schemas.IMAGE_TABLE}
        dropped = 0
        for url, sha, caption in zip(
            t["url"].to_pylist(), t["url_sha1"].to_pylist(), t["caption"].to_pylist()
        ):
            try:
                w, h, fmt, data = pagegen.image_payload(
                    self.cfg.seed, url, self.cfg.image_sizes
                )
                img = decode(data, fmt)
                if img.shape != (h, w, 3):
                    raise ValueError("shape mismatch")
                ph = phash64(img)
            except Exception:
                dropped += 1
                continue
            cols["image_id"].append(sha.hex())
            cols["bytes"].append(data)
            cols["w"].append(w)
            cols["h"].append(h)
            cols["fmt"].append(fmt)
            cols["caption"].append(caption)
            cols["phash"].append(ph)
        if dropped and self.metrics is not None:
            self.metrics.incr.remote({"image_dropped": dropped}, self.wave)
        return pa.Table.from_pydict(
            {f.name: pa.array(cols[f.name], f.type) for f in schemas.IMAGE_TABLE},
            schema=schemas.IMAGE_TABLE,
        )


# ------------------------------------------------------------ frontier utils
def refs_to_frontier(t: pa.Table) -> pa.Table:
    """REFS -> T1 frontier columns (drop kind/caption)."""
    return schemas.check(
        t.select([f.name for f in schemas.FRONTIER]), schemas.FRONTIER, "refs_to_frontier"
    )


def seeds_to_frontier(seed_urls: list[str], cfg: CrawlConfig) -> pa.Table:
    """S1 — seed list -> T1 rows, seq = file order (SURVEY.md §3.2.2)."""
    cols: dict[str, list] = {f.name: [] for f in schemas.FRONTIER}
    for i, u in enumerate(seed_urls):
        try:
            c, sha, host, hh = urlnorm.frontier_fields(u)
        except ValueError:
            continue
        cols["url"].append(c)
        cols["url_sha1"].append(sha)
        cols["host"].append(host)
        cols["host_hash"].append(hh)
        cols["depth"].append(0)
        cols["priority"].append(cfg.priority(0))
        cols["seq"].append(i)
        cols["parent_sha1"].append(_ZERO20)
        cols["wave"].append(0)
    return pa.Table.from_pydict(
        {f.name: pa.array(cols[f.name], f.type) for f in schemas.FRONTIER},
        schema=schemas.FRONTIER,
    )
