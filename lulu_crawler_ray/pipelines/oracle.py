"""Single-threaded pure-Python oracle crawler — the executable spec of
SURVEY.md §3.2 (the reference checkout is empty, so this plays the role
of "the reference outputs"; see SURVEY.md §0.1). No Ray imports.

Normative wave semantics (shared verbatim with pipelines/crawl.py):

  wave w runs while: frontier nonempty AND w < max_depth AND
                     ranks_assigned < max_urls
  selection:  per host, order pending by (priority, seq, url_sha1),
              admit the first ``budget``; the rest stay deferred.
  wave order: admitted sorted by (host_hash, host, priority, seq,
              url_sha1); truncated to max_urls - ranks_assigned
              (truncation ends the crawl after the wave; truncated
              rows are abandoned); rank = running global index.
  fetch:      body = page_bytes(seed, url)   [SyntheticFetcher]
  refs:       ref j on the page with rank r gets
              seq = (r + 1) * link_bound + j
  links:      resolve -> scope filter -> robots filter -> dedup within
              wave (min seq per url_sha1) -> drop seen -> mark seen ->
              frontier (a URL is *seen* when admitted to the frontier;
              robots-blocked / out-of-scope URLs are never seen).
  images:     resolve -> scope+robots -> dedup within wave (min seq per
              image_id) -> drop image-seen -> emit T3 row with payload
              from image_payload() and phash of the decoded pixels.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..config import CrawlConfig
from ..functions import htmlparse, pagegen, robots, urlnorm
from ..functions.imagecodec import decode
from ..functions.phash import phash64

_ZERO20 = b"\x00" * 20


@dataclass
class Row:
    url: str
    sha1: bytes
    host: str
    host_hash: int
    depth: int
    priority: int
    seq: int
    parent_sha1: bytes
    wave: int


@dataclass
class CrawlResult:
    ledger: list[dict] = field(default_factory=list)  # T4 rows, rank order
    images: list[dict] = field(default_factory=list)  # T3 rows + wave
    seen: set[bytes] = field(default_factory=set)  # T5
    metrics: dict = field(default_factory=dict)


def _in_scope(cfg: CrawlConfig, url: str, host: str, depth: int) -> bool:
    return (
        url.startswith(("http://", "https://"))
        and host.endswith(cfg.allowed_suffixes)
        and depth <= cfg.max_depth
    )


def _robots_ok(cfg: CrawlConfig, url: str, host: str, cache: dict) -> bool:
    rules = cache.get(host)
    if rules is None:
        rules = cache[host] = pagegen.robots_rules(cfg.seed, host)
    return robots.allowed(urlnorm.path_of(url), rules)


def _admit_new(
    cfg: CrawlConfig,
    candidates: list[Row],
    seen: set[bytes],
    frontier: list[Row],
    robots_cache: dict,
    metrics: dict,
) -> None:
    """The new-candidate pipeline: scope -> robots -> wave-dedup ->
    drop-seen -> mark seen + enqueue. Mutates seen/frontier/metrics."""
    best: dict[bytes, Row] = {}
    for r in candidates:
        if not _in_scope(cfg, r.url, r.host, r.depth):
            metrics["out_of_scope"] = metrics.get("out_of_scope", 0) + 1
            continue
        if not _robots_ok(cfg, r.url, r.host, robots_cache):
            metrics["robots_blocked"] = metrics.get("robots_blocked", 0) + 1
            continue
        cur = best.get(r.sha1)
        if cur is None or r.seq < cur.seq:
            best[r.sha1] = r
    for sha, r in best.items():
        if sha in seen:
            metrics["dup_seen"] = metrics.get("dup_seen", 0) + 1
            continue
        seen.add(sha)
        frontier.append(r)


def run_oracle(seeds: list[str], cfg: CrawlConfig) -> CrawlResult:
    if len(seeds) > cfg.link_bound:  # same invariant as run_crawl
        raise ValueError(f"{len(seeds)} seeds > link_bound={cfg.link_bound}")
    res = CrawlResult()
    seen, frontier = res.seen, []
    image_seen: set[str] = set()
    robots_cache: dict = {}
    res.metrics = {"fetched": 0, "deferred": 0}

    # seeds: seq = file order (SURVEY §3.2.2 "admitted in file order")
    cand = []
    for i, u in enumerate(seeds):
        try:
            c, sha, host, hh = urlnorm.frontier_fields(u)
        except ValueError:
            continue
        cand.append(Row(c, sha, host, hh, 0, cfg.priority(0), i, _ZERO20, 0))
    _admit_new(cfg, cand, seen, frontier, robots_cache, res.metrics)

    rank_base = 0
    wave = 0
    while frontier and wave < cfg.max_depth and rank_base < cfg.max_urls:
        # per-host selection
        by_host: dict[str, list[Row]] = {}
        for r in frontier:
            by_host.setdefault(r.host, []).append(r)
        admitted: list[Row] = []
        deferred: list[Row] = []
        for host, rows in by_host.items():
            rows.sort(key=lambda r: (r.priority, r.seq, r.sha1))
            admitted.extend(rows[: cfg.budget])
            deferred.extend(rows[cfg.budget :])
        admitted.sort(key=lambda r: (r.host_hash, r.host, r.priority, r.seq, r.sha1))
        truncated = len(admitted) > cfg.max_urls - rank_base
        admitted = admitted[: cfg.max_urls - rank_base]
        res.metrics["deferred"] += len(deferred)

        link_cand: list[Row] = []
        img_cand: list[tuple[Row, str]] = []  # (row, caption)
        for idx, r in enumerate(admitted):
            rank = rank_base + idx
            res.ledger.append(
                dict(rank=rank, url=r.url, url_sha1=r.sha1, wave=wave, host=r.host,
                     seq=r.seq, parent_sha1=r.parent_sha1, depth=r.depth)
            )
            body = pagegen.page_bytes(
                cfg.seed, r.url, n_hosts=cfg.n_hosts, alpha=cfg.zipf_alpha,
                max_links=cfg.max_links_per_page, formats=cfg.image_formats,
            )
            res.metrics["fetched"] += 1
            for j, kind, target, caption in htmlparse.extract_refs(body):
                try:
                    c = urlnorm.resolve(r.url, target)
                except ValueError:
                    continue
                sha = urlnorm.sha1_bytes(c)
                host = urlnorm.host_of(c)
                hh = urlnorm.host_hash(host)
                seq = (rank + 1) * cfg.link_bound + j
                nr = Row(c, sha, host, hh, r.depth + 1, cfg.priority(r.depth + 1),
                         seq, r.sha1, wave + 1)
                if kind == "link":
                    link_cand.append(nr)
                else:
                    img_cand.append((nr, caption))

        # images: scope+robots -> wave-dedup by image_id -> global image-seen
        best_img: dict[str, tuple[Row, str]] = {}
        for r, caption in img_cand:
            if not _in_scope(cfg, r.url, r.host, r.depth):
                continue
            if not _robots_ok(cfg, r.url, r.host, robots_cache):
                continue
            iid = r.sha1.hex()
            cur = best_img.get(iid)
            if cur is None or r.seq < cur[0].seq:
                best_img[iid] = (r, caption)
        for iid, (r, caption) in best_img.items():
            if iid in image_seen:
                continue
            image_seen.add(iid)
            w, h, fmt, data = pagegen.image_payload(cfg.seed, r.url, cfg.image_sizes)
            ph = phash64(decode(data, fmt))
            res.images.append(
                dict(image_id=iid, bytes=data, w=w, h=h, fmt=fmt,
                     caption=caption, phash=ph, wave=wave, url=r.url)
            )

        frontier = deferred
        _admit_new(cfg, link_cand, seen, frontier, robots_cache, res.metrics)
        rank_base += len(admitted)
        wave += 1
        if truncated:
            break

    res.metrics["ranks"] = rank_base
    res.metrics["waves"] = wave
    return res
