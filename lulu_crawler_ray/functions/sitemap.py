"""Sitemap-protocol parsing (sitemaps.org XML, the crawler seed-source
sibling of robots.txt): urlset and sitemapindex documents, plain or
gzipped, parsed with the stdlib ElementTree — no per-row Python in the
Ray path (files are the unit of work; one parse per FILE).

The deterministic fixture generator returns the ground-truth entry list
alongside the file bytes, so tests compare the distributed reader
against the generator's own truth — no circular re-parse.

No reference file:line citations are possible — /root/reference is
empty (SURVEY.md §0); the format is the public sitemaps.org protocol.
"""

from __future__ import annotations

import gzip
import hashlib
import xml.etree.ElementTree as ET

SM_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(data: bytes) -> tuple[str, list]:
    """Parse one sitemap document. Returns ("index", [child_loc, ...])
    for a sitemapindex, or ("urlset", [(loc, lastmod|None), ...]) for a
    urlset. Gzip (by magic, not extension) is transparent. Raises
    ValueError on any other root element or malformed XML — a crawler
    must never silently treat garbage as an empty seed list."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:  # noqa: F841
        raise ValueError(f"sitemap: malformed XML ({e})") from None
    kind = _local(root.tag)
    if kind == "sitemapindex":
        locs = []
        for sm in root:
            if _local(sm.tag) != "sitemap":
                continue
            for c in sm:
                if _local(c.tag) == "loc" and c.text:
                    locs.append(c.text.strip())
        return "index", locs
    if kind == "urlset":
        out = []
        for u in root:
            if _local(u.tag) != "url":
                continue
            loc, lastmod = None, None
            for c in u:
                if _local(c.tag) == "loc" and c.text:
                    loc = c.text.strip()
                elif _local(c.tag) == "lastmod" and c.text:
                    lastmod = c.text.strip()
            if loc is not None:
                out.append((loc, lastmod))
        return "urlset", out
    raise ValueError(f"sitemap: unexpected root element <{kind}>")


def _urlset_xml(entries: list[tuple[str, str | None]]) -> bytes:
    rows = []
    for loc, lm in entries:
        lmx = f"<lastmod>{lm}</lastmod>" if lm else ""
        rows.append(f"<url><loc>{loc}</loc>{lmx}</url>")
    return (
        f'<?xml version="1.0" encoding="UTF-8"?>\n<urlset xmlns="{SM_NS}">'
        + "".join(rows)
        + "</urlset>"
    ).encode()


def _index_xml(locs: list[str]) -> bytes:
    rows = [f"<sitemap><loc>{loc}</loc></sitemap>" for loc in locs]
    return (
        f'<?xml version="1.0" encoding="UTF-8"?>\n<sitemapindex xmlns="{SM_NS}">'
        + "".join(rows)
        + "</sitemapindex>"
    ).encode()


def build_sitemap_fixture(
    n_hosts: int = 6, urls_per_host: int = 40, overlap: int = 5
) -> tuple[dict[str, bytes], list[tuple[str, str]]]:
    """Deterministic sitemap file set: per host ONE sitemapindex naming
    two urlsets; part 2 is GZIPPED and re-lists the last ``overlap``
    URLs of part 1 with a LATER lastmod (so max-lastmod dedup in the
    reader is observable). Returns (files, truth) where ``truth`` is
    the expected DISTINCT (url, max lastmod) list — the generator's own
    ground truth, independent of any parser."""
    files: dict[str, bytes] = {}
    best: dict[str, str] = {}
    for h in range(n_hosts):
        urls = [f"http://h{h}.test/s/{i}" for i in range(urls_per_host)]

        def lm(i: int, h: int = h) -> str:
            return f"2026-01-{1 + (h * 7 + i) % 28:02d}"

        half = urls_per_host // 2
        p1 = [(u, lm(i)) for i, u in enumerate(urls[:half])]
        p2 = [(u, lm(i + half)) for i, u in enumerate(urls[half:])]
        # overlap: re-list the tail of part 1 with a later lastmod
        for j in range(overlap):
            i = half - overlap + j
            p2.append((urls[i], f"2026-02-{1 + (h + j) % 28:02d}"))
        files[f"h{h}_index.xml"] = _index_xml(
            [f"http://h{h}.test/sitemap_1.xml", f"http://h{h}.test/sitemap_2.xml.gz"]
        )
        files[f"h{h}_part1.xml"] = _urlset_xml(p1)
        files[f"h{h}_part2.xml.gz"] = gzip.compress(_urlset_xml(p2), mtime=0)
        for loc, lmv in p1 + p2:
            if loc not in best or lmv > best[loc]:
                best[loc] = lmv
    truth = sorted(best.items())
    return files, truth


def url_hash_u64(url: str) -> int:
    """First 8 bytes of sha1(url) as uint64 — the seed-set digest unit
    (mirrors the crawl ledger's sha1 identity)."""
    return int.from_bytes(hashlib.sha1(url.encode()).digest()[:8], "big")
