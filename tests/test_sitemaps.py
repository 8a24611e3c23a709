"""Sitemap source: parser unit tests (urlset / sitemapindex / gzip /
malformed), distributed reader vs the GENERATOR's ground truth, and the
s17 digest pin recompute that keeps the golden-pin oracle honest."""

import gzip

import numpy as np
import pytest

from lulu_crawler_ray.functions.sitemap import (
    build_sitemap_fixture,
    parse_sitemap,
    url_hash_u64,
)


def test_parse_urlset_and_index():
    files, truth = build_sitemap_fixture(n_hosts=2, urls_per_host=10, overlap=3)
    kind, locs = parse_sitemap(files["h0_index.xml"])
    assert kind == "index" and len(locs) == 2
    kind, entries = parse_sitemap(files["h0_part1.xml"])
    assert kind == "urlset" and len(entries) == 5
    assert all(u.startswith("http://h0.test/s/") for u, _ in entries)
    # gzip transparent by magic
    kind, entries2 = parse_sitemap(files["h0_part2.xml.gz"])
    assert kind == "urlset" and len(entries2) == 5 + 3


def test_parse_raises_on_garbage():
    with pytest.raises(ValueError, match="malformed"):
        parse_sitemap(b"not xml at all <<<")
    with pytest.raises(ValueError, match="unexpected root"):
        parse_sitemap(b"<?xml version='1.0'?><html></html>")
    with pytest.raises(ValueError, match="malformed"):
        parse_sitemap(gzip.compress(b"<urlset>broken"))


def test_reader_equals_generator_truth(ray_session, tmp_path):
    from lulu_crawler_ray.sources.sitemaps import (
        read_sitemap_seeds,
        write_sitemap_fixture,
    )

    truth = write_sitemap_fixture(str(tmp_path), n_hosts=3, urls_per_host=12)
    rows = read_sitemap_seeds(str(tmp_path)).take_all()
    got = sorted((r["url"], r["lastmod"]) for r in rows)
    assert got == truth
    # the overlap re-listing carries a 2026-02 lastmod that must WIN
    assert any(lm.startswith("2026-02") for _, lm in got)
    # host extraction
    assert {r["host"] for r in rows} == {f"h{i}.test" for i in range(3)}


def test_s17_digest_matches_pin_and_truth(ray_session):
    from lulu_crawler_ray.sources.sitemaps import s17_sitemap_seeds

    t = s17_sitemap_seeds("unused").to_pandas()
    assert len(t) == 1
    row = t.iloc[0]
    # independent recompute from the generator's ground truth
    _, truth = build_sitemap_fixture()
    h = np.uint64(0)
    lm = np.uint64(0)
    with np.errstate(over="ignore"):
        for u, l in truth:
            h ^= np.uint64(url_hash_u64(u))
            lm ^= np.uint64(url_hash_u64(u + "|" + l))
    assert int(row["n_urls"]) == len(truth) == 240
    assert int(row["n_hosts"]) == 6
    assert int(row["url_mix"]) == int(h) % (1 << 63) == 4936562272080051019
    assert int(row["lastmod_mix"]) == int(lm) % (1 << 63) == 3125348245015593678
