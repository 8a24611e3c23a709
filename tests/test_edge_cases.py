"""Degenerate crawl configurations — the engine must terminate cleanly
and still equal the oracle when there is (almost) nothing to do."""

import pyarrow.dataset as pads
import pytest

from lulu_crawler_ray.config import CrawlConfig, seed_urls
from lulu_crawler_ray.pipelines.oracle import run_oracle
from lulu_crawler_ray.state.seen import load_seen


def _run_both(tmp_path, cfg, seeds, ray_session):
    from lulu_crawler_ray.pipelines.crawl import run_crawl

    oracle = run_oracle(seeds, cfg)
    out = str(tmp_path / "c")
    res = run_crawl(seeds, cfg, out)
    return oracle, res, out


def test_no_seeds(tmp_path, ray_session):
    cfg = CrawlConfig(seed=1, budget=2, max_depth=3, max_urls=100, n_hosts=5, num_shards=2)
    oracle, res, out = _run_both(tmp_path, cfg, [], ray_session)
    assert res["metrics"]["ranks"] == 0 == len(oracle.ledger)
    seen = load_seen(out)
    assert seen.num_rows == 0


def test_invalid_seeds_only(tmp_path, ray_session):
    cfg = CrawlConfig(seed=1, budget=2, max_depth=3, max_urls=100, n_hosts=5, num_shards=2)
    seeds = ["not-a-url", "/relative/only", "ftp://h0.test/x"]  # ftp → out of scope
    oracle, res, out = _run_both(tmp_path, cfg, seeds, ray_session)
    assert res["metrics"]["ranks"] == 0 == len(oracle.ledger)


def test_single_seed_zero_depth(tmp_path, ray_session):
    cfg = CrawlConfig(seed=2, budget=4, max_depth=0, max_urls=100, n_hosts=5, num_shards=2)
    oracle, res, out = _run_both(tmp_path, cfg, seed_urls(cfg, 1), ray_session)
    # wave == max_depth == 0 → nothing fetched, but the seed IS seen
    assert res["metrics"]["ranks"] == 0 == len(oracle.ledger)
    seen = load_seen(out)
    assert seen["url_sha1"].to_pylist() == sorted(oracle.seen)
    assert seen.num_rows == 1


def test_duplicate_seeds(tmp_path, ray_session):
    cfg = CrawlConfig(seed=3, budget=4, max_depth=2, max_urls=100, n_hosts=5, num_shards=2)
    seeds = ["http://h1.test/s/1", "http://H1.test/s/1", "http://h1.test:80/s/1"]
    oracle, res, out = _run_both(tmp_path, cfg, seeds, ray_session)
    # all three canonicalize identically → one frontier row (min seq)
    led = pads.dataset(f"{out}/ledger", format="parquet").to_table()
    assert led.num_rows == len(oracle.ledger)
    assert led.num_rows >= 1
    assert sorted(led["url"].to_pylist()) == sorted(r["url"] for r in oracle.ledger)
    w0 = [r for r in oracle.ledger if r["wave"] == 0]
    assert len(w0) == 1 and w0[0]["seq"] == 0


def test_max_urls_one(tmp_path, ray_session):
    cfg = CrawlConfig(seed=4, budget=4, max_depth=3, max_urls=1, n_hosts=5, num_shards=2)
    oracle, res, out = _run_both(tmp_path, cfg, seed_urls(cfg, 5), ray_session)
    assert res["metrics"]["ranks"] == 1 == len(oracle.ledger)
    led = pads.dataset(f"{out}/ledger", format="parquet").to_table()
    assert led["url"].to_pylist() == [oracle.ledger[0]["url"]]


def test_tpch_extra_empty_dimension_filters(ray_session):
    """A legal-but-empty dimension filter must produce the oracle's
    defined result (0-row set, or one zero row for the scalar
    aggregate), not crash on the column-less empty aggregate frame
    (code-review finding: _np_col + empty-broadcast guards)."""
    from lulu_crawler_ray.pipelines import tpch_extra as tx

    sf = "/root/testdata/sf0.001"
    q17 = tx.q17_small_qty_revenue(sf, brand="Brand#99").to_pandas()
    assert q17["small_qty_revenue_c"].tolist() == [0]
    assert len(tx.q2_min_cost_supplier(sf, p_type="NOPE").to_pandas()) == 0
    assert len(tx.q20_part_promotion(sf, name_word="zzz").to_pandas()) == 0
