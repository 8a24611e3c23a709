"""Hot-domain splitting (BASELINE.json:6 "explicit skew mitigation
(hot-domain splitting, salted shuffle)"; SURVEY.md §4.3.2): a host
holding ~50% of the frontier must (a) be detected, (b) have its
selection split into balanced sub-groups (no group > 2x the mean over
the split groups), and (c) leave the crawl order byte-identical to the
single-threaded oracle through the distributed selection path."""

import numpy as np
import pyarrow as pa
import pytest

from lulu_crawler_ray.config import CrawlConfig
from lulu_crawler_ray.pipelines.oracle import run_oracle


def _skewed_seeds(n_hot: int, n_cold_hosts: int) -> list[str]:
    hot = [f"http://h0.test/s/{i}" for i in range(n_hot)]
    cold = [f"http://h{1 + (j % n_cold_hosts)}.test/s/c{j}" for j in range(n_hot)]
    # interleave so seqs of the hot host are spread over the seq space
    out = []
    for a, b in zip(hot, cold):
        out += [a, b]
    return out


def _cand_table(urls: list[str]) -> pa.Table:
    from lulu_crawler_ray.functions import urlnorm

    cols = {"host_hash": [], "host": [], "priority": [], "seq": []}
    for i, u in enumerate(urls):
        host = urlnorm.host_of(u)
        cols["host"].append(host)
        cols["host_hash"].append(urlnorm.host_hash(host))
        cols["priority"].append(0)
        cols["seq"].append(i)
    return pa.table(
        {
            "host_hash": pa.array(
                np.array(cols["host_hash"], np.uint64).astype(np.int64)
            ),
            "host": pa.array(cols["host"], pa.string()),
            "priority": pa.array(cols["priority"], pa.int32()),
            "seq": pa.array(cols["seq"], pa.int64()),
        }
    )


def test_hot_host_detection_and_split_balance(ray_session):
    import ray.data

    from lulu_crawler_ray.pipelines.crawl import _hot_hosts, _salt_candidates

    urls = _skewed_seeds(n_hot=400, n_cold_hosts=8)  # h0 holds 50%
    t = _cand_table(urls)
    cand = ray.data.from_arrow(t).repartition(4)

    hot = _hot_hosts(cand, threshold=100)
    assert hot == ["h0.test"], hot

    n_salts = 8
    salted = _salt_candidates(t, np.array(hot, dtype=object), n_salts)
    # the hot host's rows spread round-robin over n_salts groups;
    # no (host, salt) group of the hot host exceeds 2x the mean
    import collections

    sizes = collections.Counter(
        (h, s)
        for h, s in zip(salted["host"].to_pylist(), salted["salt"].to_pylist())
        if h == "h0.test"
    )
    counts = np.array(list(sizes.values()))
    assert len(counts) == n_salts
    assert counts.max() <= 2 * counts.mean()
    # cold hosts keep salt 0 (no extra pass)
    cold_salts = {
        s for h, s in zip(salted["host"].to_pylist(), salted["salt"].to_pylist()) if h != "h0.test"
    }
    assert cold_salts == {0}


def test_mega_host_oracle_equality_distributed_path(tmp_path, ray_session):
    """One host with ~50% of the frontier, forced distributed selection
    (driver_select_max=0) with a tiny hot threshold — crawl order and
    seen set must equal the oracle exactly."""
    from lulu_crawler_ray.pipelines.crawl import run_crawl
    from lulu_crawler_ray.state.seen import load_seen

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    cfg = CrawlConfig(
        seed=7, budget=6, max_depth=3, max_urls=600, n_hosts=10, num_shards=4,
        driver_select_max=0, hot_host_threshold=5,
    )
    seeds = _skewed_seeds(n_hot=30, n_cold_hosts=6)
    oracle = run_oracle(seeds, cfg)
    out = str(tmp_path / "crawl")
    run_crawl(seeds, cfg, out)

    led = pads.dataset(f"{out}/ledger", format="parquet").to_table()
    led = led.take(pc.sort_indices(led, sort_keys=[("rank", "ascending")]))
    assert led["url"].to_pylist() == [r["url"] for r in oracle.ledger]
    seen = load_seen(out)
    assert seen["url_sha1"].to_pylist() == sorted(oracle.seen)
