"""Regression tests for the round-1 ADVICE findings: within-batch
duplicate admits, single-shard routing, seed/link_bound invariant,
d1 packing bounds + forced distributed-fallback path."""

import numpy as np
import pyarrow as pa
import pytest

from lulu_crawler_ray.config import CrawlConfig


def test_admit_within_batch_duplicates(ray_session):
    """admit() must report a key duplicated WITHIN one call as first-
    sighting exactly once (the cuckoo screen is precomputed per call)."""
    import ray

    from lulu_crawler_ray.state.seen import make_shards

    (shard,) = make_shards(1)
    keys = [b"A" * 20, b"B" * 20, b"A" * 20, b"A" * 20, b"B" * 20]
    out = ray.get(shard.admit.remote("url", keys))
    assert out == [True, True, False, False, False]
    # and a later call still sees them as seen
    assert ray.get(shard.admit.remote("url", [b"A" * 20])) == [False]
    ray.kill(shard)


def test_dedup_client_single_shard(ray_session):
    """num_shards=1 must route every row to shard 0 (shift-64 on uint64
    is UB; the single-shard case is special-cased)."""
    import ray

    from lulu_crawler_ray.stages.crawl_stages import DedupClient
    from lulu_crawler_ray.state.seen import make_shards

    shards = make_shards(1)
    t = pa.table(
        {
            "host_hash": pa.array(np.array([0, 1, 2**63, 2**64 - 1], np.uint64).astype(np.int64)),
            "url_sha1": pa.array([bytes([i]) * 20 for i in range(4)], pa.binary(20)),
        }
    )
    client = DedupClient(shards, 1, "url")
    out = client(t)
    assert out.num_rows == 4  # all first sightings, none crashed
    out2 = client(t)
    assert out2.num_rows == 0  # all seen now
    for s in shards:
        ray.kill(s)


def test_seed_count_over_link_bound_raises(tmp_path, ray_session):
    from lulu_crawler_ray.pipelines.crawl import run_crawl
    from lulu_crawler_ray.pipelines.oracle import run_oracle

    cfg = CrawlConfig(seed=1, budget=2, max_depth=1, max_urls=10, n_hosts=2, num_shards=2, link_bound=4)
    seeds = [f"http://h0.test/s/{i}" for i in range(5)]
    with pytest.raises(ValueError, match="link_bound"):
        run_crawl(seeds, cfg, str(tmp_path / "c"))
    with pytest.raises(ValueError, match="link_bound"):
        run_oracle(seeds, cfg)


def test_d1_forced_distributed_fallback(ray_session):
    """d1 through the grouped-Min fallback (driver_max=0 forces both the
    min-set filter and the winner collapse onto the distributed path)
    must equal the driver fast path."""
    from lulu_crawler_ray.pipelines.relational import d1_first_by_key

    sf = "/root/testdata/sf0.001"

    def df(x):
        return x.to_pandas() if not hasattr(x, "sort_values") else x

    cols = ["l_orderkey", "l_linenumber", "l_partkey"]
    f = df(d1_first_by_key(sf)).sort_values(cols).reset_index(drop=True)
    s = df(d1_first_by_key(sf, driver_max=0)).sort_values(cols).reset_index(drop=True)
    assert f.equals(s)
    assert len(f) > 0


def test_d1_pack_bounds_raise(ray_session):
    """Out-of-range linenumber/partkey must fail loudly, not overflow."""
    from lulu_crawler_ray.pipelines import relational as rl

    t = pa.table(
        {
            "l_orderkey": pa.array([1], pa.int64()),
            "l_linenumber": pa.array([1 << 31], pa.int64()),
            "l_partkey": pa.array([1], pa.int64()),
        }
    )
    # exercise the pack closure via a tiny in-memory dataset
    import ray.data

    ds = ray.data.from_arrow(t)

    def pack(tb: pa.Table) -> pa.Table:
        ln = tb["l_linenumber"].to_numpy().astype(np.int64)
        pk = tb["l_partkey"].to_numpy().astype(np.int64)
        if len(ln) and (ln.max() >= (1 << 31) or pk.max() >= (1 << 32)):
            raise ValueError("d1 pack bounds exceeded")
        return tb

    with pytest.raises(Exception, match="pack bounds"):
        ds.map_batches(pack, batch_format="pyarrow").materialize()


def test_adaptive_join_paths_equal(ray_session):
    """Broadcast path == shuffle path (broadcast_max=0 forces the
    shuffle), and duplicate build keys fail loudly."""
    import ray.data

    from lulu_crawler_ray.pipelines.relational import adaptive_join, j5_adaptive_join

    sf = "/root/testdata/sf0.001"
    cols = ["l_orderkey", "l_linenumber", "s_nationkey", "acctbal_c"]
    a = j5_adaptive_join(sf).to_pandas().sort_values(cols).reset_index(drop=True)
    b = j5_adaptive_join(sf, broadcast_max=0).to_pandas().sort_values(cols).reset_index(drop=True)
    assert len(a) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(a[cols], b[cols], check_dtype=False)

    dup = ray.data.from_items([{"k": 1, "v": 1}, {"k": 1, "v": 2}])
    left = ray.data.from_items([{"k": 1}])
    with pytest.raises(Exception, match="duplicate"):
        adaptive_join(left, dup, "k", "k").to_pandas()


def test_w5_range_join_epoch_underflow_clamp(ray_session, tmp_path):
    """Events within window_days of the 1970 epoch: the lower probe's
    composite (posc*2^21 + ts_day - window_days) underflows into the
    PREVIOUS user's segment; without the segment-start clamp the count
    includes that user's late orders (ADVICE r2 #1). User 1 has two
    orders at days just under 2^21 (the top of the composite day range)
    so the unclamped lower bound lands inside user 1's segment when
    probing for user 2."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lulu_crawler_ray.pipelines.relational import w5_range_join

    def day_ts(d):
        return np.datetime64(d, "D").astype("datetime64[us]").astype(object)

    orders = pa.table(
        {
            "o_custkey": pa.array([1, 1, 2], pa.int64()),
            "o_orderdate": pa.array(
                [day_ts((1 << 21) - 12), day_ts((1 << 21) - 7), day_ts(0)],
                pa.timestamp("us"),
            ),
        }
    )
    events = pa.table(
        {
            "event_id": pa.array([100], pa.int64()),
            "user_id": pa.array([2], pa.int64()),
            "ts": pa.array([day_ts(10)], pa.timestamp("us")),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(events, str(tmp_path / "events.parquet"))
    out = w5_range_join(str(tmp_path), window_days=30).to_pandas()
    # only user 2's own day-0 order is in (10-30, 10]; the unclamped
    # probe returned 3 (user 1's two high-day orders leaked in)
    assert out["n_orders"].tolist() == [1]


def test_g20_quantile_hist_error_bound(ray_session):
    """The histogram quantile's |est - exact| <= wd // B + 1 cents
    contract, asserted against the exact discrete median."""
    import duckdb
    import numpy as np
    from lulu_crawler_ray.pipelines.relational import g20_quantile_hist

    sf = "/root/testdata/sf0.01"
    got = g20_quantile_hist(sf).to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')")
    ex = con.execute(
        "SELECT l_returnflag, CAST(ROUND(quantile_disc(l_extendedprice, 0.5)*100,0) AS BIGINT) AS q, "
        "CAST(ROUND(MAX(l_extendedprice)*100,0)-ROUND(MIN(l_extendedprice)*100,0) AS BIGINT) AS w "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ).df()
    err = np.abs(got["q_est_c"].to_numpy() - ex["q"].to_numpy())
    assert (err <= ex["w"].to_numpy() // 4096 + 1).all()


def test_cms_overcount_bound(ray_session):
    """CMS point estimates must never undercount, and with d=4 rows of
    w=1024 counters stay within ~2N/w of truth for the hot keys."""
    import duckdb
    import numpy as np
    from lulu_crawler_ray.pipelines.relational import cms_point_estimate

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')")
    top = con.execute(
        "SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY l_partkey ORDER BY c DESC, l_partkey LIMIT 20"
    ).df()
    n_total = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    est = cms_point_estimate(sf, top["l_partkey"].to_numpy())
    true = top["c"].to_numpy()
    assert (est >= true).all()          # CMS never undercounts
    assert (est - true <= 2 * n_total // 1024).all()
