"""Hypothesis properties for the pure selection/dedup kernels vs pandas
oracles (SURVEY.md §5.2.2), plus the politeness invariant on real crawl
output."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from lulu_crawler_ray.stages.crawl_stages import combine_first_by_seq, topb_per_host


def _frontier_table(rows):
    # rows: list of (host, priority, seq) with unique seq
    return pa.table(
        {
            "host": pa.array([r[0] for r in rows], pa.string()),
            "priority": pa.array([r[1] for r in rows], pa.int32()),
            "seq": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a.test", "b.test", "c.test", "dd.test"]),
        st.integers(0, 3),
        st.integers(0, 10_000),
    ),
    max_size=120,
    unique_by=lambda r: r[2],  # seq globally unique (SURVEY §3.2.3)
)


@settings(max_examples=60)
@given(rows=rows_strategy, budget=st.integers(1, 5))
def test_topb_matches_pandas(rows, budget):
    t = _frontier_table(rows)
    got = topb_per_host(t, budget).to_pandas()
    want = (
        t.to_pandas()
        .sort_values(["host", "priority", "seq"])
        .groupby("host", as_index=False)
        .head(budget)
    )
    got = got.sort_values(["host", "priority", "seq"]).reset_index(drop=True)
    want = want.sort_values(["host", "priority", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


@settings(max_examples=60)
@given(rows=rows_strategy, budget=st.integers(1, 5), split=st.integers(1, 7))
def test_topb_combiner_composes(rows, budget, split):
    """top-B of per-chunk top-Bs == global top-B (the batching-
    independence property the wave selection relies on)."""
    t = _frontier_table(rows)
    whole = topb_per_host(t, budget)
    n = t.num_rows
    chunks = [t.slice(i * n // split, (i + 1) * n // split - i * n // split) for i in range(split)]
    parts = [topb_per_host(c, budget) for c in chunks if c.num_rows]
    recombined = (
        topb_per_host(pa.concat_tables(parts), budget) if parts else t.slice(0, 0)
    )
    a = whole.to_pandas().sort_values("seq").reset_index(drop=True)
    b = recombined.to_pandas().sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@settings(max_examples=60)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from([b"k1", b"k2", b"k3"]), st.integers(0, 5000)),
        max_size=80,
        unique_by=lambda r: r[1],
    )
)
def test_combine_first_by_seq_matches_pandas(rows):
    t = pa.table(
        {
            "key": pa.array([r[0] for r in rows], pa.binary()),
            "seq": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    got = combine_first_by_seq(t, "key").to_pandas()
    want = (
        t.to_pandas().sort_values(["key", "seq"]).groupby("key", as_index=False).head(1)
    )
    pd.testing.assert_frame_equal(
        got.sort_values("key").reset_index(drop=True),
        want.sort_values("key").reset_index(drop=True),
    )


def test_politeness_invariant_on_crawl(tmp_path, ray_session):
    """No host exceeds the per-wave budget in the engine's ledger."""
    import pyarrow.dataset as pads

    from lulu_crawler_ray.config import CrawlConfig, seed_urls
    from lulu_crawler_ray.pipelines.crawl import run_crawl

    cfg = CrawlConfig(seed=33, budget=3, max_depth=4, max_urls=2000, n_hosts=10, num_shards=4)
    out = str(tmp_path / "crawl")
    run_crawl(seed_urls(cfg, 12), cfg, out)
    led = pads.dataset(f"{out}/ledger", format="parquet").to_table().to_pandas()
    per = led.groupby(["wave", "host"]).size()
    assert (per <= cfg.budget).all(), per[per > cfg.budget]
    # ranks contiguous from 0
    ranks = np.sort(led["rank"].to_numpy())
    assert (ranks == np.arange(len(ranks))).all()
