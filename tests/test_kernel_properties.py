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


# ---------------------------------------------------------- banded hamming
@given(
    hashes=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=2, max_size=60
    ),
    max_h=st.integers(0, 12),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_bucket_pairs_banded_equals_dense(hashes, max_h, data):
    """Second-level banding (hot path) returns EXACTLY the dense
    all-pairs result for any hash multiset and radius (pigeonhole)."""
    from lulu_crawler_ray.pipelines.images_pipe import _bucket_pairs

    ph = np.array(hashes, np.int64)
    ids = np.arange(len(ph), dtype=np.int64)
    dense = _bucket_pairs(ids, ph, max_h, hot_threshold=10**9)
    banded = _bucket_pairs(ids, ph, max_h, hot_threshold=1)  # force hot path
    d = set(map(tuple, dense[["a", "b"]].itertuples(index=False)))
    b = set(map(tuple, banded[["a", "b"]].itertuples(index=False)))
    assert d == b


# ---------------------------------------------------------- topk scoring
@given(
    n=st.integers(1, 40),
    dup=st.integers(1, 5),
    k=st.integers(1, 10),
    seed=st.integers(0, 1000),
)
@settings(max_examples=40, deadline=None)
def test_score_topk_duplicate_invariance(n, dup, k, seed):
    """_score_topk over rows duplicated `dup` times (the exploded
    multi-table index shape) equals _score_topk over the distinct rows."""
    from lulu_crawler_ray.pipelines.annsearch import _normalize, _score_topk

    rng = np.random.default_rng(seed)
    m = _normalize(rng.standard_normal((n, 8)))
    ids = np.arange(n, dtype=np.int64)
    qm = _normalize(rng.standard_normal((2, 8)))
    qids = np.array([100, 101], np.int64)  # queries not in corpus
    once = _score_topk(ids, m, qids, qm, k).to_pandas()
    rep_ids = np.repeat(ids, dup)
    rep_m = np.repeat(m, dup, axis=0)
    many = _score_topk(rep_ids, rep_m, qids, qm, k).to_pandas()
    cols = ["query_id", "neighbor_id"]
    assert once[cols].values.tolist() == many[cols].values.tolist()


# ------------------------------------------------------ asof/range probes
@given(
    n_orders=st.integers(0, 60),
    n_events=st.integers(1, 60),
    n_users=st.integers(1, 8),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=40, deadline=None)
def test_asof_composite_index_vs_bruteforce(n_orders, n_events, n_users, seed):
    """The flattened composite-searchsorted probe must equal the naive
    per-row scan for arbitrary (user, date) multisets."""
    import ray

    from lulu_crawler_ray.pipelines.relational import _build_asof_index

    rng = np.random.default_rng(seed)
    o_user = rng.integers(0, n_users, n_orders).astype(np.int64)
    o_day = rng.integers(9000, 9400, n_orders).astype(np.int64)  # ~1994-1995
    e_user = rng.integers(0, n_users + 2, n_events).astype(np.int64)  # some users w/o orders
    e_day = rng.integers(8990, 9410, n_events).astype(np.int64)

    t = pa.table(
        {
            "o_custkey": pa.array(o_user),
            "o_orderdate": pa.array(o_day.astype("datetime64[D]").astype("datetime64[us]")),
        }
    )
    uids, offsets, comp, day = ray.get(_build_asof_index.remote(t))

    pos = np.searchsorted(uids, e_user)
    posc = np.clip(pos, 0, max(len(uids) - 1, 0))
    has = (pos < len(uids)) & (uids[posc] == e_user) if len(uids) else np.zeros(n_events, bool)
    i = np.searchsorted(comp, posc * (1 << 21) + e_day, side="right") - 1
    valid = has & (i >= offsets[posc])
    # brute force: latest order day <= event day for the same user
    for j in range(n_events):
        cands = o_day[(o_user == e_user[j]) & (o_day <= e_day[j])]
        if len(cands):
            assert valid[j]
            assert day[i[j]] == cands.max()
        else:
            assert not valid[j]
    # range-join count over a window: two searchsorteds == brute count
    w = 30
    hi = np.searchsorted(comp, posc * (1 << 21) + e_day, side="right")
    lo = np.searchsorted(comp, posc * (1 << 21) + e_day - w, side="right")
    n = np.where(has, hi - lo, 0)
    for j in range(n_events):
        brute = int(((o_user == e_user[j]) & (o_day <= e_day[j]) & (o_day > e_day[j] - w)).sum())
        assert n[j] == brute


@given(
    st.lists(
        st.tuples(st.text("abcde ", max_size=12), st.text("abcde ", max_size=12)),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=60, deadline=None)
def test_lev_many_matches_reference(pairs):
    """_lev_many (pair-vectorized DP) == the textbook per-pair DP,
    including empty strings and unequal lengths."""
    from lulu_crawler_ray.pipelines.relational import _lev_many

    def ref(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    enc = [(a.encode(), b.encode()) for a, b in pairs]
    L = max((max(len(a), len(b)) for a, b in enc), default=0) or 1
    n = len(enc)
    ac = np.zeros((n, L), np.uint8)
    bc = np.zeros((n, L), np.uint8)
    al = np.zeros(n, np.int32)
    bl = np.zeros(n, np.int32)
    for r, (a, b) in enumerate(enc):
        ac[r, : len(a)] = np.frombuffer(a, np.uint8)
        bc[r, : len(b)] = np.frombuffer(b, np.uint8)
        al[r], bl[r] = len(a), len(b)
    got = _lev_many(ac, al, bc, bl)
    want = [ref(a, b) for a, b in pairs]
    assert list(got) == want


@settings(max_examples=25, deadline=None)
@given(
    sh=st.integers(1, 20),
    sw=st.integers(1, 20),
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 10**6),
)
def test_resize_bilinear_hypothesis_vs_reference(sh, sw, w, h, seed):
    """Random shapes: the vectorized fixed-point bilinear kernel equals
    the per-pixel rational re-derivation, and output stays in range."""
    from lulu_crawler_ray.functions.imagecodec import resize_bilinear

    img = np.random.default_rng(seed).integers(0, 256, (sh, sw, 3), dtype=np.uint8)
    got = resize_bilinear(img, w, h)
    assert got.shape == (h, w, 3)
    for dy in range(h):
        ny = (2 * dy + 1) * sh - h
        y0 = ny // (2 * h)
        fy = ny - y0 * 2 * h
        ya, yb = min(max(y0, 0), sh - 1), min(max(y0 + 1, 0), sh - 1)
        for dx in range(w):
            nx = (2 * dx + 1) * sw - w
            x0 = nx // (2 * w)
            fx = nx - x0 * 2 * w
            xa, xb = min(max(x0, 0), sw - 1), min(max(x0 + 1, 0), sw - 1)
            for ch in range(3):
                p00, p01 = int(img[ya, xa, ch]), int(img[ya, xb, ch])
                p10, p11 = int(img[yb, xa, ch]), int(img[yb, xb, ch])
                acc = (2 * h - fy) * ((2 * w - fx) * p00 + fx * p01) + fy * (
                    (2 * w - fx) * p10 + fx * p11
                )
                den = 4 * w * h
                assert int(got[dy, dx, ch]) == (acc + den // 2) // den


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(0, 400),
    si=st.sampled_from([8000, 11025, 16000, 22050, 44100]),
    so=st.sampled_from([8000, 11025, 16000, 22050, 44100]),
    seed=st.integers(0, 10**6),
)
def test_resample_hypothesis_properties(n, si, so, seed):
    """Random signals/rates: output length law, range preservation,
    identity at equal rates, constant preservation."""
    from lulu_crawler_ray.stages.multimodal import resample_linear_int16

    x = np.random.default_rng(seed).integers(-32768, 32768, n, dtype=np.int16)
    y = resample_linear_int16(x, si, so)
    if si == so or n == 0:
        assert np.array_equal(y, x)
        return
    assert len(y) == n * so // si
    if n:
        assert y.min() >= x.min() and y.max() <= x.max()
    c = np.full(max(n, 1), 777, np.int16)
    assert (resample_linear_int16(c, si, so) == 777).all()
