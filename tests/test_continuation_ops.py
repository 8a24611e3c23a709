"""Continuation-session ops: edge-case invariants for n-gram novelty,
DSIR weights, the exact kNN graph, and the rolling median. (DuckDB
oracle equality at sf0.01 runs via the auto-parametrized gate in
test_queries_oracle.py.)"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def _docs_dir(tmp_path, rows: dict) -> str:
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    return str(d)


def test_novelty_identical_docs_first_wins(ray_session, tmp_path):
    """Three identical docs: doc 0 owns every trigram (novelty 1e6),
    docs 1/2 add nothing (novelty 0) but count the same grams."""
    from lulu_crawler_ray.pipelines.textops3 import t_ngram_novelty

    sf = _docs_dir(
        tmp_path,
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c d e"] * 3),
            "lang": pa.array(["en"] * 3),
        },
    )
    df = t_ngram_novelty(sf).to_pandas()
    assert df["n_grams"].tolist() == [3, 3, 3]  # abc bcd cde
    assert df["n_novel"].tolist() == [3, 0, 0]
    assert df["novelty_ppm"].tolist() == [1_000_000, 0, 0]


def test_novelty_short_docs_emit_nothing(ray_session, tmp_path):
    from lulu_crawler_ray.pipelines.textops3 import t_ngram_novelty

    sf = _docs_dir(
        tmp_path,
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b", "x y z"]),
            "lang": pa.array(["en", "en"]),
        },
    )
    df = t_ngram_novelty(sf).to_pandas()
    assert df["doc_id"].tolist() == [1]  # doc 0 has no trigram


def test_dsir_all_target_saturates(ray_session, tmp_path):
    """Every doc in the target language -> every token term is exactly
    1e6 ppm, so dsir_avg_e6 saturates at 1e6 for every doc."""
    from lulu_crawler_ray.pipelines.textops3 import t_dsir_weights

    sf = _docs_dir(
        tmp_path,
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["hello world", "world again hello"]),
            "lang": pa.array(["en", "en"]),
        },
    )
    df = t_dsir_weights(sf).to_pandas()
    assert df["dsir_avg_e6"].tolist() == [1_000_000, 1_000_000]
    assert df["n_tokens"].tolist() == [2, 3]


def test_dsir_disjoint_vocab_zero(ray_session, tmp_path):
    """A non-target doc sharing no tokens with the target corpus
    scores exactly 0."""
    from lulu_crawler_ray.pipelines.textops3 import t_dsir_weights

    sf = _docs_dir(
        tmp_path,
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["aa bb cc", "xx yy"]),
            "lang": pa.array(["en", "de"]),
        },
    )
    df = t_dsir_weights(sf).to_pandas().set_index("doc_id")
    assert df.loc[1, "dsir_e6"] == 0
    assert df.loc[0, "dsir_avg_e6"] == 1_000_000


def test_knn_graph_agrees_with_mips_on_queries(ray_session):
    """The kNN graph restricted to vec_id < 3 must equal e_mips_topk's
    per-query neighbor lists (same quantization, same tie rule)."""
    from lulu_crawler_ray.pipelines.annsearch import e_knn_graph
    from lulu_crawler_ray.pipelines.textops2 import e_mips_topk

    k = 3
    g = e_knn_graph(SF, k=k).to_pandas()
    m = e_mips_topk(SF, k=k, n_queries=3).to_pandas()
    sub = g[g["vec_id"] < 3].reset_index(drop=True)
    assert sub["neighbor_id"].tolist() == m["neighbor_id"].tolist()
    assert sub["ip_e12"].tolist() == m["ip_e12"].tolist()


def test_knn_graph_refuses_above_bound(ray_session):
    from lulu_crawler_ray.pipelines.annsearch import e_knn_graph

    with pytest.raises(ValueError, match="IVF"):
        e_knn_graph(SF, k=3, dim_max=10)


def test_rolling_median_window_one_is_identity(ray_session):
    from lulu_crawler_ray.pipelines.relational import w13_rolling_median
    from lulu_crawler_ray.sources.testdata import read_table

    df = w13_rolling_median(SF, window=1).to_pandas()
    raw = (
        read_table(SF, "events", ["event_id", "value"])
        .to_pandas()
        .set_index("event_id")["value"]
    )
    assert np.allclose(df["med"].to_numpy(), raw.loc[df["event_id"]].round(4).to_numpy())


def _orders_dir(tmp_path, keys, days):
    """orders.parquet with o_orderdate = epoch + days[i] (midnight us)."""
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    ts = (np.asarray(days, np.int64) * 86_400_000_000).astype("datetime64[us]")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_orderdate": pa.array(ts),
            }
        ),
        str(d / "orders.parquet"),
    )
    return str(d)


def test_interval_join_bucket_boundary_emits_once(ray_session, tmp_path):
    """A pair whose two intervals straddle a bucket boundary must be
    emitted exactly once (the max(lo)-owns-the-pair dedup rule), and a
    half-open touch (a.hi == b.lo) must NOT join."""
    from lulu_crawler_ray.pipelines.relational import j11_interval_join

    # mod_a=199: keys 199x are side A; mod_b=211: keys 211x+1 side B
    # A interval [14, 21) spans buckets 0 and 1 (W=16);
    # B1 [15, 25) overlaps it in both buckets -> exactly one output row
    # B2 [21, 31) touches a.hi exactly -> no overlap (half-open)
    sf = _orders_dir(
        tmp_path,
        keys=[199, 212, 423],  # 199%199=0; 212%211=1; 423%211=1
        days=[14, 15, 21],
    )
    df = j11_interval_join(sf).to_pandas()
    assert df[["a_key", "b_key"]].values.tolist() == [[199, 212]]
    assert df["ov_days"].tolist() == [21 - 15]


def test_interval_join_same_bucket_pair(ray_session, tmp_path):
    from lulu_crawler_ray.pipelines.relational import j11_interval_join

    # both in bucket 0, partial overlap [3,10)+[5,15) -> ov [5,10) = 5
    sf = _orders_dir(tmp_path, keys=[199, 212], days=[3, 5])
    df = j11_interval_join(sf).to_pandas()
    assert df["ov_days"].tolist() == [5]


def test_chi2_uniform_table_zero_contrib(ray_session, tmp_path):
    """A perfectly balanced contingency table has chi2 = 0 in every
    cell (obs*N == rt*ct exactly)."""
    from lulu_crawler_ray.pipelines.relational import g28_chi2

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    n_grp, types, reps = 7, ["a", "b"], 3
    uid, et = [], []
    for t in types:
        for g in range(n_grp):
            for r in range(reps):
                uid.append(g + r * n_grp)
                et.append(t)
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array(et),
                "user_id": pa.array(uid, pa.int64()),
            }
        ),
        str(d / "events.parquet"),
    )
    df = g28_chi2(str(d)).to_pandas()
    assert len(df) == len(types) * n_grp
    assert (df["contrib_e6"] == 0).all()
    assert (df["obs"] == reps).all()


def test_maxsim_prefers_token_aligned_doc(ray_session, tmp_path):
    """Query doc 0 (docs of 2 tokens: e0, e1) must score doc with the
    same two basis directions above a doc sharing only one."""
    from lulu_crawler_ray.pipelines.annsearch import e_maxsim

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    dim = 4

    def v(i, s=1.0):
        x = np.zeros(dim, np.float32)
        x[i] = s
        return x

    # doc0 (q): tokens e0, e1 ; doc1: e0, e1 (perfect) ; doc2: e0, e2
    vecs = [v(0), v(1), v(0, 0.9), v(1, 0.9), v(0, 0.8), v(2)]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(6), pa.int64()),
                "embedding": pa.array([x.tolist() for x in vecs],
                                      pa.list_(pa.float32())),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    df = e_maxsim(str(d), tokens_per_doc=2, q_mod=3, k=2).to_pandas()
    q0 = df[df["q_doc"] == 0]
    assert q0["d_doc"].tolist() == [1, 2]
    # doc1: 1e6*0.9e6 + 1e6*0.9e6 = 1.8e12 ; doc2: 0.8e12 + 0
    assert q0["maxsim_e12"].tolist() == [1_800_000_000_000, 800_000_000_000]


def test_interval_join_paths_agree(ray_session):
    """The broadcast fast path and the bucketed co-partitioned fallback
    must produce identical pairs (bcast_max=0 forces the fallback)."""
    from lulu_crawler_ray.pipelines.relational import j11_interval_join

    fast = j11_interval_join(SF).to_pandas()
    slow = j11_interval_join(SF, bcast_max=0).to_pandas()
    assert fast.values.tolist() == slow.values.tolist()
    assert len(fast) > 0


def test_patchify_matches_naive(ray_session):
    """PatchifyStage's reshape/transpose patch sums must equal a naive
    triple-loop recompute, including the edge-replication padding."""
    from lulu_crawler_ray.pipelines.images_pipe import PatchifyStage
    from lulu_crawler_ray.functions.imagecodec import encode

    rng = np.random.default_rng(7)
    P = 8
    img = rng.integers(0, 256, (19, 13, 3), np.uint8)  # non-multiples of P
    data = encode(img, "ppm")
    t = pa.table(
        {
            "image_id": pa.array(["x"]),
            "bytes": pa.array([data], pa.binary()),
            "fmt": pa.array(["ppm"]),
        }
    )
    out = PatchifyStage(patch=P)(t)
    # naive: pad by edge replication, loop patches row-major
    h, w = img.shape[:2]
    pad = np.pad(img, ((0, (P - h % P) % P), (0, (P - w % P) % P), (0, 0)), mode="edge")
    gh, gw = pad.shape[0] // P, pad.shape[1] // P
    wsum, idx = 0, 1
    for r in range(gh):
        for c in range(gw):
            wsum += int(pad[r * P : (r + 1) * P, c * P : (c + 1) * P].astype(np.int64).sum()) * idx
            idx += 1
    assert out["grid_h"][0].as_py() == gh == 3
    assert out["grid_w"][0].as_py() == gw == 2
    assert out["patch_wsum"][0].as_py() == wsum


def test_patchify_digest_pinned(ray_session):
    """The golden-pin digest in oracle_sql() must match a fresh run
    (fixture is seed-deterministic)."""
    from lulu_crawler_ray.pipelines.images_pipe import img_patchify_digest_query

    t = img_patchify_digest_query(SF)
    assert {c: t[c][0].as_py() for c in t.column_names} == {
        "n_rows": 200,
        "sum_grid_h": 1822,
        "mix_grid_h": 416,
        "sum_grid_w": 1774,
        "mix_grid_w": 518,
        "sum_patch_wsum": 22878729088,
        "mix_patch_wsum": 230454307392,
    }


def test_daily_extremes_single_event_day(ray_session, tmp_path):
    """A (user, day) with one event has first_c == last_c; ties on ts
    break by event_id on BOTH ends."""
    from lulu_crawler_ray.pipelines.relational import w15_daily_extremes

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    base = np.datetime64("2024-03-01T10:00:00", "us")
    # user 1: two events SAME timestamp, ids 5 and 6 -> first=id5, last=id6
    # user 2: one event
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([1, 1, 2], pa.int64()),
                "ts": pa.array([base, base, base + 60_000_000]),
                "event_id": pa.array([6, 5, 7], pa.int64()),
                "value": pa.array([2.0, 1.0, 9.5]),
            }
        ),
        str(d / "events.parquet"),
    )
    df = w15_daily_extremes(str(d)).to_pandas()
    assert df["first_c"].tolist() == [100, 950]
    assert df["last_c"].tolist() == [200, 950]


def test_gap_fill_carries_across_silent_days(ray_session, tmp_path):
    """User with events on days 0, 3 (range 0..3): days 1-2 carry day
    0's CLOSE (latest (ts, event_id) that day); a single-day user emits
    exactly one row; no row before a user's first observed day."""
    from lulu_crawler_ray.pipelines.relational import w14_gap_fill

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    day0 = np.datetime64("2024-03-01T08:00:00", "us")
    pq.write_table(
        pa.table(
            {
                # user 1: day0 has two events (close = later one), then
                # silence, then day+3; user 2: one event only
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "ts": pa.array(
                    [day0, day0 + 3_600_000_000, day0 + 3 * 86_400_000_000, day0]
                ),
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "value": pa.array([1.0, 2.5, 7.0, 9.0]),
            }
        ),
        str(d / "events.parquet"),
    )
    df = w14_gap_fill(str(d)).to_pandas()
    d0 = int(df[df.user_id == 1]["day"].iloc[0])
    assert df[df.user_id == 1]["day"].tolist() == [d0, d0 + 1, d0 + 2, d0 + 3]
    assert df[df.user_id == 1]["filled_c"].tolist() == [250, 250, 250, 700]
    assert df[df.user_id == 2]["filled_c"].tolist() == [900]


def test_bitwise_agg_identities(ray_session, tmp_path):
    """XOR of a value with itself cancels; OR/AND of one element is the
    element; groups come out sorted."""
    from lulu_crawler_ray.pipelines.relational import g29_bitwise

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    base = np.datetime64("2024-03-01T10:00:00", "us")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array([base] * 3),
                "user_id": pa.array([1, 1, 1], pa.int64()),
                "event_type": pa.array(["b", "b", "a"]),
                "value": pa.array([0.05, 0.05, 0.03]),  # cents 5, 5, 3
                "props": pa.array(["{}"] * 3),
            }
        ),
        str(d / "events.parquet"),
    )
    df = g29_bitwise(str(d)).to_pandas()
    assert df["event_type"].tolist() == ["a", "b"]
    assert df[df.event_type == "b"][["orv", "andv", "xorv"]].values.tolist() == [[5, 5, 0]]
    assert df[df.event_type == "a"][["orv", "andv", "xorv"]].values.tolist() == [[3, 3, 3]]


def test_dim_stats_matches_naive(ray_session):
    """e_dim_stats' integer moments equal a single-process numpy
    recompute over the same quantized matrix."""
    import pyarrow.parquet as _pq
    from lulu_crawler_ray.pipelines.annsearch import e_dim_stats

    t = _pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    q = np.rint(m * 1_000_000).astype(np.int64)
    df = e_dim_stats(SF).to_pandas()
    assert df["dim"].tolist() == list(range(1, q.shape[1] + 1))
    assert (df["n"] == q.shape[0]).all()
    assert df["sum_q"].to_numpy().tolist() == q.sum(axis=0).tolist()
    assert df["sumsq_q"].to_numpy().tolist() == (q * q).sum(axis=0).tolist()


def test_cov_matrix_matches_naive(ray_session):
    """e_cov_matrix's integer upper-triangle X^T X equals a
    single-process numpy recompute over the same quantized matrix,
    regardless of how Ray split the batches."""
    import pyarrow.parquet as _pq
    from lulu_crawler_ray.pipelines.annsearch import e_cov_matrix

    t = _pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    q = np.rint(m * 1000).astype(np.int64)
    g = q.T @ q
    iu = np.triu_indices(q.shape[1])
    df = e_cov_matrix(SF).to_pandas()
    assert len(df) == len(iu[0])
    assert df["dim_i"].tolist() == (iu[0] + 1).tolist()
    assert df["dim_j"].tolist() == (iu[1] + 1).tolist()
    assert (df["n"] == q.shape[0]).all()
    assert df["sumprod_q"].to_numpy().tolist() == g[iu].tolist()
    # diagonal of the cov stat == e_dim_stats' sumsq at matching scale
    diag = df[df.dim_i == df.dim_j]["sumprod_q"].to_numpy()
    assert diag.tolist() == (q * q).sum(axis=0).tolist()


def test_pii_redact_kernel_semantics(ray_session):
    """The scrub kernel on crafted strings: multiple matches per doc,
    placeholder ordering (email before ip before phone), and the
    \\b guards on ip/phone (digits embedded in longer runs don't
    match)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from lulu_crawler_ray.pipelines.textops3 import (
        _PII_EMAIL,
        _PII_IPV4,
        _PII_PHONE,
    )

    txt = pa.array(
        [
            "mail a.b@x.io and c@y.org ip 1.2.3.4 call 555-111-2222",
            "no pii here at all",
            "version 1.2.3.4.5 is not an ip boundary case 12345-678-90123",
        ]
    )
    n_email = pc.count_substring_regex(txt, pattern=_PII_EMAIL).to_pylist()
    n_ip = pc.count_substring_regex(txt, pattern=_PII_IPV4).to_pylist()
    n_phone = pc.count_substring_regex(txt, pattern=_PII_PHONE).to_pylist()
    assert n_email == [2, 0, 0]
    # "1.2.3.4.5": RE2 \b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b scans
    # left-to-right; "1.2.3.4" is followed by '.', which is a \b, so
    # the leading window still matches — same in DuckDB (both RE2).
    assert n_ip == [1, 0, 1]
    assert n_phone == [1, 0, 0]
    red = pc.replace_substring_regex(txt, pattern=_PII_EMAIL, replacement="<EMAIL>")
    red = pc.replace_substring_regex(red, pattern=_PII_IPV4, replacement="<IP>")
    red = pc.replace_substring_regex(red, pattern=_PII_PHONE, replacement="<PHONE>")
    assert red.to_pylist()[0] == "mail <EMAIL> and <EMAIL> ip <IP> call <PHONE>"


def test_pii_redact_full_vs_duckdb(ray_session, tmp_path):
    """End-to-end on a tiny synthesized documents table, including an
    empty doc and a doc whose own text already carries PII-shaped
    strings (the augmentation must compose, not clobber)."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lulu_crawler_ray.pipelines.textops3 import t_pii_redact, t_pii_redact_sql

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 300], pa.int64()),
            "text": pa.array(
                [
                    "",
                    "write to ops@corp.example please",
                    "server 192.168.0.1 hotline 555-000-1111",
                    "plain text",
                ]
            ),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = t_pii_redact(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(t_pii_redact_sql()).df()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    assert got["n_email"].tolist() == [1, 2, 1, 1]
    assert got["n_ip"].tolist() == [1, 1, 2, 1]
