"""Round-5 corpus ops (pipelines/textops2.py): chunk-level dedup,
winnowing fingerprints, integer MIPS — unit properties beyond the
DuckDB oracle gate (which covers all three via test_queries_oracle)."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_chunk_dedup_planted_duplicates(ray_session):
    """A doc that is an exact copy of an earlier doc keeps 0 chunks;
    the earlier doc keeps all of its own."""
    import ray.data

    from lulu_crawler_ray.pipelines import textops2 as t2

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    " ".join(f"w{i}" for i in range(25)),  # 3 chunks
                    " ".join(f"w{i}" for i in range(25)),  # exact dup
                    " ".join(f"x{i}" for i in range(12)),  # 2 fresh chunks
                ]
            ),
        }
    )
    import ray

    ds = ray.data.from_arrow(docs)
    orig_read = t2.read_table
    t2.read_table = lambda sf, name, cols: ds  # inject fixture
    try:
        out = t2.t_chunk_dedup(SF).to_pandas().set_index("doc_id")
    finally:
        t2.read_table = orig_read
    assert out.loc[1, "n_chunks"] == 3 and out.loc[1, "n_kept"] == 3
    assert out.loc[2, "n_chunks"] == 3 and out.loc[2, "n_kept"] == 0
    assert out.loc[3, "n_chunks"] == 2 and out.loc[3, "n_kept"] == 2


def test_winnow_guarantee_and_determinism():
    """Winnowing guarantee: any two docs sharing a run of at least
    k + w - 1 identical tokens share at least one fingerprint; and the
    fingerprint set is deterministic."""
    from lulu_crawler_ray.pipelines.textops2 import WINNOW_K, WINNOW_W, _winnow_doc

    shared = [f"s{i}" for i in range(WINNOW_K + WINNOW_W - 1 + 6)]
    a = [f"a{i}" for i in range(10)] + shared + ["za"]
    b = [f"b{i}" for i in range(7)] + shared + ["zb", "zc"]

    def fps(toks):
        # re-derive the selected hash set (not just the xor) by calling
        # the internals the same way
        import hashlib

        n = len(toks) - WINNOW_K + 1
        h = np.array(
            [
                int(hashlib.md5(" ".join(toks[i : i + WINNOW_K]).encode()).hexdigest()[:15], 16)
                for i in range(n)
            ],
            np.int64,
        )
        win = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W)
        idx = WINNOW_W - 1 - np.argmin(win[:, ::-1], axis=1)
        return set(h[np.unique(np.arange(len(win)) + idx)].tolist())

    assert fps(a) & fps(b), "shared run must share a fingerprint"
    n1, x1 = _winnow_doc(a)
    n2, x2 = _winnow_doc(a)
    assert (n1, x1) == (n2, x2) and n1 > 0


def test_winnow_short_docs():
    from lulu_crawler_ray.pipelines.textops2 import _winnow_doc

    assert _winnow_doc([]) == (0, 0)
    assert _winnow_doc(["one", "two"]) == (0, 0)  # fewer than k tokens
    n, x = _winnow_doc(["a", "b", "c", "d"])  # exactly one gram
    assert n == 1 and x != 0


def test_mips_matches_bruteforce(ray_session):
    """e_mips_topk's distributed partial-topk must equal a driver-side
    exact computation on the same quantized integers."""
    import duckdb

    from lulu_crawler_ray.pipelines.textops2 import e_mips_topk

    got = e_mips_topk(SF).to_pandas()
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    m = np.rint(np.array(emb["embedding"].tolist(), np.float64) * 1e6).astype(np.int64)
    ids = emb["vec_id"].to_numpy(np.int64)
    for qi in range(3):
        ip = m @ m[ids == qi][0]
        mask = ids != qi
        order = np.lexsort((ids[mask], -ip[mask]))[:5]
        want_n = ids[mask][order]
        g = got[got["query_id"] == qi].sort_values("rnk")
        assert np.array_equal(g["neighbor_id"].to_numpy(np.int64), want_n)
        assert np.array_equal(g["ip_e12"].to_numpy(np.int64), ip[mask][order])


def test_dupspans_planted(ray_session):
    """Cross-doc shared runs, within-doc self-repeats, and unique docs
    get the exact interval-union coverage (K=8)."""
    import ray
    import ray.data

    from lulu_crawler_ray.pipelines import textops2 as t2

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    " ".join(f"w{i}" for i in range(20)),  # 20 toks
                    " ".join(f"a{i}" for i in range(5))
                    + " "
                    + " ".join(f"w{i}" for i in range(10)),  # shares w0..w9
                    " ".join(f"r{i % 8}" for i in range(16)),  # self-repeat
                    " ".join(f"x{i}" for i in range(10)),  # unique
                ]
            ),
        }
    )
    ds = ray.data.from_arrow(docs)
    orig = t2.read_table
    t2.read_table = lambda sf, name, cols: ds
    try:
        out = t2.t_dupspans(SF).to_pandas().set_index("doc_id")
    finally:
        t2.read_table = orig
    # doc1/doc2 share the 10-token run w0..w9 -> 3 dup grams -> 10 covered
    assert out.loc[1, "n_tokens"] == 20 and out.loc[1, "dup_tokens"] == 10
    assert out.loc[2, "n_tokens"] == 15 and out.loc[2, "dup_tokens"] == 10
    # doc3 = r0..r7 r0..r7: the 8-gram at pos 1 equals the one at pos 9
    # (the cyclic middle grams are unique) -> union [1,8]+[9,16] = 16
    assert out.loc[3, "n_tokens"] == 16 and out.loc[3, "dup_tokens"] == 16
    assert out.loc[4, "n_tokens"] == 10 and out.loc[4, "dup_tokens"] == 0


def test_semdedup_planted_twins(ray_session):
    """Identical vectors co-cluster (exact-int ties) and the larger
    vec_id of each twin pair is dropped; singletons survive."""
    import ray
    import ray.data

    from lulu_crawler_ray.pipelines import textops2 as t2

    base = np.eye(4, 8, dtype=np.float64) * 0.3  # 4 well-separated seeds
    vecs = np.vstack([base, base[0:1], base[3:4]])  # 4=twin of 0, 5=twin of 3
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(6, dtype=np.int64)),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(emb)
    orig = t2.read_table
    t2.read_table = lambda sf, name, cols: ds
    try:
        out = t2.e_semdedup(SF).to_pandas().set_index("vec_id")
    finally:
        t2.read_table = orig
    assert out.loc[4, "kept"] == 0 and out.loc[5, "kept"] == 0
    assert (out.loc[[0, 1, 2, 3], "kept"] == 1).all()
    assert out.loc[4, "cid"] == out.loc[0, "cid"]
    assert out.loc[5, "cid"] == out.loc[3, "cid"]
