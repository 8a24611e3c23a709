"""Round-5 corpus operators: chunk-level (paragraph-style) exact
dedup, winnowing document fingerprints (the MOSS/local-fingerprint
algorithm), and exact-integer max-inner-product search. Each is a
`queries()` entry with a bit-exact DuckDB oracle (__ray_entry__), built
on the adaptive scale machinery from relational.py.

No reference file:line citations are possible — /root/reference is
empty (SURVEY.md §0); the spec base is BASELINE.json + public
algorithm descriptions (winnowing: Schleimer/Wilkerson/Aiken,
SIGMOD'03)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..sources.testdata import read_table
from .relational import adaptive_dim_join, grouped_agg

CHUNK_TOKENS = 10
WINNOW_K = 4  # tokens per k-gram
WINNOW_W = 5  # k-grams per window


def _tokens(text: str) -> list[str]:
    return [t for t in text.split() if t]


def _explode_chunks(t: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, chunk_idx, chunk): consecutive
    CHUNK_TOKENS-token chunks (the corpus has no newlines, so fixed
    token windows stand in for paragraphs; the oracle slices the same
    way). Empty docs emit no chunks."""
    ids, idxs, chunks = [], [], []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = _tokens(text)
        for i in range(0, len(toks), CHUNK_TOKENS):
            ids.append(did)
            idxs.append(i // CHUNK_TOKENS)
            chunks.append(" ".join(toks[i : i + CHUNK_TOKENS]))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "chunk": pa.array(chunks, pa.string()),
        }
    )


def t_chunk_dedup(sf: str):
    """Paragraph-level exact dedup (the chunk-granular form of
    ExactSubstr-style corpus cleaning): explode docs into 10-token
    chunks, keep each distinct chunk's FIRST occurrence in (doc_id,
    chunk_idx) order, report per-doc (n_chunks, n_kept). Distributed
    shape: per-batch explode -> grouped MIN of the packed order key
    (the shuffle carries one row per distinct chunk per block after
    the batch combiner inside grouped_agg) -> adaptive join back ->
    vectorized keep filter -> two small grouped counts. The chunk
    strings ride exactly two exchanges; no driver gather anywhere."""
    docs = read_table(sf, "documents", ["doc_id", "text"])
    exploded = docs.map_batches(_explode_chunks, batch_format="pyarrow")

    def pack_order(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        cidx = t["chunk_idx"].to_numpy()
        if len(did) and (did.max() >= (1 << 31) or cidx.max() >= (1 << 32)):
            # (doc_id, chunk_idx) packs into one int64 for the grouped
            # MIN; outside this domain the pack would collide — fail
            # loudly rather than silently misorder
            raise ValueError("t_chunk_dedup: doc_id/chunk_idx outside packable domain")
        return t.append_column("ord", pa.array(did * (1 << 32) + cidx, pa.int64()))

    ordered = exploded.map_batches(pack_order, batch_format="pyarrow")
    mins = grouped_agg(ordered, ["chunk"], [("mo", "min", "ord")], round_to=None)
    joined = adaptive_dim_join(ordered, "chunk", mins, "chunk", ["mo"])
    kept = joined.map_batches(
        lambda t: t.filter(
            pa.array(
                t["ord"].to_numpy(zero_copy_only=False)
                == t["mo"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )
    n_all = grouped_agg(exploded, ["doc_id"], [("n_chunks", "count", None)], round_to=None)
    n_kept = grouped_agg(kept, ["doc_id"], [("n_kept", "count", None)], round_to=None)

    all_docs = docs.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    out = adaptive_dim_join(all_docs, "doc_id", n_all, "doc_id", ["n_chunks"], how="left")
    out = adaptive_dim_join(out, "doc_id", n_kept, "doc_id", ["n_kept"], how="left")

    def finish(t: pa.Table) -> pa.Table:
        def fill(col):
            v = t[col].to_pandas().fillna(0).to_numpy(np.int64)
            return pa.array(v, pa.int64())

        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chunks": fill("n_chunks"),
                "n_kept": fill("n_kept"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("doc_id")


def t_chunk_dedup_sql() -> str:
    p = CHUNK_TOKENS
    return (
        "WITH d2 AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), "
        "x -> x <> '') AS l FROM documents), "
        "chunks AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, "
        f"array_to_string(l[(CAST(i AS BIGINT)*{p}+1):(CAST(i AS BIGINT)*{p}+{p})], ' ') AS chunk "
        "FROM d2 CROSS JOIN LATERAL (SELECT UNNEST(range(0, "
        f"CAST(ceil(len(l)/{p}.0) AS BIGINT))) AS i) t WHERE len(l) > 0), "
        "ranked AS (SELECT doc_id, chunk_idx, chunk, ROW_NUMBER() OVER "
        "(PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn FROM chunks) "
        "SELECT d.doc_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_chunks, "
        "CAST(COALESCE(k.n, 0) AS BIGINT) AS n_kept "
        "FROM (SELECT doc_id FROM documents) d "
        "LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM chunks GROUP BY 1) c USING (doc_id) "
        "LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM ranked WHERE rn = 1 GROUP BY 1) k "
        "USING (doc_id) ORDER BY doc_id"
    )


def _winnow_doc(toks: list[str]) -> tuple[int, int]:
    """(n_fingerprints, xor of selected 60-bit hashes) for one doc via
    winnowing: hash every WINNOW_K-token gram (md5-derived 60-bit int,
    BIGINT-safe on the oracle side), slide a WINNOW_W window, select
    the window MIN with RIGHTMOST tie-break, dedup selected (pos, h)
    pairs. Inner math is numpy over the doc's gram array."""
    n = len(toks) - WINNOW_K + 1
    if n <= 0:
        return 0, 0
    h = np.empty(n, np.int64)
    for i in range(n):
        g = " ".join(toks[i : i + WINNOW_K])
        h[i] = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
    if n <= WINNOW_W:
        mn = h.min()
        pos = int(np.flatnonzero(h == mn).max())
        return 1, int(h[pos])
    win = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W)
    rev_arg = np.argmin(win[:, ::-1], axis=1)
    idx = WINNOW_W - 1 - rev_arg  # rightmost min per window
    pos = np.arange(len(win)) + idx
    sel = np.unique(pos)
    return len(sel), int(np.bitwise_xor.reduce(h[sel]))


def t_winnow(sf: str):
    """Winnowing document fingerprints (Schleimer et al., the standard
    local fingerprinting scheme for near-dup detection at scale): per
    doc, the count and xor-fold of selected k-gram hashes. One
    streaming map — no shuffle at all; each batch loops docs but the
    per-doc window math is numpy."""
    docs = read_table(sf, "documents", ["doc_id", "text"])

    def per_batch(t: pa.Table) -> pa.Table:
        ids, ns, xs = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            nfp, x = _winnow_doc(_tokens(text))
            ids.append(did)
            ns.append(nfp)
            xs.append(x)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_fp": pa.array(ns, pa.int64()),
                "fp_xor": pa.array(xs, pa.int64()),
            }
        )

    return docs.map_batches(per_batch, batch_format="pyarrow").sort("doc_id")


def t_winnow_sql() -> str:
    k, w = WINNOW_K, WINNOW_W
    return (
        "WITH d2 AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), "
        "x -> x <> '') AS l FROM documents), "
        "grams AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, "
        "CAST(CAST('0x' || substr(md5(array_to_string("
        f"l[CAST(i AS BIGINT):(CAST(i AS BIGINT)+{k}-1)], ' ')), 1, 15) AS UBIGINT) AS BIGINT) AS h "
        f"FROM d2 CROSS JOIN LATERAL (SELECT UNNEST(range(1, len(l)-{k}+2)) AS i) t "
        f"WHERE len(l) >= {k}), "
        "nn AS (SELECT doc_id, MAX(pos) AS np FROM grams GROUP BY 1), "
        "starts AS (SELECT doc_id, CAST(w0 AS BIGINT) AS w0 FROM nn CROSS JOIN LATERAL "
        f"(SELECT UNNEST(range(1, GREATEST(np-{w}+1, 1)+1)) AS w0) s), "
        "wins AS (SELECT g.doc_id, st.w0, MIN(g.h) AS mh FROM grams g "
        "JOIN starts st ON g.doc_id = st.doc_id AND g.pos BETWEEN st.w0 AND st.w0+"
        f"{w}-1 GROUP BY 1, 2), "
        "sel0 AS (SELECT wi.doc_id, wi.w0, wi.mh, MAX(g.pos) AS spos FROM wins wi "
        "JOIN grams g ON g.doc_id = wi.doc_id AND g.h = wi.mh AND g.pos BETWEEN "
        f"wi.w0 AND wi.w0+{w}-1 GROUP BY 1, 2, 3), "
        "fp AS (SELECT DISTINCT doc_id, spos, mh FROM sel0), "
        "agg AS (SELECT doc_id, COUNT(*) AS n_fp, bit_xor(mh) AS fx FROM fp GROUP BY 1) "
        "SELECT d.doc_id, CAST(COALESCE(a.n_fp, 0) AS BIGINT) AS n_fp, "
        "CAST(COALESCE(a.fx, 0) AS BIGINT) AS fp_xor "
        "FROM (SELECT doc_id FROM documents) d LEFT JOIN agg a USING (doc_id) "
        "ORDER BY doc_id"
    )


def e_mips_topk(sf: str, k: int = 5, n_queries: int = 3):
    """Exact-integer max-inner-product top-k (the retrieval scoring a
    recommender / reranker runs; cosine's unnormalized sibling):
    embeddings quantize to e6 ints, scores are exact int64 inner
    products, per-block partial top-k + one small finalize (the
    relational.topk shape applied per query). Ties break neighbor_id
    asc; self excluded."""
    emb = read_table(sf, "embeddings", ["vec_id", "embedding"])

    q_t = emb.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], n_queries)),
        batch_format="pyarrow",
    ).to_pandas().sort_values("vec_id")
    qids = q_t["vec_id"].to_numpy(np.int64)
    qm = np.rint(np.array(q_t["embedding"].tolist(), np.float64) * 1e6).astype(np.int64)
    ref = ray.put((qids, qm))

    def partial(t: pa.Table) -> pa.Table:
        qids_, qm_ = ray.get(ref)
        ids = t["vec_id"].to_numpy()
        m = np.rint(np.array(t["embedding"].to_pylist(), np.float64) * 1e6).astype(np.int64)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qids_)):
            ip = m @ qm_[qi]
            mask = ids != qids_[qi]
            cid, cip = ids[mask], ip[mask]
            order = np.lexsort((cid, -cip))[:k]
            out_q.extend([int(qids_[qi])] * len(order))
            out_n.extend(cid[order].tolist())
            out_s.extend(cip[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "ip_e12": pa.array(out_s, pa.int64()),
            }
        )

    parts = emb.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = {"query_id": [], "neighbor_id": [], "ip_e12": [], "rnk": []}
    for qid, g in parts.groupby("query_id"):
        g = g.drop_duplicates(["neighbor_id"]).sort_values(
            ["ip_e12", "neighbor_id"], ascending=[False, True]
        ).head(k)
        rows["query_id"].extend([qid] * len(g))
        rows["neighbor_id"].extend(g["neighbor_id"])
        rows["ip_e12"].extend(g["ip_e12"])
        rows["rnk"].extend(range(1, len(g) + 1))
    return pa.table(
        {
            "query_id": pa.array(rows["query_id"], pa.int64()),
            "neighbor_id": pa.array(rows["neighbor_id"], pa.int64()),
            "ip_e12": pa.array(rows["ip_e12"], pa.int64()),
            "rnk": pa.array(rows["rnk"], pa.int64()),
        }
    )


def e_mips_topk_sql(k: int = 5, n_queries: int = 3) -> str:
    return (
        "WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
        "CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS v "
        "FROM embeddings), "
        f"q AS (SELECT * FROM u WHERE vec_id < {n_queries}), "
        "s AS (SELECT q.vec_id AS qid, u.vec_id AS nid, "
        "CAST(SUM(q.v * u.v) AS BIGINT) AS ip FROM q JOIN u "
        "ON q.i = u.i AND u.vec_id <> q.vec_id GROUP BY 1, 2), "
        "r AS (SELECT qid, nid, ip, ROW_NUMBER() OVER (PARTITION BY qid "
        "ORDER BY ip DESC, nid) AS rn FROM s) "
        "SELECT CAST(qid AS BIGINT) AS query_id, CAST(nid AS BIGINT) AS neighbor_id, "
        f"ip AS ip_e12, CAST(rn AS BIGINT) AS rnk FROM r WHERE rn <= {k} "
        "ORDER BY query_id, rnk"
    )


def _explode_fps(t: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, h): the doc's winnowing fingerprint
    hashes (selected k-gram hashes, deduped per doc)."""
    ids, hs = [], []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = _tokens(text)
        n = len(toks) - WINNOW_K + 1
        if n <= 0:
            continue
        h = np.empty(n, np.int64)
        for i in range(n):
            h[i] = int(
                hashlib.md5(" ".join(toks[i : i + WINNOW_K]).encode()).hexdigest()[:15], 16
            )
        if n <= WINNOW_W:
            sel = np.array([int(np.flatnonzero(h == h.min()).max())])
        else:
            win = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W)
            idx = WINNOW_W - 1 - np.argmin(win[:, ::-1], axis=1)
            sel = np.unique(np.arange(len(win)) + idx)
        for hv in np.unique(h[sel]):
            ids.append(did)
            hs.append(int(hv))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "h": pa.array(hs, pa.int64())})


def t_winnow_pairs(sf: str, min_shared: int = 2, max_df: int = 256):
    """Fingerprint-based near-dup candidates (the winnowing sibling of
    MinHash LSH banding): docs sharing >= min_shared selected
    fingerprints. Distributed shape identical to the LSH band join —
    explode (doc, fingerprint), groupby fingerprint, emit in-bucket
    pairs, grouped count, HAVING filter. A bucket larger than
    ``max_df`` docs is a corpus-boilerplate fingerprint whose pair
    explosion is quadratic (the hot-bucket problem; the 10x scale
    smoke hit it at 28.9 s) — it is DROPPED, the standard
    stop-fingerprint cut, and the oracle applies the identical cut so
    the gate stays bit-exact."""
    docs = read_table(sf, "documents", ["doc_id", "text"])
    fps = docs.map_batches(_explode_fps, batch_format="pyarrow")

    def bucket_pairs(t: pa.Table) -> pa.Table:
        # one whole hash-partition per call: emit all in-bucket pairs,
        # fully vectorized (the 10x scale smoke measured the per-group
        # Python loop at ~30 s for 12.5M intermediate pairs; this is
        # one segmented-expansion pass)
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(h) == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        order = np.lexsort((d, h))
        h_s, d_s = h[order], d[order]
        # group boundaries per fingerprint ((doc, h) pairs are unique
        # by construction of _explode_fps)
        starts = np.r_[0, np.flatnonzero(h_s[1:] != h_s[:-1]) + 1]
        sizes = np.r_[starts[1:], len(h_s)] - starts
        keep = (sizes > 1) & (sizes <= max_df)
        if not keep.any():
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        g_start = starts[keep]
        g_size = sizes[keep]
        # absolute indices of kept-group members and their in-group pos
        mem = np.repeat(g_start, g_size) + (
            np.arange(int(g_size.sum())) - np.repeat(np.cumsum(g_size) - g_size, g_size)
        )
        pos = mem - np.repeat(g_start, g_size)
        rep = np.repeat(g_size, g_size) - 1 - pos  # pairs each member opens
        total = int(rep.sum())
        if total == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        a_idx = np.repeat(mem, rep)
        # b runs over the members AFTER a within the same group
        csum = np.cumsum(rep) - rep
        b_idx = a_idx + 1 + (np.arange(total) - np.repeat(csum, rep))
        return pa.table(
            {"a": pa.array(d_s[a_idx], pa.int64()), "b": pa.array(d_s[b_idx], pa.int64())}
        )

    from .relational import _hash_partitioned_any

    pairs = _hash_partitioned_any(fps, ["h"], 16).map_groups(
        lambda t: bucket_pairs(t.drop_columns(["__part"])), batch_format="pyarrow"
    )
    # count shared fingerprints per pair with a co-partitioned exchange
    # + one C++ group_by per partition: the intermediate pair set is
    # near-unique per block, so grouped_agg's generic path degenerated
    # to a full Ray sort-aggregate over every intermediate pair (10x
    # smoke: 20.6 s of the op's 24 s); hash-partitioning by (a, b) and
    # counting inside the partition is the same exchange volume with a
    # vectorized finalize.
    def count_part(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        g = t.group_by(["a", "b"]).aggregate([("a", "count")])
        n = g["a_count"].cast(pa.int64())
        g = pa.table({"a": g["a"], "b": g["b"], "n_shared": n})
        return g.filter(pa.compute.greater_equal(n, min_shared))

    counted = _hash_partitioned_any(pairs, ["a", "b"], 16).map_groups(
        count_part, batch_format="pyarrow"
    )
    return counted.sort(["a", "b"])


def t_winnow_pairs_sql(min_shared: int = 2, max_df: int = 256) -> str:
    k, w = WINNOW_K, WINNOW_W
    return (
        "WITH d2 AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), "
        "x -> x <> '') AS l FROM documents), "
        "grams AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, "
        "CAST(CAST('0x' || substr(md5(array_to_string("
        f"l[CAST(i AS BIGINT):(CAST(i AS BIGINT)+{k}-1)], ' ')), 1, 15) AS UBIGINT) AS BIGINT) AS h "
        f"FROM d2 CROSS JOIN LATERAL (SELECT UNNEST(range(1, len(l)-{k}+2)) AS i) t "
        f"WHERE len(l) >= {k}), "
        "nn AS (SELECT doc_id, MAX(pos) AS np FROM grams GROUP BY 1), "
        "starts AS (SELECT doc_id, CAST(w0 AS BIGINT) AS w0 FROM nn CROSS JOIN LATERAL "
        f"(SELECT UNNEST(range(1, GREATEST(np-{w}+1, 1)+1)) AS w0) s), "
        "wins AS (SELECT g.doc_id, st.w0, MIN(g.h) AS mh FROM grams g "
        f"JOIN starts st ON g.doc_id = st.doc_id AND g.pos BETWEEN st.w0 AND st.w0+{w}-1 "
        "GROUP BY 1, 2), "
        "fp0 AS (SELECT DISTINCT doc_id, mh FROM wins), "
        "ok AS (SELECT mh FROM fp0 GROUP BY mh "
        f"HAVING COUNT(*) BETWEEN 2 AND {max_df}), "
        "fp AS (SELECT fp0.* FROM fp0 JOIN ok USING (mh)), "
        "p AS (SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_shared "
        "FROM fp x JOIN fp y ON x.mh = y.mh AND x.doc_id < y.doc_id GROUP BY 1, 2) "
        f"SELECT a, b, CAST(n_shared AS BIGINT) AS n_shared FROM p WHERE n_shared >= {min_shared} "
        "ORDER BY a, b"
    )


def t_split(sf: str, val_pct: int = 5, test_pct: int = 5):
    """Deterministic train/val/test split (the last step of every
    corpus build): md5-residue on doc_id — reproducible across runs,
    engines, and shard layouts (no RNG, no order dependence). Returns
    per-(source, split) counts so the driver hash checks the full
    assignment."""
    docs = read_table(sf, "documents", ["doc_id", "source"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        r = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 for i in ids],
            np.int64,
        )
        split = np.where(r < val_pct, "val", np.where(r < val_pct + test_pct, "test", "train"))
        return pa.table(
            {
                "source": t["source"],
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    out = grouped_agg(
        docs.map_batches(assign, batch_format="pyarrow"),
        ["source", "split"],
        [("n_docs", "count", None)],
        round_to=None,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "source": t["source"],
                "split": t["split"],
                "n_docs": t["n_docs"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort(["source", "split"])


def t_split_sql(val_pct: int = 5, test_pct: int = 5) -> str:
    return (
        "WITH a AS (SELECT source, CASE "
        "WHEN CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8) AS UBIGINT) "
        f"AS BIGINT) % 100 < {val_pct} THEN 'val' "
        "WHEN CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8) AS UBIGINT) "
        f"AS BIGINT) % 100 < {val_pct + test_pct} THEN 'test' "
        "ELSE 'train' END AS split FROM documents) "
        "SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs FROM a "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    )


# ------------------------------------------------------------- dupspans
DUPSPAN_K = 8  # tokens per duplicated span unit


def _explode_span_grams(t: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, pos, h): every overlapping
    DUPSPAN_K-token gram with its 1-based start position and md5-60-bit
    hash (the winnowing hash convention — BIGINT-safe on the oracle
    side). Docs shorter than K tokens emit nothing."""
    ids, poss, hs = [], [], []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = _tokens(text)
        n = len(toks) - DUPSPAN_K + 1
        for i in range(max(n, 0)):
            g = " ".join(toks[i : i + DUPSPAN_K])
            ids.append(did)
            poss.append(i + 1)
            hs.append(int(hashlib.md5(g.encode()).hexdigest()[:15], 16))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "pos": pa.array(poss, pa.int64()),
            "h": pa.array(hs, pa.int64()),
        }
    )


def t_dupspans(sf: str):
    """Sorted query surface over dupspan_coverage (see there for the
    algorithm and scale shape)."""
    return dupspan_coverage(sf).sort("doc_id")


def dupspan_coverage(sf: str):
    """ExactSubstr-style duplicate-span coverage (Lee et al. 2022,
    'Deduplicating Training Data Makes Language Models Better'): a
    token position is duplicated if any DUPSPAN_K-token gram covering
    it occurs >= 2 times ANYWHERE in the corpus (cross-doc or
    within-doc). Per doc: (n_tokens, dup_tokens) where dup_tokens is
    the exact interval-union size of [pos, pos+K) over duplicated gram
    starts — the number the span-cutting pass would remove.

    Distributed shape (the suffix-array alternative needs global order;
    this is the shuffle-native equivalent): streaming gram explode ->
    grouped count (combiner inside grouped_agg) -> dup-hash semi-filter
    (adaptive: broadcast small, co-partitioned above 5M) -> per-doc
    interval union co-partitioned by doc_id (whole-partition vectorized
    numpy, no per-group Python) -> left-decorate the doc table. Gram
    strings never shuffle — only (doc_id, pos, h) triples."""
    from .relational import _hash_partitioned_any, _npart, adaptive_semi_filter

    docs = read_table(sf, "documents", ["doc_id", "text"])
    grams = docs.map_batches(_explode_span_grams, batch_format="pyarrow")
    counts = grouped_agg(grams, ["h"], [("c", "count", None)], round_to=None)
    dup_h = counts.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["c"], 2)).select(["h"]),
        batch_format="pyarrow",
    )
    dup_occ = adaptive_semi_filter(grams, dup_h, "h", "h")

    def union_cover(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        if len(did) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "dup_tokens": pa.array([], pa.int64())}
            )
        order = np.lexsort((pos, did))
        did, pos = did[order], pos[order]
        same_next = np.r_[did[1:] == did[:-1], False]
        nxt = np.r_[pos[1:], 0]
        contrib = np.where(same_next, np.minimum(DUPSPAN_K, nxt - pos), DUPSPAN_K)
        starts = np.flatnonzero(np.r_[True, did[1:] != did[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(did[starts], pa.int64()),
                "dup_tokens": pa.array(
                    np.add.reduceat(contrib, starts).astype(np.int64), pa.int64()
                ),
            }
        )

    cover = _hash_partitioned_any(dup_occ, ["doc_id"], _npart()).map_groups(
        lambda t: union_cover(t.drop_columns(["__part"])), batch_format="pyarrow"
    )

    def ntok(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(
                    [len(_tokens(s)) for s in t["text"].to_pylist()], pa.int64()
                ),
            }
        )

    out = adaptive_dim_join(
        docs.map_batches(ntok, batch_format="pyarrow"),
        "doc_id",
        cover,
        "doc_id",
        ["dup_tokens"],
        how="left",
    )

    def fill(t: pa.Table) -> pa.Table:
        v = t["dup_tokens"].to_pandas().fillna(0).to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "dup_tokens": pa.array(v, pa.int64()),
            }
        )

    return out.map_batches(fill, batch_format="pyarrow")


def _dupspan_ctes() -> list[str]:
    """The dup-span CTE chain ending with ``agg`` (per-doc dup_tokens)
    — shared with the t_prep_v4 oracle."""
    k = DUPSPAN_K
    return [
        "ds_l AS (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), "
        "x -> x <> '') AS l FROM documents)",
        "ds_grams AS (SELECT doc_id, CAST(i AS BIGINT) AS pos, "
        "CAST(CAST('0x' || substr(md5(array_to_string("
        f"l[CAST(i AS BIGINT):(CAST(i AS BIGINT)+{k}-1)], ' ')), 1, 15) AS UBIGINT) AS BIGINT) AS h "
        f"FROM ds_l CROSS JOIN LATERAL (SELECT UNNEST(range(1, len(l)-{k}+2)) AS i) t "
        f"WHERE len(l) >= {k})",
        "ds_dup AS (SELECT h FROM ds_grams GROUP BY h HAVING COUNT(*) >= 2)",
        "ds_occ AS (SELECT g.doc_id, g.pos FROM ds_grams g JOIN ds_dup USING (h))",
        "ds_cov AS (SELECT doc_id, pos, LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt "
        "FROM ds_occ)",
        f"ds_agg AS (SELECT doc_id, SUM(CASE WHEN nxt IS NULL THEN {k} "
        f"ELSE LEAST({k}, nxt - pos) END) AS dup_tokens FROM ds_cov GROUP BY 1)",
    ]


def t_dupspans_sql() -> str:
    return (
        "WITH "
        + ", ".join(_dupspan_ctes())
        + " SELECT d.doc_id, CASE WHEN trim(d.text) = '' THEN 0 ELSE "
        "len(string_split_regex(trim(d.text), '\\s+')) END AS n_tokens, "
        "CAST(COALESCE(a.dup_tokens, 0) AS BIGINT) AS dup_tokens "
        "FROM documents d LEFT JOIN ds_agg a USING (doc_id) ORDER BY d.doc_id"
    )


# ------------------------------------------------------------- semdedup
SEM_SCALE = 1000  # e3 quantization: int64-safe exact cosine comparisons


def e_semdedup(sf: str, **kw):
    """Sorted query surface over semdedup_flags (see there for the
    algorithm and scale shape)."""
    return semdedup_flags(sf, **kw).sort("vec_id")


def semdedup_flags(
    sf: str,
    k: int = 4,
    iters: int = 3,
    tau_num: int = 2,
    tau_den: int = 5,
    group_max: int = 10_000,
):
    """SemDeDup (Abbas et al. 2023): embedding-level semantic dedup —
    k-means-cluster the embeddings, then inside each cluster drop every
    vector that has an earlier (lower vec_id) cluster-mate with cosine
    similarity >= tau. Output one row per vector: (vec_id, cid, kept).

    Exactness contract: the clustering is the integer-exact k-means of
    e_kmeans_int (same constants, same final assignment), and the
    cosine test is the integer comparison tau_den^2*ip^2 >= tau_num^2*
    |a|^2*|b|^2 (with ip > 0) over e3-quantized components — bit-equal
    on both engines (DuckDB's SUM(BIGINT) is HUGEINT, numpy's int64
    bounds are proven in-range for dim<=64, |x|<=1). tau defaults to
    0.4 (~6% drops) because the synthetic embeddings are
    near-orthogonal (max observed cosine ~0.51); real corpora run
    ~0.9.

    Scale shape: assignment is one broadcast streaming pass (k*(dim+1)
    aggregate per update); the pairwise stage co-partitions by cid and
    runs ONE matmul per cluster — SemDeDup's cost model is exactly
    'clusters small enough to do pairwise', so at 100 TB you raise k
    (e.g. n/10k clusters) and this stage stays bounded; a cluster over
    ``group_max`` fails loudly rather than OOMing the worker (the
    bound is QUADRATIC in memory — 10k rows is ~2.4 GB of int64
    ip/lhs/rhs matrices, sized to a worker heap)."""
    from .kmeans import kmeans_assignments

    emb = read_table(sf, "embeddings", ["vec_id", "embedding"]).materialize()
    assign = kmeans_assignments(emb, k, iters)
    dec = adaptive_dim_join(emb, "vec_id", assign, "vec_id", ["cid"])

    def per_cluster(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) > group_max:
            raise ValueError(
                f"e_semdedup: cluster of {len(ids)} rows exceeds group_max="
                f"{group_max}; raise k so clusters stay pairwise-sized"
            )
        cid = t["cid"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.rint(np.array(t["embedding"].to_pylist(), np.float64) * SEM_SCALE).astype(
            np.int64
        )
        order = np.argsort(ids)
        ids, cid, q = ids[order], cid[order], q[order]
        ip = q @ q.T
        nrm = np.diag(ip).copy()
        with np.errstate(over="raise"):  # bounds proven; fail loud if violated
            lhs = (tau_den * tau_den) * ip * ip
            rhs = (tau_num * tau_num) * np.outer(nrm, nrm)
        near = (ip > 0) & (lhs >= rhs)
        dropped = np.triu(near, 1).any(axis=0)  # exists earlier near-dup
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cid": pa.array(cid, pa.int64()),
                "kept": pa.array((~dropped).astype(np.int64), pa.int64()),
            }
        )

    return (
        dec.groupby("cid")
        .map_groups(per_cluster, batch_format="pyarrow")
    )


def _semdedup_ctes(
    k: int = 4, iters: int = 3, tau_num: int = 2, tau_den: int = 5
) -> tuple[list[str], str]:
    """(ctes, assignment_cte_name): the full semdedup CTE chain ending
    with ``dr`` (the dropped vec_ids) — shared with the t_prep_v4
    oracle."""
    from .kmeans import kmeans_assign_ctes

    ctes, _prev, assign = kmeans_assign_ctes(k, iters)
    ctes.append(
        "s AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
        f"CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * {SEM_SCALE}, 0) AS BIGINT) AS v "
        "FROM embeddings)"
    )
    ctes.append("nrm AS (SELECT vec_id, SUM(v*v) AS n2 FROM s GROUP BY 1)")
    ctes.append(
        f"pr AS (SELECT a.vec_id AS ua, b.vec_id AS ub FROM {assign} a "
        f"JOIN {assign} b ON a.cid = b.cid AND a.vec_id < b.vec_id)"
    )
    ctes.append(
        "ipt AS (SELECT pr.ua, pr.ub, SUM(x.v * y.v) AS ip FROM pr "
        "JOIN s x ON x.vec_id = pr.ua JOIN s y ON y.vec_id = pr.ub AND y.i = x.i "
        "GROUP BY 1, 2)"
    )
    ctes.append(
        "dr AS (SELECT DISTINCT i.ub AS vec_id FROM ipt i "
        "JOIN nrm na ON na.vec_id = i.ua JOIN nrm nb ON nb.vec_id = i.ub "
        f"WHERE i.ip > 0 AND {tau_den * tau_den} * i.ip * i.ip >= "
        f"{tau_num * tau_num} * na.n2 * nb.n2)"
    )
    return ctes, assign


def e_semdedup_sql(
    k: int = 4, iters: int = 3, tau_num: int = 2, tau_den: int = 5
) -> str:
    ctes, assign = _semdedup_ctes(k, iters, tau_num, tau_den)
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cid, "
        "CAST(CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept "
        f"FROM {assign} a LEFT JOIN dr ON dr.vec_id = a.vec_id ORDER BY a.vec_id"
    )


# ------------------------------------------------------------- prep v4
def t_prep_v4(
    sf: str,
    min_tokens: int = 30,
    max_dup_num: int = 1,
    max_dup_den: int = 5,
):
    """Round-5 corpus-prep capstone: the v3 gates' modern siblings in
    one composed DAG — (1) length gate (n_tokens >= min_tokens),
    (2) duplicate-span gate (dup-span coverage <= max_dup_num/
    max_dup_den of the doc, from dupspan_coverage), (3) SemDeDup gate
    (docs whose embedding was semantically dropped go; docs without an
    embedding row stay), (4) exact-text dedup among the survivors
    (keep min doc_id per distinct text, carried as an md5 so the
    shuffle never moves text). Output: per-source (n_docs, sum_tokens)
    of the final kept set.

    Every stage is a streaming map or an adaptive join/shuffle from
    the scale toolkit; nothing gathers to the driver."""
    from .relational import _min_set_filter

    cov = dupspan_coverage(sf)
    flags = semdedup_flags(sf).map_batches(
        lambda t: pa.table(
            {"doc_id": t["vec_id"].cast(pa.int64()), "kept": t["kept"]}
        ),
        batch_format="pyarrow",
    )
    docs = read_table(sf, "documents", ["doc_id", "source", "text"])
    dec = adaptive_dim_join(
        docs, "doc_id", cov, "doc_id", ["n_tokens", "dup_tokens"]
    )
    dec = adaptive_dim_join(dec, "doc_id", flags, "doc_id", ["kept"], how="left")

    def gate(t: pa.Table) -> pa.Table:
        nt = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        dup = t["dup_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        kept = t["kept"].to_pandas().fillna(1).to_numpy(np.int64)
        mask = (nt >= min_tokens) & (max_dup_den * dup <= max_dup_num * nt) & (kept != 0)
        t = t.filter(pa.array(mask))
        hs = [hashlib.md5(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "source": t["source"],
                "n_tokens": t["n_tokens"].cast(pa.int64()),
                "h": pa.array(hs, pa.string()),
            }
        )

    gated = dec.map_batches(gate, batch_format="pyarrow")
    kept_docs = _min_set_filter(gated, "h", "doc_id")
    out = grouped_agg(
        kept_docs,
        ["source"],
        [("n_docs", "count", None), ("sum_tokens", "sum", "n_tokens")],
        round_to=None,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "source": t["source"],
                "n_docs": t["n_docs"].cast(pa.int64()),
                "sum_tokens": t["sum_tokens"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("source")


def t_prep_v4_sql(
    min_tokens: int = 30, max_dup_num: int = 1, max_dup_den: int = 5
) -> str:
    ctes = _dupspan_ctes()
    sem_ctes, _assign = _semdedup_ctes()
    ctes += sem_ctes
    ctes.append(
        "v4base AS (SELECT d.doc_id, d.source, d.text, "
        "CASE WHEN trim(d.text) = '' THEN 0 ELSE "
        "len(string_split_regex(trim(d.text), '\\s+')) END AS n_tokens, "
        "COALESCE(a.dup_tokens, 0) AS dup_tokens "
        "FROM documents d LEFT JOIN ds_agg a USING (doc_id))"
    )
    ctes.append(
        "v4g AS (SELECT b.doc_id, b.source, b.text, b.n_tokens FROM v4base b "
        "LEFT JOIN dr ON dr.vec_id = b.doc_id "
        f"WHERE b.n_tokens >= {min_tokens} "
        f"AND {max_dup_den} * b.dup_tokens <= {max_dup_num} * b.n_tokens "
        "AND dr.vec_id IS NULL)"
    )
    ctes.append(
        "v4r AS (SELECT source, n_tokens, ROW_NUMBER() OVER "
        "(PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM v4g)"
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + " SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens "
        "FROM v4r WHERE rn = 1 GROUP BY source ORDER BY source"
    )


def t_pmi_bigrams(sf: str, min_count: int = 5, top_k: int = 30):
    """Collocation extraction (continuation session): top-k bigrams by
    integer-exact PMI lift — the phrase-mining pass a corpus-prep
    pipeline runs before vocabulary construction. lift_e6 =
    floor(c_xy * N^2 * 10^6 / (B * c_x * c_y)), the e6-scaled ratio
    p(xy)/(p(x)p(y)) with p over token (N) and bigram (B) totals —
    monotone in PMI (log of it), so the top-k by lift IS the top-k by
    PMI while staying integer-exact across engines (log floats would
    hash-differ; the oracle computes the same ratio in HUGEINT).

    Distributed shape: ONE vectorized tokenize pass (split_pattern_regex
    + a not_equal mask with list-offset bookkeeping) materializes the
    per-doc token lists; the unigram flatten and the in-doc
    adjacent-pair explode (offset masking — a bigram never crosses a
    doc boundary) are two cheap passes over that cache. Bigram and
    unigram counts are grouped_agg (combiner-first, vocab-sized
    results); N and B are streaming scalar sums over the count tables. The finalize gathers
    ONLY the >= min_count candidates (heavy-hitter-bounded: at most
    B/min_count rows) plus the unigram rows they reference
    (candidate-bounded via one semi-filter) — never the corpus, never
    the full vocabulary — and computes the lift in arbitrary-precision
    Python ints (c_xy*N^2*1e6 overflows int64 past ~sf0.05 by design;
    DuckDB gets HUGEINT for the same reason)."""
    import pyarrow.compute as pc

    from .relational import adaptive_semi_filter

    ds = read_table(sf, "documents", ["text"])

    # ONE tokenize pass, materialized: both count passes reuse the
    # token lists instead of re-running split_pattern_regex over the
    # corpus. Empty tokens drop via a vectorized not_equal mask with
    # offset bookkeeping (pyarrow has no lambda list_filter).
    def tokenize(t: pa.Table) -> pa.Table:
        lst = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+").combine_chunks()
        flat = lst.flatten()
        keep = pc.not_equal(flat, "")
        k = keep.to_numpy(zero_copy_only=False)
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        keepcum = np.concatenate([[0], np.cumsum(k)])
        new_offs = keepcum[offs]
        kept = flat.filter(keep)
        return pa.table(
            {"toks": pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), kept)}
        )

    toks_ds = ds.map_batches(tokenize, batch_format="pyarrow").materialize()

    def unigram_batch(t: pa.Table) -> pa.Table:
        return pa.table({"w": t["toks"].combine_chunks().flatten()})

    def bigram_batch(t: pa.Table) -> pa.Table:
        lst = t["toks"].combine_chunks()
        vals = lst.flatten()
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(vals)
        if n >= 2:
            # adjacent pairs within each doc: (i, i+1) unless i+1 is
            # the first token of the next doc
            first = np.zeros(n, bool)
            starts = offs[:-1][offs[:-1] < n]
            first[starts] = True
            idx = np.flatnonzero(~first[1:])
            w1 = vals.take(pa.array(idx))
            w2 = vals.take(pa.array(idx + 1))
        else:
            w1 = w2 = pa.array([], pa.string())
        return pa.table({"w1": w1, "w2": w2})

    big = grouped_agg(
        toks_ds.map_batches(bigram_batch, batch_format="pyarrow"),
        ["w1", "w2"],
        [("c_xy", "count", None)],
        round_to=None,
    ).materialize()
    uni = grouped_agg(
        toks_ds.map_batches(unigram_batch, batch_format="pyarrow"),
        ["w"],
        [("c", "count", None)],
        round_to=None,
    ).materialize()
    n_tok = int(uni.sum("c") or 0)
    n_big = int(big.sum("c_xy") or 0)

    cand = big.map_batches(
        lambda t: t.filter(pc.greater_equal(t["c_xy"], min_count)),
        batch_format="pyarrow",
    ).materialize()

    # unigram rows feeding the finalize: only words present in a
    # candidate bigram (two semi-filters, candidate-sized broadcast)
    u1 = adaptive_semi_filter(uni, cand, "w", "w1")
    u2 = adaptive_semi_filter(uni, cand, "w", "w2")

    def gather(d) -> pa.Table:
        bs = list(d.iter_batches(batch_format="pyarrow", batch_size=65536))
        return pa.concat_tables(bs) if bs else None

    ct = gather(cand)
    if ct is None or ct.num_rows == 0:
        return pa.table(
            {
                "w1": pa.array([], pa.string()),
                "w2": pa.array([], pa.string()),
                "c_xy": pa.array([], pa.int64()),
                "lift_e6": pa.array([], pa.int64()),
            }
        )
    cx: dict[str, int] = {}
    for part in (gather(u1), gather(u2)):
        if part is not None:
            for w_, c_ in zip(part["w"].to_pylist(), part["c"].to_pylist()):
                cx[w_] = int(c_)
    rows = []
    for w1_, w2_, cxy in zip(
        ct["w1"].to_pylist(), ct["w2"].to_pylist(), ct["c_xy"].to_pylist()
    ):
        lift = (int(cxy) * n_tok * n_tok * 1_000_000) // (n_big * cx[w1_] * cx[w2_])
        rows.append((w1_, w2_, int(cxy), lift))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    rows = rows[:top_k]
    return pa.table(
        {
            "w1": pa.array([r[0] for r in rows], pa.string()),
            "w2": pa.array([r[1] for r in rows], pa.string()),
            "c_xy": pa.array([r[2] for r in rows], pa.int64()),
            "lift_e6": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def t_pmi_bigrams_sql(min_count: int = 5, top_k: int = 30) -> str:
    return (
        "WITH d AS (SELECT list_filter(string_split_regex(lower(text), '\\s+'), "
        "x -> x <> '') AS l FROM documents), "
        # list_zip pads to the longer operand with NULLs (one padded
        # row per doc: the last token zipped against nothing) — filter
        # them so the bigram total B is exact
        "p2 AS (SELECT z[1] AS w1, z[2] AS w2 FROM "
        "(SELECT UNNEST(list_zip(l[:-1], l[2:])) AS z FROM d WHERE len(l) >= 2) "
        "WHERE z[2] IS NOT NULL), "
        "uni AS (SELECT UNNEST(l) AS w FROM d), "
        "cx AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w), "
        "tot AS (SELECT (SELECT COUNT(*) FROM uni) AS n, (SELECT COUNT(*) FROM p2) AS b), "
        f"cand AS (SELECT w1, w2, COUNT(*) AS c_xy FROM p2 GROUP BY w1, w2 "
        f"HAVING COUNT(*) >= {min_count}) "
        "SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy, "
        "CAST((CAST(c_xy AS HUGEINT) * n * n * 1000000) // "
        "(CAST(b AS HUGEINT) * a.c * bb.c) AS BIGINT) AS lift_e6 "
        "FROM cand, tot JOIN cx a ON cand.w1 = a.w JOIN cx bb ON cand.w2 = bb.w "
        f"ORDER BY lift_e6 DESC, w1, w2 LIMIT {top_k}"
    )


# --------------------------------------------- t_source_sim

_SS_NUM_PERM = 64


def t_source_sim(sf: str, sig_max: int = 200_000):
    """CROSS-SOURCE SIMILARITY MATRIX via per-source MinHash: the
    dataset-level analog of document near-dedup — estimate the Jaccard
    overlap between each pair of SOURCES' shingle sets (the signal a
    corpus-mixing pipeline uses to spot mirrored / syndicated feeds
    before weighting them). Same 64-permutation splitmix64 sketch as
    MinHasher (seed 1, word-3-gram md5 shingles), but the min folds all
    the way down to ONE signature per source: per batch, a (docs x 64)
    mix matrix reduces per-source via minimum.reduceat; the shuffle
    then carries at most sources x 64 x blocks rows (grouped MIN) — the
    document text never crosses the wire. Output: (src_a, src_b,
    match_n) with match_n = #permutations whose minima agree, an
    unbiased 64-sample Jaccard estimator per pair, bit-exactly mirrored
    by the HUGEINT splitmix64 oracle.

    Signatures are shuffled as sign-bit-BIASED int64 (sig ^ 2^63) —
    monotone uint64 -> int64, so Arrow's signed MIN agrees with the
    oracle's unsigned HUGEINT MIN."""
    from ..functions import textstats as tx
    from ..functions.hll import _mix64

    seeds, _ = tx.minhash_params(_SS_NUM_PERM, seed=1)
    umax = np.iinfo(np.uint64).max

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        srcs = t["source"].to_numpy(zero_copy_only=False)
        n = len(texts)
        sh_lists = [
            np.fromiter(s, np.uint64, len(s))
            for s in (tx.shingles(x) for x in texts)
        ]
        lens = np.array([len(s) for s in sh_lists], np.int64)
        sigs = np.full((n, _SS_NUM_PERM), umax, np.uint64)
        nz = np.flatnonzero(lens)
        if len(nz):
            allsh = np.concatenate([sh_lists[i] for i in nz])
            mixed = _mix64(allsh[:, None] ^ seeds[None, :])
            starts = np.r_[0, np.cumsum(lens[nz])[:-1]]
            sigs[nz] = np.minimum.reduceat(mixed, starts, axis=0)
        # per-source fold within the batch
        uniq, inv = np.unique(srcs, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        first = np.r_[True, inv[order][1:] != inv[order][:-1]]
        ssig = np.minimum.reduceat(sigs[order], np.flatnonzero(first), axis=0)
        k = len(uniq)
        biased = (ssig ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table(
            {
                "source": pa.array(np.repeat(uniq, _SS_NUM_PERM)),
                "pi": pa.array(np.tile(np.arange(_SS_NUM_PERM, dtype=np.int64), k)),
                "sig_b": pa.array(biased.ravel()),
            }
        )

    docs = read_table(sf, "documents", ["source", "text"])
    partials = docs.map_batches(partial, batch_format="pyarrow")
    mins = grouped_agg(partials, ["source", "pi"], [("sig_b", "min", "sig_b")], round_to=None)

    parts, n = [], 0
    for b in mins.iter_batches(batch_format="pyarrow", batch_size=65536):
        n += b.num_rows
        if n > sig_max:
            raise ValueError(
                f"t_source_sim: >{sig_max} signature rows — too many distinct "
                "sources for the driver-side pairing; raise sig_max deliberately"
            )
        parts.append(b)
    t = pa.concat_tables(parts).combine_chunks()
    src = np.asarray(t["source"].to_pylist(), object)
    pi = t["pi"].to_numpy()
    sig = t["sig_b"].to_numpy()
    uniq = np.unique(src)
    mat = np.empty((len(uniq), _SS_NUM_PERM), np.int64)
    for i, s in enumerate(uniq):
        rows = src == s
        mat[i, pi[rows]] = sig[rows]
    a_l, b_l, m_l = [], [], []
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            a_l.append(uniq[i])
            b_l.append(uniq[j])
            m_l.append(int((mat[i] == mat[j]).sum()))
    return pa.table(
        {
            "src_a": pa.array(a_l, pa.string()),
            "src_b": pa.array(b_l, pa.string()),
            "match_n": pa.array(m_l, pa.int64()),
        }
    )


def t_source_sim_sql() -> str:
    from .minhash_oracle import _GOLD, _M64, _mul64, _C1, _C2

    seeds, _ = __import__(
        "lulu_crawler_ray.functions.textstats", fromlist=["minhash_params"]
    ).minhash_params(_SS_NUM_PERM, seed=1)
    seed_rows = ", ".join(f"({i}, {int(s)})" for i, s in enumerate(seeds))
    return f"""WITH seeds(pi, seed) AS (VALUES {seed_rows}),
l AS (SELECT source, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l FROM documents),
l2 AS (SELECT source, l, len(l) AS ntok FROM l),
grams AS (
  SELECT source, l[CAST(i AS BIGINT)] || ' ' || l[CAST(i AS BIGINT)+1] || ' ' || l[CAST(i AS BIGINT)+2] AS g
  FROM l2 CROSS JOIN LATERAL (SELECT UNNEST(range(1, ntok - 1)) AS i) t WHERE ntok >= 3
  UNION ALL
  SELECT source, array_to_string(l, ' ') AS g FROM l2 WHERE ntok >= 1 AND ntok < 3
),
sh AS (SELECT DISTINCT source, CAST(CAST('0x' || substr(md5(g),1,16) AS UBIGINT) AS HUGEINT) AS shingle FROM grams),
mixed AS (
  SELECT source, pi, MIN(x5) AS sig FROM (
    SELECT source, pi,
      (xor(shingle, CAST(seed AS HUGEINT)) + {_GOLD}) % {_M64} AS x0,
      xor(x0, x0 >> 30) AS x1,
      {_mul64('x1', _C1)} AS x2,
      xor(x2, x2 >> 27) AS x3,
      {_mul64('x3', _C2)} AS x4,
      xor(x4, x4 >> 31) AS x5
    FROM sh CROSS JOIN seeds
  ) GROUP BY source, pi
),
allsig AS (
  SELECT d.source, s.pi, COALESCE(m.sig, {_M64 - 1}) AS sig
  FROM (SELECT DISTINCT source FROM documents) d
  CROSS JOIN seeds s
  LEFT JOIN mixed m ON m.source = d.source AND m.pi = s.pi
)
SELECT a.source AS src_a, b.source AS src_b,
  CAST(SUM(CASE WHEN a.sig = b.sig THEN 1 ELSE 0 END) AS BIGINT) AS match_n
FROM allsig a JOIN allsig b ON a.pi = b.pi AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2"""


# --------------------------------------------- t_containment


def t_containment(sf: str, pct: int = 80):
    """ASYMMETRIC CONTAINMENT scoring of the LSH candidate pairs —
    the superset/quote-inclusion signal plain Jaccard misses (a short
    doc fully quoted inside a long one has low Jaccard but containment
    ~1; Broder's containment coefficient |A∩B| / min(|A|,|B|)). Reuses
    the MinHash LSH candidate generator, then decorates each pair with
    both docs' sorted-unique shingle blobs via adaptive_dim_join (the
    near_dedup_minhash discipline: candidate-sized broadcast under the
    blob-aware bound, co-partitioned shuffle above) and emits exact
    integer (inter_n, n_a, n_b) plus the pct-thresholded contained
    flag (cross-multiplied — no float boundary; min() == 0 counts as
    contained: the empty set is a subset of anything)."""
    from ..functions import textstats as tx
    from .relational import adaptive_dim_join
    from .textops import minhash_candidate_pairs

    docs = read_table(sf, "documents", ["doc_id", "text"])
    pairs = minhash_candidate_pairs(docs).materialize()

    ids: list[np.ndarray] = []
    for b in pairs.iter_batches(batch_format="pyarrow", batch_size=262144):
        ids.append(b["a"].to_numpy())
        ids.append(b["b"].to_numpy())
    idarr = np.unique(np.concatenate(ids)) if ids else np.array([], np.int64)
    if len(idarr) == 0:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "inter_n": pa.array([], pa.int64()),
                "n_a": pa.array([], pa.int64()),
                "n_b": pa.array([], pa.int64()),
                "contained": pa.array([], pa.int64()),
            }
        )
    idref = ray.put(idarr)

    def sh(t: pa.Table) -> pa.Table:
        m = np.isin(t["doc_id"].to_numpy(), ray.get(idref))
        t = t.filter(pa.array(m))
        arrs = [
            np.unique(np.fromiter(tx.shingles(s), np.uint64))
            for s in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sh": pa.array([a.tobytes() for a in arrs], pa.binary()),
            }
        )

    shingles = docs.map_batches(sh, batch_format="pyarrow")
    sh_a = shingles.map_batches(
        lambda t: t.rename_columns(["doc_id", "sh_a"]), batch_format="pyarrow"
    )
    sh_b = shingles.map_batches(
        lambda t: t.rename_columns(["doc_id", "sh_b"]), batch_format="pyarrow"
    )
    blob_max = 200_000
    j = adaptive_dim_join(pairs, "a", sh_a, "doc_id", ["sh_a"], broadcast_max=blob_max)
    j = adaptive_dim_join(j, "b", sh_b, "doc_id", ["sh_b"], broadcast_max=blob_max)

    def score(t: pa.Table) -> pa.Table:
        rows = {"a": [], "b": [], "inter_n": [], "n_a": [], "n_b": [], "contained": []}
        for a, b, sa, sb in zip(
            t["a"].to_pylist(), t["b"].to_pylist(), t["sh_a"].to_pylist(), t["sh_b"].to_pylist()
        ):
            sa = np.frombuffer(sa, np.uint64)
            sb = np.frombuffer(sb, np.uint64)
            inter = int(np.intersect1d(sa, sb, assume_unique=True).size)
            rows["a"].append(a)
            rows["b"].append(b)
            rows["inter_n"].append(inter)
            rows["n_a"].append(sa.size)
            rows["n_b"].append(sb.size)
            rows["contained"].append(
                int(inter * 100 >= pct * min(sa.size, sb.size))
            )
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in rows.items()}
        )

    return j.map_batches(score, batch_format="pyarrow").sort(["a", "b"])


def t_containment_sql(pct: int = 80) -> str:
    from .minhash_oracle import minhash_ctes

    return (
        "WITH "
        + minhash_ctes("documents")
        + ",\n"
        + "nsh AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),\n"
        "inter AS (SELECT c.a, c.b, COUNT(*) AS i FROM cand c "
        "JOIN sh x ON x.doc_id = c.a "
        "JOIN sh y ON y.doc_id = c.b AND y.shingle = x.shingle GROUP BY 1, 2)\n"
        "SELECT c.a AS a, c.b AS b, "
        "CAST(COALESCE(i.i, 0) AS BIGINT) AS inter_n, "
        "CAST(COALESCE(xa.n, 0) AS BIGINT) AS n_a, "
        "CAST(COALESCE(xb.n, 0) AS BIGINT) AS n_b, "
        f"CAST(CASE WHEN COALESCE(i.i, 0) * 100 >= {pct} * "
        "LEAST(COALESCE(xa.n, 0), COALESCE(xb.n, 0)) THEN 1 ELSE 0 END AS BIGINT) "
        "AS contained "
        "FROM cand c LEFT JOIN inter i ON i.a = c.a AND i.b = c.b "
        "LEFT JOIN nsh xa ON xa.doc_id = c.a "
        "LEFT JOIN nsh xb ON xb.doc_id = c.b ORDER BY a, b"
    )
