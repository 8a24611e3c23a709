"""Large-scale training-data text operators over the documents table:
exact dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard verify,
language ID, quality scoring, token counting, winnowing fingerprints.

Stateful per-actor setup (minhash permutations, compiled patterns) runs
once in __init__ of callable classes (actor pools); per-batch work is
batched Python over smallish string rows with numpy where it pays.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..functions import textstats as tx
from ..sources.testdata import read_table
from .relational import grouped_agg


def t_token_count(sf: str):
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(
                    [tx.token_count(s) for s in t["text"].to_pylist()], pa.int64()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def t_bpe_tokens(sf: str):
    """BPE-ish token count per doc (GPT-2-style pre-tokenizer regex,
    RE2-compatible so DuckDB regexp_extract_all computes the identical
    number — hash-checked)."""
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe_tokens": pa.array(
                    [tx.bpe_token_count(s) for s in t["text"].to_pylist()], pa.int64()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def t_quality(sf: str):
    """SQL-checkable slice of quality scoring: character-class counts
    (integer outputs — ratios are count quotients and hit decimal
    rounding-mode boundaries between engines; counts compare exactly)."""
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        counts = [tx.char_class_counts(s) for s in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars_m": pa.array([len(s) for s in texts], pa.int64()),
                "n_alpha": pa.array([a for a, _ in counts], pa.int64()),
                "n_digit": pa.array([d for _, d in counts], pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


class QualityScorer:
    """Actor-pool stage (state = stopword tables) — language guess +
    stopword-hit count + token count per doc. All-integer/string output
    so the whole stage is hash-checkable against a DuckDB list-kernel
    oracle (the stopword ratio is stop_hits/n_tokens, left to the
    consumer — emitting the rational directly would re-open the
    half-even vs half-away rounding boundary)."""

    def __init__(self):
        self.stop = tx.STOPWORDS

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        langs = [tx.langid(s) for s in texts]
        hits = []
        for s, lang in zip(texts, langs):
            sw = self.stop.get(lang, self.stop["en"])
            hits.append(sum(w.lower() in sw for w in s.split()))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_pred": pa.array(langs, pa.string()),
                "stop_hits": pa.array(hits, pa.int64()),
                "n_tokens": pa.array([tx.token_count(s) for s in texts], pa.int64()),
            }
        )


def t_langid(sf: str):
    ds = read_table(sf, "documents", ["doc_id", "text"])
    return ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=2)


def t_exact_dedup(sf: str):
    """Exact dedup: content-hash (md5 of text) -> per-group min doc_id +
    dup count. The hash is computed vectorized per batch; the shuffle
    carries (hash, doc_id) only — never the text."""
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def h(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()), "doc_id": t["doc_id"]})

    hashed = ds.map_batches(h, batch_format="pyarrow")
    agg = hashed.groupby("h").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_dups")
    )
    return agg.map_batches(
        lambda t: t.select(["doc_id", "n_dups"]), batch_format="pyarrow"
    )


def t_stopword(sf: str):
    """Per-doc stopword counts against the doc's own language list
    (fallback en for languages without a list) — the stopword-ratio
    quality signal as exact integer outputs. Vectorized: one np.isin
    per language group per batch, per-doc sums via reduceat."""
    ds = read_table(sf, "documents", ["doc_id", "text", "lang"])

    def f(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        langs = t["lang"].to_pylist()
        tok_lists = [s.lower().split() for s in texts]
        lens = np.array([len(x) for x in tok_lists], np.int64)
        n_stop = np.zeros(len(texts), np.int64)
        eff = np.array(
            [lg if lg in tx.STOPWORDS else "en" for lg in langs], object
        )
        for lg in np.unique(eff):
            rows = np.flatnonzero(eff == lg)
            rows = rows[lens[rows] > 0]
            if not len(rows):
                continue
            flat = np.concatenate([np.array(tok_lists[i], object) for i in rows])
            hit = np.isin(flat, list(tx.STOPWORDS[lg]))
            starts = np.r_[0, np.cumsum(lens[rows])[:-1]]
            n_stop[rows] = np.add.reduceat(hit.astype(np.int64), starts)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_stop": pa.array(n_stop),
                "n_tokens": pa.array(lens),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def t_simhash(sf: str):
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array(
                    [tx.simhash64(s) for s in t["text"].to_pylist()], pa.int64()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def t_simhash_neardup(sf: str, max_hamming: int = 6, hot_bucket_threshold: int = 1024):
    """SimHash near-dup pairs — the third dedup family: 64-bit simhash
    explodes into 4 x 16-bit bands (exact for <= 3 bit flips by
    pigeonhole; wider radii trade recall), bucket-groupby, in-bucket
    VERIFIED hamming with the same exact second-level banding for hot
    buckets as the phash join (shared _bucket_pairs kernel). Output
    (a, b) doc_id pairs, a < b."""
    from .images_pipe import _bucket_pairs

    ds = read_table(sf, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        h = np.array([tx.simhash64(s) for s in t["text"].to_pylist()], np.int64)
        u = h.view(np.uint64)
        bks, hs, ds_ = [], [], []
        for b in range(4):
            vals = (u >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            bks.append((np.int64(b) << np.int64(16)) | vals.astype(np.int64))
            hs.append(h)
            ds_.append(ids)
        return pa.table(
            {
                "band_key": pa.array(np.concatenate(bks)),
                "h": pa.array(np.concatenate(hs)),
                "doc_id": pa.array(np.concatenate(ds_), pa.int64()),
            }
        )

    bands = ds.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pa.Table:
        df = _bucket_pairs(
            g["doc_id"].to_numpy(), g["h"].to_numpy().astype(np.int64),
            max_hamming, hot_bucket_threshold,
        )
        return pa.table(
            {"a": pa.array(df["a"], pa.int64()), "b": pa.array(df["b"], pa.int64())}
        )

    # distinct pair set finalizes IN the dataset (per-batch pyarrow
    # distinct combiner + grouped Count whose key rows ARE the distinct
    # pairs) — the round-2 .to_pandas() is gone; same shape as
    # minhash_candidate_pairs' grouped path
    raw = bands.groupby("band_key").map_groups(pairs, batch_format="pandas")
    combined = raw.map_batches(
        lambda t: t.group_by(["a", "b"]).aggregate([]), batch_format="pyarrow"
    )
    agg = combined.groupby(["a", "b"]).aggregate(Count(alias_name="__c"))
    return agg.map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow"
    ).sort(["a", "b"])


def t_fingerprint(sf: str):
    """Winnowing fingerprint cardinality per doc (document
    fingerprinting op; the fingerprint sets drive containment checks)."""
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_fingerprints": pa.array(
                    [len(tx.winnow_fingerprints(s)) for s in t["text"].to_pylist()],
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _gram_hashes(words: list[str], n: int = 3) -> np.ndarray:
    """Distinct 64-bit hashes of the word n-grams of a token list:
    hash each word once (md5 prefix), then combine the three positional
    hashes with distinct odd multipliers — vectorized over the gram
    axis, order-sensitive, deterministic across processes (never
    builtin hash). Collisions at 64 bits are ~1e-10 for corpus-sized
    gram sets; at 100 TB you keep the same hashes and accept them."""
    if len(words) < n:
        return np.empty(0, np.int64)
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.md5(w.encode("utf-8", "surrogatepass")).digest()[:8], "big")
            for w in words
        ),
        np.uint64,
        len(words),
    )
    g = (
        hs[:-2] * np.uint64(0x9E3779B97F4A7C15)
        ^ hs[1:-1] * np.uint64(0xC2B2AE3D27D4EB4F)
        ^ hs[2:]
    )
    return np.unique(g.astype(np.int64))


def t_jaccard_search(sf: str, threshold_e4: int = 120, n_queries: int = 3):
    """N-gram Jaccard text similarity SEARCH: for each query doc
    (doc_id < n_queries), every corpus doc whose word-3-gram Jaccard
    similarity rounds to >= threshold_e4 (1e-4 units). The query gram
    sets broadcast once (ray.put); each batch does one sorted-array
    np.isin per query — fully streaming, no shuffle, exact. The
    integer-units threshold compares AFTER rounding on both sides, so
    there is no float-boundary ambiguity vs the DuckDB oracle."""
    qt = (
        read_table(sf, "documents", ["doc_id", "text"])
        .filter(expr=f"doc_id < {n_queries}")
        .to_pandas()
        .sort_values("doc_id")
    )
    qsets = [(int(r.doc_id), _gram_hashes(r.text.split(" "))) for r in qt.itertuples()]
    qref = ray.put(qsets)
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def hits(t: pa.Table) -> pa.Table:
        qs = ray.get(qref)
        out_q, out_d, out_j = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            grams = _gram_hashes(text.split(" "))
            if len(grams) == 0:
                continue
            for qid, qg in qs:
                if did == qid or len(qg) == 0:
                    continue
                i = int(np.isin(grams, qg, assume_unique=True).sum())
                if i == 0:
                    continue
                jac_e4 = int(np.floor(i / (len(qg) + len(grams) - i) * 10000 + 0.5))
                if jac_e4 >= threshold_e4:
                    out_q.append(qid)
                    out_d.append(did)
                    out_j.append(jac_e4)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "doc_id": pa.array(out_d, pa.int64()),
                "jac_e4": pa.array(out_j, pa.int64()),
            }
        )

    return ds.map_batches(hits, batch_format="pyarrow")


class MinHasher:
    """Actor-pool stage: permutations drawn once per actor (seeded =>
    identical across actors); emits LSH band rows (band, band_hash,
    doc_id) — 1 doc -> n_bands rows, ready for the bucket groupby."""

    NUM_PERM = 64
    BANDS = 16  # rows_per_band = 4

    def __init__(self):
        self.a, self.b = tx.minhash_params(self.NUM_PERM, seed=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        r = self.NUM_PERM // self.BANDS
        from ..functions.hll import _mix64

        docs = t["doc_id"].to_numpy()
        n = len(docs)
        # batched signatures: ONE (total_shingles, num_perm) mix matrix
        # + segmented min via minimum.reduceat — no per-doc numpy calls
        sh_lists = [
            np.fromiter(s, np.uint64, len(s))
            for s in (tx.shingles(x) for x in t["text"].to_pylist())
        ]
        lens = np.array([len(s) for s in sh_lists], np.int64)
        sigs = np.full((n, self.NUM_PERM), np.iinfo(np.uint64).max, np.uint64)
        nz = np.flatnonzero(lens)
        if len(nz):
            allsh = np.concatenate([sh_lists[i] for i in nz])
            mixed = _mix64(allsh[:, None] ^ self.a[None, :])
            starts = np.r_[0, np.cumsum(lens[nz])[:-1]]
            sigs[nz] = np.minimum.reduceat(mixed, starts, axis=0)
        # band bucket key: vectorized 64-bit multiplicative mix over the
        # band's r signature values (bucket ids are internal — identical
        # signatures bucket together under ANY deterministic hash; this
        # replaces 16 per-doc md5 calls and string keys in the shuffle
        # with one numpy pass and int64 keys)
        chunks = sigs.reshape(n, self.BANDS, r)
        mix = np.full((n, self.BANDS), 0xCBF29CE484222325, np.uint64)
        for j in range(r):
            mix = (mix ^ chunks[:, :, j]) * np.uint64(0x100000001B3)
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(self.BANDS, dtype=np.int32), n)
                ),
                "band_hash": pa.array(mix.reshape(-1).view(np.int64)),
                "doc_id": pa.array(np.repeat(docs, self.BANDS), pa.int64()),
            }
        )


@ray.remote(num_cpus=1)
def _band_pairs_task(*blocks):
    """Finalize LSH bucketing in ONE remote task (band rows fit the
    task budget): sort by (band, band_hash, doc_id), chain in-bucket
    pairs, distinct across bands — rows never touch the driver."""
    if not blocks:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    t = pa.concat_tables(blocks).combine_chunks()
    idx = pc.sort_indices(
        t, sort_keys=[("band", "ascending"), ("band_hash", "ascending"), ("doc_id", "ascending")]
    )
    srt = t.take(idx)
    bh = srt["band_hash"].combine_chunks()
    nn = len(bh)
    new_bucket = np.r_[
        True,
        pc.not_equal(bh.slice(1), bh.slice(0, nn - 1)).to_numpy(zero_copy_only=False)
        | (np.diff(srt["band"].to_numpy()) != 0),
    ]
    ids = srt["doc_id"].to_numpy()
    cont = ~new_bucket  # chain pair (ids[i-1], ids[i]) continues a bucket
    pairs = pa.table({"a": pa.array(ids[np.flatnonzero(cont) - 1]), "b": pa.array(ids[cont])})
    return pairs.group_by(["a", "b"]).aggregate([])  # distinct across bands


def minhash_candidate_pairs(
    docs: ray.data.Dataset,
    concurrency: tuple[int, int] | int = (2, 16),
    driver_max: int = 5_000_000,
) -> ray.data.Dataset:
    """documents(doc_id, text) -> candidate near-dup pair DATASET (a, b)
    via MinHash LSH: shingle -> signature -> band rows -> bucket-group ->
    chain pairs (a bucket of n docs yields n-1 chained pairs, not n² —
    union-find closes them transitively). Band rows are tiny (int32,
    16-char hash, int64), so bucketing is a single vectorized sort in
    one remote task under ``driver_max`` rows, a bucket groupby above
    it; in both paths the pair set stays in the object store (the
    round-1 driver .to_pandas() is gone). Pairs are distinct."""
    bands = docs.map_batches(MinHasher, batch_format="pyarrow", concurrency=concurrency)

    blocks = bands.materialize().to_arrow_refs()

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in blocks])
    blocks = [r for r, c in zip(blocks, counts) if c > 0]
    if sum(counts) <= driver_max:
        return ray.data.from_arrow_refs([_band_pairs_task.remote(*blocks)])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        return pd.DataFrame({"a": ids[:-1], "b": ids[1:]})

    raw = bands.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pandas")
    # distinct across bands: per-batch pyarrow distinct combiner, then a
    # grouped Count whose key rows ARE the distinct pairs — vectorized
    # end to end (a map_groups(first) here would cost one Python call
    # per distinct pair)
    combined = raw.map_batches(
        lambda t: t.group_by(["a", "b"]).aggregate([]), batch_format="pyarrow"
    )
    agg = combined.groupby(["a", "b"]).aggregate(Count(alias_name="__c"))
    return agg.map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")


def t_minhash_pairs(sf: str):
    docs = read_table(sf, "documents", ["doc_id", "text"])
    return minhash_candidate_pairs(docs).sort(["a", "b"])


def minhash_verified_pairs(
    docs: ray.data.Dataset, threshold: float | None = 0.7
) -> ray.data.Dataset | None:
    """LSH candidates -> DISTRIBUTED exact Jaccard verify; returns the
    verified (a, b) pair dataset, or None when no candidate pair exists
    (the caller's no-duplicates fast path). threshold=None returns ALL
    candidate pairs with their exact (ni, uni) intersection/union sizes
    — the t_jaccard_histogram feed. Shared by near_dedup_minhash and
    the t_cluster_sizes / t_jaccard_histogram reporting ops.

    The verify stage is Dataset-native (round-1 built a driver-side
    shingle dict over every candidate doc): broadcast the pair-touched
    id set (8 B/id), compute sorted-unique shingle arrays for exactly
    those docs in map_batches, hash-join them onto the pair list (two
    small shuffles over candidate-sized data), and evaluate Jaccard
    per pair inside map_batches."""
    pairs = minhash_candidate_pairs(docs).materialize()

    ids: list[np.ndarray] = []
    for b in pairs.iter_batches(batch_format="pyarrow", batch_size=262144):
        ids.append(b["a"].to_numpy())
        ids.append(b["b"].to_numpy())
    idarr = np.unique(np.concatenate(ids)) if ids else np.array([], np.int64)
    if len(idarr) == 0:
        return None
    idref = ray.put(idarr)

    def sh(t: pa.Table) -> pa.Table:
        m = np.isin(t["doc_id"].to_numpy(), ray.get(idref))
        t = t.filter(pa.array(m))
        # sorted-unique shingles packed as a binary blob per doc (acero
        # hash joins carry binary payloads but not list columns)
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

    from .relational import adaptive_dim_join

    # Attach both signatures through adaptive_dim_join (round 5): the
    # pair-touched shingle table is candidate-sized, so under the
    # (blob-aware, lowered) bound it broadcasts once as a worker-built
    # sorted tuple and the pair list streams through two searchsorted
    # decorations — no acero join pools at all (rounds 2-4 paid two
    # 16-partition hash joins ~1.4 s each at sf0.1 mostly in aggregator
    # spin-up). Above the bound it falls back to the co-partitioned
    # shuffle join automatically (blob payloads ride the exchange).
    shingles = docs.map_batches(sh, batch_format="pyarrow")
    sh_a = shingles.map_batches(
        lambda t: t.rename_columns(["doc_id", "sh_a"]), batch_format="pyarrow"
    )
    sh_b = shingles.map_batches(
        lambda t: t.rename_columns(["doc_id", "sh_b"]), batch_format="pyarrow"
    )
    blob_max = 200_000  # rows; signatures are ~KB blobs, not 8B keys
    j = adaptive_dim_join(pairs, "a", sh_a, "doc_id", ["sh_a"], broadcast_max=blob_max)
    j = adaptive_dim_join(j, "b", sh_b, "doc_id", ["sh_b"], broadcast_max=blob_max)

    def verify(t: pa.Table) -> pa.Table:
        ka, kb, kn, ku = [], [], [], []
        for a, b, sa, sb in zip(
            t["a"].to_pylist(), t["b"].to_pylist(), t["sh_a"].to_pylist(), t["sh_b"].to_pylist()
        ):
            sa = np.frombuffer(sa, np.uint64)
            sb = np.frombuffer(sb, np.uint64)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            uni = sa.size + sb.size - inter
            # jaccard(∅, ∅) = 1.0 (two token-less docs ARE duplicates)
            # — matches functions.textstats.jaccard and the round-1
            # driver-side verify
            sim = inter / uni if uni else 1.0
            if threshold is None or sim >= threshold:
                ka.append(a)
                kb.append(b)
                kn.append(int(inter))
                ku.append(int(uni))
        return pa.table(
            {
                "a": pa.array(ka, pa.int64()),
                "b": pa.array(kb, pa.int64()),
                "ni": pa.array(kn, pa.int64()),
                "uni": pa.array(ku, pa.int64()),
            }
        )

    stats = j.map_batches(verify, batch_format="pyarrow")
    return stats.map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow"
    ) if threshold is not None else stats


def near_dedup_minhash(
    docs: ray.data.Dataset, threshold: float = 0.7, num_partitions: int = 16
):
    """Full near-dedup: LSH candidates -> DISTRIBUTED exact Jaccard
    verify (minhash_verified_pairs) -> connected components -> keep min
    doc_id per cluster. The component stage takes the verified pair
    DATASET (drop_nonroots: driver union-find + broadcast drop array
    under its threshold; above it distributed label propagation + a
    co-partitioned ANTI semi-join — the drop set never materializes on
    the driver at scale, VERDICT r4 item 3)."""
    verified = minhash_verified_pairs(docs, threshold)
    only_ids = docs.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    if verified is None:
        return only_ids
    from .components import drop_nonroots

    return drop_nonroots(only_ids, "doc_id", verified)


def t_near_dedup(sf: str):
    docs = read_table(sf, "documents", ["doc_id", "text"])
    return near_dedup_minhash(docs)


def t_jaccard_histogram(sf: str, buckets: int = 20):
    """Candidate-pair JACCARD HISTOGRAM — the threshold-sweep
    diagnostic read before fixing a near-dedup cutoff: every LSH
    candidate pair's exact Jaccard, bucketed integer-exactly as
    (buckets * ni) // union (union = 0 -> the top bucket: two empty
    shingle sets ARE duplicates), counted per bucket. Output
    (bucket, n_pairs) ascending.

    Distributed shape: the shared LSH -> exact-verify stage with
    threshold=None (candidate-sized, the corpus never shuffles), one
    streaming bucket map, one combiner-first grouped count."""
    from .relational import grouped_agg

    docs = read_table(sf, "documents", ["doc_id", "text"])
    stats = minhash_verified_pairs(docs, threshold=None)
    if stats is None:
        return ray.data.from_arrow(
            pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                }
            )
        )

    def bucketize(t: pa.Table) -> pa.Table:
        ni = t["ni"].to_numpy(zero_copy_only=False).astype(np.int64)
        uni = t["uni"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.where(uni > 0, (buckets * ni) // np.maximum(uni, 1), buckets)
        return pa.table({"bucket": pa.array(b.astype(np.int64))})

    hist = grouped_agg(
        stats.map_batches(bucketize, batch_format="pyarrow"),
        ["bucket"],
        [("n_pairs", "count", None)],
        round_to=None,
    )
    return hist.map_batches(
        lambda t: pa.table(
            {
                "bucket": t["bucket"].cast(pa.int64()),
                "n_pairs": t["n_pairs"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("bucket")


def t_cluster_sizes(sf: str, driver_max_pairs: int = 1_000_000):
    """Near-dup CLUSTER-SIZE histogram — the dedup ecosystem's
    reporting op (how much of the corpus is singleton vs 2-dup vs
    pathological mega-clusters), read before choosing a dedup
    threshold. Output (cluster_size, n_clusters), ascending.

    Distributed shape: LSH -> exact-Jaccard verified pairs (shared with
    near_dedup_minhash); below ``driver_max_pairs`` the verified pair
    set (candidate-sized, tiny next to the corpus) collapses to driver
    union-find and the (node -> root) map broadcasts into ONE streaming
    decoration pass over the doc-id stream; above it the distributed
    label-propagation table decorates via adaptive_dim_join (left,
    null -> self). Either way the roots then fold through two
    combiner-first grouped counts (root -> size -> histogram) — the
    corpus text never shuffles."""
    from .components import _label_propagation_ds, _union_find
    from .relational import adaptive_dim_join, grouped_agg

    docs = read_table(sf, "documents", ["doc_id", "text"])
    ids = docs.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    verified = minhash_verified_pairs(docs)
    if verified is None:
        roots = ids.map_batches(
            lambda t: pa.table({"root": t["doc_id"].cast(pa.int64())}),
            batch_format="pyarrow",
        )
    else:
        verified = verified.materialize()
        if verified.count() <= driver_max_pairs:
            comp = _union_find(verified.to_pandas())
            nodes = np.array(sorted(comp), np.int64)
            rootv = np.array([comp[n] for n in nodes], np.int64)
            ref = ray.put((nodes, rootv))

            def lab(t: pa.Table) -> pa.Table:
                ns, rs = ray.get(ref)
                d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                idx = np.clip(np.searchsorted(ns, d), 0, max(len(ns) - 1, 0))
                hit = (len(ns) > 0) & (ns[idx] == d) if len(ns) else np.zeros(len(d), bool)
                return pa.table({"root": pa.array(np.where(hit, rs[idx], d))})

            roots = ids.map_batches(lab, batch_format="pyarrow")
        else:
            labels = _label_propagation_ds(verified)
            dec = adaptive_dim_join(ids, "doc_id", labels, "node", ["lbl"], how="left")
            roots = dec.map_batches(
                lambda t: pa.table(
                    {
                        "root": pa.array(
                            np.where(
                                pc.is_valid(t["lbl"].combine_chunks()).to_numpy(
                                    zero_copy_only=False
                                ),
                                t["lbl"]
                                .combine_chunks()
                                .fill_null(0)
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64),
                                t["doc_id"]
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64),
                            )
                        )
                    }
                ),
                batch_format="pyarrow",
            )

    per_root = grouped_agg(roots, ["root"], [("sz", "count", None)], round_to=None)
    hist = grouped_agg(
        per_root.map_batches(
            lambda t: pa.table({"cluster_size": t["sz"].cast(pa.int64())}),
            batch_format="pyarrow",
        ),
        ["cluster_size"],
        [("n_clusters", "count", None)],
        round_to=None,
    )
    return hist.map_batches(
        lambda t: pa.table(
            {
                "cluster_size": t["cluster_size"].cast(pa.int64()),
                "n_clusters": t["n_clusters"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("cluster_size")


def t_prep_pipeline(sf: str, min_tokens: int = 30, max_digit_ratio: float = 0.3):
    """End-to-end training-data prep over documents — the composition a
    corpus pipeline actually runs, each stage streaming into the next:

        quality gate (token count + digit ratio, vectorized counts)
        -> exact dedup (content hash, keep min doc_id)
        -> MinHash near-dedup (LSH -> distributed Jaccard -> components)
        -> per-language survivor summary

    Returns (lang, n_docs, sum_tokens) for the surviving set. Rows-only
    driver check; every component stage is individually oracle- or
    pytest-verified."""
    docs = read_table(sf, "documents", ["doc_id", "text", "lang"])

    def gate(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        toks = np.array([tx.token_count(s) for s in texts], np.int64)
        digits = np.array([tx.char_class_counts(s)[1] for s in texts], np.int64)
        lens = np.maximum(np.array([len(s) for s in texts], np.int64), 1)
        keep = (toks >= min_tokens) & (digits / lens <= max_digit_ratio)
        return t.filter(pa.array(keep))

    # materialized: the gate feeds four consumers (winner hash, winner
    # filter, near-dedup x3 via its own materializes, final summary) —
    # without this the corpus re-tokenizes/rehashes per consumer
    gated = docs.map_batches(gate, batch_format="pyarrow").materialize()

    # exact dedup: min doc_id per content hash, broadcast winners
    def h(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()), "doc_id": t["doc_id"]})

    # winner/survivor id sets are CORPUS-sized (one id per distinct
    # doc), so both semi filters go through the size-adaptive join —
    # broadcast-index probe while they fit, hash shuffle above the
    # threshold; never a driver-side gather
    from .relational import adaptive_join

    winners = (
        gated.map_batches(h, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    )
    exact_kept = adaptive_join(gated, winners, "doc_id", "doc_id").materialize()

    # near-dedup over the exact-kept set (LSH -> verify -> components)
    survivors = near_dedup_minhash(exact_kept.select_columns(["doc_id", "text"]))
    surviving = adaptive_join(exact_kept, survivors, "doc_id", "doc_id")

    def summarize(t: pa.Table) -> pa.Table:
        toks = pa.array([tx.token_count(x) for x in t["text"].to_pylist()], pa.int64())
        return pa.table({"lang": t["lang"], "n_tokens": toks})

    final = surviving.map_batches(summarize, batch_format="pyarrow")
    return grouped_agg(
        final, ["lang"], [("n_docs", "count", None), ("sum_tokens", "sum", "n_tokens")]
    )


def t_group_by_lang(sf: str):
    """Language composition summary (uses the stored lang column — the
    SQL-checkable analog of the langid pipeline output)."""
    ds = read_table(sf, "documents", ["lang", "n_chars"])
    return grouped_agg(
        ds, ["lang"], [("n", "count", None), ("sum_chars", "sum", "n_chars")]
    )


def t_tfidf(sf: str, k: int = 3):
    """TF-IDF top-k terms per document — the classic two-exchange
    shape. Stage 1 needs NO shuffle: each row is a whole document, so
    per-(doc, term) tf is final within the batch (np.unique per doc on
    the whitespace tokens — same tokenizer as t_token_count, so the
    DuckDB oracle tokenizes identically with string_split_regex).
    Stage 2: df = grouped count over the tf rows keyed by term
    (grouped_agg pre-aggregates per block, the exchange carries one row
    per distinct (block, term)). Stage 3: tf JOIN df on term (hash
    shuffle at vocabulary cardinality on the build side), then
    hash-partition by doc_id and ONE vectorized sort + run-position
    pass per partition for the top-k (score = tf * ln(N/df), ties
    broken by term asc — scores whose doubles tie exactly resolve the
    same way on both engines). Output is all-integer/string
    (doc_id, term, tf, df, rank): rank flips at equal doubles are
    impossible and nothing float is hashed."""
    from .relational import _hash_partitioned, _npart, grouped_agg, shuffle_join
    from ..sources.testdata import table_rows

    ds = read_table(sf, "documents", ["doc_id", "text"])

    def tf_batch(t: pa.Table) -> pa.Table:
        doc_ids, terms, tfs = [], [], []
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = tx.tokens(s)
            if not toks:
                continue
            u, c = np.unique(np.array(toks, object), return_counts=True)
            doc_ids.append(np.full(len(u), d, np.int64))
            terms.append(u)
            tfs.append(c.astype(np.int64))
        if not doc_ids:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(doc_ids)),
                "term": pa.array(np.concatenate(terms), pa.string()),
                "tf": pa.array(np.concatenate(tfs)),
            }
        )

    tf = ds.map_batches(tf_batch, batch_format="pyarrow")
    df = grouped_agg(
        tf.map_batches(lambda t: t.select(["term"]), batch_format="pyarrow"),
        ["term"],
        [("df", "count", None)],
        round_to=None,
    ).map_batches(
        lambda t: pa.table(
            {"term_r": t["term"], "df": pc.cast(t["df"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    n_docs = table_rows(sf, "documents")
    j = shuffle_join(tf, df, "term", "term_r")

    def topk_part(t: pa.Table) -> pa.Table:
        score = t["tf"].to_numpy().astype(np.float64) * np.log(
            float(n_docs) / t["df"].to_numpy().astype(np.float64)
        )
        t = t.append_column("__score", pa.array(score))
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("doc_id", "ascending"),
                    ("__score", "descending"),
                    ("term", "ascending"),
                ],
            )
        )
        d = t["doc_id"].to_numpy()
        starts = np.r_[True, d[1:] != d[:-1]]
        gid = np.cumsum(starts) - 1
        pos = np.arange(len(d)) - np.flatnonzero(starts)[gid]
        t = t.filter(pa.array(pos < k))
        keep_pos = pos[pos < k]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "term": t["term"],
                "tf": t["tf"],
                "df": t["df"],
                "rank": pa.array(keep_pos + 1, pa.int64()),
            }
        )

    return _hash_partitioned(j, "doc_id", _npart()).map_groups(
        topk_part, batch_format="pyarrow"
    )


def t_heavy_hitters(sf: str, phi_inv: int = 200, k: int = 800):
    """Frequent tokens (freq * phi_inv > n) via the classic two-pass
    Misra-Gries shape — the sketch exists so the CANDIDATE set, not the
    vocabulary, crosses the wire. Pass 1 (one scan): per block, exact
    local counts compress to an MG summary (subtract the (k+1)-th
    largest count from all — the batch form of k-counter MG; any term
    with true global freq > n/k provably survives the merged summary,
    since each block decrements a term by at most block_tokens/k); the
    block's total token count rides along as a ``term=""`` sentinel row
    ("" can never be a token — empties are filtered). Pass 2: the <= k
    merged candidates broadcast via ray.put, each block counts ONLY
    them, a tiny grouped sum finalizes, and the integer
    ``cnt * phi_inv > n`` filter makes the output EXACT — the DuckDB
    HAVING oracle checks it hash-for-hash. k > phi_inv => zero false
    negatives. Output (term, cnt)."""
    from .relational import grouped_agg

    ds = read_table(sf, "documents", ["text"])

    def _toks(t: pa.Table):
        toks = pc.list_flatten(pc.split_pattern_regex(t["text"], r"\s+"))
        return toks.filter(pc.not_equal(toks, ""))

    def mg_block(t: pa.Table) -> pa.Table:
        toks = _toks(t)
        u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        if len(u) > k:
            # batch Misra-Gries: decrement all by the (k+1)-th largest
            off = np.partition(c, len(c) - k - 1)[len(c) - k - 1]
            m = c > off
            u, c = u[m], c[m] - off
        return pa.table(
            {
                "term": pa.array(np.r_[u, [""]], pa.string()),
                "resid": pa.array(np.r_[c, [len(toks)]].astype(np.int64)),
            }
        )

    sk = grouped_agg(
        ds.map_batches(mg_block, batch_format="pyarrow"),
        ["term"],
        [("resid", "sum", "resid")],
        round_to=None,
    ).to_pandas()
    n_total = int(sk.loc[sk["term"] == "", "resid"].iloc[0])
    # provable candidate filter: a true heavy hitter (f * phi_inv > n)
    # has merged resid >= f - n/k > n/phi_inv - n/k, and at most
    # phi_inv*k/(k-phi_inv) terms can exceed that bound (resid sums
    # to <= n) — e.g. <= 267 candidates at the defaults, regardless of
    # vocabulary size. A top-k cap here would NOT be provable: more
    # than k low-grade residuals can outrank a genuine hitter.
    bound = n_total / phi_inv - n_total / k
    cand = sk.loc[(sk["term"] != "") & (sk["resid"] > bound), "term"].to_numpy(object)
    cref = ray.put(np.sort(cand))

    def exact_block(t: pa.Table) -> pa.Table:
        cands = ray.get(cref)
        arr = np.asarray(_toks(t), dtype=object)
        if len(arr) and len(cands):
            pos = np.clip(np.searchsorted(cands, arr), 0, len(cands) - 1)
            hit = cands[pos] == arr
            u, c = np.unique(arr[hit], return_counts=True)
        else:
            u, c = np.array([], object), np.array([], np.int64)
        return pa.table(
            {
                "term": pa.array(u, pa.string()),
                "cnt": pa.array(c.astype(np.int64)),
            }
        )

    counts = grouped_agg(
        ds.map_batches(exact_block, batch_format="pyarrow"),
        ["term"],
        [("cnt", "sum", "cnt")],
        round_to=None,
    )

    def having(t: pa.Table) -> pa.Table:
        cnt = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = cnt * phi_inv > n_total
        return pa.table(
            {
                "term": t["term"].filter(pa.array(m)),
                "cnt": pa.array(cnt[m]),
            }
        )

    return counts.map_batches(having, batch_format="pyarrow")


def t_decontaminate(sf: str, bench_mod: int = 10, k: int = 3):
    """Train/benchmark DECONTAMINATION — the GPT-3-style n-gram overlap
    check: flag every corpus document sharing a word-k-gram with the
    benchmark set (here: doc_id % bench_mod == 0 plays the held-out
    benchmark). Scale shape: the benchmark gram-hash set is SMALL by
    definition (test sets are thousands of docs, not billions), so it
    reduces through a distinct-hash shuffle and broadcasts once via
    ray.put; the 100-TB corpus side is a single streaming map_batches
    probing a sorted uint64 array. Output (doc_id, n_hits) for
    contaminated docs only — exact int64, DuckDB-hash-checked (the
    oracle joins on the identical md5-prefix shingle hash)."""
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def bench_hashes(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        keep = ids % bench_mod == 0
        hs: set[int] = set()
        for s in t.filter(pa.array(keep))["text"].to_pylist():
            hs.update(tx.shingles(s, k))
        return pa.table({"h": pa.array(sorted(hs), pa.uint64())})

    from .relational import broadcast_sorted_keys

    # distinct reduces through a grouped shuffle; the sorted array is
    # built in a worker and bounded loudly (never a driver gather)
    bref = broadcast_sorted_keys(
        ds.map_batches(bench_hashes, batch_format="pyarrow"), "h"
    )

    def probe(t: pa.Table) -> pa.Table:
        bh = ray.get(bref)
        ids = t["doc_id"].to_numpy()
        out_id, out_n = [], []
        for did, s in zip(ids, t["text"].to_pylist()):
            if did % bench_mod == 0:
                continue
            sh = np.fromiter(tx.shingles(s, k), np.uint64)
            if len(sh) == 0 or len(bh) == 0:
                continue
            idx = np.clip(np.searchsorted(bh, sh), 0, len(bh) - 1)
            n = int((bh[idx] == sh).sum())
            if n:
                out_id.append(int(did))
                out_n.append(n)
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()), "n_hits": pa.array(out_n, pa.int64())}
        )

    return ds.map_batches(probe, batch_format="pyarrow").sort("doc_id")


def t_repetition(sf: str, num: int = 1, den: int = 20):
    """Gopher-style REPETITION quality filter: per-doc duplicate
    word-bigram fraction, flagged when (n_grams - n_distinct) exceeds
    num/den (5%) of n_grams — exact integer cross-multiplication, all
    four output columns int64 and DuckDB-hash-checked. Pure streaming
    map (no shuffle): the canonical cheap pre-filter ahead of the
    expensive MinHash/SimHash dedup stages in a training-data prep
    pipeline."""
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n_g, n_d, flag = [], [], []
        for s in t["text"].to_pylist():
            toks = s.split()
            if len(toks) < 2:
                grams = [" ".join(toks)] if toks else []
            else:
                grams = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
            ng, nd = len(grams), len(set(grams))
            n_g.append(ng)
            n_d.append(nd)
            flag.append(int((ng - nd) * den > ng * num))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": pa.array(n_g, pa.int64()),
                "n_distinct": pa.array(n_d, pa.int64()),
                "flagged": pa.array(flag, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


@ray.remote(num_cpus=1)
def _pack_block_sum(t: pa.Table) -> int:
    return int(t["n_tok"].to_numpy(zero_copy_only=False).sum()) if t.num_rows else 0


@ray.remote(num_cpus=1)
def _pack_assign(t: pa.Table, prefix: int, window: int) -> pa.Table:
    """Within one doc_id-sorted block: exclusive running token offset
    seeded with the total of all earlier blocks; chunk = offset //
    window."""
    if t.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_tok": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
            }
        )
    t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
    n = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
    start = prefix + np.r_[0, np.cumsum(n)[:-1]]
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "n_tok": pa.array(n),
            "start_tok": pa.array(start),
            "chunk_id": pa.array(start // window),
        }
    )


def t_pack(sf: str, window: int = 256):
    """Token-budget SEQUENCE PACKING — the pretraining step that
    concatenates the corpus in a canonical order and slices it into
    fixed-size token windows: every doc gets its global start offset
    and the chunk it begins in. The global running sum is a distributed
    PREFIX SCAN (the w9 pattern): one doc_id range-partition sort, then
    a block-boundary exchange of per-block token TOTALS (O(blocks),
    never O(rows)); offset assignment is vectorized per block. Exact
    int64 output, DuckDB-hash-checked against SUM() OVER (ORDER BY
    doc_id)."""
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def counts(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tok": pa.array(
                    [tx.token_count(s) for s in t["text"].to_pylist()], pa.int64()
                ),
            }
        )

    blocks = (
        ds.map_batches(counts, batch_format="pyarrow")
        .sort("doc_id")
        .materialize()
        .to_arrow_refs()
    )
    sums = ray.get([_pack_block_sum.remote(b) for b in blocks])
    prefixes = np.r_[0, np.cumsum(sums)[:-1]].astype(np.int64)
    out = [
        _pack_assign.remote(b, int(p), window) for b, p in zip(blocks, prefixes)
    ]
    return ray.data.from_arrow_refs(out)


_MIX_RATES = (
    (("src0", "src1", "src2", "src3", "src4"), 80),
    (("src5", "src6", "src7", "src8", "src9"), 50),
)
_MIX_DEFAULT = 20


def t_sample_mix(sf: str):
    """Training-MIX construction: deterministic per-source sampling
    rates (80% high-quality sources, 50% mid, 20% tail) via an
    md5-prefix residue of doc_id — reproducible across engines and
    resumable reruns, unlike random_sample. Pure streaming filter (no
    shuffle); the identical md5 arithmetic runs in the DuckDB oracle,
    so the sampled id set hash-matches exactly."""
    import hashlib as _hl

    ds = read_table(sf, "documents", ["doc_id", "source"])
    rate_of = {s: r for srcs, r in _MIX_RATES for s in srcs}

    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        srcs = t["source"].to_pylist()
        keep = np.zeros(len(ids), bool)
        for i, (did, s) in enumerate(zip(ids, srcs)):
            h = int.from_bytes(_hl.md5(str(did).encode()).digest()[:4], "big") % 100
            keep[i] = h < rate_of.get(s, _MIX_DEFAULT)
        return t.filter(pa.array(keep))

    return ds.map_batches(pick, batch_format="pyarrow").sort("doc_id")


def t_lm_score(sf: str):
    """Statistical language-model QUALITY SCORING — the two-pass
    train-then-score shape every count-based filter (KenLM-style
    perplexity gates) runs: pass 1 trains the model = corpus-wide
    bigram counts (per-batch combiner, then one grouped sum — the
    shuffle carries distinct-per-block bigram hashes, never text);
    pass 2 broadcasts the model (vocab^2-bounded, i.e. model-sized, not
    corpus-sized) and scores each doc with its bigrams' total corpus
    frequency ("familiarity") — an exact-integer stand-in for the
    float log-prob sum, so the whole stage is DuckDB-hash-checked.
    Output (doc_id, n_bigrams, familiarity)."""
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def _doc_bigram_hashes(s: str) -> np.ndarray:
        toks = s.split()
        if len(toks) < 2:
            return np.zeros(0, np.uint64)
        grams = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
        return np.fromiter((tx._h64(g.encode()) for g in grams), np.uint64, len(grams))

    def counts(t: pa.Table) -> pa.Table:
        hs: dict[int, int] = {}
        for s in t["text"].to_pylist():
            for h in _doc_bigram_hashes(s):
                hs[int(h)] = hs.get(int(h), 0) + 1
        return pa.table(
            {
                "h": pa.array(list(hs.keys()), pa.uint64()),
                "n": pa.array(list(hs.values()), pa.int64()),
            }
        )

    model = grouped_agg(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["h"],
        [("n", "sum", "n")],
        round_to=None,
    ).to_pandas()
    mk = model["h"].to_numpy(np.uint64)
    mv = model["n"].to_numpy(np.int64)
    o = np.argsort(mk, kind="stable")
    mref = ray.put((mk[o], mv[o]))

    def score(t: pa.Table) -> pa.Table:
        ks, vs = ray.get(mref)
        nb, fam = [], []
        for s in t["text"].to_pylist():
            hs = _doc_bigram_hashes(s)
            nb.append(len(hs))
            if len(hs) == 0 or len(ks) == 0:
                fam.append(0)
                continue
            idx = np.clip(np.searchsorted(ks, hs), 0, len(ks) - 1)
            hit = ks[idx] == hs
            fam.append(int(vs[idx[hit]].sum()))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": pa.array(nb, pa.int64()),
                "familiarity": pa.array(fam, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def t_prep_v2(sf: str, min_tokens: int = 10, bench_mod: int = 10, window: int = 256, pack_tokenizer: str = "ws"):
    """The FULL corpus-prep DAG v2 — every stage a real pipeline runs,
    composed end to end WITH a bit-exact DuckDB oracle (t_prep_pipeline
    plus the round-3 additions):

        repetition + length gate  (dup-bigram frac <= 5%, >= min_tokens)
        -> benchmark DECONTAMINATION (drop held-out docs + any doc
           sharing a 3-gram with them)
        -> exact dedup (min doc_id per content hash)
        -> MinHash near-dedup (LSH -> Jaccard verify -> components)
        -> sequence PACKING of the survivors (prefix scan, fixed window)
        -> one-row integer funnel summary

    Output (n_in, n_gate, n_decon, n_exact, n_near, total_tokens,
    n_chunks) — each count is a stage boundary, so a single hash check
    pins the whole DAG. Scale shape: gates/decontamination are
    streaming maps over a broadcast hash set; dedups are the verified
    adaptive-join machinery; packing is the O(blocks) boundary
    exchange."""
    from ..sources.testdata import table_rows
    from .relational import adaptive_join

    docs = read_table(sf, "documents", ["doc_id", "text"]).materialize()
    n_in = table_rows(sf, "documents")

    if pack_tokenizer not in ("ws", "bpe"):
        raise ValueError(pack_tokenizer)
    bpe_memo: dict[str, int] = {}

    def _pack_count(s: str, toks: list[str]) -> int:
        # packing WEIGHT only — the gate threshold and the bigram stats
        # always use whitespace tokens (mirrors the oracle, where ntok
        # still bounds the bigram iteration and btok packs)
        if pack_tokenizer == "ws":
            return len(toks)
        from ..functions.bpe import bpe_token_count

        tot = 0
        for w in s.split(" "):
            c = bpe_memo.get(w)
            if c is None:
                c = bpe_token_count(w)
                bpe_memo[w] = c
            tot += c
        return tot

    def gate(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        keep, ntoks = [], []
        for s in texts:
            toks = s.split()
            n = len(toks)
            if n < 2:
                grams = [" ".join(toks)] if toks else []
            else:
                grams = [toks[i] + " " + toks[i + 1] for i in range(n - 1)]
            ng, nd = len(grams), len(set(grams))
            keep.append(n >= min_tokens and (ng - nd) * 20 <= ng)
            ntoks.append(_pack_count(s, toks))
        m = pa.array(keep)
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(m),
                "text": t["text"].filter(m),
                "n_tok": pa.array(np.array(ntoks, np.int64)[np.array(keep)]),
            }
        )

    gated = docs.map_batches(gate, batch_format="pyarrow").materialize()
    n_gate = gated.count()

    # benchmark 3-gram hash set from the FULL corpus (the held-out set
    # is independent of the gates), broadcast once
    def bench_hashes(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        hs: set[int] = set()
        for did, s in zip(ids, t["text"].to_pylist()):
            if did % bench_mod == 0:
                hs.update(tx.shingles(s, 3))
        return pa.table({"h": pa.array(sorted(hs), pa.uint64())})

    from .relational import broadcast_sorted_keys

    bref = broadcast_sorted_keys(
        docs.map_batches(bench_hashes, batch_format="pyarrow"), "h"
    )

    def decon(t: pa.Table) -> pa.Table:
        bh = ray.get(bref)
        ids = t["doc_id"].to_numpy()
        keep = np.ones(len(ids), bool)
        for i, (did, s) in enumerate(zip(ids, t["text"].to_pylist())):
            if did % bench_mod == 0:
                keep[i] = False
                continue
            if len(bh):
                sh = np.fromiter(tx.shingles(s, 3), np.uint64)
                if len(sh):
                    idx = np.clip(np.searchsorted(bh, sh), 0, len(bh) - 1)
                    keep[i] = not bool((bh[idx] == sh).any())
        return t.filter(pa.array(keep))

    decon_ds = gated.map_batches(decon, batch_format="pyarrow").materialize()
    n_decon = decon_ds.count()

    def h(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"h": pa.array(hs, pa.string()), "doc_id": t["doc_id"]})

    winners = (
        decon_ds.map_batches(h, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    )
    exact_kept = adaptive_join(decon_ds, winners, "doc_id", "doc_id").materialize()
    n_exact = exact_kept.count()

    survivors = near_dedup_minhash(exact_kept.select_columns(["doc_id", "text"]))
    surv = adaptive_join(exact_kept, survivors, "doc_id", "doc_id").materialize()
    n_near = surv.count()

    # pack the survivors: prefix scan over doc_id order; n_chunks =
    # distinct start//window, counted with an O(blocks) boundary merge
    blocks = (
        surv.select_columns(["doc_id", "n_tok"]).sort("doc_id").materialize().to_arrow_refs()
    )
    sums = ray.get([_pack_block_sum.remote(b) for b in blocks])
    total_tokens = int(sum(sums))
    prefixes = np.r_[0, np.cumsum(sums)[:-1]].astype(np.int64)

    @ray.remote(num_cpus=1)
    def chunk_span(t: pa.Table, prefix: int) -> tuple[int, int, int]:
        if t.num_rows == 0:
            return (-1, -1, 0)
        t = t.take(pc.sort_indices(t, sort_keys=[("doc_id", "ascending")]))
        n = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = prefix + np.r_[0, np.cumsum(n)[:-1]]
        ch = start // window
        return (int(ch[0]), int(ch[-1]), int(len(np.unique(ch))))

    spans = ray.get(
        [chunk_span.remote(b, int(p)) for b, p in zip(blocks, prefixes)]
    )
    n_chunks, prev_last = 0, None
    for first, last, nd in spans:
        if nd == 0:
            continue
        n_chunks += nd - (1 if prev_last is not None and first == prev_last else 0)
        prev_last = last
    return pa.table(
        {
            "n_in": pa.array([n_in], pa.int64()),
            "n_gate": pa.array([n_gate], pa.int64()),
            "n_decon": pa.array([n_decon], pa.int64()),
            "n_exact": pa.array([n_exact], pa.int64()),
            "n_near": pa.array([n_near], pa.int64()),
            "total_tokens": pa.array([total_tokens], pa.int64()),
            "n_chunks": pa.array([n_chunks], pa.int64()),
        }
    )


class _BpeCountStage:
    """Actor-pool stage for t_bpe_real: the merge-replace chain is
    applied once per DISTINCT word and memoized across batches (the
    corpus vocabulary is tiny relative to token volume — the standard
    tokenizer-cache shape). State lives in __init__, not per batch."""

    def __init__(self):
        from ..functions.bpe import MERGES_SF0001, bpe_token_count

        self._count = bpe_token_count
        self._merges = MERGES_SF0001
        self._memo: dict[str, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        memo = self._memo
        counts = []
        for s in t["text"].to_pylist():
            if not set(s) <= _BPE_SAFE_CHARS:
                raise ValueError(
                    "t_bpe_real: text contains characters outside the "
                    "lowercase+space charset the bracket-delimiter "
                    "contract was verified for"
                )
            tot = 0
            for w in s.split(" "):
                c = memo.get(w)
                if c is None:
                    c = self._count(w, self._merges)
                    memo[w] = c
                tot += c
            counts.append(tot)
        return pa.table(
            {"doc_id": t["doc_id"], "n_bpe_real": pa.array(counts, pa.int64())}
        )


_BPE_SAFE_CHARS = frozenset("abcdefghijklmnopqrstuvwxyz ")


def t_bpe_real(sf: str):
    """REAL merge-table BPE token count per doc (round-4 upgrade of
    t_bpe_tokens' regex pre-tokenizer): the pinned 40-merge table
    trained on the sf0.001 corpus (functions/bpe.py) is applied as
    greedy left-to-right pair merges; the SQL oracle replays the
    identical merge chain as nested REPLACEs over the bracketed token
    form, so the driver hash-checks actual BPE semantics, not a
    proxy count."""
    ds = read_table(sf, "documents", ["doc_id", "text"])
    return ds.map_batches(_BpeCountStage, batch_format="pyarrow", concurrency=2)


def t_intradoc_repeats(sf: str, n: int = 2):
    """Intra-document repeated n-gram accounting (the per-doc half of
    ExactSubstr-style dedup, Lee et al. 2022: repeated spans inside one
    document are the densest duplication mode in web corpora): for each
    doc, the number of n-gram positions whose n-gram already occurred
    earlier in the same doc (= sum over distinct grams of count-1).
    Fully vectorized per batch: arrow split_pattern -> one np.unique
    factorization of the batch vocabulary -> per-(doc, gram-code-pair)
    unique+counts -> bincount fold per doc. No per-row Python in the
    gram math; SQL oracle self-joins tokens at +1..+(n-1) offsets and
    reproduces the count exactly."""
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_numpy()
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = pc.split_pattern(col, " ")
        words = np.asarray(lists.flatten().to_pylist(), dtype=object)
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = words != ""  # split on ' ' yields empties for runs/edges
        # re-number positions after dropping empties, per doc
        docseg = np.repeat(np.arange(len(doc_ids), dtype=np.int64), lens)
        docseg = docseg[keep]
        words = words[keep]
        if len(words) == 0:
            return pa.table(
                {"doc_id": t["doc_id"], "n_repeat_positions": pa.array(np.zeros(len(doc_ids), np.int64))}
            )
        _, codes = np.unique(words, return_inverse=True)
        # n-gram start positions: indices i..i+n-1 all in the same doc
        m = len(codes)
        valid = np.ones(max(m - n + 1, 0), bool)
        for j in range(1, n):
            valid &= docseg[j : m - n + 1 + j] == docseg[: m - n + 1]
        gram = np.stack(
            [docseg[: m - n + 1]] + [codes[j : m - n + 1 + j] for j in range(n)], axis=1
        )[valid] if m >= n else np.zeros((0, n + 1), np.int64)
        reps = np.zeros(len(doc_ids), np.int64)
        if len(gram):
            uniq, cnt = np.unique(gram, axis=0, return_counts=True)
            extra = cnt - 1
            nz = extra > 0
            if nz.any():
                np.add.at(reps, uniq[nz, 0], extra[nz])
        return pa.table(
            {"doc_id": t["doc_id"], "n_repeat_positions": pa.array(reps)}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def t_prep_v3(sf: str, min_tokens: int = 10, bench_mod: int = 10, window: int = 256):
    """The corpus-prep capstone v3: identical funnel to t_prep_v2 but
    the sequence-packing budget is the REAL BPE token count
    (functions/bpe.py pinned merge table) instead of the whitespace
    count — token accounting the way a training run actually bills it.
    Same single bit-exact seven-counter DuckDB oracle
    (prep_v2_sql(bpe_pack=True)); only total_tokens / n_chunks move
    vs v2, pinning that the BPE stage composes into the DAG without
    disturbing any gate."""
    return t_prep_v2(sf, min_tokens, bench_mod, window, pack_tokenizer="bpe")
