"""Continuation-session corpus operators: per-document n-gram novelty
(the contribution diagnostic a dedup pass reads before dropping docs)
and DSIR-style importance weights (Data Selection via Importance
Resampling, Xie et al. 2023 — hashed-feature distribution ratios; here
token-granular so the DuckDB oracle is bit-exact without a shared hash).
Each is a `queries()` entry with an integer-exact DuckDB oracle, built
on the adaptive scale machinery from relational.py.

No reference file:line citations are possible — /root/reference is
empty (SURVEY.md §0); the spec base is BASELINE.json + public algorithm
descriptions."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.testdata import read_table
from .relational import adaptive_dim_join, grouped_agg


def _tokenized(ds):
    """(doc_id, text) -> (doc_id, toks:list<string>) with empty tokens
    dropped — the PMI tokenize pass with the doc_id carried along."""

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
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "toks": pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), kept),
            }
        )

    return ds.map_batches(tokenize, batch_format="pyarrow")


def _trigram_pairs(t: pa.Table) -> pa.Table:
    """(doc_id, toks) -> (doc_id, gram) for every in-doc token trigram
    (space-joined). A trigram never crosses a doc boundary: valid start
    i needs i+1 and i+2 inside the same doc (offset masking, the PMI
    bigram pattern extended one position)."""
    lst = t["toks"].combine_chunks()
    vals = lst.flatten()
    offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(vals)
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
    if n >= 3:
        first = np.zeros(n, bool)
        starts = offs[:-1][offs[:-1] < n]
        first[starts] = True
        ok = ~first
        idx = np.flatnonzero(ok[1:-1] & ok[2:])
        g = pc.binary_join_element_wise(
            vals.take(pa.array(idx)),
            vals.take(pa.array(idx + 1)),
            vals.take(pa.array(idx + 2)),
            " ",
        )
        # map flat token index -> doc index (offsets are sorted)
        did = doc_ids[np.searchsorted(offs, idx, side="right") - 1]
    else:
        g = pa.array([], pa.string())
        did = np.zeros(0, np.int64)
    return pa.table(
        {"doc_id": pa.array(did.astype(np.int64)), "gram": g}
    )


def t_ngram_novelty(sf: str):
    """Per-document n-gram novelty: the fraction (ppm, integer-exact)
    of a doc's DISTINCT token trigrams whose global first occurrence
    (min doc_id over docs containing the gram) is this doc — the
    "what does this doc add to the corpus" diagnostic read before an
    ExactSubstr/MinHash drop decision.

    Distributed shape (v2, zero string decoration): a document's rows
    never span batches, so the distinct (doc_id, gram) pair set is a
    LOCAL per-batch group_by — no shuffle. n_grams per doc is then a
    cheap int-keyed count; first_doc = min(doc_id) per gram is the one
    string-keyed exchange (vocab-sized partials); and n_novel per doc
    is just COUNT(gram_first GROUP BY first_doc) — the vocab-sized
    gram->first_doc table never joins back onto the pair set. The
    final decoration is a doc-count-sized left join. v1 shuffled the
    pair set by (doc_id, gram) and broadcast the whole gram vocab back
    onto it: 35 s at sf0.1 vs ~13 s for this shape."""
    ds = read_table(sf, "documents", ["doc_id", "text"])
    pairs_raw = _tokenized(ds).map_batches(_trigram_pairs, batch_format="pyarrow")
    # distinct (doc_id, gram) is exact per batch: each doc lives in one
    # batch, and two docs never share a (doc_id, gram) pair
    pairs = pairs_raw.map_batches(
        lambda t: t.group_by(["doc_id", "gram"]).aggregate([]),
        batch_format="pyarrow",
    ).materialize()
    per_doc = grouped_agg(
        pairs, ["doc_id"], [("n_grams", "count", None)], round_to=None
    )
    gram_first = grouped_agg(
        pairs, ["gram"], [("first_doc", "min", "doc_id")], round_to=None
    )
    novel = grouped_agg(
        gram_first, ["first_doc"], [("n_novel", "count", None)], round_to=None
    )
    dec = adaptive_dim_join(
        per_doc, "doc_id", novel, "first_doc", ["n_novel"], how="left"
    )

    def finalize(t: pa.Table) -> pa.Table:
        ng = t["n_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
        nv = (
            t["n_novel"]
            .combine_chunks()
            .fill_null(0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_grams": pa.array(ng),
                "n_novel": pa.array(nv),
                "novelty_ppm": pa.array(nv * 1_000_000 // ng),
            }
        )

    return dec.map_batches(finalize, batch_format="pyarrow").sort("doc_id")


def t_ngram_novelty_sql() -> str:
    # DuckDB slices are 1-based with inclusive negative ends
    # (l[:-1] is the WHOLE list): the three trigram operands are
    # l[:-3] / l[2:-2] / l[3:], each of length n-2 for len(l)=n>=3.
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
        "'\\s+'), x -> x <> '') AS l FROM documents), "
        "p3 AS (SELECT doc_id, z[1] || ' ' || z[2] || ' ' || z[3] AS gram FROM "
        "(SELECT doc_id, UNNEST(list_zip(l[:-3], l[2:-2], l[3:])) AS z FROM d "
        "WHERE len(l) >= 3) WHERE z[3] IS NOT NULL), "
        "pairs AS (SELECT DISTINCT doc_id, gram FROM p3), "
        "firsts AS (SELECT gram, MIN(doc_id) AS fd FROM pairs GROUP BY gram) "
        "SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
        "CAST(SUM(CASE WHEN f.fd = p.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, "
        "CAST(SUM(CASE WHEN f.fd = p.doc_id THEN 1 ELSE 0 END) * 1000000 "
        "// COUNT(*) AS BIGINT) AS novelty_ppm "
        "FROM pairs p JOIN firsts f USING (gram) GROUP BY p.doc_id ORDER BY p.doc_id"
    )


def t_dsir_weights(sf: str, target_lang: str = "en"):
    """DSIR-style importance weights (Xie et al. 2023): score each raw
    doc by how target-like its token distribution is. Feature buckets
    here are the tokens themselves (the paper hashes n-grams into a
    fixed number of buckets to bound the feature dim; token-granular
    keeps the DuckDB oracle bit-exact without a shared string hash —
    at 100 TB the same pipeline runs over `key_hash_u64(token) % B`
    buckets, which only changes the explode map). Per-token term =
    target-occurrence fraction in ppm: te_e6 = tc * 1e6 // rc with
    tc = occurrences in target-language docs, rc = occurrences in all
    docs. tc <= rc always, so te_e6 <= 1e6 and a per-doc sum is
    int64-safe at ANY corpus size (the PMI overflow lesson applied at
    design time). dsir_e6 = sum of te_e6 over the doc's token
    OCCURRENCES; dsir_avg_e6 = dsir_e6 // n_tokens.

    Distributed shape: one tokenize pass -> grouped_agg on
    (doc_id, token) -> vocab-sized raw/target count tables -> one
    vocab-sized decoration join of the term table back onto the pair
    set -> per-doc grouped_agg. The corpus streams; only vocab- and
    pair-sized sets shuffle."""
    ds = read_table(sf, "documents", ["doc_id", "text", "lang"])

    def tokenize(t: pa.Table) -> pa.Table:
        lst = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+").combine_chunks()
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = lst.flatten()
        keep = pc.not_equal(flat, "")
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tgt = pc.equal(t["lang"], target_lang).to_numpy(zero_copy_only=False)
        n = len(flat)
        row = np.searchsorted(offs, np.arange(n), side="right") - 1
        kmask = keep.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(did[row][kmask]),
                "w": flat.filter(keep),
                "is_tgt": pa.array(tgt[row][kmask].astype(np.int64)),
            }
        )

    toks = ds.map_batches(tokenize, batch_format="pyarrow")
    # (doc_id, w) occurrence counts; is_tgt is constant per doc so
    # summing it counts target occurrences
    pairs = grouped_agg(
        toks,
        ["doc_id", "w"],
        [("c", "count", None), ("tgt_c", "sum", "is_tgt")],
        round_to=None,
    ).materialize()
    vocab = grouped_agg(
        pairs, ["w"], [("rc", "sum", "c"), ("tc", "sum", "tgt_c")], round_to=None
    )

    def term(t: pa.Table) -> pa.Table:
        rc = t["rc"].to_numpy(zero_copy_only=False).astype(np.int64)
        tc = t["tc"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"w": t["w"], "te": pa.array(tc * 1_000_000 // rc)})

    terms = vocab.map_batches(term, batch_format="pyarrow")
    dec = adaptive_dim_join(pairs, "w", terms, "w", ["te"])

    def weigh(t: pa.Table) -> pa.Table:
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        te = t["te"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"doc_id": t["doc_id"], "n": pa.array(c), "s": pa.array(c * te)}
        )

    per_doc = grouped_agg(
        dec.map_batches(weigh, batch_format="pyarrow"),
        ["doc_id"],
        [("n_tokens", "sum", "n"), ("dsir_e6", "sum", "s")],
        round_to=None,
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["dsir_e6"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(n),
                "dsir_e6": pa.array(s),
                "dsir_avg_e6": pa.array(s // n),
            }
        )

    return per_doc.map_batches(finalize, batch_format="pyarrow").sort("doc_id")


def t_dsir_weights_sql(target_lang: str = "en") -> str:
    return (
        "WITH d AS (SELECT doc_id, lang, list_filter(string_split_regex("
        "lower(text), '\\s+'), x -> x <> '') AS l FROM documents), "
        "u AS (SELECT doc_id, lang, UNNEST(l) AS w FROM d), "
        "vocab AS (SELECT w, COUNT(*) AS rc, "
        f"SUM(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END) AS tc "
        "FROM u GROUP BY w), "
        "term AS (SELECT w, tc * 1000000 // rc AS te FROM vocab) "
        "SELECT u.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
        "CAST(SUM(te) AS BIGINT) AS dsir_e6, "
        "CAST(SUM(te) // COUNT(*) AS BIGINT) AS dsir_avg_e6 "
        "FROM u JOIN term USING (w) GROUP BY u.doc_id ORDER BY u.doc_id"
    )


# ------------------------------------------------ t_gopher_quality


def t_gopher_quality(sf: str):
    """Gopher-style quality gates (Rae et al. 2021, public heuristics)
    over the word-level signals this corpus exposes: word count in
    [50, 100k], mean word length in [3, 10] (evaluated by integer
    cross-multiplication — 3*n_words <= sum_wlen <= 10*n_words, no
    float ratio), and >= 80% of words containing an alphabetic
    character (5*n_alpha_words >= 4*n_words). Emits each raw signal,
    each gate bit, and the composite pass flag — all int64, one
    streaming map_batches pass, every kernel vectorized Arrow (both
    engines speak RE2, so token/char counting agrees by
    construction)."""
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def gates(t: pa.Table) -> pa.Table:
        txt = t["text"]
        n_words = pc.count_substring_regex(txt, pattern=r"\S+").cast(pa.int64())
        n_ws = pc.count_substring_regex(txt, pattern=r"\s").cast(pa.int64())
        sum_wlen = pc.subtract(pc.utf8_length(txt).cast(pa.int64()), n_ws)
        n_alpha_words = pc.count_substring_regex(
            txt, pattern=r"\S*[a-zA-Z]\S*"
        ).cast(pa.int64())
        w = n_words.to_numpy(zero_copy_only=False)
        sl = sum_wlen.to_numpy(zero_copy_only=False)
        aw = n_alpha_words.to_numpy(zero_copy_only=False)
        g_wc = ((w >= 50) & (w <= 100_000)).astype(np.int64)
        g_mwl = ((3 * w <= sl) & (sl <= 10 * w)).astype(np.int64)
        g_alpha = (5 * aw >= 4 * w).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_words": n_words,
                "sum_wlen": sum_wlen,
                "n_alpha_words": n_alpha_words,
                "g_wc": pa.array(g_wc),
                "g_mwl": pa.array(g_mwl),
                "g_alpha": pa.array(g_alpha),
                "pass_all": pa.array(g_wc & g_mwl & g_alpha),
            }
        )

    return ds.map_batches(gates, batch_format="pyarrow").sort("doc_id")


def t_gopher_quality_sql() -> str:
    return (
        "WITH s AS (SELECT doc_id, "
        r"CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words, "
        r"CAST(length(text) - len(regexp_extract_all(text, '\s')) AS BIGINT) "
        "AS sum_wlen, "
        r"CAST(len(regexp_extract_all(text, '\S*[a-zA-Z]\S*')) AS BIGINT) "
        "AS n_alpha_words FROM documents) "
        "SELECT doc_id, n_words, sum_wlen, n_alpha_words, "
        "CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END "
        "AS BIGINT) AS g_wc, "
        "CAST(CASE WHEN 3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words "
        "THEN 1 ELSE 0 END AS BIGINT) AS g_mwl, "
        "CAST(CASE WHEN 5 * n_alpha_words >= 4 * n_words THEN 1 ELSE 0 END "
        "AS BIGINT) AS g_alpha, "
        "CAST(CASE WHEN n_words BETWEEN 50 AND 100000 "
        "AND 3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words "
        "AND 5 * n_alpha_words >= 4 * n_words THEN 1 ELSE 0 END AS BIGINT) "
        "AS pass_all FROM s ORDER BY doc_id"
    )


# -------------------------------------------------- t_bpe_train


_BPE_VOCAB_BOUND = 5_000_000


def t_bpe_train(sf: str, n_merges: int = 40):
    """DISTRIBUTED BPE tokenizer training (Sennrich et al. 2016): the
    word-frequency reduction runs distributed (per-batch local count
    combiner -> word co-partition sum, so the shuffle carries
    vocab x blocks partials, never corpus tokens), then the merge loop
    runs over the (word, freq) table in ONE worker task — exactly how
    production tokenizer trainers work: iterate on word COUNTS, never
    raw text. Loud ValueError above _BPE_VOCAB_BOUND distinct words.
    Tie rule (highest pair count, then lexicographically smallest
    pair) matches functions/bpe.train_bpe, and
    tests/test_training_ops.py asserts the distributed result equals
    the driver-side trainer on the same corpus — which also keeps the
    VALUES-form oracle pin honest."""
    from ..functions.bpe import train_bpe_from_vocab
    from .relational import _hash_partitioned_any, _npart

    ds = read_table(sf, "documents", ["text"])

    def wc(t: pa.Table) -> pa.Table:
        # split on the literal single space — the train_bpe contract
        lst = pc.split_pattern(t["text"], " ").combine_chunks()
        flat = lst.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        g = (
            pa.table({"word": flat})
            .group_by("word")
            .aggregate([("word", "count")])
            .rename_columns(["word", "cnt"])
        )
        return pa.table({"word": g["word"], "cnt": g["cnt"].cast(pa.int64())})

    def sum_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"word": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        g = (
            t.select(["word", "cnt"])
            .group_by("word")
            .aggregate([("cnt", "sum")])
            .rename_columns(["word", "cnt"])
        )
        return pa.table({"word": g["word"], "cnt": g["cnt"].cast(pa.int64())})

    counts = _hash_partitioned_any(
        ds.map_batches(wc, batch_format="pyarrow"), ["word"], _npart()
    ).map_groups(sum_part, batch_format="pyarrow")

    def train(t: pa.Table) -> pa.Table:
        if t.num_rows > _BPE_VOCAB_BOUND:
            raise ValueError(
                f"t_bpe_train: {t.num_rows} distinct words exceeds the "
                f"{_BPE_VOCAB_BOUND} single-task merge-loop bound"
            )
        vocab = dict(
            zip(t["word"].to_pylist(), t["cnt"].to_numpy(zero_copy_only=False))
        )
        merges = train_bpe_from_vocab(
            {w: int(c) for w, c in vocab.items()}, n_merges
        )
        return pa.table(
            {
                "merge_rank": pa.array(range(len(merges)), pa.int64()),
                "left_sym": pa.array([a for a, _ in merges], pa.string()),
                "right_sym": pa.array([b for _, b in merges], pa.string()),
            }
        )

    return (
        counts.repartition(1)
        .map_batches(train, batch_format="pyarrow", batch_size=None)
        .sort("merge_rank")
    )


# VALUES-form golden pin for sf0.01 (the driver's correctness scale):
# produced by functions/bpe.train_bpe over the sf0.01 documents and
# kept honest by the distributed-equals-driver retrain pytest.
_BPE_MERGES_SF001 = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"),
]


def t_bpe_train_sql() -> str:
    rows = ", ".join(
        f"({i}, '{a}', '{b}')" for i, (a, b) in enumerate(_BPE_MERGES_SF001)
    )
    return (
        f"SELECT CAST(merge_rank AS BIGINT) AS merge_rank, left_sym, right_sym "
        f"FROM (VALUES {rows}) AS t(merge_rank, left_sym, right_sym) "
        "ORDER BY merge_rank"
    )


# ------------------------------------------------- t_pii_redact

_PII_EMAIL = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def t_pii_redact(sf: str):
    """PII redaction — the standard corpus-prep scrub stage (emails,
    IPv4 addresses, phone-shaped numbers -> typed placeholders, as in
    the BigScience/ROOTS pipeline). The synthetic corpus carries no
    real PII, so each doc is first augmented with a deterministic
    doc_id-derived contact line (same augmentation in the oracle SQL);
    the scrub is then exercised on every row, not on a degenerate
    zero-match corpus. One streaming map_batches pass: RE2 count +
    replace kernels (count_substring_regex / replace_substring_regex),
    no shuffle, no per-row Python — at 100 TB this is a pure map
    stage. Replacement order (email, ip, phone) is fixed and mirrored
    in the oracle so overlapping-pattern interactions stay bit-exact."""
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        did = t["doc_id"].cast(pa.int64())
        d = did.to_numpy(zero_copy_only=False)

        def s(a: np.ndarray) -> pa.Array:
            return pa.array(a.astype(np.int64), pa.int64()).cast(pa.string())

        txt = pc.binary_join_element_wise(
            t["text"],
            " contact user",
            s(d),
            "@mail.example.com from 10.",
            s(d % 200),
            ".0.",
            s((d >> 8) % 256),
            " call 555-867-",
            pc.utf8_lpad(s(d % 10000), 4, "0"),
            "",
        )
        n_email = pc.count_substring_regex(txt, pattern=_PII_EMAIL)
        n_ip = pc.count_substring_regex(txt, pattern=_PII_IPV4)
        n_phone = pc.count_substring_regex(txt, pattern=_PII_PHONE)
        red = pc.replace_substring_regex(txt, pattern=_PII_EMAIL, replacement="<EMAIL>")
        red = pc.replace_substring_regex(red, pattern=_PII_IPV4, replacement="<IP>")
        red = pc.replace_substring_regex(red, pattern=_PII_PHONE, replacement="<PHONE>")
        return pa.table(
            {
                "doc_id": did,
                "n_email": n_email.cast(pa.int64()),
                "n_ip": n_ip.cast(pa.int64()),
                "n_phone": n_phone.cast(pa.int64()),
                "red_text": red,
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow").sort("doc_id")


def t_pii_redact_sql() -> str:
    aug = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com from 10.' "
        "|| CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST((doc_id // 256) % 256 AS VARCHAR) "
        "|| ' call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )
    return (
        f"WITH aug AS (SELECT doc_id, {aug} AS txt FROM documents) "
        "SELECT doc_id, "
        f"CAST(len(regexp_extract_all(txt, '{_PII_EMAIL}')) AS BIGINT) AS n_email, "
        f"CAST(len(regexp_extract_all(txt, '{_PII_IPV4}')) AS BIGINT) AS n_ip, "
        f"CAST(len(regexp_extract_all(txt, '{_PII_PHONE}')) AS BIGINT) AS n_phone, "
        f"regexp_replace(regexp_replace(regexp_replace(txt, '{_PII_EMAIL}', '<EMAIL>', 'g'), "
        f"'{_PII_IPV4}', '<IP>', 'g'), '{_PII_PHONE}', '<PHONE>', 'g') AS red_text "
        "FROM aug ORDER BY doc_id"
    )


# ------------------------------------------------ t_quality_clf


def t_quality_clf(sf: str, n_buckets: int = 4096, scale: int = 1000):
    """Hashed-feature LINEAR classifier scoring — the fastText-style
    quality-classifier pass of the CCNet / GPT-3 / LLaMA corpus
    recipes (Joulin et al. 2016; Brown et al. 2020 §A): each token
    hashes into one of ``n_buckets`` feature buckets, the doc score is
    the sum of the bucket weights over token OCCURRENCES, and the keep
    flag is score >= 0. The weight table here is a deterministic hash
    surrogate (w[b] = b-th bucket's md5-derived value in
    [-scale, scale]) standing in for trained coefficients — a real
    fastText/LR model drops in by replacing `_weights` with the
    trained vector (broadcast once via ray.put at size n_buckets; the
    streaming structure is unchanged). Distinct from t_quality
    (hand-rule heuristics) and t_lm_score (n-gram LM perplexity):
    this is the learned-model seam.

    Scale shape: ONE zero-shuffle streaming map_batches pass — a doc
    never spans a batch, so tokenize -> hash -> bucket-weight ->
    per-doc sum all happen locally (np.bincount over the doc row
    index); md5 runs once per UNIQUE token per batch (np.unique
    inverse), not per occurrence. Integer contract: |score| <=
    n_tokens * scale, int64-safe at any doc length; flag = score >= 0
    so no float threshold exists on either side."""
    import hashlib

    ds = read_table(sf, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        lst = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+").combine_chunks()
        flat = lst.flatten()
        keep = pc.not_equal(flat, "")
        k = keep.to_numpy(zero_copy_only=False)
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(flat)
        row = np.searchsorted(offs, np.arange(n), side="right") - 1
        row = row[k]
        toks = flat.filter(keep).to_pylist()
        # hash once per unique token, then scatter back per occurrence
        uniq, inv = np.unique(np.asarray(toks, dtype=object), return_inverse=True)
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(w.encode("utf-8", "surrogatepass")).digest()[:8], "big"
                )
                for w in uniq
            ),
            np.uint64,
            count=len(uniq),
        )
        bucket = (h % np.uint64(n_buckets)).astype(np.int64)
        # deterministic surrogate weight per BUCKET (not per token):
        # md5 of the bucket id, reduced to [-scale, scale]
        wt_u = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(b).encode()).digest()[:8], "big")
                for b in bucket
            ),
            np.uint64,
            count=len(bucket),
        )
        wt = (wt_u % np.uint64(2 * scale + 1)).astype(np.int64) - scale
        occ_w = wt[inv]
        nb = len(did)
        s = np.bincount(row, weights=occ_w, minlength=nb).astype(np.int64)
        ntok = np.bincount(row, minlength=nb).astype(np.int64)
        has = ntok > 0
        return pa.table(
            {
                "doc_id": pa.array(did[has]),
                "n_tokens": pa.array(ntok[has]),
                "score": pa.array(s[has]),
                "keep_flag": pa.array((s[has] >= 0).astype(np.int64)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


def t_quality_clf_sql(n_buckets: int = 4096, scale: int = 1000) -> str:
    """Same md5 chain: token -> uint64 prefix -> bucket -> md5(bucket)
    -> weight in [-scale, scale]; DuckDB's UBIGINT % keeps both mods
    non-negative exactly like numpy's uint64 %."""
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split_regex("
        "lower(text), '\\s+'), x -> x <> '') AS l FROM documents), "
        "u AS (SELECT doc_id, UNNEST(l) AS w FROM d), "
        "b AS (SELECT doc_id, CAST(CAST('0x' || substr(md5(w),1,16) AS UBIGINT) "
        f"% {n_buckets} AS BIGINT) AS bkt FROM u), "
        "wt AS (SELECT doc_id, CAST(CAST('0x' || substr(md5("
        "CAST(bkt AS VARCHAR)),1,16) AS UBIGINT) "
        f"% {2 * scale + 1} AS BIGINT) - {scale} AS w FROM b) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
        "CAST(SUM(w) AS BIGINT) AS score, "
        "CAST(CASE WHEN SUM(w) >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep_flag "
        "FROM wt GROUP BY doc_id ORDER BY doc_id"
    )


# ------------------------------------------------ t_doc_embed


def t_doc_embed(sf: str, dim: int = 16, scale: int = 100):
    """Hashed DOCUMENT EMBEDDINGS — the text -> vector bridge (the
    feature-hashing / random-projection baseline embedder of Weinberger
    et al. 2009's hashing trick; a learned encoder drops in by
    replacing the per-token component function with model inference in
    this same actor-pool slot). Each token deterministically maps to a
    ``dim``-vector of integers in [-scale, scale] (md5 of
    "<token-hash>-<dim>"); the doc embedding is the SUM over token
    occurrences, emitted LONG-form (doc_id, dim, comp_sum) so the
    DuckDB oracle is a plain unnest/cross-join mirror — bit-exact, no
    float anywhere. Downstream the e_* family consumes these exactly
    like the embeddings table's vectors (sum -> mean is a divide by
    the also-emitted n_tokens at the consumer's chosen precision).

    Scale shape: ONE zero-shuffle streaming pass (doc never spans a
    batch): md5 runs once per UNIQUE token per batch (np.unique
    inverse), components accumulate via one np.add.at per dim over the
    doc row index. Integer contract: |comp_sum| <= n_tokens * scale,
    int64-safe at any doc length."""
    import hashlib

    ds = read_table(sf, "documents", ["doc_id", "text"])

    def embed(t: pa.Table) -> pa.Table:
        lst = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+").combine_chunks()
        flat = lst.flatten()
        keep = pc.not_equal(flat, "")
        k = keep.to_numpy(zero_copy_only=False)
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(flat)
        row = np.searchsorted(offs, np.arange(n), side="right") - 1
        row = row[k]
        toks = flat.filter(keep).to_pylist()
        uniq, inv = np.unique(np.asarray(toks, dtype=object), return_inverse=True)
        th = [
            int.from_bytes(
                hashlib.md5(w.encode("utf-8", "surrogatepass")).digest()[:8], "big"
            )
            for w in uniq
        ]
        m = np.uint64(2 * scale + 1)
        comp = np.empty((len(uniq), dim), np.int64)
        for j, h in enumerate(th):
            hs = str(h)
            for d in range(dim):
                u = int.from_bytes(hashlib.md5(f"{hs}-{d}".encode()).digest()[:8], "big")
                comp[j, d] = u % int(m) - scale
        occ = comp[inv]  # (n_occurrences, dim)
        nb = len(did)
        sums = np.zeros((nb, dim), np.int64)
        np.add.at(sums, row, occ)
        ntok = np.bincount(row, minlength=nb).astype(np.int64)
        has = np.flatnonzero(ntok > 0)
        d_ids = np.repeat(did[has], dim)
        dims = np.tile(np.arange(dim, dtype=np.int64), len(has))
        return pa.table(
            {
                "doc_id": pa.array(d_ids),
                "dim": pa.array(dims),
                "comp_sum": pa.array(sums[has].ravel()),
                "n_tokens": pa.array(np.repeat(ntok[has], dim)),
            }
        )

    return ds.map_batches(embed, batch_format="pyarrow").sort(["doc_id", "dim"])


def t_doc_embed_sql(dim: int = 16, scale: int = 100) -> str:
    """Mirror md5 chain: token -> uint64 -> md5('<u64>-<dim>') ->
    component; DuckDB's CAST(UBIGINT AS VARCHAR) prints the same
    decimal digits python's str() does."""
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split_regex("
        "lower(text), '\\s+'), x -> x <> '') AS l FROM documents), "
        "u AS (SELECT doc_id, UNNEST(l) AS w FROM d), "
        "h AS (SELECT doc_id, CAST('0x' || substr(md5(w),1,16) AS UBIGINT) AS th FROM u), "
        f"g AS (SELECT UNNEST(range({dim})) AS dim), "
        "c AS (SELECT doc_id, dim, CAST(CAST('0x' || substr(md5("
        "CAST(th AS VARCHAR) || '-' || CAST(dim AS VARCHAR)),1,16) AS UBIGINT) "
        f"% {2 * scale + 1} AS BIGINT) - {scale} AS comp "
        "FROM h CROSS JOIN g), "
        "nt AS (SELECT doc_id, COUNT(*) AS n_tokens FROM u GROUP BY doc_id) "
        "SELECT c.doc_id, CAST(c.dim AS BIGINT) AS dim, "
        "CAST(SUM(c.comp) AS BIGINT) AS comp_sum, "
        "CAST(MAX(nt.n_tokens) AS BIGINT) AS n_tokens "
        "FROM c JOIN nt USING (doc_id) GROUP BY c.doc_id, c.dim "
        "ORDER BY c.doc_id, c.dim"
    )


# ------------------------------------------------ t_prep_v5


def t_prep_v5(
    sf: str,
    min_words: int = 20,
    clf_threshold: int = -10000,
    n_buckets: int = 4096,
    scale: int = 1000,
):
    """Corpus-prep capstone v5 — the chain a modern recipe actually
    runs, composing THIS round's classifier with the heuristic gates:
    (1) Gopher-style structural gates (word count >= min_words, mean
    word length in [3, 10] by integer cross-multiplication), (2) the
    hashed-feature CLASSIFIER gate (t_quality_clf's md5 chain, keep
    score >= clf_threshold — heuristics catch structure, the model
    catches content; both gate classes appear in CCNet/GPT-3/LLaMA
    recipes), (3) exact dedup among survivors (md5(text) -> min
    doc_id, the shuffle carries hashes only), (4) per-source
    (n_docs, sum_words) — the mix report a curation run ends with.

    Scale shape: ONE streaming pass computes every per-doc signal
    (tokens, lengths, classifier score, content hash) so the text is
    read once and never shuffles; dedup is a hash-keyed grouped min +
    an adaptive semi-join on doc_id; the finale is a source-sized
    grouped sum."""
    import hashlib

    from .relational import adaptive_semi_filter, grouped_agg

    ds = read_table(sf, "documents", ["doc_id", "text", "source"])

    def signals(t: pa.Table) -> pa.Table:
        lst = pc.split_pattern_regex(pc.utf8_lower(t["text"]), r"\s+").combine_chunks()
        flat = lst.flatten()
        keep = pc.not_equal(flat, "")
        k = keep.to_numpy(zero_copy_only=False)
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(flat)
        row = np.searchsorted(offs, np.arange(n), side="right") - 1
        row = row[k]
        kept = flat.filter(keep)
        toks = kept.to_pylist()
        wlen = pc.utf8_length(kept).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(np.asarray(toks, dtype=object), return_inverse=True)
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(w.encode("utf-8", "surrogatepass")).digest()[:8], "big"
                )
                for w in uniq
            ),
            np.uint64,
            count=len(uniq),
        )
        bucket = (h % np.uint64(n_buckets)).astype(np.int64)
        wt_u = np.fromiter(
            (
                int.from_bytes(hashlib.md5(str(b).encode()).digest()[:8], "big")
                for b in bucket
            ),
            np.uint64,
            count=len(bucket),
        )
        wt = (wt_u % np.uint64(2 * scale + 1)).astype(np.int64) - scale
        nb = len(did)
        score = np.bincount(row, weights=wt[inv], minlength=nb).astype(np.int64)
        nw = np.bincount(row, minlength=nb).astype(np.int64)
        swl = np.bincount(row, weights=wlen, minlength=nb).astype(np.int64)
        ok = (
            (nw >= min_words)
            & (3 * nw <= swl)
            & (swl <= 10 * nw)
            & (score >= clf_threshold)
        )
        ch = [
            hashlib.md5(s.encode()).hexdigest()
            for s in pa.table({"x": t["text"]}).filter(pa.array(ok))["x"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(did[ok]),
                "source": t["source"].filter(pa.array(ok)),
                "n_words": pa.array(nw[ok]),
                "h": pa.array(ch, pa.string()),
            }
        )

    surv = ds.map_batches(signals, batch_format="pyarrow").materialize()
    winners = grouped_agg(
        surv.map_batches(lambda t: t.select(["h", "doc_id"]), batch_format="pyarrow"),
        ["h"],
        [("doc_id", "min", "doc_id")],
        round_to=None,
    ).map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    kept = adaptive_semi_filter(surv, winners, "doc_id", "doc_id")
    out = grouped_agg(
        kept,
        ["source"],
        [("n_docs", "count", None), ("sum_words", "sum", "n_words")],
        round_to=None,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "source": t["source"],
                "n_docs": t["n_docs"].cast(pa.int64()),
                "sum_words": t["sum_words"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("source")


def t_prep_v5_sql(
    min_words: int = 20,
    clf_threshold: int = -10000,
    n_buckets: int = 4096,
    scale: int = 1000,
) -> str:
    return (
        "WITH d AS (SELECT doc_id, source, text, list_filter(string_split_regex("
        "lower(text), '\\s+'), x -> x <> '') AS l FROM documents), "
        "u AS (SELECT doc_id, UNNEST(l) AS w FROM d), "
        "wt AS (SELECT doc_id, length(w) AS wl, "
        "CAST(CAST('0x' || substr(md5(CAST("
        "CAST(CAST('0x' || substr(md5(w),1,16) AS UBIGINT) "
        f"% {n_buckets} AS BIGINT) AS VARCHAR)),1,16) AS UBIGINT) "
        f"% {2 * scale + 1} AS BIGINT) - {scale} AS wgt FROM u), "
        "st AS (SELECT doc_id, COUNT(*) AS nw, SUM(wl) AS swl, SUM(wgt) AS score "
        "FROM wt GROUP BY doc_id), "
        "surv AS (SELECT d.doc_id, d.source, st.nw, md5(d.text) AS h "
        "FROM d JOIN st USING (doc_id) "
        f"WHERE st.nw >= {min_words} AND 3 * st.nw <= st.swl "
        f"AND st.swl <= 10 * st.nw AND st.score >= {clf_threshold}), "
        "win AS (SELECT h, MIN(doc_id) AS doc_id FROM surv GROUP BY h), "
        "kept AS (SELECT s.* FROM surv s JOIN win USING (doc_id)) "
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(nw) AS BIGINT) AS sum_words "
        "FROM kept GROUP BY source ORDER BY source"
    )


# ------------------------------------------- t_span_corruption


def t_span_corruption(sf: str, rate_pct: int = 15, salt: int = 1_000_003):
    """T5-style SPAN-CORRUPTION statistics (Raffel et al. 2020): the
    denoising objective masks ~15% of tokens in contiguous spans; the
    pre-training data pipeline wants, per document, how many tokens
    and how many SPANS that yields (sentinel count = span count, and
    the packed target length is n_masked + n_spans). The random draw
    is the repo's splitmix64 hash surrogate — mix64(doc * salt + i)
    % 100 < ``rate_pct`` — NOT the weaker Knuth multiplicative hash:
    sequential keys under key*C % 2^32 shift by a constant mod 100,
    so adjacent tokens (almost) never co-mask and every span
    degenerates to length 1 (caught in-session by the avg-span
    diagnostic; splitmix64's xor-shift cascade restores the
    independent-Bernoulli span-length law ~1/(1-p)). A span STARTS
    where mask(i) and not mask(i-1). ONE zero-shuffle streaming pass:
    tokens count via one RE2 kernel, hashes vectorize over the
    exploded index ranges (list-offset arithmetic), prev-mask is a
    shift with doc-boundary reset. The DuckDB oracle runs the same
    x0..x5 HUGEINT chain as the minhash oracles and takes prev-mask
    by a (doc_id, i-1) self-join."""
    from ..functions.hll import _mix64

    ds = read_table(sf, "documents", ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        n = (
            pc.count_substring_regex(t["text"], pattern=r"\S+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        off = np.r_[np.int64(0), np.cumsum(n)]
        tot = int(off[-1])
        didx = np.repeat(np.arange(len(doc), dtype=np.int64), n)
        i = np.arange(tot, dtype=np.int64) - off[didx] + 1  # 1-based
        key = (doc[didx] * np.int64(salt) + i).astype(np.uint64)
        mask = _mix64(key) % np.uint64(100) < np.uint64(rate_pct)
        prev = np.r_[False, mask[:-1]] & (i != 1)  # reset at doc start
        start = mask & ~prev
        n_masked = np.bincount(didx, weights=mask, minlength=len(doc)).astype(
            np.int64
        )
        n_spans = np.bincount(didx, weights=start, minlength=len(doc)).astype(
            np.int64
        )
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "n_tokens": pa.array(n),
                "n_masked": pa.array(n_masked),
                "n_spans": pa.array(n_spans),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow").sort("doc_id")


def t_span_corruption_sql(rate_pct: int = 15, salt: int = 1_000_003) -> str:
    from .minhash_oracle import _C1, _C2, _GOLD, _M64, _mul64

    return (
        "WITH tok AS (SELECT doc_id, "
        r"CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n "
        "FROM documents), "
        "idx AS (SELECT doc_id, n, UNNEST(generate_series(1, n)) AS i "
        "FROM tok), "
        "hx AS (SELECT doc_id, i, "
        f"(CAST(doc_id AS HUGEINT) * {salt} + i + {_GOLD}) % {_M64} AS x0, "
        "xor(x0, x0 >> 30) AS x1, "
        f"{_mul64('x1', _C1)} AS x2, "
        "xor(x2, x2 >> 27) AS x3, "
        f"{_mul64('x3', _C2)} AS x4, "
        "xor(x4, x4 >> 31) AS x5 FROM idx), "
        f"m AS (SELECT doc_id, i, CASE WHEN x5 % 100 < {rate_pct} "
        "THEN 1 ELSE 0 END AS msk FROM hx), "
        "st AS (SELECT m.doc_id, m.msk, CASE WHEN m.msk = 1 AND "
        "COALESCE(p.msk, 0) = 0 THEN 1 ELSE 0 END AS st FROM m "
        "LEFT JOIN m p ON p.doc_id = m.doc_id AND p.i = m.i - 1) "
        "SELECT tok.doc_id, tok.n AS n_tokens, "
        "CAST(COALESCE(SUM(st.msk), 0) AS BIGINT) AS n_masked, "
        "CAST(COALESCE(SUM(st.st), 0) AS BIGINT) AS n_spans "
        "FROM tok LEFT JOIN st ON tok.doc_id = st.doc_id "
        "GROUP BY tok.doc_id, tok.n ORDER BY tok.doc_id"
    )


def t_bm25(
    sf: str,
    query_docs: tuple[int, ...] = (0, 17, 34),
    terms_per_query: int = 4,
    k: int = 10,
):
    """BM25 lexical retrieval top-k (Robertson & Walker 1994; Robertson
    & Zaragoza 2009) — the LEXICAL sibling of the dense e_* retrieval
    family, integer-exact end to end. Queries derive from the corpus
    itself (the first ``terms_per_query`` DISTINCT tokens, ascending,
    of each query doc) so no external data enters.

    Integer contract (k1 = 6/5, b = 3/4; no float on either side):
      idf_e6     = (1e6 * (2*(N - df) + 1)) // (2*df + 1)
                   — the Robertson idf ratio (N-df+0.5)/(df+0.5) as an
                   exact rational floor WITHOUT the log wrap (monotone
                   in the classic idf; a documented surrogate, chosen
                   because ln() is float on both engines and a rounded
                   double at the floor boundary is not bit-portable)
      ndl_e6     = (1e6 * dl * N) // SUM_DL    (normalized doc length)
      contrib_e6 = (idf_e6 * 44_000_000 * tf)
                   // (20_000_000*tf + 6_000_000 + 18*ndl_e6)
                   — tf*(k1+1) / (tf + k1*(1 - b + b*ndl)) with both
                   sides multiplied through by 20e6; intermediates
                   overflow int64 (idf_e6*44e6*tf), so the per-row
                   arithmetic runs in arbitrary-precision Python ints
                   on the MATCHED rows only (HUGEINT in the oracle —
                   the t_pmi_bigrams overflow lesson)
      score_e6   = sum of contrib_e6 over matched query terms
                   (int64-safe output until N ~ 1e12 docs)

    Distributed shape: pass A streams per-batch (n_docs, n_tokens)
    partials for N / SUM_DL (two scalars). Pass B explodes per-(doc,
    term) tf + dl — batch-local, a doc never spans a batch, zero
    shuffle — and filters to the <= len(query_docs)*terms_per_query
    query terms, so only the selective MATCH set materializes; df is a
    combiner-first grouped count over it (a query-term-sized gather),
    contributions stream per batch, partial scores merge through ONE
    (qid, doc_id)-keyed grouped_agg, and the final top-k is a
    per-batch combiner + one k*blocks-row finalize. The corpus never
    gathers and never shuffles."""
    from .relational import grouped_agg

    ds = read_table(sf, "documents", ["doc_id", "text"])

    # ---- query terms: first `terms_per_query` distinct tokens asc of
    # each query doc (a len(query_docs)-row driver gather)
    qset = set(int(q) for q in query_docs)
    qrows = (
        _tokenized(ds)
        .map_batches(
            lambda t: t.filter(
                pa.array(np.isin(t["doc_id"].to_numpy(zero_copy_only=False), list(qset)))
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    term_to_qids: dict[str, list[int]] = {}
    for r in qrows:
        qid = int(np.flatnonzero(np.array(sorted(qset)) == r["doc_id"])[0])
        for tm in sorted(set(r["toks"]))[:terms_per_query]:
            term_to_qids.setdefault(tm, []).append(qid)
    qterm_list = sorted(term_to_qids)

    # ---- pass A: corpus totals (N = docs with >= 1 token, SUM_DL)
    def totals_batch(t: pa.Table) -> pa.Table:
        lst = t["toks"].combine_chunks()
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = offs[1:] - offs[:-1]
        return pa.table(
            {
                "nd": pa.array([int((cnt > 0).sum())], pa.int64()),
                "nt": pa.array([int(cnt.sum())], pa.int64()),
            }
        )

    tot = _tokenized(ds).map_batches(totals_batch, batch_format="pyarrow").sum(["nd", "nt"])
    n_docs, sum_dl = int(tot["sum(nd)"]), int(tot["sum(nt)"])

    # ---- pass B: batch-local (doc, term, tf, dl) explode, filtered to
    # the query terms before anything leaves the batch
    qarr = pa.array(qterm_list, pa.string())
    qterms_np = np.array(qterm_list, object)
    nq = len(qterm_list)

    def match_batch(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or nq == 0:
            return empty
        lst = t["toks"].combine_chunks()
        flat = lst.flatten()
        if len(flat) == 0:
            return empty
        offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = offs[1:] - offs[:-1]
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = pc.is_in(flat, value_set=qarr).to_numpy(zero_copy_only=False)
        if not m.any():
            return empty
        tok_doc = np.repeat(np.arange(len(cnt), dtype=np.int64), cnt)
        sel = np.flatnonzero(m)
        tid = (
            pc.index_in(flat.take(pa.array(sel)), value_set=qarr)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        key = tok_doc[sel] * nq + tid
        uk, tf = np.unique(key, return_counts=True)
        d_pos = uk // nq
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[d_pos]),
                "term": pa.array(qterms_np[uk % nq], pa.string()),
                "tf": pa.array(tf.astype(np.int64)),
                "dl": pa.array(cnt[d_pos]),
            }
        )

    matched = _tokenized(ds).map_batches(match_batch, batch_format="pyarrow").materialize()

    # ---- df per query term (query-term-sized gather), then exact idf
    df_rows = grouped_agg(
        matched, ["term"], [("df", "count", None)], round_to=None
    ).take_all()
    idf_e6 = {
        r["term"]: (1_000_000 * (2 * (n_docs - int(r["df"])) + 1)) // (2 * int(r["df"]) + 1)
        for r in df_rows
    }

    # ---- per-row contributions (Python bigints over matched rows only)
    def contrib_batch(t: pa.Table) -> pa.Table:
        docs = t["doc_id"].to_numpy(zero_copy_only=False)
        tfs = t["tf"].to_numpy(zero_copy_only=False)
        dls = t["dl"].to_numpy(zero_copy_only=False)
        terms = t["term"].to_pylist()
        oq: list[int] = []
        od: list[int] = []
        oc: list[int] = []
        for i, tm in enumerate(terms):
            tf_i, dl_i = int(tfs[i]), int(dls[i])
            ndl = (1_000_000 * dl_i * n_docs) // sum_dl
            c = (idf_e6[tm] * 44_000_000 * tf_i) // (
                20_000_000 * tf_i + 6_000_000 + 18 * ndl
            )
            for q in term_to_qids[tm]:
                oq.append(q)
                od.append(int(docs[i]))
                oc.append(c)
        return pa.table(
            {
                "qid": pa.array(oq, pa.int64()),
                "doc_id": pa.array(od, pa.int64()),
                "contrib": pa.array(oc, pa.int64()),
            }
        )

    scores = grouped_agg(
        matched.map_batches(contrib_batch, batch_format="pyarrow"),
        ["qid", "doc_id"],
        [("score_e6", "sum", "contrib"), ("n_terms", "count", None)],
        round_to=None,
    )

    # ---- top-k per query: per-batch combiner + one small finalize
    def local_topk(t: pa.Table) -> pa.Table:
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("qid", "ascending"),
                    ("score_e6", "descending"),
                    ("doc_id", "ascending"),
                ],
            )
        )
        q = t["qid"].to_numpy(zero_copy_only=False)
        starts = np.r_[True, q[1:] != q[:-1]] if len(q) else np.zeros(0, bool)
        gid = np.cumsum(starts) - 1 if len(q) else np.zeros(0, np.int64)
        pos = (
            np.arange(len(q)) - np.flatnonzero(starts)[gid]
            if len(q)
            else np.zeros(0, np.int64)
        )
        return t.filter(pa.array(pos < k))

    def final_rank(t: pa.Table) -> pa.Table:
        t = local_topk(t)
        q = t["qid"].to_numpy(zero_copy_only=False)
        starts = np.r_[True, q[1:] != q[:-1]] if len(q) else np.zeros(0, bool)
        gid = np.cumsum(starts) - 1 if len(q) else np.zeros(0, np.int64)
        pos = (
            np.arange(len(q)) - np.flatnonzero(starts)[gid]
            if len(q)
            else np.zeros(0, np.int64)
        )
        return pa.table(
            {
                "qid": pc.cast(t["qid"], pa.int64()),
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "score_e6": pc.cast(t["score_e6"], pa.int64()),
                "n_terms": pc.cast(t["n_terms"], pa.int64()),
                "rank": pa.array(pos + 1, pa.int64()),
            }
        )

    return (
        scores.map_batches(local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final_rank, batch_format="pyarrow", batch_size=None)
    )


def t_bm25_sql(
    query_docs: tuple[int, ...] = (0, 17, 34),
    terms_per_query: int = 4,
    k: int = 10,
) -> str:
    vals = ", ".join(f"({i}, {d})" for i, d in enumerate(sorted(query_docs)))
    return (
        "WITH d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), "
        "'\\s+'), x -> x <> '') AS l FROM documents), "
        "tok AS (SELECT doc_id, UNNEST(l) AS term FROM d), "
        "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf "
        "FROM tok GROUP BY 1, 2), "
        "dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1), "
        "tot AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(dl) AS HUGEINT) AS sum_dl FROM dl), "
        "q AS (SELECT qid, term FROM (SELECT v.qid, f.term, "
        "ROW_NUMBER() OVER (PARTITION BY v.qid ORDER BY f.term) AS rn "
        f"FROM (VALUES {vals}) v(qid, qdoc) "
        "JOIN (SELECT DISTINCT doc_id, term FROM tf) f ON f.doc_id = v.qdoc) "
        f"WHERE rn <= {terms_per_query}), "
        "df AS (SELECT term, CAST(COUNT(*) AS HUGEINT) AS df FROM tf "
        "WHERE term IN (SELECT term FROM q) GROUP BY 1), "
        "c AS (SELECT q.qid, f.doc_id, "
        "((CAST(1000000 AS HUGEINT) * (2 * ((SELECT n FROM tot) - d2.df) + 1)) "
        "// (2 * d2.df + 1)) * (CAST(44000000 AS HUGEINT) * f.tf) "
        "// (CAST(20000000 AS HUGEINT) * f.tf + 6000000 + 18 * "
        "((CAST(1000000 AS HUGEINT) * l.dl * (SELECT n FROM tot)) "
        "// (SELECT sum_dl FROM tot))) AS contrib "
        "FROM q JOIN tf f USING (term) JOIN df d2 USING (term) "
        "JOIN dl l ON l.doc_id = f.doc_id), "
        "s AS (SELECT qid, doc_id, CAST(SUM(contrib) AS BIGINT) AS score_e6, "
        "CAST(COUNT(*) AS BIGINT) AS n_terms FROM c GROUP BY 1, 2) "
        "SELECT CAST(qid AS BIGINT) AS qid, doc_id, score_e6, n_terms, rank "
        "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid "
        "ORDER BY score_e6 DESC, doc_id) AS rank FROM s) "
        f"WHERE rank <= {k} ORDER BY qid, rank"
    )
