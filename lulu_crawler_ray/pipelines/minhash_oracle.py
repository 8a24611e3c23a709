"""DuckDB oracle SQL builders for the MinHash-LSH family.

The engine's minhash stack is exact-deterministic end to end —
word-3-gram shingles hashed by an md5 prefix (`textstats._h64`),
splitmix64 signature mixing (`hll._mix64`), FNV-1a band keys
(`textops.MinHasher`), chained in-bucket candidate pairs, Jaccard
verify, min-root connected components — so ALL of it is expressible in
ANSI-ish SQL that DuckDB runs on the same parquet:

* 64-bit wrap-around multiplication (the only non-SQL-native step) is
  done in HUGEINT via a 32-bit split:
  ``a*c mod 2^64 = (a_lo*c + ((a_hi*c_lo) mod 2^32)*2^32) mod 2^64``.
* The 64 permutation seeds are algorithm constants (np RNG, seed=1) and
  are embedded as a VALUES list, exactly like the engine's actors
  re-derive them in ``MinHasher.__init__``.
* Chained pairs (a bucket of n docs emits n-1 consecutive-id pairs, not
  n^2) come from ``LAG() OVER (PARTITION BY band, bucket ORDER BY
  doc_id)``.
* Connected components use the same min-root recursive CTE shape as the
  ``e_cosine_dedup`` oracle.

These make `t_minhash_pairs`, `t_near_dedup` and the composed
`t_prep_pipeline` (round-2's only CORRECTNESS failure) hash-checked
instead of rows-only.
"""

from __future__ import annotations

import numpy as np

_M64 = 18446744073709551616  # 2^64
_GOLD = 0x9E3779B97F4A7C15
_C1 = 0xBF58476D1CE4E5B9
_C2 = 0x94D049BB133111EB
_FNV_OFF = 0xCBF29CE484222325
_FNV_P = 0x100000001B3


def _mul64(a_expr: str, c: int) -> str:
    """(a * c) mod 2^64 in HUGEINT via 32-bit split (no 128-bit overflow)."""
    c_lo = c % (1 << 32)
    return (
        f"((({a_expr}) % 4294967296) * {c} + "
        f"(((({a_expr}) // 4294967296) * {c_lo}) % 4294967296) * 4294967296) % {_M64}"
    )


def minhash_ctes(corpus: str) -> str:
    """CTE chain (no WITH keyword) ending in ``cand(a, b)`` — the LSH
    chained candidate pairs over ``corpus(doc_id, text)`` — plus
    ``sh(doc_id, shingle)``, the distinct word-3-gram shingle rows.
    Mirrors MinHasher (NUM_PERM=64, BANDS=16, seed=1) bit for bit."""
    seeds = np.random.default_rng(1).integers(0, 1 << 63, 64).astype(np.uint64)
    seed_rows = ", ".join(f"({i}, {int(s)})" for i, s in enumerate(seeds))
    return f"""seeds(pi, seed) AS (VALUES {seed_rows}),
mh_lists AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l
  FROM {corpus}
),
mh_lists2 AS (SELECT doc_id, l, len(l) AS ntok FROM mh_lists),
mh_grams AS (
  SELECT doc_id, l[CAST(i AS BIGINT)] || ' ' || l[CAST(i AS BIGINT)+1] || ' ' || l[CAST(i AS BIGINT)+2] AS g
  FROM mh_lists2 CROSS JOIN LATERAL (SELECT UNNEST(range(1, ntok - 1)) AS i) t
  WHERE ntok >= 3
  UNION ALL
  SELECT doc_id, array_to_string(l, ' ') AS g FROM mh_lists2 WHERE ntok >= 1 AND ntok < 3
),
sh AS (
  SELECT DISTINCT doc_id, CAST(CAST('0x' || substr(md5(g),1,16) AS UBIGINT) AS HUGEINT) AS shingle
  FROM mh_grams
),
mh_mixed AS (
  SELECT doc_id, pi, MIN(x5) AS sig FROM (
    SELECT doc_id, pi,
      (xor(shingle, CAST(seed AS HUGEINT)) + {_GOLD}) % {_M64} AS x0,
      xor(x0, x0 >> 30) AS x1,
      {_mul64('x1', _C1)} AS x2,
      xor(x2, x2 >> 27) AS x3,
      {_mul64('x3', _C2)} AS x4,
      xor(x4, x4 >> 31) AS x5
    FROM sh CROSS JOIN seeds
  ) GROUP BY doc_id, pi
),
mh_allsig AS (
  SELECT d.doc_id, s.pi, COALESCE(m.sig, {_M64 - 1}) AS sig
  FROM (SELECT DISTINCT doc_id FROM {corpus}) d
  CROSS JOIN seeds s
  LEFT JOIN mh_mixed m ON m.doc_id = d.doc_id AND m.pi = s.pi
),
mh_folded AS (
  SELECT doc_id, pi // 4 AS band, sig,
    ROW_NUMBER() OVER (PARTITION BY doc_id, pi // 4 ORDER BY pi) AS rk
  FROM mh_allsig
),
mh_f1 AS (SELECT doc_id, band, {_mul64(f'xor({_FNV_OFF}, sig)', _FNV_P)} AS h FROM mh_folded WHERE rk = 1),
mh_f2 AS (SELECT f.doc_id, f.band, {_mul64('xor(f.h, g.sig)', _FNV_P)} AS h
       FROM mh_f1 f JOIN mh_folded g ON g.doc_id=f.doc_id AND g.band=f.band AND g.rk=2),
mh_f3 AS (SELECT f.doc_id, f.band, {_mul64('xor(f.h, g.sig)', _FNV_P)} AS h
       FROM mh_f2 f JOIN mh_folded g ON g.doc_id=f.doc_id AND g.band=f.band AND g.rk=3),
mh_f4 AS (SELECT f.doc_id, f.band, {_mul64('xor(f.h, g.sig)', _FNV_P)} AS h
       FROM mh_f3 f JOIN mh_folded g ON g.doc_id=f.doc_id AND g.band=f.band AND g.rk=4),
mh_chained AS (
  SELECT band, h, doc_id,
    LAG(doc_id) OVER (PARTITION BY band, h ORDER BY doc_id) AS prev
  FROM mh_f4
),
cand AS (SELECT DISTINCT prev AS a, doc_id AS b FROM mh_chained WHERE prev IS NOT NULL)"""


def survivor_ctes(corpus: str, threshold: float = 0.7) -> str:
    """minhash_ctes + Jaccard verify + min-root components; ends in
    ``kept(doc_id)`` — the near-dedup survivors of ``corpus``.
    jaccard(emptyset, emptyset) = 1.0, matching textstats.jaccard."""
    return (
        minhash_ctes(corpus)
        + f""",
mh_szs AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
mh_inter AS (
  SELECT c.a, c.b, COUNT(*) AS ni
  FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
),
ver AS (
  SELECT c.a, c.b FROM cand c
  LEFT JOIN mh_szs za ON za.doc_id = c.a
  LEFT JOIN mh_szs zb ON zb.doc_id = c.b
  LEFT JOIN mh_inter i ON i.a = c.a AND i.b = c.b
  WHERE (COALESCE(za.n,0) + COALESCE(zb.n,0) - COALESCE(i.ni,0)) = 0
     OR CAST(COALESCE(i.ni,0) AS DOUBLE) / (COALESCE(za.n,0) + COALESCE(zb.n,0) - COALESCE(i.ni,0)) >= {threshold}
),
edges AS (SELECT a, b FROM ver UNION SELECT b AS a, a AS b FROM ver),
reach(node, root) AS (
  SELECT doc_id, doc_id FROM {corpus}
  UNION SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node WHERE r.root < e.b
),
comp AS (SELECT node, MIN(root) AS root FROM reach GROUP BY node),
kept AS (SELECT node AS doc_id FROM comp WHERE root = node)"""
    )


def minhash_pairs_sql() -> str:
    """Oracle for t_minhash_pairs: the distinct chained LSH candidate
    pairs over the documents table."""
    return "WITH " + minhash_ctes("documents") + "\nSELECT a, b FROM cand"


def near_dedup_sql() -> str:
    """Oracle for t_near_dedup: near-dedup survivors of documents."""
    return (
        "WITH RECURSIVE "
        + survivor_ctes("documents")
        + "\nSELECT doc_id FROM kept"
    )


def prep_pipeline_sql(min_tokens: int = 30, max_digit_ratio: float = 0.3) -> str:
    """Oracle for t_prep_pipeline: quality gate -> exact dedup (min
    doc_id per text) -> minhash near-dedup over the kept set -> per-lang
    (n_docs, sum_tokens) summary. Same defaults as textops."""
    gate = f"""gated AS (
  SELECT doc_id, text, lang,
    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens
  FROM documents
  WHERE len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) >= {min_tokens}
    AND CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
        / GREATEST(length(text), 1) <= {max_digit_ratio}
),
exact_kept AS (
  SELECT g.* FROM gated g JOIN (
    SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY text
  ) w USING (doc_id)
)"""
    return (
        "WITH RECURSIVE "
        + gate
        + ",\n"
        + survivor_ctes("exact_kept")
        + """
SELECT e.lang, COUNT(*) AS n_docs, CAST(SUM(e.n_tokens) AS BIGINT) AS sum_tokens
FROM exact_kept e JOIN kept USING (doc_id)
GROUP BY e.lang"""
    )


def hll_registers_sql(p: int = 12) -> str:
    """Oracle for g18_hll_registers: the HLL register state as exact
    integers — splitmix64 (same x0..x5 HUGEINT chain as the minhash
    CTEs, no seed xor), bucket = top-p bits, rank = 65 - bitlength of
    (h << p | low-ones) via DuckDB's minimal-length bin(). DISTINCT
    first is free: registers are max-folds, idempotent over
    duplicates."""
    m = 1 << p
    shift = 1 << (64 - p)
    return f"""WITH hv AS (SELECT DISTINCT l_partkey FROM lineitem),
hx AS (
  SELECT
    (CAST(l_partkey AS HUGEINT) + {_GOLD}) % {_M64} AS x0,
    xor(x0, x0 >> 30) AS x1,
    {_mul64('x1', _C1)} AS x2,
    xor(x2, x2 >> 27) AS x3,
    {_mul64('x3', _C2)} AS x4,
    xor(x4, x4 >> 31) AS x5
  FROM hv
),
rr AS (
  SELECT x5 // {shift} AS idx,
    65 - length(bin(CAST(({_mul64('x5', m)} + {m - 1}) AS UBIGINT))) AS rank
  FROM hx
),
reg AS (SELECT idx, MAX(rank) AS r FROM rr GROUP BY idx)
SELECT CAST(SUM(r) AS BIGINT) AS reg_sum, CAST(COUNT(*) AS BIGINT) AS n_nonzero FROM reg"""


def prep_v2_sql(min_tokens: int = 10, bench_mod: int = 10, window: int = 256, bpe_pack: bool = False) -> str:
    """Oracle for t_prep_v2 — the full corpus-prep DAG as ONE SQL
    statement: repetition+length gate, 3-gram benchmark
    decontamination (same md5-prefix hash as the engine), exact dedup,
    the minhash survivor chain (survivor_ctes), and the packing prefix
    scan. Same defaults as textops.t_prep_v2. With ``bpe_pack`` the
    packing weight becomes the REAL BPE token count (the nested-REPLACE
    chain from functions/bpe.py, computed in its own MATERIALIZED CTE —
    inlining it into pv_d3 trips a DuckDB binder internal error — and
    kept SEPARATE from ntok, which still drives the bigram iteration
    bound); this is t_prep_v3's oracle."""
    if bpe_pack:
        from ..functions.bpe import bpe_oracle_expr

        pv_d3_cte = (
            "pv_bpe AS MATERIALIZED (SELECT doc_id, " + bpe_oracle_expr("text")
            + " AS btok FROM documents), "
            "pv_d3 AS (SELECT p.doc_id, p.text, p.l, len(p.l) AS ntok, b.btok "
            "FROM pv_d2 p JOIN pv_bpe b USING (doc_id)),"
        )
        btok_col, pack_col = ", d.btok", "btok"
    else:
        pv_d3_cte = "pv_d3 AS (SELECT doc_id, text, l, len(l) AS ntok FROM pv_d2),"
        btok_col, pack_col = "", "ntok"
    head = f"""pv_d2 AS (SELECT doc_id, text, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l FROM documents),
{pv_d3_cte}
pv_big AS (
  SELECT doc_id, l[CAST(i AS BIGINT)] || ' ' || l[CAST(i AS BIGINT)+1] AS g
  FROM pv_d3 CROSS JOIN LATERAL (SELECT UNNEST(range(1, ntok)) AS i) t WHERE ntok >= 2
  UNION ALL SELECT doc_id, array_to_string(l, ' ') FROM pv_d3 WHERE ntok >= 1 AND ntok < 2),
pv_rep AS MATERIALIZED (SELECT doc_id, COUNT(*) AS ng, COUNT(DISTINCT g) AS nd FROM pv_big GROUP BY 1),
pv_gated AS MATERIALIZED (
  SELECT d.doc_id, d.text, d.ntok{btok_col} FROM pv_d3 d LEFT JOIN pv_rep r USING (doc_id)
  WHERE d.ntok >= {min_tokens}
    AND (COALESCE(r.ng, 0) - COALESCE(r.nd, 0)) * 20 <= COALESCE(r.ng, 0)),
pv_tri AS (
  SELECT doc_id, l[CAST(i AS BIGINT)] || ' ' || l[CAST(i AS BIGINT)+1] || ' ' || l[CAST(i AS BIGINT)+2] AS g
  FROM pv_d3 CROSS JOIN LATERAL (SELECT UNNEST(range(1, ntok - 1)) AS i) t WHERE ntok >= 3
  UNION ALL SELECT doc_id, array_to_string(l, ' ') FROM pv_d3 WHERE ntok >= 1 AND ntok < 3),
pv_sh3 AS MATERIALIZED (SELECT DISTINCT doc_id, CAST(CAST('0x' || substr(md5(g),1,16) AS UBIGINT) AS HUGEINT) AS h FROM pv_tri),
pv_bench AS MATERIALIZED (SELECT DISTINCT h FROM pv_sh3 WHERE doc_id % {bench_mod} = 0),
pv_contam AS MATERIALIZED (SELECT DISTINCT s.doc_id FROM pv_sh3 s JOIN pv_bench b ON s.h = b.h
              WHERE s.doc_id % {bench_mod} <> 0),
pv_decon AS MATERIALIZED (SELECT g.* FROM pv_gated g WHERE g.doc_id % {bench_mod} <> 0
             AND g.doc_id NOT IN (SELECT doc_id FROM pv_contam)),
exact_kept2 AS MATERIALIZED (SELECT d.* FROM pv_decon d JOIN (
  SELECT MIN(doc_id) AS doc_id FROM pv_decon GROUP BY text) w USING (doc_id)),
"""
    tail = f""",
pv_surv AS MATERIALIZED (SELECT e.doc_id, e.{pack_col} AS ntok FROM exact_kept2 e JOIN kept USING (doc_id)),
pv_packed AS (SELECT doc_id, SUM(ntok) OVER (ORDER BY doc_id
  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok AS start_tok FROM pv_surv)
SELECT CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_in,
  CAST((SELECT COUNT(*) FROM pv_gated) AS BIGINT) AS n_gate,
  CAST((SELECT COUNT(*) FROM pv_decon) AS BIGINT) AS n_decon,
  CAST((SELECT COUNT(*) FROM exact_kept2) AS BIGINT) AS n_exact,
  CAST((SELECT COUNT(*) FROM pv_surv) AS BIGINT) AS n_near,
  CAST((SELECT COALESCE(SUM(ntok), 0) FROM pv_surv) AS BIGINT) AS total_tokens,
  CAST((SELECT COUNT(DISTINCT start_tok // {window}) FROM pv_packed) AS BIGINT) AS n_chunks"""
    return "WITH RECURSIVE " + head + survivor_ctes("exact_kept2") + tail


def cms_registers_sql(w: int = 1024, d: int = 4) -> str:
    """Oracle for g21_cms_registers: the Count-Min register state as
    exact integers — same seeded splitmix64 HUGEINT chain as the
    minhash CTEs (seed xor'd in), idx = h % w, counters WITH
    multiplicity (no DISTINCT: CMS counts frequencies)."""
    seeds = ",".join(f"({i})" for i in range(d))
    return f"""WITH s(seed) AS (VALUES {seeds}),
hx AS (
  SELECT s.seed,
    (xor(CAST(l_partkey AS HUGEINT), CAST(s.seed AS HUGEINT)) + {_GOLD}) % {_M64} AS x0,
    xor(x0, x0 >> 30) AS x1,
    {_mul64('x1', _C1)} AS x2,
    xor(x2, x2 >> 27) AS x3,
    {_mul64('x3', _C2)} AS x4,
    xor(x4, x4 >> 31) AS x5
  FROM lineitem CROSS JOIN s
),
reg AS (SELECT seed, x5 % {w} AS idx, COUNT(*) AS cnt FROM hx GROUP BY seed, idx)
SELECT CAST(seed AS BIGINT) AS seed, CAST(COUNT(*) AS BIGINT) AS n_nonzero,
       CAST(SUM((idx + 1) * cnt) AS BIGINT) AS chk,
       CAST(SUM(cnt * cnt) AS BIGINT) AS sq
FROM reg GROUP BY seed ORDER BY seed"""


def grouped_hll_registers_sql(p: int = 12) -> str:
    """Oracle for g22_grouped_hll_registers: g18's register-state
    contract PER GROUP — proves the grouped sketch (g14's 100-TB
    shape) bit-for-bit, closing its rows-only gap."""
    m = 1 << p
    shift = 1 << (64 - p)
    return f"""WITH hv AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
hx AS (
  SELECT l_returnflag,
    (CAST(l_partkey AS HUGEINT) + {_GOLD}) % {_M64} AS x0,
    xor(x0, x0 >> 30) AS x1,
    {_mul64('x1', _C1)} AS x2,
    xor(x2, x2 >> 27) AS x3,
    {_mul64('x3', _C2)} AS x4,
    xor(x4, x4 >> 31) AS x5
  FROM hv
),
rr AS (
  SELECT l_returnflag, x5 // {shift} AS idx,
    65 - length(bin(CAST(({_mul64('x5', m)} + {m - 1}) AS UBIGINT))) AS rank
  FROM hx
),
reg AS (SELECT l_returnflag, idx, MAX(rank) AS r FROM rr GROUP BY l_returnflag, idx)
SELECT l_returnflag, CAST(SUM(r) AS BIGINT) AS reg_sum,
       CAST(COUNT(*) AS BIGINT) AS n_nonzero
FROM reg GROUP BY l_returnflag"""


def cluster_sizes_sql() -> str:
    """Oracle for t_cluster_sizes: histogram of near-dup component
    sizes over documents (comp = the same min-root recursive CTE the
    survivor oracle uses; singletons included)."""
    return (
        "WITH RECURSIVE "
        + survivor_ctes("documents")
        + "\nSELECT CAST(sz AS BIGINT) AS cluster_size, "
        "CAST(COUNT(*) AS BIGINT) AS n_clusters FROM "
        "(SELECT root, COUNT(*) AS sz FROM comp GROUP BY root) "
        "GROUP BY sz ORDER BY 1"
    )


def jaccard_histogram_sql(buckets: int = 20) -> str:
    """Oracle for t_jaccard_histogram: exact-Jaccard bucket counts over
    the LSH candidate pairs ((buckets*ni)//union; union=0 -> top)."""
    return (
        "WITH "
        + minhash_ctes("documents")
        + f""",
mh_szs AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
mh_inter AS (
  SELECT c.a, c.b, COUNT(*) AS ni
  FROM cand c JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
  GROUP BY c.a, c.b
),
bk AS (
  SELECT CASE WHEN (COALESCE(za.n,0) + COALESCE(zb.n,0) - COALESCE(i.ni,0)) = 0
    THEN {buckets}
    ELSE ({buckets} * COALESCE(i.ni,0))
         // (COALESCE(za.n,0) + COALESCE(zb.n,0) - COALESCE(i.ni,0)) END AS bucket
  FROM cand c
  LEFT JOIN mh_szs za ON za.doc_id = c.a
  LEFT JOIN mh_szs zb ON zb.doc_id = c.b
  LEFT JOIN mh_inter i ON i.a = c.a AND i.b = c.b
)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM bk GROUP BY bucket ORDER BY bucket"""
    )
