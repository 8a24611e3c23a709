"""Closing-session relational / window / text-analytics operators:
regex field extraction (the scrape-side pattern puller), a
syllable-proxy readability score (corpus quality signal), and an
integer-exact dyadic EWMA window (the smoothing pass metrics
pipelines run before alerting). Each is a `queries()` entry with a
bit-exact DuckDB oracle over the same parquet.

Both engines speak RE2 (Arrow's pc.*_regex kernels and DuckDB's
regexp_* functions), so regex semantics — leftmost-first match,
non-overlapping counts — agree by construction.

No reference file:line citations are possible — /root/reference is
empty (SURVEY.md §0); the spec base is BASELINE.json + public
algorithm descriptions."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..sources.testdata import read_table
from .relational import _hash_partitioned, _npart

# ------------------------------------------------------- m19 regex


def m19_regex_extract(sf: str, pattern: str = r"\bs[a-z]+"):
    """Per-document regex pull: the FIRST token matching ``pattern``
    (leftmost RE2 match; '' when absent — null-free for the hash
    compare) plus the count of non-overlapping matches. One streaming
    map_batches pass, both kernels vectorized Arrow (extract_regex /
    count_substring_regex) — no shuffle, no per-row Python."""
    ds = read_table(sf, "documents", ["doc_id", "text"])
    wrapped = f"(?P<m>{pattern})"

    def ext(t: pa.Table) -> pa.Table:
        hit = pc.extract_regex(t["text"], pattern=wrapped)
        first = pc.fill_null(pc.struct_field(hit, "m"), "")
        n = pc.count_substring_regex(t["text"], pattern=pattern)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "first_m": first,
                "n_m": n.cast(pa.int64()),
            }
        )

    return ds.map_batches(ext, batch_format="pyarrow").sort("doc_id")


def m19_regex_extract_sql(pattern: str = r"\bs[a-z]+") -> str:
    # DuckDB regexp_extract returns '' on no-match; regexp_extract_all
    # counts the same non-overlapping matches RE2 yields in Arrow.
    return (
        f"SELECT doc_id, regexp_extract(text, '{pattern}') AS first_m, "
        f"CAST(len(regexp_extract_all(text, '{pattern}')) AS BIGINT) AS n_m "
        "FROM documents ORDER BY doc_id"
    )


# ------------------------------------------------- t_readability


def t_readability(sf: str):
    """Syllable-proxy readability (corpus quality signal): per doc,
    n_words (non-space runs), n_syll (vowel GROUPS — the classic
    syllable estimate), and an integer Flesch-style density
    score_x100 = n_syll * 10000 // n_words (-1 for empty docs so the
    compare stays null-free). Streaming, fully vectorized, no
    shuffle; at 100 TB this is a pure map stage."""
    ds = read_table(sf, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        words = pc.count_substring_regex(t["text"], pattern=r"\S+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        syll = pc.count_substring_regex(
            pc.utf8_lower(t["text"]), pattern=r"[aeiou]+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        sc = np.where(words > 0, (syll * 10000) // np.maximum(words, 1), -1)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "n_words": pa.array(words),
                "n_syll": pa.array(syll),
                "score_x100": pa.array(sc),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


def t_readability_sql() -> str:
    return (
        "WITH s AS (SELECT doc_id, "
        r"CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words, "
        "CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS n_syll "
        "FROM documents) "
        "SELECT doc_id, n_words, n_syll, "
        "CASE WHEN n_words > 0 THEN (n_syll * 10000) // n_words "
        "ELSE CAST(-1 AS BIGINT) END AS score_x100 FROM s ORDER BY doc_id"
    )


# ------------------------------------------------------ w18 ewm8


def w18_ewm8(sf: str, depth: int = 8):
    """Integer-EXACT dyadic EWMA over the trailing ``depth`` events
    per user (ordered by ts, event_id): weights 2^(depth-1) .. 1 on
    the current back to the (depth-1)-lagged centi-unit value, with
    the weighted sum AND the weight total emitted as integers
    (num/den — no float division, so the oracle compare is bit-exact;
    den < 2^depth encodes how much history the row actually had).
    One hash shuffle co-partitions by user_id (the w7/w13 shape);
    within a partition one lexsort + ``depth`` vectorized shifted
    adds — never per key, never per row."""
    ds = read_table(sf, "events", ["user_id", "ts", "event_id", "value"])

    def ewm_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "ewm_num": pa.array([], pa.int64()),
                    "ewm_den": pa.array([], pa.int64()),
                }
            )
        us = t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        order = np.lexsort(
            (
                t["event_id"].to_numpy(zero_copy_only=False),
                us,
                t["user_id"].to_numpy(zero_copy_only=False),
            )
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        c = np.rint(
            t["value"].to_numpy(zero_copy_only=False)[order].astype(np.float64) * 100
        ).astype(np.int64)
        n = len(uid)
        idx = np.arange(n, dtype=np.int64)
        starts = np.r_[True, uid[1:] != uid[:-1]]
        seg_start = np.maximum.accumulate(np.where(starts, idx, 0))
        pos = idx - seg_start
        num = np.zeros(n, np.int64)
        den = np.zeros(n, np.int64)
        for j in range(depth):
            w = np.int64(1 << (depth - 1 - j))
            have = pos >= j
            num[have] += w * c[idx[have] - j]
            den[have] += w
        return pa.table(
            {
                "user_id": pa.array(uid),
                "event_id": pa.array(eid),
                "ewm_num": pa.array(num),
                "ewm_den": pa.array(den),
            }
        )

    return (
        _hash_partitioned(ds, "user_id", _npart())
        .map_groups(ewm_part, batch_format="pyarrow")
        .sort(["user_id", "event_id"])
    )


def g31_gini(sf: str):
    """Grouped GINI coefficient (the inequality measure curation
    dashboards run over spend/engagement per segment), emitted as an
    exact integer num/den pair: with c = centi-units sorted ascending
    within the group, gini = (2*Σ i*c_i - (n+1)*Σc) / (n*Σc). Σ i*c_i
    is invariant under permuting tied values (the multiset of ranks a
    tie block receives is fixed), so no tiebreak is needed and both
    engines agree bit-for-bit. Scale shape: the g27 count-table
    combiner — per-batch grouped value counts shuffle only
    (group x distinct-centi-value x blocks) rows, then a closed-form
    fold over each group's sorted counts (a value with count k after
    cumulative count p contributes c*(k*p + k*(k+1)/2)); no
    row-cardinality shuffle, no giant per-group sort."""
    ds = read_table(sf, "events", ["event_type", "value"])

    def counts(t: pa.Table) -> pa.Table:
        c = np.rint(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100
        ).astype(np.int64)
        return (
            pa.table({"event_type": t["event_type"], "c": pa.array(c)})
            .group_by(["event_type", "c"])
            .aggregate([("c", "count")])
            .rename_columns(["event_type", "c", "cnt"])
        )

    parts = ds.map_batches(counts, batch_format="pyarrow").to_pandas()
    merged = parts.groupby(["event_type", "c"], as_index=False)["cnt"].sum()
    out = {"event_type": [], "n": [], "sum_c": [], "gini_num": [], "gini_den": []}
    for et, g in merged.groupby("event_type", sort=True):
        g = g.sort_values("c")
        v = g["c"].to_numpy().astype(object)  # python ints: no overflow
        k = g["cnt"].to_numpy().astype(object)
        p = np.concatenate(([0], np.cumsum(k)[:-1]))
        n = int(np.sum(k))
        s = int(np.sum(v * k))
        w = int(np.sum(v * (k * p + k * (k + 1) // 2)))
        out["event_type"].append(et)
        out["n"].append(n)
        out["sum_c"].append(s)
        out["gini_num"].append(2 * w - (n + 1) * s)
        out["gini_den"].append(n * s)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "sum_c": pa.array(out["sum_c"], pa.int64()),
            "gini_num": pa.array(out["gini_num"], pa.int64()),
            "gini_den": pa.array(out["gini_den"], pa.int64()),
        }
    )


def g31_gini_sql() -> str:
    # HUGEINT on the rank product so the oracle never overflows before
    # the final BIGINT cast (engine side uses python ints).
    return (
        "WITH r AS (SELECT event_type, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
        "o AS (SELECT event_type, c, "
        "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS i FROM r) "
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(c) AS BIGINT) AS sum_c, "
        "CAST(2 * SUM(CAST(i AS HUGEINT) * c) - "
        "(COUNT(*) + 1) * SUM(CAST(c AS HUGEINT)) AS BIGINT) AS gini_num, "
        "CAST(COUNT(*) * SUM(CAST(c AS HUGEINT)) AS BIGINT) AS gini_den "
        "FROM o GROUP BY event_type ORDER BY event_type"
    )


# ---------------------------------------------------- d11 edit pairs


_D11_VOCAB_BOUND = 200_000


def d11_edit_pairs(sf: str, max_dist: int = 2):
    """Blocked LEVENSHTEIN near-duplicate pairs over the part-name
    vocabulary (the catalog-cleanup / entity-resolution primitive):
    all unordered distinct-name pairs within edit distance
    ``max_dist``, with the exact distance. Scale shape: the quadratic
    step runs on the DISTINCT vocabulary, not the corpus — distinct is
    a distributed co-partitioned reduction, then ONE worker task (not
    the driver) does length-blocked candidate generation (|len(a) -
    len(b)| <= max_dist is necessary) + banded DP verification, loud
    ValueError above _D11_VOCAB_BOUND names. The vocab<<corpus
    assumption is the same one the decontamination broadcast
    documents; above the bound the fix is length-bucket map_groups
    with a replicate-to-neighbor-bucket scheme."""
    from .relational import _distinct

    ds = _distinct(read_table(sf, "part", ["p_name"]), "p_name")

    def pairs(t: pa.Table) -> pa.Table:
        names = sorted(t["p_name"].to_pylist())
        if len(names) > _D11_VOCAB_BOUND:
            raise ValueError(
                f"d11: {len(names)} distinct names exceeds the "
                f"{_D11_VOCAB_BOUND} single-task bound; use length-bucket "
                "map_groups"
            )
        lens = np.array([len(s) for s in names], np.int64)
        a_out, b_out, d_out = [], [], []
        # candidates sorted by name; only forward neighbors within the
        # length band (necessary condition for dist <= max_dist)
        for i, na in enumerate(names):
            for j in range(i + 1, len(names)):
                if abs(int(lens[j]) - int(lens[i])) > max_dist:
                    continue
                d = _banded_levenshtein(na, names[j], max_dist)
                if d is not None:
                    a_out.append(na)
                    b_out.append(names[j])
                    d_out.append(d)
        return pa.table(
            {
                "a": pa.array(a_out, pa.string()),
                "b": pa.array(b_out, pa.string()),
                "dist": pa.array(d_out, pa.int64()),
            }
        )

    return (
        ds.repartition(1)
        .map_batches(pairs, batch_format="pyarrow", batch_size=None)
        .sort(["a", "b"])
    )


def _banded_levenshtein(a: str, b: str, k: int) -> int | None:
    """Unit-cost edit distance if <= k, else None. Classic band-limited
    Wagner-Fischer: only the 2k+1 diagonal band is evaluated, with an
    early exit when the band's minimum exceeds k. Runs on the
    vocab-candidate-sized verify step, not a per-row hot path."""
    if len(a) > len(b):
        a, b = b, a
    la, lb = len(a), len(b)
    if lb - la > k:
        return None
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        lo = max(1, j - k)
        hi = min(la, j + k)
        cur = [j] + [k + 1] * la
        if lo > 1:
            cur[lo - 1] = k + 1
        bj = b[j - 1]
        best = cur[0] if lo == 1 else k + 1
        for i in range(lo, hi + 1):
            c = min(
                prev[i] + 1,
                cur[i - 1] + 1,
                prev[i - 1] + (0 if a[i - 1] == bj else 1),
            )
            cur[i] = c
            if c < best:
                best = c
        if best > k:
            return None
        prev = cur
    return prev[la] if prev[la] <= k else None


def d11_edit_pairs_sql(max_dist: int = 2) -> str:
    return (
        "WITH n AS (SELECT DISTINCT p_name FROM part) "
        "SELECT a.p_name AS a, b.p_name AS b, "
        "CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist "
        "FROM n a JOIN n b ON a.p_name < b.p_name "
        f"WHERE abs(length(a.p_name) - length(b.p_name)) <= {max_dist} "
        f"AND levenshtein(a.p_name, b.p_name) <= {max_dist} "
        "ORDER BY a, b"
    )


def w18_ewm8_sql(depth: int = 8) -> str:
    num_terms = [f"{1 << (depth - 1)} * c"]
    den_terms = [str(1 << (depth - 1))]
    for j in range(1, depth):
        w = 1 << (depth - 1 - j)
        num_terms.append(f"COALESCE({w} * LAG(c, {j}) OVER w, 0)")
        den_terms.append(
            f"CASE WHEN LAG(c, {j}) OVER w IS NULL THEN 0 ELSE {w} END"
        )
    return (
        "WITH e AS (SELECT user_id, ts, event_id, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events) "
        f"SELECT user_id, event_id, {' + '.join(num_terms)} AS ewm_num, "
        f"{' + '.join(den_terms)} AS ewm_den FROM e "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
        "ORDER BY user_id, event_id"
    )


# ------------------------------------------------ w20 MAD outliers


def w20_mad_outliers(sf: str):
    """Robust per-group outlier flags via MEDIAN ABSOLUTE DEVIATION
    (the robust sibling of g30's 2-sigma z-score): a row is an outlier
    when |c - median| > 3 * MAD, evaluated entirely in integers —
    dev2 = |2c - med2| (twice the deviation, med2 = sum of the two
    middle order statistics) and the flag boundary 2*dev2 > 3*mad2
    (mad2 = two-middles sum of the dev2 distribution = 4*MAD), so the
    boundary bit matches the oracle exactly with no float sigma.
    Scale shape: ONE count-table combiner pass (the g27/g31 shape)
    yields BOTH medians — the deviation distribution is derived from
    the value count table itself, not a second data pass — then a
    group-cardinality-sized {group: (med2, mad2)} dict broadcasts via
    ray.put into one streaming flag pass. Two streaming passes total,
    shuffle bounded by group x distinct-centi-value."""
    import ray

    ds = read_table(sf, "events", ["event_id", "event_type", "value"])

    def counts(t: pa.Table) -> pa.Table:
        c = np.rint(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100
        ).astype(np.int64)
        return (
            pa.table({"event_type": t["event_type"], "c": pa.array(c)})
            .group_by(["event_type", "c"])
            .aggregate([("c", "count")])
            .rename_columns(["event_type", "c", "cnt"])
        )

    parts = ds.map_batches(counts, batch_format="pyarrow").to_pandas()
    merged = parts.groupby(["event_type", "c"], as_index=False)["cnt"].sum()

    def _two_middles(v: np.ndarray, k: np.ndarray) -> int:
        cum = np.cumsum(k)
        n = int(cum[-1])
        k1, k2 = (n + 1) // 2, (n + 2) // 2
        return int(v[np.searchsorted(cum, k1)]) + int(v[np.searchsorted(cum, k2)])

    stats: dict[str, tuple[int, int]] = {}
    for et, g in merged.groupby("event_type", sort=True):
        g = g.sort_values("c")
        v = g["c"].to_numpy().astype(np.int64)
        k = g["cnt"].to_numpy().astype(np.int64)
        med2 = _two_middles(v, k)
        dv = np.abs(2 * v - med2)
        order = np.argsort(dv, kind="stable")
        mad2 = _two_middles(dv[order], k[order])
        stats[str(et)] = (med2, mad2)

    ref = ray.put(stats)

    def flag(t: pa.Table) -> pa.Table:
        st = ray.get(ref)
        et = t["event_type"].to_pylist()
        med2 = np.array([st[e][0] for e in et], np.int64)
        mad2 = np.array([st[e][1] for e in et], np.int64)
        c = np.rint(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100
        ).astype(np.int64)
        dev2 = np.abs(2 * c - med2)
        return pa.table(
            {
                "event_id": t["event_id"].cast(pa.int64()),
                "event_type": t["event_type"],
                "dev2": pa.array(dev2),
                "is_outlier": pa.array((2 * dev2 > 3 * mad2).astype(np.int64)),
            }
        )

    return ds.map_batches(flag, batch_format="pyarrow").sort("event_id")


def w20_mad_outliers_sql() -> str:
    two_mid = (
        "SUM(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2) THEN {v} ELSE 0 END) "
        "* (CASE WHEN MAX(n) % 2 = 1 THEN 2 ELSE 1 END)"
    )
    return (
        "WITH r AS (SELECT event_id, event_type, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
        "o AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) "
        "AS rn, COUNT(*) OVER (PARTITION BY event_type) AS n FROM r), "
        f"m AS (SELECT event_type, CAST({two_mid.format(v='c')} AS BIGINT) "
        "AS med2 FROM o GROUP BY event_type), "
        "d AS (SELECT r.event_id, r.event_type, ABS(2 * r.c - m.med2) AS dev2 "
        "FROM r JOIN m USING (event_type)), "
        "od AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type "
        "ORDER BY dev2) AS rn, COUNT(*) OVER (PARTITION BY event_type) AS n "
        "FROM d), "
        f"md AS (SELECT event_type, CAST({two_mid.format(v='dev2')} AS BIGINT) "
        "AS mad2 FROM od GROUP BY event_type) "
        "SELECT d.event_id, d.event_type, CAST(d.dev2 AS BIGINT) AS dev2, "
        "CAST(CASE WHEN 2 * d.dev2 > 3 * md.mad2 THEN 1 ELSE 0 END AS BIGINT) "
        "AS is_outlier FROM d JOIN md USING (event_type) ORDER BY d.event_id"
    )


# ----------------------------------------------- w21 path mining


def w21_path_mining(sf: str, gap_minutes: int = 30, k: int = 20):
    """Top-k SESSION PATHS (the funnel-path product-analytics op):
    sessionize per user with a ``gap_minutes`` inactivity gap (the w11
    contract), stringify each session's event_type sequence ordered by
    (ts, event_id) as 'a>b>c', count sessions per path, return the k
    most common (count DESC, path ASC). Scale shape: user
    co-partition -> per-partition vectorized sessionize + per-path
    LOCAL count combiner (shuffle carries distinct-path x partition
    partials, never per-session rows), path co-partition sum, then an
    exact top-k merge (each path lives in one partition after the
    second shuffle, so per-partition top-k + one k*partitions-row
    finalize is exact — the o5 pattern, no global sort)."""
    import ray

    gap_us = np.int64(gap_minutes * 60 * 1_000_000)
    ds = read_table(sf, "events", ["user_id", "ts", "event_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"].cast(pa.int64()),
                "us": pa.array(
                    t["ts"].cast(pa.timestamp("us")).to_numpy()
                    .astype("datetime64[us]").view(np.int64)
                ),
                "event_id": t["event_id"].cast(pa.int64()),
                "event_type": t["event_type"],
            }
        )

    def paths_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"path": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        order = np.lexsort((eid, us, uid))
        uid, us, et = uid[order], us[order], et[order]
        brk = np.r_[True, (uid[1:] != uid[:-1]) | ((us[1:] - us[:-1]) > gap_us)]
        sid = np.cumsum(brk) - 1
        import pandas as pd

        # per-session join then LOCAL count — the combiner: output is
        # distinct-path-sized, not session-sized
        paths = pd.Series(et).groupby(sid).agg(">".join)
        cnt = paths.value_counts()
        return pa.table(
            {
                "path": pa.array(cnt.index.to_numpy(dtype=object), pa.string()),
                "cnt": pa.array(cnt.to_numpy().astype(np.int64)),
            }
        )

    def sum_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        g = (
            t.group_by("path")
            .aggregate([("cnt", "sum")])
            .rename_columns(["path", "cnt"])
        )
        g = g.take(
            pc.sort_indices(
                g, sort_keys=[("cnt", "descending"), ("path", "ascending")]
            )[:k]
        )
        return g

    parts = (
        _hash_partitioned(ds.map_batches(prep, batch_format="pyarrow"), "user_id", _npart())
        .map_groups(paths_part, batch_format="pyarrow")
    )
    # second co-partition on path (string key -> the general
    # key_hash_u64 partitioner) so each path's partials meet once
    from .relational import _hash_partitioned_any

    combined = _hash_partitioned_any(parts, ["path"], _npart()).map_groups(
        sum_topk, batch_format="pyarrow"
    )

    @ray.remote
    def finalize(*blocks: pa.Table) -> pa.Table:
        t = pa.concat_tables([b for b in blocks if b.num_rows]).combine_chunks()
        t = t.take(
            pc.sort_indices(
                t, sort_keys=[("cnt", "descending"), ("path", "ascending")]
            )[:k]
        )
        return pa.table(
            {"path": t["path"], "n_sessions": t["cnt"].cast(pa.int64())}
        )

    blocks = combined.to_arrow_refs()
    return ray.get(finalize.remote(*blocks))


def w21_path_mining_sql(gap_minutes: int = 30, k: int = 20) -> str:
    g = gap_minutes * 60 * 1_000_000
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type "
        "FROM events), "
        "m AS (SELECT *, CASE WHEN us - LAG(us) OVER w > "
        f"{g} OR LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS brk FROM e "
        "WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), "
        "s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id "
        "ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m), "
        "p AS (SELECT user_id, sid, "
        "string_agg(event_type, '>' ORDER BY us, event_id) AS path "
        "FROM s GROUP BY user_id, sid) "
        "SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM p "
        f"GROUP BY path ORDER BY n_sessions DESC, path LIMIT {k}"
    )


# --------------------------------------------- w22 SCD intervals


def w22_scd_intervals(sf: str):
    """Interval compression / SCD-style state history (the warehouse
    ETL primitive): per user, collapse CONSECUTIVE runs of the same
    event_type (ordered by ts, event_id) into one validity row
    (user_id, event_type, from_us, to_us, n_events). One user_id hash
    co-partition (runs never span users, so partition-local run
    detection is exact); within a partition one lexsort + one shifted
    comparison finds run boundaries and np.add.reduceat-style
    positional folds emit the interval rows — never per run, never
    per row."""
    ds = read_table(sf, "events", ["user_id", "ts", "event_id", "event_type"])

    def runs_part(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "from_us": pa.array([], pa.int64()),
                "to_us": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = (
            t["ts"].cast(pa.timestamp("us")).to_numpy()
            .astype("datetime64[us]").view(np.int64)
        )
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        order = np.lexsort((eid, us, uid))
        uid, us, et = uid[order], us[order], et[order]
        brk = np.r_[True, (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(uid)] - 1
        return pa.table(
            {
                "user_id": pa.array(uid[starts]),
                "event_type": pa.array(et[starts].tolist(), pa.string()),
                "from_us": pa.array(us[starts]),
                "to_us": pa.array(us[ends]),
                "n_events": pa.array((ends - starts + 1).astype(np.int64)),
            }
        )

    return (
        _hash_partitioned(ds, "user_id", _npart())
        .map_groups(runs_part, batch_format="pyarrow")
        .sort(["user_id", "from_us", "event_type"])
    )


def w22_scd_intervals_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type "
        "FROM events), "
        "m AS (SELECT *, CASE WHEN event_type IS DISTINCT FROM "
        "LAG(event_type) OVER w THEN 1 ELSE 0 END AS brk FROM e "
        "WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), "
        "s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id "
        "ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS rid FROM m) "
        "SELECT user_id, event_type, MIN(us) AS from_us, MAX(us) AS to_us, "
        "CAST(COUNT(*) AS BIGINT) AS n_events FROM s "
        "GROUP BY user_id, rid, event_type "
        "ORDER BY user_id, from_us, event_type"
    )


# ------------------------------------------- s14 hive partitioning


def s14_hive_roundtrip(sf: str, pick: str = "purchase"):
    """S14 — hive-partitioned sink + partition-PRUNED source (the data-
    lake layout every downstream reader expects): events write as
    parquet partitioned by event_type (write_parquet partition_cols —
    one directory per key, the resumable layout), then ONE partition
    reads back via ray.data.read_parquet on the partition directory —
    the read never touches the other partitions' files (pruning by
    layout, stronger than predicate pushdown which still opens
    footers). Result must hash-equal a WHERE-filtered SELECT over the
    original parquet. Values compare as centi-integers (float parquet
    roundtrip is bit-exact, but the integer contract keeps the compare
    rounding-free)."""
    import shutil

    import ray

    from .relational import _roundtrip_dir

    ds = read_table(sf, "events", ["event_id", "event_type", "value"])
    out = _roundtrip_dir("hive", sf)
    shutil.rmtree(out, ignore_errors=True)

    def prep(t: pa.Table) -> pa.Table:
        c = np.rint(
            t["value"].to_numpy(zero_copy_only=False).astype(np.float64) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"].cast(pa.int64()),
                "event_type": t["event_type"],
                "value_c": pa.array(c),
            }
        )

    ds.map_batches(prep, batch_format="pyarrow").write_parquet(
        out, partition_cols=["event_type"]
    )
    back = ray.data.read_parquet(f"{out}/event_type={pick}")

    def restore(t: pa.Table) -> pa.Table:
        # the partition key is encoded in the directory, not the files
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": pa.array([pick] * t.num_rows, pa.string()),
                "value_c": t["value_c"],
            }
        )

    return back.map_batches(restore, batch_format="pyarrow").sort("event_id")


def s14_hive_roundtrip_sql(pick: str = "purchase") -> str:
    return (
        "SELECT event_id, event_type, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS value_c FROM events "
        f"WHERE event_type = '{pick}' ORDER BY event_id"
    )


# ------------------------------------------------- j12 bloom semi-join

_BLOOM_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _bloom_mix(x: np.ndarray) -> np.ndarray:
    from ..functions.hll import _mix64

    return _mix64(x)


def _bloom_positions(keys: np.ndarray, m_bits: int, k_hashes: int):
    """(k_hashes, n) bit positions via double hashing — the standard
    Kirsch-Mitzenmacher construction: pos_j = h1 + j*h2 (mod m)."""
    x = keys.astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        h1 = _bloom_mix(x)
        h2 = _bloom_mix(x ^ _BLOOM_GOLD) | np.uint64(1)
        return np.stack(
            [(h1 + np.uint64(j) * h2) % np.uint64(m_bits) for j in range(k_hashes)]
        )


def bloom_build_words(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """Set-bit word array (uint64, m_bits/64 words) for a key batch."""
    words = np.zeros(m_bits // 64, np.uint64)
    if len(keys):
        pos = _bloom_positions(keys, m_bits, k_hashes).ravel()
        np.bitwise_or.at(
            words, (pos >> np.uint64(6)).astype(np.int64), np.uint64(1) << (pos & np.uint64(63))
        )
    return words


def bloom_probe_mask(keys: np.ndarray, words: np.ndarray, k_hashes: int) -> np.ndarray:
    """True where ALL k bits are set (candidate — zero false
    negatives by construction)."""
    m_bits = len(words) * 64
    pos = _bloom_positions(keys, m_bits, k_hashes)
    hit = np.ones(len(keys), bool)
    for j in range(k_hashes):
        p = pos[j]
        hit &= (words[(p >> np.uint64(6)).astype(np.int64)] >> (p & np.uint64(63))) & np.uint64(1) != 0
    return hit


def j12_bloom_semi(sf: str, m_bits: int = 1 << 20, k_hashes: int = 4):
    """Bloom-pre-filtered fact-fact SEMI join — the shuffle-volume
    reducer for the case adaptive_semi_filter's broadcast path can't
    take (build side above the key-broadcast bound) but where a
    few-MB bit array still fits in every worker: build a Bloom filter
    over the build keys IN A WORKER (driver never sees keys), ray.put
    the word array once, stream the probe side through the k-bit test
    (drops ~all non-matching rows before any shuffle), then run the
    EXACT co-partitioned semi join on the surviving candidates so
    false positives never reach the output. At 100 TB: m_bits is
    sized from a streamed count of build-side distinct keys
    (n*10 bits gives ~1% fpp at k=4); the shuffle then moves
    selectivity+fpp of the fact table instead of all of it.

    Query shape: lineitem rows whose order is 1-URGENT, aggregated per
    returnflag — exact result, verified against the plain semi-join
    oracle."""
    from .relational import adaptive_semi_filter, grouped_agg

    urgent = read_table(sf, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(
            ["o_orderkey"]
        ),
        batch_format="pyarrow",
    )

    @ray.remote
    def build_words(*tables: pa.Table) -> np.ndarray:
        w = np.zeros(m_bits // 64, np.uint64)
        for t in tables:
            w |= bloom_build_words(
                t["o_orderkey"].to_numpy(zero_copy_only=False), m_bits, k_hashes
            )
        return w

    refs = [
        ray.put(b)
        for b in urgent.iter_batches(batch_format="pyarrow", batch_size=262144)
        if b.num_rows
    ]
    wref = build_words.remote(*refs) if refs else None

    li = read_table(sf, "lineitem", ["l_orderkey", "l_returnflag", "l_quantity"])

    def prefilter(t: pa.Table) -> pa.Table:
        if wref is None:
            return t.slice(0, 0)
        w = ray.get(wref)
        mask = bloom_probe_mask(
            t["l_orderkey"].to_numpy(zero_copy_only=False), w, k_hashes
        )
        return t.filter(pa.array(mask))

    cand = li.map_batches(prefilter, batch_format="pyarrow")
    # exact pass: broadcast_max=0 forces the co-partitioned shuffle
    # path — the scenario the bloom pre-filter exists for
    exact = adaptive_semi_filter(
        cand, urgent, "l_orderkey", "o_orderkey", anti=False, broadcast_max=0
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "qty_ci": pc.cast(pc.round(pc.multiply(t["l_quantity"], 100.0), 0), pa.int64()),
            }
        )

    return grouped_agg(
        exact.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag"],
        [("qty_c", "sum", "qty_ci"), ("n_rows", "count", None)],
        round_to=None,
    ).sort("l_returnflag")


def j12_bloom_semi_sql() -> str:
    return (
        "SELECT l_returnflag, "
        "CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS qty_c, "
        "CAST(COUNT(*) AS BIGINT) AS n_rows "
        "FROM lineitem WHERE l_orderkey IN "
        "(SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT') "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )


# ------------------------------------------------ s15 schema evolution


def s15_schema_evolution(sf: str):
    """S15 — schema-EVOLUTION scan (continuation session): half the
    orders rows (even o_orderkey) write as "v1" files WITHOUT the
    o_orderstatus column (the historical shards), the other half as
    "v2" files with it; `sources.evolution.read_parquet_union` then
    reads the whole tree as ONE dataset under the union schema, with
    the missing column surfacing as typed nulls, coalesced to '' for
    the null-free hash compare. Proves the migration read end to end:
    footer-only schema unification, per-file null fill, pruned
    columns. Oracle reconstructs the same fill from the original
    table's key parity."""
    import shutil

    import ray.data as _rd

    from ..sources.evolution import read_parquet_union
    from .relational import _roundtrip_dir

    ds = read_table(sf, "orders", ["o_orderkey", "o_custkey", "o_orderstatus"])
    out = _roundtrip_dir("schevo", sf)
    shutil.rmtree(out, ignore_errors=True)

    def v1(t: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(t["o_orderkey"], 1), 0)
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    def v2(t: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(t["o_orderkey"], 1), 1)
        return t.filter(keep)

    ds.map_batches(v1, batch_format="pyarrow").write_parquet(f"{out}/v1")
    ds.map_batches(v2, batch_format="pyarrow").write_parquet(f"{out}/v2")

    back = read_parquet_union(out)

    def fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "o_custkey": t["o_custkey"].cast(pa.int64()),
                "status_filled": pc.fill_null(t["o_orderstatus"], ""),
            }
        )

    return back.map_batches(fill, batch_format="pyarrow").sort("o_orderkey")


def s15_schema_evolution_sql() -> str:
    return (
        "SELECT o_orderkey, o_custkey, "
        "CASE WHEN o_orderkey % 2 = 0 THEN '' ELSE o_orderstatus END AS status_filled "
        "FROM orders ORDER BY o_orderkey"
    )


# ------------------------------------------------ w19 windowed top-k


def w19_windowed_topk(sf: str, size_min: int = 60, k: int = 3):
    """Top-k per TUMBLING WINDOW (continuation session) — the
    trending-items streaming classic ("top users per hour"), filling
    the w19 slot between w12's windowed distinct and w20's robust
    outliers. Two-level shape: (1) one combiner-first grouped count
    over (window, user) — the only row-cardinality exchange, shrunk
    per block before it moves; (2) the o9 per-group top-k discipline
    ON THE COUNT TABLE (valid only after step 1 completes — a user's
    events span blocks, so a per-block top-k of raw counts would be
    wrong; the count table's (window, user) rows are whole): per-block
    partial top-k per window, one window co-partition of k x windows x
    blocks rows, per-partition finalize. Ties: count DESC, user ASC —
    deterministic on both engines. The full count table never
    range-sorts."""
    import ray

    from ..sources.testdata import read_table as _rt
    from .relational import _hash_partitioned_any, _npart, grouped_agg

    ds = _rt(sf, "events", ["user_id", "ts"])
    win_us = np.int64(size_min * 60 * 1_000_000)

    def pairs(t: pa.Table) -> pa.Table:
        us = (
            t["ts"].cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {"ws_us": pa.array((us // win_us) * win_us), "user_id": t["user_id"].cast(pa.int64())}
        )

    counts = grouped_agg(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["ws_us", "user_id"],
        [("n", "count", None)],
        round_to=None,
    )

    keys = [("ws_us", "ascending"), ("n", "descending"), ("user_id", "ascending")]

    def _head_per_window(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        g = t["ws_us"].to_numpy(zero_copy_only=False)
        starts = np.r_[True, g[1:] != g[:-1]]
        gidx = np.arange(len(g)) - np.maximum.accumulate(
            np.where(starts, np.arange(len(g)), 0)
        )
        return t.filter(pa.array(gidx < k))

    parts = counts.map_batches(_head_per_window, batch_format="pyarrow")

    def finalize(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        t = _head_per_window(t)
        g = t["ws_us"].to_numpy(zero_copy_only=False)
        starts = np.r_[True, g[1:] != g[:-1]]
        rnk = np.arange(len(g)) - np.maximum.accumulate(
            np.where(starts, np.arange(len(g)), 0)
        )
        return t.append_column("rnk", pa.array(rnk + 1, pa.int64()))

    out = (
        _hash_partitioned_any(parts, ["ws_us"], _npart())
        .map_groups(finalize, batch_format="pyarrow")
        .sort(["ws_us", "rnk"])
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "ws_us": t["ws_us"].cast(pa.int64()),
                "user_id": t["user_id"].cast(pa.int64()),
                "n": t["n"].cast(pa.int64()),
                "rnk": t["rnk"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def w19_windowed_topk_sql(size_min: int = 60, k: int = 3) -> str:
    win_us = size_min * 60 * 1_000_000
    return (
        "WITH p AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP)) "
        f"// {win_us}) * {win_us} AS ws_us, user_id FROM events), "
        "c AS (SELECT ws_us, user_id, COUNT(*) AS n FROM p GROUP BY ws_us, user_id), "
        "r AS (SELECT ws_us, user_id, n, ROW_NUMBER() OVER ("
        "PARTITION BY ws_us ORDER BY n DESC, user_id) AS rnk FROM c) "
        "SELECT CAST(ws_us AS BIGINT) AS ws_us, CAST(user_id AS BIGINT) AS user_id, "
        f"CAST(n AS BIGINT) AS n, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= {k} "
        "ORDER BY ws_us, rnk"
    )


# ------------------------------------------------------ w23 cusum


def w23_cusum(sf: str, drift_c: int = 6000, h_c: int = 50000):
    """Per-user CUSUM change detection (Page 1954), the classic
    sequential drift alarm a metrics pipeline runs per entity: with
    y_i = value_cents_i - ``drift_c`` in (ts, event_id) order, the
    one-sided CUSUM statistic is the clamped recursion
    s_i = max(0, s_{i-1} + y_i), and the alarm fires when
    s_i > ``h_c``. The recursion looks inherently sequential, but the
    reflected-walk identity s_i = p_i - min(0, min_{j<=i} p_j)
    (p = prefix sum of y) makes it TWO vectorized accumulates — so
    the stage is one user_id hash co-partition (the w7/w13/w18 shape)
    + one lexsort + cumsum/cummin per partition, never per key, never
    per row. Per-segment running min uses a DECREASING segment offset
    (span > p range, so each segment's first element undercuts all
    earlier segments and minimum.accumulate never leaks across),
    with a loud int64-overflow guard. Integer-exact end to end; the
    DuckDB oracle evaluates the same closed form with window SUM/MIN,
    and tests/test_relational2.py cross-checks the closed form
    against the naive clamped recursion."""
    ds = read_table(sf, "events", ["user_id", "ts", "event_id", "value"])

    def cusum_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "s_c": pa.array([], pa.int64()),
                    "flag": pa.array([], pa.int64()),
                }
            )
        us = t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        order = np.lexsort(
            (
                t["event_id"].to_numpy(zero_copy_only=False),
                us,
                t["user_id"].to_numpy(zero_copy_only=False),
            )
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        c = np.rint(
            t["value"].to_numpy(zero_copy_only=False)[order].astype(np.float64) * 100
        ).astype(np.int64)
        y = c - np.int64(drift_c)
        n = len(uid)
        starts = np.r_[True, uid[1:] != uid[:-1]]
        seg = np.cumsum(starts) - 1  # 0-based segment id per row
        tot = np.cumsum(y)
        start_pos = np.flatnonzero(starts)
        base = np.where(start_pos > 0, tot[start_pos - 1], np.int64(0))
        p = tot - base[seg]
        span = int(p.max()) - int(p.min()) + 1
        n_segs = int(seg[-1]) + 1
        if n_segs * span + max(abs(int(p.max())), abs(int(p.min()))) > (1 << 62):
            raise ValueError(
                f"w23: segment-offset trick would overflow int64 "
                f"({n_segs} segments x span {span}); split the partition"
            )
        shifted = p - seg * np.int64(span)
        runmin = np.minimum.accumulate(shifted) + seg * np.int64(span)
        s = p - np.minimum(np.int64(0), runmin)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "event_id": pa.array(eid),
                "s_c": pa.array(s),
                "flag": pa.array((s > np.int64(h_c)).astype(np.int64)),
            }
        )

    return (
        _hash_partitioned(ds, "user_id", _npart())
        .map_groups(cusum_part, batch_format="pyarrow")
        .sort(["user_id", "event_id"])
    )


def w23_cusum_sql(drift_c: int = 6000, h_c: int = 50000) -> str:
    return (
        "WITH e AS (SELECT user_id, ts, event_id, "
        f"CAST(ROUND(value * 100, 0) AS BIGINT) - {drift_c} AS y FROM events), "
        # CAST: DuckDB's window SUM on BIGINT yields HUGEINT, which
        # pandas materializes as float64 and the driver hash rejects
        "p AS (SELECT user_id, ts, event_id, CAST(SUM(y) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) "
        "AS BIGINT) AS p FROM e), "
        "s AS (SELECT user_id, event_id, p - LEAST(CAST(0 AS BIGINT), "
        "MIN(p) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING)) AS s_c FROM p) "
        "SELECT user_id, event_id, s_c, "
        f"CAST(CASE WHEN s_c > {h_c} THEN 1 ELSE 0 END AS BIGINT) AS flag "
        "FROM s ORDER BY user_id, event_id"
    )


# --------------------------------------------- d12 entity groups


def d12_entity_groups(sf: str, max_dist: int = 2):
    """ENTITY RESOLUTION over the part-name vocabulary: cluster names
    transitively connected by edit distance <= ``max_dist`` (the d11
    pair graph) and assign every distinct name its cluster
    representative = the lexicographically smallest member — the
    canonical catalog-cleanup "merge these variants" op. Scale shape:
    like d11, the quadratic candidate step AND the union-find both run
    on the DISTINCT vocabulary inside ONE worker task (loud
    _D11_VOCAB_BOUND; entity graphs are vocab-sized, the corpus never
    gathers), after a distributed distinct. The recursive min-root CTE
    is the DuckDB oracle (the x3_components SQL shape on string
    nodes)."""
    from .relational import _distinct

    ds = _distinct(read_table(sf, "part", ["p_name"]), "p_name")

    def groups(t: pa.Table) -> pa.Table:
        names = sorted(t["p_name"].to_pylist())
        if len(names) > _D11_VOCAB_BOUND:
            raise ValueError(
                f"d12: {len(names)} distinct names exceeds the "
                f"{_D11_VOCAB_BOUND} single-task bound; use length-bucket "
                "map_groups"
            )
        lens = np.array([len(s) for s in names], np.int64)
        idx = {s: i for i, s in enumerate(names)}
        parent = list(range(len(names)))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i, na in enumerate(names):
            for j in range(i + 1, len(names)):
                if abs(int(lens[j]) - int(lens[i])) > max_dist:
                    continue
                if _banded_levenshtein(na, names[j], max_dist) is not None:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        # names is sorted, so min root index = lexicographically
        # smallest member
        reps = [names[find(idx[s])] for s in names]
        return pa.table(
            {
                "p_name": pa.array(names, pa.string()),
                "rep": pa.array(reps, pa.string()),
            }
        )

    return (
        ds.repartition(1)
        .map_batches(groups, batch_format="pyarrow", batch_size=None)
        .sort("p_name")
    )


def d12_entity_groups_sql(max_dist: int = 2) -> str:
    return (
        "WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part), "
        "cand AS (SELECT a.p_name AS a, b.p_name AS b FROM n a JOIN n b "
        "ON a.p_name < b.p_name "
        f"WHERE abs(length(a.p_name) - length(b.p_name)) <= {max_dist} "
        f"AND levenshtein(a.p_name, b.p_name) <= {max_dist}), "
        "bi AS (SELECT a, b FROM cand UNION SELECT b AS a, a AS b FROM cand), "
        "reach(node, root) AS (SELECT p_name, p_name FROM n UNION "
        "SELECT bi.b, r.root FROM reach r JOIN bi ON bi.a = r.node "
        "WHERE r.root < bi.b) "
        "SELECT node AS p_name, MIN(root) AS rep FROM reach GROUP BY node "
        "ORDER BY p_name"
    )


# --------------------------------------------------- g32 quartiles


def g32_quartiles(sf: str):
    """EXACT grouped quartiles (PERCENTILE_DISC semantics: the
    ceil(p*n/4)-th smallest value, a single order statistic — no
    averaging, so the contract never leaves the integer domain) plus
    the IQR, the robust-spread diagnostic that pairs with w20's MAD:
    q1/med/q3 at ranks (p*n+3)//4 for p = 1,2,3 over e4-quantized
    event values per event_type. Scale shape: the g27/g31 count-table
    combiner — per-batch grouped value counts shuffle only
    (group x distinct-e4-value x blocks) rows, then a result-sized
    fold walks each group's sorted cumulative counts to all three
    ranks in one pass. The count table is value-domain-bounded, never
    row-bounded; above that domain g20's streaming histogram-quantile
    is the fallback."""
    from .relational import _e_units

    ds = read_table(sf, "events", ["event_type", "value"])

    def counts(t: pa.Table) -> pa.Table:
        v = _e_units(t["value"].to_numpy(zero_copy_only=False), 10000.0)
        return (
            pa.table({"event_type": t["event_type"], "v_e4": pa.array(v)})
            .group_by(["event_type", "v_e4"])
            .aggregate([("v_e4", "count")])
            .rename_columns(["event_type", "v_e4", "cnt"])
        )

    parts = ds.map_batches(counts, batch_format="pyarrow").to_pandas()
    merged = parts.groupby(["event_type", "v_e4"], as_index=False)["cnt"].sum()
    out = {"event_type": [], "n": [], "q1_e4": [], "med_e4": [], "q3_e4": [], "iqr_e4": []}
    for et, g in merged.groupby("event_type", sort=True):
        g = g.sort_values("v_e4")
        v = g["v_e4"].to_numpy()
        cum = np.cumsum(g["cnt"].to_numpy().astype(np.int64))
        n = int(cum[-1])
        q = [int(v[np.searchsorted(cum, (p * n + 3) // 4)]) for p in (1, 2, 3)]
        out["event_type"].append(et)
        out["n"].append(n)
        out["q1_e4"].append(q[0])
        out["med_e4"].append(q[1])
        out["q3_e4"].append(q[2])
        out["iqr_e4"].append(q[2] - q[0])
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "q1_e4": pa.array(out["q1_e4"], pa.int64()),
            "med_e4": pa.array(out["med_e4"], pa.int64()),
            "q3_e4": pa.array(out["q3_e4"], pa.int64()),
            "iqr_e4": pa.array(out["iqr_e4"], pa.int64()),
        }
    )


def g32_quartiles_sql() -> str:
    """The same ceil(p*n/4) order statistics via ROW_NUMBER (explicit
    rather than quantile_disc so the rank rule is pinned, not
    engine-defined)."""
    return (
        "WITH r AS (SELECT event_type, "
        "CAST(ROUND(value * 10000, 0) AS BIGINT) AS v FROM events), "
        "o AS (SELECT event_type, v, "
        "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn, "
        "COUNT(*) OVER (PARTITION BY event_type) AS n FROM r), "
        "q AS (SELECT event_type, MAX(n) AS n, "
        "MAX(CASE WHEN rn = (n + 3) // 4 THEN v END) AS q1_e4, "
        "MAX(CASE WHEN rn = (2 * n + 3) // 4 THEN v END) AS med_e4, "
        "MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS q3_e4 "
        "FROM o GROUP BY event_type) "
        "SELECT event_type, CAST(n AS BIGINT) AS n, q1_e4, med_e4, q3_e4, "
        "q3_e4 - q1_e4 AS iqr_e4 FROM q ORDER BY event_type"
    )


# ------------------------------------------- s16 gzip JSONL source


def s16_jsonl_gz_roundtrip(sf: str):
    """S16 — GZIP-COMPRESSED JSONL sink/source roundtrip, the
    Common-Crawl-style shard format (.jsonl.gz is how web-scale text
    corpora actually ship): documents write as one gzip JSONL shard
    per batch through a custom map_batches sink (Ray Data's write_json
    has no compression hook on this stack), read back via
    read_binary_files -> per-file gunzip + json parse, and must
    hash-equal a plain SELECT over the parquet original. Both
    directions stream — a shard is decompressed by the worker that
    reads it, never on the driver; compression is stdlib zlib
    (deterministic here, but the CONTRACT is content equality after
    decode, never byte equality of the .gz)."""
    import gzip
    import json as _json
    import os
    import shutil

    from .relational import _roundtrip_dir

    cols = ["doc_id", "text", "lang", "source"]
    ds = read_table(sf, "documents", cols)
    out = _roundtrip_dir("jsonlgz", sf)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        rows = [
            {c: t[c][i].as_py() for c in cols} for i in range(t.num_rows)
        ]
        payload = "\n".join(
            _json.dumps(r, ensure_ascii=False, sort_keys=True) for r in rows
        )
        # shard name from the content hash: deterministic, collision-free
        # across parallel writers, no driver-coordinated counter
        import hashlib

        name = hashlib.sha1(payload.encode()).hexdigest()[:16]
        with gzip.open(os.path.join(out, f"part-{name}.jsonl.gz"), "wt", encoding="utf-8") as f:
            f.write(payload)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    # materialize the write (count rows written)
    sum(
        b["n"].to_numpy().sum()
        for b in ds.map_batches(write_shard, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
    )

    back = ray.data.read_binary_files(out)

    def parse_shard(t: pa.Table) -> pa.Table:
        recs = []
        for blob in t["bytes"].to_pylist():
            # Ray's read_binary_files auto-gunzips by .gz extension on
            # this stack; gate on the gzip magic so the parser is
            # correct either way (and on readers without the hook)
            raw = gzip.decompress(blob) if blob[:2] == b"\x1f\x8b" else blob
            for line in raw.decode("utf-8").splitlines():
                if line:
                    recs.append(_json.loads(line))
        return pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in recs], pa.int64()),
                "text": pa.array([r["text"] for r in recs], pa.string()),
                "lang": pa.array([r["lang"] for r in recs], pa.string()),
                "source": pa.array([r["source"] for r in recs], pa.string()),
            }
        )

    return back.map_batches(parse_shard, batch_format="pyarrow").sort("doc_id")


def s16_jsonl_gz_roundtrip_sql() -> str:
    return (
        "SELECT doc_id, text, lang, source FROM documents ORDER BY doc_id"
    )


# ------------------------------------------------------ d13 upsert


def d13_upsert(sf: str):
    """LAKEHOUSE UPSERT / MERGE-INTO (SCD-1 last-writer-wins): apply a
    CDC delta stream onto a base table so each key's newest version
    wins — the maintenance op every incremental-ingest pipeline runs.
    Base = orders at version 0; deltas = a deterministic synthetic CDC
    batch (every o_orderkey % 7 == 0 re-arrives at version 1 with
    status 'U' and price + 1.00). Scale shape: the w15 witness-merge
    discipline — base and deltas UNION as one stream, a per-batch
    combiner keeps only each key's max-version row per block (so the
    shuffle carries keys x blocks rows, never the multiset), one key
    co-partition finishes the argmax with the same kernel. No driver
    state; version is distinct per key by construction, so the
    (key, version desc) argmax has no ties."""
    from .relational import _hash_partitioned

    base = read_table(sf, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"])

    def tag_base(t: pa.Table) -> pa.Table:
        price_c = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "status": t["o_orderstatus"],
                "price_c": pa.array(price_c),
                "version": pa.array(np.zeros(t.num_rows, np.int64)),
            }
        )

    def make_deltas(t: pa.Table) -> pa.Table:
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ok % 7 == 0
        price_c = (
            np.rint(t["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(
                np.int64
            )[keep]
            + 100
        )
        n = int(keep.sum())
        return pa.table(
            {
                "o_orderkey": pa.array(ok[keep]),
                "status": pa.array(["U"] * n, pa.string()),
                "price_c": pa.array(price_c),
                "version": pa.array(np.ones(n, np.int64)),
            }
        )

    stream = base.map_batches(tag_base, batch_format="pyarrow").union(
        base.map_batches(make_deltas, batch_format="pyarrow")
    )

    def keep_newest(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        ver = t["version"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-ver, ok))
        first = np.r_[True, ok[order][1:] != ok[order][:-1]]
        return t.take(pa.array(order[first]))

    # per-batch combiner first: the shuffle then carries at most one
    # row per (key, block) instead of the unioned multiset
    combined = stream.map_batches(keep_newest, batch_format="pyarrow")
    merged = (
        _hash_partitioned(combined, "o_orderkey", _npart())
        .map_groups(keep_newest, batch_format="pyarrow")
    )
    return merged.map_batches(
        lambda t: t.drop_columns(["__part"]) if "__part" in t.column_names else t,
        batch_format="pyarrow",
    ).sort("o_orderkey")


def d13_upsert_sql() -> str:
    return (
        "WITH base AS (SELECT o_orderkey, o_orderstatus AS status, "
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_c, "
        "CAST(0 AS BIGINT) AS version FROM orders), "
        "deltas AS (SELECT o_orderkey, 'U' AS status, "
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) + 100 AS price_c, "
        "CAST(1 AS BIGINT) AS version FROM orders WHERE o_orderkey % 7 = 0), "
        "u AS (SELECT * FROM base UNION ALL SELECT * FROM deltas), "
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey "
        "ORDER BY version DESC) AS rn FROM u) "
        "SELECT o_orderkey, status, price_c, version FROM r WHERE rn = 1 "
        "ORDER BY o_orderkey"
    )


# --------------------------------------------- m21 nfc normalize


def m21_nfc_normalize(sf: str):
    """UNICODE NFC NORMALIZATION audit (the canonicalization pass a
    multilingual corpus runs before dedup/hashing: NFD-decomposed
    accents make byte-identical texts hash apart). The synthetic
    corpus is ASCII, so each doc is first augmented with a
    deterministic DECOMPOSED suffix ' caf' + e + U+0301 (combining
    acute) — mirrored in the oracle — so every row exercises the
    compose path (the t_pii augmentation idiom). Emits per doc the
    pre/post codepoint lengths and a changed flag. Engine side uses
    stdlib unicodedata.normalize('NFC') — NOT pyarrow's
    utf8_normalize, which on this wheel silently passes decomposed
    sequences through unchanged (verified in-session: e+U+0301
    survived form='NFC'); DuckDB's nfc_normalize composes correctly,
    so the stdlib is the only engine-side kernel that actually
    matches the oracle. One zero-shuffle streaming pass."""
    import unicodedata

    ds = read_table(sf, "documents", ["doc_id", "text"])
    suffix = " caf" + chr(101) + chr(769)

    def norm(t: pa.Table) -> pa.Table:
        texts = [s + suffix for s in t["text"].to_pylist()]
        out = [unicodedata.normalize("NFC", s) for s in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "len_raw": pa.array([len(s) for s in texts], pa.int64()),
                "len_nfc": pa.array([len(s) for s in out], pa.int64()),
                "changed": pa.array(
                    [int(a != b) for a, b in zip(texts, out)], pa.int64()
                ),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow").sort("doc_id")


def m21_nfc_normalize_sql() -> str:
    return (
        "WITH a AS (SELECT doc_id, text || ' caf' || chr(101) || chr(769) "
        "AS t FROM documents) "
        "SELECT doc_id, CAST(length(t) AS BIGINT) AS len_raw, "
        "CAST(length(nfc_normalize(t)) AS BIGINT) AS len_nfc, "
        "CAST(CASE WHEN nfc_normalize(t) <> t THEN 1 ELSE 0 END AS BIGINT) "
        "AS changed FROM a ORDER BY doc_id"
    )


# ------------------------------------------------------- w24 churn


def w24_churn(sf: str, idle_hours: int = 30):
    """INACTIVITY / CHURN-CANDIDATE detection: users whose LAST event
    is more than ``idle_hours`` before the corpus watermark (global max
    ts; 30 h splits the synthetic corpus non-trivially — max user idle
    is ~2.4 days — so BOTH flag classes are populated and the compare
    is non-vacuous) — the retention-alert query every engagement pipeline runs.
    Scale shape: ONE combiner-first grouped max (per-batch grouped max
    -> user-sized merge, the w15 witness discipline via grouped_agg),
    the watermark is a user-table-sized max folded from the SAME
    grouped result (no second pass over events), and the flag filter
    streams. Emits every user with last_us and the idle flag (not just
    the churned — null-free, and the compare covers both classes)."""
    from .relational import grouped_agg

    ds = read_table(sf, "events", ["user_id", "ts"])

    def to_us(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        return pa.table(
            {"user_id": t["user_id"].cast(pa.int64()), "us": pa.array(us)}
        )

    last = grouped_agg(
        ds.map_batches(to_us, batch_format="pyarrow"),
        ["user_id"],
        [("last_us", "max", "us")],
        round_to=None,
    )
    t = pa.concat_tables(
        list(last.iter_batches(batch_format="pyarrow", batch_size=65536))
    ).combine_chunks()
    wm = int(pc.max(t["last_us"]).as_py())
    idle_us = np.int64(idle_hours) * 3_600_000_000
    lu = t["last_us"].to_numpy(zero_copy_only=False).astype(np.int64)
    out = pa.table(
        {
            "user_id": t["user_id"].cast(pa.int64()),
            "last_us": pa.array(lu),
            "churned": pa.array(((np.int64(wm) - lu) > idle_us).astype(np.int64)),
        }
    )
    return out.take(pc.sort_indices(out, sort_keys=[("user_id", "ascending")]))


def w24_churn_sql(idle_hours: int = 30) -> str:
    idle_us = idle_hours * 3_600_000_000
    return (
        "WITH l AS (SELECT user_id, MAX(epoch_us(CAST(ts AS TIMESTAMP))) "
        "AS last_us FROM events GROUP BY user_id), "
        "w AS (SELECT MAX(last_us) AS wm FROM l) "
        "SELECT l.user_id, CAST(l.last_us AS BIGINT) AS last_us, "
        f"CAST(CASE WHEN w.wm - l.last_us > {idle_us} THEN 1 ELSE 0 END "
        "AS BIGINT) AS churned FROM l, w ORDER BY l.user_id"
    )


# --------------------------------------------------- w25 autocorr


def w25_autocorr(sf: str):
    """Per-user LAG-1 AUTOCORRELATION sufficient statistics — the
    serial-dependence diagnostic a metrics pipeline runs before
    trusting i.i.d.-assuming tests (g12's grouped Pearson correlates
    two columns; this correlates a series with its own lag, which
    needs ORDER, not just grouping): for each user, over consecutive
    event pairs in (ts, event_id) order, the exact integer sums
    (n_pairs, sx, sy, sxy, sxx, syy) in cents — everything any
    downstream r computation needs, kept as integers so both engines
    agree bit-for-bit (the w18/w22 co-partition + lexsort + one
    shifted product shape; Pearson's division never happens in the
    engine). Users with < 2 events emit zeros (null-free)."""
    ds = read_table(sf, "events", ["user_id", "ts", "event_id", "value"])

    def ac_part(t: pa.Table) -> pa.Table:
        cols = ["user_id", "n_pairs", "sx", "sy", "sxy", "sxx", "syy"]
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        us = t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        order = np.lexsort(
            (
                t["event_id"].to_numpy(zero_copy_only=False),
                us,
                t["user_id"].to_numpy(zero_copy_only=False),
            )
        )
        uid = t["user_id"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        c = np.rint(
            t["value"].to_numpy(zero_copy_only=False)[order].astype(np.float64) * 100
        ).astype(np.int64)
        same = uid[1:] == uid[:-1]  # consecutive pair within one user
        x, y = c[:-1][same], c[1:][same]
        pu = uid[1:][same]
        users, inv = np.unique(uid, return_inverse=True)
        pinv = np.searchsorted(users, pu)
        def acc(v):
            return np.bincount(pinv, weights=v, minlength=len(users)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(users),
                "n_pairs": acc(np.ones(len(pu), np.int64)),
                "sx": acc(x),
                "sy": acc(y),
                "sxy": acc(x * y),
                "sxx": acc(x * x),
                "syy": acc(y * y),
            }
        )

    return (
        _hash_partitioned(ds, "user_id", _npart())
        .map_groups(ac_part, batch_format="pyarrow")
        .sort("user_id")
    )


def w25_autocorr_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, ts, event_id, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
        "p AS (SELECT user_id, LAG(c) OVER w AS x, c AS y FROM e "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT user_id, "
        "CAST(COUNT(x) AS BIGINT) AS n_pairs, "
        "CAST(COALESCE(SUM(x), 0) AS BIGINT) AS sx, "
        "CAST(COALESCE(SUM(CASE WHEN x IS NOT NULL THEN y END), 0) AS BIGINT) AS sy, "
        "CAST(COALESCE(SUM(x * y), 0) AS BIGINT) AS sxy, "
        "CAST(COALESCE(SUM(x * x), 0) AS BIGINT) AS sxx, "
        "CAST(COALESCE(SUM(CASE WHEN x IS NOT NULL THEN y * y END), 0) AS BIGINT) AS syy "
        "FROM p GROUP BY user_id ORDER BY user_id"
    )
