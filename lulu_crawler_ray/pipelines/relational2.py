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
