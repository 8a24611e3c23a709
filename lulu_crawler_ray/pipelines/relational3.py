"""Continuation-session relational operators (round 5): dual-snapshot
CDC diff, bucketed time-band self join, and grouped OHLC candles. Each
is a `queries()` entry with a bit-exact DuckDB oracle (__ray_entry__),
built on the combiner-first / co-partition machinery from relational.py.

No reference file:line citations are possible — /root/reference is
empty (SURVEY.md §0); the spec base is BASELINE.json plus standard
public semantics (CDC snapshot diff as in lakehouse change feeds; band
joins as in Khayyat et al., IEJoin, VLDB'15; OHLC candles as in every
time-series store)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.testdata import read_table, table_rows
from .relational import _hash_partitioned, _npart, grouped_agg

# --------------------------------------------- d14 snapshot diff (CDC)

_T1 = np.datetime64("2024-01-15T00:00:00", "us").astype(np.int64)
_T2 = np.datetime64("2024-01-25T00:00:00", "us").astype(np.int64)


def _snap_merge(t: pa.Table) -> pa.Table:
    """Reduce (user_id, snap, ts_us, event_id, value_c) partial rows to
    the lexicographic-max (ts_us, event_id) row per (user_id, snap) —
    the same kernel serves as the per-batch combiner and the final
    per-partition merge (associative + commutative argmax)."""
    if t.num_rows == 0:
        return t
    u = t["user_id"].to_numpy()
    s = t["snap"].to_numpy()
    ts = t["ts_us"].to_numpy()
    eid = t["event_id"].to_numpy()
    order = np.lexsort((eid, ts, s, u))
    us, ss = u[order], s[order]
    last = np.r_[(us[1:] != us[:-1]) | (ss[1:] != ss[:-1]), True]
    return t.take(pa.array(order[last]))


def d14_snapshot_diff(sf: str):
    """DUAL-SNAPSHOT CDC DIFF in ONE pass: per user, the latest event
    value as of T1 vs as of T2 (latest = max (ts, event_id) — total
    order, no float ties), classified added / same / changed. The
    change-data-capture primitive every incremental-materialization
    pipeline needs, computed WITHOUT scanning the input twice: each
    batch emits at most two rows per user present (one per snapshot
    cutoff, via the argmax combiner), so the shuffle carries
    users x blocks x 2 rows, never the event stream. One user-key
    co-partition finishes the argmax and pivots the two snapshots
    wide. old_c = -1 encodes "absent at T1" (added)."""

    ds = read_table(sf, "events", ["event_id", "ts", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        keep2 = ts < _T2
        u = t["user_id"].to_numpy()[keep2]
        ts2 = ts[keep2]
        eid = t["event_id"].to_numpy()[keep2]
        vc = np.rint(
            t["value"].to_numpy(zero_copy_only=False)[keep2] * 100
        ).astype(np.int64)
        keep1 = ts2 < _T1
        part = pa.table(
            {
                "user_id": pa.array(np.r_[u, u[keep1]]),
                "snap": pa.array(
                    np.r_[
                        np.full(len(u), 2, np.int64),
                        np.full(int(keep1.sum()), 1, np.int64),
                    ]
                ),
                "ts_us": pa.array(np.r_[ts2, ts2[keep1]]),
                "event_id": pa.array(np.r_[eid, eid[keep1]]),
                "value_c": pa.array(np.r_[vc, vc[keep1]]),
            }
        )
        return _snap_merge(part)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        t = _snap_merge(t.drop_columns(["__part"]))
        u = t["user_id"].to_numpy()
        s = t["snap"].to_numpy()
        vc = t["value_c"].to_numpy()
        # every snap-1 user also has a snap-2 row (T1 < T2), so pivot
        # on the snap-2 rows and look up snap-1 by user
        two = s == 2
        one = s == 1
        u2 = u[two]
        old = np.full(len(u2), -1, np.int64)
        if one.any():
            u1 = u[one]
            pos = np.searchsorted(np.sort(u2), u1)
            # u2 is unique per user; map via argsort of u2
            order2 = np.argsort(u2, kind="stable")
            old[order2[pos]] = vc[one]
        new = vc[two]
        status = np.where(
            old == -1, "added", np.where(old == new, "same", "changed")
        )
        return pa.table(
            {
                "user_id": pa.array(u2),
                "old_c": pa.array(old),
                "new_c": pa.array(new),
                "status": pa.array(status.astype(object), pa.string()),
            }
        )

    nparts = _npart(table_rows(sf, "events"))
    return (
        _hash_partitioned(partials, "user_id", nparts)
        .map_groups(finish, batch_format="pyarrow")
        .sort("user_id")
    )


def d14_snapshot_diff_sql() -> str:
    return (
        "WITH s2 AS (SELECT user_id, value FROM ("
        "SELECT user_id, value, ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY ts DESC, event_id DESC) AS rn FROM events "
        "WHERE ts < TIMESTAMP '2024-01-25') WHERE rn = 1), "
        "s1 AS (SELECT user_id, value FROM ("
        "SELECT user_id, value, ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY ts DESC, event_id DESC) AS rn FROM events "
        "WHERE ts < TIMESTAMP '2024-01-15') WHERE rn = 1) "
        "SELECT s2.user_id AS user_id, "
        "COALESCE(CAST(ROUND(s1.value * 100, 0) AS BIGINT), -1) AS old_c, "
        "CAST(ROUND(s2.value * 100, 0) AS BIGINT) AS new_c, "
        "CASE WHEN s1.user_id IS NULL THEN 'added' "
        "WHEN CAST(ROUND(s1.value * 100, 0) AS BIGINT) = "
        "CAST(ROUND(s2.value * 100, 0) AS BIGINT) THEN 'same' "
        "ELSE 'changed' END AS status "
        "FROM s2 LEFT JOIN s1 ON s1.user_id = s2.user_id ORDER BY user_id"
    )


# --------------------------------------------- j13 time-band self join

_EPS_US = 6 * 3600 * 1_000_000  # band half-width == bucket width
_BASE_BUCKET = np.datetime64("2020-01-01T00:00:00", "us").astype(np.int64) // _EPS_US


def j13_band_join(sf: str):
    """TIME-BAND SELF JOIN (|ts_a - ts_b| <= eps, NO equality on ts):
    per user, count (click, purchase) pairs within a +/-6 h band — the
    attribution-window primitive. Ray Data has no non-equi join; the
    distributed shape is SYMMETRIC INTERVAL BUCKETING: bucket width ==
    band width, left rows go to their own bucket, right rows replicate
    to buckets {b-1, b, b+1}, pairs co-locate in the LEFT row's
    (user, bucket) partition — each qualifying pair exists in exactly
    one partition (the left's home bucket), so no dedup pass is
    needed. Inside a partition the count is two np.searchsorted probes
    per left row over ONE packed (group, ts) int64 array: exact
    predicate, zero per-row Python, O((L+R) log R). Shuffle cost:
    1x left + 3x right of (user, bucket, ts) triples; the grouped
    output re-aggregates per-partition partial counts (user-bucket
    groups of one user can land in different partitions)."""

    ds = read_table(sf, "events", ["ts", "user_id", "event_type"])

    def explode(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        u = t["user_id"].to_numpy()
        et = t["event_type"].to_numpy(zero_copy_only=False)
        b = ts // _EPS_US - _BASE_BUCKET
        left = et == "click"
        right = et == "purchase"
        lu, lb, lt = u[left], b[left], ts[left]
        ru, rb, rt = u[right], b[right], ts[right]
        return pa.table(
            {
                "user_id": pa.array(np.r_[lu, ru, ru, ru]),
                "bucket": pa.array(np.r_[lb, rb - 1, rb, rb + 1]),
                "ts_us": pa.array(np.r_[lt, rt, rt, rt]),
                "side": pa.array(
                    np.r_[
                        np.zeros(len(lu), np.int8),
                        np.ones(3 * len(ru), np.int8),
                    ]
                ),
            }
        )

    rows = ds.map_batches(explode, batch_format="pyarrow")

    def count_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        u = t["user_id"].to_numpy().astype(np.int64)
        b = t["bucket"].to_numpy().astype(np.int64)
        ts = t["ts_us"].to_numpy().astype(np.int64)
        side = t["side"].to_numpy()
        if (u.max() >= (1 << 42)) or (b.min() < 0) or (b.max() >= (1 << 21)):
            # (user, bucket) packs into one int64 group key; outside
            # this domain the pack would collide — fail loudly
            raise ValueError("j13_band_join: user_id/bucket outside packable domain")
        ub = (u << np.int64(21)) | b
        _, g = np.unique(ub, return_inverse=True)
        trel = ts - ts.min()
        if trel.max() + _EPS_US >= (1 << 43):
            raise ValueError("j13_band_join: timestamp span outside packable domain")
        packed = (g.astype(np.int64) << np.int64(43)) | trel
        left = side == 0
        rp = np.sort(packed[~left])
        gl = g[left].astype(np.int64) << np.int64(43)
        tl = trel[left]
        hi = np.searchsorted(rp, gl | np.minimum(tl + _EPS_US, (1 << 43) - 1), side="right")
        lo = np.searchsorted(rp, gl | np.maximum(tl - _EPS_US, 0), side="left")
        cnt = (hi - lo).astype(np.int64)
        ul = u[left]
        order = np.argsort(ul, kind="stable")
        us = ul[order]
        first = np.r_[True, us[1:] != us[:-1]]
        sums = np.add.reduceat(cnt[order], np.flatnonzero(first))
        keep = sums > 0
        return pa.table(
            {"user_id": pa.array(us[first][keep]), "n": pa.array(sums[keep])}
        )

    nparts = _npart(4 * table_rows(sf, "events"))
    counted = (
        _hash_partitioned_2(rows, nparts)
        .map_groups(count_part, batch_format="pyarrow")
    )
    out = grouped_agg(counted, ["user_id"], [("n_pairs", "sum", "n")], round_to=None)
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "n_pairs": t["n_pairs"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("user_id")


def _hash_partitioned_2(ds, n_parts: int):
    """(user_id, bucket) composite hash partition — splitmix-style mix
    of the packed pair so adjacent buckets of one hot user spread."""

    def addpart(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.uint64)
        b = t["bucket"].to_numpy().astype(np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            x = (u * np.uint64(0x9E3779B97F4A7C15)) ^ (
                b * np.uint64(0xBF58476D1CE4E5B9)
            )
            x ^= x >> np.uint64(31)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(29)
        p = x % np.uint64(n_parts)
        return t.append_column("__part", pa.array(p.astype(np.int32)))

    return ds.map_batches(addpart, batch_format="pyarrow").groupby("__part")


def j13_band_join_sql() -> str:
    return (
        "SELECT a.user_id AS user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs "
        "FROM events a JOIN events b ON b.user_id = a.user_id "
        "AND a.event_type = 'click' AND b.event_type = 'purchase' "
        "AND b.ts BETWEEN a.ts - INTERVAL 6 HOUR AND a.ts + INTERVAL 6 HOUR "
        "GROUP BY 1 ORDER BY 1"
    )


# --------------------------------------------- w26 grouped OHLC candles

_EPOCH_DAY = np.datetime64("2024-01-01", "us").astype(np.int64) // 86_400_000_000


def _ohlc_merge(t: pa.Table) -> pa.Table:
    """Reduce OHLC partial rows per (user_id, day_idx): open keeps the
    min-(ots, oid) witness, close the max-(cts, cid) witness, high/low
    fold with max/min, n sums — associative, so the same kernel is the
    per-batch combiner and the final merge."""
    if t.num_rows == 0:
        return t
    u = t["user_id"].to_numpy()
    d = t["day_idx"].to_numpy()
    ots, oid = t["ots"].to_numpy(), t["oid"].to_numpy()
    cts, cid = t["cts"].to_numpy(), t["cid"].to_numpy()
    order = np.lexsort((oid, ots, d, u))
    us, dsrt = u[order], d[order]
    first = np.r_[True, (us[1:] != us[:-1]) | (dsrt[1:] != dsrt[:-1])]
    starts = np.flatnonzero(first)
    open_rows = order[first]
    order2 = np.lexsort((cid, cts, d, u))
    us2, d2 = u[order2], d[order2]
    last2 = np.r_[(us2[1:] != us2[:-1]) | (d2[1:] != d2[:-1]), True]
    close_rows = order2[last2]
    hi = np.maximum.reduceat(t["high_c"].to_numpy()[order], starts)
    lo = np.minimum.reduceat(t["low_c"].to_numpy()[order], starts)
    n = np.add.reduceat(t["n_events"].to_numpy()[order], starts)
    return pa.table(
        {
            "user_id": pa.array(us[first]),
            "day_idx": pa.array(dsrt[first]),
            "ots": pa.array(ots[open_rows]),
            "oid": pa.array(oid[open_rows]),
            "open_c": pa.array(t["open_c"].to_numpy()[open_rows]),
            "cts": pa.array(cts[close_rows]),
            "cid": pa.array(cid[close_rows]),
            "close_c": pa.array(t["close_c"].to_numpy()[close_rows]),
            "high_c": pa.array(hi),
            "low_c": pa.array(lo),
            "n_events": pa.array(n),
        }
    )


def w26_ohlc(sf: str):
    """GROUPED OHLC CANDLES per (user, day): open/close = value at the
    first/last event of the day ((ts, event_id) total order — exact,
    no ties), high/low = max/min, n_events = count. The time-series
    downsampling primitive. Combiner-first: each batch reduces to one
    partial row per (user, day) present, the shuffle carries
    groups x blocks rows, one user co-partition finishes (all days of
    a user land together; the merge stays vectorized per partition)."""

    ds = read_table(sf, "events", ["event_id", "ts", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        vc = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        eid = t["event_id"].to_numpy()
        part = pa.table(
            {
                "user_id": t["user_id"],
                "day_idx": pa.array(ts // 86_400_000_000 - _EPOCH_DAY),
                "ots": pa.array(ts),
                "oid": eid,
                "open_c": pa.array(vc),
                "cts": pa.array(ts),
                "cid": eid,
                "close_c": pa.array(vc),
                "high_c": pa.array(vc),
                "low_c": pa.array(vc),
                "n_events": pa.array(np.ones(t.num_rows, np.int64)),
            }
        )
        return _ohlc_merge(part)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        t = _ohlc_merge(t.drop_columns(["__part"]))
        return t.select(
            ["user_id", "day_idx", "open_c", "close_c", "high_c", "low_c", "n_events"]
        )

    nparts = _npart(table_rows(sf, "events"))
    return (
        _hash_partitioned(partials, "user_id", nparts)
        .map_groups(finish, batch_format="pyarrow")
        .sort(["user_id", "day_idx"])
    )


def w26_ohlc_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, "
        "datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx, "
        "ts, event_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS v FROM events), "
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day_idx "
        "ORDER BY ts, event_id) AS rn_a, ROW_NUMBER() OVER "
        "(PARTITION BY user_id, day_idx ORDER BY ts DESC, event_id DESC) AS rn_d "
        "FROM e), "
        "agg AS (SELECT user_id, day_idx, MAX(v) AS high_c, MIN(v) AS low_c, "
        "CAST(COUNT(*) AS BIGINT) AS n_events FROM e GROUP BY 1, 2) "
        "SELECT agg.user_id AS user_id, CAST(agg.day_idx AS BIGINT) AS day_idx, "
        "o.v AS open_c, c.v AS close_c, agg.high_c, agg.low_c, agg.n_events "
        "FROM agg JOIN r o ON o.user_id = agg.user_id AND o.day_idx = agg.day_idx "
        "AND o.rn_a = 1 JOIN r c ON c.user_id = agg.user_id "
        "AND c.day_idx = agg.day_idx AND c.rn_d = 1 ORDER BY 1, 2"
    )


def m20_url_parse(sf: str, host_mod: int = 251):
    """Scrape-side URL COMPONENT analytics: synthesize a deterministic
    URL per lineitem row (host = orderkey residue, path depth varies
    with partkey, the suppkey rides as a query parameter — mirrored
    textually in the oracle), then parse it BACK with RE2 extraction
    kernels and aggregate per host. The extraction is the op under
    test: host / path / query-param pulls are exactly what a link
    post-processor runs over a crawl ledger, and both engines speak
    RE2 (Arrow extract_regex / DuckDB regexp_extract) so leftmost
    semantics agree by construction.

    Distributed shape: one streaming map_batches pass (vectorized
    string build + three vectorized extractions, no Python rows), then
    a combiner-first grouped count/sum keyed by the ~host_mod hosts."""
    li = read_table(sf, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])

    def parse(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        host = pa.array((ok % host_mod).astype(str), pa.string())
        part = pa.array(pk.astype(str), pa.string())
        supp = pa.array(sk.astype(str), pa.string())
        mid = pa.array(np.where(pk % 3 == 0, "/a/", "/a/b/"), pa.string())
        url = pc.binary_join_element_wise(
            "http://h", host, ".example.com", mid, part, "?s=", supp, ""
        )
        # --- the parse-back under test (all RE2, all vectorized)
        h = pc.struct_field(
            pc.extract_regex(url, r"^https?://(?P<g>[^/]+)/"), 0
        )
        path = pc.struct_field(
            pc.extract_regex(url, r"^https?://[^/]+(?P<g>[^?]*)"), 0
        )
        sval = pc.struct_field(pc.extract_regex(url, r"[?]s=(?P<g>[0-9]+)"), 0)
        return pa.table(
            {
                "host": h,
                "depth": pc.cast(pc.count_substring(path, "/"), pa.int64()),
                "s": pc.cast(sval, pa.int64()),
            }
        )

    parsed = li.map_batches(parse, batch_format="pyarrow")
    return grouped_agg(
        parsed,
        ["host"],
        [("n", "count", None), ("sum_depth", "sum", "depth"), ("sum_s", "sum", "s")],
        round_to=None,
    ).map_batches(
        lambda t: pa.table(
            {
                "host": t["host"],
                "n": t["n"].cast(pa.int64()),
                "sum_depth": t["sum_depth"].cast(pa.int64()),
                "sum_s": t["sum_s"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("host")


def m20_url_parse_sql(host_mod: int = 251) -> str:
    return (
        "WITH u AS (SELECT 'http://h' || CAST(l_orderkey % "
        f"{host_mod} AS VARCHAR) || '.example.com' || "
        "CASE WHEN l_partkey % 3 = 0 THEN '/a/' ELSE '/a/b/' END || "
        "CAST(l_partkey AS VARCHAR) || '?s=' || CAST(l_suppkey AS VARCHAR) "
        "AS url FROM lineitem), "
        "p AS (SELECT regexp_extract(url, '^https?://([^/]+)/', 1) AS host, "
        "CAST(length(regexp_extract(url, '^https?://[^/]+([^?]*)', 1)) - "
        "length(replace(regexp_extract(url, '^https?://[^/]+([^?]*)', 1), '/', '')) "
        "AS BIGINT) AS depth, "
        "CAST(regexp_extract(url, '[?]s=([0-9]+)', 1) AS BIGINT) AS s FROM u) "
        "SELECT host, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(depth) AS BIGINT) AS sum_depth, "
        "CAST(SUM(s) AS BIGINT) AS sum_s FROM p GROUP BY host ORDER BY host"
    )
