"""Relational operator surface (SURVEY.md §2.5-§2.7, §3.4) — the
generic query capabilities exercised by the driver's DuckDB-oracle
harness over /root/testdata tables. Every op is Ray-Data-first:
column-pruned parquet reads, vectorized Arrow batch kernels, partial
(combiner) aggregation before the grouped shuffle, broadcast small
sides instead of shuffle joins.

Float outputs are emitted as INTEGER centi-units on BOTH sides (Ray:
rint(x*100); SQL: CAST(ROUND(x*100,0) AS BIGINT)) — cross-engine float
hashing is ill-defined at the last double ulp, and ROUND() modes differ
between engines at exact decimal ties. Exactly-representable rationals
(e.g. 4-decimal per-row revenue) scale by 10^4 instead, landing within
1 ulp of an integer on both engines.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..sources.testdata import read_table

# ---------------------------------------------------------------------------
# grouped_agg — partial aggregation inside map_batches (pyarrow C++
# group_by per batch), then a small grouped Sum/Min/Max over partials,
# then a finalize pass (mean/std recomposition + rounding). The shuffle
# moves one row per (key, batch) instead of every input row — the
# pre-aggregate pattern for scale (ray_guide "Aggregation at scale").
# ---------------------------------------------------------------------------

_KINDS = ("sum", "count", "min", "max", "mean", "std")


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    specs: list[tuple[str, str, str | None]],
    round_to: int | None = 4,
) -> ray.data.Dataset:
    """specs: (out_name, kind, col) with kind in sum|count|min|max|mean|std.
    count ignores col (row count). std is sample std (ddof=1), matching
    DuckDB's stddev. Float outputs are emitted as integer centi-units
    (CAST(ROUND(x*100) AS BIGINT) on the SQL side) — see finalize."""
    for _, kind, _ in specs:
        if kind not in _KINDS:
            raise ValueError(kind)

    # partial terms needed per spec: list of (term_col_name, agg, src_expr)
    def partial(t: pa.Table) -> pa.Table:
        cols: dict[str, pa.ChunkedArray | pa.Array] = {k: t[k] for k in keys}
        aggs = []
        ones = pa.array(np.ones(t.num_rows, np.int64))
        work = pa.table(cols)
        for i, (_, kind, col) in enumerate(specs):
            p = f"__p{i}"
            if kind == "count":
                work = work.append_column(p + "_c", ones)
                aggs.append((p + "_c", "sum"))
            elif kind in ("sum", "min", "max"):
                work = work.append_column(p + "_v", t[col])
                aggs.append((p + "_v", kind))
            elif kind == "mean":
                work = work.append_column(p + "_s", t[col])
                work = work.append_column(p + "_c", ones)
                aggs.append((p + "_s", "sum"))
                aggs.append((p + "_c", "sum"))
            elif kind == "std":
                v = pc.cast(t[col], pa.float64())
                work = work.append_column(p + "_s", v)
                work = work.append_column(p + "_q", pc.multiply(v, v))
                work = work.append_column(p + "_c", ones)
                aggs.append((p + "_s", "sum"))
                aggs.append((p + "_q", "sum"))
                aggs.append((p + "_c", "sum"))
        out = work.group_by(keys).aggregate(aggs)
        # pyarrow names outputs "<col>_<agg>"; strip back to the term name
        ren = {f"{c}_{a}": c for c, a in aggs}
        return out.rename_columns([ren.get(n, n) for n in out.column_names])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    final_aggs = []
    for i, (_, kind, _) in enumerate(specs):
        p = f"__p{i}"
        if kind == "count":
            final_aggs.append(Sum(p + "_c", alias_name=p + "_c"))
        elif kind == "sum":
            final_aggs.append(Sum(p + "_v", alias_name=p + "_v"))
        elif kind == "min":
            final_aggs.append(Min(p + "_v", alias_name=p + "_v"))
        elif kind == "max":
            final_aggs.append(Max(p + "_v", alias_name=p + "_v"))
        elif kind == "mean":
            final_aggs.append(Sum(p + "_s", alias_name=p + "_s"))
            final_aggs.append(Sum(p + "_c", alias_name=p + "_c"))
        elif kind == "std":
            final_aggs.append(Sum(p + "_s", alias_name=p + "_s"))
            final_aggs.append(Sum(p + "_q", alias_name=p + "_q"))
            final_aggs.append(Sum(p + "_c", alias_name=p + "_c"))
    agg = partials.groupby(keys[0] if len(keys) == 1 else keys).aggregate(*final_aggs)

    def finalize(t: pa.Table) -> pa.Table:
        out: dict[str, pa.Array] = {k: t[k] for k in keys}
        for i, (name, kind, _) in enumerate(specs):
            p = f"__p{i}"
            if kind == "count":
                col = t[p + "_c"]
            elif kind in ("sum", "min", "max"):
                col = t[p + "_v"]
            elif kind == "mean":
                col = pc.divide(pc.cast(t[p + "_s"], pa.float64()), t[p + "_c"])
            else:  # std, ddof=1 (sample) to match DuckDB stddev
                s = t[p + "_s"].to_numpy(zero_copy_only=False)
                q = t[p + "_q"].to_numpy(zero_copy_only=False)
                c = t[p + "_c"].to_numpy(zero_copy_only=False).astype(np.float64)
                var = (q - s * s / c) / np.maximum(c - 1, 1)
                col = pa.array(np.sqrt(np.maximum(var, 0.0)))
            if round_to is not None and pa.types.is_floating(
                col.type if isinstance(col, pa.Array) else col.type
            ):
                # integer centi-units: ROUND(x, n) is engine-dependent at
                # the last double ulp, so cross-engine float hashing is
                # ill-defined; CAST(ROUND(x*100)) is stable on both sides
                v = col.to_numpy(zero_copy_only=False) if not isinstance(col, np.ndarray) else col
                col = pa.array(np.rint(np.asarray(v, np.float64) * 100).astype(np.int64))
            out[name] = col
        return pa.table(out)

    return agg.map_batches(finalize, batch_format="pyarrow")


def _min_set_filter(ds, key: str, ucol: str, driver_max: int = 5_000_000) -> ray.data.Dataset:
    """Keep the row with the minimum ``ucol`` per ``key`` group, where
    ``ucol`` is a caller-built integer that orders rows within a group
    (e.g. packed orderkey/linenumber). Per-batch combiner -> min-per-key
    over the pruned (key, ucol) columns (driver numpy when it fits, a
    grouped Min shuffle otherwise) -> broadcast min-set filter — no
    per-group Python calls (SURVEY.md §2.7 D1)."""

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        t = t.take(pc.sort_indices(t, sort_keys=[(key, "ascending"), (ucol, "ascending")]))
        k = t[key].combine_chunks()
        neq = pc.not_equal(k.slice(1), k.slice(0, len(k) - 1)).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.r_[True, neq]))

    combined = ds.map_batches(combine, batch_format="pyarrow")

    parts, n, small = [], 0, True
    for b in combined.select_columns([key, ucol]).iter_batches(
        batch_format="pyarrow", batch_size=262144
    ):
        n += b.num_rows
        if n > driver_max:
            small = False
            break
        parts.append(b)
    if small:
        if parts:
            comb = pa.concat_tables(parts).combine_chunks()
            idx = pc.sort_indices(
                comb, sort_keys=[(key, "ascending"), (ucol, "ascending")]
            )
            srt = comb.take(idx)
            k = srt[key].combine_chunks()
            neq = pc.not_equal(k.slice(1), k.slice(0, len(k) - 1)).to_numpy(
                zero_copy_only=False
            )
            mins = np.sort(srt[ucol].to_numpy()[np.r_[True, neq]])
        else:
            mins = np.array([], np.int64)
    else:
        agg = combined.groupby(key).aggregate(Min(ucol, alias_name="__min_u"))
        mins = np.sort(
            np.concatenate(
                [b["__min_u"].to_numpy() for b in agg.iter_batches(batch_format="pyarrow", batch_size=65536)]
                or [np.array([], np.int64)]
            )
        )
    ref = ray.put(mins)

    def keep(t: pa.Table) -> pa.Table:
        wanted = ray.get(ref)
        u = t[ucol].to_numpy()
        if len(wanted) == 0:
            return t.slice(0, 0)
        idx = np.clip(np.searchsorted(wanted, u), 0, len(wanted) - 1)
        return t.filter(pa.array(wanted[idx] == u))

    return combined.map_batches(keep, batch_format="pyarrow")


def _cents_cols(ds, cols: dict[str, str]):
    """Replace float columns with integer centi-unit columns (renamed);
    cols maps old float column -> new integer column name."""

    def f(t: pa.Table) -> pa.Table:
        for old, new in cols.items():
            v = np.rint(t[old].to_numpy(zero_copy_only=False).astype(np.float64) * 100)
            i = t.schema.get_field_index(old)
            t = t.remove_column(i).append_column(new, pa.array(v.astype(np.int64)))
        return t

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# the query functions (one per operator) — each takes sf_dir
# ---------------------------------------------------------------------------


def g1_groupby_count(sf: str):
    ds = read_table(sf, "lineitem", ["l_returnflag", "l_quantity"])
    return grouped_agg(
        ds, ["l_returnflag"], [("n", "count", None), ("sum_qty", "sum", "l_quantity")]
    )


def g5_grouped_stats(sf: str):
    ds = read_table(sf, "lineitem", ["l_returnflag", "l_extendedprice"])
    return grouped_agg(
        ds,
        ["l_returnflag"],
        [
            ("min_price", "min", "l_extendedprice"),
            ("max_price", "max", "l_extendedprice"),
            ("avg_price", "mean", "l_extendedprice"),
            ("std_price", "std", "l_extendedprice"),
        ],
    )


def q1_pricing_summary(sf: str):
    """TPC-H Q1 shape — the headline relational aggregate."""
    ds = read_table(
        sf,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-01", "us"))

    def prep2(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", rev)

    ds = ds.map_batches(prep2, batch_format="pyarrow")
    return grouped_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        [
            ("sum_qty", "sum", "l_quantity"),
            ("sum_base_price", "sum", "l_extendedprice"),
            ("sum_revenue", "sum", "revenue"),
            ("avg_qty", "mean", "l_quantity"),
            ("avg_price", "mean", "l_extendedprice"),
            ("n", "count", None),
        ],
    )


def q3_shipping_priority(sf: str):
    """TPC-H Q3 shape — the composite multi-join: broadcast-filtered
    customer side -> orders filter -> hash join to lineitem -> grouped
    revenue -> top-10. The small side (BUILDING custkeys) broadcasts;
    only orders⋈lineitem shuffles. Revenue in 1e-4 units (sums of few
    4-decimal rationals stay within 1 ulp of an integer at x10^4)."""
    cust = (
        read_table(sf, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(["c_custkey"]),
            batch_format="pyarrow",
        )
        .unique("c_custkey")
    )
    cref = ray.put(np.sort(np.asarray(cust, np.int64)))
    cutoff_o = pa.scalar(np.datetime64("1998-01-01", "us"))
    cutoff_l = pa.scalar(np.datetime64("1996-01-01", "us"))

    orders = read_table(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(t: pa.Table) -> pa.Table:
        keys = ray.get(cref)
        t = t.filter(pc.less(t["o_orderdate"], cutoff_o))
        m = np.isin(t["o_custkey"].to_numpy(), keys)
        t = t.filter(pa.array(m))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "orderdate": pc.strftime(t["o_orderdate"], format="%Y-%m-%d"),
            }
        )

    orders = orders.map_batches(o_filter, batch_format="pyarrow")

    li = read_table(sf, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def l_filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cutoff_l))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev": rev})

    li = li.map_batches(l_filter, batch_format="pyarrow")

    j = li.join(orders, join_type="inner", num_partitions=16, on=("l_orderkey",), right_on=("o_orderkey",))
    agg = grouped_agg(
        j, ["l_orderkey", "orderdate"], [("revenue_e4", "sum", "rev")], round_to=None
    )

    def to_e4(t: pa.Table) -> pa.Table:
        v = np.rint(t["revenue_e4"].to_numpy(zero_copy_only=False).astype(np.float64) * 10000)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "orderdate": t["orderdate"],
                "revenue_e4": pa.array(v.astype(np.int64)),
            }
        )

    agg = agg.map_batches(to_e4, batch_format="pyarrow")
    return agg.sort(["revenue_e4", "l_orderkey"], descending=[True, False]).limit(10)


def g3_distinct(sf: str):
    ds = read_table(sf, "customer", ["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(vals, pa.string())})


def j2_inner_join(sf: str):
    """Hash shuffle join (both sides large): orders ⋈ customer."""
    orders = read_table(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = read_table(sf, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    j = orders.join(
        cust, join_type="inner", num_partitions=16, on=("o_custkey",), right_on=("c_custkey",)
    )
    j = j.select_columns(["o_orderkey", "c_name", "c_mktsegment", "o_totalprice"])
    return _cents_cols(j, {"o_totalprice": "totalprice_c"})


def j1_anti_join(sf: str):
    """Customers with no high-value (>400k) orders — broadcast
    anti-join (semi/anti = broadcast the key set, filter inside
    map_batches; no shuffle). The value filter keeps the result
    non-empty at every sf."""
    custkeys = (
        read_table(sf, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: t.filter(pc.greater(t["o_totalprice"], 400000.0)).select(["o_custkey"]),
            batch_format="pyarrow",
        )
        .unique("o_custkey")
    )
    ref = ray.put(np.sort(np.asarray(custkeys, np.int64)))
    cust = read_table(sf, "customer", ["c_custkey", "c_name"])

    def anti(t: pa.Table) -> pa.Table:
        have = ray.get(ref)
        return t.filter(pa.array(~np.isin(t["c_custkey"].to_numpy(), have)))

    return cust.map_batches(anti, batch_format="pyarrow")


def j3_broadcast_lookup(sf: str):
    """Small-side broadcast lookup join: lineitem -> supplier nation,
    then grouped count (dimension table via ray.put, read per batch)."""
    supp = read_table(sf, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    ref = ray.put(dict(zip(supp["s_suppkey"].astype(np.int64), supp["s_nationkey"].astype(np.int32))))
    li = read_table(sf, "lineitem", ["l_suppkey"])

    def lookup(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = t["l_suppkey"].to_numpy()
        nk = np.array([m.get(int(k), -1) for k in keys], np.int32)
        return pa.table({"nationkey": pa.array(nk, pa.int32())})

    ds = li.map_batches(lookup, batch_format="pyarrow")
    return grouped_agg(ds, ["nationkey"], [("n", "count", None)])


def o2_topk(sf: str):
    ds = read_table(sf, "customer", ["c_custkey", "c_name", "c_acctbal"])
    top = ds.sort(["c_acctbal", "c_custkey"], descending=[True, False]).limit(10)
    return _cents_cols(top, {"c_acctbal": "acctbal_c"})


def o4_hash_sample(sf: str):
    """Deterministic (reproducible) sample — residue filter, never
    random_sample (SURVEY.md §2.6 O4)."""
    ds = read_table(sf, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    out = ds.map_batches(
        lambda t: t.filter(pa.array(t["l_orderkey"].to_numpy() % 100 == 0)),
        batch_format="pyarrow",
    )
    return _cents_cols(out, {"l_quantity": "quantity_c"})


def d1_first_by_key(sf: str):
    """First lineitem row per order by (linenumber, partkey) — D1
    first-by-key. The packed order column gkey = okey*2^28 + ln*2^24 +
    pk is group-unique up to exact-duplicate rows, so the broadcast
    min-set filter can keep several *identical* winners per group; a
    final grouped distinct (over result-sized data) collapses them.
    Ties below the full projection are harmless by construction: the
    tied rows are equal in every output column."""
    from ray.data.aggregate import Count

    ds = read_table(sf, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"])

    def pack(t: pa.Table) -> pa.Table:
        g = (
            t["l_orderkey"].to_numpy() * (1 << 28)
            + t["l_linenumber"].to_numpy().astype(np.int64) * (1 << 24)
            + t["l_partkey"].to_numpy()
        )
        return t.append_column("__u", pa.array(g, pa.int64()))

    ds = ds.map_batches(pack, batch_format="pyarrow")
    kept = _min_set_filter(ds, "l_orderkey", "__u").drop_columns(["__u"])
    # collapse exact-duplicate winners: the kept set is result-sized
    # (one-ish row per group), so a driver-side sorted distinct beats a
    # second cluster shuffle
    t = pa.concat_tables(
        list(kept.iter_batches(batch_format="pyarrow", batch_size=262144))
    ).combine_chunks()
    idx = pc.sort_indices(
        t, sort_keys=[("l_orderkey", "ascending"), ("l_linenumber", "ascending"), ("l_partkey", "ascending")]
    )
    t = t.take(idx)
    k = t["l_orderkey"].combine_chunks()
    neq = pc.not_equal(k.slice(1), k.slice(0, len(k) - 1)).to_numpy(zero_copy_only=False)
    return t.filter(pa.array(np.r_[True, neq]))


def d4_union(sf: str):
    a = read_table(sf, "orders", ["o_orderkey", "o_orderstatus"]).filter(
        lambda r: r["o_orderstatus"] == "F"
    )
    b = read_table(sf, "orders", ["o_orderkey", "o_orderstatus"]).filter(
        lambda r: r["o_orderstatus"] == "O"
    )
    return a.union(b)


def d5_except(sf: str):
    """Distinct custkeys of BUILDING customers minus those with open
    orders — EXCEPT as unique + broadcast anti filter."""
    open_keys = (
        read_table(sf, "orders", ["o_custkey", "o_orderstatus"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["o_orderstatus"], "O")).select(["o_custkey"]),
            batch_format="pyarrow",
        )
        .unique("o_custkey")
    )
    ref = ray.put(np.sort(np.asarray(open_keys, np.int64)))
    cust = read_table(sf, "customer", ["c_custkey", "c_mktsegment"])

    def ex(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        drop = ray.get(ref)
        return t.select(["c_custkey"]).filter(
            pa.array(~np.isin(t["c_custkey"].to_numpy(), drop))
        )

    out = cust.map_batches(ex, batch_format="pyarrow")
    keys = sorted(out.unique("c_custkey"))
    return pa.table({"c_custkey": pa.array(keys, pa.int64())})


def m6_filter_project(sf: str):
    ds = read_table(
        sf, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi))
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        # x10^4: the product of two 2-decimal values is a 4-decimal
        # rational, so revenue*10^4 sits within 1 ulp of an integer on
        # both engines (x100 would land exactly on .5 ties ~1% of rows)
        rev_e4 = np.rint(rev.to_numpy(zero_copy_only=False).astype(np.float64) * 10000)
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "revenue_e4": pa.array(rev_e4.astype(np.int64))}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def m12_json_extract(sf: str):
    """M12 — JSON props extraction (scalar function over a string col)."""
    ds = read_table(sf, "events", ["event_id", "props"])

    def f(t: pa.Table) -> pa.Table:
        ks = [json.loads(p).get("k") for p in t["props"].to_pylist()]
        return pa.table(
            {"event_id": t["event_id"], "k": pa.array(ks, pa.int64())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def m13_string_ops(sf: str):
    ds = read_table(sf, "part", ["p_partkey", "p_brand", "p_name"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "brand_u": pc.utf8_upper(t["p_brand"]),
                "name8": pc.utf8_slice_codeunits(t["p_name"], 0, 8),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def m13_date_bucket(sf: str):
    ds = read_table(sf, "events", ["ts"])
    ds = ds.map_batches(
        lambda t: pa.table({"day": pc.strftime(t["ts"], format="%Y-%m-%d")}),
        batch_format="pyarrow",
    )
    return grouped_agg(ds, ["day"], [("n", "count", None)])


def w1_window_agg(sf: str):
    """Tumbling-window aggregate over the events stream: per (user,
    hour) count + sum(value) — the batch form of a streaming window."""
    ds = read_table(sf, "events", ["user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                "hour": pc.strftime(t["ts"], format="%Y-%m-%d %H:00:00"),
                "value": t["value"],
            }
        ),
        batch_format="pyarrow",
    )
    return grouped_agg(
        ds, ["user_id", "hour"], [("n", "count", None), ("sum_value", "sum", "value")]
    )


def w2_sessionize(sf: str):
    """Sessionization (30-min inactivity gap) — groupby(user).map_groups
    over ts-sorted groups; the ordering assumption is per-user ts order
    established inside each group (ray_guide streaming-shaped loads)."""
    import pandas as pd

    ds = read_table(sf, "events", ["user_id", "ts"])

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values()
        brk = (ts.diff() > pd.Timedelta(minutes=30)).sum()
        return pd.DataFrame(
            {"user_id": [g["user_id"].iloc[0]], "n_sessions": [int(brk) + 1]}
        )

    return ds.groupby("user_id").map_groups(sess, batch_format="pandas")


def w4_running_sum(sf: str):
    """Window function: per-user running SUM(value) ordered by (ts,
    event_id) — groupby(user).map_groups over ts-sorted groups (the
    per-key-ordered-log pattern); output in integer centi-units."""
    import pandas as pd

    ds = read_table(sf, "events", ["event_id", "user_id", "ts", "value"])

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        rs = np.rint(g["value"].cumsum().to_numpy() * 100).astype(np.int64)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(), "run_sum_c": rs})

    return ds.groupby("user_id").map_groups(run, batch_format="pandas")


def w3_asof_join(sf: str):
    """As-of join: for each event, the latest order of the same user
    (user_id = o_custkey) with o_orderdate <= ts. Implemented as the
    bucketed merge_asof pattern (ray_guide "As-of / range join"): hash
    the small side into a broadcast per-key sorted index, probe per
    batch with numpy searchsorted — no shuffle. Output ts_order is the
    matched order DATE (keys can tie on date; the date itself is
    deterministic where an arbitrary orderkey would not be)."""
    orders = read_table(sf, "orders", ["o_custkey", "o_orderdate"]).to_pandas()
    orders = orders.sort_values(["o_custkey", "o_orderdate"])
    idx = {
        int(k): g["o_orderdate"].to_numpy(dtype="datetime64[us]")
        for k, g in orders.groupby("o_custkey")
    }
    ref = ray.put(idx)
    events = read_table(sf, "events", ["event_id", "user_id", "ts"])

    def probe(t: pa.Table) -> pa.Table:
        table = ray.get(ref)
        out_date: list = []
        ts = t["ts"].to_numpy()
        for uid, ev_ts in zip(t["user_id"].to_numpy(), ts):
            dates = table.get(int(uid))
            if dates is None:
                out_date.append(None)
                continue
            i = int(np.searchsorted(dates, ev_ts, side="right")) - 1
            out_date.append(None if i < 0 else dates[i])
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_order": pa.array(
                    [None if d is None else str(np.datetime_as_string(d, unit="D")) for d in out_date],
                    pa.string(),
                ),
            }
        )

    return events.map_batches(probe, batch_format="pyarrow")


def g4_hll_distinct(sf: str):
    """G4 — HyperLogLog approximate distinct of l_partkey: one sketch
    per batch, merged on the driver (sketches are tiny + mergeable).
    Approximate => no SQL oracle (rows-only check); pytest asserts ±2%
    vs exact."""
    from ..functions.hll import HyperLogLog

    ds = read_table(sf, "lineitem", ["l_partkey"])

    def sketch(t: pa.Table) -> pa.Table:
        h = HyperLogLog(p=14)
        h.add_many(t["l_partkey"].to_numpy().astype(np.uint64))
        return pa.table({"registers": pa.array([h.registers.tobytes()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow")
    h = HyperLogLog(p=14)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=1024):
        for r in b["registers"].to_pylist():
            h.merge_registers(r)
    return pa.table({"approx_distinct": pa.array([int(h.count())], pa.int64())})
