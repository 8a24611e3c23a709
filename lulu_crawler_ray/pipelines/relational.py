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
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..sources.testdata import read_table

# ---------------------------------------------------------------------------
# grouped_agg — partial aggregation inside map_batches (pyarrow C++
# group_by per batch), then a small grouped Sum/Min/Max over partials,
# then a finalize pass (mean/std recomposition + rounding). The shuffle
# moves one row per (key, batch) instead of every input row — the
# pre-aggregate pattern for scale (ray_guide "Aggregation at scale").
# ---------------------------------------------------------------------------

_KINDS = ("sum", "count", "min", "max", "mean", "std")


@ray.remote
def _count_rows_ref(t: pa.Table) -> int:
    return t.num_rows


def _nonempty(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Drop zero-row blocks before a hash-shuffle join. Ray 2.49 emits
    zero-row blocks (e.g. from a selective upstream filter) as
    SCHEMA-LESS RefBundles; when a join partition consists only of such
    blocks, acero cannot resolve the key FieldRef and the join dies with
    ``ArrowInvalid: No match ... FieldRef.Name(<key>)`` — a
    parallelism-dependent failure (more CPUs -> more partitions -> some
    partition is all-empty). Materializes and re-wraps only the
    non-empty block refs; when EVERY block is empty, one block is kept
    (its arrow table still carries the column schema) so downstream
    stays well-typed."""
    blocks = ds.materialize().to_arrow_refs()
    counts = ray.get([_count_rows_ref.remote(b) for b in blocks])
    keep = [b for b, c in zip(blocks, counts) if c > 0]
    return ray.data.from_arrow_refs(keep if keep else list(blocks[:1]))


def shuffle_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str,
    num_partitions: int | None = None,
    join_type: str = "inner",
) -> ray.data.Dataset:
    """Hash-shuffle join (inner/left_outer/right_outer/full_outer) with
    BOTH inputs guarded against zero-row schema-less blocks (see
    _nonempty). The guard's materialize is not an extra data copy at
    scale — the hash shuffle materializes both sides through the
    exchange anyway."""
    return _nonempty(left).join(
        _nonempty(right),
        join_type=join_type,
        num_partitions=num_partitions or _npart(),
        on=(on,),
        right_on=(right_on,),
    )


def _distinct(ds: ray.data.Dataset, key: str) -> ray.data.Dataset:
    """Dataset-side DISTINCT on one column (unsorted): per-batch
    pyarrow distinct combiner (shrinks the shuffle to unique-per-block
    keys), then hash-co-partition and one C++ group_by per partition
    (round 5: a DISTINCT key set is near-unique by definition, exactly
    the shape where Ray's sort-based Aggregate measured 10x slower
    than the co-partitioned exchange — see grouped_agg's large path).
    As a bonus the partition key is key_hash_u64, so uint64 key
    columns ride as plain data instead of tripping Ray's uint64
    group-key fallback. The driver never gathers the key set."""
    combined = ds.map_batches(
        lambda t: t.group_by([key]).aggregate([]), batch_format="pyarrow"
    )
    return _hash_partitioned_any(combined, [key], _npart()).map_groups(
        lambda t: t.drop_columns(["__part"]).group_by([key]).aggregate([]),
        batch_format="pyarrow",
    )


def _distinct_sorted(ds: ray.data.Dataset, key: str) -> ray.data.Dataset:
    """_distinct + a range-partition total sort — a billion-key
    EXCEPT/INTERSECT stays in the object store (round 2 finalized with
    sorted(ds.unique()) on the driver)."""
    return _distinct(ds, key).sort(key)


def _npart(rows: int | None = None) -> int:
    """Join/shuffle partition count. Each hash-shuffle partition is an
    aggregator actor with a fixed spin-up cost, so the count must scale
    with the DATA, not the cluster: the round-3 sweep at 32 CPUs on the
    150k-row j2 join measured 1.8 s at 2 partitions monotonically up to
    7.9 s at 64 — actor spin-up dominated everything (round 2's jump
    from 16 to max(16, CPUs) partitions was the whole j2 regression).

    With a row hint (parquet-footer metadata, free): one partition per
    ~128k rows, floor 2, capped at 4x CPUs (the cap keeps per-partition
    memory bounded as data grows past cpu*128k; a multi-node cluster
    raises the cap through its CPU total). Without a hint, the old
    CPU-scaled default."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if rows is None:
        return max(16, cpus)
    return int(min(max(2, rows // 131072 + 1), max(16, 4 * cpus)))


@ray.remote(num_cpus=1)
def _grouped_agg_task(keys, pairs, *blocks):
    """One-task finalize: pyarrow C++ group_by over the combined
    partial rows. pairs: (term_col, op) per final aggregate."""
    t = pa.concat_tables(blocks).combine_chunks()
    out = t.group_by(keys).aggregate(pairs)
    ren = {f"{c}_{op}": c for c, op in pairs}
    return out.rename_columns([ren.get(n, n) for n in out.column_names])


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    specs: list[tuple[str, str, str | None]],
    round_to: int | None = 4,
    task_max: int = 2_000_000,
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

    final_pairs = []
    for i, (_, kind, _) in enumerate(specs):
        p = f"__p{i}"
        if kind == "count":
            final_pairs.append((p + "_c", "sum"))
        elif kind in ("sum", "min", "max"):
            final_pairs.append((p + "_v", kind))
        elif kind == "mean":
            final_pairs += [(p + "_s", "sum"), (p + "_c", "sum")]
        elif kind == "std":
            final_pairs += [(p + "_s", "sum"), (p + "_q", "sum"), (p + "_c", "sum")]

    # adaptive finalize: the partial set often compresses little (a
    # near-unique key like (user, hour) keeps ~1 partial row per input
    # row) — below ``task_max`` rows ONE pyarrow C++ group_by task
    # beats the distributed sort-shuffle groupby; above it the shuffle
    # path takes over. The route is chosen by a STREAMING early-exit
    # count (round-3 review: the old materialize-to-route held the
    # whole partial set — ~input-sized for a near-unique key — in the
    # object store behind a barrier before deciding anything). Batches
    # seen before the early exit re-enter the store one at a time; the
    # driver holds at most one batch. The large path re-runs the
    # partial map — one extra map-only pass, bought instead of a
    # 100-TB materialization.
    refs, n, small = [], 0, True
    for b in partials.iter_batches(batch_format="pyarrow", batch_size=262144):
        n += b.num_rows
        if n > task_max:
            small = False
            refs = []
            break
        if b.num_rows:
            refs.append(ray.put(b))
    if small and refs:
        agg = ray.data.from_arrow_refs([_grouped_agg_task.remote(keys, final_pairs, *refs)])
    else:
        # large path (round 5): hash-co-partition by key and run ONE
        # pyarrow C++ group_by per partition — the same kernel the
        # task path uses, so both routes share aggregation semantics
        # exactly. Ray's sort-based Aggregate over a near-unique key
        # set measured 20.6 s where this exchange + vectorized
        # finalize takes ~2 s (t_winnow_pairs, 12.5M intermediate
        # pairs, 10x scale smoke).
        def _part_agg(t: pa.Table) -> pa.Table:
            t = t.drop_columns(["__part"])
            out = t.group_by(keys).aggregate(final_pairs)
            ren = {f"{c}_{op}": c for c, op in final_pairs}
            return out.rename_columns([ren.get(n, n) for n in out.column_names])

        agg = _hash_partitioned_any(partials, keys, _npart()).map_groups(
            _part_agg, batch_format="pyarrow"
        )

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
    ``ucol`` is a caller-built integer that orders rows WITHIN a group
    (it need not be globally unique — the broadcast carries aligned
    (key, min_u) arrays and the filter matches on the pair, so there is
    no cross-group collision and no need to pack the group key into
    ``ucol``). Per-batch combiner -> min-per-key over the pruned
    (key, ucol) columns (one remote numpy task when it fits under
    ``driver_max`` rows) -> broadcast pair filter — no per-group Python
    calls (SURVEY.md §2.7 D1). ABOVE ``driver_max`` (billions of
    distinct keys at 100 TB, where any driver-side key gather or
    whole-set broadcast OOMs) the combined rows hash-co-partition by
    key instead and each partition keeps its first row per key in one
    vectorized pass — one full-row shuffle, zero driver state."""

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
    if not small:
        # scale path: co-partition the combined rows by key; within one
        # partition every row of a key is present, so first-after-sort
        # IS the global min — no min-set ever exists as a single object
        def part_first(t: pa.Table) -> pa.Table:
            t = t.take(pc.sort_indices(t, sort_keys=[(key, "ascending"), (ucol, "ascending")]))
            k = t[key].combine_chunks()
            neq = pc.not_equal(k.slice(1), k.slice(0, len(k) - 1)).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.r_[True, neq])).drop_columns(["__part"])

        return _hash_partitioned_any(combined, [key], _npart()).map_groups(
            part_first, batch_format="pyarrow"
        )
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
        starts = np.r_[True, neq]
        keys_s = srt[key].to_numpy()[starts]  # sorted ascending
        minu = srt[ucol].to_numpy()[starts]
    else:
        keys_s = minu = np.array([], np.int64)
    ref = ray.put((keys_s, minu))

    def keep(t: pa.Table) -> pa.Table:
        ks, mu = ray.get(ref)
        if len(ks) == 0:
            return t.slice(0, 0)
        k = t[key].to_numpy()
        u = t[ucol].to_numpy()
        idx = np.clip(np.searchsorted(ks, k), 0, len(ks) - 1)
        return t.filter(pa.array((ks[idx] == k) & (mu[idx] == u)))

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


def broadcast_sorted_keys(ds: ray.data.Dataset, col: str, broadcast_max: int = 50_000_000):
    """Distinct ``col`` values -> ONE sorted array in the object store
    (for searchsorted semi-join probes). The distinct set reduces
    through a grouped shuffle and the array is BUILT IN A WORKER —
    the driver streams refs, never the keys. A set over
    ``broadcast_max`` rows raises loudly (a broadcast that size is the
    wrong plan — use adaptive_semi_filter's shuffle path) instead of
    silently exhausting memory."""
    # Ray's hash groupby mishandles uint64 keys >= 2^63 (Arrow
    # conversion falls back to pickled objects), so shuffle the int64
    # BIT-PATTERN view and restore the uint64 domain before the final
    # sort in the build task
    as_u64 = False
    schema = ds.schema()
    if schema is not None and col in schema.names:
        as_u64 = pa.types.is_uint64(schema.base_schema.field(col).type)
    if as_u64:
        ds = ds.map_batches(
            lambda t: pa.table(
                {col: pa.array(t[col].to_numpy(zero_copy_only=False).view(np.int64))}
            ),
            batch_format="pyarrow",
        )
    distinct = _distinct(ds, col)
    refs, n = [], 0
    for b in distinct.iter_batches(batch_format="pyarrow", batch_size=262144):
        n += b.num_rows
        if n > broadcast_max:
            raise ValueError(
                f"broadcast_sorted_keys: >{broadcast_max} distinct {col} keys — "
                "broadcast is the wrong plan at this cardinality; use "
                "adaptive_semi_filter (shuffle path) instead"
            )
        if b.num_rows:
            refs.append(ray.put(b))
    if not refs:
        return ray.put(np.array([], np.uint64 if as_u64 else np.int64))
    return _build_sorted_keys.remote(col, as_u64, *refs)


@ray.remote(num_cpus=1)
def _build_dim(key: str, val_cols: tuple, *blocks):
    """Worker-built dimension tuple for searchsorted decoration:
    (sorted keys, aligned value arrays...). Lives in the object store;
    the driver only ever holds the ref."""
    t = pa.concat_tables(blocks).combine_chunks()
    k = t[key].to_numpy(zero_copy_only=False)
    o = np.argsort(k, kind="stable")
    return (k[o],) + tuple(
        t[c].to_numpy(zero_copy_only=False)[o] for c in val_cols
    )


def dim_ref(
    ds: ray.data.Dataset,
    key: str,
    val_cols: tuple = (),
    dim_max: int = 50_000_000,
    on_overflow: str = "raise",
    with_schema: bool = False,
):
    """Dimension table -> ONE worker-built (sorted keys, value
    arrays...) tuple in the object store, for searchsorted probes
    inside map_batches. Replaces the round-1..4 pattern of gathering
    SF-scaling 'dimension' sides (customer/supplier/part) through a
    driver-side ``.to_pandas()`` (VERDICT r4 item 2): block refs
    stream through the driver one batch at a time, the concatenated
    arrays are built in a worker, and a side over ``dim_max`` rows
    either raises loudly (on_overflow='raise') or returns None
    (on_overflow='none') so the caller can fall back to a
    hash-co-partitioned shuffle join (adaptive_dim_join does this
    automatically)."""
    refs, n, bschema = [], 0, None
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=262144):
        if bschema is None:
            bschema = b.schema
        n += b.num_rows
        if n > dim_max:
            if on_overflow == "none":
                return (None, None) if with_schema else None
            raise ValueError(
                f"dim_ref: >{dim_max} rows in broadcast dimension on {key} — "
                "a side this large must hash-co-partition (shuffle_join / "
                "adaptive_dim_join fallback), not broadcast"
            )
        if b.num_rows:
            refs.append(ray.put(b))
    if not refs:
        # preserve dtypes from the (empty) schema so probes stay typed;
        # an empty aggregate can surface schema-less, so fall back to
        # int64 (searchsorted probes never index a 0-length value array)
        try:
            schema = ds.schema()
            empty = pa.table(
                {c: pa.array([], schema.base_schema.field(c).type) for c in (key, *val_cols)}
            )
        except Exception:
            empty = pa.table({c: pa.array([], pa.int64()) for c in (key, *val_cols)})
        r = _build_dim.remote(key, tuple(val_cols), empty)
        return (r, bschema or empty.schema) if with_schema else r
    r = _build_dim.remote(key, tuple(val_cols), *refs)
    return (r, bschema) if with_schema else r


def adaptive_dim_join(
    fact: ray.data.Dataset,
    fact_key: str,
    dim: ray.data.Dataset,
    dim_key: str,
    val_cols: list[str],
    how: str = "inner",
    broadcast_max: int = 5_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Join a fact stream against a UNIQUE-KEY dimension with
    size-based strategy selection (the adaptive_semi_filter treatment
    for decoration joins): under ``broadcast_max`` dim rows, one
    worker-built sorted tuple broadcasts and every fact batch decorates
    via searchsorted (zero shuffle); above it — at 100 TB a 'dimension'
    can be billions of rows — both sides hash-co-partition through the
    shuffle join instead. Output = fact columns + ``val_cols``;
    how='inner' drops fact rows without a dim match, how='left' keeps
    them with nulls. Value dtypes are pinned from the dim schema so
    both paths emit identical types."""
    # the value dtypes come from the SAME streamed batches dim_ref
    # consumes — calling dim.schema() up front would execute the dim
    # pipeline a second time (for an AllToAll-rooted dim like a
    # grouped_agg output, schema() runs the whole upstream)
    ref, bschema = dim_ref(
        dim, dim_key, tuple(val_cols), broadcast_max, on_overflow="none", with_schema=True
    )
    if ref is not None:
        val_types = [bschema.field(c).type for c in val_cols]

        def decorate(t: pa.Table) -> pa.Table:
            tup = ray.get(ref)
            ks, vals = tup[0], tup[1:]
            k = t[fact_key].to_numpy(zero_copy_only=False)
            if len(ks) and len(k):
                idx = np.clip(np.searchsorted(ks, k), 0, len(ks) - 1)
                hit = ks[idx] == k
            else:
                idx = np.zeros(len(k), np.intp)
                hit = np.zeros(len(k), bool)
            if how == "inner":
                t = t.filter(pa.array(hit))
                idx = idx[hit]
                for c, v, typ in zip(val_cols, vals, val_types):
                    t = t.append_column(c, pa.array(v[idx], typ))
            else:
                for c, v, typ in zip(val_cols, vals, val_types):
                    arr = pa.array(v[idx], typ)
                    t = t.append_column(
                        c, pc.if_else(pa.array(hit), arr, pa.scalar(None, typ))
                    )
            return t

        return fact.map_batches(decorate, batch_format="pyarrow")

    dimsel = dim.map_batches(
        lambda t: t.select([dim_key, *val_cols]), batch_format="pyarrow"
    )
    joined = shuffle_join(
        fact,
        dimsel,
        fact_key,
        dim_key,
        num_partitions=num_partitions,
        join_type="inner" if how == "inner" else "left_outer",
    )
    if dim_key != fact_key:
        joined = joined.map_batches(
            lambda t: t.drop_columns([dim_key]) if dim_key in t.column_names else t,
            batch_format="pyarrow",
        )
    return joined


def q3_shipping_priority(sf: str):
    """TPC-H Q3 shape — the composite multi-join: broadcast-filtered
    customer side -> orders filter -> hash join to lineitem -> grouped
    revenue -> top-10. The small side (BUILDING custkeys) broadcasts;
    only orders⋈lineitem shuffles. Revenue in 1e-4 units (sums of few
    4-decimal rationals stay within 1 ulp of an integer at x10^4)."""
    cref = broadcast_sorted_keys(
        read_table(sf, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
            lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(["c_custkey"]),
            batch_format="pyarrow",
        ),
        "c_custkey",
    )
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

    # both sides are filtered upstream -> zero-row blocks possible;
    # shuffle_join guards them (the unguarded join breaks at high CPUs).
    # partition count sized to the pre-filter row total (upper bound)
    from ..sources.testdata import table_rows

    j = shuffle_join(
        li, orders, "l_orderkey", "o_orderkey",
        num_partitions=_npart(table_rows(sf, "lineitem") + table_rows(sf, "orders")),
    )
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


def q5_local_supplier_volume(
    sf: str, region: str = "ASIA", lo: str = "1996-01-01", hi: str = "1997-01-01"
):
    """TPC-H Q5 shape — the six-table join: region ⋈ nation ⋈
    customer ⋈ orders ⋈ lineitem ⋈ supplier with the local-supplier
    predicate (c_nationkey = s_nationkey), grouped revenue per nation.

    Join strategy by side size: region/nation/customer/supplier are
    dimension-sized -> broadcast sorted-array lookups folded into the
    fact scans (ray.put once, searchsorted per batch); ONLY
    orders ⋈ lineitem — the two fact tables — shuffles, partition
    count from parquet-footer row totals. Revenue is exact int64:
    rev_e4 = price_cents * (100 - discount_cents), so the grouped sum
    needs no float rounding at any corpus size."""
    from ..sources.testdata import table_rows

    # dimension chain: region -> ASIA nations -> (nationkey -> name)
    reg = read_table(sf, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"].to_numpy()
    nat = read_table(sf, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    nat = nat[nat["n_regionkey"].isin(rkey)]
    nat_keys = nat["n_nationkey"].to_numpy(np.int64)
    nat_names = nat["n_name"].to_numpy(object)

    # customer/supplier are SF-scaling: nation-filter them in the scan
    # and build the sorted (key -> nationkey) broadcasts IN A WORKER
    # with a loud bound (VERDICT r4 item 2 — no driver-side gathers).
    nat_set = pa.array(nat_keys, pa.int64())

    def _nat_filtered(table: str, key: str, natcol: str):
        return read_table(sf, table, [key, natcol]).map_batches(
            lambda t: pa.table(
                {
                    key: t[key],
                    natcol: pc.cast(t[natcol], pa.int64()),
                }
            ).filter(pc.is_in(pc.cast(t[natcol], pa.int64()), value_set=nat_set)),
            batch_format="pyarrow",
        )

    cref = dim_ref(_nat_filtered("customer", "c_custkey", "c_nationkey"), "c_custkey", ("c_nationkey",))
    sref = dim_ref(_nat_filtered("supplier", "s_suppkey", "s_nationkey"), "s_suppkey", ("s_nationkey",))

    lo_ts = pa.scalar(np.datetime64(lo, "us"))
    hi_ts = pa.scalar(np.datetime64(hi, "us"))
    orders = read_table(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def o_map(t: pa.Table) -> pa.Table:
        ks, vs = ray.get(cref)
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], lo_ts), pc.less(t["o_orderdate"], hi_ts)
            )
        )
        keys = t["o_custkey"].to_numpy()
        if len(ks) == 0 or t.num_rows == 0:
            hit = np.zeros(len(keys), bool)
            idx = np.zeros(len(keys), np.intp)
        else:
            idx = np.clip(np.searchsorted(ks, keys), 0, len(ks) - 1)
            hit = ks[idx] == keys
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].filter(pa.array(hit)),
                "c_nat": pa.array(vs[idx[hit]], pa.int64()),
            }
        )

    orders = orders.map_batches(o_map, batch_format="pyarrow")

    li = read_table(
        sf, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )

    def l_map(t: pa.Table) -> pa.Table:
        ks, vs = ray.get(sref)
        keys = t["l_suppkey"].to_numpy()
        if len(ks) == 0 or t.num_rows == 0:
            hit = np.zeros(len(keys), bool)
            idx = np.zeros(len(keys), np.intp)
        else:
            idx = np.clip(np.searchsorted(ks, keys), 0, len(ks) - 1)
            hit = ks[idx] == keys
        price_c = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].filter(pa.array(hit)),
                "s_nat": pa.array(vs[idx[hit]], pa.int64()),
                "rev_e4": pa.array(rev[hit]),
            }
        )

    li = li.map_batches(l_map, batch_format="pyarrow")

    j = shuffle_join(
        li, orders, "l_orderkey", "o_orderkey",
        num_partitions=_npart(table_rows(sf, "lineitem") + table_rows(sf, "orders")),
    )

    def local_only(t: pa.Table) -> pa.Table:
        m = pc.equal(t["s_nat"], t["c_nat"])
        t = t.filter(m)
        return pa.table({"nat": t["s_nat"], "rev_e4": t["rev_e4"]})

    j = j.map_batches(local_only, batch_format="pyarrow")
    agg = grouped_agg(j, ["nat"], [("revenue_e4", "sum", "rev_e4")], round_to=None)

    nref = ray.put((nat_keys, nat_names))

    def name(t: pa.Table) -> pa.Table:
        ks, names = ray.get(nref)
        pos = {int(k): n for k, n in zip(ks, names)}
        return pa.table(
            {
                "n_name": pa.array(
                    [pos[int(x)] for x in t["nat"].to_pylist()], pa.string()
                ),
                "revenue_e4": pa.array(
                    t["revenue_e4"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    return agg.map_batches(name, batch_format="pyarrow")


def q6_forecast_revenue(sf: str):
    """TPC-H Q6 shape — the scan-dominant filter + global aggregate:
    pruned 4-column read, per-block predicate + partial sum, one final
    add. Revenue is exact int64 (price_cents * discount_cents = 1e-4
    units); the discount predicate compares integer cents so there is
    no float-boundary ambiguity vs the oracle."""
    ds = read_table(
        sf, "lineitem", ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"]
    )
    lo = pa.scalar(np.datetime64("1996-01-01", "us"))
    hi = pa.scalar(np.datetime64("1997-01-01", "us"))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)
            )
        )
        disc_c = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        m = (disc_c >= 5) & (disc_c <= 7) & (t["l_quantity"].to_numpy() < 24.0)
        price_c = np.rint(t["l_extendedprice"].to_numpy()[m] * 100).astype(np.int64)
        rev = int((price_c * disc_c[m]).sum())
        return pa.table(
            {
                "revenue_e4": pa.array([rev], pa.int64()),
                "n": pa.array([int(m.sum())], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(
        parts.map_batches(
            lambda t: t.append_column("__g", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow",
        ),
        ["__g"],
        [("revenue_e4", "sum", "revenue_e4"), ("n", "sum", "n")],
        round_to=None,
    ).map_batches(
        lambda t: pa.table(
            {
                "revenue_e4": t["revenue_e4"].cast(pa.int64()),
                "n": t["n"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def j6_left_join(sf: str):
    """LEFT OUTER hash-shuffle join: every customer row survives, with
    its count of URGENT orders or 0 — the preserved-side join surface
    (j2 inner / j1 anti / j3 broadcast cover the other shapes). The
    right side pre-aggregates to custkey cardinality before the
    exchange, so the shuffle carries two int64 columns."""
    from ..sources.testdata import table_rows

    orders = read_table(sf, "orders", ["o_custkey", "o_orderpriority"])

    def urgent(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(["o_custkey"])

    counts = grouped_agg(
        orders.map_batches(urgent, batch_format="pyarrow"),
        ["o_custkey"],
        [("n", "count", None)],
        round_to=None,
    )
    cust = read_table(sf, "customer", ["c_custkey"])
    j = shuffle_join(
        cust, counts, "c_custkey", "o_custkey",
        num_partitions=_npart(table_rows(sf, "customer")),
        join_type="left_outer",
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n"] if "n" in t.column_names else pa.nulls(t.num_rows, pa.int64())
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "n_urgent": pc.fill_null(pc.cast(n, pa.int64()), 0),
            }
        )

    return j.map_batches(finalize, batch_format="pyarrow")


def j7_full_outer(sf: str):
    """FULL OUTER hash-shuffle join of two pre-aggregated sides:
    per-user event counts vs per-custkey URGENT-order counts. Exercises
    all three row classes (matched, left-only, right-only); Ray/acero
    coalesces the key columns, so the output key is never null. Both
    sides aggregate to key cardinality before the exchange."""
    ev = grouped_agg(
        read_table(sf, "events", ["user_id"]),
        ["user_id"],
        [("n_events", "count", None)],
        round_to=None,
    )
    orders = read_table(sf, "orders", ["o_custkey", "o_orderpriority"])

    def urgent(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(["o_custkey"])

    ou = grouped_agg(
        orders.map_batches(urgent, batch_format="pyarrow"),
        ["o_custkey"],
        [("n_urgent", "count", None)],
        round_to=None,
    )
    j = shuffle_join(ev, ou, "user_id", "o_custkey", join_type="full_outer")

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pc.cast(t["user_id"], pa.int64()),
                "n_events": pc.fill_null(pc.cast(t["n_events"], pa.int64()), 0),
                "n_urgent": pc.fill_null(pc.cast(t["n_urgent"], pa.int64()), 0),
            }
        )

    return j.map_batches(finalize, batch_format="pyarrow")


def q18_large_orders(sf: str, min_qty: int = 250):
    """TPC-H Q18 shape — HAVING over an aggregated fact feeding a
    semi-join back into the fact chain: lineitem pre-aggregates to
    per-order quantity (compact shuffle: two int64 columns), the
    HAVING filter shrinks it to the query-selective survivor set,
    which then broadcasts into the orders scan (searchsorted) and a
    dimension-sized customer-name lookup. Quantities are integral
    doubles, so the sums are exact int64."""
    li = read_table(sf, "lineitem", ["l_orderkey", "l_quantity"])
    per_order = grouped_agg(
        li, ["l_orderkey"], [("qty", "sum", "l_quantity")], round_to=None
    )

    def having(t: pa.Table) -> pa.Table:
        qty = np.rint(t["qty"].to_numpy(zero_copy_only=False).astype(np.float64)).astype(np.int64)
        m = qty > min_qty
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].filter(pa.array(m)),
                "qty": pa.array(qty[m]),
            }
        )

    # Both sides are SF-scaling ('big' is query-selective but unbounded
    # in principle; customer grows linearly with SF) — adaptive_dim_join
    # broadcasts each under 5M rows and hash-co-partitions above
    # (VERDICT r4 item 2: no unguarded driver .to_pandas() gathers).
    big = per_order.map_batches(having, batch_format="pyarrow")
    orders = read_table(sf, "orders", ["o_orderkey", "o_custkey"])
    j = adaptive_dim_join(orders, "o_orderkey", big, "l_orderkey", ["qty"])
    out = adaptive_dim_join(
        j,
        "o_custkey",
        read_table(sf, "customer", ["c_custkey", "c_name"]),
        "c_custkey",
        ["c_name"],
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "c_name": t["c_name"],
                "o_orderkey": t["o_orderkey"],
                "qty": t["qty"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def g11_pivot(sf: str):
    """Pivot via conditional aggregation: per l_returnflag, one count +
    one exact-cents revenue column per l_linestatus value ('F'/'O') —
    the SUM(CASE WHEN ...) shape. The conditionals vectorize in the
    scan; the groupby then carries 4 pre-aggregated numbers per key."""
    ds = read_table(sf, "lineitem", ["l_returnflag", "l_linestatus", "l_extendedprice"])

    def cond(t: pa.Table) -> pa.Table:
        is_f = pc.equal(t["l_linestatus"], "F").to_numpy(zero_copy_only=False)
        price_c = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n_f": pa.array(is_f.astype(np.int64)),
                "n_o": pa.array((~is_f).astype(np.int64)),
                "price_f_c": pa.array(np.where(is_f, price_c, 0)),
                "price_o_c": pa.array(np.where(is_f, 0, price_c)),
            }
        )

    return grouped_agg(
        ds.map_batches(cond, batch_format="pyarrow"),
        ["l_returnflag"],
        [
            ("n_f", "sum", "n_f"),
            ("n_o", "sum", "n_o"),
            ("price_f_c", "sum", "price_f_c"),
            ("price_o_c", "sum", "price_o_c"),
        ],
        round_to=None,
    ).map_batches(
        lambda t: pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "n_f": t["n_f"].cast(pa.int64()),
                "n_o": t["n_o"].cast(pa.int64()),
                "price_f_c": t["price_f_c"].cast(pa.int64()),
                "price_o_c": t["price_o_c"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def w7_lag_delta(sf: str):
    """LAG window function: per-user delta (microseconds) between
    consecutive events ordered by (ts, event_id); first event per user
    gets -1 (sentinel instead of NULL so the hash compare is
    null-free). Same partition-vectorized shape as w2/w4: one sort +
    one diff per PARTITION, never per key."""
    ds = read_table(sf, "events", ["event_id", "user_id", "ts"])

    def lag_part(t: pa.Table) -> pa.Table:
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
            )
        )
        uid = t["user_id"].to_numpy()
        ts = t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        starts = np.r_[True, uid[1:] != uid[:-1]]
        delta = np.r_[np.int64(0), np.diff(ts)]
        delta[starts] = -1
        return pa.table({"event_id": t["event_id"], "delta_us": pa.array(delta)})

    return _hash_partitioned(ds, "user_id", _npart()).map_groups(
        lag_part, batch_format="pyarrow"
    )


def g3_distinct(sf: str):
    ds = read_table(sf, "customer", ["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(vals, pa.string())})


def j2_inner_join(sf: str):
    """Hash shuffle join (both sides large): orders ⋈ customer.
    Partition count sized to the input rows (parquet footer metadata)."""
    from ..sources.testdata import table_rows

    orders = read_table(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = read_table(sf, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    nparts = _npart(table_rows(sf, "orders") + table_rows(sf, "customer"))
    j = orders.join(
        cust, join_type="inner", num_partitions=nparts, on=("o_custkey",), right_on=("c_custkey",)
    )
    j = j.select_columns(["o_orderkey", "c_name", "c_mktsegment", "o_totalprice"])
    return _cents_cols(j, {"o_totalprice": "totalprice_c"})


def j1_anti_join(sf: str, broadcast_max: int = 5_000_000):
    """Customers with no high-value (>400k) orders — the adaptive
    anti-join: the filtered order-key set is customer-bounded here so
    the broadcast path fires (sorted key array in the object store,
    probe streams; no shuffle), but a low-selectivity predicate at
    100x data switches to the hash-co-partitioned left_outer +
    null-filter path instead of OOMing the driver (round-3 review:
    the old .unique() gathered an unbounded key set). Both paths are
    equality-tested in tests/test_scale_paths.py."""
    orders = read_table(sf, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 400000.0)).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    cust = read_table(sf, "customer", ["c_custkey", "c_name"])
    return adaptive_semi_filter(
        cust, orders, "c_custkey", "o_custkey", anti=True, broadcast_max=broadcast_max
    )


def j3_broadcast_lookup(sf: str):
    """Small-side broadcast lookup join: lineitem -> supplier nation,
    then grouped count (dimension table via ray.put, read per batch)."""
    # broadcast two sorted parallel arrays (built in a worker, loud
    # 50M bound — VERDICT r4 item 2); probe with searchsorted — no
    # per-row dict lookups in the hot path of the biggest table
    ref = dim_ref(
        read_table(sf, "supplier", ["s_suppkey", "s_nationkey"]),
        "s_suppkey",
        ("s_nationkey",),
    )
    li = read_table(sf, "lineitem", ["l_suppkey"])

    def lookup(t: pa.Table) -> pa.Table:
        ks, vs = ray.get(ref)
        keys = t["l_suppkey"].to_numpy()
        idx = np.clip(np.searchsorted(ks, keys), 0, len(ks) - 1)
        nk = np.where(ks[idx] == keys, vs[idx], np.int32(-1)).astype(np.int32)
        return pa.table({"nationkey": pa.array(nk, pa.int32())})

    ds = li.map_batches(lookup, batch_format="pyarrow")
    return grouped_agg(ds, ["nationkey"], [("n", "count", None)])


@ray.remote(num_cpus=1)
def _build_bcast_index(key: str, *blocks):
    """Build-side index for the broadcast join: sorted key array +
    payload table reordered to match. Unique-key (dimension) semantics
    enforced — duplicate build keys fail loudly rather than silently
    dropping matches."""
    t = pa.concat_tables(blocks).combine_chunks()
    if t.num_rows == 0:
        # empty build side — a row-filter that dropped every row can
        # even leave a schema-less block (no columns); the probe's
        # empty branch only needs the payload schema, if any
        return np.zeros(0, np.int64), t
    k = t[key].to_numpy()
    order = np.argsort(k, kind="stable")
    ks = k[order]
    if len(ks) > 1 and (np.diff(ks) == 0).any():
        raise ValueError("broadcast join build side has duplicate keys")
    return ks, t.take(pa.array(order))


def adaptive_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str,
    broadcast_max: int = 1_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Size-based join strategy selection (inner, unique build keys):
    when the build side fits under ``broadcast_max`` rows it becomes an
    object-store index probed with ONE searchsorted + take per batch —
    no shuffle at all; above it the hash shuffle join takes over. The
    probe side streams either way — at 100 TB this is the difference
    between a dimension join that never moves the fact table and one
    that exchanges every block."""
    blocks = right.materialize().to_arrow_refs()
    counts = ray.get([_count_rows_ref.remote(b) for b in blocks])
    n = sum(counts)
    if n <= broadcast_max:
        # keep one (possibly empty) block when every block is empty so
        # the index task still sees the build schema — concat_tables of
        # zero tables raises ArrowInvalid in the worker otherwise
        nz = [b for b, c in zip(blocks, counts) if c > 0] or list(blocks[:1])
        if not nz:
            return left.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
        ref = _build_bcast_index.remote(right_on, *nz)

        def probe(t: pa.Table) -> pa.Table:
            ks, payload = ray.get(ref)
            k = t[on].to_numpy()
            if len(ks) == 0:
                t = t.slice(0, 0)
                for name in payload.column_names:
                    if name != right_on:
                        t = t.append_column(name, payload[name].slice(0, 0))
                return t
            idx = np.clip(np.searchsorted(ks, k), 0, len(ks) - 1)
            m = ks[idx] == k
            t = t.filter(pa.array(m))
            rows = payload.take(pa.array(idx[m]))
            for name in payload.column_names:
                if name != right_on:
                    t = t.append_column(name, rows[name])
            return t

        return left.map_batches(probe, batch_format="pyarrow")
    right_ne = ray.data.from_arrow_refs(
        [b for b, c in zip(blocks, counts) if c > 0] or list(blocks[:1])
    )
    return _nonempty(left).join(
        right_ne, join_type="inner", num_partitions=num_partitions or _npart(),
        on=(on,), right_on=(right_on,),
    )


def j5_adaptive_join(sf: str, broadcast_max: int = 1_000_000):
    """Fact ⋈ dimension through the adaptive strategy (supplier fits →
    broadcast path; broadcast_max=0 forces the shuffle path — the paths
    are equality-tested in pytest)."""
    li = read_table(sf, "lineitem", ["l_orderkey", "l_linenumber", "l_suppkey"])
    supp = read_table(sf, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
    j = adaptive_join(li, supp, "l_suppkey", "s_suppkey", broadcast_max=broadcast_max)
    out = j.map_batches(
        lambda t: t.select(["l_orderkey", "l_linenumber", "s_nationkey", "s_acctbal"]),
        batch_format="pyarrow",
    )
    return _cents_cols(out, {"s_acctbal": "acctbal_c"})


@ray.remote(num_cpus=1)
def _topk_finalize(sort_keys: list, k: int, *blocks):
    t = pa.concat_tables(blocks).combine_chunks()
    idx = pc.sort_indices(t, sort_keys=sort_keys)
    return t.take(idx.slice(0, k))


def topk(
    ds: ray.data.Dataset, cols: list[str], descending: list[bool], k: int
) -> ray.data.Dataset:
    """Distributed top-k WITHOUT a global sort (VERDICT r4 item 4: a
    range-partitioned sort is an all-to-all shuffle of the whole input
    to keep k rows). Per-block partial top-k combiner — each block
    emits at most k rows — then ONE k·blocks-row finalize task. The
    sort keys must be a total order for a deterministic boundary."""
    sort_keys = [
        (c, "descending" if d else "ascending") for c, d in zip(cols, descending)
    ]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        return t.take(idx.slice(0, k))

    parts = ds.map_batches(partial, batch_format="pyarrow")
    refs = parts.materialize().to_arrow_refs()
    return ray.data.from_arrow_refs([_topk_finalize.remote(sort_keys, k, *refs)])


def o2_topk(sf: str):
    ds = read_table(sf, "customer", ["c_custkey", "c_name", "c_acctbal"])
    top = topk(ds, ["c_acctbal", "c_custkey"], [True, False], 10)
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


def _collapse_dup_winners(kept, key: str, cols: list[str], driver_max: int = 5_000_000):
    """Collapse exact-duplicate winner rows after a min-set filter:
    driver-side sorted distinct while the kept set fits (result-sized —
    one-ish row per group), else a grouped Min over the non-key columns
    (valid because surviving rows within a group are identical)."""
    parts, n, small = [], 0, True
    for b in kept.iter_batches(batch_format="pyarrow", batch_size=262144):
        n += b.num_rows
        if n > driver_max:
            small = False
            break
        parts.append(b)
    if small:
        if not parts:
            return kept.materialize()
        t = pa.concat_tables(parts).combine_chunks()
        t = t.take(pc.sort_indices(t, sort_keys=[(c, "ascending") for c in cols]))
        k = t[key].combine_chunks()
        neq = pc.not_equal(k.slice(1), k.slice(0, len(k) - 1)).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.r_[True, neq]))
    aggs = [Min(c, alias_name=c) for c in cols if c != key]
    out = kept.groupby(key).aggregate(*aggs).select_columns(cols)
    # grouped Min widens int32 -> int64; cast back to the input schema
    in_schema = kept.schema().base_schema
    target = pa.schema([in_schema.field(c) for c in cols])
    return out.map_batches(
        lambda t: t.select(cols).cast(target), batch_format="pyarrow"
    )


def g8_approx_quantile(sf: str, q: float = 0.5, n_buckets: int = 4096):
    """APPROXIMATE grouped quantile — the mergeable-sketch scale path
    complementing g6's exact median (HLL:distinct :: histogram:
    quantile). Two streaming passes: (1) per-batch (group, min, max)
    partials -> global range per group in one task; (2) per-batch
    equi-width bucket counts -> merged histogram -> quantile read off
    the cumulative counts. Deterministic; absolute error <= range /
    n_buckets (pytest-checked vs exact). No SQL oracle by design."""
    ds = read_table(sf, "lineitem", ["l_returnflag", "l_extendedprice"])

    def ranges(t: pa.Table) -> pa.Table:
        out = (
            pa.table({"g": t["l_returnflag"], "v": t["l_extendedprice"]})
            .group_by(["g"])
            .aggregate([("v", "min"), ("v", "max")])
        )
        # select BY NAME before renaming (pyarrow group_by column order
        # is version-dependent: keys-first vs aggregates-first)
        return out.select(["g", "v_min", "v_max"]).rename_columns(["g", "lo", "hi"])

    rng: dict[str, tuple[float, float]] = {}
    for b in ds.map_batches(ranges, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=65536
    ):
        for g, lo, hi in zip(b["g"].to_pylist(), b["lo"].to_pylist(), b["hi"].to_pylist()):
            cur = rng.get(g)
            rng[g] = (lo, hi) if cur is None else (min(cur[0], lo), max(cur[1], hi))
    groups = sorted(rng)
    lo = np.array([rng[g][0] for g in groups])
    width = np.array([max(rng[g][1] - rng[g][0], 1e-12) for g in groups])
    gref = ray.put((np.array(groups, dtype=object), lo, width))

    def hist(t: pa.Table) -> pa.Table:
        gs, lo_, w_ = ray.get(gref)
        gv = np.asarray(t["l_returnflag"].to_pylist(), dtype=object)
        v = t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        gi = np.searchsorted(gs, gv)
        bk = np.clip(((v - lo_[gi]) / w_[gi] * n_buckets).astype(np.int64), 0, n_buckets - 1)
        key = gi * n_buckets + bk
        cnt = np.bincount(key, minlength=len(gs) * n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table({"key": pa.array(nz), "n": pa.array(cnt[nz], pa.int64())})

    acc = None
    for b in ds.map_batches(hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=262144
    ):
        if acc is None:
            acc = np.zeros(len(groups) * n_buckets, np.int64)
        np.add.at(acc, b["key"].to_numpy(), b["n"].to_numpy())
    out_g, out_q = [], []
    if acc is not None:
        for i, g in enumerate(groups):
            h = acc[i * n_buckets : (i + 1) * n_buckets]
            total = h.sum()
            if total == 0:
                continue
            target = q * total
            cum = np.cumsum(h)
            bidx = int(np.searchsorted(cum, target, side="left"))
            est = lo[i] + (bidx + 0.5) / n_buckets * width[i]
            out_g.append(g)
            out_q.append(round(float(est), 2))
    return pa.table(
        {
            "l_returnflag": pa.array(out_g, pa.string()),
            "approx_quantile": pa.array(out_q, pa.float64()),
        }
    )


def g20_quantile_hist(sf: str, q_num: int = 1, q_den: int = 2, n_buckets: int = 4096):
    """g8's error-bound CONTRACT made driver-checkable (the g18 trick,
    VERDICT r3 item 7): the same two-pass equi-width histogram
    quantile, but in the exact-integer cents domain with a RATIONAL
    quantile q = q_num/q_den, so every step — bucket index
    min((v-lo)*B // wd, B-1), rank (q_num*n + q_den - 1) // q_den,
    estimate lo + (bkt+1)*wd // B — is integer arithmetic DuckDB
    reproduces bit-for-bit (nonnegative domain: numpy floor-div ==
    SQL integer div). The histogram sketch itself is thereby
    hash-checked, not just bounded; the error bound |est - exact| <=
    wd // B + 1 cents is additionally pytest-asserted vs the exact
    quantile."""
    ds = read_table(sf, "lineitem", ["l_returnflag", "l_extendedprice"])

    def cents(t: pa.Table) -> pa.Table:
        v = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"g": t["l_returnflag"], "v": pa.array(v)})

    cds = ds.map_batches(cents, batch_format="pyarrow")

    def ranges(t: pa.Table) -> pa.Table:
        out = t.group_by(["g"]).aggregate([("v", "min"), ("v", "max"), ("v", "count")])
        return out.select(["g", "v_min", "v_max", "v_count"])

    rng: dict[str, list[int]] = {}
    for b in cds.map_batches(ranges, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=65536
    ):
        for g, lo, hi, n in zip(
            b["g"].to_pylist(), b["v_min"].to_pylist(), b["v_max"].to_pylist(), b["v_count"].to_pylist()
        ):
            cur = rng.get(g)
            if cur is None:
                rng[g] = [lo, hi, n]
            else:
                cur[0], cur[1], cur[2] = min(cur[0], lo), max(cur[1], hi), cur[2] + n
    groups = sorted(rng)
    lo = np.array([rng[g][0] for g in groups], np.int64)
    wd = np.array([max(rng[g][1] - rng[g][0], 1) for g in groups], np.int64)
    n_per = np.array([rng[g][2] for g in groups], np.int64)
    gref = ray.put((np.array(groups, dtype=object), lo, wd))

    def hist(t: pa.Table) -> pa.Table:
        gs, lo_, w_ = ray.get(gref)
        gv = np.asarray(t["g"].to_pylist(), dtype=object)
        v = t["v"].to_numpy()
        gi = np.searchsorted(gs, gv)
        bk = np.minimum((v - lo_[gi]) * n_buckets // w_[gi], n_buckets - 1)
        key = gi * n_buckets + bk
        cnt = np.bincount(key, minlength=len(gs) * n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table({"key": pa.array(nz), "n": pa.array(cnt[nz], pa.int64())})

    acc = np.zeros(len(groups) * n_buckets, np.int64)
    for b in cds.map_batches(hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=262144
    ):
        np.add.at(acc, b["key"].to_numpy(), b["n"].to_numpy())
    out_g, out_e = [], []
    for i, g in enumerate(groups):
        h = acc[i * n_buckets : (i + 1) * n_buckets]
        rank = (q_num * int(n_per[i]) + q_den - 1) // q_den
        cum = np.cumsum(h)
        bidx = int(np.searchsorted(cum, rank, side="left"))
        out_g.append(g)
        out_e.append(int(lo[i]) + (bidx + 1) * int(wd[i]) // n_buckets)
    return pa.table(
        {
            "l_returnflag": pa.array(out_g, pa.string()),
            "q_est_c": pa.array(out_e, pa.int64()),
        }
    )


def g20_quantile_hist_sql(q_num: int = 1, q_den: int = 2, n_buckets: int = 4096) -> str:
    """DuckDB mirror of g20_quantile_hist — same integer pipeline."""
    return (
        "WITH c AS (SELECT l_returnflag AS g, CAST(ROUND(l_extendedprice*100,0) AS BIGINT) AS v FROM lineitem), "
        "r AS (SELECT g, MIN(v) AS lo, GREATEST(MAX(v) - MIN(v), 1) AS wd, COUNT(*) AS n FROM c GROUP BY g), "
        f"b AS (SELECT c.g, LEAST(((c.v - r.lo) * {n_buckets}) // r.wd, {n_buckets - 1}) AS bkt "
        "FROM c JOIN r ON c.g = r.g), "
        "h AS (SELECT g, bkt, COUNT(*) AS cnt FROM b GROUP BY g, bkt), "
        "cum AS (SELECT g, bkt, SUM(cnt) OVER (PARTITION BY g ORDER BY bkt) AS cm FROM h), "
        f"pick AS (SELECT cum.g, MIN(bkt) AS bkt FROM cum JOIN r ON cum.g = r.g "
        f"WHERE cum.cm >= ({q_num} * r.n + {q_den - 1}) // {q_den} GROUP BY cum.g) "
        f"SELECT pick.g AS l_returnflag, CAST(r.lo + ((pick.bkt + 1) * r.wd) // {n_buckets} AS BIGINT) AS q_est_c "
        "FROM pick JOIN r ON pick.g = r.g"
    )


def g9_count_distinct(sf: str):
    """COUNT(DISTINCT l_partkey) GROUP BY l_returnflag — exact, as two
    pre-aggregated levels: per-batch distinct (flag, partkey) pairs
    (pyarrow group_by), a grouped distinct over the pairs, then a
    per-flag count. The shuffle carries distinct pairs, not rows."""
    from ray.data.aggregate import Count

    ds = read_table(sf, "lineitem", ["l_returnflag", "l_partkey"])

    def pairs(t: pa.Table) -> pa.Table:
        return (
            pa.table({"f": t["l_returnflag"], "p": t["l_partkey"]})
            .group_by(["f", "p"])
            .aggregate([])
        )

    distinct = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby(["f", "p"])
        .aggregate(Count(alias_name="__c"))
    )
    out = distinct.groupby("f").aggregate(Count(alias_name="n_parts"))
    return out.map_batches(
        lambda t: t.rename_columns(["l_returnflag", "n_parts"]), batch_format="pyarrow"
    )


def m14_regex_extract(sf: str):
    """Vectorized regex extraction (pc.extract_regex — Arrow's RE2, the
    same engine DuckDB uses, so the oracle computes identical groups):
    split p_name's first two words."""
    ds = read_table(sf, "part", ["p_partkey", "p_name"])
    pat = r"^(?P<w1>\w+) (?P<w2>\w+)"

    def f(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["p_name"], pattern=pat)
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "w1": pc.struct_field(ex, "w1"),
                "w2": pc.struct_field(ex, "w2"),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def g7_rollup(sf: str):
    """ROLLUP(returnflag, linestatus) over count + sum(quantity):
    three grouped_agg passes (detail, per-flag subtotal, grand total)
    unioned, NULL-marked levels as '' (DuckDB rollup emits NULLs; both
    sides COALESCE to '' so the hash compares). Each pass is the
    pre-aggregated combiner shuffle — a rollup at 100 TB is three
    small shuffles over partial rows, not three scans (the partials
    could be shared; at these sizes the re-scan is cheaper than
    materializing them)."""
    cols = ["l_returnflag", "l_linestatus", "l_quantity"]
    spec = [("n", "count", None), ("sum_qty", "sum", "l_quantity")]

    detail = grouped_agg(read_table(sf, "lineitem", cols), ["l_returnflag", "l_linestatus"], spec)
    byflag = grouped_agg(read_table(sf, "lineitem", cols), ["l_returnflag"], spec)
    total = grouped_agg(
        read_table(sf, "lineitem", cols).map_batches(
            lambda t: t.append_column("__all", pa.array(np.zeros(t.num_rows, np.int32))),
            batch_format="pyarrow",
        ),
        ["__all"],
        spec,
    )

    def lift_flag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": pa.array([""] * t.num_rows, pa.string()),
                "n": t["n"],
                "sum_qty": t["sum_qty"],
            }
        )

    def lift_total(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": pa.array([""] * t.num_rows, pa.string()),
                "l_linestatus": pa.array([""] * t.num_rows, pa.string()),
                "n": t["n"],
                "sum_qty": t["sum_qty"],
            }
        )

    return detail.select_columns(["l_returnflag", "l_linestatus", "n", "sum_qty"]).union(
        byflag.map_batches(lift_flag, batch_format="pyarrow"),
        total.map_batches(lift_total, batch_format="pyarrow"),
    )


def d6_intersect(sf: str):
    """INTERSECT: BUILDING custkeys that also have open orders —
    broadcast semi filter + distinct (the dual of d5's EXCEPT)."""
    ref = broadcast_sorted_keys(
        read_table(sf, "orders", ["o_custkey", "o_orderstatus"]).map_batches(
            lambda t: t.filter(pc.equal(t["o_orderstatus"], "O")).select(["o_custkey"]),
            batch_format="pyarrow",
        ),
        "o_custkey",
    )
    cust = read_table(sf, "customer", ["c_custkey", "c_mktsegment"])

    def semi(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        keep = ray.get(ref)
        return t.select(["c_custkey"]).filter(
            pa.array(np.isin(t["c_custkey"].to_numpy(), keep))
        )

    out = cust.map_batches(semi, batch_format="pyarrow")
    return _distinct_sorted(out, "c_custkey")


def o5_topk_per_group(sf: str, k: int = 3):
    """Grouped top-k (the ROW_NUMBER()<=k window shape): top-k
    lineitems per order by (extendedprice desc, linenumber asc).
    Hash-partition by the group key, then ONE vectorized sort +
    run-position pass per partition — the same combiner arithmetic as
    the crawl's politeness top-B, exposed as a relational operator."""
    ds = read_table(sf, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])

    def topk_part(t: pa.Table) -> pa.Table:
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("l_orderkey", "ascending"),
                    ("l_extendedprice", "descending"),
                    ("l_linenumber", "ascending"),
                ],
            )
        )
        key = t["l_orderkey"].to_numpy()
        starts = np.r_[True, key[1:] != key[:-1]]
        gid = np.cumsum(starts) - 1
        pos = np.arange(len(key)) - np.flatnonzero(starts)[gid]
        t = t.filter(pa.array(pos < k))
        price_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "price_c": pa.array(price_c),
            }
        )

    return _hash_partitioned(ds, "l_orderkey", _npart()).map_groups(
        topk_part, batch_format="pyarrow"
    )


def g6_grouped_median(sf: str):
    """Exact grouped median (quantile_cont 0.5) of l_quantity per
    returnflag — per partition: one sort, segment boundaries, the two
    middle order statistics per segment averaged (DuckDB median
    semantics); centi-unit output. At 100 TB an exact grouped median
    needs a per-group sort anyway (hash-partition co-locates groups);
    the approximate path is a t-digest-style sketch."""
    ds = read_table(sf, "lineitem", ["l_returnflag", "l_quantity"])

    # returnflag is a string; partition on a DETERMINISTIC int digest
    # (builtin hash() is per-process salted — rows of one flag would
    # scatter across partitions and emit several medians per flag)
    import hashlib as _hl

    def with_key(t: pa.Table) -> pa.Table:
        h = np.array(
            [
                int.from_bytes(_hl.md5(s.encode()).digest()[:4], "big")
                for s in t["l_returnflag"].to_pylist()
            ],
            np.int64,
        )
        return t.append_column("__k", pa.array(h))

    def med_part(t: pa.Table) -> pa.Table:
        t = t.take(
            pc.sort_indices(
                t, sort_keys=[("l_returnflag", "ascending"), ("l_quantity", "ascending")]
            )
        )
        flag = np.asarray(t["l_returnflag"].to_pylist(), dtype=object)
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        starts = np.r_[True, flag[1:] != flag[:-1]]
        sp = np.flatnonzero(starts)
        ends = np.r_[sp[1:], len(flag)]
        out_f, out_m = [], []
        for lo, hi in zip(sp, ends):
            n = hi - lo
            mid = lo + (n - 1) // 2
            med = q[mid] if n % 2 else (q[mid] + q[mid + 1]) / 2.0
            out_f.append(flag[lo])
            out_m.append(int(np.rint(med * 100)))
        return pa.table(
            {
                "l_returnflag": pa.array(out_f, pa.string()),
                "median_qty_c": pa.array(out_m, pa.int64()),
            }
        )

    parted = ds.map_batches(with_key, batch_format="pyarrow")
    return (
        parted.groupby("__k")
        .map_groups(med_part, batch_format="pyarrow")
    )


def d1_first_by_key(sf: str, driver_max: int = 5_000_000):
    """First lineitem row per order by (linenumber, partkey) — D1
    first-by-key. The within-group order column u = ln*2^32 + pk never
    packs the group key (the min-set filter matches on (key, u) pairs),
    so there is no okey-width overflow at any scale factor; bounds on
    ln/pk themselves are asserted. The broadcast filter can keep several
    *identical* winners per group (exact-duplicate rows); the collapse
    is size-guarded (driver distinct -> grouped-Min fallback)."""
    ds = read_table(sf, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"])

    def pack(t: pa.Table) -> pa.Table:
        ln = t["l_linenumber"].to_numpy().astype(np.int64)
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        if len(ln) and (ln.max() >= (1 << 31) or pk.max() >= (1 << 32)):
            raise ValueError("d1 pack bounds exceeded: ln >= 2^31 or pk >= 2^32")
        return t.append_column("__u", pa.array(ln * (1 << 32) + pk, pa.int64()))

    ds = ds.map_batches(pack, batch_format="pyarrow")
    kept = _min_set_filter(ds, "l_orderkey", "__u", driver_max=driver_max).drop_columns(["__u"])
    return _collapse_dup_winners(
        kept, "l_orderkey", ["l_orderkey", "l_linenumber", "l_partkey"], driver_max=driver_max
    )


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
    ref = broadcast_sorted_keys(
        read_table(sf, "orders", ["o_custkey", "o_orderstatus"]).map_batches(
            lambda t: t.filter(pc.equal(t["o_orderstatus"], "O")).select(["o_custkey"]),
            batch_format="pyarrow",
        ),
        "o_custkey",
    )
    cust = read_table(sf, "customer", ["c_custkey", "c_mktsegment"])

    def ex(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        drop = ray.get(ref)
        return t.select(["c_custkey"]).filter(
            pa.array(~np.isin(t["c_custkey"].to_numpy(), drop))
        )

    out = cust.map_batches(ex, batch_format="pyarrow")
    return _distinct_sorted(out, "c_custkey")


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


def m15_token_explode(sf: str):
    """flat_map surface: part names explode into (word, count) — one
    row in, many rows out, then a pre-aggregated grouped count (the
    word-count shape). Vectorized: one split_pattern + list flatten
    per batch, no per-row Python."""
    ds = read_table(sf, "part", ["p_name"])

    def explode(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t["p_name"], " "))
        return pa.table({"word": words})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    return grouped_agg(exploded, ["word"], [("n", "count", None)])


def g10_mode(sf: str):
    """Grouped MODE with deterministic ties (most frequent l_shipdate
    day per returnflag; smallest day wins a count tie): a grouped count
    then one vectorized arg-max pass per partition — the two-level
    aggregate shape (count per (g, v), then max per g)."""
    ds = read_table(sf, "lineitem", ["l_returnflag", "l_shipdate"])

    def day(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "day": pc.strftime(t["l_shipdate"], format="%Y-%m-%d"),
            }
        )

    counts = grouped_agg(
        ds.map_batches(day, batch_format="pyarrow"),
        ["l_returnflag", "day"],
        [("n", "count", None)],
    )

    def pick(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        df = df.sort_values(["l_returnflag", "n", "day"], ascending=[True, False, True])
        top = df.groupby("l_returnflag", as_index=False).first()
        return pa.table(
            {
                "l_returnflag": pa.array(top["l_returnflag"], pa.string()),
                "mode_day": pa.array(top["day"], pa.string()),
                "n": pa.array(top["n"].astype(np.int64)),
            }
        )

    # the (g, v) count table is group-cardinality-sized; finalize in one
    # task (the same adaptive rationale as grouped_agg's small path)
    t = pa.concat_tables(
        list(counts.iter_batches(batch_format="pyarrow", batch_size=65536))
        or [pa.table({"l_returnflag": pa.array([], pa.string()),
                      "day": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})]
    )
    return pick(t)


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


def w6_hopping_window(sf: str, size_min: int = 60, hop_min: int = 30):
    """Hopping (sliding) window aggregate — each event lands in
    size/hop = 2 overlapping windows: per (user, window_start) count +
    sum(value). The streaming shape: one map_batches EXPLODES each
    event into its size/hop window memberships (vectorized epoch
    arithmetic, no per-row Python), then the same pre-aggregated
    groupby as the tumbling case. Distinct from w1: overlap means the
    output is NOT a partition of the input."""
    ds = read_table(sf, "events", ["user_id", "ts", "value"])
    n_hops = size_min // hop_min
    hop_us = np.int64(hop_min * 60 * 1_000_000)

    def explode(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = t["user_id"].to_numpy()
        val = t["value"].to_numpy()
        cur = (us // hop_us) * hop_us  # most recent hop boundary <= ts
        starts = [cur - j * hop_us for j in range(n_hops)]
        ws = np.concatenate(starts)
        return pa.table(
            {
                "user_id": pa.array(np.tile(uid, n_hops)),
                "window_start": pa.array(
                    ws.astype("datetime64[us]"), pa.timestamp("us")
                ),
                "value": pa.array(np.tile(val, n_hops)),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    exploded = exploded.map_batches(
        lambda t: pa.table(
            {
                "user_id": t["user_id"],
                # cast to seconds precision first: Arrow's %S appends
                # fractional digits for sub-second timestamp types
                "window_start": pc.strftime(
                    t["window_start"].cast(pa.timestamp("s")),
                    format="%Y-%m-%d %H:%M:%S",
                ),
                "value": t["value"],
            }
        ),
        batch_format="pyarrow",
    )
    return grouped_agg(
        exploded,
        ["user_id", "window_start"],
        [("n", "count", None), ("sum_value", "sum", "value")],
    )


def _hash_partitioned(ds, key: str, n_parts: int):
    """Attach a hash-partition column so a downstream groupby("__part")
    makes ONE vectorized Python call per partition instead of one per
    key value — the per-group overhead at billions of keys is the scale
    killer, not the arithmetic (a skewed key still lands whole in one
    partition, where the work stays vectorized)."""

    def addpart(t: pa.Table) -> pa.Table:
        # Fibonacci multiplicative hash: adjacent user_ids spread
        p = ((t[key].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(48)) % np.uint64(n_parts)
        return t.append_column("__part", pa.array(p.astype(np.int32)))

    return ds.map_batches(addpart, batch_format="pyarrow").groupby("__part")


def key_hash_u64(t: pa.Table, cols: list[str]) -> np.ndarray:
    """Vectorized uint64 hash of one or more key columns for hash
    partitioning — int (any width), fixed_size_binary, string/binary.
    Only CONSISTENCY matters (equal keys -> equal hash on every worker);
    per-column features (ints: the value; fixed binary: first 16 bytes;
    var-width: length + first 8 + last 8 bytes) are splitmix64-mixed so
    partition balance survives common prefixes (URLs). Nulls hash as 0.
    All gathers are numpy fancy-indexing over the raw Arrow buffers —
    no per-row Python."""
    from ..functions.hll import _GOLD, _mix64

    n = t.num_rows
    if n == 0:
        return np.zeros(0, np.uint64)
    acc = np.full(n, np.uint64(0x243F6A8885A308D3), np.uint64)
    with np.errstate(over="ignore"):
        for c in cols:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            typ = col.type
            if pa.types.is_integer(typ):
                h = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            elif pa.types.is_fixed_size_binary(typ):
                w = typ.byte_width
                raw = np.frombuffer(col.buffers()[1], np.uint8)
                data = raw[col.offset * w : (col.offset + n) * w].reshape(n, w)
                h = np.zeros(n, np.uint64)
                for j in range(0, min(w, 16), 8):
                    blk = data[:, j : j + 8]
                    if blk.shape[1] < 8:
                        blk = np.hstack([blk, np.zeros((n, 8 - blk.shape[1]), np.uint8)])
                    h = _mix64(h ^ np.ascontiguousarray(blk).view(np.uint64).ravel())
            elif pa.types.is_string(typ) or pa.types.is_binary(typ) or pa.types.is_large_string(typ) or pa.types.is_large_binary(typ):
                odt = np.int64 if (pa.types.is_large_string(typ) or pa.types.is_large_binary(typ)) else np.int32
                off = np.frombuffer(col.buffers()[1], odt)[col.offset : col.offset + n + 1].astype(np.int64)
                data = np.frombuffer(col.buffers()[2], np.uint8)
                lens = off[1:] - off[:-1]
                hi = np.maximum(len(data) - 1, 0)

                def fold8(starts: np.ndarray) -> np.ndarray:
                    idx = starts[:, None] + np.arange(8)
                    valid = idx < off[1:, None]
                    g = np.where(valid, data[np.minimum(idx, hi)] if len(data) else 0, 0)
                    return np.ascontiguousarray(g.astype(np.uint8)).view(np.uint64).ravel()

                head = fold8(off[:-1])
                tail = fold8(np.maximum(off[1:] - 8, off[:-1]))
                # interior windows (1/4, 1/2, 3/4 of each value) so
                # same-length strings differing only between head and
                # tail (templated URLs with fixed-width ids:
                # /item/<id>/view) don't systematically collide and
                # collapse the co-partitioned scale paths onto one
                # partition (ADVICE r4). 5 windows x 8 bytes = full
                # coverage of values up to ~40 bytes and 32 sampled
                # bytes of anything longer.
                h = _mix64(_mix64(lens.view(np.uint64) * _GOLD) ^ head)
                for frac_num, frac_den in ((1, 4), (1, 2), (3, 4)):
                    win = fold8(
                        np.maximum(off[:-1] + (lens * frac_num) // frac_den - 4, off[:-1])
                    )
                    h = _mix64(h ^ win)
                h = _mix64(h ^ tail)
            else:
                raise TypeError(f"key_hash_u64: unsupported key type {typ} for {c}")
            if col.null_count:
                h = np.where(col.is_null().to_numpy(zero_copy_only=False), np.uint64(0), h)
            acc = _mix64(acc ^ h)
    return acc


def _hash_partitioned_any(ds, cols: list[str], n_parts: int):
    """``_hash_partitioned`` generalized to composite / non-integer
    keys: appends ``__part`` = key_hash_u64 % n_parts and returns the
    groupby — the scale path for dedup/semi-join where all rows of one
    key must co-locate without any driver-side key gather. map_groups
    callbacks see one whole partition per call (vectorized work), not
    one group per key."""

    def addpart(t: pa.Table) -> pa.Table:
        p = key_hash_u64(t, cols) % np.uint64(n_parts)
        return t.append_column("__part", pa.array(p.astype(np.int32)))

    return ds.map_batches(addpart, batch_format="pyarrow").groupby("__part")


def adaptive_semi_filter(
    probe: ray.data.Dataset,
    build: ray.data.Dataset,
    probe_key: str,
    build_key: str,
    anti: bool = False,
    broadcast_max: int = 5_000_000,
) -> ray.data.Dataset:
    """Semi/anti join with size-based strategy selection (the
    adaptive_join treatment for EXISTS/NOT EXISTS): stream the build
    side's distinct keys with an early-exit count; under
    ``broadcast_max`` distinct keys, ONE sorted key array broadcasts
    via the object store and the probe side streams through a
    searchsorted filter (no shuffle). Above it — a low-selectivity
    predicate at 100 TB, where a driver-side key gather would OOM —
    both sides hash-co-partition through Ray's shuffle join instead:
    semi = inner join against the marker-tagged distinct keys, anti =
    left_outer + null-marker filter. The key set never touches the
    driver on either path."""
    distinct_keys = _distinct(build, build_key)

    refs, n, small = [], 0, True
    for b in distinct_keys.iter_batches(batch_format="pyarrow", batch_size=262144):
        n += b.num_rows
        if n > broadcast_max:
            small = False
            break
        if b.num_rows:
            refs.append(ray.put(b))

    if small:
        ref = _build_sorted_keys.remote(build_key, False, *refs) if refs else None

        def bcast_filter(t: pa.Table) -> pa.Table:
            if ref is None:
                return t if anti else t.slice(0, 0)
            ks = ray.get(ref)
            k = t[probe_key].to_numpy(zero_copy_only=False)
            if len(ks) == 0:
                return t if anti else t.slice(0, 0)
            idx = np.clip(np.searchsorted(ks, k), 0, len(ks) - 1)
            hit = ks[idx] == k
            return t.filter(pa.array(~hit if anti else hit))

        return probe.map_batches(bcast_filter, batch_format="pyarrow")

    marked = distinct_keys.map_batches(
        lambda t: t.append_column("__m", pa.array(np.ones(t.num_rows, np.int8))),
        batch_format="pyarrow",
    )
    joined = _nonempty(probe).join(
        _nonempty(marked),
        join_type="left_outer" if anti else "inner",
        num_partitions=_npart(),
        on=(probe_key,),
        right_on=(build_key,),
    )
    drop = ["__m"] + ([build_key] if build_key != probe_key else [])

    def finish(t: pa.Table) -> pa.Table:
        if anti:
            t = t.filter(pc.is_null(t["__m"]))
        return t.drop_columns([c for c in drop if c in t.column_names])

    return joined.map_batches(finish, batch_format="pyarrow")


@ray.remote(num_cpus=1)
def _build_sorted_keys(key: str, as_u64: bool, *blocks):
    """Sorted distinct key array for the broadcast semi/anti path —
    built in a worker so the key set never lands on the driver.
    ``as_u64`` restores the uint64 domain (the shuffle ran on the
    int64 bit-pattern view) before sorting, so probes searchsorted in
    the caller's native order."""
    t = pa.concat_tables(blocks).combine_chunks()
    arr = t[key].to_numpy(zero_copy_only=False)
    if as_u64:
        arr = arr.view(np.uint64)
    return np.sort(arr)


def w2_sessionize(sf: str):
    """Sessionization (30-min inactivity gap): hash-partition by user,
    then per PARTITION (not per user) one vectorized pass — sort by
    (user, ts), diff, mask gaps at user boundaries, bincount breaks per
    user segment. No per-group pandas calls (SURVEY.md §2.8)."""
    ds = read_table(sf, "events", ["user_id", "ts"])
    gap_us = 30 * 60 * 1_000_000

    def sess_part(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=[("user_id", "ascending"), ("ts", "ascending")]))
        uid = t["user_id"].to_numpy()
        ts = t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        starts = np.r_[True, uid[1:] != uid[:-1]]
        seg = np.cumsum(starts) - 1
        brk = np.r_[False, np.diff(ts) > gap_us] & ~starts
        n_users = int(seg[-1]) + 1 if len(seg) else 0
        n_sessions = 1 + np.bincount(seg[brk], minlength=n_users)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "n_sessions": pa.array(n_sessions.astype(np.int64)),
            }
        )

    return _hash_partitioned(ds, "user_id", _npart()).map_groups(
        sess_part, batch_format="pyarrow"
    )


def w4_running_sum(sf: str):
    """Window function: per-user running SUM(value) ordered by (ts,
    event_id) — hash-partition by user, one vectorized segment-cumsum
    per partition (global cumsum minus per-segment base); output in
    integer centi-units (value is 2-decimal, so the sum sits within
    1 ulp of integer cents under any summation order)."""
    ds = read_table(sf, "events", ["event_id", "user_id", "ts", "value"])

    def run_part(t: pa.Table) -> pa.Table:
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
            )
        )
        uid = t["user_id"].to_numpy()
        v = t["value"].to_numpy().astype(np.float64)
        starts = np.r_[True, uid[1:] != uid[:-1]]
        seg = np.cumsum(starts) - 1
        cs = np.cumsum(v)
        sp = np.flatnonzero(starts)
        base = cs[sp] - v[sp]
        run = cs - base[seg]
        return pa.table(
            {
                "event_id": t["event_id"],
                "run_sum_c": pa.array(np.rint(run * 100).astype(np.int64)),
            }
        )

    return _hash_partitioned(ds, "user_id", _npart()).map_groups(
        run_part, batch_format="pyarrow"
    )


@ray.remote(num_cpus=1)
def _build_asof_index(*blocks):
    """Flattened as-of index over (o_custkey, o_orderdate): sorted
    unique uids + per-uid segment offsets + a COMPOSITE sorted array
    uid_rank*2^21 + day that makes the whole probe one searchsorted.
    Built in a remote task — the small side never touches the driver."""
    t = pa.concat_tables(blocks).combine_chunks()
    uid = t["o_custkey"].to_numpy().astype(np.int64)
    day = t["o_orderdate"].to_numpy().astype("datetime64[D]").view(np.int64)
    if len(day) and (day.min() < 0 or day.max() >= (1 << 21)):
        raise ValueError("asof index: day out of composite range [0, 2^21)")
    order = np.lexsort((day, uid))
    uid, day = uid[order], day[order]
    uids, starts = np.unique(uid, return_index=True)
    offsets = np.r_[starts, len(uid)].astype(np.int64)
    r_flat = np.repeat(np.arange(len(uids), dtype=np.int64), np.diff(offsets))
    comp = r_flat * (1 << 21) + day
    return uids, offsets, comp, day


def w3_asof_join(sf: str):
    """As-of join: for each event, the latest order of the same user
    (user_id = o_custkey) with o_orderdate <= ts. Broadcast flattened
    index (built in a remote task) + one vectorized composite
    searchsorted per batch — no shuffle, no per-row Python. The
    day-granularity compare is exact: o_orderdate is a midnight date,
    so date <= ts  ⟺  day(date) <= day(ts). Output ts_order is the
    matched order DATE (keys can tie on date; the date itself is
    deterministic where an arbitrary orderkey would not be)."""
    blocks = (
        read_table(sf, "orders", ["o_custkey", "o_orderdate"]).materialize().to_arrow_refs()
    )
    ref = _build_asof_index.remote(*blocks)
    events = read_table(sf, "events", ["event_id", "user_id", "ts"])

    def probe(t: pa.Table) -> pa.Table:
        uids, offsets, comp, day = ray.get(ref)
        u = t["user_id"].to_numpy().astype(np.int64)
        ts_day = (
            t["ts"].to_numpy().astype("datetime64[us]").astype("datetime64[D]").view(np.int64)
        )
        if len(ts_day) and (ts_day.min() < 0 or ts_day.max() >= (1 << 21)):
            raise ValueError("asof join: event day out of composite range [0, 2^21)")
        pos = np.searchsorted(uids, u)
        posc = np.clip(pos, 0, max(len(uids) - 1, 0))
        has = (pos < len(uids)) & (uids[posc] == u) if len(uids) else np.zeros(len(u), bool)
        i = np.searchsorted(comp, posc * (1 << 21) + ts_day, side="right") - 1
        valid = has & (i >= offsets[posc])
        iv = np.clip(i, 0, max(len(day) - 1, 0))
        dates = np.datetime_as_string(day[iv].astype("datetime64[D]"), unit="D") if len(day) else np.array([], str)
        sarr = pa.array(dates.tolist() if len(day) else [""] * len(u), pa.string())
        out = pc.if_else(pa.array(valid), sarr, pa.scalar(None, pa.string()))
        return pa.table(
            {"event_id": t["event_id"], "user_id": t["user_id"], "ts_order": out}
        )

    return events.map_batches(probe, batch_format="pyarrow")


def w5_range_join(sf: str, window_days: int = 30):
    """RANGE JOIN: for each event, the count of the same user's orders
    with o_orderdate in (ts - window, ts] — the interval-predicate join
    Ray Data lacks natively. Same broadcast flattened composite index
    as the as-of join; the per-batch probe is TWO searchsorteds (right
    bound minus left bound), no shuffle, no per-row Python. Day
    granularity is exact for midnight dates (see w3_asof_join)."""
    blocks = (
        read_table(sf, "orders", ["o_custkey", "o_orderdate"]).materialize().to_arrow_refs()
    )
    ref = _build_asof_index.remote(*blocks)
    events = read_table(sf, "events", ["event_id", "user_id", "ts"])

    def probe(t: pa.Table) -> pa.Table:
        uids, offsets, comp, _day = ray.get(ref)
        u = t["user_id"].to_numpy().astype(np.int64)
        ts_day = (
            t["ts"].to_numpy().astype("datetime64[us]").astype("datetime64[D]").view(np.int64)
        )
        if len(ts_day) and (ts_day.min() < 0 or ts_day.max() >= (1 << 21)):
            raise ValueError("range join: event day out of composite range [0, 2^21)")
        pos = np.searchsorted(uids, u)
        posc = np.clip(pos, 0, max(len(uids) - 1, 0))
        has = (pos < len(uids)) & (uids[posc] == u) if len(uids) else np.zeros(len(u), bool)
        hi = np.searchsorted(comp, posc * (1 << 21) + ts_day, side="right")
        lo = np.searchsorted(comp, posc * (1 << 21) + ts_day - window_days, side="right")
        # clamp to the segment start: for ts_day < window_days the lower
        # probe's composite underflows into the PREVIOUS uid's segment
        # and would count another user's orders
        lo = np.maximum(lo, offsets[posc]) if len(uids) else lo
        n = np.where(has, hi - lo, 0).astype(np.int64)
        return pa.table({"event_id": t["event_id"], "n_orders": pa.array(n)})

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


def q4_order_priority(sf: str):
    """TPC-H Q4 shape — correlated EXISTS decorrelated into a pre-
    aggregate + join: ``EXISTS (lineitem WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate)`` is equivalent to ``max(l_shipdate)
    per order > o_orderdate``, so lineitem collapses to one (orderkey,
    max_shipdate) row per order BEFORE the exchange (the shuffle
    carries two columns at order cardinality, never the fact table),
    then an inner hash join against orders and a 5-key grouped count.
    This is the decorrelation a 100-TB EXISTS needs — per-probe
    subqueries are not a thing in a batch engine."""
    li = read_table(sf, "lineitem", ["l_orderkey", "l_shipdate"])
    per_order = grouped_agg(
        li, ["l_orderkey"], [("max_ship", "max", "l_shipdate")], round_to=None
    )
    orders = read_table(sf, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    from ..sources.testdata import table_rows

    j = shuffle_join(
        orders, per_order, "o_orderkey", "l_orderkey",
        num_partitions=_npart(table_rows(sf, "orders")),
    )

    def exists_filter(t: pa.Table) -> pa.Table:
        m = pc.greater(t["max_ship"], t["o_orderdate"])
        return t.filter(m).select(["o_orderpriority"])

    survivors = j.map_batches(exists_filter, batch_format="pyarrow")
    return grouped_agg(
        survivors, ["o_orderpriority"], [("order_count", "count", None)], round_to=None
    )


def g12_grouped_corr(sf: str):
    """Grouped Pearson correlation corr(l_extendedprice, l_quantity)
    per returnflag from MERGEABLE CENTERED moments (Chan et al.'s
    parallel update), not raw power sums: with prices ~1e5 over 6e5
    rows the naive n*sxy - sx*sy form cancels ~8 significant digits,
    enough to flip the e4-rounded output vs DuckDB's streaming
    covariance. Per batch: one pyarrow group_by pass -> per-flag
    (n, mean_x, mean_y, M2x, M2y, Cxy); partials merge pairwise in a
    result-sized finalize (rows = flags x batches). Output is
    CAST(ROUND(corr*10000) AS BIGINT) on both engines."""
    ds = read_table(sf, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        flags = t["l_returnflag"].to_numpy(zero_copy_only=False)
        x = t["l_extendedprice"].to_numpy()
        y = t["l_quantity"].to_numpy()
        order = np.argsort(flags, kind="stable")
        flags, x, y = flags[order], x[order], y[order]
        starts = np.r_[True, flags[1:] != flags[:-1]]
        idx = np.flatnonzero(starts)
        out = {"flag": [], "n": [], "mx": [], "my": [], "m2x": [], "m2y": [], "cxy": []}
        bounds = np.r_[idx, len(flags)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            xs, ys = x[s:e], y[s:e]
            mx, my = xs.mean(), ys.mean()
            out["flag"].append(flags[s])
            out["n"].append(int(e - s))
            out["mx"].append(mx)
            out["my"].append(my)
            out["m2x"].append(float(((xs - mx) ** 2).sum()))
            out["m2y"].append(float(((ys - my) ** 2).sum()))
            out["cxy"].append(float(((xs - mx) * (ys - my)).sum()))
        return pa.table(
            {
                "l_returnflag": pa.array(out["flag"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "mx": pa.array(out["mx"], pa.float64()),
                "my": pa.array(out["my"], pa.float64()),
                "m2x": pa.array(out["m2x"], pa.float64()),
                "m2y": pa.array(out["m2y"], pa.float64()),
                "cxy": pa.array(out["cxy"], pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = {"l_returnflag": [], "corr_e4": []}
    for flag, g in parts.groupby("l_returnflag", sort=True):
        n = mx = my = m2x = m2y = cxy = 0.0
        for r in g.itertuples(index=False):
            # Chan merge of ((n,mx,my,M2x,M2y,Cxy), r)
            nn = n + r.n
            dx, dy = r.mx - mx, r.my - my
            w = n * r.n / nn
            m2x += r.m2x + dx * dx * w
            m2y += r.m2y + dy * dy * w
            cxy += r.cxy + dx * dy * w
            mx += dx * r.n / nn
            my += dy * r.n / nn
            n = nn
        corr = cxy / np.sqrt(m2x * m2y)
        rows["l_returnflag"].append(flag)
        rows["corr_e4"].append(int(np.floor(corr * 10000.0 + 0.5)))
    return pa.table(
        {
            "l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
            "corr_e4": pa.array(rows["corr_e4"], pa.int64()),
        }
    )


def o6_stratified_sample(sf: str, k: int = 5):
    """Stratified deterministic sample: k rows per stratum
    (returnflag), ranked by a Fibonacci-mixed hash of the unique row
    key — reproducible across engines AND block splits, unlike
    random_sample. Per batch: a local top-k per stratum combiner (the
    shuffle-free pattern — candidates are k x strata x blocks, never
    the table), then one result-sized finalize. The mix constant is
    2654435761 = floor(2^32/phi); plain ``key % m`` would alias the
    structured (orderkey*8+line) keys."""
    ds = read_table(sf, "lineitem", ["l_returnflag", "l_orderkey", "l_linenumber"])

    def local_topk(t: pa.Table) -> pa.Table:
        if "h" not in t.column_names:  # finalize re-runs this on candidates
            key = t["l_orderkey"].to_numpy() * 8 + t["l_linenumber"].to_numpy().astype(np.int64)
            h = (key * 2654435761) % 4294967296
            t = t.append_column("h", pa.array(h, pa.int64()))
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("l_returnflag", "ascending"),
                    ("h", "ascending"),
                    ("l_orderkey", "ascending"),
                    ("l_linenumber", "ascending"),
                ],
            )
        )
        flags = t["l_returnflag"].to_numpy(zero_copy_only=False)
        starts = np.r_[True, flags[1:] != flags[:-1]]
        gid = np.cumsum(starts) - 1
        pos = np.arange(len(flags)) - np.flatnonzero(starts)[gid]
        return t.filter(pa.array(pos < k))

    cands = ds.map_batches(local_topk, batch_format="pyarrow")
    t = pa.concat_tables(
        list(cands.iter_batches(batch_format="pyarrow", batch_size=65536))
    ).combine_chunks()
    return local_topk(t)


def w8_dense_rank(sf: str):
    """DENSE_RANK window function: rank customers within their market
    segment by account balance (integer cents — float order ties are
    cross-engine ambiguous, cent ties are exact). Hash-partition by
    segment digest, then ONE vectorized pass per partition: sort by
    (segment, bal desc), dense rank = cumsum of value-change flags
    reset at segment starts. Completes the window-function family
    (w4 running sum, w7 LAG)."""
    import hashlib as _hl

    ds = read_table(sf, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])

    def with_key(t: pa.Table) -> pa.Table:
        h = np.array(
            [
                int.from_bytes(_hl.md5(s.encode()).digest()[:4], "big")
                for s in t["c_mktsegment"].to_pylist()
            ],
            np.int64,
        )
        bal_c = np.rint(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_mktsegment": t["c_mktsegment"],
                "bal_c": pa.array(bal_c),
                "__k": pa.array(h),
            }
        )

    def rank_part(t: pa.Table) -> pa.Table:
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[("c_mktsegment", "ascending"), ("bal_c", "descending")],
            )
        )
        seg = np.asarray(t["c_mktsegment"].to_pylist(), dtype=object)
        bal = t["bal_c"].to_numpy()
        seg_start = np.r_[True, seg[1:] != seg[:-1]]
        new_val = np.r_[True, bal[1:] != bal[:-1]] | seg_start
        # dense rank: running count of distinct values since segment start
        run = np.cumsum(new_val)
        base = run[np.flatnonzero(seg_start)]
        gid = np.cumsum(seg_start) - 1
        drank = run - base[gid] + 1
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_mktsegment": t["c_mktsegment"],
                "bal_c": t["bal_c"],
                "drank": pa.array(drank.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(with_key, batch_format="pyarrow")
        .groupby("__k")
        .map_groups(rank_part, batch_format="pyarrow")
    )


def _lev_many(a_codes, a_len, b_codes, b_len):
    """Levenshtein distance for n string pairs at once: the classic DP,
    vectorized ACROSS pairs — the (L+1)^2 cell loop is Python, every
    cell op is an n-vector numpy kernel. a_codes/b_codes are (n, L)
    uint8 zero-padded; distances read out at (a_len, b_len)."""
    n, L = a_codes.shape
    big = np.int32(L + 1)
    prev = np.tile(np.arange(L + 1, dtype=np.int32), (n, 1))
    out = np.where(a_len == 0, b_len, 0).astype(np.int32)
    for i in range(1, L + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        cost = (a_codes[:, i - 1][:, None] != b_codes).astype(np.int32)
        for j in range(1, L + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost[:, j - 1],
            )
        done = a_len == i
        if done.any():
            out[done] = cur[done, b_len[done]]
        prev = cur
    return out


def d7_fuzzy_pairs(sf: str, max_dist: int = 2):
    """Fuzzy (edit-distance) self-join: unordered part pairs within a
    brand whose names are <= max_dist Levenshtein apart. Blocking is
    (brand, |len diff| <= max_dist) — exact within the block (length
    difference is a Levenshtein lower bound, so no pair is lost); the
    all-pairs DP is vectorized across pairs (_lev_many). At 100 TB the
    brand block itself gets big — the scale path is character-n-gram
    LSH prefiltering inside the block (the t_near_dedup machinery) with
    this DP as the exact verify; the blocked shape and the verify
    kernel are what this op contributes."""
    import hashlib as _hl

    ds = read_table(sf, "part", ["p_partkey", "p_name", "p_brand"])

    def with_key(t: pa.Table) -> pa.Table:
        h = np.array(
            [
                int.from_bytes(_hl.md5(s.encode()).digest()[:4], "big")
                for s in t["p_brand"].to_pylist()
            ],
            np.int64,
        )
        return t.append_column("__k", pa.array(h))

    def pairs_part(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=[("p_brand", "ascending"), ("p_partkey", "ascending")]))
        brand = np.asarray(t["p_brand"].to_pylist(), dtype=object)
        names = t["p_name"].to_pylist()
        keys = t["p_partkey"].to_numpy()
        L = max((len(s) for s in names), default=0)
        codes = np.zeros((len(names), L), np.uint8)
        lens = np.zeros(len(names), np.int32)
        for r, s in enumerate(names):
            b = s.encode()
            codes[r, : len(b)] = np.frombuffer(b, np.uint8)
            lens[r] = len(b)
        starts = np.flatnonzero(np.r_[True, brand[1:] != brand[:-1]])
        bounds = np.r_[starts, len(brand)]
        ob, oa, obk, od = [], [], [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            idx = np.arange(lo, hi)
            ii, jj = np.triu_indices(len(idx), k=1)
            ii, jj = idx[ii], idx[jj]
            m = np.abs(lens[ii] - lens[jj]) <= max_dist
            ii, jj = ii[m], jj[m]
            if not len(ii):
                continue
            d = _lev_many(codes[ii], lens[ii], codes[jj], lens[jj])
            keep = d <= max_dist
            ob.append(np.full(int(keep.sum()), brand[lo], object))
            oa.append(keys[ii[keep]])
            obk.append(keys[jj[keep]])
            od.append(d[keep].astype(np.int64))
        if not oa:
            return pa.table(
                {
                    "p_brand": pa.array([], pa.string()),
                    "a_key": pa.array([], pa.int64()),
                    "b_key": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "p_brand": pa.array(np.concatenate(ob), pa.string()),
                "a_key": pa.array(np.concatenate(oa)),
                "b_key": pa.array(np.concatenate(obk)),
                "dist": pa.array(np.concatenate(od)),
            }
        )

    return (
        ds.map_batches(with_key, batch_format="pyarrow")
        .groupby("__k")
        .map_groups(pairs_part, batch_format="pyarrow")
    )


def _roundtrip_dir(name: str, sf: str) -> str:
    """Fixed per-(query, sf) scratch dir for sink/source roundtrips.
    Deterministic per-process path means repeated runs in one process
    overwrite one directory instead of leaking a fresh mkdtemp per
    call (ADVICE r3); the pid component keeps concurrent processes
    (bench + pytest) from rmtree'ing each other's shards mid-read."""
    import hashlib
    import os
    import re
    import shutil

    # opportunistic GC: drop siblings left by processes that no longer
    # exist, so repeated bench/pytest runs don't accumulate dirs.
    # Linux-only (the /proc liveness probe is meaningless elsewhere and
    # would rmtree LIVE processes' dirs) and owner-gated (a shared /tmp
    # can hold other users' same-pattern dirs; PID-reuse could otherwise
    # also strand or steal a dir) — ADVICE r4.
    import sys

    try:
        if sys.platform == "linux":
            uid = os.getuid()
            for d in os.listdir("/tmp"):
                m = re.fullmatch(r"lulu-rt-.+-(\d+)", d)
                if not m or os.path.exists(f"/proc/{m.group(1)}"):
                    continue
                p = os.path.join("/tmp", d)
                try:
                    if os.lstat(p).st_uid != uid:
                        continue
                except OSError:
                    continue
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    tag = hashlib.sha1(sf.encode()).hexdigest()[:8]
    return os.path.join("/tmp", f"lulu-rt-{name}-{tag}-{os.getpid()}")


def s8_bucketed_roundtrip(sf: str):
    """S8 — bucketed resumable sink roundtrip as a driver-checked
    query: lineitem hash-buckets by orderkey into a sealed
    bucket=NNNN/ layout (sources/bucketed.py), reads back, and must
    hash-equal a plain SELECT — proving the sink loses/duplicates
    nothing and the bucket function is key-total. Fixed dir per
    (query, sf), overwritten per call (the resume-skip path is
    exercised by tests/test_bucketed.py)."""
    import shutil

    from ..sources.bucketed import read_bucketed, write_bucketed

    ds = read_table(sf, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"])
    out = _roundtrip_dir("bucketed", sf)
    shutil.rmtree(out, ignore_errors=True)
    write_bucketed(ds, out, "l_orderkey", num_buckets=32)
    back = read_bucketed(out)
    return _cents_cols(back, {"l_quantity": "quantity_c"})


@ray.remote(num_cpus=1)
def _w9_block_max(t: pa.Table) -> int:
    if t.num_rows == 0:
        return -(1 << 62)
    us = t["ts"].cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
    return int(us.max())


@ray.remote(num_cpus=1)
def _w9_flag_block(t: pa.Table, prefix_us: int, allow_us: int) -> pa.Table:
    """Within one arrival-ordered block: running max seeded with the
    prefix max of all earlier blocks; late iff ts + allowance < the
    strictly-preceding running max."""
    if t.num_rows == 0:
        return pa.table(
            {
                "hour": pa.array([], pa.string()),
                "late": pa.array([], pa.int64()),
                "ontime_c": pa.array([], pa.int64()),
            }
        )
    t = t.take(pc.sort_indices(t, sort_keys=[("ak", "ascending"), ("event_id", "ascending")]))
    us = t["ts"].cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
    run = np.maximum.accumulate(us)
    before = np.r_[prefix_us, np.maximum(run[:-1], prefix_us)]
    late = (us + allow_us < before).astype(np.int64)
    val_c = np.rint(t["value"].to_numpy() * 100).astype(np.int64)
    return pa.table(
        {
            "hour": pc.strftime(t["ts"], format="%Y-%m-%d %H:00:00"),
            "late": pa.array(late),
            "ontime_c": pa.array(val_c * (1 - late)),
        }
    )


def w9_late_data(sf: str, allow_s: int = 900, jitter: int = 32):
    """Watermark / late-data semantics (§2.8): events arrive in a
    deterministic near-time order (arrival key = event_id plus a
    Fibonacci-hash jitter of < ``jitter`` positions — the harness
    stream is perfectly time-sorted, real streams are not); the
    watermark before each row is the max event-time seen strictly
    earlier in arrival order; a row whose event time lags the
    watermark by more than ``allow_s`` is late. Late rows are counted
    but excluded from the per-hour value aggregate — the
    drop-late-data policy of a streaming tumbling window.

    Distributed shape: a PREFIX-MAX SCAN, the associative-scan
    pattern — range-partition by arrival key (one sort), then the
    driver exchanges ONE (max event-time) boundary value per block
    (O(blocks), never O(rows)) and each block flags its rows with a
    vectorized seeded running max. No staircase index, no gather:
    at 10^10 rows the driver holds one int per block. The grouped
    hour aggregate is the standard pre-aggregated shuffle."""
    ds = read_table(sf, "events", ["event_id", "ts", "value"])

    def arrival(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        ak = eid + (eid * 2654435761) % jitter
        return pa.table(
            {
                "event_id": t["event_id"],
                "ak": pa.array(ak.astype(np.int64)),
                "ts": t["ts"],
                "value": t["value"],
            }
        )

    arranged = (
        ds.map_batches(arrival, batch_format="pyarrow")
        .sort(["ak", "event_id"])
        .materialize()
    )
    refs = arranged.to_arrow_refs()
    maxes = ray.get([_w9_block_max.remote(r) for r in refs])
    allow_us = allow_s * 1_000_000
    prefix = -(1 << 62)
    out = []
    for r, m in zip(refs, maxes):
        out.append(_w9_flag_block.remote(r, prefix, allow_us))
        prefix = max(prefix, m)
    flagged = ray.data.from_arrow_refs(out)
    agg = grouped_agg(
        flagged,
        ["hour"],
        [("n", "count", None), ("n_late", "sum", "late"), ("sum_ontime_c", "sum", "ontime_c")],
        round_to=None,
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "hour": t["hour"],
                "n": pc.cast(t["n"], pa.int64()),
                "n_late": pc.cast(t["n_late"], pa.int64()),
                "sum_ontime_c": pc.cast(t["sum_ontime_c"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def g13_cube(sf: str):
    """CUBE(returnflag, linestatus) — g7's rollup plus the
    per-linestatus grouping set (all four subsets of the key pair).
    Same shape: each set is one pre-aggregated combiner shuffle over
    partial rows; '' marks a rolled-up level on both engines."""
    cols = ["l_returnflag", "l_linestatus", "l_quantity"]
    spec = [("n", "count", None), ("sum_qty", "sum", "l_quantity")]

    def lift(t: pa.Table, flag_col, status_col) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "l_returnflag": t[flag_col] if flag_col else pa.array([""] * n, pa.string()),
                "l_linestatus": t[status_col] if status_col else pa.array([""] * n, pa.string()),
                "n": t["n"],
                "sum_qty": t["sum_qty"],
            }
        )

    detail = grouped_agg(
        read_table(sf, "lineitem", cols), ["l_returnflag", "l_linestatus"], spec
    ).map_batches(lambda t: lift(t, "l_returnflag", "l_linestatus"), batch_format="pyarrow")
    byflag = grouped_agg(
        read_table(sf, "lineitem", cols), ["l_returnflag"], spec
    ).map_batches(lambda t: lift(t, "l_returnflag", None), batch_format="pyarrow")
    bystatus = grouped_agg(
        read_table(sf, "lineitem", cols), ["l_linestatus"], spec
    ).map_batches(lambda t: lift(t, None, "l_linestatus"), batch_format="pyarrow")
    total = grouped_agg(
        read_table(sf, "lineitem", cols).map_batches(
            lambda t: t.append_column("__all", pa.array(np.zeros(t.num_rows, np.int32))),
            batch_format="pyarrow",
        ),
        ["__all"],
        spec,
    ).map_batches(lambda t: lift(t, None, None), batch_format="pyarrow")
    return detail.union(byflag).union(bystatus).union(total)


def g14_grouped_hll(sf: str, p: int = 14):
    """Approximate COUNT(DISTINCT partkey) PER GROUP via mergeable
    HyperLogLog sketches — g4 is the global form; the grouped form is
    the 100-TB shape for high-cardinality-per-group distincts (g9's
    exact grouped distinct shuffles every (group, value) pair; this
    shuffles one 16 KiB sketch per (group, block)). Per batch: one
    sketch per group present; merge = register-wise max, grouped by
    key digest; rows-only driver check, pytest asserts ±3% vs exact."""
    from ..functions.hll import HyperLogLog
    import hashlib as _hl

    ds = read_table(sf, "lineitem", ["l_returnflag", "l_partkey"])

    def sketch_block(t: pa.Table) -> pa.Table:
        flags = np.asarray(t["l_returnflag"].to_pylist(), dtype=object)
        pk = t["l_partkey"].to_numpy().astype(np.uint64)
        order = np.argsort(flags, kind="stable")
        flags, pk = flags[order], pk[order]
        starts = np.flatnonzero(np.r_[True, flags[1:] != flags[:-1]])
        bounds = np.r_[starts, len(flags)]
        out_f, out_r, out_k = [], [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            h = HyperLogLog(p=p)
            h.add_many(pk[lo:hi])
            out_f.append(flags[lo])
            out_r.append(h.registers.tobytes())
            out_k.append(int.from_bytes(_hl.md5(flags[lo].encode()).digest()[:4], "big"))
        return pa.table(
            {
                "l_returnflag": pa.array(out_f, pa.string()),
                "registers": pa.array(out_r, pa.binary()),
                "__k": pa.array(out_k, pa.int64()),
            }
        )

    def merge_part(t: pa.Table) -> pa.Table:
        flags = np.asarray(t["l_returnflag"].to_pylist(), dtype=object)
        order = np.argsort(flags, kind="stable")
        flags = flags[order]
        regs = [t["registers"][int(i)].as_py() for i in order]
        starts = np.flatnonzero(np.r_[True, flags[1:] != flags[:-1]])
        bounds = np.r_[starts, len(flags)]
        out_f, out_n = [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            h = HyperLogLog(p=p)
            for r in regs[lo:hi]:
                h.merge_registers(r)
            out_f.append(flags[lo])
            out_n.append(int(h.count()))
        return pa.table(
            {
                "l_returnflag": pa.array(out_f, pa.string()),
                "approx_distinct_parts": pa.array(out_n, pa.int64()),
            }
        )

    return (
        ds.map_batches(sketch_block, batch_format="pyarrow")
        .groupby("__k")
        .map_groups(merge_part, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# TPC-H Q7/Q10/Q14/Q15 shapes — the remaining classic join/aggregate
# skeletons over the harness tables (no partsupp table exists, so Q2/Q11
# shapes are out of reach; these four cover bidirectional-pair filters,
# grouped-top-N over a join, conditional-ratio aggregates and
# argmax-of-grouped-sum).
# ---------------------------------------------------------------------------


def _nation_key(sf: str, name: str) -> int:
    nat = read_table(sf, "nation", ["n_nationkey", "n_name"]).to_pandas()
    return int(nat.loc[nat["n_name"] == name, "n_nationkey"].iloc[0])


def q7_volume_shipping(
    sf: str,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    lo: str = "1995-01-01",
    hi: str = "1997-01-01",
):
    """TPC-H Q7 shape — bidirectional nation-pair trade volume:
    lineitem⋈supplier→nation vs orders⋈customer→nation, keeping only
    (A sells to B) and (B sells to A) flows, grouped by
    (supp_nation, cust_nation, ship year).

    Scale shape: supplier and customer are dimension-sized -> broadcast
    sorted-key lookups folded into each fact scan (and both scans also
    PRE-FILTER to the two nations, so the orderkey shuffle carries only
    pair-relevant rows — at 100 TB that is a ~ (2/|nations|)^2 volume
    reduction before the exchange). Only lineitem⋈orders shuffles.
    Revenue exact int64 e4 units as in q5."""
    ka, kb = _nation_key(sf, nation_a), _nation_key(sf, nation_b)
    names = {ka: nation_a, kb: nation_b}

    # supplier/customer are SF-scaling: pre-filter to the two nations
    # in the scan, build the sorted broadcasts in a worker with a loud
    # bound (VERDICT r4 item 2 — no driver-side gathers).
    pair_set = pa.array([ka, kb], pa.int64())

    def _pair_filtered(table: str, key: str, natcol: str):
        return read_table(sf, table, [key, natcol]).map_batches(
            lambda t: pa.table(
                {key: t[key], natcol: pc.cast(t[natcol], pa.int64())}
            ).filter(pc.is_in(pc.cast(t[natcol], pa.int64()), value_set=pair_set)),
            batch_format="pyarrow",
        )

    sref = dim_ref(_pair_filtered("supplier", "s_suppkey", "s_nationkey"), "s_suppkey", ("s_nationkey",))
    cref = dim_ref(_pair_filtered("customer", "c_custkey", "c_nationkey"), "c_custkey", ("c_nationkey",))

    lo_ts = pa.scalar(np.datetime64(lo, "us"))
    hi_ts = pa.scalar(np.datetime64(hi, "us"))

    def _lookup(keys: np.ndarray, ref):
        ks, vs = ray.get(ref)
        if len(ks) == 0 or len(keys) == 0:
            return np.zeros(len(keys), bool), np.zeros(len(keys), np.int64)
        idx = np.clip(np.searchsorted(ks, keys), 0, len(ks) - 1)
        hit = ks[idx] == keys
        return hit, vs[idx]

    li = read_table(
        sf, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def l_map(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo_ts), pc.less(t["l_shipdate"], hi_ts))
        )
        hit, nat = _lookup(t["l_suppkey"].to_numpy(), sref)
        price_c = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        year = pc.year(t["l_shipdate"]).to_numpy().astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"].filter(pa.array(hit)),
                "supp_nat": pa.array(nat[hit]),
                "l_year": pa.array(year[hit]),
                "rev_e4": pa.array(rev[hit]),
            }
        )

    li = li.map_batches(l_map, batch_format="pyarrow")

    orders = read_table(sf, "orders", ["o_orderkey", "o_custkey"])

    def o_map(t: pa.Table) -> pa.Table:
        hit, nat = _lookup(t["o_custkey"].to_numpy(), cref)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].filter(pa.array(hit)),
                "cust_nat": pa.array(nat[hit]),
            }
        )

    orders = orders.map_batches(o_map, batch_format="pyarrow")

    from ..sources.testdata import table_rows

    j = shuffle_join(
        li, orders, "l_orderkey", "o_orderkey",
        num_partitions=_npart(table_rows(sf, "lineitem") + table_rows(sf, "orders")),
    )

    def pair_only(t: pa.Table) -> pa.Table:
        s = t["supp_nat"].to_numpy()
        c = t["cust_nat"].to_numpy()
        m = ((s == ka) & (c == kb)) | ((s == kb) & (c == ka))
        t = t.filter(pa.array(m))
        return t.select(["supp_nat", "cust_nat", "l_year", "rev_e4"])

    j = j.map_batches(pair_only, batch_format="pyarrow")
    agg = grouped_agg(
        j, ["supp_nat", "cust_nat", "l_year"], [("revenue_e4", "sum", "rev_e4")],
        round_to=None,
    )

    def finish(t: pa.Table) -> pa.Table:
        sn = [names[int(x)] for x in t["supp_nat"].to_pylist()]
        cn = [names[int(x)] for x in t["cust_nat"].to_pylist()]
        return pa.table(
            {
                "supp_nation": pa.array(sn, pa.string()),
                "cust_nation": pa.array(cn, pa.string()),
                "l_year": t["l_year"].cast(pa.int64()),
                "revenue_e4": t["revenue_e4"].cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q10_returned_items(sf: str, lo: str = "1996-01-01", hi: str = "1996-07-01", k: int = 20):
    """TPC-H Q10 shape — top-k customers by revenue lost to returns:
    date-filtered orders ⋈ returnflag-filtered lineitem (the only
    shuffle), grouped by customer, decorated from broadcast
    customer/nation dimensions AFTER the aggregate (so names never ride
    the fact exchange), then a distributed sort + limit(k).
    Deterministic tiebreak (revenue DESC, c_custkey ASC)."""
    lo_ts = pa.scalar(np.datetime64(lo, "us"))
    hi_ts = pa.scalar(np.datetime64(hi, "us"))

    orders = read_table(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], lo_ts), pc.less(t["o_orderdate"], hi_ts)
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )

    def l_map(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        price_c = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "rev_e4": pa.array(price_c * (100 - disc_c))}
        )

    li = read_table(
        sf, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    ).map_batches(l_map, batch_format="pyarrow")

    from ..sources.testdata import table_rows

    j = shuffle_join(
        li, orders, "l_orderkey", "o_orderkey",
        num_partitions=_npart(table_rows(sf, "lineitem") + table_rows(sf, "orders")),
    )
    agg = grouped_agg(j, ["o_custkey"], [("revenue_e4", "sum", "rev_e4")], round_to=None)

    # nation is CONSTANT-bounded (25 rows at any SF) so it broadcasts
    # unconditionally into the customer stream; customer itself is
    # SF-scaling, so the (c_custkey -> c_name, n_name) decoration goes
    # through adaptive_dim_join — broadcast under 5M customers,
    # hash-co-partitioned shuffle above (VERDICT r4 item 2).
    nat = read_table(sf, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nk = nat["n_nationkey"].to_numpy(np.int64)
    no = np.argsort(nk, kind="stable")
    nref = ray.put((nk[no], nat["n_name"].to_numpy(object)[no]))

    def cust_dim(t: pa.Table) -> pa.Table:
        ks, names = ray.get(nref)
        idx = np.clip(np.searchsorted(ks, t["c_nationkey"].to_numpy()), 0, max(len(ks) - 1, 0))
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "n_name": pa.array(names[idx] if len(ks) else [None] * t.num_rows, pa.string()),
            }
        )

    cust = read_table(sf, "customer", ["c_custkey", "c_name", "c_nationkey"]).map_batches(
        cust_dim, batch_format="pyarrow"
    )
    out = adaptive_dim_join(agg, "o_custkey", cust, "c_custkey", ["c_name", "n_name"])
    out = out.map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t["o_custkey"].cast(pa.int64()),
                "c_name": t["c_name"],
                "n_name": t["n_name"],
                "revenue_e4": t["revenue_e4"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return out.sort(["revenue_e4", "c_custkey"], descending=[True, False]).limit(k)


def q14_promo_effect(sf: str, lo: str = "1996-01-01", hi: str = "1996-02-01"):
    """TPC-H Q14 shape — conditional-ratio aggregate: share of one
    month's revenue from PROMO-type parts. part is dimension-sized ->
    a broadcast sorted-key boolean lookup inside the lineitem scan; the
    whole query is scan + per-block partial sums + one global add (no
    shuffle at all). The ratio is returned as its two exact int64 e4
    terms (promo, total) — cross-engine float division is not hashable.
    part is SF-scaling, so the (p_partkey -> is_promo) flag decorates
    via adaptive_dim_join (broadcast under 5M parts, shuffle above —
    VERDICT r4 item 2); on the broadcast path the plan stays
    scan + partial sums + one global add, no shuffle at all."""
    part_flag = read_table(sf, "part", ["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t["p_partkey"],
                "is_promo": pc.equal(t["p_type"], "PROMO"),
            }
        ),
        batch_format="pyarrow",
    )
    lo_ts = pa.scalar(np.datetime64(lo, "us"))
    hi_ts = pa.scalar(np.datetime64(hi, "us"))

    li = read_table(
        sf, "lineitem", ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo_ts), pc.less(t["l_shipdate"], hi_ts))
        ).select(["l_partkey", "l_extendedprice", "l_discount"]),
        batch_format="pyarrow",
    )
    decorated = adaptive_dim_join(li, "l_partkey", part_flag, "p_partkey", ["is_promo"], how="left")

    def partial(t: pa.Table) -> pa.Table:
        is_promo = np.asarray(
            t["is_promo"].to_pandas().fillna(False), bool
        )
        price_c = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        return pa.table(
            {
                "__g": pa.array([0], pa.int64()),
                "promo": pa.array([int(rev[is_promo].sum())], pa.int64()),
                "total": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    parts = decorated.map_batches(partial, batch_format="pyarrow")
    agg = grouped_agg(
        parts, ["__g"], [("promo_revenue_e4", "sum", "promo"), ("total_revenue_e4", "sum", "total")],
        round_to=None,
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "promo_revenue_e4": t["promo_revenue_e4"].cast(pa.int64()),
                "total_revenue_e4": t["total_revenue_e4"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q15_top_supplier(sf: str, lo: str = "1996-01-01", hi: str = "1996-04-01"):
    """TPC-H Q15 shape — argmax of a grouped sum: revenue per supplier
    over one quarter, keep the supplier(s) achieving the max. The
    grouped result is supplier-cardinality (small even at 100 TB), so
    the max+filter finalizes in ONE remote task over the aggregate —
    the fact scan and grouped sum stay distributed; exact int64 revenue
    makes the max well-defined (no float-sum order ambiguity)."""
    lo_ts = pa.scalar(np.datetime64(lo, "us"))
    hi_ts = pa.scalar(np.datetime64(hi, "us"))

    def l_map(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo_ts), pc.less(t["l_shipdate"], hi_ts))
        )
        price_c = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc_c = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {"l_suppkey": t["l_suppkey"], "rev_e4": pa.array(price_c * (100 - disc_c))}
        )

    li = read_table(
        sf, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    ).map_batches(l_map, batch_format="pyarrow")
    agg = grouped_agg(li, ["l_suppkey"], [("total_revenue_e4", "sum", "rev_e4")], round_to=None)

    # supplier is SF-scaling: worker-built sorted name broadcast with a
    # loud bound (VERDICT r4 item 2 — no driver-side gather).
    sref = dim_ref(
        read_table(sf, "supplier", ["s_suppkey", "s_name"]), "s_suppkey", ("s_name",)
    )

    @ray.remote
    def winners(*blocks: pa.Table) -> pa.Table:
        t = pa.concat_tables(list(blocks)).combine_chunks()
        rev = t["total_revenue_e4"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = rev == rev.max() if len(rev) else np.zeros(0, bool)
        t = t.filter(pa.array(m))
        ks, names = ray.get(sref)
        keys = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ks, keys)
        out = pa.table(
            {
                "s_suppkey": pa.array(keys),
                "s_name": pa.array(names[idx], pa.string()),
                "total_revenue_e4": pa.array(
                    t["total_revenue_e4"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )
        return out.take(pc.sort_indices(out, sort_keys=[("s_suppkey", "ascending")]))

    refs = agg.materialize().to_arrow_refs()
    return ray.data.from_arrow_refs([winners.remote(*refs)])


def g15_histogram(sf: str, width_c: int = 5_000_000, n_bins: int = 10):
    """Equi-width histogram of o_totalprice ($50k bins, top bin open):
    per-batch bin assignment on EXACT integer cents (floor division —
    no float-boundary ambiguity vs the oracle's BIGINT ``//``), then a
    pre-aggregated grouped count. Scale shape: the shuffle carries one
    row per (bin, batch)."""
    ds = read_table(sf, "orders", ["o_totalprice"])

    def binit(t: pa.Table) -> pa.Table:
        cents = np.rint(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        b = np.minimum(cents // width_c, n_bins - 1)
        return pa.table({"bin": pa.array(b)})

    out = grouped_agg(
        ds.map_batches(binit, batch_format="pyarrow"), ["bin"], [("n", "count", None)]
    )
    return out.map_batches(
        lambda t: pa.table({"bin": t["bin"].cast(pa.int64()), "n": t["n"].cast(pa.int64())}),
        batch_format="pyarrow",
    )


def g16_regr_slope(sf: str):
    """Grouped least-squares slope REGR_SLOPE(l_extendedprice,
    l_quantity) per returnflag — same mergeable centered moments as
    g12_grouped_corr (slope = Cxy / M2x; the naive power-sum form
    cancels ~8 digits at this price magnitude). Output
    CAST(ROUND(slope*100) AS BIGINT) on both engines."""
    ds = read_table(sf, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        flags = t["l_returnflag"].to_numpy(zero_copy_only=False)
        y = t["l_extendedprice"].to_numpy()
        x = t["l_quantity"].to_numpy()
        order = np.argsort(flags, kind="stable")
        flags, x, y = flags[order], x[order], y[order]
        starts = np.r_[True, flags[1:] != flags[:-1]]
        bounds = np.r_[np.flatnonzero(starts), len(flags)]
        out = {"flag": [], "n": [], "mx": [], "my": [], "m2x": [], "cxy": []}
        for s, e in zip(bounds[:-1], bounds[1:]):
            xs, ys = x[s:e], y[s:e]
            mx, my = xs.mean(), ys.mean()
            out["flag"].append(flags[s])
            out["n"].append(int(e - s))
            out["mx"].append(mx)
            out["my"].append(my)
            out["m2x"].append(float(((xs - mx) ** 2).sum()))
            out["cxy"].append(float(((xs - mx) * (ys - my)).sum()))
        return pa.table(
            {
                "l_returnflag": pa.array(out["flag"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "mx": pa.array(out["mx"], pa.float64()),
                "my": pa.array(out["my"], pa.float64()),
                "m2x": pa.array(out["m2x"], pa.float64()),
                "cxy": pa.array(out["cxy"], pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = {"l_returnflag": [], "slope_c": []}
    for flag, g in parts.groupby("l_returnflag", sort=True):
        n = mx = my = m2x = cxy = 0.0
        for r in g.itertuples(index=False):
            nn = n + r.n
            dx, dy = r.mx - mx, r.my - my
            w = n * r.n / nn
            m2x += r.m2x + dx * dx * w
            cxy += r.cxy + dx * dy * w
            mx += dx * r.n / nn
            my += dy * r.n / nn
            n = nn
        rows["l_returnflag"].append(flag)
        rows["slope_c"].append(int(np.floor(cxy / m2x * 100.0 + 0.5)))
    return pa.table(
        {
            "l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
            "slope_c": pa.array(rows["slope_c"], pa.int64()),
        }
    )


def d8_semi_join(sf: str, broadcast_max: int = 5_000_000):
    """Customers WITH at least one urgent high-value order — the
    adaptive SEMI join (complement of j1's anti): distinct filtered
    key set broadcast once + isin filter inside the scan while it fits
    under ``broadcast_max``; a fact-fact semi above that co-partitions
    both sides through the shuffle-join path. Both paths
    equality-tested in tests/test_scale_paths.py."""
    orders = read_table(
        sf, "orders", ["o_custkey", "o_totalprice", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater(t["o_totalprice"], 200000.0),
                pc.equal(t["o_orderpriority"], "1-URGENT"),
            )
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    cust = read_table(sf, "customer", ["c_custkey", "c_name"])
    return adaptive_semi_filter(
        cust, orders, "c_custkey", "o_custkey", anti=False, broadcast_max=broadcast_max
    )


@ray.remote
def _o7_block_counts(t: pa.Table):
    """Per-block (event_type -> row count) over a globally sorted
    block — types and counts only, never rows."""
    et = t["event_type"].to_numpy(zero_copy_only=False)
    types, counts = np.unique(et, return_counts=True)
    return types.tolist(), counts.tolist()


@ray.remote
def _o7_assign(t: pa.Table, off: dict, tot: dict, tiles: int) -> pa.Table:
    """Assign NTILE(tiles) per group given this block's exclusive
    per-group prefix offsets (the block-boundary exchange) and the
    global group totals. NTILE semantics: with n = q*t + r, the first r
    tiles get q+1 rows."""
    et = t["event_type"].to_numpy(zero_copy_only=False)
    starts = np.r_[True, et[1:] != et[:-1]]
    seg = np.cumsum(starts) - 1
    sp = np.flatnonzero(starts)
    local = np.arange(len(et), dtype=np.int64) - sp[seg]
    base = np.array([off[et[i]] for i in sp], np.int64)
    n_all = np.array([tot[et[i]] for i in sp], np.int64)
    i = base[seg] + local  # 0-based index within the full group
    n = n_all[seg]
    q, r = n // tiles, n % tiles
    cut = r * (q + 1)
    lead = i < cut
    tile = np.where(
        lead,
        i // np.maximum(q + 1, 1),
        r + np.where(q > 0, (i - cut) // np.maximum(q, 1), 0),
    ) + 1
    return pa.table(
        {
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "tile": pa.array(tile.astype(np.int64)),
        }
    )


def o7_ntile(sf: str, tiles: int = 4):
    """NTILE(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
    — the bucketed-rank window. Distributed shape: one global range
    sort (the only exchange), then a block-boundary exchange of
    per-(block, group) COUNTS (tiny: groups x blocks) to give every
    block its exclusive prefix offset and the group totals; assignment
    is vectorized per block. No block ever sees another block's rows —
    the same prefix-scan pattern as w9_late_data."""
    ds = read_table(sf, "events", ["event_id", "event_type", "value"])
    blocks = (
        ds.sort(["event_type", "value", "event_id"]).materialize().to_arrow_refs()
    )
    per_block = ray.get([_o7_block_counts.remote(b) for b in blocks])
    run: dict[str, int] = {}
    offsets = []
    for types, counts in per_block:
        offsets.append({ty: run.get(ty, 0) for ty in types})
        for ty, c in zip(types, counts):
            run[ty] = run.get(ty, 0) + int(c)
    out = [
        _o7_assign.remote(b, off, run, tiles) for b, off in zip(blocks, offsets)
    ]
    return ray.data.from_arrow_refs(out)


def s9_jsonl_roundtrip(sf: str):
    """S9 — JSONL sink/source roundtrip: documents write as JSON-lines
    shards (the interchange format most text-corpus tooling speaks),
    read back, and must hash-equal a plain SELECT over the parquet
    original — proving the sink escapes/encodes losslessly and the
    reader re-types int64/string columns exactly. Fixed dir per (query,
    sf), overwritten per call."""
    import shutil

    ds = read_table(sf, "documents", ["doc_id", "text", "lang", "source"])
    out = _roundtrip_dir("jsonl", sf)
    shutil.rmtree(out, ignore_errors=True)
    ds.write_json(out)
    back = ray.data.read_json(out)
    return back.map_batches(
        lambda t: t.select(["doc_id", "text", "lang", "source"]),
        batch_format="pyarrow",
    )


def s10_csv_roundtrip(sf: str):
    """S10 — CSV sink/source roundtrip over the numeric orders columns
    (timestamps/floats excluded: CSV re-parsing of those is
    representation-lossy by design; int columns roundtrip exactly)."""
    import shutil

    ds = read_table(sf, "orders", ["o_orderkey", "o_custkey", "o_orderstatus"])
    out = _roundtrip_dir("csv", sf)
    shutil.rmtree(out, ignore_errors=True)
    ds.write_csv(out)
    back = ray.data.read_csv(out)
    return back.map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "o_custkey": t["o_custkey"].cast(pa.int64()),
                "o_orderstatus": t["o_orderstatus"],
            }
        ),
        batch_format="pyarrow",
    )


def g18_hll_registers(sf: str, p: int = 12):
    """G18 — the HLL sketch's REGISTER STATE as an exact-integer
    contract: g4's ±2% estimate can't cross-check against SQL, but the
    registers themselves (splitmix64 hash -> top-p bucket -> max
    leading-zero rank) are a deterministic integer function of the
    value set, so (Σ registers, #nonzero) hash-check against a DuckDB
    oracle that reproduces the hash in HUGEINT. Proves the 10^10-scale
    distinct sketch bit-for-bit, not just within tolerance; mergeable
    elementwise-max partials per batch, one tiny driver fold."""
    from ..functions.hll import HyperLogLog

    ds = read_table(sf, "lineitem", ["l_partkey"])

    def sketch(t: pa.Table) -> pa.Table:
        h = HyperLogLog(p=p)
        h.add_many(t["l_partkey"].to_numpy().astype(np.uint64))
        return pa.table({"registers": pa.array([h.registers.tobytes()], pa.binary())})

    h = HyperLogLog(p=p)
    for b in ds.map_batches(sketch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=1024
    ):
        for r in b["registers"].to_pylist():
            h.merge_registers(r)
    reg = h.registers
    return pa.table(
        {
            "reg_sum": pa.array([int(reg.sum())], pa.int64()),
            "n_nonzero": pa.array([int((reg > 0).sum())], pa.int64()),
        }
    )


def _ts_us(col) -> np.ndarray:
    return col.cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)


def w10_funnel(sf: str, steps: tuple[str, ...] = ("view", "click", "purchase")):
    """W10 — FUNNEL analysis (the event-analytics staple): per user,
    how deep into the ordered step sequence view -> click -> purchase
    they progressed, each step strictly AFTER the previous one in event
    time. Greedy-earliest is exact for existence (taking the earliest
    qualifying event at each step never forecloses a deeper match), so
    the funnel decomposes into ONE pre-aggregated grouped MIN per step
    — each pass filters on the broadcast previous-step time (user ->
    ts sorted arrays, the j3 pattern; per-user state is user-table-
    sized, the same budget every funnel engine carries). No sort, no
    row shuffle: the shuffle carries one (user, min_ts) row per block
    per step."""
    ds = read_table(sf, "events", ["user_id", "ts", "event_type"])

    def step_pass(step: str, prev_ref):
        def f(t: pa.Table) -> pa.Table:
            t2 = t.filter(pc.equal(t["event_type"], step))
            if t2.num_rows == 0:
                return pa.table(
                    {"user_id": pa.array([], pa.int64()), "ts_us": pa.array([], pa.int64())}
                )
            us = _ts_us(t2["ts"])
            uid = t2["user_id"].to_numpy()
            if prev_ref is not None:
                ks, pt = ray.get(prev_ref)
                if len(ks) == 0:
                    return pa.table(
                        {"user_id": pa.array([], pa.int64()), "ts_us": pa.array([], pa.int64())}
                    )
                idx = np.clip(np.searchsorted(ks, uid), 0, len(ks) - 1)
                keep = (ks[idx] == uid) & (us > pt[idx])
                uid, us = uid[keep], us[keep]
            return pa.table(
                {"user_id": pa.array(uid, pa.int64()), "ts_us": pa.array(us, pa.int64())}
            )

        agg = grouped_agg(
            ds.map_batches(f, batch_format="pyarrow"),
            ["user_id"],
            [("t", "min", "ts_us")],
            round_to=None,
        )
        # per-step user state is user-cardinality (SF-scaling): build
        # the sorted broadcast in a worker with a loud bound (VERDICT
        # r4 item 2), never a driver-side gather
        return dim_ref(agg, "user_id", ("t",))

    refs = []
    prev = None
    for s in steps:
        prev = step_pass(s, prev)
        refs.append(prev)

    users = grouped_agg(
        ds.map_batches(lambda t: t.select(["user_id"]), batch_format="pyarrow"),
        ["user_id"],
        [("__n", "count", None)],
        round_to=None,
    )

    def depth(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy()
        d = np.zeros(len(uid), np.int64)
        for i, r in enumerate(refs, start=1):
            ks = ray.get(r)[0]  # zero-copy plasma read of the shared step table
            if len(ks):
                d = np.where(np.isin(uid, ks), i, d)
        return pa.table(
            {"user_id": pa.array(uid, pa.int64()), "funnel_depth": pa.array(d)}
        )

    return users.map_batches(depth, batch_format="pyarrow").sort("user_id")


def g19_string_agg(sf: str, k: int = 3):
    """G19 — grouped STRING_AGG / collect-list with a deterministic
    order contract: per market segment, the k smallest custkeys as a
    CSV string. Composition: grouped top-k (per-batch partial top-k
    combiner — the o5 pattern — so the shuffle carries k rows per
    (segment, block)) then a tiny per-group stringify. List-shaped
    aggregation results stay bounded (k per group) — the only
    string-agg that makes sense at 100 TB."""
    ds = read_table(sf, "customer", ["c_mktsegment", "c_custkey"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.take(
            pc.sort_indices(
                t, sort_keys=[("c_mktsegment", "ascending"), ("c_custkey", "ascending")]
            )
        )
        seg = np.asarray(t["c_mktsegment"].to_pylist(), dtype=object)
        keys = t["c_custkey"].to_numpy()
        out_s, out_k = [], []
        if len(seg):
            change = np.r_[True, seg[1:] != seg[:-1]]
            grp = np.cumsum(change) - 1
            starts = np.flatnonzero(change)
            for gi, st in enumerate(starts):
                en = starts[gi + 1] if gi + 1 < len(starts) else len(seg)
                take = min(k, en - st)
                out_s.extend([seg[st]] * take)
                out_k.extend(keys[st : st + take].tolist())
        return pa.table(
            {
                "c_mktsegment": pa.array(out_s, pa.string()),
                "c_custkey": pa.array(out_k, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")

    @ray.remote
    def finalize(*blocks: pa.Table) -> pa.Table:
        t = pa.concat_tables(list(blocks)).combine_chunks()
        df = t.to_pandas().sort_values(["c_mktsegment", "c_custkey"])
        rows_s, rows_v = [], []
        for seg, g in df.groupby("c_mktsegment", sort=True):
            rows_s.append(seg)
            rows_v.append(",".join(str(x) for x in g["c_custkey"].head(k)))
        return pa.table(
            {
                "c_mktsegment": pa.array(rows_s, pa.string()),
                "top_custkeys": pa.array(rows_v, pa.string()),
            }
        )

    refs = parts.materialize().to_arrow_refs()
    return ray.data.from_arrow_refs([finalize.remote(*refs)])


_M16_MEASURES = ("l_quantity", "l_discount", "l_tax")


def m16_unpivot(sf: str):
    """M16 — UNPIVOT (wide -> long melt): each lineitem row explodes
    into one (orderkey, linenumber, measure, value_c) row per measure
    column. Pure streaming map (the inverse of g11's pivot); exact
    centi-unit values."""
    cols = ["l_orderkey", "l_linenumber", *list(_M16_MEASURES)]
    ds = read_table(sf, "lineitem", cols)

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ok = t["l_orderkey"].to_numpy()
        ln = t["l_linenumber"].to_numpy().astype(np.int64)
        out_ok = np.tile(ok, len(_M16_MEASURES))
        out_ln = np.tile(ln, len(_M16_MEASURES))
        names = np.repeat(np.array(_M16_MEASURES, object), n)
        vals = np.concatenate([_cents_arr(t[m]) for m in _M16_MEASURES])
        return pa.table(
            {
                "l_orderkey": pa.array(out_ok),
                "l_linenumber": pa.array(out_ln),
                "measure": pa.array(names, pa.string()),
                "value_c": pa.array(vals),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow")


def _cents_arr(col) -> np.ndarray:
    return np.rint(col.to_numpy(zero_copy_only=False) * 100).astype(np.int64)


def g21_cms_registers(sf: str, w: int = 1024, d: int = 4):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) register state
    as an exact-integer contract — the frequency-sketch sibling of
    g18's HLL parity: d seeded splitmix64 rows of w counters over
    l_partkey occurrences (WITH multiplicity — CMS estimates
    frequencies, so no DISTINCT). Counters are integer sums, mergeable
    by + across batches (one sketch per batch, elementwise-add fold),
    and the driver hash-checks three integer folds per row — nonzero
    count, position-weighted checksum, and the collision-sensitive
    sum of squares — against a DuckDB oracle replaying the identical
    HUGEINT hash chain. The point-estimate overcount bound
    (est >= true; est <= true + N/w w.h.p.) is pytest-asserted."""
    from ..functions.hll import _mix64

    ds = read_table(sf, "lineitem", ["l_partkey"])

    def sketch(t: pa.Table) -> pa.Table:
        vals = t["l_partkey"].to_numpy().astype(np.uint64)
        rows = []
        for seed in range(d):
            h = _mix64(vals ^ np.uint64(seed)) % np.uint64(w)
            rows.append(np.bincount(h.astype(np.int64), minlength=w))
        return pa.table({"reg": pa.array(np.concatenate(rows), pa.int64())})

    acc = np.zeros(d * w, np.int64)
    for b in ds.map_batches(sketch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=d * w
    ):
        r = b["reg"].to_numpy()
        if len(r) != d * w:
            raise ValueError("g21: sketch block split unexpectedly")
        acc += r
    out_seed, out_nz, out_chk, out_sq = [], [], [], []
    for seed in range(d):
        cnt = acc[seed * w : (seed + 1) * w]
        nz = np.flatnonzero(cnt)
        out_seed.append(seed)
        out_nz.append(len(nz))
        out_chk.append(int(((nz + 1) * cnt[nz]).sum()))
        out_sq.append(int((cnt[nz].astype(np.int64) ** 2).sum()))
    return pa.table(
        {
            "seed": pa.array(out_seed, pa.int64()),
            "n_nonzero": pa.array(out_nz, pa.int64()),
            "chk": pa.array(out_chk, pa.int64()),
            "sq": pa.array(out_sq, pa.int64()),
        }
    )


def cms_point_estimate(sf: str, keys: np.ndarray, w: int = 1024, d: int = 4) -> np.ndarray:
    """CMS point queries (min over rows) for the pytest bound check."""
    from ..functions.hll import _mix64

    ds = read_table(sf, "lineitem", ["l_partkey"])
    acc = np.zeros((d, w), np.int64)
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=262144):
        vals = b["l_partkey"].to_numpy().astype(np.uint64)
        for seed in range(d):
            h = _mix64(vals ^ np.uint64(seed)) % np.uint64(w)
            acc[seed] += np.bincount(h.astype(np.int64), minlength=w)
    ks = np.asarray(keys, np.uint64)
    ests = np.stack(
        [acc[seed][(_mix64(ks ^ np.uint64(seed)) % np.uint64(w)).astype(np.int64)] for seed in range(d)]
    )
    return ests.min(axis=0)


def j8_range_join(sf: str, key_mod: int = 499, days: int = 30, window_max: int = 50_000_000):
    """Interval (range) join — the non-equi join Ray Data lacks
    natively: promo windows [o_orderdate, +days) drawn from a key
    residue of orders, joined to lineitem on l_shipdate containment
    with NO equality key. Plan: the window set is interval-count-sized
    (broadcast once as two sorted int arrays); each lineitem batch
    counts containment by sorting the batch ONCE and answering every
    window with two searchsorted probes (count(v < hi) - count(v < lo)
    — exact for half-open intervals, O(B log B + W log B) per batch
    instead of O(W x B) comparisons; overlapping windows are free
    since each is an independent rank query). Counts pre-aggregate per
    batch; only (window_id, partial_count) rows shuffle."""
    windows = read_table(sf, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table(
            {
                "window_id": t["o_orderkey"],
                "lo_us": pa.array(
                    t["o_orderdate"].to_numpy().astype("datetime64[us]").astype(np.int64)
                ),
            }
        ).filter(pa.array(t["o_orderkey"].to_numpy() % key_mod == 0)),
        batch_format="pyarrow",
    )
    # window-count-sized (1/key_mod of orders) by default, but a caller
    # passing a small key_mod would turn the old driver .to_pandas()
    # into an unbounded gather — build the sorted broadcast in a worker
    # with the loud window_max bound instead (ADVICE r4)
    ref = dim_ref(windows, "window_id", ("lo_us",), dim_max=window_max)

    li = read_table(sf, "lineitem", ["l_shipdate"])

    day_us = np.int64(days) * 86_400_000_000

    def count_in_windows(t: pa.Table) -> pa.Table:
        ws, lo_ = ray.get(ref)
        lo_ = lo_.astype(np.int64)
        sd = np.sort(t["l_shipdate"].to_numpy().astype("datetime64[us]").astype(np.int64))
        n = np.searchsorted(sd, lo_ + day_us, side="left") - np.searchsorted(sd, lo_, side="left")
        return pa.table({"window_id": pa.array(ws, pa.int64()), "n_ships": pa.array(n.astype(np.int64))})

    partials = li.map_batches(count_in_windows, batch_format="pyarrow")
    return grouped_agg(partials, ["window_id"], [("n_ships", "sum", "n_ships")], round_to=None).sort(
        "window_id"
    )


def salted_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: str,
    n_salt: int = 16,
    salt_col: str | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Hot-key (skew-safe) shuffle join: a plain hash join on a
    low-cardinality key sends EVERY row of a hot key to one partition
    — the aggregator for 'A' holds a quarter of a 100-TB fact table
    while the others idle. Salting splits each hot key into ``n_salt``
    sub-keys: the fact side gets a deterministic salt from an
    unrelated high-cardinality column (``salt_col``, splitmix-mixed so
    residue bias can't cluster), the small side replicates n_salt x
    (dimension-sized — cheap), and the join runs on (key, salt) with
    each hot key now spread over n_salt partitions. Join semantics are
    exactly the unsalted inner join (pytest + SQL oracle); n_salt
    bounds the per-partition share of a hot key at 1/n_salt."""
    if salt_col is None:
        raise ValueError("salted_join: salt_col required (fact-side high-cardinality column)")

    def add_salt(t: pa.Table) -> pa.Table:
        v = t[salt_col].to_numpy().astype(np.uint64)
        s = ((v * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)) % np.uint64(n_salt)
        return t.append_column("__salt", pa.array(s.astype(np.int32)))

    def replicate(t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = np.repeat(np.arange(n, dtype=np.int64), n_salt)
        out = t.take(pa.array(idx))
        salts = np.tile(np.arange(n_salt, dtype=np.int32), n)
        return out.append_column("__salt", pa.array(salts))

    lsalted = left.map_batches(add_salt, batch_format="pyarrow")
    rsalted = right.map_batches(replicate, batch_format="pyarrow")
    joined = _nonempty(lsalted).join(
        _nonempty(rsalted),
        join_type="inner",
        num_partitions=num_partitions or _npart(),
        on=(on, "__salt"),
        right_on=(right_on, "__salt"),
    )
    drop = ["__salt"] + ([right_on] if right_on != on else [])
    return joined.map_batches(
        lambda t: t.drop_columns([c for c in drop if c in t.column_names]),
        batch_format="pyarrow",
    )


def j9_salted_join(sf: str, n_salt: int = 16):
    """Maximally skewed join demo: lineitem (fact) joins a 3-row
    weight dimension ON l_returnflag — three hot keys that would land
    on three partitions unsalted. Goes through salted_join (salt from
    l_orderkey), then a grouped integer aggregate. Oracle is the plain
    unsalted SQL join — salting must be semantically invisible."""
    dim = ray.data.from_arrow(
        pa.table(
            {
                "flag": pa.array(["A", "N", "R"]),
                "weight": pa.array([1, 2, 3], pa.int64()),
            }
        )
    )
    from ..sources.testdata import table_rows

    li = read_table(sf, "lineitem", ["l_orderkey", "l_returnflag", "l_quantity"])
    j = salted_join(
        li, dim, "l_returnflag", "flag", n_salt=n_salt, salt_col="l_orderkey",
        num_partitions=_npart(table_rows(sf, "lineitem")),
    )

    def wq(t: pa.Table) -> pa.Table:
        q = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "wq_c": pa.array(q * t["weight"].to_numpy()),
            }
        )

    return grouped_agg(
        j.map_batches(wq, batch_format="pyarrow"),
        ["l_returnflag"],
        [("n", "count", None), ("sum_wq_c", "sum", "wq_c")],
        round_to=None,
    ).sort("l_returnflag")


def o8_percent_rank(sf: str):
    """PERCENT_RANK window function with an integer-exact contract
    (completes the rank family beside w8's DENSE_RANK and o7's NTILE):
    customers ranked within their market segment by balance cents;
    pr_e6 = (rank-1) * 10^6 // (n-1) so the [0, 1] fraction becomes an
    exact BIGINT both engines agree on (n=1 partitions emit 0). Same
    skew note as w8: one partition per segment is the SEMANTICS of a
    global per-segment rank — a hot segment lands whole, where the
    work stays one vectorized sort."""
    import hashlib as _hl

    ds = read_table(sf, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])

    def with_key(t: pa.Table) -> pa.Table:
        seg = np.asarray(t["c_mktsegment"].to_pylist(), dtype=object)
        uniq, inv = np.unique(seg, return_inverse=True)
        uh = np.array(
            [int.from_bytes(_hl.md5(u.encode()).digest()[:4], "big") for u in uniq],
            np.int64,
        )  # md5 per UNIQUE segment (5 values), not per row
        bal_c = np.rint(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_mktsegment": t["c_mktsegment"],
                "bal_c": pa.array(bal_c),
                "__k": pa.array(uh[inv]),
            }
        )

    def pr_part(t: pa.Table) -> pa.Table:
        t = t.take(
            pc.sort_indices(
                t, sort_keys=[("c_mktsegment", "ascending"), ("bal_c", "ascending")]
            )
        )
        seg = np.asarray(t["c_mktsegment"].to_pylist(), dtype=object)
        bal = t["bal_c"].to_numpy()
        starts = np.r_[True, seg[1:] != seg[:-1]]
        segidx = np.cumsum(starts) - 1
        pos = np.arange(len(seg), dtype=np.int64)
        segbase = pos[starts]
        # RANK with ties: first position of the current value run
        newval = np.r_[True, (bal[1:] != bal[:-1])] | starts
        runstart = pos[newval]
        rank = runstart[np.cumsum(newval) - 1] - segbase[segidx] + 1
        n = np.bincount(segidx)[segidx]
        pr = np.where(n > 1, (rank - 1) * 1_000_000 // np.maximum(n - 1, 1), 0)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "pr_e6": pa.array(pr.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(with_key, batch_format="pyarrow")
        .groupby("__k")
        .map_groups(pr_part, batch_format="pyarrow")
    )


def s11_pushdown_scan(sf: str, lo: str = "1995-01-01", hi: str = "1996-01-01"):
    """S11 — predicate-pushdown scan: the date filter travels INTO the
    parquet scanner as a pyarrow dataset expression (row groups whose
    min/max stats exclude the window are skipped at storage), the
    opposite of read-everything-then-filter. Result: per-priority
    order counts + cents totals inside the window; the SQL oracle is
    the plain WHERE form, so pushdown must be semantically invisible."""
    import pyarrow.dataset as pads

    from ..sources.testdata import read_table_filtered

    expr = (pads.field("o_orderdate") >= pa.scalar(np.datetime64(lo, "us"))) & (
        pads.field("o_orderdate") < pa.scalar(np.datetime64(hi, "us"))
    )
    ds = read_table_filtered(
        sf, "orders", ["o_orderpriority", "o_totalprice", "o_orderdate"], expr
    )

    def cents(t: pa.Table) -> pa.Table:
        v = np.rint(t["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"o_orderpriority": t["o_orderpriority"], "price_c": pa.array(v)})

    return grouped_agg(
        ds.map_batches(cents, batch_format="pyarrow"),
        ["o_orderpriority"],
        [("n", "count", None), ("sum_price_c", "sum", "price_c")],
        round_to=None,
    ).sort("o_orderpriority")


def g22_grouped_hll_registers(sf: str, p: int = 12):
    """g14's grouped HLL proven bit-exact (the g18 trick per group):
    per-group register folds (Σ registers, #nonzero) hash-check
    against a DuckDB oracle replaying the splitmix64 chain GROUP BY
    key — the grouped sketch stops being rows-only. Mergeable
    register-wise max partials per (group, batch); the final fold is
    groups x 2 integers."""
    from ..functions.hll import HyperLogLog

    ds = read_table(sf, "lineitem", ["l_returnflag", "l_partkey"])
    m = 1 << p

    def sketch_block(t: pa.Table) -> pa.Table:
        flags = np.asarray(t["l_returnflag"].to_pylist(), dtype=object)
        pk = t["l_partkey"].to_numpy().astype(np.uint64)
        order = np.argsort(flags, kind="stable")
        flags, pk = flags[order], pk[order]
        starts = np.flatnonzero(np.r_[True, flags[1:] != flags[:-1]])
        bounds = np.r_[starts, len(flags)]
        out_f, out_r = [], []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            h = HyperLogLog(p=p)
            h.add_many(pk[lo:hi])
            out_f.append(flags[lo])
            out_r.append(h.registers.tobytes())
        return pa.table(
            {
                "g": pa.array(out_f, pa.string()),
                "registers": pa.array(out_r, pa.binary()),
            }
        )

    acc: dict[str, np.ndarray] = {}
    for b in ds.map_batches(sketch_block, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=4096
    ):
        for g, r in zip(b["g"].to_pylist(), b["registers"].to_pylist()):
            arr = np.frombuffer(r, np.uint8)
            cur = acc.get(g)
            acc[g] = arr.copy() if cur is None else np.maximum(cur, arr)
    out_g, out_s, out_n = [], [], []
    for g in sorted(acc):
        reg = acc[g]
        out_g.append(g)
        out_s.append(int(reg.astype(np.int64).sum()))
        out_n.append(int((reg > 0).sum()))
    return pa.table(
        {
            "l_returnflag": pa.array(out_g, pa.string()),
            "reg_sum": pa.array(out_s, pa.int64()),
            "n_nonzero": pa.array(out_n, pa.int64()),
        }
    )


def j10_asof(sf: str):
    """AS-OF JOIN (the time-series join Ray Data lacks; DuckDB runs it
    natively as the oracle): each 'click' event matches the latest
    'view' event of the same user at or before its timestamp — the
    classic attribution join. Output per click: (event_id, user_id,
    ts_us, view_ts_us, gap_us), sentinel -1 for never-viewed users
    (null-free hash compare, the w7 convention). Deterministic even
    under tied view timestamps: the JOINED VALUE is the max view ts,
    which is unique regardless of which tied row an engine picks.

    Distributed shape: both sides co-partition by user_id in ONE
    hash shuffle (side-tagged union); within a partition one lexsort
    by (user_id, ts, side) with views ordered before clicks at equal
    ts (>= semantics), then a grouped forward-max fills the latest
    view ts — no per-key loop, no driver state; the merge is
    O(partition) after sort exactly like a multi-node sort-merge
    as-of."""
    ds = read_table(sf, "events", ["event_id", "user_id", "ts", "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "view") | (et == "click")
        t = t.filter(pa.array(keep))
        side = (t["event_type"].to_numpy(zero_copy_only=False) == "click").astype(np.int8)
        return pa.table(
            {
                "event_id": t["event_id"].cast(pa.int64()),
                "user_id": t["user_id"].cast(pa.int64()),
                "ts_us": pa.array(
                    t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
                ),
                "side": pa.array(side.astype(np.int64), pa.int64()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def asof_part(t: pa.Table) -> pa.Table:
        import pandas as pd

        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, ts, uid))  # views before clicks at ties
        uid, ts, side, eid = uid[order], ts[order], side[order], eid[order]
        seg = np.cumsum(np.r_[True, uid[1:] != uid[:-1]])
        v = np.where(side == 0, ts, np.int64(-1))
        # grouped forward max: latest view ts seen so far within user
        last_view = pd.Series(v).groupby(seg).cummax().to_numpy()
        clicks = side == 1
        vts = last_view[clicks]
        gap = np.where(vts >= 0, ts[clicks] - vts, np.int64(-1))
        return pa.table(
            {
                "event_id": pa.array(eid[clicks], pa.int64()),
                "user_id": pa.array(uid[clicks], pa.int64()),
                "ts_us": pa.array(ts[clicks], pa.int64()),
                "view_ts_us": pa.array(vts, pa.int64()),
                "gap_us": pa.array(gap, pa.int64()),
            }
        )

    return (
        _hash_partitioned(tagged, "user_id", _npart())
        .map_groups(asof_part, batch_format="pyarrow")
        .sort("event_id")
    )


def j10_asof_sql() -> str:
    return (
        "WITH c AS (SELECT * FROM events WHERE event_type = 'click'), "
        "v AS (SELECT * FROM events WHERE event_type = 'view') "
        "SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, "
        "COALESCE(epoch_us(v.ts), -1) AS view_ts_us, "
        "COALESCE(epoch_us(c.ts) - epoch_us(v.ts), -1) AS gap_us "
        "FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts "
        "ORDER BY c.event_id"
    )


def o9_topk_per_group(sf: str, k: int = 3):
    """Top-k per group (grouped LIMIT — the per-category leaderboard
    every analytics pipeline runs): top-k orders by price within each
    order priority. Same combiner discipline as the global topk
    (VERDICT r4 item 4): each block keeps at most k rows PER GROUP, so
    the shuffle carries k x groups x blocks rows, then one small
    per-group finalize; the full table never range-sorts."""
    ds = read_table(sf, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        p = np.rint(t["o_totalprice"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "price_c": pa.array(p, pa.int64()),
            }
        )

    keys = [
        ("o_orderpriority", "ascending"),
        ("price_c", "descending"),
        ("o_orderkey", "ascending"),
    ]

    def partial(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        g = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        # rank within group after the sort: position since group start
        starts = np.r_[True, g[1:] != g[:-1]]
        gidx = np.arange(len(g)) - np.maximum.accumulate(
            np.where(starts, np.arange(len(g)), 0)
        )
        return t.filter(pa.array(gidx < k))

    parts = ds.map_batches(cents, batch_format="pyarrow").map_batches(
        partial, batch_format="pyarrow"
    )

    def finalize(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"]).take(pc.sort_indices(t, sort_keys=keys))
        g = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        starts = np.r_[True, g[1:] != g[:-1]]
        gidx = np.arange(len(g)) - np.maximum.accumulate(
            np.where(starts, np.arange(len(g)), 0)
        )
        t = t.filter(pa.array(gidx < k))
        g2 = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        starts2 = np.r_[True, g2[1:] != g2[:-1]]
        rnk = np.arange(len(g2)) - np.maximum.accumulate(
            np.where(starts2, np.arange(len(g2)), 0)
        )
        return t.append_column("rnk", pa.array(rnk + 1, pa.int64()))

    return (
        _hash_partitioned_any(parts, ["o_orderpriority"], _npart())
        .map_groups(finalize, batch_format="pyarrow")
        .sort(["o_orderpriority", "rnk"])
    )


def o9_topk_per_group_sql(k: int = 3) -> str:
    return (
        "SELECT o_orderpriority, o_orderkey, price_c, rnk FROM ("
        "SELECT o_orderpriority, o_orderkey, "
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_c, "
        "ROW_NUMBER() OVER (PARTITION BY o_orderpriority "
        "ORDER BY CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) DESC, o_orderkey) AS rnk "
        f"FROM orders) WHERE rnk <= {k} ORDER BY o_orderpriority, rnk"
    )


def w11_sessionize(sf: str, gap_minutes: int = 30):
    """Gap-based sessionization (the canonical streaming-analytics
    windowing op): per user, a new session starts when the gap to the
    previous event exceeds ``gap_minutes``. Output one row per session:
    (user_id, session_start_us, n_events, dur_us). One hash shuffle
    co-partitions by user_id; within a partition one sort + vectorized
    gap/cumsum/reduceat — all sessions of a user live in one partition
    by construction, so the segment aggregation is exact."""
    gap_us = np.int64(gap_minutes * 60 * 1_000_000)
    ds = read_table(sf, "events", ["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"].cast(pa.int64()),
                "us": pa.array(
                    t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
                ),
            }
        )

    def sess_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((us, uid))
        uid, us = uid[order], us[order]
        if len(uid) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_start_us": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "dur_us": pa.array([], pa.int64()),
                }
            )
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        brk = new_user | np.r_[True, (us[1:] - us[:-1]) > gap_us]
        starts = np.flatnonzero(brk)
        n_ev = np.diff(np.r_[starts, len(uid)])
        ends = np.r_[starts[1:], len(uid)] - 1
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_start_us": pa.array(us[starts], pa.int64()),
                "n_events": pa.array(n_ev.astype(np.int64), pa.int64()),
                "dur_us": pa.array(us[ends] - us[starts], pa.int64()),
            }
        )

    tagged = ds.map_batches(prep, batch_format="pyarrow")
    return (
        _hash_partitioned(tagged, "user_id", _npart())
        .map_groups(
            lambda t: sess_part(t.drop_columns(["__part"]) if "__part" in t.column_names else t),
            batch_format="pyarrow",
        )
        .sort(["user_id", "session_start_us"])
    )


def w11_sessionize_sql(gap_minutes: int = 30) -> str:
    g = gap_minutes * 60 * 1_000_000
    return (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events), "
        "m AS (SELECT user_id, us, CASE WHEN us - LAG(us) OVER "
        f"(PARTITION BY user_id ORDER BY us) > {g} OR LAG(us) OVER "
        "(PARTITION BY user_id ORDER BY us) IS NULL THEN 1 ELSE 0 END AS brk FROM e), "
        "s AS (SELECT user_id, us, SUM(brk) OVER (PARTITION BY user_id ORDER BY us "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM m) "
        "SELECT user_id, MIN(us) AS session_start_us, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, MAX(us) - MIN(us) AS dur_us "
        "FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us"
    )


def g24_skew_kurt(sf: str):
    """Grouped skewness + kurtosis per event_type over events.value —
    the 3rd/4th-moment family completing g5 (mean/std) and g12 (corr).
    Same mergeable-centered-moments discipline as g12, extended to M3
    and M4 with Pébay's pairwise update (naive power sums cancel ~10
    significant digits at the 4th moment — enough to flip the
    e4-rounded output). Per batch: one grouped pass -> per-type
    (n, mean, M2, M3, M4); partials merge pairwise in a result-sized
    driver fold (rows = types x blocks). Output matches DuckDB's
    bias-corrected G1 / excess-G2 definitions, CAST(ROUND(x*10000) AS
    BIGINT) on both engines."""
    ds = read_table(sf, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        x = t["value"].to_numpy()
        order = np.argsort(et, kind="stable")
        et, x = et[order], x[order]
        starts = np.r_[True, et[1:] != et[:-1]] if len(et) else np.zeros(0, bool)
        idx = np.flatnonzero(starts)
        out = {"event_type": [], "n": [], "m": [], "m2": [], "m3": [], "m4": []}
        bounds = np.r_[idx, len(et)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            xs = x[s:e]
            mu = xs.mean()
            d = xs - mu
            out["event_type"].append(et[s])
            out["n"].append(int(e - s))
            out["m"].append(mu)
            out["m2"].append(float((d**2).sum()))
            out["m3"].append(float((d**3).sum()))
            out["m4"].append(float((d**4).sum()))
        return pa.table(
            {
                "event_type": pa.array(out["event_type"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "m": pa.array(out["m"], pa.float64()),
                "m2": pa.array(out["m2"], pa.float64()),
                "m3": pa.array(out["m3"], pa.float64()),
                "m4": pa.array(out["m4"], pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = {"event_type": [], "skew_e4": [], "kurt_e4": []}
    for et, g in parts.groupby("event_type", sort=True):
        n = m = m2 = m3 = m4 = 0.0
        for r in g.itertuples(index=False):
            # Pébay pairwise merge of ((n,m,M2,M3,M4), r)
            nn = n + r.n
            d = r.m - m
            na, nb = n, float(r.n)
            m4 = (
                m4
                + r.m4
                + d**4 * na * nb * (na**2 - na * nb + nb**2) / nn**3
                + 6.0 * d**2 * (na**2 * r.m2 + nb**2 * m2) / nn**2
                + 4.0 * d * (na * r.m3 - nb * m3) / nn
            )
            m3 = (
                m3
                + r.m3
                + d**3 * na * nb * (na - nb) / nn**2
                + 3.0 * d * (na * r.m2 - nb * m2) / nn
            )
            m2 = m2 + r.m2 + d * d * na * nb / nn
            m = m + d * nb / nn
            n = nn
        rows["event_type"].append(et)
        # degenerate groups match DuckDB's NULLs exactly: skewness is
        # NULL for n < 3 or zero variance, kurtosis for n < 4 or zero
        # variance (verified against DuckDB 1.0 on constant / tiny
        # groups) — the 0/0 would otherwise NaN-crash the int cast
        if n < 3 or m2 == 0.0:
            rows["skew_e4"].append(None)
        else:
            g1 = (m3 / n) / (m2 / n) ** 1.5
            skew = g1 * np.sqrt(n * (n - 1.0)) / (n - 2.0)
            rows["skew_e4"].append(int(np.floor(skew * 10000.0 + 0.5)))
        if n < 4 or m2 == 0.0:
            rows["kurt_e4"].append(None)
        else:
            g2 = (m4 / n) / (m2 / n) ** 2 - 3.0
            kurt = ((n + 1.0) * g2 + 6.0) * (n - 1.0) / ((n - 2.0) * (n - 3.0))
            rows["kurt_e4"].append(int(np.floor(kurt * 10000.0 + 0.5)))
    return pa.table(
        {
            "event_type": pa.array(rows["event_type"], pa.string()),
            "skew_e4": pa.array(rows["skew_e4"], pa.int64()),
            "kurt_e4": pa.array(rows["kurt_e4"], pa.int64()),
        }
    )


def g24_skew_kurt_sql() -> str:
    return (
        "SELECT event_type, "
        "CAST(ROUND(skewness(value) * 10000, 0) AS BIGINT) AS skew_e4, "
        "CAST(ROUND(kurtosis(value) * 10000, 0) AS BIGINT) AS kurt_e4 "
        "FROM events GROUP BY event_type ORDER BY event_type"
    )


def o10_weighted_sample(sf: str, k: int = 20):
    """Deterministic WEIGHTED sample — sequential Poisson / priority
    sampling (Ohlsson; Duffield et al.), with a hash in place of the
    random draw: priority = u/w, bottom-k. (NOT Efraimidis-Spirakis
    A-ES, whose key is u^(1/w) — a different inclusion distribution;
    priority sampling trades A-ES's exact PPS-without-replacement law
    for an integer-exact, subset-sum-unbiased scheme.) k orders picked
    with probability increasing in o_totalprice, reproducible across
    engines AND block splits. score = floor(mix32(o_orderkey) << 20 /
    price_cents); the k SMALLEST scores win. Entirely integer
    (h < 2^32, << 20 < 2^52), so the DuckDB mirror is bit-exact (the
    SQL does the 32-bit hash in HUGEINT — the raw key*constant product
    overflows BIGINT past orderkey ~3.5e9, where numpy wraps mod 2^64;
    both reduce to the same value mod 2^32). Combiner discipline: each
    block keeps its local bottom-k, one k x blocks finalize — never a
    global sort."""
    ds = read_table(sf, "orders", ["o_orderkey", "o_totalprice"])

    def local_bottomk(t: pa.Table) -> pa.Table:
        if "score" not in t.column_names:
            key = t["o_orderkey"].to_numpy().astype(np.int64)
            w_c = np.rint(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
            h = (key * 2654435761) % 4294967296
            score = (h << 20) // w_c
            t = pa.table(
                {
                    "o_orderkey": pa.array(key, pa.int64()),
                    "score": pa.array(score, pa.int64()),
                }
            )
        t = t.take(
            pc.sort_indices(
                t, sort_keys=[("score", "ascending"), ("o_orderkey", "ascending")]
            )
        )
        return t.slice(0, k)

    cands = ds.map_batches(local_bottomk, batch_format="pyarrow")
    t = pa.concat_tables(
        list(cands.iter_batches(batch_format="pyarrow", batch_size=65536))
    ).combine_chunks()
    return local_bottomk(t)


def o10_weighted_sample_sql(k: int = 20) -> str:
    return (
        "SELECT o_orderkey, score FROM ("
        "SELECT o_orderkey, CAST("
        "(((CAST(o_orderkey AS HUGEINT) * 2654435761) % 4294967296) * 1048576) "
        "// CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS BIGINT) AS score "
        f"FROM orders) ORDER BY score, o_orderkey LIMIT {k}"
    )


def m17_gaps_islands(sf: str, broadcast_max: int = 5_000_000):
    """Gaps-and-islands, the fully-distributed formulation: maximal
    runs of consecutive event_ids among 'click' events. The classic
    SQL solution (id - ROW_NUMBER() grouping) needs a total order; at
    100 TB that's a global sort. Instead: an island START is an id
    whose predecessor id-1 is absent (anti-join of ids against ids+1),
    an island END is one whose successor is absent — two
    adaptive_semi_filter anti passes (broadcast under 5M keys,
    co-partitioned shuffle above), then a result-sized zip of the
    sorted starts with the sorted ends (the k-th start always pairs
    with the k-th end). No stage ever totally orders the input."""
    # materialized once: the id set feeds four consumers (probe+build
    # of each anti pass) — int64-only, so object-store resident even
    # at 100 TB of events
    ids = (
        read_table(sf, "events", ["event_id", "event_type"])
        .map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "click")).select(
                ["event_id"]
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def shift(delta: int):
        def f(t: pa.Table) -> pa.Table:
            v = t["event_id"].to_numpy().astype(np.int64) + delta
            return pa.table({"event_id": pa.array(v, pa.int64())})

        return f

    starts = adaptive_semi_filter(
        ids,
        ids.map_batches(shift(1), batch_format="pyarrow"),
        "event_id",
        "event_id",
        anti=True,
        broadcast_max=broadcast_max,
    )
    ends = adaptive_semi_filter(
        ids,
        ids.map_batches(shift(-1), batch_format="pyarrow"),
        "event_id",
        "event_id",
        anti=True,
        broadcast_max=broadcast_max,
    )
    s = np.sort(
        pa.concat_tables(
            list(starts.iter_batches(batch_format="pyarrow", batch_size=65536))
        )["event_id"].to_numpy()
    )
    e = np.sort(
        pa.concat_tables(
            list(ends.iter_batches(batch_format="pyarrow", batch_size=65536))
        )["event_id"].to_numpy()
    )
    assert len(s) == len(e), "island starts/ends must pair 1:1"
    return pa.table(
        {
            "island_start": pa.array(s, pa.int64()),
            "island_end": pa.array(e, pa.int64()),
            "island_len": pa.array(e - s + 1, pa.int64()),
        }
    )


def m17_gaps_islands_sql() -> str:
    return (
        "WITH c AS (SELECT event_id FROM events WHERE event_type = 'click'), "
        "g AS (SELECT event_id, event_id - ROW_NUMBER() OVER (ORDER BY event_id) "
        "AS grp FROM c) "
        "SELECT MIN(event_id) AS island_start, MAX(event_id) AS island_end, "
        "CAST(COUNT(*) AS BIGINT) AS island_len "
        "FROM g GROUP BY grp ORDER BY island_start"
    )


def d9_except_all(sf: str):
    """EXCEPT ALL — multiset difference with multiplicity (d5 is the
    set form): l_partkey occurrences under returnflag 'A' minus those
    under 'R'. Distributed as count-subtract-reexpand: per-batch
    grouped counts tagged by side (the partial-aggregation combiner),
    hash-co-partitioned by partkey, per-partition merge -> surviving
    multiplicity max(cA - cB, 0), then a VECTORIZED np.repeat
    re-expansion inside the partition. The shuffle carries one row per
    (block, key, side) — never the raw multiset."""
    li = read_table(sf, "lineitem", ["l_partkey", "l_returnflag"])

    def counts(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.or_(pc.equal(t["l_returnflag"], "A"), pc.equal(t["l_returnflag"], "R"))
        )
        g = (
            t.group_by(["l_partkey", "l_returnflag"])
            .aggregate([("l_partkey", "count")])
            .rename_columns(["l_partkey", "side", "cnt"])
        )
        return g

    parts = li.map_batches(counts, batch_format="pyarrow")

    def expand(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"]) if "__part" in t.column_names else t
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        side = t["side"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy().astype(np.int64)
        order = np.argsort(pk, kind="stable")
        pk, side, cnt = pk[order], side[order], cnt[order]
        starts = np.r_[True, pk[1:] != pk[:-1]] if len(pk) else np.zeros(0, bool)
        gid = np.cumsum(starts) - 1
        n_g = int(gid[-1]) + 1 if len(gid) else 0
        ca = np.zeros(n_g, np.int64)
        cb = np.zeros(n_g, np.int64)
        np.add.at(ca, gid[side == "A"], cnt[side == "A"])
        np.add.at(cb, gid[side == "R"], cnt[side == "R"])
        keep = np.maximum(ca - cb, 0)
        keys = pk[np.flatnonzero(starts)] if len(pk) else pk
        return pa.table(
            {"l_partkey": pa.array(np.repeat(keys, keep), pa.int64())}
        )

    return (
        _hash_partitioned_any(parts, ["l_partkey"], _npart())
        .map_groups(expand, batch_format="pyarrow")
        .sort("l_partkey")
    )


def d9_except_all_sql() -> str:
    return (
        "SELECT * FROM ("
        "SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A' "
        "EXCEPT ALL "
        "SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R') "
        "ORDER BY l_partkey"
    )


def g25_entropy(sf: str):
    """Grouped Shannon entropy (base 2, DuckDB's entropy()) of the
    order-priority distribution per order status — the distribution-
    balance diagnostic a training-mix pipeline runs per source. The
    sufficient statistic is just the (group, value) count table: a
    per-batch grouped-count combiner shuffles groups x values x blocks
    tiny count rows, one result-sized driver fold computes
    -sum(p*log2(p)). Output CAST(ROUND(entropy*10000) AS BIGINT) on
    both engines."""
    ds = read_table(sf, "orders", ["o_orderstatus", "o_orderpriority"])

    def counts(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["o_orderstatus", "o_orderpriority"])
            .aggregate([("o_orderstatus", "count")])
            .rename_columns(["o_orderstatus", "o_orderpriority", "cnt"])
        )

    parts = ds.map_batches(counts, batch_format="pyarrow").to_pandas()
    merged = (
        parts.groupby(["o_orderstatus", "o_orderpriority"], as_index=False)["cnt"]
        .sum()
    )
    out = {"o_orderstatus": [], "entropy_e4": []}
    for st, g in merged.groupby("o_orderstatus", sort=True):
        c = g["cnt"].to_numpy().astype(np.float64)
        p = c / c.sum()
        h = float(-(p * np.log2(p)).sum())
        out["o_orderstatus"].append(st)
        out["entropy_e4"].append(int(np.floor(h * 10000.0 + 0.5)))
    return pa.table(
        {
            "o_orderstatus": pa.array(out["o_orderstatus"], pa.string()),
            "entropy_e4": pa.array(out["entropy_e4"], pa.int64()),
        }
    )


def g25_entropy_sql() -> str:
    return (
        "SELECT o_orderstatus, "
        "CAST(ROUND(entropy(o_orderpriority) * 10000, 0) AS BIGINT) AS entropy_e4 "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )


def _e_units(v: np.ndarray, scale: float) -> np.ndarray:
    """ROUND(v*scale) with HALF-AWAY-FROM-ZERO ties — exactly DuckDB's
    ROUND, valid on negative values too (floor(x+0.5) alone is half-UP
    and diverges at negative .5 ties)."""
    s = v * scale
    return np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)).astype(np.int64)


def g26_argmax(sf: str):
    """Grouped ARG-MAX (continuation session): per event_type, the
    user responsible for the maximum value (deterministic ties:
    smallest user_id at the max). The quantity is integer e4 units
    rounded HALF-AWAY per row BEFORE the max (both engines round the
    identical stored double, so comparisons are exact; rounding after
    a float max would be equally exact here but the per-row integer
    domain also makes the tie semantics integer-exact).

    Distributed shape: one grouped max (group-cardinality result,
    combiner-first), the tiny max table broadcast as a plain dict into
    a streaming filter (rows at the group max — at most a few per
    group), then a grouped min over the survivors. Two streaming
    passes, no shuffle beyond the group-sized aggregates; the pattern
    scales to any group count because the broadcast is
    group-cardinality, not row-cardinality."""
    ds = read_table(sf, "events", ["event_type", "user_id", "value"])

    def e4(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t["event_type"],
                "user_id": t["user_id"],
                "v_e4": pa.array(_e_units(v, 10000.0)),
            }
        )

    # materialize: rows feeds BOTH the max pass and the at-max filter
    # (lazy datasets would re-read + re-quantize the parquet twice)
    rows = ds.map_batches(e4, batch_format="pyarrow").materialize()
    mx = grouped_agg(rows, ["event_type"], [("max_e4", "max", "v_e4")], round_to=None)
    mx_map = {
        k: int(v)
        for b in mx.iter_batches(batch_format="pyarrow", batch_size=65536)
        for k, v in zip(b["event_type"].to_pylist(), b["max_e4"].to_pylist())
    }

    mx_keys = pa.array(list(mx_map), pa.string())
    mx_vals = np.array([mx_map[k] for k in mx_map], np.int64)

    def at_max(t: pa.Table, _k=mx_keys, _v=mx_vals) -> pa.Table:
        # vectorized group-max lookup: dictionary-position index_in,
        # then one aligned compare — no per-row Python
        pos = (
            pc.fill_null(pc.index_in(t["event_type"], _k), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        v = t["v_e4"].to_numpy()
        keep = np.where(pos >= 0, _v[np.maximum(pos, 0)] == v, False)
        return t.filter(pa.array(keep))

    out = grouped_agg(
        rows.map_batches(at_max, batch_format="pyarrow"),
        ["event_type"],
        [("max_e4", "max", "v_e4"), ("argmax_user", "min", "user_id")],
        round_to=None,
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "max_e4": t["max_e4"].cast(pa.int64()),
                "argmax_user": t["argmax_user"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("event_type")


def g26_argmax_sql() -> str:
    return (
        "WITH r AS (SELECT event_type, user_id, "
        "CAST(ROUND(value * 10000, 0) AS BIGINT) AS v_e4 FROM events), "
        "m AS (SELECT event_type, MAX(v_e4) AS max_e4 FROM r GROUP BY event_type) "
        "SELECT r.event_type, m.max_e4, MIN(r.user_id) AS argmax_user "
        "FROM r JOIN m ON r.event_type = m.event_type AND r.v_e4 = m.max_e4 "
        "GROUP BY r.event_type, m.max_e4 ORDER BY r.event_type"
    )


def g27_median(sf: str):
    """EXACT grouped median (continuation session) — the aggregate Ray
    Data has no native kernel for, via the count-table combiner (the
    g25 pattern): per-batch grouped counts over the e4-quantized value
    shuffle only (group x distinct-value x blocks) tiny rows, then a
    result-sized fold walks each group's sorted cumulative counts to
    the two middle order statistics. Integer contract: med2_e4 =
    v[(n+1)//2] + v[(n+2)//2] (the SUM of the two middles — equal for
    odd n — so no /2 ever leaves the integer domain). Scale bound:
    the count table is value-domain-sized (e4 quantization bounds it),
    not row-sized; above that, g20's histogram-quantile is the
    streaming fallback."""
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
    out = {"event_type": [], "n": [], "med2_e4": []}
    for et, g in merged.groupby("event_type", sort=True):
        g = g.sort_values("v_e4")
        v = g["v_e4"].to_numpy()
        c = g["cnt"].to_numpy().astype(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        k1, k2 = (n + 1) // 2, (n + 2) // 2
        m1 = int(v[np.searchsorted(cum, k1)])
        m2 = int(v[np.searchsorted(cum, k2)])
        out["event_type"].append(et)
        out["n"].append(n)
        out["med2_e4"].append(m1 + m2)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "med2_e4": pa.array(out["med2_e4"], pa.int64()),
        }
    )


def g27_median_sql() -> str:
    """Two middle order statistics summed (odd n: the single middle
    counted twice) — integer-exact, no engine-specific median()."""
    return (
        "WITH r AS (SELECT event_type, "
        "CAST(ROUND(value * 10000, 0) AS BIGINT) AS v FROM events), "
        "o AS (SELECT event_type, v, "
        "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS rn, "
        "COUNT(*) OVER (PARTITION BY event_type) AS n FROM r) "
        "SELECT event_type, CAST(MAX(n) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN rn IN ((n + 1) // 2, (n + 2) // 2) THEN v ELSE 0 END) "
        "* (CASE WHEN MAX(n) % 2 = 1 THEN 2 ELSE 1 END) AS BIGINT) AS med2_e4 "
        "FROM o GROUP BY event_type ORDER BY event_type"
    )


def w12_window_distinct(sf: str, size_min: int = 60):
    """Exact distinct users per tumbling window (continuation
    session) — the cardinality-per-window shape (g14's grouped HLL is
    the approximate sibling; this is the exact one). Two-level
    pre-reduced shape: per-batch (window, user) dedup combiner
    shuffles at most windows x users x blocks rows, the grouped count
    over the deduped pairs is window-sized. No row-cardinality
    shuffle."""
    ds = read_table(sf, "events", ["user_id", "ts"])
    win_us = np.int64(size_min * 60 * 1_000_000)

    def pairs(t: pa.Table) -> pa.Table:
        us = (
            t["ts"].cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        ws = (us // win_us) * win_us
        out = pa.table(
            {"ws_us": pa.array(ws), "user_id": t["user_id"]}
        )
        return out.group_by(["ws_us", "user_id"]).aggregate([])

    deduped = grouped_agg(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["ws_us", "user_id"],
        [("__n", "count", None)],
        round_to=None,
    )
    counts = grouped_agg(
        deduped.map_batches(lambda t: t.select(["ws_us"]), batch_format="pyarrow"),
        ["ws_us"],
        [("n_users", "count", None)],
        round_to=None,
    )

    def fmt(t: pa.Table) -> pa.Table:
        ws = pa.array(
            t["ws_us"].to_numpy(zero_copy_only=False).astype("datetime64[us]"),
            pa.timestamp("us"),
        )
        return pa.table(
            {
                "window_start": pc.strftime(ws.cast(pa.timestamp("s")), format="%Y-%m-%d %H:%M:%S"),
                "n_users": t["n_users"].cast(pa.int64()),
            }
        )

    return counts.map_batches(fmt, batch_format="pyarrow").sort("window_start")


def w12_window_distinct_sql(size_min: int = 60) -> str:
    win_us = size_min * 60 * 1_000_000
    # make_timestamp, NOT to_timestamp: the latter yields TIMESTAMPTZ
    # and strftime would render it in DuckDB's session timezone,
    # shifting every window_start on non-UTC hosts (repo convention,
    # see the other w-series oracles)
    return (
        f"SELECT strftime(make_timestamp((epoch_us(ts) // {win_us}) * {win_us}), "
        "'%Y-%m-%d %H:%M:%S') AS window_start, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
        "FROM events GROUP BY 1 ORDER BY window_start"
    )


def m18_unpivot(sf: str, key_mod: int = 101):
    """UNPIVOT / melt (continuation session; the inverse surface of
    g11_pivot): the four lineitem measures unpivot into
    (orderkey, linenumber, measure, val_e2) rows — a pure streaming
    flat transform (one map, 4x fan-out, no shuffle, no state).
    key_mod trims the output for the equality gate; the transform
    itself is full-stream."""
    ds = read_table(
        sf,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )
    measures = ["discount", "extendedprice", "quantity", "tax"]
    cols = {"discount": "l_discount", "extendedprice": "l_extendedprice",
            "quantity": "l_quantity", "tax": "l_tax"}

    def melt(t: pa.Table) -> pa.Table:
        keep = t.filter(pa.array(t["l_orderkey"].to_numpy() % key_mod == 0))
        n = keep.num_rows
        ok = keep["l_orderkey"].to_numpy().astype(np.int64)
        ln = keep["l_linenumber"].to_numpy().astype(np.int64)
        out_k, out_l, out_m, out_v = [], [], [], []
        for m in measures:
            v = keep[cols[m]].to_numpy(zero_copy_only=False)
            out_k.append(ok)
            out_l.append(ln)
            out_m.append(np.full(n, m, object))
            out_v.append(_e_units(v, 100.0))
        return pa.table(
            {
                "l_orderkey": pa.array(np.concatenate(out_k)),
                "l_linenumber": pa.array(np.concatenate(out_l)),
                "measure": pa.array(np.concatenate(out_m), pa.string()),
                "val_e2": pa.array(np.concatenate(out_v)),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow").sort(
        ["l_orderkey", "l_linenumber", "measure"]
    )


def m18_unpivot_sql(key_mod: int = 101) -> str:
    return (
        "SELECT l_orderkey, l_linenumber, measure, "
        "CAST(ROUND(val * 100, 0) AS BIGINT) AS val_e2 FROM ("
        "SELECT l_orderkey, l_linenumber, 'discount' AS measure, l_discount AS val "
        f"FROM lineitem WHERE l_orderkey % {key_mod} = 0 UNION ALL "
        "SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice "
        f"FROM lineitem WHERE l_orderkey % {key_mod} = 0 UNION ALL "
        "SELECT l_orderkey, l_linenumber, 'quantity', l_quantity "
        f"FROM lineitem WHERE l_orderkey % {key_mod} = 0 UNION ALL "
        "SELECT l_orderkey, l_linenumber, 'tax', l_tax "
        f"FROM lineitem WHERE l_orderkey % {key_mod} = 0) "
        "ORDER BY l_orderkey, l_linenumber, measure"
    )


def s12_ipc_roundtrip(sf: str):
    """S12 (continuation session) — Arrow IPC (Feather v2) sink/source
    roundtrip: THE zero-copy interchange format between Arrow-native
    engines. Ray Data ships no IPC reader/writer, so both directions
    are custom distributed stages: the sink is a map_batches that
    streams each batch to its own .arrow file (uuid-named — block
    writes are embarrassingly parallel and never coordinate), the
    source is read_binary_files + a per-file pa.ipc.open_file map.
    Schema and values must hash-equal a plain SELECT over the parquet
    original — IPC is lossless by construction (same Arrow buffers),
    so a mismatch means a broken stage, not a format limit."""
    import os
    import shutil
    import uuid

    ds = read_table(sf, "documents", ["doc_id", "text", "lang", "n_chars"])
    out = _roundtrip_dir("ipc", sf)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def sink(t: pa.Table, _dir=out) -> pa.Table:
        import pyarrow.ipc as pipc

        path = os.path.join(_dir, f"part-{uuid.uuid4().hex}.arrow")
        with pipc.new_file(path, t.schema) as w:
            w.write_table(t)
        return pa.table({"path": pa.array([path], pa.string())})

    # drain the sink (its output is just the manifest of written files)
    n_files = ds.map_batches(sink, batch_format="pyarrow").count()
    assert n_files > 0

    files = ray.data.read_binary_files(out)

    def parse(t: pa.Table) -> pa.Table:
        import pyarrow.ipc as pipc

        tables = [
            pipc.open_file(pa.BufferReader(t["bytes"][i].as_py())).read_all()
            for i in range(t.num_rows)
        ]
        return pa.concat_tables(tables) if tables else pa.table({})

    return files.map_batches(parse, batch_format="pyarrow")


def s13_avro_roundtrip(sf: str):
    """S13 (continuation session) — Avro OCF sink/source roundtrip
    through the in-repo codec (functions/avro.py: spec block layout,
    zigzag varints, raw-DEFLATE codec, per-block sync markers). Same
    custom-stage shape as S12: one .avro container per batch on the
    way out, read_binary_files + block decode on the way back. Proves
    the engine speaks the data-lake row format end to end — longs,
    UTF-8 strings, per-block deflate — with exact value equality
    against the parquet original."""
    import os
    import shutil
    import uuid

    ds = read_table(sf, "documents", ["doc_id", "text", "lang", "n_chars"])
    out = _roundtrip_dir("avro", sf)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    def sink(t: pa.Table, _dir=out) -> pa.Table:
        from ..functions.avro import write_avro

        cols = {
            "doc_id": t["doc_id"].to_pylist(),
            "text": t["text"].to_pylist(),
            "lang": t["lang"].to_pylist(),
            "n_chars": t["n_chars"].to_pylist(),
        }
        types = {"doc_id": "long", "text": "string", "lang": "string", "n_chars": "long"}
        path = os.path.join(_dir, f"part-{uuid.uuid4().hex}.avro")
        with open(path, "wb") as f:
            f.write(write_avro(cols, types, codec="deflate"))
        return pa.table({"path": pa.array([path], pa.string())})

    n_files = ds.map_batches(sink, batch_format="pyarrow").count()
    assert n_files > 0

    files = ray.data.read_binary_files(out)

    def parse(t: pa.Table) -> pa.Table:
        from ..functions.avro import read_avro

        parts = []
        for i in range(t.num_rows):
            cols, _types = read_avro(t["bytes"][i].as_py())
            parts.append(
                pa.table(
                    {
                        "doc_id": pa.array(cols["doc_id"], pa.int64()),
                        "text": pa.array(cols["text"], pa.string()),
                        "lang": pa.array(cols["lang"], pa.string()),
                        "n_chars": pa.array(cols["n_chars"], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts) if parts else pa.table({})

    return files.map_batches(parse, batch_format="pyarrow")


def w13_rolling_median(sf: str, window: int = 5):
    """Rolling per-key median (continuation session): for each user's
    events ordered by (ts, event_id), the median of `value` over the
    last ``window`` rows — the smoothing pass a metrics pipeline runs
    before anomaly thresholds. One hash shuffle co-partitions by
    user_id (the w11 shape); within a partition one lexsort + an
    n x window NaN-padded strided view feeds np.nanmedian — vectorized,
    no per-row Python. Median of <= window float64s is the same
    two-middle average in numpy and DuckDB, so ROUND(.., 4) matches
    bit-for-bit at the driver's 4-decimal compare."""
    ds = read_table(sf, "events", ["user_id", "ts", "event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"].cast(pa.int64()),
                "event_id": t["event_id"].cast(pa.int64()),
                "us": pa.array(t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)),
                "value": t["value"].cast(pa.float64()),
            }
        )

    def med_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "med": pa.array([], pa.float64()),
                }
            )
        order = np.lexsort((eid, us, uid))
        uid, eid, v = uid[order], eid[order], v[order]
        # row i's window is rows [i-window+1, i] of the SAME user:
        # NaN-pad the head of each user's run, then one nanmedian over
        # an (n, window) gather
        run_start = np.zeros(n, np.int64)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new_user)
        run_start[starts] = starts
        run_start = np.maximum.accumulate(run_start)
        idx = np.arange(n)[:, None] - np.arange(window - 1, -1, -1)[None, :]
        valid = idx >= run_start[:, None]
        g = np.where(valid, v[np.maximum(idx, 0)], np.nan)
        med = np.round(np.nanmedian(g, axis=1), 4)
        return pa.table(
            {
                "user_id": pa.array(uid.astype(np.int64)),
                "event_id": pa.array(eid.astype(np.int64)),
                "med": pa.array(med),
            }
        )

    tagged = ds.map_batches(prep, batch_format="pyarrow")
    return (
        _hash_partitioned(tagged, "user_id", _npart())
        .map_groups(
            lambda t: med_part(t.drop_columns(["__part"]) if "__part" in t.column_names else t),
            batch_format="pyarrow",
        )
        .sort(["user_id", "event_id"])
    )


def w13_rolling_median_sql(window: int = 5) -> str:
    return (
        "SELECT user_id, event_id, ROUND(median(value) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        f"ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW), 4) AS med "
        "FROM events ORDER BY user_id, event_id"
    )


def j11_interval_join(
    sf: str,
    mod_a: int = 199,
    mod_b: int = 211,
    dur_a: int = 7,
    dur_b: int = 10,
    bucket_days: int = 16,
    bcast_max: int = 5_000_000,
):
    """Interval-OVERLAP join (continuation session) — BOTH sides are
    interval sets, the shape j8/w5 don't cover (those probe points
    against windows). The constant per-side durations make the overlap
    predicate ``a.lo - dur_b < b.lo < a.hi`` a CONTIGUOUS range of the
    lo-sorted other side, so two searchsorteds answer each interval.

    Adaptive (the adaptive_semi_filter discipline): under ``bcast_max``
    B-intervals, the B side builds ONE worker-sorted (lo, key) pair and
    broadcasts — the A side streams with zero shuffle (this path runs
    at bench scale). Above it — at 100 TB both interval sets can be
    fact-sized — each interval replicates to the ``bucket_days``-wide
    time buckets it spans (<= ceil(dur/W)+1 replicas), both sides
    hash-co-partition by bucket (partition count sized from the
    replica estimate, not CPUs), and the searchsorted runs on a
    (bucket, lo) composite. A pair spanning several buckets is emitted
    exactly once — by the bucket containing max(a.lo, b.lo), where both
    replicas provably coexist (each interval contains its own lo and,
    by the overlap predicate, the other's overlap start). Both paths
    are equality-tested (tests/test_continuation_ops.py)."""
    orders = read_table(sf, "orders", ["o_orderkey", "o_orderdate"])

    def explode(side: int, mod: int, resid: int, dur: int):
        def f(t: pa.Table) -> pa.Table:
            k = t["o_orderkey"].to_numpy().astype(np.int64)
            keep = k % mod == resid
            k = k[keep]
            d = (
                t["o_orderdate"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype("datetime64[D]")
                .view(np.int64)[keep]
            )
            if len(d) == 0:
                return pa.table(
                    {
                        "bucket": pa.array([], pa.int64()),
                        "side": pa.array([], pa.int32()),
                        "key": pa.array([], pa.int64()),
                        "lo": pa.array([], pa.int64()),
                    }
                )
            if d.min() < 0 or d.max() + max(dur_a, dur_b) >= (1 << 21):
                raise ValueError("j11: day out of composite range [0, 2^21)")
            b0 = d // bucket_days
            b1 = (d + dur - 1) // bucket_days
            cnt = b1 - b0 + 1
            ridx = np.repeat(np.arange(len(k)), cnt)
            tot = int(cnt.sum())
            offs = np.arange(tot) - np.repeat(np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
            return pa.table(
                {
                    "bucket": pa.array(b0[ridx] + offs),
                    "side": pa.array(np.full(tot, side, np.int32)),
                    "key": pa.array(k[ridx]),
                    "lo": pa.array(d[ridx]),
                }
            )

        return f

    a = orders.map_batches(explode(0, mod_a, 0, dur_a), batch_format="pyarrow")
    b = orders.map_batches(explode(1, mod_b, 1, dur_b), batch_format="pyarrow")

    K = np.int64(1 << 21)
    empty = pa.table(
        {
            "a_key": pa.array([], pa.int64()),
            "b_key": pa.array([], pa.int64()),
            "ov_days": pa.array([], pa.int64()),
        }
    )

    def pairs(t: pa.Table) -> pa.Table:
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        if t.num_rows == 0:
            return empty
        side = t["side"].to_numpy(zero_copy_only=False)
        bk = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = t["key"].to_numpy(zero_copy_only=False)
        lo = t["lo"].to_numpy(zero_copy_only=False)
        am = side == 0
        abk, akey, alo = bk[am], key[am], lo[am]
        bbk, bkey, blo = bk[~am], key[~am], lo[~am]
        if not len(akey) or not len(bkey):
            return empty
        comp = bbk * K + blo
        o = np.argsort(comp, kind="stable")
        comp, bkey, blo = comp[o], bkey[o], blo[o]
        lo_probe = np.searchsorted(comp, abk * K + (alo - dur_b + 1), side="left")
        hi_probe = np.searchsorted(comp, abk * K + alo + dur_a, side="left")
        cnt = hi_probe - lo_probe
        if not cnt.sum():
            return empty
        ridx = np.repeat(np.arange(len(akey)), cnt)
        offs = np.arange(int(cnt.sum())) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt
        )
        bi = lo_probe[ridx] + offs
        a_lo, b_lo = alo[ridx], blo[bi]
        ov_start = np.maximum(a_lo, b_lo)
        # dedup across buckets: the pair belongs to ov_start's bucket
        keep = ov_start // bucket_days == abk[ridx]
        ov = np.minimum(a_lo + dur_a, b_lo + dur_b) - ov_start
        return pa.table(
            {
                "a_key": pa.array(akey[ridx][keep]),
                "b_key": pa.array(bkey[bi][keep]),
                "ov_days": pa.array(ov[keep]),
            }
        )

    from ..sources.testdata import table_rows

    n_orders = table_rows(sf, "orders")
    if n_orders // mod_b <= bcast_max:
        # broadcast path: the lo-sorted B windows as ONE worker-built
        # pair of arrays; A streams, two searchsorteds per batch, no
        # shuffle, no buckets (the global lo-sort makes the predicate
        # range contiguous without them)
        def bwin(t: pa.Table) -> pa.Table:
            k = t["o_orderkey"].to_numpy().astype(np.int64)
            keep = k % mod_b == 1
            d = (
                t["o_orderdate"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype("datetime64[D]")
                .view(np.int64)[keep]
            )
            return pa.table(
                {"key": pa.array(k[keep]), "lo": pa.array(d)}
            )

        refs = []
        for blk in (
            orders.map_batches(bwin, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=262144)
        ):
            if blk.num_rows:
                refs.append(ray.put(blk))

        @ray.remote
        def build(*blocks: pa.Table):
            t = pa.concat_tables(list(blocks)).combine_chunks()
            lo_ = t["lo"].to_numpy()
            k_ = t["key"].to_numpy()
            o = np.argsort(lo_, kind="stable")
            return lo_[o], k_[o]

        ref = build.remote(*refs) if refs else None

        def probe(t: pa.Table) -> pa.Table:
            k = t["o_orderkey"].to_numpy().astype(np.int64)
            keep = k % mod_a == 0
            akey = k[keep]
            if ref is None or not len(akey):
                return empty
            alo = (
                t["o_orderdate"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype("datetime64[D]")
                .view(np.int64)[keep]
            )
            blo, bkey = ray.get(ref)
            lo_probe = np.searchsorted(blo, alo - dur_b + 1, side="left")
            hi_probe = np.searchsorted(blo, alo + dur_a, side="left")
            cnt = hi_probe - lo_probe
            if not cnt.sum():
                return empty
            ridx = np.repeat(np.arange(len(akey)), cnt)
            offs = np.arange(int(cnt.sum())) - np.repeat(
                np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt
            )
            bi = lo_probe[ridx] + offs
            a_lo, b_lo = alo[ridx], blo[bi]
            ov = np.minimum(a_lo + dur_a, b_lo + dur_b) - np.maximum(a_lo, b_lo)
            return pa.table(
                {
                    "a_key": pa.array(akey[ridx]),
                    "b_key": pa.array(bkey[bi]),
                    "ov_days": pa.array(ov),
                }
            )

        return orders.map_batches(probe, batch_format="pyarrow").sort(
            ["a_key", "b_key"]
        )

    both = a.union(b)
    # partitions sized from the REPLICA count (parquet row hint /
    # residue density x span fan-out), not the CPU count — the j2/x3
    # aggregator-spin-up lesson
    n_replicas = int(
        n_orders
        * ((1 + dur_a / bucket_days) / mod_a + (1 + dur_b / bucket_days) / mod_b)
    )
    return (
        _hash_partitioned(both, "bucket", _npart(n_replicas))
        .map_groups(pairs, batch_format="pyarrow")
        .sort(["a_key", "b_key"])
    )


def j11_interval_join_sql(
    mod_a: int = 199, mod_b: int = 211, dur_a: int = 7, dur_b: int = 10
) -> str:
    return (
        "WITH a AS (SELECT o_orderkey AS a_key, DATEDIFF('day', DATE '1970-01-01', "
        f"CAST(o_orderdate AS DATE)) AS lo FROM orders WHERE o_orderkey % {mod_a} = 0), "
        "b AS (SELECT o_orderkey AS b_key, DATEDIFF('day', DATE '1970-01-01', "
        f"CAST(o_orderdate AS DATE)) AS lo FROM orders WHERE o_orderkey % {mod_b} = 1) "
        "SELECT a.a_key, b.b_key, "
        f"CAST(LEAST(a.lo + {dur_a}, b.lo + {dur_b}) - GREATEST(a.lo, b.lo) AS BIGINT) "
        f"AS ov_days FROM a JOIN b ON a.lo < b.lo + {dur_b} AND b.lo < a.lo + {dur_a} "
        "ORDER BY a_key, b_key"
    )


def g28_chi2(sf: str, n_grp: int = 7):
    """Chi-square contingency cells (continuation session): the
    categorical-association diagnostic (is event_type independent of
    the user cohort?) a training-mix analysis runs before trusting a
    stratified split. Cells are event_type x (user_id % n_grp); the
    distributed work is ONE combiner-first grouped count (cell x
    blocks rows shuffle); margins and the chi-square contribution are
    a cells-sized finalize in arbitrary-precision Python ints —
    (obs*N - rt*ct)^2 overflows int64 past ~sf1, the PMI lesson — with
    contrib_e6 = (obs*N - rt*ct)^2 * 1e6 // (N*rt*ct) mirrored in
    HUGEINT on the DuckDB side."""
    ds = read_table(sf, "events", ["event_type", "user_id"])

    def cell(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "grp": pa.array(t["user_id"].to_numpy() % n_grp),
            }
        )

    counts = grouped_agg(
        ds.map_batches(cell, batch_format="pyarrow"),
        ["event_type", "grp"],
        [("obs", "count", None)],
        round_to=None,
    )

    def finalize(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pylist()
        gr = t["grp"].to_pylist()
        ob = t["obs"].to_pylist()
        n = sum(ob)
        rt = {}
        ct = {}
        for e, g, o in zip(et, gr, ob):
            rt[e] = rt.get(e, 0) + o
            ct[g] = ct.get(g, 0) + o
        exp_e6, contrib_e6 = [], []
        for e, g, o in zip(et, gr, ob):
            r, c = rt[e], ct[g]
            exp_e6.append(r * c * 1_000_000 // n)
            contrib_e6.append((o * n - r * c) ** 2 * 1_000_000 // (n * r * c))
        return pa.table(
            {
                "event_type": pa.array(et, pa.string()),
                "grp": pa.array(gr, pa.int64()),
                "obs": pa.array(ob, pa.int64()),
                "exp_e6": pa.array(exp_e6, pa.int64()),
                "contrib_e6": pa.array(contrib_e6, pa.int64()),
            }
        )

    # the count table is cells-sized (types x n_grp) — one finalize task
    refs = counts.materialize().to_arrow_refs()

    @ray.remote
    def fin(*blocks):
        return finalize(pa.concat_tables(list(blocks)).combine_chunks())

    return ray.data.from_arrow_refs([fin.remote(*refs)]).sort(["event_type", "grp"])


def g28_chi2_sql(n_grp: int = 7) -> str:
    return (
        "WITH c AS (SELECT event_type, user_id % "
        f"{n_grp} AS grp, CAST(COUNT(*) AS HUGEINT) AS obs FROM events GROUP BY 1, 2), "
        "m AS (SELECT event_type, grp, obs, SUM(obs) OVER (PARTITION BY event_type) AS rt, "
        "SUM(obs) OVER (PARTITION BY grp) AS ct, SUM(obs) OVER () AS n FROM c) "
        "SELECT event_type, CAST(grp AS BIGINT) AS grp, CAST(obs AS BIGINT) AS obs, "
        "CAST(rt * ct * 1000000 // n AS BIGINT) AS exp_e6, "
        # explicit square: DuckDB's ** power operator returns DOUBLE
        # even on HUGEINT operands, losing bit-exactness
        "CAST((obs * n - rt * ct) * (obs * n - rt * ct) * 1000000 "
        "// (n * rt * ct) AS BIGINT) AS contrib_e6 "
        "FROM m ORDER BY event_type, grp"
    )


def d10_intersect_all(sf: str):
    """INTERSECT ALL — multiset intersection with multiplicity, the d9
    sibling that completes the multiset family (d6 is the set form):
    l_partkey occurrences under returnflag 'A' intersected with those
    under 'R', surviving multiplicity min(cA, cR). Same
    count-merge-reexpand plan as d9: per-batch grouped counts tagged
    by side, hash-co-partitioned by partkey, vectorized np.repeat
    re-expansion — the shuffle carries one row per (block, key, side),
    never the raw multiset."""
    li = read_table(sf, "lineitem", ["l_partkey", "l_returnflag"])

    def counts(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.or_(pc.equal(t["l_returnflag"], "A"), pc.equal(t["l_returnflag"], "R"))
        )
        return (
            t.group_by(["l_partkey", "l_returnflag"])
            .aggregate([("l_partkey", "count")])
            .rename_columns(["l_partkey", "side", "cnt"])
        )

    parts = li.map_batches(counts, batch_format="pyarrow")

    def expand(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"]) if "__part" in t.column_names else t
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        side = t["side"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy().astype(np.int64)
        order = np.argsort(pk, kind="stable")
        pk, side, cnt = pk[order], side[order], cnt[order]
        starts = np.r_[True, pk[1:] != pk[:-1]] if len(pk) else np.zeros(0, bool)
        gid = np.cumsum(starts) - 1
        n_g = int(gid[-1]) + 1 if len(gid) else 0
        ca = np.zeros(n_g, np.int64)
        cb = np.zeros(n_g, np.int64)
        np.add.at(ca, gid[side == "A"], cnt[side == "A"])
        np.add.at(cb, gid[side == "R"], cnt[side == "R"])
        keep = np.minimum(ca, cb)
        keys = pk[np.flatnonzero(starts)] if len(pk) else pk
        return pa.table({"l_partkey": pa.array(np.repeat(keys, keep), pa.int64())})

    return (
        _hash_partitioned_any(parts, ["l_partkey"], _npart())
        .map_groups(expand, batch_format="pyarrow")
        .sort("l_partkey")
    )


def d10_intersect_all_sql() -> str:
    return (
        "SELECT * FROM ("
        "SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A' "
        "INTERSECT ALL "
        "SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R') "
        "ORDER BY l_partkey"
    )


def w15_daily_extremes(sf: str):
    """First and last event value per (user, day) — the session
    open/close extraction (FIRST_VALUE/LAST_VALUE window) every
    metrics pipeline runs. No total order is needed: the sufficient
    statistic per (user, day) is the value at the min and at the max
    (ts, event_id), which MERGES — so a per-batch combiner keeps one
    row per group carrying both argmin and argmax witnesses, the
    shuffle moves groups x blocks rows, and a per-partition merge
    re-runs the same lexsort-and-take-endpoints fold. Values ride as
    e2 cents (2-decimal source data, rounding-mode-proof)."""
    ds = read_table(sf, "events", ["user_id", "ts", "event_id", "value"])

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "day": pa.array([], pa.int64()),
            "f_us": pa.array([], pa.int64()),
            "f_eid": pa.array([], pa.int64()),
            "first_c": pa.array([], pa.int64()),
            "l_us": pa.array([], pa.int64()),
            "l_eid": pa.array([], pa.int64()),
            "last_c": pa.array([], pa.int64()),
        }
    )

    def _fold(uid, day, f_us, f_eid, f_c, l_us, l_eid, l_c) -> pa.Table:
        """Group by (uid, day); keep the row set's argmin-(f_us, f_eid)
        first-witness and argmax-(l_us, l_eid) last-witness per group."""
        o = np.lexsort((f_eid, f_us, day, uid))
        s_uid, s_day = uid[o], day[o]
        starts = np.r_[True, (s_uid[1:] != s_uid[:-1]) | (s_day[1:] != s_day[:-1])]
        first_rows = o[starts]
        o2 = np.lexsort((l_eid, l_us, day, uid))
        s2_uid, s2_day = uid[o2], day[o2]
        ends = np.r_[(s2_uid[1:] != s2_uid[:-1]) | (s2_day[1:] != s2_day[:-1]), True]
        last_rows = o2[ends]
        # starts/ends enumerate the same (uid, day) groups in the same
        # sorted order, so the two row sets zip positionally
        return pa.table(
            {
                "user_id": pa.array(uid[first_rows]),
                "day": pa.array(day[first_rows]),
                "f_us": pa.array(f_us[first_rows]),
                "f_eid": pa.array(f_eid[first_rows]),
                "first_c": pa.array(f_c[first_rows]),
                "l_us": pa.array(l_us[last_rows]),
                "l_eid": pa.array(l_eid[last_rows]),
                "last_c": pa.array(l_c[last_rows]),
            }
        )

    def combiner(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        uid = t["user_id"].to_numpy().astype(np.int64)
        us = t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = t["event_id"].to_numpy().astype(np.int64)
        c = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        day = us // 86_400_000_000
        return _fold(uid, day, us, eid, c, us, eid, c)

    def merge(t: pa.Table) -> pa.Table:
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "day": pa.array([], pa.int64()),
                    "first_c": pa.array([], pa.int64()),
                    "last_c": pa.array([], pa.int64()),
                }
            )
        g = _fold(
            *(
                t[c].to_numpy(zero_copy_only=False).astype(np.int64)
                for c in ["user_id", "day", "f_us", "f_eid", "first_c", "l_us", "l_eid", "last_c"]
            )
        )
        return g.select(["user_id", "day", "first_c", "last_c"])

    parts = ds.map_batches(combiner, batch_format="pyarrow")
    from ..sources.testdata import table_rows

    return (
        _hash_partitioned(parts, "user_id", _npart(table_rows(sf, "events")))
        .map_groups(merge, batch_format="pyarrow")
        .sort(["user_id", "day"])
    )


def w15_daily_extremes_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, DATEDIFF('day', DATE '1970-01-01', "
        "CAST(ts AS DATE)) AS day, ts, event_id, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
        "r AS (SELECT user_id, day, c, "
        "ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY ts, event_id) AS rf, "
        "ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) AS rl "
        "FROM e) "
        "SELECT user_id, CAST(day AS BIGINT) AS day, "
        "CAST(MAX(CASE WHEN rf = 1 THEN c END) AS BIGINT) AS first_c, "
        "CAST(MAX(CASE WHEN rl = 1 THEN c END) AS BIGINT) AS last_c "
        "FROM r GROUP BY user_id, day ORDER BY user_id, day"
    )


def w14_gap_fill(sf: str):
    """Per-user daily FORWARD-FILL over a generated date spine — the
    gap-fill pass a metrics store runs so every (user, day) in a user's
    active range has a value, carrying the last observed day-close
    forward across silent days. Fills the w-series numbering gap
    (round 5).

    Scale shape: a per-batch combiner reduces each block to one
    last-witness row per (user, day) — argmax (ts, event_id), value as
    e2 cents — so the shuffle moves groups x blocks rows, never events.
    One hash shuffle co-partitions users; each partition re-folds its
    partials, then expands every user's [first_day, last_day] spine and
    forward-fills with ONE searchsorted over the composite (uid, day)
    key (uid << 21 | day: day < 2^21 to year ~7737, uid < 2^42 —
    asserted). Spine expansion is bounded by each user's observed day
    RANGE (the data spans ~a month), and it happens inside the
    partition, never on the driver."""
    ds = read_table(sf, "events", ["user_id", "ts", "event_id", "value"])

    _empty_p = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "day": pa.array([], pa.int64()),
            "l_us": pa.array([], pa.int64()),
            "l_eid": pa.array([], pa.int64()),
            "close_c": pa.array([], pa.int64()),
        }
    )

    def _last_fold(uid, day, l_us, l_eid, c):
        """One row per (uid, day): the argmax-(l_us, l_eid) witness."""
        o = np.lexsort((l_eid, l_us, day, uid))
        s_uid, s_day = uid[o], day[o]
        ends = np.r_[(s_uid[1:] != s_uid[:-1]) | (s_day[1:] != s_day[:-1]), True]
        rows = o[ends]
        # re-sort winners by (uid, day) for the merge/searchsorted step
        rows = rows[np.lexsort((day[rows], uid[rows]))]
        return uid[rows], day[rows], l_us[rows], l_eid[rows], c[rows]

    def combiner(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_p
        uid = t["user_id"].to_numpy().astype(np.int64)
        us = t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = t["event_id"].to_numpy().astype(np.int64)
        c = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        day = us // 86_400_000_000
        u, d, lus, leid, cc = _last_fold(uid, day, us, eid, c)
        return pa.table(
            {
                "user_id": pa.array(u),
                "day": pa.array(d),
                "l_us": pa.array(lus),
                "l_eid": pa.array(leid),
                "close_c": pa.array(cc),
            }
        )

    def fill_part(t: pa.Table) -> pa.Table:
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        out_schema = pa.schema(
            [("user_id", pa.int64()), ("day", pa.int64()), ("filled_c", pa.int64())]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        cols = [
            t[c].to_numpy(zero_copy_only=False).astype(np.int64)
            for c in ["user_id", "day", "l_us", "l_eid", "close_c"]
        ]
        uid, day, _, _, close = _last_fold(*cols)
        assert day.max(initial=0) < (1 << 21) and uid.max(initial=0) < (1 << 42)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        lasts = np.r_[starts[1:], len(uid)] - 1
        lo, hi = day[starts], day[lasts]
        span = hi - lo + 1
        total = int(span.sum())
        out_uid = np.repeat(uid[starts], span)
        base = np.repeat(np.cumsum(span) - span, span)
        out_day = np.repeat(lo, span) + (np.arange(total, dtype=np.int64) - base)
        kp = (uid << np.int64(21)) | day
        ks = (out_uid << np.int64(21)) | out_day
        idx = np.searchsorted(kp, ks, side="right") - 1
        return pa.table(
            {
                "user_id": pa.array(out_uid),
                "day": pa.array(out_day),
                "filled_c": pa.array(close[idx]),
            }
        )

    parts = ds.map_batches(combiner, batch_format="pyarrow")
    from ..sources.testdata import table_rows

    return (
        _hash_partitioned(parts, "user_id", _npart(table_rows(sf, "events")))
        .map_groups(fill_part, batch_format="pyarrow")
        .sort(["user_id", "day"])
    )


def w14_gap_fill_sql() -> str:
    return (
        "WITH e AS (SELECT user_id, DATEDIFF('day', DATE '1970-01-01', "
        "CAST(ts AS DATE)) AS day, ts, event_id, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
        "r AS (SELECT user_id, day, c, ROW_NUMBER() OVER "
        "(PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) AS rl FROM e), "
        "cl AS (SELECT user_id, day, c AS close_c FROM r WHERE rl = 1), "
        "sp AS (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM cl GROUP BY user_id), "
        "spine AS (SELECT user_id, UNNEST(generate_series(lo, hi)) AS day FROM sp), "
        "j AS (SELECT s.user_id, s.day, c.close_c FROM spine s LEFT JOIN cl c "
        "ON c.user_id = s.user_id AND c.day = s.day) "
        "SELECT user_id, CAST(day AS BIGINT) AS day, "
        "CAST(LAST_VALUE(close_c IGNORE NULLS) OVER (PARTITION BY user_id "
        "ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS filled_c FROM j ORDER BY user_id, day"
    )


def g29_bitwise(sf: str):
    """Grouped BITWISE aggregates (BIT_OR / BIT_AND / BIT_XOR of the
    e2-cent value per event type) — the flag-mask / parity fold shape:
    all three reducers are associative+commutative, so a per-batch
    combiner keeps one row per group and merging partials IS the same
    fold again. The final merge sees group-count x blocks rows — a few
    dozen — so one task finalizes; nothing about the plan changes when
    the input is 10^6 blocks."""
    ds = read_table(sf, "events", ["event_type", "value"])

    _empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "orv": pa.array([], pa.int64()),
            "andv": pa.array([], pa.int64()),
            "xorv": pa.array([], pa.int64()),
        }
    )

    def _fold(et: np.ndarray, orv, andv, xorv) -> pa.Table:
        uniq, inv = np.unique(et, return_inverse=True)
        o = np.zeros(len(uniq), np.int64)
        a = np.full(len(uniq), -1, np.int64)
        x = np.zeros(len(uniq), np.int64)
        np.bitwise_or.at(o, inv, orv)
        np.bitwise_and.at(a, inv, andv)
        np.bitwise_xor.at(x, inv, xorv)
        return pa.table(
            {
                "event_type": pa.array([str(s) for s in uniq], pa.string()),
                "orv": pa.array(o),
                "andv": pa.array(a),
                "xorv": pa.array(x),
            }
        )

    def combiner(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        et = t["event_type"].to_numpy(zero_copy_only=False)
        c = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return _fold(et, c, c, c)

    parts = ds.map_batches(combiner, batch_format="pyarrow")

    @ray.remote
    def finalize(*blocks: pa.Table) -> pa.Table:
        t = pa.concat_tables([b for b in blocks if b.num_rows] or [_empty])
        t = t.combine_chunks()
        out = _fold(
            t["event_type"].to_numpy(zero_copy_only=False),
            t["orv"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["andv"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["xorv"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
        # np.unique sorted the groups already
        return out

    refs = parts.materialize().to_arrow_refs()
    return ray.data.from_arrow_refs([finalize.remote(*refs)])


def g29_bitwise_sql() -> str:
    return (
        "WITH e AS (SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS c "
        "FROM events) "
        "SELECT event_type, CAST(BIT_OR(c) AS BIGINT) AS orv, "
        "CAST(BIT_AND(c) AS BIGINT) AS andv, CAST(BIT_XOR(c) AS BIGINT) AS xorv "
        "FROM e GROUP BY event_type ORDER BY event_type"
    )


def w16_retention(sf: str):
    """Cohort RETENTION matrix — the product-analytics staple: for each
    signup cohort (a user's first active day), how many of its users
    were active again `day_offset` days later. The training-mix analog
    is corpus freshness: how much of each crawl wave's host set is
    still contributing documents N days on.

    Scale shape: a per-batch combiner dedups (user, day) activity pairs
    (events -> at most users x days rows per block), ONE user_id hash
    shuffle co-partitions every user's full activity, each partition
    locally derives cohort = min(day) and the distinct offsets, and
    emits per-(cohort, offset) partial counts. Users are whole within a
    partition, so the partial user sets are disjoint and the finalize
    is a pure sum over a days^2-sized table — one task."""
    ds = read_table(sf, "events", ["user_id", "ts"])

    _empty = pa.table(
        {"user_id": pa.array([], pa.int64()), "day": pa.array([], pa.int64())}
    )

    def distinct_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        uid = t["user_id"].to_numpy().astype(np.int64)
        day = (
            t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
            // 86_400_000_000
        )
        assert uid.max(initial=0) < (1 << 42) and 0 <= day.min(initial=0) and day.max(initial=0) < (1 << 20), "w16: composite key range"
        comp = np.unique((uid << np.int64(20)) | day)
        return pa.table(
            {
                "user_id": pa.array(comp >> np.int64(20)),
                "day": pa.array(comp & np.int64((1 << 20) - 1)),
            }
        )

    from ..sources.testdata import table_rows

    parts = ds.map_batches(distinct_pairs, batch_format="pyarrow")

    def per_partition(t: pa.Table) -> pa.Table:
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        out = pa.table(
            {
                "cohort_day": pa.array([], pa.int64()),
                "day_offset": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return out
        uid = t["user_id"].to_numpy().astype(np.int64)
        day = t["day"].to_numpy().astype(np.int64)
        comp = np.unique((uid << np.int64(20)) | day)  # re-dedup across blocks
        u, d = comp >> np.int64(20), comp & np.int64((1 << 20) - 1)
        # comp is sorted, so each user's first row is their cohort day
        starts = np.r_[True, u[1:] != u[:-1]]
        cohort = d[starts][np.cumsum(starts) - 1]  # broadcast per-user min day
        off = d - cohort
        cell = np.stack([cohort, off], 1)
        uniq, cnt = np.unique(cell, axis=0, return_counts=True)
        return pa.table(
            {
                "cohort_day": pa.array(uniq[:, 0]),
                "day_offset": pa.array(uniq[:, 1]),
                "n_users": pa.array(cnt.astype(np.int64)),
            }
        )

    partial = _hash_partitioned(parts, "user_id", _npart(table_rows(sf, "events"))).map_groups(
        per_partition, batch_format="pyarrow"
    )
    # days^2-sized partial table -> one summing finalize task
    refs = partial.materialize().to_arrow_refs()

    _empty_out = pa.table(
        {
            "cohort_day": pa.array([], pa.int64()),
            "day_offset": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64()),
        }
    )

    @ray.remote
    def fin(*blocks):
        t = pa.concat_tables([b for b in blocks if b.num_rows] or [_empty_out])
        df = t.group_by(["cohort_day", "day_offset"]).aggregate([("n_users", "sum")])
        return df.rename_columns(["cohort_day", "day_offset", "n_users"])

    return ray.data.from_arrow_refs([fin.remote(*refs)]).sort(
        ["cohort_day", "day_offset"]
    )


def w16_retention_sql() -> str:
    return (
        "WITH e AS (SELECT DISTINCT user_id, DATEDIFF('day', DATE '1970-01-01', "
        "CAST(ts AS DATE)) AS day FROM events), "
        "c AS (SELECT user_id, MIN(day) AS cohort FROM e GROUP BY user_id) "
        "SELECT CAST(c.cohort AS BIGINT) AS cohort_day, "
        "CAST(e.day - c.cohort AS BIGINT) AS day_offset, "
        "CAST(COUNT(*) AS BIGINT) AS n_users "
        "FROM e JOIN c USING (user_id) "
        "GROUP BY 1, 2 ORDER BY cohort_day, day_offset"
    )


def g30_zscore_outliers(sf: str):
    """Per-group 2-sigma OUTLIER detection with an INTEGER-EXACT
    boundary — the quality-filter shape (flag documents whose score
    sits far outside their language's distribution) run as two
    streaming passes: (1) combiner-first grouped (n, sum, sumsq) over
    e2-cent values, (2) per-event flagging against a broadcast
    per-group threshold. The 2-sigma test |c - mean| > 2*std_samp is
    evaluated as |c*n - sum| >= T with T = min{t>0 : t^2*(n-1) >
    4*n*(n*sumsq - sum^2)} computed on the driver in arbitrary-
    precision Python ints (isqrt + exact scan), so the flag bit is
    bit-identical to DuckDB's HUGEINT square comparison — no float
    sigma ever touches the boundary. Groups with n < 2 flag nothing
    (the SQL's 0 > 0 is false too, same rule).

    Scale shape: pass-1 shuffle carries groups x blocks rows; the
    stats table is groups-sized (driver pull is fine and loudly
    asserted); pass 2 is a pure streaming map with partial per-group
    counts and a groups-sized finalize."""
    ds = read_table(sf, "events", ["event_type", "event_id", "value"])

    def to_cents(t: pa.Table) -> pa.Table:
        c = np.rint(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        with np.errstate(over="ignore"):
            csq = c * c
        assert np.abs(c).max(initial=0) < (1 << 31), "g30: cents overflow guard"
        return pa.table(
            {
                "event_type": t["event_type"],
                "event_id": t["event_id"],
                "c": pa.array(c),
                "csq": pa.array(csq),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    stats = grouped_agg(
        cents,
        ["event_type"],
        [("n", "count", None), ("sm", "sum", "c"), ("sq", "sum", "csq")],
        round_to=None,
    ).to_pandas()
    assert len(stats) <= 100_000, "g30: group cardinality exceeds driver stats bound"

    thr: dict[str, tuple[int, int, int]] = {}
    for _, r in stats.iterrows():
        n, sm, sq = int(r["n"]), int(r["sm"]), int(r["sq"])
        if n < 2:
            thr[r["event_type"]] = (n, sm, 0)  # T=0 encoded as "never" below
            continue
        a = 4 * n * (n * sq - sm * sm)
        t0 = max(math.isqrt(a // (n - 1)) - 2, 0)
        while t0 * t0 * (n - 1) <= a:
            t0 += 1
        thr[r["event_type"]] = (n, sm, t0)

    _empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "n_out": pa.array([], pa.int64()),
            "sum_out_c": pa.array([], pa.int64()),
            "sum_out_id": pa.array([], pa.int64()),
        }
    )

    def flag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        types = enc.dictionary.to_pylist()
        c = t["c"].to_numpy()
        eid = t["event_id"].to_numpy().astype(np.int64)
        rows = {"event_type": [], "n": [], "n_out": [], "sum_out_c": [], "sum_out_id": []}
        for code, e in enumerate(types):  # loop over the FEW types, not rows
            n, sm, tt = thr[e]
            assert n < (1 << 31), "g30: c*n overflow guard"  # with |c| < 2^31
            r = codes == code
            d = np.abs(c[r] * np.int64(n) - np.int64(sm))
            m = d >= tt if (n >= 2 and tt > 0) else np.zeros(int(r.sum()), bool)
            rows["event_type"].append(e)
            rows["n"].append(n)
            rows["n_out"].append(int(m.sum()))
            rows["sum_out_c"].append(int(c[r][m].sum()))
            rows["sum_out_id"].append(int(eid[r][m].sum()))
        return pa.table(
            {
                "event_type": pa.array(rows["event_type"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "n_out": pa.array(rows["n_out"], pa.int64()),
                "sum_out_c": pa.array(rows["sum_out_c"], pa.int64()),
                "sum_out_id": pa.array(rows["sum_out_id"], pa.int64()),
            }
        )

    partial = cents.map_batches(flag, batch_format="pyarrow")
    refs = partial.materialize().to_arrow_refs()

    @ray.remote
    def fin(*blocks):
        t = pa.concat_tables([b for b in blocks if b.num_rows])
        g = t.group_by("event_type").aggregate(
            [("n", "max"), ("n_out", "sum"), ("sum_out_c", "sum"), ("sum_out_id", "sum")]
        )
        return g.rename_columns(["event_type", "n", "n_out", "sum_out_c", "sum_out_id"])

    return ray.data.from_arrow_refs([fin.remote(*refs)]).sort(["event_type"])


def g30_zscore_outliers_sql() -> str:
    return (
        "WITH e AS (SELECT event_type, event_id, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events), "
        "s AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n, "
        "CAST(SUM(c) AS HUGEINT) AS sm, "
        "CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sq "
        "FROM e GROUP BY 1), "
        "f AS (SELECT e.event_type, e.event_id, e.c, s.n, s.sm, s.sq, "
        "CAST(e.c AS HUGEINT) * s.n - s.sm AS d FROM e JOIN s USING (event_type)) "
        "SELECT event_type, CAST(MAX(n) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN d * d * (n - 1) > 4 * n * (n * sq - sm * sm) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_out, "
        "CAST(SUM(CASE WHEN d * d * (n - 1) > 4 * n * (n * sq - sm * sm) "
        "THEN c ELSE 0 END) AS BIGINT) AS sum_out_c, "
        "CAST(SUM(CASE WHEN d * d * (n - 1) > 4 * n * (n * sq - sm * sm) "
        "THEN event_id ELSE 0 END) AS BIGINT) AS sum_out_id "
        "FROM f GROUP BY event_type ORDER BY event_type"
    )


def w17_transitions(sf: str):
    """Per-user event-type TRANSITION counts (the first-order Markov
    matrix session modeling / funnel design starts from): for every
    user, order events by (ts, event_id) and count each consecutive
    (prev_type, next_type) pair.

    Scale shape: transitions are NOT a per-batch-local statistic (the
    pair spanning two blocks belongs to the user, not the block), so
    the op hash-co-partitions users — each user's whole stream lands in
    one partition, where a single lexsort + shifted comparison counts
    every adjacent pair vectorized. The shuffle carries (user, ts,
    event_id, type) rows once; partials per (prev, next) are summed by
    a cells-sized finalize (types^2 rows). No driver-side state, no
    per-row Python."""
    ds = read_table(sf, "events", ["user_id", "ts", "event_id", "event_type"])

    _empty = pa.table(
        {
            "prev_type": pa.array([], pa.string()),
            "next_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def per_partition(t: pa.Table) -> pa.Table:
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        if t.num_rows < 2:
            return _empty
        uid = t["user_id"].to_numpy().astype(np.int64)
        us = t["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = t["event_id"].to_numpy().astype(np.int64)
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        types = enc.dictionary.to_pylist()
        o = np.lexsort((eid, us, uid))
        s_uid, s_code = uid[o], codes[o]
        same_user = s_uid[1:] == s_uid[:-1]
        prev_c, next_c = s_code[:-1][same_user], s_code[1:][same_user]
        if len(prev_c) == 0:
            return _empty
        pair = prev_c * np.int64(len(types)) + next_c
        uniq, cnt = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "prev_type": pa.array([types[int(p) // len(types)] for p in uniq], pa.string()),
                "next_type": pa.array([types[int(p) % len(types)] for p in uniq], pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    from ..sources.testdata import table_rows

    partial = _hash_partitioned(ds, "user_id", _npart(table_rows(sf, "events"))).map_groups(
        per_partition, batch_format="pyarrow"
    )
    refs = partial.materialize().to_arrow_refs()

    @ray.remote
    def fin(*blocks):
        t = pa.concat_tables([b for b in blocks if b.num_rows] or [_empty])
        g = t.group_by(["prev_type", "next_type"]).aggregate([("n", "sum")])
        return g.rename_columns(["prev_type", "next_type", "n"])

    return ray.data.from_arrow_refs([fin.remote(*refs)]).sort(
        ["prev_type", "next_type"]
    )


def w17_transitions_sql() -> str:
    return (
        "WITH o AS (SELECT user_id, event_type, "
        "LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev "
        "FROM events) "
        "SELECT prev AS prev_type, event_type AS next_type, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM o WHERE prev IS NOT NULL "
        "GROUP BY 1, 2 ORDER BY prev_type, next_type"
    )
