"""Iterative graph algorithms as Ray Data pipelines (beyond-§2:
the iterative-join shape a 100-TB link graph needs — PageRank here,
connected components in pipelines/components.py).

Determinism contract: INTEGER PageRank. Ranks are int64 micro-units
and redistribution uses floor division, so every iteration is exactly
reproducible across engines — the DuckDB oracle (unrolled iterations,
``//``) hash-matches bit-for-bit. Float PageRank would accumulate
thousands-term double sums whose order differs per engine; integer
semantics make the oracle exact instead of "close". All values are
positive, where DuckDB's truncating ``//`` equals numpy's floor ``//``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..sources.testdata import read_table, table_rows
from .relational import _npart, grouped_agg, shuffle_join

R0 = 1_000_000  # initial rank, micro-units
BASE = 150_000  # (1-d) * 10^6 with damping d = 0.85
DAMP_NUM, DAMP_DEN = 85, 100


def _edges(sf: str, n_nodes: int = 1000):
    """Directed multigraph derived deterministically from lineitem:
    (l_orderkey % n) -> (l_partkey % n). Multi-edges count in outdeg
    and contribute independently, exactly as the SQL derivation."""
    ds = read_table(sf, "lineitem", ["l_orderkey", "l_partkey"])

    def mk(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.array(t["l_orderkey"].to_numpy() % n_nodes),
                "dst": pa.array(t["l_partkey"].to_numpy() % n_nodes),
            }
        )

    return ds.map_batches(mk, batch_format="pyarrow")


def x1_pagerank(sf: str, iters: int = 3, n_nodes: int = 1000):
    """Integer PageRank, ``iters`` synchronous iterations:
    R_{t+1}(v) = BASE + sum over in-edges u->v of
    floor(R_t(u) * 85 / (100 * outdeg(u))).

    Distributed shape per iteration: per-node share (rank join outdeg,
    node-cardinality), shares join edges on src (the edge-cardinality
    exchange — THE cost at 100 TB; edges are hash-partitioned once and
    the share side is node-sized), then a pre-aggregated grouped sum
    by dst, then a LEFT join back to the node set so sink/in-degree-0
    nodes keep the base rank. Edges materialize once and are reused
    across iterations instead of re-deriving per pass."""
    edges = _edges(sf, n_nodes).materialize()
    nrows = table_rows(sf, "lineitem")
    npart = _npart(nrows)

    outdeg = grouped_agg(
        edges, ["src"], [("d", "count", None)], round_to=None
    ).materialize()

    # node set: distinct src ∪ dst (grouped count keys ARE the set)
    nodes = grouped_agg(
        edges.map_batches(
            lambda t: pa.table(
                {"node": pa.concat_arrays([t["src"].combine_chunks(), t["dst"].combine_chunks()])}
            ),
            batch_format="pyarrow",
        ),
        ["node"],
        [("c", "count", None)],
        round_to=None,
    ).map_batches(lambda t: t.select(["node"]), batch_format="pyarrow").materialize()

    ranks = nodes.map_batches(
        lambda t: pa.table(
            {"node": t["node"], "r": pa.array(np.full(t.num_rows, R0, np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        shares = shuffle_join(
            ranks, outdeg, "node", "src", num_partitions=_npart(n_nodes)
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "share": pa.array(
                        (t["r"].to_numpy() * DAMP_NUM)
                        // (DAMP_DEN * t["d"].to_numpy(zero_copy_only=False).astype(np.int64))
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        contrib = grouped_agg(
            shuffle_join(edges, shares, "src", "node", num_partitions=npart).map_batches(
                lambda t: t.select(["dst", "share"]), batch_format="pyarrow"
            ),
            ["dst"],
            [("c", "sum", "share")],
            round_to=None,
        )
        ranks = shuffle_join(
            nodes, contrib, "node", "dst",
            num_partitions=_npart(n_nodes),
            join_type="left_outer",
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "r": pc.add(
                        pa.scalar(BASE, pa.int64()),
                        pc.fill_null(
                            pc.cast(
                                t["c"] if "c" in t.column_names else pa.nulls(t.num_rows),
                                pa.int64(),
                            ),
                            0,
                        ),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    return ranks.map_batches(
        lambda t: pa.table({"node": t["node"], "r3": pc.cast(t["r"], pa.int64())}),
        batch_format="pyarrow",
    )


def x2_triangles(sf: str, n_nodes: int = 1000, keep_mod: int = 13):
    """Triangle counting — the multi-way self-join graph analytic:
    canonical undirected edge set (u < v, distinct, self-loops
    dropped), one edge ⋈ edge shuffle join on the shared vertex
    (canonical order makes every wedge a < b < c exactly once), then a
    second shuffle join against the edge set on the packed (a, c) key
    to close the wedge. The edge derivation keeps 1/keep_mod of
    lineitem rows so wedge cardinality (Σ deg²) stays linear-ish in
    the input rather than cubic in density — the same sparsification a
    real 100-TB link graph gets from its natural sparsity. All
    integers; DuckDB runs the identical 3-way join."""
    ds = read_table(sf, "lineitem", ["l_orderkey", "l_partkey"])

    def mk(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        m = (ok + pk) % keep_mod == 0
        s = (ok[m] % n_nodes).astype(np.int64)
        d = (pk[m] % n_nodes).astype(np.int64)
        nz = s != d
        u = np.minimum(s[nz], d[nz])
        v = np.maximum(s[nz], d[nz])
        return (
            pa.table({"u": pa.array(u), "v": pa.array(v)})
            .group_by(["u", "v"])
            .aggregate([])
        )

    edges = grouped_agg(
        ds.map_batches(mk, batch_format="pyarrow"),
        ["u", "v"],
        [("__n", "count", None)],
        round_to=None,
    ).map_batches(
        lambda t: pa.table(
            {
                "u": t["u"].cast(pa.int64()),
                "v": t["v"].cast(pa.int64()),
                "uv": pa.array(
                    t["u"].to_numpy(zero_copy_only=False).astype(np.int64) * n_nodes
                    + t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    left = edges.map_batches(
        lambda t: pa.table({"a": t["u"], "b": t["v"]}), batch_format="pyarrow"
    )
    right = edges.map_batches(
        lambda t: pa.table({"b2": t["u"], "c": t["v"]}), batch_format="pyarrow"
    )
    wedges = shuffle_join(left, right, "b", "b2").map_batches(
        lambda t: pa.table(
            {
                "ac": pa.array(
                    t["a"].to_numpy(zero_copy_only=False).astype(np.int64) * n_nodes
                    + t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
                )
            }
        ),
        batch_format="pyarrow",
    )
    closed = shuffle_join(
        wedges,
        edges.map_batches(lambda t: t.select(["uv"]), batch_format="pyarrow"),
        "ac",
        "uv",
    )
    n = closed.count()
    return pa.table({"n_triangles": pa.array([int(n)], pa.int64())})


def x3_components(
    sf: str, n_nodes: int = 8000, edge_mod: int = 101, driver_max_pairs: int = 1_000_000
):
    """Weakly-connected components over a SPARSE derived graph (edge
    filter (orderkey+partkey) % edge_mod keeps ~1% of edges, so the
    graph fractures into hundreds of components instead of one blob) —
    the standalone, driver-checkable form of the label-propagation
    engine that near-dedup uses internally (pipelines/components.py).
    Output (component_root, n_nodes) per component; the SQL oracle is
    the min-root recursive CTE. Distributed shape: distinct canonical
    pairs shuffle once, each propagation round is one grouped Min with
    a three-int convergence probe, isolated nodes (self-loops or no
    surviving edge) root themselves via one broadcast anti-probe."""
    from .components import _label_propagation_ds, _union_find
    from .relational import broadcast_sorted_keys, grouped_agg

    ds = read_table(sf, "lineitem", ["l_orderkey", "l_partkey"])

    def e0(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        keep = (ok + pk) % edge_mod == 0
        a = (ok[keep] % n_nodes).astype(np.int64)
        b = (pk[keep] % n_nodes).astype(np.int64)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    edges0 = ds.map_batches(e0, batch_format="pyarrow").materialize()

    def canon(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        keep = a != b
        lo = np.minimum(a[keep], b[keep])
        hi = np.maximum(a[keep], b[keep])
        out = pa.table({"a": pa.array(lo), "b": pa.array(hi)})
        return out.group_by(["a", "b"]).aggregate([])

    from ray.data.aggregate import Count

    pairs = (
        edges0.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="__c"))
        .map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")
    )
    # adaptive (the connected_components routing): this derived graph
    # reduces to ~edge-filter-fraction of lineitem, so below the pair
    # threshold a driver union-find finishes in milliseconds where
    # O(diameter) grouped-Min rounds cost minutes; the distributed
    # label-propagation path takes over above it and is equality-pinned
    # vs this path in tests/test_scale_paths.py
    pairs = pairs.materialize()
    if pairs.count() <= driver_max_pairs:
        comp = _union_find(pairs.to_pandas())
        lt = pa.table(
            {
                "node": pa.array(list(comp.keys()), pa.int64()),
                "lbl": pa.array(list(comp.values()), pa.int64()),
            }
        )
        labels = ray.data.from_arrow(lt)
    else:
        labels = _label_propagation_ds(pairs)

    def nodes_tbl(t: pa.Table) -> pa.Table:
        n = np.unique(np.concatenate([t["a"].to_numpy(), t["b"].to_numpy()]))
        return pa.table({"nd": pa.array(n.astype(np.int64))})

    all_nodes = edges0.map_batches(nodes_tbl, batch_format="pyarrow")

    # labeled nodes -> (node -> lbl) broadcast (component-table is
    # node-bounded); unlabeled (isolated) nodes root themselves
    lref = _x3_label_ref.remote(
        *[ray.put(b) for b in labels.iter_batches(batch_format="pyarrow", batch_size=262144)]
    )

    def root_of(t: pa.Table) -> pa.Table:
        ks, ls = ray.get(lref)
        nd = t["nd"].to_numpy()
        if len(ks):
            idx = np.clip(np.searchsorted(ks, nd), 0, len(ks) - 1)
            root = np.where(ks[idx] == nd, ls[idx], nd)
        else:
            root = nd
        return pa.table({"component_root": pa.array(root.astype(np.int64))})

    from .relational import _distinct

    distinct_nodes = _distinct(all_nodes, "nd")
    rooted = distinct_nodes.map_batches(root_of, batch_format="pyarrow")
    return grouped_agg(
        rooted, ["component_root"], [("n_nodes", "count", None)], round_to=None
    ).sort("component_root")


@ray.remote(num_cpus=1)
def _x3_label_ref(*blocks):
    """(sorted node array, aligned label array) built in a worker."""
    if not blocks:
        return np.array([], np.int64), np.array([], np.int64)
    t = pa.concat_tables(list(blocks)).combine_chunks()
    n = t["node"].to_numpy()
    l = t["lbl"].to_numpy()
    o = np.argsort(n, kind="stable")
    return n[o], l[o]


def x4_kcore(sf: str, n_nodes: int = 2000, edge_mod: int = 3, k: int = 10):
    """k-CORE decomposition by iterative peeling — the graph-curation
    primitive that isolates the densely-connected subgraph (spam-farm
    / boilerplate-cluster detection on a link graph). Derived SKEWED
    graph: a = orderkey % n, b = partkey % (1 + a), so low ids are
    hubs and the degree distribution has a real tail for k to bite
    (the uniform x1/x3 derivations are k-core-degenerate: every node
    survives or none does). Peeling: drop nodes with degree < k,
    delete their edges, repeat to fixpoint (10 rounds at sf0.01).

    Distributed shape: edges stay a Dataset throughout; each round is
    one grouped count (degree) + two adaptive anti semi-joins (edges
    touching dropped nodes). The per-round drop set is NODE-bounded —
    at 100 TB the edge table is the big side and never gathers; the
    node table is the small side by the k-core contract. Convergence
    needs one streaming count per round (O(diameter) rounds, same
    budget as x3's grouped-Min propagation). Output: (node, deg)
    of the surviving core, ordered by node; the DuckDB oracle unrolls
    the peel rounds as a CTE chain (the x1/kmeans unrolling pattern)."""
    from .relational import adaptive_semi_filter

    ds = read_table(sf, "lineitem", ["l_orderkey", "l_partkey"])

    def e0(t: pa.Table) -> pa.Table:
        a0 = (t["l_orderkey"].to_numpy() % n_nodes).astype(np.int64)
        b0 = (t["l_partkey"].to_numpy() % (1 + a0)).astype(np.int64)
        keep = ((t["l_orderkey"].to_numpy() + t["l_partkey"].to_numpy()) % edge_mod == 0) & (
            a0 != b0
        )
        lo = np.minimum(a0[keep], b0[keep])
        hi = np.maximum(a0[keep], b0[keep])
        out = pa.table({"a": pa.array(lo), "b": pa.array(hi)})
        return out.group_by(["a", "b"]).aggregate([])

    from ray.data.aggregate import Count

    edges = (
        ds.map_batches(e0, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="__c"))
        .map_batches(lambda t: t.select(["a", "b"]), batch_format="pyarrow")
        .materialize()
    )

    def degrees(e):
        return grouped_agg(
            e.map_batches(
                lambda t: pa.table(
                    {
                        "node": pa.concat_arrays(
                            [
                                t["a"].combine_chunks().cast(pa.int64()),
                                t["b"].combine_chunks().cast(pa.int64()),
                            ]
                        )
                    }
                ),
                batch_format="pyarrow",
            ),
            ["node"],
            [("deg", "count", None)],
            round_to=None,
        )

    from .relational import broadcast_sorted_keys

    while True:
        deg = degrees(edges).materialize()
        bad = deg.map_batches(
            lambda t: t.filter(pc.less(t["deg"], k)).select(["node"]),
            batch_format="pyarrow",
        ).materialize()
        if bad.count() == 0:
            break
        try:
            # ONE worker-built sorted drop array per round filters both
            # endpoint columns in a single streaming pass (two
            # adaptive_semi_filter calls would distinct+broadcast the
            # same set twice)
            bref = broadcast_sorted_keys(bad, "node")

            def drop_bad(t: pa.Table, _r=bref) -> pa.Table:
                ks = ray.get(_r)
                if len(ks) == 0:
                    return t
                keep = np.ones(t.num_rows, bool)
                for colname in ("a", "b"):
                    v = t[colname].to_numpy().astype(np.int64)
                    idx = np.clip(np.searchsorted(ks, v), 0, len(ks) - 1)
                    keep &= ks[idx] != v
                return t.filter(pa.array(keep))

            edges = edges.map_batches(drop_bad, batch_format="pyarrow").materialize()
        except ValueError:
            # drop set past the loud broadcast bound: co-partitioned
            # shuffle path, once per endpoint column
            edges = adaptive_semi_filter(edges, bad, "a", "node", anti=True)
            edges = adaptive_semi_filter(
                edges, bad, "b", "node", anti=True
            ).materialize()
        if edges.count() == 0:
            break

    out = degrees(edges)
    return out.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"].cast(pa.int64()),
                "deg": t["deg"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("node")


def x4_kcore_sql(n_nodes: int = 2000, edge_mod: int = 3, k: int = 10, rounds: int = 14) -> str:
    """Unrolled peel rounds (fixpoint-stable: a converged round is a
    no-op, so `rounds` only needs to be >= the actual peel count for
    the sf the oracle runs at — 10 at sf0.01, margin to 14). Every
    CTE is MATERIALIZED: inlined, each round references its
    predecessor 5x, so the plan (and the parquet open count) grows
    5^rounds — DuckDB hits EMFILE before it finishes binding."""
    parts = [
        f"WITH e0 AS MATERIALIZED (SELECT DISTINCT LEAST(a0, b0) AS a, GREATEST(a0, b0) AS b FROM ("
        f"SELECT l_orderkey % {n_nodes} AS a0, "
        f"l_partkey % (1 + (l_orderkey % {n_nodes})) AS b0 "
        f"FROM lineitem WHERE (l_orderkey + l_partkey) % {edge_mod} = 0) "
        f"WHERE a0 <> b0)"
    ]
    prev = "e0"
    for i in range(rounds):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT nd, COUNT(*) AS c FROM "
            f"(SELECT a AS nd FROM {prev} UNION ALL SELECT b FROM {prev}) GROUP BY nd)"
        )
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT a, b FROM {prev} "
            f"WHERE a NOT IN (SELECT nd FROM d{i} WHERE c < {k}) "
            f"AND b NOT IN (SELECT nd FROM d{i} WHERE c < {k}))"
        )
        prev = f"r{i}"
    final = (
        f"SELECT nd AS node, CAST(c AS BIGINT) AS deg FROM "
        f"(SELECT nd, COUNT(*) AS c FROM (SELECT a AS nd FROM {prev} "
        f"UNION ALL SELECT b FROM {prev}) GROUP BY nd) WHERE c >= {k} ORDER BY node"
    )
    return ", ".join(parts) + " " + final


class _NodeBoundExceeded(ValueError):
    """x5_bfs broadcast-path bound sentinel (still a ValueError for
    callers that treat the bound generically)."""


def x5_bfs(
    sf: str,
    n_nodes: int = 2000,
    edge_mod: int = 37,
    source_mod: int = 97,
    max_hops: int = 6,
    node_bound: int = 50_000_000,
):
    """Multi-source BFS hop distances over a SPARSE directed link
    graph — the frontier-expansion primitive of crawl-depth analysis
    and seed-set reachability audits ("which pages are within k hops
    of the seed list"). Derived graph: src = orderkey % n, dst =
    partkey % n, keeping edges where (orderkey + partkey) % edge_mod
    == 0 so average out-degree stays ~1 and hop distances spread over
    the full 0..max_hops range instead of saturating in two rounds.
    Sources: nodes ≡ 0 (mod source_mod).

    Distributed shape: the edge table is the ONLY data-sized table —
    it materializes once (deduped, hash-grouped) and each hop is ONE
    streaming pass over it: the frontier broadcasts as a sorted array
    (node-bounded by the BFS contract) and each batch emits its unique
    discovered dsts, which stream back under a LOUD node_bound (the
    broadcast_sorted_keys discipline — per-round traffic is
    min(blocks x reached, edges)). Frontier/visited set algebra is
    numpy setdiff/union on sorted arrays. Past node_bound the whole
    computation falls back to the fully co-partitioned dataset path
    (_x5_bfs_dataset — adaptive semi-filters everywhere), which the
    equality pytest pins to this path. One execution per hop instead
    of six keeps round latency scheduler-free (the x3/x4 lesson).
    Output: (node, dist) for every reached node, ordered by node;
    DuckDB oracle unrolls the rounds (fixpoint-stable — an empty
    frontier makes later rounds no-ops in both engines)."""
    from ray.data.aggregate import Count

    ds = read_table(sf, "lineitem", ["l_orderkey", "l_partkey"])

    def e0(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        keep = (ok + pk) % edge_mod == 0
        out = pa.table(
            {
                "src": pa.array((ok[keep] % n_nodes).astype(np.int64)),
                "dst": pa.array((pk[keep] % n_nodes).astype(np.int64)),
            }
        )
        return out.group_by(["src", "dst"]).aggregate([])

    edges = (
        ds.map_batches(e0, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="__c"))
        .map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
        .materialize()
    )

    def _stream_unique(d, bound: int) -> np.ndarray:
        vals, n = [], 0
        for b in d.iter_batches(batch_format="pyarrow", batch_size=262144):
            n += b.num_rows
            if n > bound:
                raise _NodeBoundExceeded(
                    f"x5_bfs: frontier past {bound} rows — node set too large "
                    "for the broadcast path"
                )
            if b.num_rows:
                vals.append(b["node"].to_numpy(zero_copy_only=False).astype(np.int64))
        if not vals:
            return np.array([], np.int64)
        return np.unique(np.concatenate(vals))

    def srcs(t: pa.Table) -> pa.Table:
        nd = np.unique(
            np.concatenate(
                [t["src"].to_numpy().astype(np.int64), t["dst"].to_numpy().astype(np.int64)]
            )
        )
        return pa.table({"node": pa.array(nd[nd % source_mod == 0])})

    try:
        frontier = _stream_unique(
            edges.map_batches(srcs, batch_format="pyarrow"), node_bound
        )
        visited = frontier
        reached: list[tuple[np.ndarray, int]] = [(frontier, 0)]
        for d in range(1, max_hops + 1):
            fref = ray.put(frontier)

            def nbrs_batch(t: pa.Table, _r=fref) -> pa.Table:
                ks = ray.get(_r)
                s = t["src"].to_numpy().astype(np.int64)
                if len(ks):
                    idx = np.clip(np.searchsorted(ks, s), 0, len(ks) - 1)
                    hit = ks[idx] == s
                else:
                    hit = np.zeros(len(s), bool)
                return pa.table(
                    {
                        "node": pa.array(
                            np.unique(t["dst"].to_numpy().astype(np.int64)[hit])
                        )
                    }
                )

            nbrs = _stream_unique(
                edges.map_batches(nbrs_batch, batch_format="pyarrow"), node_bound
            )
            new = np.setdiff1d(nbrs, visited, assume_unique=True)
            if len(new) == 0:
                break
            reached.append((new, d))
            visited = np.union1d(visited, new)
            frontier = new
        node = np.concatenate([r[0] for r in reached])
        dist = np.concatenate(
            [np.full(len(r[0]), r[1], np.int64) for r in reached]
        )
        o = np.argsort(node, kind="stable")
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"node": pa.array(node[o]), "dist": pa.array(dist[o])})
        )
    except _NodeBoundExceeded:
        # ONLY the bound guard reroutes — a genuine ValueError in a
        # decode/kernel must surface, not silently re-run 6x slower
        return _x5_bfs_dataset(edges, source_mod, max_hops)


def _x5_bfs_dataset(edges, source_mod: int, max_hops: int):
    """Fully co-partitioned BFS (the above-node_bound path): adaptive
    semi-filters for frontier probe and visited anti-join, dataset
    unions for the result — no node-sized driver state anywhere.
    Slower per round (multiple executions) but unbounded."""
    from .relational import _distinct, adaptive_semi_filter

    def srcs(t: pa.Table) -> pa.Table:
        nd = np.unique(
            np.concatenate(
                [t["src"].to_numpy().astype(np.int64), t["dst"].to_numpy().astype(np.int64)]
            )
        )
        return pa.table({"node": pa.array(nd[nd % source_mod == 0])})

    frontier = _distinct(
        edges.map_batches(srcs, batch_format="pyarrow"), "node"
    ).materialize()
    reached = [frontier.map_batches(
        lambda t: t.append_column("dist", pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow",
    ).materialize()]
    visited = frontier
    for d in range(1, max_hops + 1):
        hit = adaptive_semi_filter(edges, frontier, "src", "node")
        nbrs = _distinct(
            hit.map_batches(
                lambda t: pa.table({"node": t["dst"].combine_chunks()}),
                batch_format="pyarrow",
            ),
            "node",
        )
        new = adaptive_semi_filter(nbrs, visited, "node", "node", anti=True).materialize()
        if new.count() == 0:
            break
        reached.append(
            new.map_batches(
                lambda t, _d=d: t.append_column(
                    "dist", pa.array(np.full(t.num_rows, _d, np.int64))
                ),
                batch_format="pyarrow",
            ).materialize()
        )
        visited = visited.union(new).materialize()
        frontier = new
    out = reached[0]
    for r in reached[1:]:
        out = out.union(r)
    return out.map_batches(
        lambda t: pa.table(
            {"node": t["node"].cast(pa.int64()), "dist": t["dist"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).sort("node")


def x5_bfs_sql(
    n_nodes: int = 2000, edge_mod: int = 37, source_mod: int = 97, max_hops: int = 6
) -> str:
    """Unrolled BFS rounds (the x4 pattern; MATERIALIZED so the plan
    stays linear in rounds)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT l_orderkey % {n_nodes} AS src, "
        f"l_partkey % {n_nodes} AS dst FROM lineitem "
        f"WHERE (l_orderkey + l_partkey) % {edge_mod} = 0)",
        f"f0 AS MATERIALIZED (SELECT DISTINCT node FROM "
        f"(SELECT src AS node FROM e UNION SELECT dst FROM e) "
        f"WHERE node % {source_mod} = 0)",
        "v0 AS MATERIALIZED (SELECT node FROM f0)",
    ]
    for i in range(1, max_hops + 1):
        parts.append(
            f"f{i} AS MATERIALIZED (SELECT DISTINCT e.dst AS node FROM e "
            f"JOIN f{i - 1} ON e.src = f{i - 1}.node "
            f"WHERE e.dst NOT IN (SELECT node FROM v{i - 1}))"
        )
        parts.append(
            f"v{i} AS MATERIALIZED (SELECT node FROM v{i - 1} UNION SELECT node FROM f{i})"
        )
    final = (
        " UNION ALL ".join(
            f"SELECT node, CAST({i} AS BIGINT) AS dist FROM f{i}" for i in range(max_hops + 1)
        )
    )
    return ", ".join(parts) + f" SELECT node, dist FROM ({final}) ORDER BY node"


# --------------------------------------------------------------- x6 sssp


def x6_sssp(
    sf: str,
    n_nodes: int = 2000,
    edge_mod: int = 37,
    source_mod: int = 97,
    max_hops: int = 6,
    node_bound: int = 50_000_000,
):
    """Multi-source WEIGHTED shortest paths, bounded-hop Bellman-Ford
    (round 5) — the weighted sibling of x5_bfs: "cheapest crawl route
    within k link hops" / cost-bounded reachability. Same derived
    sparse graph as x5 (src = orderkey % n, dst = partkey % n, kept
    when (orderkey + partkey) % edge_mod == 0) with a deterministic
    integer weight w = 1 + (src + dst) % 7 per distinct edge; sources
    (node % source_mod == 0) start at dist 0. After round i the map
    holds the exact ≤i-edge shortest distance, so max_hops rounds in
    both engines is fixpoint-comparable regardless of cycles.

    Distributed shape (the x5 discipline): edges materialize ONCE;
    each round broadcasts only the IMPROVED frontier (nodes + dists,
    ray.put once, read per batch) and makes ONE streaming pass over
    the edge table — each batch emits its LOCAL per-dst min candidate
    (np.minimum.at combiner), so per-round traffic back is
    min(blocks x touched-dsts, edges), streamed under a LOUD
    node_bound. The driver's dist map is node-bounded by the same
    contract. Early exit when a round improves nothing. Past
    node_bound the whole computation reroutes to the fully
    co-partitioned dataset path (_x6_sssp_dataset: shuffle_join + a
    grouped Min per round, no node-sized driver state), which the
    equality pytest pins to this path."""
    from ray.data.aggregate import Count

    ds = read_table(sf, "lineitem", ["l_orderkey", "l_partkey"])

    def e0(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        keep = (ok + pk) % edge_mod == 0
        out = pa.table(
            {
                "src": pa.array((ok[keep] % n_nodes).astype(np.int64)),
                "dst": pa.array((pk[keep] % n_nodes).astype(np.int64)),
            }
        )
        return out.group_by(["src", "dst"]).aggregate([])

    def addw(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy().astype(np.int64)
        d = t["dst"].to_numpy().astype(np.int64)
        return pa.table(
            {"src": t["src"], "dst": t["dst"], "w": pa.array(1 + (s + d) % 7)}
        )

    edges = (
        ds.map_batches(e0, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="__c"))
        .map_batches(lambda t: t.select(["src", "dst"]), batch_format="pyarrow")
        .map_batches(addw, batch_format="pyarrow")
        .materialize()
    )

    def srcs(t: pa.Table) -> pa.Table:
        nd = np.unique(
            np.concatenate(
                [t["src"].to_numpy().astype(np.int64), t["dst"].to_numpy().astype(np.int64)]
            )
        )
        return pa.table({"node": pa.array(nd[nd % source_mod == 0])})

    def _stream_pairs(d, bound: int) -> tuple[np.ndarray, np.ndarray]:
        """Stream (node, dist) rows under the loud bound, returning the
        per-node MIN — the driver-side merge of the per-batch combiners."""
        ns, vs, n = [], [], 0
        for b in d.iter_batches(batch_format="pyarrow", batch_size=262144):
            n += b.num_rows
            if n > bound:
                raise _NodeBoundExceeded(
                    f"x6_sssp: candidate stream past {bound} rows — reroute"
                )
            if b.num_rows:
                ns.append(b["node"].to_numpy(zero_copy_only=False).astype(np.int64))
                vs.append(b["dist"].to_numpy(zero_copy_only=False).astype(np.int64))
        if not ns:
            return np.array([], np.int64), np.array([], np.int64)
        node = np.concatenate(ns)
        dist = np.concatenate(vs)
        un, inv = np.unique(node, return_inverse=True)
        best = np.full(len(un), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(best, inv, dist)
        return un, best

    try:
        def seed(t: pa.Table) -> pa.Table:
            s = srcs(t)
            return s.append_column("dist", pa.array(np.zeros(s.num_rows, np.int64)))

        f_nodes, f_dists = _stream_pairs(
            edges.map_batches(seed, batch_format="pyarrow"), node_bound
        )
        # driver dist map (sorted by node; node-bounded by contract)
        m_nodes, m_dists = f_nodes.copy(), f_dists.copy()
        for _ in range(max_hops):
            if len(f_nodes) == 0:
                break
            fref = ray.put((f_nodes, f_dists))

            def relax(t: pa.Table, _r=fref) -> pa.Table:
                kn, kd = ray.get(_r)
                s = t["src"].to_numpy().astype(np.int64)
                idx = np.clip(np.searchsorted(kn, s), 0, max(len(kn) - 1, 0))
                hit = len(kn) > 0
                mask = kn[idx] == s if hit else np.zeros(len(s), bool)
                if not mask.any():
                    return pa.table(
                        {
                            "node": pa.array([], pa.int64()),
                            "dist": pa.array([], pa.int64()),
                        }
                    )
                d = t["dst"].to_numpy().astype(np.int64)[mask]
                cand = kd[idx[mask]] + t["w"].to_numpy().astype(np.int64)[mask]
                un, inv = np.unique(d, return_inverse=True)
                best = np.full(len(un), np.iinfo(np.int64).max, np.int64)
                np.minimum.at(best, inv, cand)
                return pa.table({"node": pa.array(un), "dist": pa.array(best)})

            c_nodes, c_dists = _stream_pairs(
                edges.map_batches(relax, batch_format="pyarrow"), node_bound
            )
            if len(c_nodes) == 0:
                break
            # merge candidates into the map; frontier = strictly improved
            pos = np.searchsorted(m_nodes, c_nodes)
            known = (pos < len(m_nodes)) & (
                m_nodes[np.clip(pos, 0, max(len(m_nodes) - 1, 0))] == c_nodes
            )
            improved_known = known & (c_dists < m_dists[np.clip(pos, 0, max(len(m_nodes) - 1, 0))])
            new_nodes = c_nodes[~known]
            # update knowns in place
            m_dists[pos[improved_known]] = c_dists[improved_known]
            if len(new_nodes):
                m_nodes = np.concatenate([m_nodes, new_nodes])
                m_dists = np.concatenate([m_dists, c_dists[~known]])
                o = np.argsort(m_nodes, kind="stable")
                m_nodes, m_dists = m_nodes[o], m_dists[o]
            f_nodes = np.concatenate([c_nodes[improved_known], new_nodes])
            f_dists = np.concatenate([c_dists[improved_known], c_dists[~known]])
            o = np.argsort(f_nodes, kind="stable")
            f_nodes, f_dists = f_nodes[o], f_dists[o]
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"node": pa.array(m_nodes), "dist": pa.array(m_dists)})
        )
    except _NodeBoundExceeded:
        return _x6_sssp_dataset(edges, source_mod, max_hops)


def _x6_sssp_dataset(edges, source_mod: int, max_hops: int):
    """Co-partitioned Bellman-Ford (above-node_bound path): per round,
    candidates = edges ⋈ dist on src (hash-shuffle join), then a
    grouped Min over (map ∪ candidates) — no node-sized driver state.
    Runs exactly max_hops rounds (fixpoint-stable, like the oracle's
    unrolled CTEs; a detect-no-change early exit would cost an extra
    execution per round)."""
    from ray.data.aggregate import Min

    def srcs(t: pa.Table) -> pa.Table:
        nd = np.unique(
            np.concatenate(
                [t["src"].to_numpy().astype(np.int64), t["dst"].to_numpy().astype(np.int64)]
            )
        )
        nd = nd[nd % source_mod == 0]
        return pa.table({"node": pa.array(nd)})

    from .relational import _distinct

    dist = (
        _distinct(edges.map_batches(srcs, batch_format="pyarrow"), "node")
        .map_batches(
            lambda t: t.append_column(
                "dist", pa.array(np.zeros(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    for _ in range(max_hops):
        cand = shuffle_join(edges, dist, on="src", right_on="node").map_batches(
            lambda t: pa.table(
                {
                    "node": t["dst"].cast(pa.int64()),
                    "dist": pc.add(
                        pc.cast(t["dist"], pa.int64()), pc.cast(t["w"], pa.int64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        dist = (
            dist.union(cand)
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t["node"].cast(pa.int64()),
                        "dist": t["dist"].cast(pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return dist.sort("node")


def x6_sssp_sql(
    n_nodes: int = 2000, edge_mod: int = 37, source_mod: int = 97, max_hops: int = 6
) -> str:
    """Unrolled Bellman-Ford rounds: d_i = per-node MIN over
    d_{i-1} ∪ relax(d_{i-1}) — after round i each node holds the exact
    ≤i-edge shortest distance (MATERIALIZED keeps the plan linear)."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT src, dst, 1 + (src + dst) % 7 AS w FROM "
        f"(SELECT DISTINCT l_orderkey % {n_nodes} AS src, l_partkey % {n_nodes} AS dst "
        f"FROM lineitem WHERE (l_orderkey + l_partkey) % {edge_mod} = 0))",
        f"d0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS dist FROM "
        f"(SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION SELECT dst FROM e) "
        f"WHERE node % {source_mod} = 0))",
    ]
    for i in range(1, max_hops + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT node, MIN(dist) AS dist FROM ("
            f"SELECT node, dist FROM d{i - 1} UNION ALL "
            f"SELECT e.dst AS node, d{i - 1}.dist + e.w AS dist FROM e "
            f"JOIN d{i - 1} ON e.src = d{i - 1}.node) GROUP BY node)"
        )
    return (
        ", ".join(parts)
        + f" SELECT node, CAST(dist AS BIGINT) AS dist FROM d{max_hops} ORDER BY node"
    )


def x7_hits(sf: str, iters: int = 2, n_nodes: int = 1000):
    """HITS hubs & authorities (Kleinberg 1999) — the mutual-
    reinforcement sibling of x1's PageRank, completing the graph
    family (pagerank / triangles / components / k-core / BFS / SSSP /
    HITS). Integer-exact: scores are int64 micro-units; each half-step
    is a_t = A^T h_{t-1} (sum of hub scores over in-edges) then
    h_t = A a_t (sum of the NEW authority scores over out-edges), and
    every half-step max-normalizes by s' = s * 10^6 // max(s) — floor
    division on positive ints, so DuckDB's truncating ``//`` agrees
    and the unrolled-CTE oracle hash-matches bit-for-bit. The max is
    ONE scalar pulled per half-step (node-bounded aggregate, never the
    edge set).

    Distributed shape per half-step: one edges ⋈ scores shuffle join
    on the shared endpoint (the edge-cardinality exchange, same as
    x1), a pre-aggregated grouped sum, a node-sized LEFT join back so
    degree-0 nodes keep score 0. Edges materialize once. Overflow
    bound: max raw sum * 10^6 must stay under 2^63 — checked loudly;
    the fix at larger scale is a bigger n_nodes (thinner in-degrees)
    or a smaller unit."""
    edges = _edges(sf, n_nodes).materialize()
    npart = _npart(table_rows(sf, "lineitem"))

    nodes = grouped_agg(
        edges.map_batches(
            lambda t: pa.table(
                {"node": pa.concat_arrays([t["src"].combine_chunks(), t["dst"].combine_chunks()])}
            ),
            batch_format="pyarrow",
        ),
        ["node"],
        [("c", "count", None)],
        round_to=None,
    ).map_batches(lambda t: t.select(["node"]), batch_format="pyarrow").materialize()

    def _const_scores(name):
        return nodes.map_batches(
            lambda t: pa.table(
                {"node": t["node"], name: pa.array(np.full(t.num_rows, R0, np.int64))}
            ),
            batch_format="pyarrow",
        ).materialize()

    def _half_step(scores, score_col, join_on, group_to, out_col):
        """scores(node, score_col) -> (node, out_col): sum score over
        edges decorated with the score on `join_on`, grouped to
        `group_to`, then max-normalized to micro-units. The score side
        is NODE-sized, so adaptive_dim_join broadcasts it and the edge
        table never shuffles for the join (it did in the first
        version: 8 edge-cardinality shuffle joins per query, and the
        unmaterialized `raw` re-executed each of them twice for the
        .max() pull — 35 s -> ~8 s at sf0.1); raw is node-sized and
        materializes before its two consumers."""
        from .relational import adaptive_dim_join

        raw = grouped_agg(
            adaptive_dim_join(
                edges, join_on, scores, "node", [score_col], how="inner"
            ).map_batches(
                lambda t: pa.table({"gnode": t[group_to], "s": t[score_col]}),
                batch_format="pyarrow",
            ),
            ["gnode"],
            [("s", "sum", "s")],
            round_to=None,
        ).materialize()
        m = raw.max("s")
        m = int(m) if m is not None else 0
        if m * R0 >= 2**63:
            raise ValueError(
                f"x7_hits: max raw score {m} * {R0} overflows int64 — raise n_nodes"
            )
        m = max(m, 1)
        return shuffle_join(
            nodes, raw, "node", "gnode",
            num_partitions=_npart(n_nodes),
            join_type="left_outer",
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    out_col: pa.array(
                        pc.fill_null(pc.cast(t["s"], pa.int64()), 0).to_numpy(
                            zero_copy_only=False
                        )
                        * R0
                        // m
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    hub = _const_scores("h")
    auth = None
    for _ in range(iters):
        # authority from hubs: in-edges (join hubs on src, group by dst)
        auth = _half_step(hub, "h", "src", "dst", "a")
        # hubs from the NEW authorities: out-edges (join on dst, group by src)
        hub = _half_step(auth, "a", "dst", "src", "h")

    auth_r = auth.map_batches(
        lambda t: pa.table({"anode": t["node"], "a": t["a"]}),
        batch_format="pyarrow",
    )
    both = shuffle_join(
        hub, auth_r, "node", "anode", num_partitions=_npart(n_nodes)
    )
    return both.map_batches(
        lambda t: pa.table(
            {
                "node": pc.cast(t["node"], pa.int64()),
                "hub": pc.cast(t["h"], pa.int64()),
                "auth": pc.cast(t["a"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("node")


def x7_hits_sql(iters: int = 2, n_nodes: int = 1000) -> str:
    """Unrolled HITS half-steps as a CTE chain (the x1 oracle idiom):
    every value is a non-negative BIGINT so DuckDB's truncating //
    equals numpy's floor //; the max-normalizer is a scalar subquery
    per half-step."""
    ctes = [
        f"edges AS (SELECT l_orderkey % {n_nodes} AS src, "
        f"l_partkey % {n_nodes} AS dst FROM lineitem)",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        f"h0 AS (SELECT node, CAST({R0} AS BIGINT) AS s FROM nodes)",
    ]
    prev_h = "h0"
    for i in range(1, iters + 1):
        ctes.append(
            f"a{i}r AS (SELECT e.dst AS node, SUM(h.s) AS s FROM edges e "
            f"JOIN {prev_h} h ON h.node = e.src GROUP BY e.dst)"
        )
        ctes.append(
            f"a{i} AS (SELECT n.node, COALESCE(r.s, 0) * {R0} // "
            f"GREATEST((SELECT MAX(s) FROM a{i}r), 1) AS s "
            f"FROM nodes n LEFT JOIN a{i}r r USING (node))"
        )
        ctes.append(
            f"h{i}r AS (SELECT e.src AS node, SUM(a.s) AS s FROM edges e "
            f"JOIN a{i} a ON a.node = e.dst GROUP BY e.src)"
        )
        ctes.append(
            f"h{i} AS (SELECT n.node, COALESCE(r.s, 0) * {R0} // "
            f"GREATEST((SELECT MAX(s) FROM h{i}r), 1) AS s "
            f"FROM nodes n LEFT JOIN h{i}r r USING (node))"
        )
        prev_h = f"h{i}"
    k = iters
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT CAST(h.node AS BIGINT) AS node, CAST(h.s AS BIGINT) AS hub, "
        f"CAST(a.s AS BIGINT) AS auth "
        f"FROM h{k} h JOIN a{k} a USING (node) ORDER BY h.node"
    )


def x8_assortativity(sf: str, n_nodes: int = 1000):
    """DEGREE ASSORTATIVITY sufficient statistics of the directed link
    graph — the Pearson correlation between out-degree(src) and
    in-degree(dst) across edges (Newman 2002), emitted as ONE row of
    exact integer sums (m, s_du, s_dv, s_dudv, s_du2, s_dv2) so the
    driver hash-compare is float-free; r = (m*s_dudv - s_du*s_dv) /
    sqrt((m*s_du2 - s_du^2)(m*s_dv2 - s_dv2^2)) is derivable.

    Distributed shape: two node-sized degree tables (grouped count),
    each joined onto the edge stream via adaptive_dim_join (broadcast
    under the bound, co-partitioned shuffle above — the edge table is
    the 100-TB side and crosses the wire at most once per decoration),
    then a per-batch integer fold to six partial sums and one
    block-count-sized final fold."""
    from .relational import adaptive_dim_join

    edges = _edges(sf, n_nodes)
    od = grouped_agg(edges, ["src"], [("od", "count", None)], round_to=None)
    idg = grouped_agg(edges, ["dst"], [("idg", "count", None)], round_to=None)
    e = adaptive_dim_join(edges, "src", od, "src", ["od"])
    e = adaptive_dim_join(e, "dst", idg, "dst", ["idg"])

    def fold(t: pa.Table) -> pa.Table:
        du = t["od"].to_numpy(zero_copy_only=False).astype(np.int64)
        dv = t["idg"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "m": pa.array([t.num_rows], pa.int64()),
                "s_du": pa.array([int(du.sum())], pa.int64()),
                "s_dv": pa.array([int(dv.sum())], pa.int64()),
                "s_dudv": pa.array([int((du * dv).sum())], pa.int64()),
                "s_du2": pa.array([int((du * du).sum())], pa.int64()),
                "s_dv2": pa.array([int((dv * dv).sum())], pa.int64()),
            }
        )

    parts = e.map_batches(fold, batch_format="pyarrow")
    cols = ["m", "s_du", "s_dv", "s_dudv", "s_du2", "s_dv2"]
    acc = {c: 0 for c in cols}
    # block-count-sized fold (one row per input block) — not a data gather
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=65536):
        for c in cols:
            acc[c] += int(pc.sum(b[c]).as_py() or 0)
    return pa.table({c: pa.array([acc[c]], pa.int64()) for c in cols})


def x8_assortativity_sql(n_nodes: int = 1000) -> str:
    return (
        f"WITH e AS (SELECT l_orderkey % {n_nodes} AS src, "
        f"l_partkey % {n_nodes} AS dst FROM lineitem), "
        "od AS (SELECT src, COUNT(*) AS od FROM e GROUP BY 1), "
        "idg AS (SELECT dst, COUNT(*) AS idg FROM e GROUP BY 1) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS m, "
        "CAST(SUM(od) AS BIGINT) AS s_du, CAST(SUM(idg) AS BIGINT) AS s_dv, "
        "CAST(SUM(od * idg) AS BIGINT) AS s_dudv, "
        "CAST(SUM(od * od) AS BIGINT) AS s_du2, "
        "CAST(SUM(idg * idg) AS BIGINT) AS s_dv2 "
        "FROM e JOIN od USING (src) JOIN idg USING (dst)"
    )


def x9_link_prediction(sf: str, n_nodes: int = 1000, keep_mod: int = 13, k: int = 50):
    """LINK PREDICTION by common-neighbor count (Liben-Nowell &
    Kleinberg 2003) over the x2 sparsified undirected graph: for every
    NON-edge pair at distance 2, cn = |N(u) ∩ N(v)|, decorated with
    both degrees so the Jaccard coefficient cn / (deg_u + deg_v - cn)
    is derivable as an exact rational — no float leaves the engine.
    Top-``k`` by (cn DESC, u ASC, v ASC).

    Distributed shape: canonical distinct edge set (x2 derivation)
    materializes once; the two-direction adjacency streams from it;
    the wedge self-join on the shared middle vertex is THE cost
    (Σ deg² pairs — linear-ish on the keep_mod-sparsified graph, the
    same natural-sparsity assumption x2 documents); candidate counts
    come from one combiner-first grouped count; existing edges drop
    via the packed-key adaptive ANTI semi-filter (edge-set-sized
    build); degrees decorate through two node-sized adaptive_dim_joins
    (the fact side crosses the wire at most once each); top-k is a
    per-batch combiner + one k*blocks-row finalize — never a global
    sort."""
    from .relational import (
        adaptive_dim_join,
        adaptive_semi_filter,
        grouped_agg,
        shuffle_join,
    )

    ds = read_table(sf, "lineitem", ["l_orderkey", "l_partkey"])

    def mk(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        m = (ok + pk) % keep_mod == 0
        s = (ok[m] % n_nodes).astype(np.int64)
        d = (pk[m] % n_nodes).astype(np.int64)
        nz = s != d
        u = np.minimum(s[nz], d[nz])
        v = np.maximum(s[nz], d[nz])
        return (
            pa.table({"u": pa.array(u), "v": pa.array(v)})
            .group_by(["u", "v"])
            .aggregate([])
        )

    edges = grouped_agg(
        ds.map_batches(mk, batch_format="pyarrow"),
        ["u", "v"],
        [("__n", "count", None)],
        round_to=None,
    ).map_batches(
        lambda t: pa.table(
            {"u": t["u"].cast(pa.int64()), "v": t["v"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    adj = edges.map_batches(
        lambda t: pa.table(
            {
                "x": pa.concat_arrays(
                    [t["u"].combine_chunks(), t["v"].combine_chunks()]
                ),
                "y": pa.concat_arrays(
                    [t["v"].combine_chunks(), t["u"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    # wedge self-join on the shared middle vertex; canonical y1 < y2
    left = adj.map_batches(
        lambda t: pa.table({"x": t["x"], "y1": t["y"]}), batch_format="pyarrow"
    )
    right = adj.map_batches(
        lambda t: pa.table({"x2": t["x"], "y2": t["y"]}), batch_format="pyarrow"
    )
    pairs = shuffle_join(left, right, "x", "x2").map_batches(
        lambda t: t.filter(
            pa.array(
                t["y1"].to_numpy(zero_copy_only=False)
                < t["y2"].to_numpy(zero_copy_only=False)
            )
        ).select(["y1", "y2"]),
        batch_format="pyarrow",
    )
    cn = grouped_agg(
        pairs, ["y1", "y2"], [("cn", "count", None)], round_to=None
    ).map_batches(
        lambda t: pa.table(
            {
                "u": t["y1"].cast(pa.int64()),
                "v": t["y2"].cast(pa.int64()),
                "cn": t["cn"].cast(pa.int64()),
                "uv": pa.array(
                    t["y1"].to_numpy(zero_copy_only=False).astype(np.int64) * n_nodes
                    + t["y2"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )

    ekeys = edges.map_batches(
        lambda t: pa.table(
            {
                "uv": pa.array(
                    t["u"].to_numpy(zero_copy_only=False).astype(np.int64) * n_nodes
                    + t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
                )
            }
        ),
        batch_format="pyarrow",
    )
    cand = adaptive_semi_filter(cn, ekeys, "uv", "uv", anti=True)

    deg = grouped_agg(adj, ["x"], [("d", "count", None)], round_to=None).map_batches(
        lambda t: pa.table(
            {"x": t["x"].cast(pa.int64()), "d": t["d"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    dec = adaptive_dim_join(cand, "u", deg, "x", ["d"])
    dec = dec.map_batches(
        lambda t: t.rename_columns(
            [n if n != "d" else "deg_u" for n in t.column_names]
        ),
        batch_format="pyarrow",
    )
    dec = adaptive_dim_join(dec, "v", deg, "x", ["d"])
    dec = dec.map_batches(
        lambda t: t.rename_columns(
            [n if n != "d" else "deg_v" for n in t.column_names]
        ),
        batch_format="pyarrow",
    )

    def local_topk(t: pa.Table) -> pa.Table:
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    ("cn", "descending"),
                    ("u", "ascending"),
                    ("v", "ascending"),
                ],
            )
        )
        return t.slice(0, k)

    def final_rank(t: pa.Table) -> pa.Table:
        t = local_topk(t)
        return pa.table(
            {
                "u": pc.cast(t["u"], pa.int64()),
                "v": pc.cast(t["v"], pa.int64()),
                "cn": pc.cast(t["cn"], pa.int64()),
                "deg_u": pc.cast(t["deg_u"], pa.int64()),
                "deg_v": pc.cast(t["deg_v"], pa.int64()),
                "rank": pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64)),
            }
        )

    return (
        dec.map_batches(
            lambda t: local_topk(t.select(["u", "v", "cn", "deg_u", "deg_v"])),
            batch_format="pyarrow",
        )
        .repartition(1)
        .map_batches(final_rank, batch_format="pyarrow", batch_size=None)
    )


def x9_link_prediction_sql(n_nodes: int = 1000, keep_mod: int = 13, k: int = 50) -> str:
    return (
        "WITH e0 AS (SELECT DISTINCT "
        f"least(l_orderkey % {n_nodes}, l_partkey % {n_nodes}) AS u, "
        f"greatest(l_orderkey % {n_nodes}, l_partkey % {n_nodes}) AS v "
        f"FROM lineitem WHERE (l_orderkey + l_partkey) % {keep_mod} = 0 "
        f"AND l_orderkey % {n_nodes} <> l_partkey % {n_nodes}), "
        "adj AS (SELECT u AS x, v AS y FROM e0 UNION ALL SELECT v, u FROM e0), "
        "wed AS (SELECT a.y AS u, b.y AS v, CAST(COUNT(*) AS BIGINT) AS cn "
        "FROM adj a JOIN adj b ON a.x = b.x AND a.y < b.y GROUP BY 1, 2), "
        "cand AS (SELECT w.u, w.v, w.cn FROM wed w LEFT JOIN e0 "
        "ON e0.u = w.u AND e0.v = w.v WHERE e0.u IS NULL), "
        "deg AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1) "
        "SELECT u, v, cn, deg_u, deg_v, rank FROM ("
        "SELECT c.u, c.v, c.cn, du.d AS deg_u, dv.d AS deg_v, "
        "ROW_NUMBER() OVER (ORDER BY c.cn DESC, c.u, c.v) AS rank "
        "FROM cand c JOIN deg du ON du.x = c.u JOIN deg dv ON dv.x = c.v) "
        f"WHERE rank <= {k} ORDER BY rank"
    )


def x10_clustering_coeff(sf: str, n_nodes: int = 1000, keep_mod: int = 13):
    """LOCAL CLUSTERING COEFFICIENT sufficient statistics per node
    (Watts & Strogatz 1998): n_tri = triangles through the node, deg =
    undirected degree — the coefficient 2*n_tri / (deg*(deg-1)) is
    derivable as an exact rational, so no float leaves the engine.
    Nodes with deg >= 2 only (the coefficient is undefined below),
    ordered by node. Completes the per-node view of x2's global count.

    Distributed shape: the x2 canonical edge set materializes once;
    the wedge join keeps all three corners this time (a, b, c), the
    closing join runs on the packed (a, c) key, the per-node triangle
    count is one combiner-first grouped count over the 3x exploded
    corners, and degrees decorate via a node-sized adaptive_dim_join
    (left, null -> 0)."""
    from .relational import adaptive_dim_join, grouped_agg, shuffle_join

    ds = read_table(sf, "lineitem", ["l_orderkey", "l_partkey"])

    def mk(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy()
        pk = t["l_partkey"].to_numpy()
        m = (ok + pk) % keep_mod == 0
        s = (ok[m] % n_nodes).astype(np.int64)
        d = (pk[m] % n_nodes).astype(np.int64)
        nz = s != d
        u = np.minimum(s[nz], d[nz])
        v = np.maximum(s[nz], d[nz])
        return (
            pa.table({"u": pa.array(u), "v": pa.array(v)})
            .group_by(["u", "v"])
            .aggregate([])
        )

    edges = grouped_agg(
        ds.map_batches(mk, batch_format="pyarrow"),
        ["u", "v"],
        [("__n", "count", None)],
        round_to=None,
    ).map_batches(
        lambda t: pa.table(
            {"u": t["u"].cast(pa.int64()), "v": t["v"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    left = edges.map_batches(
        lambda t: pa.table({"a": t["u"], "b": t["v"]}), batch_format="pyarrow"
    )
    right = edges.map_batches(
        lambda t: pa.table({"b2": t["u"], "c": t["v"]}), batch_format="pyarrow"
    )
    wedges = shuffle_join(left, right, "b", "b2").map_batches(
        lambda t: pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "c": t["c"],
                "ac": pa.array(
                    t["a"].to_numpy(zero_copy_only=False).astype(np.int64) * n_nodes
                    + t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    ekeys = edges.map_batches(
        lambda t: pa.table(
            {
                "uv": pa.array(
                    t["u"].to_numpy(zero_copy_only=False).astype(np.int64) * n_nodes
                    + t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
                )
            }
        ),
        batch_format="pyarrow",
    )
    tri = shuffle_join(wedges, ekeys, "ac", "uv")
    corners = tri.map_batches(
        lambda t: pa.table(
            {
                "node": pa.concat_arrays(
                    [
                        t["a"].combine_chunks().cast(pa.int64()),
                        t["b"].combine_chunks().cast(pa.int64()),
                        t["c"].combine_chunks().cast(pa.int64()),
                    ]
                )
            }
        ),
        batch_format="pyarrow",
    )
    tc = grouped_agg(corners, ["node"], [("n_tri", "count", None)], round_to=None)

    adj = edges.map_batches(
        lambda t: pa.table(
            {
                "x": pa.concat_arrays(
                    [t["u"].combine_chunks(), t["v"].combine_chunks()]
                )
            }
        ),
        batch_format="pyarrow",
    )
    deg = grouped_agg(adj, ["x"], [("deg", "count", None)], round_to=None)
    dec = adaptive_dim_join(deg, "x", tc, "node", ["n_tri"], how="left")

    def finalize(t: pa.Table) -> pa.Table:
        dv = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = (
            t["n_tri"]
            .combine_chunks()
            .fill_null(0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        keep = dv >= 2
        return pa.table(
            {
                "node": pa.array(
                    t["x"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
                ),
                "deg": pa.array(dv[keep]),
                "n_tri": pa.array(nt[keep]),
            }
        )

    return dec.map_batches(finalize, batch_format="pyarrow").sort("node")


def x10_clustering_coeff_sql(n_nodes: int = 1000, keep_mod: int = 13) -> str:
    return (
        f"WITH raw AS (SELECT (l_orderkey % {n_nodes}) AS s, "
        f"(l_partkey % {n_nodes}) AS d FROM lineitem "
        f"WHERE (l_orderkey + l_partkey) % {keep_mod} = 0), "
        "e AS (SELECT DISTINCT LEAST(s, d) AS u, GREATEST(s, d) AS v "
        "FROM raw WHERE s <> d), "
        "tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM e e1 "
        "JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v), "
        "corners AS (SELECT UNNEST([a, b, c]) AS node FROM tri), "
        "tc AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri "
        "FROM corners GROUP BY 1), "
        "adj AS (SELECT u AS x FROM e UNION ALL SELECT v FROM e), "
        "deg AS (SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS deg "
        "FROM adj GROUP BY 1) "
        "SELECT d.node, d.deg, COALESCE(tc.n_tri, 0) AS n_tri "
        "FROM deg d LEFT JOIN tc USING (node) WHERE d.deg >= 2 ORDER BY d.node"
    )
