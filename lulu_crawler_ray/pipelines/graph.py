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
