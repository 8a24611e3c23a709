"""Distributed connected components over an edge list — the scale path
for near-dup clustering (MinHash / phash / cosine pairs -> clusters).

Driver union-find is right when the pair set is provably small
(ray_guide near-dup note); when it isn't, this module's iterative
min-label propagation runs entirely as Dataset ops:

    labels <- each node starts as its own label (its min neighbor incl.
              itself); each round, every node takes the min label in its
              neighborhood (groupby-min over the undirected edge list +
              label join); stop when no label changed.

Rounds needed = graph diameter in the worst case; near-dup graphs are
unions of small cliques/chains, so a handful of rounds closes them.
`connected_components` picks driver union-find below a pair threshold
and label propagation above it — both return the identical
(node, component_min_label) mapping.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _union_find(pairs: pd.DataFrame) -> dict:
    """Driver union-find over any orderable node ids (ints OR strings —
    the image family clusters hex ids directly on the small path); root
    = min id per component."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    is_int = len(pairs) and not isinstance(pairs["a"].iloc[0], str)
    for a, b in zip(pairs["a"], pairs["b"]):
        if is_int:
            a, b = int(a), int(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _label_sum(labels: ray.data.Dataset) -> int:
    """Exact (bigint) sum of the label column as three 22-bit slice
    sums reassembled on the driver — a single int64 Sum can wrap at
    10^10 nodes x 10^10-sized ids; each slice sum stays < 2^63. The
    driver sees THREE integers, never the label table."""

    def slices(t: pa.Table) -> pa.Table:
        l = t["lbl"].to_numpy().astype(np.int64)
        if len(l) and l.min() < 0:
            raise ValueError("label propagation requires non-negative node ids")
        return pa.table(
            {
                "s0": pa.array(l & 0x3FFFFF),
                "s1": pa.array((l >> 22) & 0x3FFFFF),
                "s2": pa.array(l >> 44),
            }
        )

    s = labels.map_batches(slices, batch_format="pyarrow").sum(["s0", "s1", "s2"])
    return int(s["sum(s0)"]) + (int(s["sum(s1)"]) << 22) + (int(s["sum(s2)"]) << 44)


def _label_propagation_ds(
    pairs: ray.data.Dataset, max_rounds: int = 50
) -> ray.data.Dataset:
    """pairs(a,b) -> Dataset(node, lbl) via distributed min-label
    propagation (groupby-min per round; edges stay distributed).

    Convergence is detected WITHOUT materializing the label table on
    the driver: new_label(node) = min(old, neighborhood) is monotone
    non-increasing per node and the node set is fixed, so the exact
    label-multiset sum strictly decreases until the fixpoint —
    sum-unchanged ⟺ no label changed. One cheap aggregate per round
    (three int64s to the driver) replaces the two full to_pandas()
    gathers per round that round 2 shipped."""
    from ray.data.aggregate import Min

    from .relational import _nonempty, _npart

    # undirected edge list, both directions: (node, neighbor)
    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), pa.int64()),
                "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    # _nonempty: zero-row pair blocks become schema-less RefBundles and
    # poison the per-round hash join (see relational._nonempty)
    edges = _nonempty(pairs.map_batches(both_dirs, batch_format="pyarrow"))
    # label(node) = min(node, min neighbor) initially
    labels = edges.groupby("node").aggregate(Min("nbr", alias_name="lbl"))
    labels = _nonempty(
        labels.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "lbl": pa.array(
                        np.minimum(t["node"].to_numpy(), t["lbl"].to_numpy()), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )

    # size the per-round join from the DATA (edges is already
    # materialized, so count() is metadata-cheap): 32 partitions of
    # aggregator spin-up per round on a 100k-row join was the whole
    # cost of label propagation at sf0.1 (the j2 lesson, round 3)
    nparts = _npart(edges.count())
    cur_sum = _label_sum(labels)
    for _ in range(max_rounds):
        # propagate: each node takes min(own label, labels of neighbors)
        renamed = labels.map_batches(
            lambda t: t.rename_columns(["lnode", "lbl"]), batch_format="pyarrow"
        )
        nbr_lbl = edges.join(
            renamed, join_type="inner", num_partitions=nparts, on=("nbr",), right_on=("lnode",)
        )
        prop = _nonempty(
            nbr_lbl.select_columns(["node", "lbl"])
            .union(labels)
            .groupby("node")
            .aggregate(Min("lbl", alias_name="lbl"))
        )
        labels = prop
        new_sum = _label_sum(labels)
        if new_sum == cur_sum:
            break
        cur_sum = new_sum
    return labels


def _label_propagation(pairs: ray.data.Dataset, max_rounds: int = 50) -> pd.DataFrame:
    """pandas-facing wrapper for the tests / small callers; the scale
    path is _label_propagation_ds (no driver gather)."""
    return _label_propagation_ds(pairs, max_rounds).to_pandas()


def connected_components(
    pairs_pd: pd.DataFrame, driver_max_pairs: int = 1_000_000
) -> dict[int, int]:
    """(a, b) int pairs -> {node: component_root(min label)}. Driver
    union-find below ``driver_max_pairs``; distributed label
    propagation above it (pairs are shipped back through ray.data)."""
    if len(pairs_pd) <= driver_max_pairs:
        return _union_find(pairs_pd)
    ds = ray.data.from_pandas(pairs_pd)
    lbl = _label_propagation(ds)
    return dict(zip(lbl["node"].astype(int), lbl["lbl"].astype(int)))


def drop_nonroots(
    docs: ray.data.Dataset,
    key_col: str,
    pairs: ray.data.Dataset,
    driver_max_pairs: int = 1_000_000,
    broadcast_max: int = 5_000_000,
) -> ray.data.Dataset:
    """Keep-min component dedup as a DATASET->DATASET op: remove from
    ``docs`` every node that is not its component's min label. Under
    ``driver_max_pairs`` the (small) pair set collapses to driver
    union-find and the drop array broadcasts into a vectorized keep
    filter. Above it — a high-duplication 100-TB corpus has a
    corpus-scale drop set, so gathering it (round 1-4
    component_nonroots) would OOM the driver — distributed label
    propagation emits the (node, lbl) table and the non-root rows
    apply as an adaptive ANTI semi-join (broadcast under
    ``broadcast_max`` keys, hash-co-partitioned shuffle above); the
    drop set never materializes as one driver object (VERDICT r4
    item 3)."""
    pairs = pairs.materialize()
    if pairs.count() <= driver_max_pairs:
        comp = _union_find(pairs.to_pandas())
        drop = np.array(sorted(x for x, r in comp.items() if r != x), np.int64)
        ref = ray.put(drop)

        def keep(t: pa.Table) -> pa.Table:
            d = ray.get(ref)
            return t.filter(pa.array(~np.isin(t[key_col].to_numpy(), d)))

        return docs.map_batches(keep, batch_format="pyarrow")

    labels = _label_propagation_ds(pairs)
    nonroots = labels.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"].filter(
                    pa.array(
                        t["node"].to_numpy(zero_copy_only=False)
                        != t["lbl"].to_numpy(zero_copy_only=False)
                    )
                )
            }
        ),
        batch_format="pyarrow",
    )
    from .relational import adaptive_semi_filter

    return adaptive_semi_filter(
        docs, nonroots, key_col, "node", anti=True, broadcast_max=broadcast_max
    )


def component_nonroots(
    pairs: ray.data.Dataset, driver_max_pairs: int = 1_000_000
) -> np.ndarray:
    """(a, b) int64 pair DATASET -> sorted int64 array of nodes that are
    NOT their component's min label — the drop set of a keep-min dedup.
    Adaptive like connected_components, but Dataset-native: under the
    threshold the (small) pair set collapses to driver union-find; above
    it distributed label propagation runs and ONLY the dup-count-sized
    drop set ever reaches the driver (it must — callers broadcast it
    into a keep filter), never the pair or label table."""
    pairs = pairs.materialize()
    if pairs.count() <= driver_max_pairs:
        comp = _union_find(pairs.to_pandas())
        return np.array(
            sorted(x for x, r in comp.items() if r != x), np.int64
        )
    labels = _label_propagation_ds(pairs)
    out = [np.array([], np.int64)]
    for b in labels.iter_batches(batch_format="pyarrow", batch_size=262144):
        node = b["node"].to_numpy()
        out.append(node[node != b["lbl"].to_numpy()])
    return np.sort(np.concatenate(out))
