"""Bit-reproducible distributed k-means over the embeddings table —
the integer-PageRank trick applied to clustering: components quantize
to micro-units SHIFTED into the positive domain (q' = rint(x*1e6) +
1e6; the shift cancels inside every distance difference), centroid
updates use floor division on positive sums (where DuckDB's truncating
``//`` equals numpy's floor ``//``), and ties break to the lowest
centroid id — so every synchronous iteration is exactly reproducible
and the unrolled-iteration DuckDB oracle hash-matches bit for bit.
Float k-means (e_ivf_ann's internal spherical k-means) converges
faster per flop but its block-order float sums are only
recall-testable; this op is the exactness-contract variant.

Scale shape per iteration: centroids (k x dim ints) broadcast via
ray.put; ONE streaming pass computes assignments and folds each batch
into k x dim partial sums + k counts (the shuffle carries k*(dim+1)
rows per block, never vectors); the new centroids are a
k*dim-row aggregate. The embeddings dataset materializes once and is
reused across iterations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..sources.testdata import read_table

OFFSET = 1_000_000
SCALE = 1_000_000


def _quantize(m: np.ndarray) -> np.ndarray:
    q = (np.rint(m.astype(np.float64) * SCALE) + OFFSET).astype(np.int64)
    # The bit-parity contract with DuckDB's truncating // only holds in
    # the nonnegative domain; a component < -OFFSET/SCALE (= -1.0) would
    # silently diverge (numpy floor-div vs SQL trunc-div). Fail loudly
    # instead (ADVICE r3).
    if q.size and int(q.min()) < 0:
        raise ValueError(
            f"e_kmeans_int: embedding component below -{OFFSET / SCALE} "
            "breaks the nonnegative quantized-domain contract"
        )
    return q


def e_kmeans_int(sf: str, k: int = 4, iters: int = 3):
    """queries() entry: k-means with integer-exact semantics; returns
    one row per cluster (cid, n_members, c_sum) after ``iters``
    assignment+update rounds — n_members from the LAST assignment,
    c_sum = Σ_d centroid_d in the shifted integer domain."""
    from .relational import grouped_agg

    ds = read_table(sf, "embeddings", ["vec_id", "embedding"]).materialize()

    seed = (
        ds.map_batches(
            lambda t: t.filter(pa.compute.less(t["vec_id"], k)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    cent = _quantize(np.array(seed["embedding"].tolist()))
    dim = cent.shape[1]

    def make_pass(cent_ref):
        def par(t: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            if t.num_rows == 0:
                return pa.table(
                    {"key": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
                )
            q = _quantize(np.array(t["embedding"].to_pylist()))
            # n x k exact int distances (dim-summed); ties -> lowest cid
            d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            keys, svals = [], []
            for j in range(k):
                rows = q[a == j]
                keys.append(np.int64(k * dim + j))  # count slot
                svals.append(np.int64(len(rows)))
                if len(rows):
                    keys.extend((np.arange(dim, dtype=np.int64) + j * dim).tolist())
                    svals.extend(rows.sum(axis=0).tolist())
            return pa.table(
                {"key": pa.array(keys, pa.int64()), "s": pa.array(svals, pa.int64())}
            )

        return par

    for it in range(iters):
        cref = ray.put(cent)
        last = it == iters - 1
        agg = grouped_agg(
            ds.map_batches(make_pass(cref), batch_format="pyarrow"),
            ["key"],
            [("s", "sum", "s")],
            round_to=None,
        ).to_pandas()
        lut = dict(zip(agg["key"].astype(np.int64), agg["s"].astype(np.int64)))
        counts = np.array([lut.get(k * dim + j, 0) for j in range(k)], np.int64)
        new = cent.copy()
        for j in range(k):
            if counts[j] > 0:
                s = np.array([lut.get(j * dim + d_, 0) for d_ in range(dim)], np.int64)
                new[j] = s // counts[j]
        if last:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "cid": pa.array(np.arange(k, dtype=np.int64)),
                        "n_members": pa.array(counts),
                        "c_sum": pa.array(new.sum(axis=1).astype(np.int64)),
                    }
                )
            )
        cent = new


def kmeans_assign_ctes(k: int = 4, iters: int = 3) -> tuple[list[str], str, str]:
    """The unrolled k-means CTE chain, shared by the e_kmeans_int and
    e_semdedup oracles: returns (ctes, final_centroid_cte,
    final_assignment_cte) where the assignment CTE maps every vec_id to
    its last-iteration cluster (a{iters}, computed against the
    centroids after iters-1 updates — exactly the Ray side's final
    pass)."""
    ctes = [
        "u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
        f"CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * {SCALE}, 0) AS BIGINT) "
        f"+ {OFFSET} AS v FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, i, v AS cv FROM u WHERE vec_id < {k})",
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        ctes.append(
            f"d{it} AS (SELECT u.vec_id, c.cid, "
            "SUM((u.v - c.cv) * (u.v - c.cv)) AS dist "
            f"FROM u JOIN {prev} c ON u.i = c.i GROUP BY 1, 2)"
        )
        ctes.append(
            f"a{it} AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, "
            "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn "
            f"FROM d{it}) WHERE rn = 1)"
        )
        ctes.append(
            f"m{it} AS (SELECT a.cid, u.i, SUM(u.v) // COUNT(*) AS cv "
            f"FROM u JOIN a{it} a USING (vec_id) GROUP BY 1, 2)"
        )
        ctes.append(
            f"c{it} AS (SELECT p.cid, p.i, COALESCE(m.cv, p.cv) AS cv "
            f"FROM {prev} p LEFT JOIN m{it} m ON m.cid = p.cid AND m.i = p.i)"
        )
        prev = f"c{it}"
    return ctes, prev, f"a{iters}"


def kmeans_sql(k: int = 4, iters: int = 3) -> str:
    """Unrolled-iteration DuckDB oracle for e_kmeans_int (the
    minhash_oracle/pagerank pattern: the whole iterative algorithm as
    one CTE chain, exact because every quantity is a positive int)."""
    ctes, prev, assign = kmeans_assign_ctes(k, iters)
    ctes.append(f"nn AS (SELECT cid, COUNT(*) AS n FROM {assign} GROUP BY 1)")
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT c.cid, CAST(COALESCE(nn.n, 0) AS BIGINT) AS n_members, "
        f"CAST(SUM(c.cv) AS BIGINT) AS c_sum FROM {prev} c "
        "LEFT JOIN nn ON nn.cid = c.cid GROUP BY c.cid, nn.n ORDER BY c.cid"
    )


def _fit_centroids(ds: "ray.data.Dataset", k: int = 4, iters: int = 3) -> np.ndarray:
    """iters-1 integer-exact centroid updates from the deterministic
    vec_id<k seed — the centroid state kmeans_assign_ctes's a{iters}
    assignment is computed against (c{iters-1}). Shared by
    kmeans_assignments and e_inertia."""
    from .relational import grouped_agg

    seed = (
        ds.map_batches(
            lambda t: t.filter(pa.compute.less(t["vec_id"], k)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    cent = _quantize(np.array(seed["embedding"].tolist()))
    dim = cent.shape[1]

    for _ in range(iters - 1):
        cref = ray.put(cent)

        def par(t: pa.Table, _c=cref) -> pa.Table:
            c = ray.get(_c)
            if t.num_rows == 0:
                return pa.table(
                    {"key": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
                )
            q = _quantize(np.array(t["embedding"].to_pylist()))
            d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            keys, svals = [], []
            for j in range(k):
                rows = q[a == j]
                keys.append(np.int64(k * dim + j))
                svals.append(np.int64(len(rows)))
                if len(rows):
                    keys.extend((np.arange(dim, dtype=np.int64) + j * dim).tolist())
                    svals.extend(rows.sum(axis=0).tolist())
            return pa.table(
                {"key": pa.array(keys, pa.int64()), "s": pa.array(svals, pa.int64())}
            )

        agg = grouped_agg(
            ds.map_batches(par, batch_format="pyarrow"),
            ["key"],
            [("s", "sum", "s")],
            round_to=None,
        ).to_pandas()
        lut = dict(zip(agg["key"].astype(np.int64), agg["s"].astype(np.int64)))
        counts = np.array([lut.get(k * dim + j, 0) for j in range(k)], np.int64)
        new = cent.copy()
        for j in range(k):
            if counts[j] > 0:
                s = np.array([lut.get(j * dim + d_, 0) for d_ in range(dim)], np.int64)
                new[j] = s // counts[j]
        cent = new

    return cent


def kmeans_assignments(ds: "ray.data.Dataset", k: int = 4, iters: int = 3):
    """Ray-side final cluster assignment matching kmeans_assign_ctes's
    a{iters}: _fit_centroids, then ONE streaming assignment pass that
    tags every vec_id with the nearest centroid (ties -> lowest cid).
    Centroids broadcast via ray.put; the pass never shuffles vectors.
    ``ds`` must carry (vec_id, embedding) and be materialized by the
    caller if reused."""
    cent = _fit_centroids(ds, k, iters)
    cref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cid": pa.array([], pa.int64())}
            )
        q = _quantize(np.array(t["embedding"].to_pylist()))
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pa.table(
            {
                "vec_id": t["vec_id"].cast(pa.int64()),
                "cid": pa.array(d.argmin(axis=1).astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def e_inertia(sf: str, k: int = 4, iters: int = 3):
    """Per-cluster INERTIA (within-cluster sum of squared distances to
    the assigned centroid) — the k-means quality diagnostic read when
    choosing k, integer-exact in the shared e6+offset quantized domain:
    sse(cid) = sum over assigned vectors of |q(x) - c_cid|^2, with
    c = the SAME post-(iters-1)-update centroids the assignment uses
    (kmeans_assign_ctes's c{iters-1}), so the DuckDB mirror's d{iters}
    distances ARE these distances. Empty clusters emit (n=0, sse=0) on
    both sides (range(k) LEFT JOIN in the oracle).

    Distributed shape: centroid fit = iters-1 combiner-first grouped
    sums (k*(dim+1) rows per block); the inertia pass is ONE streaming
    matmul-free batch fold (k rows per block) — vectors never shuffle.
    Per-batch partials carry a loud 2^61 bound; past it switch to
    two-limb int64 accumulation (not needed below ~10^5 full-range
    vectors per batch)."""
    from ..sources.testdata import read_table
    from .relational import grouped_agg

    ds = read_table(sf, "embeddings", ["vec_id", "embedding"]).materialize()
    cent = _fit_centroids(ds, k, iters)
    cref = ray.put(cent)

    def par(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        if t.num_rows == 0:
            return pa.table(
                {
                    "cid": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sse": pa.array([], pa.int64()),
                }
            )
        q = _quantize(np.array(t["embedding"].to_pylist()))
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        m = d[np.arange(len(a)), a]
        cids, ns, ss = [], [], []
        for j in range(k):
            sel = m[a == j]
            s = int(sel.sum())
            if s > (1 << 61):
                raise ValueError(
                    "e_inertia: per-batch SSE partial exceeds 2^61 — "
                    "switch to two-limb accumulation at this scale"
                )
            cids.append(j)
            ns.append(int(len(sel)))
            ss.append(s)
        return pa.table(
            {
                "cid": pa.array(cids, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "sse": pa.array(ss, pa.int64()),
            }
        )

    agg = grouped_agg(
        ds.map_batches(par, batch_format="pyarrow"),
        ["cid"],
        [("n_members", "sum", "n"), ("sse", "sum", "sse")],
        round_to=None,
    )
    return agg.map_batches(
        lambda t: pa.table(
            {
                "cid": t["cid"].cast(pa.int64()),
                "n_members": t["n_members"].cast(pa.int64()),
                "sse": t["sse"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("cid")


def e_inertia_sql(k: int = 4, iters: int = 3) -> str:
    ctes, _prev, assign = kmeans_assign_ctes(k, iters)
    return (
        "WITH "
        + ", ".join(ctes)
        + f", j AS (SELECT a.cid, d.dist FROM {assign} a "
        f"JOIN d{iters} d ON d.vec_id = a.vec_id AND d.cid = a.cid), "
        "s AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members, "
        "CAST(SUM(dist) AS BIGINT) AS sse FROM j GROUP BY cid) "
        f"SELECT r.range AS cid, COALESCE(s.n_members, 0) AS n_members, "
        f"COALESCE(s.sse, 0) AS sse FROM range({k}) r LEFT JOIN s "
        "ON s.cid = r.range ORDER BY 1"
    )
