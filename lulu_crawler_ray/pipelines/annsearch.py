"""Similarity search over the embeddings table (list<float> column).

- Brute-force cosine top-k: the exact baseline — numpy matmul per batch
  against a broadcast query matrix (ray.put once, read in every task),
  per-batch partial top-k, tiny driver-side merge. At 100 TB the same
  shape holds: the broadcast is O(num_queries x dim), the scan streams.
- LSH-bucketed ANN: random-hyperplane signatures bucket the corpus
  (groupby on the signature); queries probe their bucket ± multiprobe —
  the scale path (recall tested vs brute force in pytest).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.testdata import read_table


def _emb_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy()
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, m


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def load_queries(sf: str, n_queries: int = 3) -> tuple[np.ndarray, np.ndarray]:
    t = (
        read_table(sf, "embeddings", ["vec_id", "embedding"])
        .filter(expr=f"vec_id < {n_queries}")
        .to_pandas()
        .sort_values("vec_id")
    )
    q = np.array(t["embedding"].tolist(), dtype=np.float64)
    return t["vec_id"].to_numpy().astype(np.int64), _normalize(q)


_EMPTY_TOPK = {
    "query_id": pa.array([], pa.int64()),
    "neighbor_id": pa.array([], pa.int64()),
    "sim": pa.array([], pa.float64()),
}


def _score_topk(ids: np.ndarray, m: np.ndarray, qids: np.ndarray, qm: np.ndarray, k: int) -> pa.Table:
    """Per-block partial top-k: one matmul, then per query a lexsorted
    (sim desc, id asc) head-k with self excluded. Duplicate ids (an
    exploded multi-table index carries one row per (vector, table)) are
    collapsed FIRST so copies cannot crowd distinct candidates out of
    the k slots."""
    if len(ids) == 0:
        return pa.table(_EMPTY_TOPK)
    _, ui = np.unique(ids, return_index=True)
    ids, m = ids[ui], m[ui]
    sims = m @ qm.T
    out_q, out_n, out_s = [], [], []
    for j, qid in enumerate(qids):
        col = sims[:, j]
        keep = np.flatnonzero(ids != qid)
        order = keep[np.lexsort((ids[keep], -col[keep]))][:k]
        out_q.extend([qid] * len(order))
        out_n.extend(ids[order])
        out_s.extend(col[order])
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        }
    )


def _finalize_topk(parts, k: int) -> pa.Table:
    """Driver-side merge of per-block partial top-ks: distinct
    (query, neighbor), sort (sim desc, neighbor asc), head-k, rank."""
    if parts.empty or "query_id" not in parts.columns:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
        )
    parts = parts.drop_duplicates(["query_id", "neighbor_id"])
    out = {"query_id": [], "neighbor_id": [], "rnk": []}
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        out["query_id"].extend([qid] * len(g))
        out["neighbor_id"].extend(g["neighbor_id"])
        out["rnk"].extend(range(1, len(g) + 1))
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
            "rnk": pa.array(out["rnk"], pa.int64()),
        }
    )


def e_knn_bruteforce(sf: str, k: int = 10, n_queries: int = 3):
    """Exact cosine top-k for the first n_queries vectors (self
    excluded). Output (query_id, neighbor_id, rnk) — rnk by similarity
    desc, neighbor_id asc tiebreak; deterministic."""
    qids, qm = load_queries(sf, n_queries)
    ref = ray.put((qids, qm))
    ds = read_table(sf, "embeddings", ["vec_id", "embedding"])

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, qm_ = ray.get(ref)
        ids, m = _emb_matrix(t)
        # partial top-k within batch: global top-k survives any batching
        return _score_topk(ids, _normalize(m), qids_, qm_, k)

    parts = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    return _finalize_topk(parts, k)


class HyperplaneHasher:
    """Multi-table random-hyperplane LSH (the production shape: L
    independent tables of k planes each — union of per-table bucket
    matches trades scan fraction for recall). Seeded => identical
    across actors. ``buckets_of`` returns an (n, L) bucket matrix with
    table index baked into the bucket id."""

    def __init__(self, dim: int, n_planes: int = 4, n_tables: int = 8, seed: int = 5):
        rng = np.random.default_rng(seed)
        self.n_planes, self.n_tables = n_planes, n_tables
        self.planes = rng.standard_normal((n_tables, n_planes, dim))

    def buckets_of(self, m: np.ndarray) -> np.ndarray:
        out = np.empty((m.shape[0], self.n_tables), np.int64)
        weights = 1 << np.arange(self.n_planes)
        for t in range(self.n_tables):
            bits = (m @ self.planes[t].T) > 0
            out[:, t] = (bits @ weights) + (t << 32)
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(t)
        bk = self.buckets_of(_normalize(m))
        n, L = bk.shape
        return pa.table(
            {
                "bucket": pa.array(bk.ravel(), pa.int64()),
                "vec_id": pa.array(np.repeat(ids, L), pa.int64()),
            }
        )


class LshIndex:
    """DURABLE bucket-partitioned multi-table hyperplane LSH index over
    the embeddings table: (bucket, vec_id, normalized-emb blob) rows,
    one row per (vector, table), written once as hive-partitioned
    parquet (annindex.BucketIndexArtifact — shard = fib_hash(bucket) %
    n_shards). A query probes its L buckets by READING only the shard
    directories that can contain them (IO pruning, not just the round-2
    np.isin compute pruning) and masking within-shard by exact bucket.
    The artifact survives the Ray session: a matching sealed manifest
    makes the next build a pure load."""

    builds = 0  # test hook: counts corpus-hash materializations

    def __init__(
        self,
        sf: str,
        dim: int = 64,
        n_planes: int = 4,
        n_tables: int = 8,
        seed: int = 5,
        root: str | None = None,
    ):
        import hashlib as _hl

        from ..sources.testdata import table_rows
        from .annindex import _DEFAULT_ROOT, BucketIndexArtifact

        self.hasher = HyperplaneHasher(dim, n_planes, n_tables, seed)
        hasher = self.hasher
        digest = _hl.md5(
            json.dumps(
                ["lsh", sf, table_rows(sf, "embeddings"), dim, n_planes, n_tables, seed]
            ).encode()
        ).hexdigest()
        root = root or os.path.join(_DEFAULT_ROOT, f"lsh-{digest[:16]}")

        def build() -> ray.data.Dataset:
            ds = read_table(sf, "embeddings", ["vec_id", "embedding"])

            def explode(t: pa.Table) -> pa.Table:
                ids, m = _emb_matrix(t)
                mn = _normalize(m)
                bk = hasher.buckets_of(mn)
                n, L = bk.shape
                rep = np.repeat(mn, L, axis=0)  # row-major matches bk.ravel()
                return pa.table(
                    {
                        "bucket": pa.array(bk.ravel(), pa.int64()),
                        "vec_id": pa.array(np.repeat(ids, L), pa.int64()),
                        "emb": pa.array([r.tobytes() for r in rep], pa.binary()),
                    }
                )

            return ds.map_batches(explode, batch_format="pyarrow")

        self.artifact, built = BucketIndexArtifact.build_or_load(
            root, digest, "bucket", build, n_shards=32
        )
        if built:
            LshIndex.builds += 1

    def query(self, qids: np.ndarray, qm: np.ndarray, k: int = 10) -> pa.Table:
        qb = self.hasher.buckets_of(qm)
        probe_buckets = np.unique(qb.ravel())
        probe_ref = ray.put(probe_buckets)
        qref = ray.put((qids, qm))

        def probe_topk(t: pa.Table) -> pa.Table:
            buckets = ray.get(probe_ref)
            qids_, qm_ = ray.get(qref)
            mask = np.isin(t["bucket"].to_numpy(), buckets)
            if not mask.any():
                return pa.table(_EMPTY_TOPK)
            sub = t.filter(pa.array(mask))
            ids = sub["vec_id"].to_numpy()
            m = np.frombuffer(b"".join(sub["emb"].to_pylist()), np.float64).reshape(len(ids), -1)
            # _score_topk collapses the per-table duplicate rows first
            return _score_topk(ids, m, qids_, qm_, k)

        idx = self.artifact.read_for(probe_buckets)
        parts = idx.map_batches(probe_topk, batch_format="pyarrow").to_pandas()
        return _finalize_topk(parts, k)


_LSH_CACHE: dict = {}


def lsh_index(sf: str, dim: int = 64) -> LshIndex:
    """Session-scoped index cache (a materialized Dataset dies with its
    Ray session, so the key includes the current job id)."""
    key = (sf, dim, ray.get_runtime_context().get_job_id() if ray.is_initialized() else None)
    if key not in _LSH_CACHE:
        _LSH_CACHE[key] = LshIndex(sf, dim)
    return _LSH_CACHE[key]


def e_lsh_ann(sf: str, k: int = 10, n_queries: int = 3, dim: int = 64):
    """Approximate top-k via the materialized bucket index. Same output
    shape as brute force; recall vs brute force measured in pytest."""
    qids, qm = load_queries(sf, n_queries)
    return lsh_index(sf, dim).query(qids, qm, k)


def _cosine_group_pairs(
    ids: np.ndarray, m: np.ndarray, threshold: float, hot_threshold: int, strict: bool = False
):
    """All (a, b) with cosine > threshold inside one label group. Small
    groups: dense matmul. HOT groups (> hot_threshold rows) switch to
    hyperplane-LSH blocking inside the group (L tables x k planes;
    dense pairwise only within (table, bucket), every emitted pair
    cosine-VERIFIED): no false positives; recall < 1 is the documented
    trade above the guard — one hot label no longer costs O(n²)."""
    import pandas as pd

    n = len(ids)
    if n <= hot_threshold:
        s = m @ m.T
        iu = np.triu_indices(n, 1)
        hit = s[iu] > threshold
        a, b = ids[iu[0][hit]], ids[iu[1][hit]]
        return pd.DataFrame({"a": np.minimum(a, b), "b": np.maximum(a, b)})
    if strict:
        # the EXACT contract (and its SQL oracle) cannot silently fall
        # back to the recall<1 blocked path — fail loudly and point at
        # the explicit blocked variant
        raise ValueError(
            f"label group of {n} rows exceeds hot_group_threshold={hot_threshold}: "
            "exact all-pairs refused; use the *_blocked variant (recall<1) or raise the threshold"
        )
    hasher = HyperplaneHasher(m.shape[1], n_planes=8, n_tables=6, seed=17)
    bk = hasher.buckets_of(m)  # (n, L)
    out = []
    for tcol in range(bk.shape[1]):
        col = bk[:, tcol]
        order = np.argsort(col, kind="stable")
        ss = col[order]
        starts = np.r_[0, np.flatnonzero(ss[1:] != ss[:-1]) + 1, n]
        for i in range(len(starts) - 1):
            lo, hi = int(starts[i]), int(starts[i + 1])
            if hi - lo >= 2:
                sel = order[lo:hi]
                s = m[sel] @ m[sel].T
                iu = np.triu_indices(len(sel), 1)
                hit = s[iu] > threshold
                a, b = ids[sel][iu[0][hit]], ids[sel][iu[1][hit]]
                out.append(pd.DataFrame({"a": np.minimum(a, b), "b": np.maximum(a, b)}))
    if not out:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
    return pd.concat(out).drop_duplicates()


def kmeans_fit(
    ds: ray.data.Dataset, k: int = 16, iters: int = 5, dim: int = 64
) -> np.ndarray:
    """Distributed spherical k-means over the embedding column — the
    iterative-algorithm shape: per iteration, ONE streaming pass
    computes mergeable partials (per-centroid vector sum + count via a
    one-hot matmul) inside map_batches; the driver reduces k×dim
    floats and renormalizes. Deterministic: centroids init from the k
    smallest vec_ids; an emptied centroid keeps its previous position.
    Scans the dataset `iters` times — at 100 TB you fit on a
    hash-residue sample instead (same code over ds.filter)."""
    # vectorized seed scan (same fix as pq_kmeans_fit: a per-row
    # Python lambda filter is a row-at-a-time pass over the table)
    init_t = (
        ds.map_batches(
            lambda t: t.filter(pa.compute.less(t["vec_id"], k)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    cents = _normalize(np.array(init_t["embedding"].tolist(), dtype=np.float64))
    if cents.shape[0] < k:
        raise ValueError(f"need >= {k} vectors with vec_id < {k} for deterministic init")
    for _ in range(iters):
        cref = ray.put(cents)

        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            _, m = _emb_matrix(t)
            mn = _normalize(m)
            a = np.argmax(mn @ c.T, axis=1)
            onehot = np.zeros((len(a), c.shape[0]))
            onehot[np.arange(len(a)), a] = 1.0
            sums = onehot.T @ mn  # (k, dim)
            counts = onehot.sum(axis=0)
            return pa.table(
                {
                    "cid": pa.array(np.arange(c.shape[0]), pa.int32()),
                    "vsum": pa.array([row.tobytes() for row in sums], pa.binary()),
                    "n": pa.array(counts.astype(np.int64)),
                }
            )

        acc = np.zeros_like(cents)
        cnt = np.zeros(cents.shape[0], np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=4096
        ):
            for cid, vs, n in zip(b["cid"].to_pylist(), b["vsum"].to_pylist(), b["n"].to_pylist()):
                acc[cid] += np.frombuffer(vs, np.float64)
                cnt[cid] += n
        nz = cnt > 0
        cents = cents.copy()
        cents[nz] = _normalize(acc[nz] / cnt[nz, None])
    return cents


class IvfIndex:
    """IVF (inverted-file) ANN index — the centroid-bucketed scale
    path: spherical-k-means centroids, corpus assigned to its nearest
    centroid ONCE into a DURABLE hive-partitioned parquet index
    (shard = cid identity — one shard per centroid list); a query
    READS only its ``nprobe`` nearest centroid lists (IO pruning at
    read time; scan fraction ~ nprobe/k for IO and compute). The
    centroids themselves live in the manifest-adjacent npy file so a
    cross-session load restores the full index without touching the
    corpus. Session-cached like LshIndex."""

    builds = 0

    def __init__(
        self,
        sf: str,
        n_centroids: int = 16,
        iters: int = 5,
        dim: int = 64,
        root: str | None = None,
    ):
        import hashlib as _hl

        from ..sources.testdata import table_rows
        from .annindex import _DEFAULT_ROOT, BucketIndexArtifact

        digest = _hl.md5(
            json.dumps(
                ["ivf", sf, table_rows(sf, "embeddings"), n_centroids, iters, dim]
            ).encode()
        ).hexdigest()
        root = root or os.path.join(_DEFAULT_ROOT, f"ivf-{digest[:16]}")
        cents_path = os.path.join(root, "centroids.npy")

        def build() -> ray.data.Dataset:
            ds = read_table(sf, "embeddings", ["vec_id", "embedding"])
            self.centroids = kmeans_fit(ds, k=n_centroids, iters=iters, dim=dim)
            # saved BEFORE the manifest seal (build_or_load writes the
            # manifest last) so a sealed artifact always has centroids
            np.save(cents_path, self.centroids)
            cref = ray.put(self.centroids)

            def assign(t: pa.Table) -> pa.Table:
                c = ray.get(cref)
                ids, m = _emb_matrix(t)
                mn = _normalize(m)
                a = np.argmax(mn @ c.T, axis=1).astype(np.int32)
                return pa.table(
                    {
                        "cid": pa.array(a),
                        "vec_id": pa.array(ids, pa.int64()),
                        "emb": pa.array([r.tobytes() for r in mn], pa.binary()),
                    }
                )

            return ds.map_batches(assign, batch_format="pyarrow")

        self.artifact, built = BucketIndexArtifact.build_or_load(
            root, digest, "cid", build, n_shards=n_centroids, identity=True
        )
        if built:
            IvfIndex.builds += 1
        else:
            self.centroids = np.load(cents_path)

    def query(self, qids: np.ndarray, qm: np.ndarray, k: int = 10, nprobe: int = 4) -> pa.Table:
        # per-query probe lists; the READ set is the union of probed
        # cids' shard dirs, per-query restriction happens at scoring time
        order = np.argsort(-(qm @ self.centroids.T), axis=1)[:, :nprobe]
        probe_ref = ray.put((qids, qm, order))

        def probe_topk(t: pa.Table) -> pa.Table:
            qids_, qm_, probes = ray.get(probe_ref)
            cid = t["cid"].to_numpy()
            mask = np.isin(cid, np.unique(probes))
            if not mask.any():
                return pa.table(_EMPTY_TOPK)
            sub = t.filter(pa.array(mask))
            ids = sub["vec_id"].to_numpy()
            cids = sub["cid"].to_numpy()
            m = np.frombuffer(b"".join(sub["emb"].to_pylist()), np.float64).reshape(len(ids), -1)
            sims = m @ qm_.T
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(qids_):
                # IVF assigns each vector to exactly ONE centroid, so
                # unlike the exploded LSH index there are no duplicate
                # ids within a block; restrict to THIS query's lists
                keep = np.flatnonzero(np.isin(cids, probes[j]) & (ids != qid))
                col = sims[:, j]
                order_ = keep[np.lexsort((ids[keep], -col[keep]))][:k]
                out_q.extend([qid] * len(order_))
                out_n.extend(ids[order_])
                out_s.extend(col[order_])
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "neighbor_id": pa.array(out_n, pa.int64()),
                    "sim": pa.array(out_s, pa.float64()),
                }
            )

        idx = self.artifact.read_for(np.unique(order.ravel()))
        parts = idx.map_batches(probe_topk, batch_format="pyarrow").to_pandas()
        return _finalize_topk(parts, k)


_IVF_CACHE: dict = {}


def ivf_index(sf: str, n_centroids: int = 16, dim: int = 64) -> IvfIndex:
    key = (sf, n_centroids, dim, ray.get_runtime_context().get_job_id() if ray.is_initialized() else None)
    if key not in _IVF_CACHE:
        _IVF_CACHE[key] = IvfIndex(sf, n_centroids=n_centroids, dim=dim)
    return _IVF_CACHE[key]


def e_ivf_ann(sf: str, k: int = 10, n_queries: int = 3, dim: int = 64, nprobe: int = 4):
    """Approximate top-k via the IVF index (probe nprobe of 16 centroid
    lists). Same output shape as brute force; recall measured in
    pytest."""
    qids, qm = load_queries(sf, n_queries)
    return ivf_index(sf, dim=dim).query(qids, qm, k, nprobe=nprobe)


def e_radius_search(sf: str, threshold: float = 0.25, n_queries: int = 3):
    """Radius (range) search: ALL corpus vectors within cosine
    similarity >= threshold of each query — the unbounded-result
    companion to top-k. Broadcast query matrix, one matmul per block,
    exact; sim in e4 integer units so the DuckDB comparison is exact."""
    qids, qm = load_queries(sf, n_queries)
    ref = ray.put((qids, qm))
    ds = read_table(sf, "embeddings", ["vec_id", "embedding"])

    def hits(t: pa.Table) -> pa.Table:
        qids_, qm_ = ray.get(ref)
        ids, m = _emb_matrix(t)
        sims = _normalize(m) @ qm_.T
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(qids_):
            col = sims[:, j]
            keep = np.flatnonzero((col >= threshold) & (ids != qid))
            out_q.extend([qid] * len(keep))
            out_n.extend(ids[keep])
            # half-away-from-zero to match DuckDB ROUND (sims all > 0 here)
            out_s.extend(np.floor(col[keep] * 10000 + 0.5).astype(np.int64))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim_e4": pa.array(out_s, pa.int64()),
            }
        )

    return ds.map_batches(hits, batch_format="pyarrow")


def e_cosine_neardup(
    sf: str, threshold: float = 0.45, hot_group_threshold: int = 4096, strict: bool = True
):
    """Embedding-cosine near-dup pairs above threshold, restricted to
    same-label blocks (blocking keeps the pairwise work per group
    tractable; cross-label near-dups are out of contract by design).
    EXACT — this entry is hash-checked against an exact SQL oracle, so
    a label group too hot for exact all-pairs raises (strict=True)
    instead of silently degrading; the recall<1 hot path lives in
    e_cosine_neardup_blocked. Output (a, b) with a < b."""
    import pandas as pd

    ds = read_table(sf, "embeddings", ["vec_id", "embedding", "label"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy().astype(np.int64)
        m = _normalize(np.array(g["embedding"].tolist(), dtype=np.float64))
        return _cosine_group_pairs(ids, m, threshold, hot_group_threshold, strict=strict)

    out = ds.groupby("label").map_groups(pairs, batch_format="pandas").to_pandas()
    if out.empty or "a" not in out.columns:  # all-empty groups lose the schema
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    return pa.table(
        {"a": pa.array(out["a"], pa.int64()), "b": pa.array(out["b"], pa.int64())}
    )


def e_cosine_neardup_blocked(
    sf: str, threshold: float = 0.45, hot_group_threshold: int = 64
):
    """The SCALE variant of e_cosine_neardup: hot label groups switch
    to in-group hyperplane-LSH blocking (every emitted pair is
    cosine-verified; recall < 1 above the guard — see the planted-pair
    recall test). Rows-only driver check by design: an approximate
    path is never compared to an exact oracle. The tiny default
    threshold exercises the blocked path at every sf."""
    import pandas as pd

    ds = read_table(sf, "embeddings", ["vec_id", "embedding", "label"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy().astype(np.int64)
        m = _normalize(np.array(g["embedding"].tolist(), dtype=np.float64))
        return _cosine_group_pairs(ids, m, threshold, hot_group_threshold, strict=False)

    out = ds.groupby("label").map_groups(pairs, batch_format="pandas").to_pandas()
    if out.empty or "a" not in out.columns:  # all-empty groups lose the schema
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    return pa.table(
        {"a": pa.array(out["a"], pa.int64()), "b": pa.array(out["b"], pa.int64())}
    )


def e_cosine_dedup(sf: str, threshold: float = 0.45):
    """Embedding-cosine near-DEDUP: union-find over the near-dup pairs,
    keep the min vec_id per cluster — the embedding analog of the
    MinHash near-dedup (same blocking assumption as e_cosine_neardup)."""
    pairs = e_cosine_neardup(sf, threshold)
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = np.array(sorted(x for x in parent if find(x) != x), np.int64)
    ref = ray.put(drop)
    ds = read_table(sf, "embeddings", ["vec_id"])

    def keep(t: pa.Table) -> pa.Table:
        d = ray.get(ref)
        return t.filter(pa.array(~np.isin(t["vec_id"].to_numpy(), d)))

    return ds.map_batches(keep, batch_format="pyarrow")


def e_label_centroids(sf: str):
    """Per-label centroid summary via mergeable partials (sum vector +
    count per batch), finalized on the driver: (label, n,
    centroid_norm_e4). Hash-checked vs a DuckDB unnest+avg oracle
    (integer e4 units — cross-engine float hashing is ill-defined)."""
    ds = read_table(sf, "embeddings", ["embedding", "label"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        labels = t["label"].to_numpy()
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        rows = []
        for lb in np.unique(labels):
            sel = m[labels == lb]
            rows.append((int(lb), sel.sum(axis=0).tolist(), len(sel)))
        return pa.table(
            {
                "label": pa.array([r[0] for r in rows], pa.int32()),
                "vsum": pa.array([r[1] for r in rows], pa.list_(pa.float64())),
                "n": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    acc: dict[int, tuple[np.ndarray, int]] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=4096
    ):
        for lb, vs, n in zip(b["label"].to_pylist(), b["vsum"].to_pylist(), b["n"].to_pylist()):
            v = np.array(vs)
            if lb in acc:
                acc[lb] = (acc[lb][0] + v, acc[lb][1] + n)
            else:
                acc[lb] = (v, n)
    labels = sorted(acc)
    return pa.table(
        {
            "label": pa.array(labels, pa.int32()),
            "n": pa.array([acc[l][1] for l in labels], pa.int64()),
            "centroid_norm_e4": pa.array(
                [int(np.rint(float(np.linalg.norm(acc[l][0] / acc[l][1])) * 10000)) for l in labels],
                pa.int64(),
            ),
        }
    )


def e_gram_topk(sf: str, k: int = 20):
    """Distributed GRAM-MATRIX computation — the building block of PCA
    / whitening over an embedding corpus: G[a,b] = Σ_i q_ia * q_ib on
    micro-unit-quantized components (rint(x*1e6) int64), so every
    partial product and the grouped sum are EXACT integers and the
    DuckDB unnest-self-join oracle hash-matches. Scale shape: each
    batch folds its rows into ONE dim x dim int64 matmul (numpy, exact
    for int64), the shuffle carries dim^2 rows per block — never the
    vectors; top-k |off-diagonal| finalizes in one task over the
    4096-row aggregate. (The eigen-step of PCA is a driver-side 64x64
    solve on this output.)"""
    from .relational import grouped_agg

    ds = read_table(sf, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"ij": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
            )
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        q = np.rint(m * 1_000_000).astype(np.int64)
        g = q.T @ q
        d = g.shape[0]
        return pa.table(
            {
                "ij": pa.array(np.arange(d * d, dtype=np.int64)),
                "v": pa.array(g.ravel()),
            }
        )

    agg = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["ij"],
        [("v", "sum", "v")],
        round_to=None,
    )

    @ray.remote
    def topk(*blocks: pa.Table) -> pa.Table:
        t = pa.concat_tables(list(blocks)).combine_chunks()
        ij = t["ij"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = int(np.sqrt(len(ij)))
        a, b = ij // d, ij % d
        keep = a < b
        a, b, v = a[keep], b[keep], v[keep]
        order = np.lexsort((b, a, -np.abs(v)))[:k]
        return pa.table(
            {
                "a": pa.array(a[order] + 1),  # 1-based like SQL subscripts
                "b": pa.array(b[order] + 1),
                "g": pa.array(v[order]),
            }
        )

    refs = agg.materialize().to_arrow_refs()
    return ray.data.from_arrow_refs([topk.remote(*refs)])


def e_knn_graph(sf: str, k: int = 3, dim_max: int = 2_000_000):
    """Exact kNN GRAPH construction (continuation session): the top-k
    inner-product neighbors of EVERY vector — the all-points sibling of
    e_mips_topk and the substrate SemDeDup-style clustering / graph
    dedup runs on. Embeddings quantize to e6 ints; scores are exact
    int64 inner products computed via float64 BLAS (every partial sum
    bounded by 64 * 1e12 << 2^53, so the float matmul is bit-exact and
    ~10x the int64 einsum).

    Distributed shape: the quantized matrix broadcasts once (worker
    refs -> one object-store tuple, dim_ref-style loud bound at
    ``dim_max`` rows); each batch of rows computes its scores against
    the broadcast and emits its own exact top-k — no finalize merge
    needed because every batch sees ALL candidates. Above the bound
    the right tool is the IVF index (e_ivf_ann), which this function
    refuses toward rather than silently gathering."""
    emb = read_table(sf, "embeddings", ["vec_id", "embedding"])

    refs, n = [], 0
    for b in emb.iter_batches(batch_format="pyarrow", batch_size=65536):
        n += b.num_rows
        if n > dim_max:
            raise ValueError(
                f"e_knn_graph: >{dim_max} vectors — brute-force kNN graph is "
                "O(N^2); use the IVF-bucketed path (e_ivf_ann) at this scale"
            )
        if b.num_rows:
            refs.append(ray.put(b))

    @ray.remote
    def build(*blocks: pa.Table):
        t = pa.concat_tables(list(blocks)).combine_chunks()
        ids = t["vec_id"].to_numpy().astype(np.int64)
        m = np.rint(np.array(t["embedding"].to_pylist(), np.float64) * 1e6)
        o = np.argsort(ids, kind="stable")
        return ids[o], m[o]

    mat_ref = build.remote(*refs)

    def partial(t: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(mat_ref)
        ids = t["vec_id"].to_numpy().astype(np.int64)
        q = np.rint(np.array(t["embedding"].to_pylist(), np.float64) * 1e6)
        ip = q @ all_m.T  # exact: every partial sum < 2^53
        # exclude self, then per-row top-k with (ip desc, neighbor asc)
        self_col = np.searchsorted(all_ids, ids)
        rows = np.arange(len(ids))
        hit = (self_col < len(all_ids)) & (all_ids[np.minimum(self_col, len(all_ids) - 1)] == ids)
        ip[rows[hit], self_col[hit]] = -np.inf
        kk = min(k, ip.shape[1] - 1)
        out_v, out_n, out_s, out_r = [], [], [], []
        # lexsort per row on (-ip, neighbor_id): argsort of structured key
        order = np.lexsort((np.broadcast_to(all_ids, ip.shape), -ip), axis=1)[:, :kk]
        for r in range(len(ids)):
            sel = order[r]
            out_v.extend([int(ids[r])] * kk)
            out_n.extend(all_ids[sel].tolist())
            out_s.extend(ip[r, sel].astype(np.int64).tolist())
            out_r.extend(range(1, kk + 1))
        return pa.table(
            {
                "vec_id": pa.array(out_v, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "ip_e12": pa.array(out_s, pa.int64()),
                "rnk": pa.array(out_r, pa.int64()),
            }
        )

    return emb.map_batches(partial, batch_format="pyarrow").sort(["vec_id", "rnk"])


def e_knn_graph_sql(k: int = 3) -> str:
    return (
        "WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
        "CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS v "
        "FROM embeddings), "
        "s AS (SELECT a.vec_id AS qid, b.vec_id AS nid, "
        "CAST(SUM(a.v * b.v) AS BIGINT) AS ip FROM u a JOIN u b "
        "ON a.i = b.i AND a.vec_id <> b.vec_id GROUP BY 1, 2), "
        "r AS (SELECT qid, nid, ip, ROW_NUMBER() OVER (PARTITION BY qid "
        "ORDER BY ip DESC, nid) AS rn FROM s) "
        "SELECT CAST(qid AS BIGINT) AS vec_id, CAST(nid AS BIGINT) AS neighbor_id, "
        f"ip AS ip_e12, CAST(rn AS BIGINT) AS rnk FROM r WHERE rn <= {k} "
        "ORDER BY vec_id, rnk"
    )


def e_maxsim(
    sf: str,
    tokens_per_doc: int = 5,
    q_mod: int = 10,
    k: int = 3,
    dim_max: int = 2_000_000,
):
    """ColBERT-style MaxSim late-interaction retrieval (Khattab &
    Zaharia 2020, public paper): a document is a SET of token vectors
    (here doc = vec_id // tokens_per_doc over the embeddings table);
    score(q, d) = sum over q's tokens of the MAX inner product against
    d's tokens. Integer-exact in the e6 domain: every token term is
    < 64 * 4e12 and a per-doc sum of tokens_per_doc terms stays far
    under 2^53, so float64 BLAS is bit-exact and the DuckDB mirror is
    plain BIGINT.

    Distributed shape: the candidate token matrix broadcasts ONCE
    (worker-built from streamed refs, loud ``dim_max`` bound — the
    e_knn_graph pattern); each query-token batch runs one matmul +
    one np.maximum.reduceat over candidate-doc column segments. MaxSim
    is ADDITIVE over query tokens, so batches emit (q_doc, d_doc,
    term) partials that a grouped_agg sums — a query doc split across
    batches still sums correctly, no co-partitioning of the query side
    needed. Top-k per query doc rides the o9 per-group combiner."""
    from .relational import _hash_partitioned, _npart, grouped_agg

    emb = read_table(sf, "embeddings", ["vec_id", "embedding"])

    refs, n = [], 0
    for b in emb.iter_batches(batch_format="pyarrow", batch_size=65536):
        n += b.num_rows
        if n > dim_max:
            raise ValueError(
                f"e_maxsim: >{dim_max} candidate vectors — use an IVF-pruned "
                "candidate set (e_ivf_ann) before late interaction at this scale"
            )
        if b.num_rows:
            refs.append(ray.put(b))

    @ray.remote
    def build(*blocks: pa.Table):
        t = pa.concat_tables(list(blocks)).combine_chunks()
        ids = t["vec_id"].to_numpy().astype(np.int64)
        m = np.rint(np.array(t["embedding"].to_pylist(), np.float64) * 1e6)
        o = np.argsort(ids, kind="stable")
        ids, m = ids[o], m[o]
        docs = ids // tokens_per_doc
        starts = np.flatnonzero(np.r_[True, docs[1:] != docs[:-1]])
        return docs[starts], starts, m

    mat_ref = build.remote(*refs)

    def partial(t: pa.Table) -> pa.Table:
        docs_u, starts, m = ray.get(mat_ref)
        ids = t["vec_id"].to_numpy().astype(np.int64)
        qd = ids // tokens_per_doc
        qmask = qd % q_mod == 0
        if not qmask.any():
            return pa.table(
                {
                    "q_doc": pa.array([], pa.int64()),
                    "d_doc": pa.array([], pa.int64()),
                    "term": pa.array([], pa.int64()),
                }
            )
        q = np.rint(np.array(t["embedding"].to_pylist(), np.float64) * 1e6)[qmask]
        qd = qd[qmask]
        scores = q @ m.T
        mx = np.maximum.reduceat(scores, starts, axis=1)  # (m_q, D)
        nq, nd = mx.shape
        qcol = np.repeat(qd, nd)
        dcol = np.tile(docs_u, nq)
        keep = qcol != dcol  # a doc never scores itself
        return pa.table(
            {
                "q_doc": pa.array(qcol[keep]),
                "d_doc": pa.array(dcol[keep]),
                "term": pa.array(mx.ravel()[keep].astype(np.int64)),
            }
        )

    pairs = grouped_agg(
        emb.map_batches(partial, batch_format="pyarrow"),
        ["q_doc", "d_doc"],
        [("maxsim_e12", "sum", "term")],
        round_to=None,
    )

    keys = [("q_doc", "ascending"), ("maxsim_e12", "descending"), ("d_doc", "ascending")]

    def grp_topk(t: pa.Table) -> pa.Table:
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        g = t["q_doc"].to_numpy(zero_copy_only=False)
        starts = np.r_[True, g[1:] != g[:-1]] if len(g) else np.zeros(0, bool)
        gidx = np.arange(len(g)) - np.maximum.accumulate(
            np.where(starts, np.arange(len(g)), 0)
        )
        t = t.filter(pa.array(gidx < k))
        g2 = t["q_doc"].to_numpy(zero_copy_only=False)
        starts2 = np.r_[True, g2[1:] != g2[:-1]] if len(g2) else np.zeros(0, bool)
        rnk = np.arange(len(g2)) - np.maximum.accumulate(
            np.where(starts2, np.arange(len(g2)), 0)
        )
        return pa.table(
            {
                "q_doc": t["q_doc"].cast(pa.int64()),
                "d_doc": t["d_doc"].cast(pa.int64()),
                "maxsim_e12": t["maxsim_e12"].cast(pa.int64()),
                "rnk": pa.array(rnk + 1, pa.int64()),
            }
        )

    # per-block k-per-group combiner, then the per-group finalize
    combined = pairs.map_batches(grp_topk, batch_format="pyarrow").map_batches(
        lambda t: t.drop_columns(["rnk"]), batch_format="pyarrow"
    )
    return (
        _hash_partitioned(combined, "q_doc", _npart())
        .map_groups(grp_topk, batch_format="pyarrow")
        .sort(["q_doc", "rnk"])
    )


def e_maxsim_sql(tokens_per_doc: int = 5, q_mod: int = 10, k: int = 3) -> str:
    return (
        "WITH u AS (SELECT vec_id, vec_id // "
        f"{tokens_per_doc} AS doc, generate_subscripts(embedding, 1) AS i, "
        "CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS v "
        "FROM embeddings), "
        "ip AS (SELECT a.vec_id AS qv, a.doc AS qd, b.doc AS dd, b.vec_id AS dv, "
        "SUM(a.v * b.v) AS ip FROM u a JOIN u b ON a.i = b.i "
        f"AND a.doc % {q_mod} = 0 AND a.doc <> b.doc GROUP BY 1, 2, 3, 4), "
        "mx AS (SELECT qv, qd, dd, MAX(ip) AS m FROM ip GROUP BY 1, 2, 3), "
        "ms AS (SELECT qd, dd, SUM(m) AS maxsim FROM mx GROUP BY 1, 2), "
        "r AS (SELECT qd, dd, maxsim, ROW_NUMBER() OVER (PARTITION BY qd "
        "ORDER BY maxsim DESC, dd) AS rn FROM ms) "
        "SELECT CAST(qd AS BIGINT) AS q_doc, CAST(dd AS BIGINT) AS d_doc, "
        "CAST(maxsim AS BIGINT) AS maxsim_e12, CAST(rn AS BIGINT) AS rnk "
        f"FROM r WHERE rn <= {k} ORDER BY q_doc, rnk"
    )


def e_dim_stats(sf: str, scale: int = 1_000_000):
    """Per-DIMENSION moment vector of the embedding corpus — the
    normalization-statistics pass (mean/variance per component) every
    embedding pipeline runs before whitening, PCA, or product
    quantization. Components are micro-unit-quantized (the e_gram_topk
    idiom: rint(x*1e6) int64) so every partial sum is EXACT and the
    DuckDB unnest oracle hash-matches bit-for-bit; mean/var finalize is
    a trivial driver-side divide on 64 rows, so the op returns the
    sufficient statistics (n, sum_q, sumsq_q) themselves.

    Scale shape: each batch folds its rows into ONE (dim, 3) integer
    reduction — the shuffle carries dim rows per block, never the
    vectors. sumsq bound: |q| <= 1e6 => q^2 <= 1e12; int64 overflows
    past ~9.2e6 quantized-unit-norm rows PER DIM, i.e. ~10^6 corpora of
    this component range per partial — the grouped sum is exact far
    beyond any realistic shard (assert guards the batch-local term)."""
    from .relational import grouped_agg

    ds = read_table(sf, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sum_q": pa.array([], pa.int64()),
                    "sumsq_q": pa.array([], pa.int64()),
                }
            )
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(t.num_rows, -1)
        q = np.rint(m * scale).astype(np.int64)
        d = q.shape[1]
        sumsq = (q * q).sum(axis=0)
        assert sumsq.max(initial=0) < (1 << 62), "e_dim_stats: quantized sumsq overflow"
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "n": pa.array(np.full(d, t.num_rows, np.int64)),
                "sum_q": pa.array(q.sum(axis=0)),
                "sumsq_q": pa.array(sumsq),
            }
        )

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["dim"],
        [("n", "sum", "n"), ("sum_q", "sum", "sum_q"), ("sumsq_q", "sum", "sumsq_q")],
        round_to=None,
    ).sort("dim")


def e_dim_stats_sql(scale: int = 1_000_000) -> str:
    return (
        "WITH u AS (SELECT generate_subscripts(embedding, 1) AS dim, "
        f"CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * {scale}, 0) AS BIGINT) AS q "
        "FROM embeddings) "
        "SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n, "
        "CAST(SUM(q) AS BIGINT) AS sum_q, CAST(SUM(q * q) AS BIGINT) AS sumsq_q "
        "FROM u GROUP BY dim ORDER BY dim"
    )


def e_cov_matrix(sf: str, scale: int = 1000):
    """Upper-triangle second-moment (Gram / covariance sufficient
    statistic) matrix of the embedding corpus: sum_r q[r,i]*q[r,j] for
    i <= j — the X^T X pass that follows e_dim_stats in a whitening /
    PCA / ZCA pipeline (cov = (X^T X - n mean mean^T) / (n-1); the
    finalize is a driver-side divide over d^2 numbers, so the op
    returns the exact sufficient statistic itself). Components are
    milli-unit-quantized (rint(x*1e3) int64) so every partial product
    and sum is EXACT and the DuckDB unnest self-join oracle
    hash-matches bit-for-bit.

    Scale shape: each batch folds its rows into ONE d(d+1)/2-row
    integer reduction via a single int64 matmul (q.T @ q — the
    e_gram_topk idiom, BLAS-shaped even on ints); the shuffle carries
    2,080 rows per block (d=64), never the vectors. Overflow bound:
    |q| <= 1e3 (unit-norm-ish components) => |q_i*q_j| <= 1e6; the
    grouped int64 sum is exact to ~9.2e12 rows — far beyond any
    realistic corpus shard (assert guards the batch-local term)."""
    from .relational import grouped_agg

    ds = read_table(sf, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dim_i": pa.array([], pa.int64()),
                    "dim_j": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "sumprod_q": pa.array([], pa.int64()),
                }
            )
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(t.num_rows, -1)
        q = np.rint(m * scale).astype(np.int64)
        d = q.shape[1]
        g = q.T @ q
        iu = np.triu_indices(d)
        v = g[iu]
        assert np.abs(v).max(initial=0) < (1 << 62), "e_cov_matrix: sumprod overflow"
        return pa.table(
            {
                "dim_i": pa.array((iu[0] + 1).astype(np.int64)),
                "dim_j": pa.array((iu[1] + 1).astype(np.int64)),
                "n": pa.array(np.full(len(v), t.num_rows, np.int64)),
                "sumprod_q": pa.array(v),
            }
        )

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["dim_i", "dim_j"],
        [("n", "sum", "n"), ("sumprod_q", "sum", "sumprod_q")],
        round_to=None,
    ).sort(["dim_i", "dim_j"])


def e_cov_matrix_sql(scale: int = 1000) -> str:
    return (
        "WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS dim, "
        f"CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * {scale}, 0) AS BIGINT) AS q "
        "FROM embeddings) "
        "SELECT CAST(a.dim AS BIGINT) AS dim_i, CAST(b.dim AS BIGINT) AS dim_j, "
        "COUNT(*) AS n, CAST(SUM(a.q * b.q) AS BIGINT) AS sumprod_q "
        "FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.dim <= b.dim "
        "GROUP BY a.dim, b.dim ORDER BY dim_i, dim_j"
    )


def e_whiten_project(sf: str, k: int = 8, q_scale: int = 1000, w_scale: int = 1_000_000):
    """PCA-WHITENING projection of the embedding corpus — the transform
    step that consumes e_dim_stats + e_cov_matrix: fit W from the exact
    integer sufficient statistics (driver-side eigh on the d x d
    covariance — 64x64, microseconds), then project every vector with
    ONE int64 matmul per batch. The projection is INTEGER-EXACT
    end-to-end (centered quantized vector @ quantized W), so the output
    is bit-identical across batch splits, CPU counts, and runs —
    float dgemm rounding never touches the result.

    Fit determinism: the covariance matrix is assembled from exact
    integer sums (identical bits every run), and LAPACK eigh on
    identical input bits is deterministic in-process; eigenvector sign
    is canonicalized (largest-|component| positive) so W is unique.

    Scale shape: two statistics passes (each reducing blocks to d- and
    d^2-row partials) + one streaming projection pass; W (d x k int64)
    ships via closure capture — a few KB. Magnitude bound:
    |centered q| <= 2e3, |Wq| <= ~3.2e7 (1/sqrt(eig) for eig >= 1e-3),
    d=64 terms => |y| <= 4e12 per component — int64-safe (asserted)."""
    stats = e_cov_matrix(sf, scale=q_scale).to_pandas()
    mom = e_dim_stats(sf, scale=q_scale).to_pandas()
    n = int(mom["n"].iloc[0])
    d = len(mom)
    sum_q = mom["sum_q"].to_numpy()
    mean_q = np.rint(sum_q / n).astype(np.int64)  # rounded mean, exact ints
    s = np.zeros((d, d), np.float64)
    i = stats["dim_i"].to_numpy() - 1
    j = stats["dim_j"].to_numpy() - 1
    v = stats["sumprod_q"].to_numpy().astype(np.float64)
    s[i, j] = v
    s[j, i] = v
    mu = sum_q.astype(np.float64) / n
    cov = (s - n * np.outer(mu, mu)) / max(n - 1, 1)
    eig, vec = np.linalg.eigh(cov)
    order = np.argsort(eig)[::-1][:k]
    eig, vec = eig[order], vec[:, order]
    sign = np.sign(vec[np.argmax(np.abs(vec), axis=0), np.arange(k)])
    sign[sign == 0] = 1.0
    vec = vec * sign
    w = vec / np.sqrt(np.maximum(eig, 1e-3))
    wq = np.rint(w * w_scale).astype(np.int64)

    ds = read_table(sf, "embeddings", ["vec_id", "embedding"])

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            cols = {"vec_id": pa.array([], pa.int64())}
            for c in range(k):
                cols[f"y{c}"] = pa.array([], pa.int64())
            return pa.table(cols)
        col = t["embedding"].combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.rint(flat.reshape(t.num_rows, -1) * q_scale).astype(np.int64)
        y = (q - mean_q) @ wq
        assert np.abs(y).max(initial=0) < (1 << 62), "e_whiten: projection overflow"
        cols = {"vec_id": t["vec_id"]}
        for c in range(k):
            cols[f"y{c}"] = pa.array(y[:, c])
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def e_whiten_digest(sf: str, k: int = 8):
    """queries() entry (golden-pin oracle): the whitening projection
    folded to one order-independent digest row — rows count + an XOR of
    per-row splitmix64 hashes over (vec_id, y0..y{k-1}). Integer-exact
    projection makes the digest bit-stable across batch splits and CPU
    counts; the sf0.01 value is pinned in oracle_sql() and re-derived /
    asserted in tests."""
    from ..functions.hll import _mix64

    proj = e_whiten_project(sf, k=k)
    _empty = pa.table({"rows": pa.array([], pa.int64()), "digest": pa.array([], pa.int64())})

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        with np.errstate(over="ignore"):
            h = _mix64(t["vec_id"].to_numpy().astype(np.int64).view(np.uint64))
            for c in range(k):
                h = _mix64(h ^ t[f"y{c}"].to_numpy().astype(np.int64).view(np.uint64))
        x = np.bitwise_xor.reduce(h)
        return pa.table(
            {
                "rows": pa.array([t.num_rows], pa.int64()),
                "digest": pa.array([np.uint64(x).astype(np.int64)]),
            }
        )

    parts = proj.map_batches(fold, batch_format="pyarrow")

    @ray.remote
    def finalize(*blocks: pa.Table) -> pa.Table:
        t = pa.concat_tables([b for b in blocks if b.num_rows] or [_empty])
        rows = int(pc.sum(t["rows"]).as_py() or 0)
        dig = np.bitwise_xor.reduce(
            t["digest"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64),
        ) if t.num_rows else np.uint64(0)
        return pa.table(
            {
                "rows": pa.array([rows], pa.int64()),
                "digest": pa.array([np.uint64(dig).astype(np.int64)]),
            }
        )

    refs = parts.materialize().to_arrow_refs()
    return ray.data.from_arrow_refs([finalize.remote(*refs)])


# ----------------------------------------------------------- HNSW


def _hnsw_build(ids: np.ndarray, m: np.ndarray, M: int = 8, efc: int = 48):
    """Deterministic HNSW graph build (Malkov & Yashunin 2018), pure
    numpy + heapq. Determinism: insertion in vec_id order; node level =
    trailing-zero-bit count of splitmix64(vec_id) // 2 (a geometric
    law with p = 1/4, the paper's mL ~ 1/ln(M) shape without any RNG
    state); every candidate heap breaks similarity ties by id. Returns
    (adjacency per level, entry point, top level). Neighbor selection
    is simple top-M by similarity (the paper's base heuristic)."""
    import heapq

    n = len(ids)
    # splitmix64 finalizer on the raw ids
    h = ids.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(30); h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27); h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    tz = np.zeros(n, np.int64)
    hh = h.copy()
    mask = hh != 0
    while mask.any():  # trailing zeros, vectorized (<= 64 rounds)
        bit = (hh & np.uint64(1)) == 0
        adv = mask & bit
        if not adv.any():
            break
        tz[adv] += 1
        hh[adv] >>= np.uint64(1)
        mask = adv
    levels = np.minimum(tz // 2, 8)

    adj: list[dict[int, list[int]]] = [dict() for _ in range(int(levels.max()) + 1)]
    entry, top = 0, int(levels[0])
    for lv in range(top + 1):
        adj[lv][0] = []

    def _search_layer(q: np.ndarray, eps: list[int], ef: int, lv: int) -> list[tuple[float, int]]:
        sims = {e: float(m[e] @ q) for e in eps}
        visited = set(eps)
        cand = [(-s, e) for e, s in sims.items()]
        heapq.heapify(cand)
        res = [(s, -e) for e, s in sims.items()]  # min-heap; tie evicts LARGER id
        heapq.heapify(res)
        while cand:
            ns, u = heapq.heappop(cand)
            if len(res) >= ef and -ns < res[0][0]:
                break
            for v in adj[lv][u]:
                if v in visited:
                    continue
                visited.add(v)
                sv = float(m[v] @ q)
                if len(res) < ef or sv > res[0][0] or (sv == res[0][0] and -v > res[0][1]):
                    heapq.heappush(cand, (-sv, v))
                    heapq.heappush(res, (sv, -v))
                    if len(res) > ef:
                        heapq.heappop(res)
        return sorted(((s, -ni) for s, ni in res), key=lambda x: (-x[0], x[1]))

    for i in range(1, n):
        li = int(levels[i])
        q = m[i]
        eps = [entry]
        for lv in range(top, li, -1):
            eps = [_search_layer(q, eps, 1, lv)[0][1]]
        for lv in range(min(li, top), -1, -1):
            cands = _search_layer(q, eps, efc, lv)
            nbrs = [c[1] for c in cands[:M]]
            adj[lv][i] = list(nbrs)
            for v in nbrs:
                lst = adj[lv][v]
                lst.append(i)
                if len(lst) > M:
                    # prune to top-M by (sim to v desc, id asc)
                    sims_v = sorted(
                        ((float(m[w] @ m[v]), w) for w in lst),
                        key=lambda x: (-x[0], x[1]),
                    )
                    adj[lv][v] = [w for _, w in sims_v[:M]]
            eps = [c[1] for c in cands]
        for lv in range(top + 1, li + 1):
            adj[lv][i] = []
        if li > top:
            entry, top = i, li
    return adj, entry, top


_HNSW_BOUND = 1_000_000  # loud build bound; above it, build per-IVF-cell


@ray.remote(num_cpus=1)
def _hnsw_build_remote(sf: str, M: int, efc: int):
    """Worker-side build (never on the driver): loads the embeddings,
    asserts the loud bound, returns (ids, normalized matrix, graph).
    The 100-TB scale path is one HNSW per IVF cell (build this same
    graph per centroid bucket; route queries by nprobe cells) — the
    bound makes that switch explicit instead of letting a driver-
    adjacent single graph grow unbounded."""
    t = pa.concat_tables(
        list(
            read_table(sf, "embeddings", ["vec_id", "embedding"]).iter_batches(
                batch_format="pyarrow", batch_size=65536
            )
        )
    )
    ids, m = _emb_matrix(t)
    if len(ids) > _HNSW_BOUND:
        raise ValueError(
            f"hnsw: {len(ids)} vectors exceeds the single-graph bound "
            f"{_HNSW_BOUND} — build per-IVF-cell graphs instead"
        )
    order = np.argsort(ids)
    ids, m = ids[order], _normalize(m[order])
    adj, entry, top = _hnsw_build(ids, m, M=M, efc=efc)
    return ids, m, adj, entry, top


def _hnsw_search(adj, m: np.ndarray, entry: int, top: int, q: np.ndarray, ef: int):
    """Greedy descent + ef-limited base-layer best-first search over a
    built graph; returns [(sim, node_index)] sorted (sim desc, idx
    asc). Shared by the flat searcher stage and the per-IVF-cell
    path."""
    import heapq

    def _layer(eps, ef_, lv):
        sims = {e: float(m[e] @ q) for e in eps}
        visited = set(eps)
        cand = [(-s, e) for e, s in sims.items()]
        heapq.heapify(cand)
        res = [(s, -e) for e, s in sims.items()]
        heapq.heapify(res)
        while cand:
            ns, u = heapq.heappop(cand)
            if len(res) >= ef_ and -ns < res[0][0]:
                break
            for v in adj[lv][u]:
                if v in visited:
                    continue
                visited.add(v)
                sv = float(m[v] @ q)
                if len(res) < ef_ or sv > res[0][0] or (sv == res[0][0] and -v > res[0][1]):
                    heapq.heappush(cand, (-sv, v))
                    heapq.heappush(res, (sv, -v))
                    if len(res) > ef_:
                        heapq.heappop(res)
        return sorted(((s, -ni) for s, ni in res), key=lambda x: (-x[0], x[1]))

    eps = [entry]
    for lv in range(top, 0, -1):
        eps = [_layer(eps, 1, lv)[0][1]]
    return _layer(eps, ef, 0)


class _HnswSearcher:
    """Actor-pool query stage: the graph broadcasts once per actor via
    the shared object-store ref; each batch of query vectors runs
    greedy descent + ef-limited base-layer search."""

    def __init__(self, gref, k: int, ef: int):
        self.ids, self.m, self.adj, self.entry, self.top = ray.get(gref)
        self.k, self.ef = k, ef

    def __call__(self, t: pa.Table) -> pa.Table:
        out_q, out_n, out_r = [], [], []
        qids = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        qm = np.array(t["qvec"].to_pylist(), np.float64)
        for j in range(len(qids)):
            found = _hnsw_search(self.adj, self.m, self.entry, self.top, qm[j], self.ef)
            qid = int(qids[j])
            picked = [(s, i) for s, i in found if int(self.ids[i]) != qid][: self.k]
            for r, (_, i) in enumerate(picked, 1):
                out_q.append(qid)
                out_n.append(int(self.ids[i]))
                out_r.append(r)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "rnk": pa.array(out_r, pa.int64()),
            }
        )


def e_hnsw_ann(sf: str, k: int = 10, n_queries: int = 3, ef: int = 64, M: int = 8):
    """Approximate top-k via a deterministic HNSW graph (Malkov &
    Yashunin 2018) — the graph-ANN family member beside LSH (bucket
    pruning) and IVF (centroid pruning). Build runs in ONE worker task
    with a loud 1M-vector bound (the documented scale path is one
    graph per IVF cell); queries stream through an actor-pool search
    stage with the graph broadcast once. Same output contract as
    e_ivf_ann; recall vs the exact brute-force top-k and run-to-run
    determinism are pytest-checked (approximate -> rows-only driver
    check by design)."""
    gref = ray.put(ray.get(_hnsw_build_remote.remote(sf, M, ef)))
    qids, qm = load_queries(sf, n_queries)
    qt = pa.table(
        {
            "query_id": pa.array(qids, pa.int64()),
            "qvec": pa.array([list(map(float, r)) for r in qm]),
        }
    )
    qds = ray.data.from_arrow(qt)
    out = qds.map_batches(
        _HnswSearcher,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=1,
        fn_constructor_kwargs={"gref": gref, "k": k, "ef": ef},
    )
    return pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow", batch_size=65536))
    ).combine_chunks()


def e_hnsw_ivf_ann(
    sf: str, k: int = 10, n_queries: int = 3, dim: int = 64,
    nprobe: int = 4, ef: int = 64, M: int = 8,
):
    """The HNSW SCALE PATH made concrete (the e_hnsw_ann docstring's
    'one graph per IVF cell'): the durable IVF artifact's centroid
    lists each build their OWN deterministic HNSW graph in parallel
    (groupby(cid).map_groups — a cell is corpus/n_centroids sized,
    which IS the per-worker bound), queries route to their nprobe
    nearest cells exactly as e_ivf_ann routes, each probed cell
    searches its local graph for the queries that probed it, and the
    per-(query, cell) candidates merge through the standard
    _finalize_topk. No single worker ever holds more than a cell;
    recall is pytest-gated against brute force like the other
    approximate paths (rows-only driver check by design)."""
    idx = ivf_index(sf, dim=dim)
    qids, qm = load_queries(sf, n_queries)
    order = np.argsort(-(qm @ idx.centroids.T), axis=1)[:, :nprobe]
    probe_ref = ray.put((qids, qm, order))

    def per_cell(t: pa.Table) -> pa.Table:
        qids_, qm_, probes = ray.get(probe_ref)
        cid = int(t["cid"][0].as_py())
        qsel = [j for j in range(len(qids_)) if cid in probes[j]]
        if not qsel:
            return pa.table(_EMPTY_TOPK)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.frombuffer(b"".join(t["emb"].to_pylist()), np.float64).reshape(len(ids), -1)
        srt = np.argsort(ids)
        ids, m = ids[srt], np.ascontiguousarray(m[srt])
        adj, entry, top = _hnsw_build(ids, m, M=M, efc=ef)
        out_q, out_n, out_s = [], [], []
        for j in qsel:
            found = _hnsw_search(adj, m, entry, top, qm_[j], ef)
            qid = int(qids_[j])
            picked = [(s, i) for s, i in found if int(ids[i]) != qid][:k]
            out_q.extend([qid] * len(picked))
            out_n.extend(int(ids[i]) for _, i in picked)
            out_s.extend(s for s, _ in picked)
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    cells = idx.artifact.read_for(np.unique(order.ravel()))
    parts = cells.groupby("cid").map_groups(per_cell, batch_format="pyarrow").to_pandas()
    return _finalize_topk(parts, k)


def e_hard_negatives(
    sf: str, k: int = 3, n_src: int = 4, dim_max: int = 2_000_000
):
    """HARD-NEGATIVE MINING for retrieval training (the DPR/contriever
    recipe: for every anchor, the most-similar candidates from a
    DIFFERENT source are the negatives that actually teach the
    model — random negatives are too easy): top-``k`` exact
    inner-product neighbors of every vector EXCLUDING its own source
    cohort (src = vec_id % ``n_src``, the deterministic stand-in for
    a real source column). Same shape as e_knn_graph — quantized
    matrix broadcast once behind the loud ``dim_max`` bound, one
    bit-exact float64-BLAS matmul per batch, per-row top-k with
    (ip desc, neighbor asc) ties, no finalize merge; above the bound
    it refuses toward the IVF route."""
    emb = read_table(sf, "embeddings", ["vec_id", "embedding"])

    refs, n = [], 0
    for b in emb.iter_batches(batch_format="pyarrow", batch_size=65536):
        n += b.num_rows
        if n > dim_max:
            raise ValueError(
                f"e_hard_negatives: >{dim_max} vectors — use the "
                "IVF-bucketed path at this scale"
            )
        if b.num_rows:
            refs.append(ray.put(b))

    @ray.remote
    def build(*blocks: pa.Table):
        t = pa.concat_tables(list(blocks)).combine_chunks()
        ids = t["vec_id"].to_numpy().astype(np.int64)
        m = np.rint(np.array(t["embedding"].to_pylist(), np.float64) * 1e6)
        o = np.argsort(ids, kind="stable")
        return ids[o], m[o]

    mat_ref = build.remote(*refs)

    def partial(t: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(mat_ref)
        all_src = all_ids % n_src
        ids = t["vec_id"].to_numpy().astype(np.int64)
        q = np.rint(np.array(t["embedding"].to_pylist(), np.float64) * 1e6)
        ip = q @ all_m.T  # exact: every partial sum < 2^53
        # mask the anchor's whole source cohort (covers self too)
        ip[all_src[None, :] == (ids % n_src)[:, None]] = -np.inf
        kk = min(k, ip.shape[1] - 1)
        order = np.lexsort((np.broadcast_to(all_ids, ip.shape), -ip), axis=1)[:, :kk]
        out_v, out_n, out_s, out_r = [], [], [], []
        for r in range(len(ids)):
            sel = order[r]
            keep = np.isfinite(ip[r, sel])  # degenerate: < k valid
            sel = sel[keep]
            out_v.extend([int(ids[r])] * len(sel))
            out_n.extend(all_ids[sel].tolist())
            out_s.extend(ip[r, sel].astype(np.int64).tolist())
            out_r.extend(range(1, len(sel) + 1))
        return pa.table(
            {
                "vec_id": pa.array(out_v, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "ip_e12": pa.array(out_s, pa.int64()),
                "rnk": pa.array(out_r, pa.int64()),
            }
        )

    return emb.map_batches(partial, batch_format="pyarrow").sort(["vec_id", "rnk"])


def e_hard_negatives_sql(k: int = 3, n_src: int = 4) -> str:
    return (
        "WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
        "CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS v "
        "FROM embeddings), "
        "s AS (SELECT a.vec_id AS qid, b.vec_id AS nid, "
        "CAST(SUM(a.v * b.v) AS BIGINT) AS ip FROM u a JOIN u b "
        f"ON a.i = b.i AND a.vec_id % {n_src} <> b.vec_id % {n_src} "
        "GROUP BY 1, 2), "
        "r AS (SELECT qid, nid, ip, ROW_NUMBER() OVER (PARTITION BY qid "
        "ORDER BY ip DESC, nid) AS rn FROM s) "
        "SELECT CAST(qid AS BIGINT) AS vec_id, CAST(nid AS BIGINT) AS neighbor_id, "
        f"ip AS ip_e12, CAST(rn AS BIGINT) AS rnk FROM r WHERE rn <= {k} "
        "ORDER BY vec_id, rnk"
    )


def e_mrl_overlap(
    sf: str, k: int = 3, prefix_dims: int = 16, dim_max: int = 2_000_000
):
    """MATRYOSHKA truncation diagnostic (Kusupati et al. 2022 — MRL
    embeddings are trained so a prefix of the vector is itself a
    usable embedding): for every anchor, compute the exact top-``k``
    inner-product neighbors under the FULL vector and under the first
    ``prefix_dims`` dimensions, and emit how many neighbors the
    truncated ranking retains (n_overlap in 0..k) — the measurement a
    team runs before shipping truncated vectors to cut ANN index cost
    4x. One broadcast (both matrices derive from the same ref), two
    bit-exact e6-integer matmuls per batch, set intersection per
    anchor; the loud ``dim_max`` bound and the IVF refusal mirror
    e_knn_graph."""
    emb = read_table(sf, "embeddings", ["vec_id", "embedding"])

    refs, n = [], 0
    for b in emb.iter_batches(batch_format="pyarrow", batch_size=65536):
        n += b.num_rows
        if n > dim_max:
            raise ValueError(
                f"e_mrl_overlap: >{dim_max} vectors — run per IVF cell at "
                "this scale"
            )
        if b.num_rows:
            refs.append(ray.put(b))

    @ray.remote
    def build(*blocks: pa.Table):
        t = pa.concat_tables(list(blocks)).combine_chunks()
        ids = t["vec_id"].to_numpy().astype(np.int64)
        m = np.rint(np.array(t["embedding"].to_pylist(), np.float64) * 1e6)
        o = np.argsort(ids, kind="stable")
        return ids[o], m[o]

    mat_ref = build.remote(*refs)

    def _topk_sets(q: np.ndarray, m: np.ndarray, ids, all_ids, kk):
        ip = q @ m.T
        self_col = np.searchsorted(all_ids, ids)
        rows = np.arange(len(ids))
        hit = (self_col < len(all_ids)) & (
            all_ids[np.minimum(self_col, len(all_ids) - 1)] == ids
        )
        ip[rows[hit], self_col[hit]] = -np.inf
        return np.lexsort((np.broadcast_to(all_ids, ip.shape), -ip), axis=1)[:, :kk]

    def partial(t: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(mat_ref)
        ids = t["vec_id"].to_numpy().astype(np.int64)
        q = np.rint(np.array(t["embedding"].to_pylist(), np.float64) * 1e6)
        kk = min(k, len(all_ids) - 1)
        full = _topk_sets(q, all_m, ids, all_ids, kk)
        trunc = _topk_sets(
            q[:, :prefix_dims], all_m[:, :prefix_dims], ids, all_ids, kk
        )
        ov = [
            len(set(all_ids[full[r]]) & set(all_ids[trunc[r]]))
            for r in range(len(ids))
        ]
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "n_overlap": pa.array(ov, pa.int64()),
            }
        )

    return emb.map_batches(partial, batch_format="pyarrow").sort("vec_id")


def e_mrl_overlap_sql(k: int = 3, prefix_dims: int = 16) -> str:
    def knn(name: str, where: str) -> str:
        return (
            f"{name} AS (SELECT qid, nid FROM (SELECT a.vec_id AS qid, "
            "b.vec_id AS nid, ROW_NUMBER() OVER (PARTITION BY a.vec_id "
            "ORDER BY SUM(a.v * b.v) DESC, b.vec_id) AS rn FROM u a JOIN u b "
            f"ON a.i = b.i AND a.vec_id <> b.vec_id {where} "
            f"GROUP BY a.vec_id, b.vec_id) WHERE rn <= {k})"
        )

    return (
        "WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
        "CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS v "
        "FROM embeddings), "
        + knn("kf", "")
        + ", "
        + knn("kt", f"AND a.i <= {prefix_dims}")
        + " SELECT kf.qid AS vec_id, CAST(COUNT(kt.nid) AS BIGINT) AS n_overlap "
        "FROM kf LEFT JOIN kt ON kf.qid = kt.qid AND kf.nid = kt.nid "
        "GROUP BY kf.qid ORDER BY vec_id"
    )


def e_rrf_fusion(
    sf: str,
    k: int = 3,
    pool: int = 10,
    prefix_dims: int = 16,
    k0: int = 60,
    dim_max: int = 2_000_000,
):
    """RECIPROCAL-RANK FUSION (Cormack, Clarke & Buettcher 2009) of two
    retrieval rankings — the standard hybrid-search combiner: for every
    anchor, fuse the exact full-dimension inner-product top-``pool``
    ranking with the Matryoshka prefix-dimension ranking (the cheap
    retriever e_mrl_overlap diagnoses) and emit the top-``k`` fused
    neighbors. RRF score is integer-exact on both engines:
    rrf_e9 = sum over rankings containing the doc of
    1_000_000_000 // (k0 + rank). Output (vec_id, nid, rrf_e9, rank)
    with (rrf_e9 DESC, nid ASC) ties.

    Distributed shape: ONE worker-built e6-quantized matrix broadcast
    (loud ``dim_max`` bound, the e_knn_graph refusal), two bit-exact
    integer matmuls per anchor batch, per-anchor fusion over <= 2*pool
    candidates — the corpus streams once and never shuffles."""
    emb = read_table(sf, "embeddings", ["vec_id", "embedding"])

    refs, n = [], 0
    for b in emb.iter_batches(batch_format="pyarrow", batch_size=65536):
        n += b.num_rows
        if n > dim_max:
            raise ValueError(
                f"e_rrf_fusion: >{dim_max} vectors — run per IVF cell at "
                "this scale"
            )
        if b.num_rows:
            refs.append(ray.put(b))

    @ray.remote
    def build(*blocks: pa.Table):
        t = pa.concat_tables(list(blocks)).combine_chunks()
        ids = t["vec_id"].to_numpy().astype(np.int64)
        m = np.rint(np.array(t["embedding"].to_pylist(), np.float64) * 1e6)
        o = np.argsort(ids, kind="stable")
        return ids[o], m[o]

    mat_ref = build.remote(*refs)

    def _ranked(q: np.ndarray, m: np.ndarray, ids, all_ids, p):
        ip = q @ m.T
        self_col = np.searchsorted(all_ids, ids)
        rows = np.arange(len(ids))
        hit = (self_col < len(all_ids)) & (
            all_ids[np.minimum(self_col, len(all_ids) - 1)] == ids
        )
        ip[rows[hit], self_col[hit]] = -np.inf
        return np.lexsort((np.broadcast_to(all_ids, ip.shape), -ip), axis=1)[:, :p]

    def fuse(t: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(mat_ref)
        ids = t["vec_id"].to_numpy().astype(np.int64)
        q = np.rint(np.array(t["embedding"].to_pylist(), np.float64) * 1e6)
        p = min(pool, len(all_ids) - 1)
        full = _ranked(q, all_m, ids, all_ids, p)
        trunc = _ranked(q[:, :prefix_dims], all_m[:, :prefix_dims], ids, all_ids, p)
        oa, on, os_, orr = [], [], [], []
        for r in range(len(ids)):
            sc: dict[int, int] = {}
            for pos in range(p):
                c = int(all_ids[full[r, pos]])
                sc[c] = sc.get(c, 0) + 1_000_000_000 // (k0 + pos + 1)
            for pos in range(p):
                c = int(all_ids[trunc[r, pos]])
                sc[c] = sc.get(c, 0) + 1_000_000_000 // (k0 + pos + 1)
            top = sorted(sc.items(), key=lambda x: (-x[1], x[0]))[:k]
            for rnk, (nid, s) in enumerate(top, 1):
                oa.append(int(ids[r]))
                on.append(nid)
                os_.append(s)
                orr.append(rnk)
        return pa.table(
            {
                "vec_id": pa.array(oa, pa.int64()),
                "nid": pa.array(on, pa.int64()),
                "rrf_e9": pa.array(os_, pa.int64()),
                "rank": pa.array(orr, pa.int64()),
            }
        )

    return emb.map_batches(fuse, batch_format="pyarrow").sort(["vec_id", "rank"])


def e_rrf_fusion_sql(
    k: int = 3, pool: int = 10, prefix_dims: int = 16, k0: int = 60
) -> str:
    def knn(name: str, where: str) -> str:
        return (
            f"{name} AS (SELECT qid, nid, rn FROM (SELECT a.vec_id AS qid, "
            "b.vec_id AS nid, ROW_NUMBER() OVER (PARTITION BY a.vec_id "
            "ORDER BY SUM(a.v * b.v) DESC, b.vec_id) AS rn FROM u a JOIN u b "
            f"ON a.i = b.i AND a.vec_id <> b.vec_id {where} "
            f"GROUP BY a.vec_id, b.vec_id) WHERE rn <= {pool})"
        )

    return (
        "WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, "
        "CAST(ROUND(CAST(UNNEST(embedding) AS DOUBLE) * 1000000, 0) AS BIGINT) AS v "
        "FROM embeddings), "
        + knn("kf", "")
        + ", "
        + knn("kt", f"AND a.i <= {prefix_dims}")
        + ", fused AS (SELECT COALESCE(kf.qid, kt.qid) AS qid, "
        "COALESCE(kf.nid, kt.nid) AS nid, "
        f"COALESCE(1000000000 // ({k0} + kf.rn), 0) + "
        f"COALESCE(1000000000 // ({k0} + kt.rn), 0) AS rrf_e9 "
        "FROM kf FULL OUTER JOIN kt ON kf.qid = kt.qid AND kf.nid = kt.nid) "
        "SELECT qid AS vec_id, nid, rrf_e9, rank FROM (SELECT qid, nid, rrf_e9, "
        "ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf_e9 DESC, nid) AS rank "
        f"FROM fused) WHERE rank <= {k} ORDER BY vec_id, rank"
    )


def e_recall_eval(sf: str, k: int = 10, n_queries: int = 3):
    """ANN EVALUATION harness as a first-class op — recall@k of the two
    approximate indexes (bucket-partitioned LSH, IVF) against the exact
    brute-force ranking, per query: the measurement a team runs before
    trusting an ANN index in a retrieval pipeline ("measure, don't
    guess"). Deterministic end to end (seeded hyperplanes,
    deterministic IVF centroids), so the result is pinnable; the pin is
    kept honest by a pytest that recomputes the intersections from the
    three (independently correctness-checked) query surfaces.

    Output (query_id, n_hit_lsh, n_hit_ivf, k) — recall@k = n_hit / k
    derivable exactly. Result-sized driver work only (3 x k rows per
    surface); the heavy lifting happens inside the three underlying
    distributed queries."""
    exact = e_knn_bruteforce(sf, k, n_queries).to_pandas()
    lsh = e_lsh_ann(sf, k, n_queries).to_pandas()
    ivf = e_ivf_ann(sf, k, n_queries).to_pandas()

    def hits(approx, qid: int) -> int:
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        return len(a & e)

    qids = sorted(set(exact["query_id"]))
    return pa.table(
        {
            "query_id": pa.array([int(q) for q in qids], pa.int64()),
            "n_hit_lsh": pa.array([hits(lsh, q) for q in qids], pa.int64()),
            "n_hit_ivf": pa.array([hits(ivf, q) for q in qids], pa.int64()),
            "k": pa.array([k] * len(qids), pa.int64()),
        }
    )
