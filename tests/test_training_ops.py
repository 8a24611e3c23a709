"""PY-oracle tests for the non-SQL-expressible training-data ops:
HLL accuracy, MinHash-LSH near-dedup vs brute force, LSH-ANN recall vs
brute force, langid, phash near-dup band join, multimodal stubs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from lulu_crawler_ray.functions import textstats as tx
from lulu_crawler_ray.functions.hll import HyperLogLog
from lulu_crawler_ray.functions.phash import hamming64

SF = "/root/testdata/sf0.01"


def test_hll_accuracy_plain():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << 62, 200_000, np.uint64)
    h = HyperLogLog(p=12)
    h.add_many(vals)
    exact = len(np.unique(vals))
    assert abs(h.count() - exact) / exact < 0.03


def test_hll_merge_equivalence():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1 << 62, 50_000, np.uint64)
    whole = HyperLogLog(p=12)
    whole.add_many(vals)
    merged = HyperLogLog(p=12)
    for chunk in np.array_split(vals, 7):
        part = HyperLogLog(p=12)
        part.add_many(chunk)
        merged.merge_registers(part.registers.tobytes())
    assert (whole.registers == merged.registers).all()


def test_g4_query_vs_exact(ray_session):
    from lulu_crawler_ray.pipelines.relational import g4_hll_distinct

    import duckdb

    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_partkey) FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()[0]
    approx = g4_hll_distinct(SF)["approx_distinct"][0].as_py()
    assert abs(approx - exact) / exact < 0.03


# ---------------------------------------------------------------- minhash
def _fixture_docs(n_base: int = 30, n_dup: int = 10, cluster: int = 2, seed: int = 3):
    """n_base base docs; the first n_dup each get (cluster-1) planted
    near-dup variants (3 of 60 tokens mutated)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(200)]
    base = [" ".join(rng.choice(vocab, 60)) for _ in range(n_base)]
    docs, ids = [], []
    stride = cluster
    for i, b in enumerate(base):
        docs.append(b)
        ids.append(stride * i)
        if i < n_dup:
            for v in range(1, cluster):
                toks = b.split()
                for j in rng.integers(0, 60, 3):
                    toks[j] = str(rng.choice(vocab))
                docs.append(" ".join(toks))
                ids.append(stride * i + v)
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(docs)})


def test_minhash_neardedup_vs_bruteforce(ray_session):
    import ray.data

    from lulu_crawler_ray.pipelines.textops import near_dedup_minhash

    t = _fixture_docs()
    docs = ray.data.from_arrow(t).repartition(4)
    kept = set(near_dedup_minhash(docs, threshold=0.7).to_pandas()["doc_id"])

    # brute-force oracle: union-find over all pairs with jaccard >= 0.7
    sh = {d: tx.shingles(s) for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    parent = {d: d for d in sh}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if tx.jaccard(sh[a], sh[b]) >= 0.7:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    expect = {d for d in ids if find(d) == d}
    # LSH recall on 3-of-60-token mutations at 16 bands of 4 is ~1;
    # allow zero false *merges* and at most 1 missed pair
    assert kept <= set(ids)
    missed = kept ^ expect
    assert len(missed) <= 2, f"near-dedup diverges: {missed}"


def test_minhash_neardedup_vs_bruteforce_10x(ray_session):
    """The distributed Jaccard-verify path against the brute-force
    oracle on a 10x corpus (300 base docs, 40 planted 3-doc near-dup
    clusters = 380 docs) — VERDICT round-1 item 3's done-criterion."""
    import ray.data

    from lulu_crawler_ray.pipelines.textops import near_dedup_minhash

    t = _fixture_docs(n_base=300, n_dup=40, cluster=3, seed=11)
    assert t.num_rows == 380
    docs = ray.data.from_arrow(t).repartition(8)
    kept = set(near_dedup_minhash(docs, threshold=0.7).to_pandas()["doc_id"])

    sh = {d: tx.shingles(s) for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    parent = {d: d for d in sh}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if tx.jaccard(sh[a], sh[b]) >= 0.7:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    expect = {d for d in ids if find(d) == d}
    missed = kept ^ expect
    # LSH recall at 16 bands of 4 on 3/60-token mutations is ~1; allow
    # a small miss budget on 80 planted duplicate docs, no false drops
    assert expect <= kept or len(missed) <= 4, f"diverges: {missed}"
    assert len(missed) <= 4, f"near-dedup diverges: {missed}"


def test_minhash_similarity_estimate():
    a, b = tx.minhash_params(256, seed=2)
    s1 = tx.shingles("the quick brown fox jumps over the lazy dog and runs away fast", k=2)
    s2 = tx.shingles("the quick brown fox jumps over the lazy cat and runs away fast", k=2)
    sig1 = tx.minhash_signature(s1, a, b)
    sig2 = tx.minhash_signature(s2, a, b)
    est = (sig1 == sig2).mean()
    true = tx.jaccard(s1, s2)
    assert abs(est - true) < 0.15


def test_simhash_similarity():
    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = "alpha beta gamma delta epsilon zeta eta iota"
    t3 = "completely different words entirely unrelated content here now"
    d_close = hamming64(tx.simhash64(t1), tx.simhash64(t2))
    d_far = hamming64(tx.simhash64(t1), tx.simhash64(t3))
    assert d_close < d_far


def test_langid_fixture():
    assert tx.langid("the cat and the dog went to a house") == "en"
    assert tx.langid("le chat et la maison est pour un jour") == "fr"
    assert tx.langid("der hund und die katze ist ein tier") == "de"
    assert tx.langid("el perro y la casa es un lugar") == "es"
    assert tx.langid("xyzzy qwerty plugh") == "und"


# ---------------------------------------------------------------- ANN
def test_lsh_ann_recall(ray_session):
    from lulu_crawler_ray.pipelines.annsearch import e_knn_bruteforce, e_lsh_ann

    exact = e_knn_bruteforce(SF).to_pandas()
    approx = e_lsh_ann(SF).to_pandas()
    recalls = []
    for q in exact["query_id"].unique():
        e = set(exact[exact.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, f"LSH recall too low: {recalls}"


# ---------------------------------------------------------------- images
def test_phash_neardup_band_join(ray_session):
    import ray.data

    from lulu_crawler_ray.pipelines.images_pipe import (
        build_image_fixture,
        near_dedup_images,
        phash_near_pairs,
    )

    t = build_image_fixture(60)
    # plant near-dups: copies of row 0 with <=3 phash bits flipped
    ph0 = t["phash"][0].as_py()
    extra = pa.table(
        {
            "image_id": pa.array(["zz01", "zz02"], pa.string()),
            "bytes": pa.array([t["bytes"][0].as_py()] * 2, pa.binary()),
            "w": pa.array([t["w"][0].as_py()] * 2, pa.int32()),
            "h": pa.array([t["h"][0].as_py()] * 2, pa.int32()),
            "fmt": pa.array([t["fmt"][0].as_py()] * 2, pa.string()),
            "caption": pa.array(["c1", "c2"], pa.string()),
            "phash": pa.array(
                [int(np.int64(np.uint64(np.uint64(ph0) ^ np.uint64(0b101)))), ph0],
                pa.int64(),
            ),
        }
    )
    full = pa.concat_tables([t, extra])
    ds = ray.data.from_arrow(full).repartition(3)
    pairs = phash_near_pairs(ds, max_hamming=4).to_pandas()
    pairset = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    id0 = t["image_id"][0].as_py()
    assert tuple(sorted((id0, "zz02"))) in pairset  # exact dup
    assert tuple(sorted((id0, "zz01"))) in pairset  # 2-bit flip
    kept = set(near_dedup_images(ds, max_hamming=4).to_pandas()["image_id"])
    assert "zz01" not in kept and "zz02" not in kept and id0 in kept
    # forced-distributed component path (surrogate label prop + min-name
    # recovery joins) must produce the identical surviving set
    kept_d = set(
        near_dedup_images(ds, max_hamming=4, driver_max_pairs=0)
        .to_pandas()["image_id"]
    )
    assert kept_d == kept


def test_image_transform_stage(ray_session):
    import ray.data

    from lulu_crawler_ray.functions.imagecodec import decode
    from lulu_crawler_ray.pipelines.images_pipe import ImageTransform, build_image_fixture

    ds = ray.data.from_arrow(build_image_fixture(12)).repartition(2)
    out = ds.map_batches(
        ImageTransform, batch_format="pyarrow", batch_size=4, concurrency=2
    ).to_pandas()
    assert len(out) == 12
    assert (out["w"] == 32).all() and (out["fmt"] == "png").all()
    img = decode(out["bytes"][0], "png")
    assert img.shape == (32, 32, 3)


# ---------------------------------------------------------------- multimodal
def _audio_table():
    from lulu_crawler_ray.stages.multimodal import AUDIO_SCHEMA

    return pa.Table.from_pydict(
        {
            "media_id": ["a1", "a2"],
            "bytes": [b"fake-audio-1", b"fake-audio-2"],
            "codec": ["mp3", "mp3"],  # non-WAV -> the deterministic-fake seam (wav decodes for real now)
            "sample_rate": pa.array([8000, 8000], pa.int32()),
            "n_channels": pa.array([1, 1], pa.int32()),
        },
        schema=AUDIO_SCHEMA,
    )


def test_audio_stage_plumbing(ray_session):
    import ray.data

    from lulu_crawler_ray.stages.multimodal import AudioFeatureExtractor

    out = (
        ray.data.from_arrow(_audio_table())
        .map_batches(AudioFeatureExtractor, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert len(out) == 2 and len(out["features"][0]) == 16
    # deterministic fake: same bytes -> same features
    assert out["duration_s"][0] == 1.0


def test_audio_stub_raises():
    from lulu_crawler_ray.stages.multimodal import AudioFeatureExtractor

    ex = AudioFeatureExtractor(deterministic_fake=False)
    with pytest.raises(NotImplementedError):
        ex._decode_audio(b"x", "mp3")


def test_video_frame_sampler(ray_session):
    import ray.data

    from lulu_crawler_ray.functions.imagecodec import decode_png
    from lulu_crawler_ray.stages.multimodal import VIDEO_SCHEMA, VideoFrameSampler

    t = pa.Table.from_pydict(
        {
            "media_id": ["v1"],
            "bytes": [b"fake-video"],
            "codec": ["h264"],
            "fps": pa.array([30.0], pa.float32()),
            "n_frames": pa.array([25], pa.int32()),
        },
        schema=VIDEO_SCHEMA,
    )
    out = (
        ray.data.from_arrow(t)
        .map_batches(VideoFrameSampler, batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert list(out["frame_idx"]) == [0, 10, 20]
    assert decode_png(out["frame_png"][0]).shape == (16, 16, 3)


# ------------------------------------------------- batching independence
def test_grouped_agg_batch_independence(ray_session):
    import ray.data

    from lulu_crawler_ray.pipelines.relational import grouped_agg

    rng = np.random.default_rng(5)
    t = pa.table(
        {
            "k": pa.array(rng.choice(["a", "b", "c"], 1000)),
            "v": pa.array(rng.standard_normal(1000)),
        }
    )
    specs = [("n", "count", None), ("s", "sum", "v"), ("m", "mean", "v"), ("sd", "std", "v")]
    r1 = grouped_agg(ray.data.from_arrow(t).repartition(1), ["k"], specs).to_pandas()
    r8 = grouped_agg(ray.data.from_arrow(t).repartition(8), ["k"], specs).to_pandas()
    pd.testing.assert_frame_equal(
        r1.sort_values("k").reset_index(drop=True),
        r8.sort_values("k").reset_index(drop=True),
        check_exact=False,
        atol=1e-9,
    )


def test_connected_components_label_prop_vs_union_find(ray_session):
    import pandas as pd

    from lulu_crawler_ray.pipelines.components import (
        _label_propagation,
        _union_find,
        connected_components,
    )
    import ray.data

    rng = np.random.default_rng(9)
    # several chains + cliques + isolated pairs
    pairs = []
    base = 0
    for size in (2, 3, 5, 8, 4):
        nodes = list(range(base, base + size))
        pairs += [(nodes[i], nodes[i + 1]) for i in range(size - 1)]
        base += size + 3
    extra = rng.integers(1000, 1100, (30, 2))
    pairs += [(int(a), int(b)) for a, b in extra if a != b]
    df = pd.DataFrame(pairs, columns=["a", "b"])

    uf = _union_find(df)
    lp = _label_propagation(ray.data.from_pandas(df).repartition(3))
    lp_map = dict(zip(lp["node"].astype(int), lp["lbl"].astype(int)))
    assert set(uf) == set(lp_map)
    for n in uf:
        assert uf[n] == lp_map[n], f"node {n}: {uf[n]} != {lp_map[n]}"
    assert connected_components(df) == uf
    # forced-distributed path (driver_max_pairs=0 routes even a tiny
    # pair set through label propagation) must agree with union-find
    assert connected_components(df, driver_max_pairs=0) == uf


def test_phash_hot_bucket_second_level_banding_exact():
    """A planted hot band bucket: second-level banding must return
    EXACTLY the dense pairwise result (pigeonhole over max_hamming+1
    sub-bands is lossless)."""
    from lulu_crawler_ray.pipelines.images_pipe import _bucket_pairs

    rng = np.random.default_rng(9)
    n = 600
    base = np.int64(0x1234_5678_9ABC_DEF0)
    ph = []
    for i in range(n):
        v = np.uint64(base)
        # flip 0..12 random bits: some pairs within hamming 10, some not
        for b in rng.integers(0, 64, rng.integers(0, 13)):
            v ^= np.uint64(1) << np.uint64(b)
        ph.append(np.int64(v))
    ph = np.array(ph, np.int64)
    ids = np.array([f"img{i:05d}" for i in range(n)], dtype=object)

    dense = _bucket_pairs(ids, ph, max_hamming=10, hot_threshold=10_000)
    banded = _bucket_pairs(ids, ph, max_hamming=10, hot_threshold=100)  # forces hot path
    d = set(map(tuple, dense[["a", "b"]].itertuples(index=False)))
    s = set(map(tuple, banded[["a", "b"]].itertuples(index=False)))
    assert len(d) > 0
    assert d == s


def test_cosine_hot_group_blocking_recall():
    """A planted hot label group: hyperplane blocking must keep every
    emitted pair verified (no false positives) and find the planted
    near-identical pairs (high-cosine pairs share buckets whp)."""
    from lulu_crawler_ray.pipelines.annsearch import _cosine_group_pairs, _normalize

    rng = np.random.default_rng(4)
    n, dim = 800, 32
    m = rng.standard_normal((n, dim))
    # plant 20 near-dup pairs: rows 2i+1 = tiny perturbation of 2i
    for i in range(20):
        m[2 * i + 1] = m[2 * i] + 0.01 * rng.standard_normal(dim)
    m = _normalize(m)
    ids = np.arange(n, dtype=np.int64)

    dense = _cosine_group_pairs(ids, m, threshold=0.9, hot_threshold=10_000)
    blocked = _cosine_group_pairs(ids, m, threshold=0.9, hot_threshold=100)
    d = set(map(tuple, dense[["a", "b"]].itertuples(index=False)))
    s = set(map(tuple, blocked[["a", "b"]].itertuples(index=False)))
    assert s <= d  # every blocked pair is cosine-verified
    planted = {(2 * i, 2 * i + 1) for i in range(20)}
    assert planted <= d
    assert len(s & planted) >= 18  # recall >= 0.9 on planted near-identicals


def _clear_ann_artifacts():
    """Wipe the durable ANN artifact root AND every in-process index
    cache: the root is shared by the LSH/IVF/PQ families, so clearing
    only one family's cache leaves the others holding objects whose
    files are gone (observed: a warm _IVF_CACHE after the PQ test's
    clear crashed the per-cell-HNSW test's read_for)."""
    import shutil

    from lulu_crawler_ray.pipelines import annsearch as _an
    from lulu_crawler_ray.pipelines import pq as _pqm
    from lulu_crawler_ray.pipelines.annindex import _DEFAULT_ROOT

    _an._LSH_CACHE.clear()
    _an._IVF_CACHE.clear()
    _pqm._PQ_CACHE.clear()
    shutil.rmtree(_DEFAULT_ROOT, ignore_errors=True)


def test_lsh_index_built_once_for_two_query_calls(ray_session):
    from lulu_crawler_ray.pipelines import annsearch as an

    an._LSH_CACHE.clear()
    _clear_ann_artifacts()  # durable artifact would make build a pure load
    before = an.LshIndex.builds
    r1 = an.e_lsh_ann(SF).to_pandas()
    r2 = an.e_lsh_ann(SF, n_queries=2).to_pandas()
    assert an.LshIndex.builds == before + 1  # corpus hashed once
    assert len(r1) > 0 and len(r2) > 0
    # durability: a fresh index object on the sealed artifact loads
    # without re-hashing the corpus (builds unchanged) and answers
    # identically
    idx2 = an.LshIndex(SF)
    assert an.LshIndex.builds == before + 1
    qids, qm = an.load_queries(SF)
    import pandas as pd

    a = an._LSH_CACHE[list(an._LSH_CACHE)[0]].query(qids, qm).to_pandas()
    b = idx2.query(qids, qm).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_lsh_probe_reads_strict_shard_subset(ray_session):
    """The durable artifact prunes IO: a probe must read a strict,
    non-empty subset of the on-disk shard directories."""
    from lulu_crawler_ray.pipelines import annsearch as an

    idx = an.lsh_index(SF)
    qids, qm = an.load_queries(SF)
    out = idx.query(qids, qm).to_pandas()
    assert len(out) > 0
    touched = idx.artifact.last_probe_shards
    total = idx.artifact.num_shards_on_disk()
    assert 0 < len(touched) < total, (touched, total)


def test_ivf_ann_recall_and_single_build(ray_session):
    """IVF index: recall vs brute force at nprobe=4/16 (scan ~25%), and
    the kmeans+assign build runs once for two query calls."""
    from lulu_crawler_ray.pipelines import annsearch as an

    an._IVF_CACHE.clear()
    _clear_ann_artifacts()  # durable artifact would make build a pure load
    before = an.IvfIndex.builds
    exact = an.e_knn_bruteforce(SF).to_pandas()
    approx = an.e_ivf_ann(SF).to_pandas()
    _ = an.e_ivf_ann(SF, n_queries=2)
    assert an.IvfIndex.builds == before + 1
    # cross-session-shaped load: fresh object, sealed artifact -> no
    # rebuild, centroids restored from the artifact
    idx2 = an.IvfIndex(SF)
    assert an.IvfIndex.builds == before + 1
    import numpy as _np

    _np.testing.assert_allclose(
        idx2.centroids, an._IVF_CACHE[list(an._IVF_CACHE)[0]].centroids
    )
    # IO pruning: nprobe=4 of 16 centroid lists -> 4 shard dirs read
    qids, qm = an.load_queries(SF)
    idx2.query(qids, qm, nprobe=4)
    assert 0 < len(idx2.artifact.last_probe_shards) < idx2.artifact.num_shards_on_disk()
    recalls = []
    for q in exact["query_id"].unique():
        e = set(exact[exact.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, f"IVF recall too low: {recalls}"


def test_kmeans_deterministic_and_normalized(ray_session):
    from lulu_crawler_ray.pipelines.annsearch import kmeans_fit
    from lulu_crawler_ray.sources.testdata import read_table

    ds = read_table(SF, "embeddings", ["vec_id", "embedding"])
    c1 = kmeans_fit(ds, k=8, iters=3)
    c2 = kmeans_fit(ds, k=8, iters=3)
    assert np.array_equal(c1, c2)  # deterministic across runs
    norms = np.linalg.norm(c1, axis=1)
    assert np.allclose(norms, 1.0)


def test_wav_roundtrip_and_real_audio_stage(ray_session):
    """codec=wav decodes FOR REAL (stdlib wave): encode known PCM,
    run the actor-pool feature stage, check duration and RMS energies
    against the source signal."""
    import ray.data

    from lulu_crawler_ray.stages.multimodal import (
        AUDIO_SCHEMA,
        AudioFeatureExtractor,
        decode_wav_pcm,
        encode_wav_pcm16,
    )

    sr = 8000
    t_axis = np.arange(sr * 2, dtype=np.float32) / sr  # 2 seconds
    tone = (0.5 * np.sin(2 * np.pi * 440 * t_axis)).astype(np.float32)
    data = encode_wav_pcm16(tone, sr)
    back, sr2, nch = decode_wav_pcm(data)
    assert sr2 == sr and nch == 1
    assert np.abs(back - tone).max() < 1e-3  # 16-bit quantization only

    rows = pa.table(
        {
            "media_id": pa.array(["a1"]),
            "bytes": pa.array([data], pa.binary()),
            "codec": pa.array(["wav"]),
            "sample_rate": pa.array([sr], pa.int32()),
            "n_channels": pa.array([1], pa.int32()),
        },
        schema=AUDIO_SCHEMA,
    )
    out = (
        ray.data.from_arrow(rows)
        .map_batches(AudioFeatureExtractor, batch_format="pyarrow", batch_size=8, concurrency=1)
        .to_pandas()
    )
    assert abs(out["duration_s"][0] - 2.0) < 1e-6
    feats = np.array(out["features"][0])
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2) in every band
    assert np.allclose(feats, 0.5 / np.sqrt(2), atol=0.01)


def test_wav_stereo_downmix():
    from lulu_crawler_ray.stages.multimodal import decode_wav_pcm, encode_wav_pcm16

    sr = 4000
    left = np.full(sr, 0.4, np.float32)
    right = np.full(sr, -0.4, np.float32)
    inter = np.stack([left, right], axis=1)
    data = encode_wav_pcm16(inter, sr, n_channels=2)
    mono, sr2, nch = decode_wav_pcm(data)
    assert nch == 2 and sr2 == sr
    assert np.abs(mono).max() < 1e-3  # L+R cancel after downmix


def test_prep_pipeline_end_to_end(ray_session):
    """The composed prep pipeline: survivors are a subset of documents,
    gates actually remove rows, and the per-language summary counts
    match a direct recomputation of the surviving set."""
    from lulu_crawler_ray.pipelines.textops import t_prep_pipeline

    out = t_prep_pipeline(SF).to_pandas()
    assert len(out) >= 1
    assert set(out.columns) == {"lang", "n_docs", "sum_tokens"}
    import duckdb

    total_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert 0 < out["n_docs"].sum() < total_docs  # gates + dedup removed rows
    assert (out["n_docs"] > 0).all() and (out["sum_tokens"] > 0).all()


def test_near_dedup_empty_docs_are_duplicates(ray_session):
    """jaccard(∅, ∅) = 1.0: token-less docs (empty/whitespace) must
    dedup to one survivor through the distributed verify path."""
    import ray.data

    from lulu_crawler_ray.pipelines.textops import near_dedup_minhash

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([" ", "\t", "normal document text here we go", ""]),
        }
    )
    kept = set(near_dedup_minhash(ray.data.from_arrow(t), threshold=0.7).to_pandas()["doc_id"])
    assert 3 in kept
    assert len(kept & {1, 2, 4}) == 1  # the three token-less docs collapse


def test_cosine_neardup_strict_raises_on_hot_group(ray_session):
    from lulu_crawler_ray.pipelines import annsearch as an

    with pytest.raises(Exception, match="hot_group_threshold"):
        an.e_cosine_neardup(SF, hot_group_threshold=10, strict=True)
    # the explicit blocked variant runs and stays a subset of exact
    blocked = an.e_cosine_neardup_blocked(SF, hot_group_threshold=10).to_pandas()
    exact = an.e_cosine_neardup(SF).to_pandas()
    b = set(map(tuple, blocked[["a", "b"]].itertuples(index=False)))
    e = set(map(tuple, exact[["a", "b"]].itertuples(index=False)))
    assert b <= e


def test_lsh_ann_returns_distinct_full_k(ray_session):
    """The exploded multi-table index must not let duplicate
    (vector, table) rows crowd distinct candidates out of the k slots."""
    from lulu_crawler_ray.pipelines import annsearch as an

    an._LSH_CACHE.clear()
    out = an.e_lsh_ann(SF).to_pandas()
    for q, g in out.groupby("query_id"):
        assert g["neighbor_id"].is_unique
        assert len(g) == 10, f"query {q} returned {len(g)} < k distinct neighbors"


def test_simhash_neardup_vs_bruteforce(ray_session):
    """Band-joined simhash pairs vs the all-pairs oracle: every found
    pair verified <= max_hamming (subset), and every pair <= 3 flips
    found (pigeonhole exactness over 4 bands)."""
    from lulu_crawler_ray.pipelines.textops import t_simhash_neardup

    found = t_simhash_neardup(SF, max_hamming=6).to_pandas()
    f = set(map(tuple, found[["a", "b"]].itertuples(index=False)))

    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    sh = {d: tx.simhash64(t) for d, t in rows}
    ids = sorted(sh)
    close3, close6 = set(), set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = hamming64(sh[a], sh[b])
            if d <= 6:
                close6.add((a, b))
                if d <= 3:
                    close3.add((a, b))
    assert f <= close6  # every emitted pair is verified
    assert close3 <= f  # exact for <= 3 flips


def test_avi_roundtrip_and_real_video_stage(ray_session):
    """codec=avi decodes FOR REAL: encode known RGB frames into an
    uncompressed RIFF/DIB AVI (odd width exercises 4-byte row padding),
    roundtrip pixel-exact, then frame-sample through the actor stage."""
    import ray.data

    from lulu_crawler_ray.functions.imagecodec import decode_png
    from lulu_crawler_ray.stages.multimodal import (
        VIDEO_SCHEMA,
        VideoFrameSampler,
        decode_avi_rgb24,
        encode_avi_rgb24,
    )

    rng = np.random.default_rng(6)
    frames = [rng.integers(0, 256, (12, 11, 3), np.uint8) for _ in range(7)]  # w=11: padded stride
    data = encode_avi_rgb24(frames, fps=5)
    back, fps = decode_avi_rgb24(data)
    assert fps == 5.0 and len(back) == 7
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)

    rows = pa.table(
        {
            "media_id": pa.array(["v1"]),
            "bytes": pa.array([data], pa.binary()),
            "codec": pa.array(["avi"]),
            "fps": pa.array([5.0], pa.float32()),
            "n_frames": pa.array([7], pa.int32()),
        },
        schema=VIDEO_SCHEMA,
    )
    out = (
        ray.data.from_arrow(rows)
        .map_batches(VideoFrameSampler, fn_constructor_kwargs={"every_k": 3},
                     batch_format="pyarrow", concurrency=1)
        .to_pandas()
    )
    assert list(out["frame_idx"]) == [0, 3, 6]
    px = decode_png(out["frame_png"][0])
    assert np.array_equal(px, frames[0])


def test_g8_approx_quantile_accuracy(ray_session):
    """Histogram-sketch grouped median within bucket-width error of the
    exact per-group median."""
    import duckdb

    from lulu_crawler_ray.pipelines.relational import g8_approx_quantile

    approx = {
        r["l_returnflag"]: r["approx_quantile"]
        for r in g8_approx_quantile(SF).to_pylist()
    }
    exact = dict(
        duckdb.sql(
            f"SELECT l_returnflag, median(l_extendedprice) "
            f"FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1"
        ).fetchall()
    )
    rng = dict(
        duckdb.sql(
            f"SELECT l_returnflag, MAX(l_extendedprice)-MIN(l_extendedprice) "
            f"FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1"
        ).fetchall()
    )
    assert set(approx) == set(exact)
    for g in exact:
        tol = rng[g] / 4096 + 0.01
        assert abs(approx[g] - exact[g]) <= 2 * tol, (g, approx[g], exact[g])


def test_pq_ann_recall_compression_durability(ray_session):
    """Product quantization: ADC over the durable codes artifact +
    exact re-rank reaches near-exact recall; codes are 32x smaller than
    the raw embedding column; the build runs once and a fresh object
    loads the sealed artifact without rebuilding."""
    import glob
    import os

    from lulu_crawler_ray.pipelines import pq as pqm
    from lulu_crawler_ray.pipelines import annsearch as an

    pqm._PQ_CACHE.clear()
    _clear_ann_artifacts()
    before = pqm.PqIndex.builds
    exact = an.e_knn_bruteforce(SF).to_pandas()
    approx = pqm.e_pq_ann(SF).to_pandas()
    assert list(approx.columns) == ["query_id", "neighbor_id", "rnk"]
    assert pqm.PqIndex.builds == before + 1
    _ = pqm.e_pq_ann(SF)  # session cache: no rebuild
    assert pqm.PqIndex.builds == before + 1
    recalls = []
    for q in exact["query_id"].unique():
        e = set(exact[exact.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        assert len(a) == 10
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, f"PQ+rerank recall too low: {recalls}"
    # compression: M=16 one-byte codes vs 64 float64s = 32x on payload
    idx = pqm._PQ_CACHE[list(pqm._PQ_CACHE)[0]]
    n_rows = 500
    code_payload = idx.m * n_rows
    raw_payload = 64 * 8 * n_rows
    assert raw_payload / code_payload == 32.0
    # the artifact on disk really is code-sized, not corpus-sized
    codes_bytes = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(idx.root, "codes", "*.parquet"))
    )
    assert codes_bytes < raw_payload / 4
    # cross-session-shaped load: fresh object, sealed manifest -> pure load
    idx2 = pqm.PqIndex(SF, m_subspaces=16, ks=128)
    assert pqm.PqIndex.builds == before + 1
    np.testing.assert_allclose(idx2.codebooks, idx.codebooks)


def test_pq_adc_only_recall(ray_session):
    """The pure ADC path (no exact re-rank — nothing but codes is ever
    read) still recovers most of the exact top-k."""
    from lulu_crawler_ray.pipelines import pq as pqm
    from lulu_crawler_ray.pipelines import annsearch as an

    exact = an.e_knn_bruteforce(SF).to_pandas()
    idx = pqm.pq_index(SF)
    qids, qm = an.load_queries(SF)
    approx = idx.query(qids, qm, 10, rerank_expand=0).to_pandas()
    recalls = []
    for q in exact["query_id"].unique():
        e = set(exact[exact.query_id == q]["neighbor_id"])
        a = set(approx[approx.query_id == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, f"ADC-only recall too low: {recalls}"


def test_img_similar_matches_bruteforce(ray_session):
    """phash top-k search equals a numpy brute-force recompute (dist
    asc, image_id asc ties, self excluded)."""
    from lulu_crawler_ray.functions.phash import hamming64_vec
    from lulu_crawler_ray.pipelines.images_pipe import (
        build_image_fixture,
        img_similar_query,
    )

    got = img_similar_query(SF, k=5).to_pandas()
    t = build_image_fixture(300)
    ids = np.asarray(t["image_id"].to_pylist(), object)
    ph = t["phash"].to_numpy().astype(np.int64)
    q = build_image_fixture(3)
    for j in range(3):
        qid = q["image_id"][j].as_py()
        d = hamming64_vec(ph, np.full(len(ph), q["phash"][j].as_py()))
        keep = np.flatnonzero(ids != qid)
        order = keep[np.lexsort((ids[keep], d[keep]))][:5]
        sub = got[got.query_id == qid].sort_values("rnk")
        assert list(sub["neighbor_id"]) == list(ids[order])
        assert list(sub["dist"]) == list(d[order])


def test_video_scene_cuts_exact(ray_session):
    """Scene-cut detection through real AVI decode: exactly the planted
    cut (frame 6) per video; smooth drift never crosses the threshold;
    diff magnitude matches a numpy recompute on the decoded frames."""
    from lulu_crawler_ray.pipelines.images_pipe import video_scenes_query

    got = video_scenes_query(SF).to_pandas()
    assert list(got["media_id"]) == ["s000", "s001", "s002"]
    assert list(got["cut_idx"]) == [6, 6, 6]
    # recompute the diff for one video
    from lulu_crawler_ray.stages.multimodal import decode_avi_rgb24, encode_avi_rgb24

    frames = []
    for k in range(12):
        scene = k // 6
        base = (np.indices((16, 16)).sum(axis=0) * 1 + k) % 64
        frames.append((base + scene * 128)[:, :, None].astype(np.uint8).repeat(3, axis=2) % 256)
    dec, _ = decode_avi_rgb24(encode_avi_rgb24(frames, fps=6))
    d = np.abs(np.diff(np.stack(dec).astype(np.int16), axis=0)).mean(axis=(1, 2, 3))
    assert int(np.rint(d[5] * 10000)) == got[got.media_id == "s000"]["diff_e4"].iloc[0]


def test_audio_segments_exact(ray_session):
    """Energy-VAD segments through real WAV decode: each fixture's
    tone bursts (200ms on / 200ms off) come back as exactly (i+2)
    segments with 200ms-aligned boundaries."""
    from lulu_crawler_ray.pipelines.images_pipe import audio_segments_query

    got = audio_segments_query(SF).to_pandas()
    for i in range(3):
        sub = got[got.media_id == f"a{i:03d}"]
        assert len(sub) == i + 2, sub
        for j, (_, r) in enumerate(sub.iterrows()):
            assert r["start_ms"] == j * 400
            assert r["end_ms"] == j * 400 + 200


def test_heavy_hitters_mg_compression_exact(tmp_path, ray_session):
    """Force the Misra-Gries compression path (vocab >> k) and check
    the two-pass output is still EXACT: k >= phi_inv guarantees every
    true heavy hitter survives the per-block decrement, and pass 2
    recounts candidates exactly."""
    import collections

    import pyarrow.parquet as pq

    from lulu_crawler_ray.pipelines.textops import t_heavy_hitters

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(500)]
    docs = []
    for d in range(200):
        # Zipf-ish: low ids much more frequent
        ids = (rng.pareto(1.2, 40) * 3).astype(int) % 500
        docs.append(" ".join(vocab[i] for i in ids))
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()), "text": pa.array(docs)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    got = (
        t_heavy_hitters(str(tmp_path), phi_inv=10, k=14)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    cnt = collections.Counter(w for d in docs for w in d.split())
    n = sum(cnt.values())
    want = sorted((w, c) for w, c in cnt.items() if c * 10 > n)
    assert list(map(tuple, got[["term", "cnt"]].itertuples(index=False))) == want
    assert len(want) > 0  # the test is vacuous if nothing is heavy


def test_grouped_hll_accuracy(ray_session):
    """g14 per-group HLL within ±3% of exact per-group distinct."""
    import duckdb

    from lulu_crawler_ray.pipelines.relational import g14_grouped_hll

    got = (
        g14_grouped_hll("/root/testdata/sf0.01")
        .to_pandas()
        .set_index("l_returnflag")["approx_distinct_parts"]
    )
    want = (
        duckdb.connect()
        .execute(
            "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n FROM "
            "read_parquet('/root/testdata/sf0.01/lineitem.parquet') GROUP BY 1"
        )
        .df()
        .set_index("l_returnflag")["n"]
    )
    assert set(got.index) == set(want.index)
    for k in want.index:
        assert abs(got[k] - want[k]) / want[k] < 0.03, (k, got[k], want[k])


def test_img_prep_pipeline_golden(ray_session):
    """Composed image-curation pipeline: validate -> resolution/aspect
    gate -> phash near-dedup -> integer digest, pinned to the exact
    deterministic fixture values (any kernel drift breaks the xor)."""
    from lulu_crawler_ray.pipelines.images_pipe import img_prep_pipeline_query

    t = img_prep_pipeline_query("/root/testdata/sf0.001").to_pydict()
    assert t == {
        "n_in": [300],
        "n_gated": [171],
        "n_kept": [170],
        "sum_w": [13696],
        "sum_h": [13440],
        "phash_xor": [8130959070006389008],
    }


def test_bpe_pinned_merges_reproduce():
    """The shipped merge table must equal deterministic retraining on
    the sf0.001 corpus — the constant can't silently drift."""
    import pyarrow.parquet as pq
    from lulu_crawler_ray.functions.bpe import MERGES_SF0001, train_bpe

    texts = pq.read_table("/root/testdata/sf0.001/documents.parquet")["text"].to_pylist()
    assert train_bpe(texts, 40) == MERGES_SF0001


def test_bpe_tokenize_semantics():
    """Greedy leftmost merge application, boundary safety, repeats."""
    from lulu_crawler_ray.functions.bpe import bpe_token_count, bpe_tokenize

    merges = [("a", "r"), ("p", "ar")]
    assert bpe_tokenize("par", merges) == ["par"]          # chained merge
    assert bpe_tokenize("arar", merges) == ["ar", "ar"]    # repeat, both merge
    assert bpe_tokenize("spar", merges) == ["s", "par"]    # s,p,a,r -> s,p,ar -> s,par
    assert bpe_token_count("", merges) == 0
    # mid-token false positive must NOT fire: token 'pa' + 'r' stays
    # split because '<pa><r>' does not contain '<a><r>'
    m2 = [("p", "a"), ("a", "r")]
    assert bpe_tokenize("par", m2) == ["pa", "r"]


def test_wav_24bit_and_float32_decode():
    """Round-5: the real-web WAV variants — 24-bit integer PCM (stdlib
    wave container) and IEEE-float32 (format tag 3, which stdlib wave
    refuses; manual RIFF walk) — must decode to the same mono float
    contract as 16-bit PCM."""
    import struct

    import numpy as np

    from lulu_crawler_ray.stages.multimodal import decode_wav_pcm

    sr = 8000
    t = np.arange(sr // 4, dtype=np.float64) / sr
    ref = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float64)

    # 24-bit PCM via a hand-assembled RIFF (stdlib wave writes it too,
    # but assembling keeps the byte layout explicit)
    v = np.rint(ref * 8388607.0).astype(np.int32)
    b = np.empty((len(v), 3), np.uint8)
    b[:, 0] = v & 0xFF
    b[:, 1] = (v >> 8) & 0xFF
    b[:, 2] = (v >> 16) & 0xFF
    payload = b.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 3, 3, 24)
    wav24 = (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    x, got_sr, nch = decode_wav_pcm(wav24)
    assert got_sr == sr and nch == 1
    assert np.abs(x - ref).max() < 1e-5

    # float32 (format tag 3), stereo -> downmixed mono
    st = np.stack([ref, -ref], axis=1).astype("<f4")
    payload = st.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 2, sr, sr * 8, 8, 32)
    wavf = (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    x, got_sr, nch = decode_wav_pcm(wavf)
    assert got_sr == sr and nch == 2
    assert np.abs(x).max() < 1e-6  # L/-L downmix cancels exactly


def test_wav_g711_ulaw_alaw_decode():
    """G.711 telephony WAVs (format tags 6 A-law / 7 mu-law): the
    in-repo segment-formula tables must match stdlib audioop (CPython's
    g711.c) byte-for-byte over ALL 256 codes, and the RIFF walk must
    route the tags."""
    import struct

    import audioop
    import numpy as np

    from lulu_crawler_ray.stages.multimodal import _g711_tables, decode_wav_pcm

    mu, al = _g711_tables()
    codes = bytes(range(256))
    want_mu = np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2")
    want_al = np.frombuffer(audioop.alaw2lin(codes, 2), "<i2")
    assert np.array_equal(mu, want_mu)
    assert np.array_equal(al, want_al)
    # known anchors: 0xFF is mu-law digital silence; A-law 0x55 = -8
    assert mu[0xFF] == 0 and al[0x55] == -8 and al[0xD5] == 8

    sr = 8000
    for tag, table in ((7, mu), (6, al)):
        fmt = struct.pack("<HHIIHH", tag, 1, sr, sr, 1, 8)
        wav = (
            b"RIFF" + struct.pack("<I", 36 + 256) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 256) + codes
        )
        x, got_sr, nch = decode_wav_pcm(wav)
        assert got_sr == sr and nch == 1
        assert np.allclose(x, table.astype(np.float32) / 32768.0)


def test_mjpeg_avi_roundtrip_and_stages(ray_session):
    """Round-5: MJPEG-in-AVI (fourcc MJPG, one standalone JPEG per
    frame) decodes through the in-repo T.81 codec — PSNR gate per
    frame — and flows the VideoFrameSampler / SceneCutDetector stages
    exactly like uncompressed AVI."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lulu_crawler_ray.stages.multimodal import (
        SceneCutDetector,
        VideoFrameSampler,
        decode_avi_rgb24,
        encode_avi_mjpeg,
    )

    gy, gx = np.mgrid[0:32, 0:40]
    frames = []
    for k in range(12):
        scene = k // 6  # hard cut at frame 6
        img = np.stack(
            [(gy * 3 + k) % 64 + scene * 128, (gx * 5) % 64, (gy + gx) % 64], -1
        ).astype(np.uint8)
        frames.append(img)
    data = encode_avi_mjpeg(frames, fps=6, quality=92)
    out, _fps = decode_avi_rgb24(data)
    assert len(out) == 12
    for a, b in zip(frames, out):
        mse = float(((a.astype(float) - b.astype(float)) ** 2).mean())
        assert mse == 0 or 10 * np.log10(255 * 255 / mse) >= 35.0

    t = pa.table(
        {
            "media_id": pa.array(["m0"]),
            "bytes": pa.array([data], pa.binary()),
            "codec": pa.array(["avi"]),
            "fps": pa.array([6.0], pa.float32()),
            "n_frames": pa.array([12], pa.int32()),
        }
    )
    ds = ray.data.from_arrow(t)
    sampled = ds.map_batches(
        VideoFrameSampler, fn_constructor_kwargs={"every_k": 4},
        batch_format="pyarrow", concurrency=1,
    ).to_pandas()
    assert list(sampled["frame_idx"]) == [0, 4, 8]
    cuts = ds.map_batches(
        SceneCutDetector, batch_format="pyarrow", concurrency=1
    ).to_pandas()
    assert 6 in list(cuts["cut_idx"])  # the planted hard cut survives MJPEG


def test_bpe_train_distributed_equals_driver(ray_session):
    """The distributed trainer (word-count reduction + worker merge
    loop) must reproduce the driver-side train_bpe on the same corpus —
    this also keeps t_bpe_train's VALUES-form oracle pin honest."""
    import duckdb

    from lulu_crawler_ray.functions.bpe import train_bpe
    from lulu_crawler_ray.pipelines.textops3 import t_bpe_train

    sf = "/root/testdata/sf0.01"
    texts = (
        duckdb.sql(
            f"SELECT text FROM read_parquet('{sf}/documents.parquet') ORDER BY doc_id"
        )
        .df()
        .text.tolist()
    )
    want = train_bpe(texts, 40)
    got = t_bpe_train(sf).to_pandas()
    got_pairs = list(zip(got["left_sym"], got["right_sym"]))
    assert got_pairs == want
    assert got["merge_rank"].tolist() == list(range(40))


def test_hnsw_ann_recall_and_determinism(ray_session):
    """Deterministic HNSW: two runs identical; recall vs exact
    brute-force top-k >= 0.9 at ef=64 on the sf0.01 corpus."""
    from lulu_crawler_ray.pipelines.annsearch import e_hnsw_ann, e_knn_bruteforce

    sf = "/root/testdata/sf0.01"
    h1 = e_hnsw_ann(sf).to_pandas()
    h2 = e_hnsw_ann(sf).to_pandas()
    assert h1.equals(h2)
    ex = e_knn_bruteforce(sf).to_pandas()
    recalls = []
    for q in ex.query_id.unique():
        e = set(ex[ex.query_id == q].neighbor_id)
        a = set(h1[h1.query_id == q].neighbor_id)
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.9, f"HNSW recall too low: {recalls}"


def test_hnsw_ivf_recall_and_determinism(ray_session):
    """Per-IVF-cell HNSW (the scale path): deterministic, and recall
    matches the IVF routing ceiling — the graph search inside a probed
    cell must not lose neighbors the exact cell scan would find."""
    from lulu_crawler_ray.pipelines.annsearch import (
        e_hnsw_ivf_ann,
        e_ivf_ann,
        e_knn_bruteforce,
    )

    sf = "/root/testdata/sf0.01"
    h1 = e_hnsw_ivf_ann(sf).to_pandas()
    h2 = e_hnsw_ivf_ann(sf).to_pandas()
    assert h1.equals(h2)
    ex = e_knn_bruteforce(sf).to_pandas()
    ivf = e_ivf_ann(sf).to_pandas()
    for q in ex.query_id.unique():
        e = set(ex[ex.query_id == q].neighbor_id)
        g = set(h1[h1.query_id == q].neighbor_id)
        c = set(ivf[ivf.query_id == q].neighbor_id)
        assert len(e & g) / len(e) >= len(e & c) / len(e) - 0.101, q


def test_index_artifact_recovers_from_interrupted_cleanup(ray_session, tmp_path):
    """A sealed manifest whose data/ directory vanished (interrupted
    rmtree from a killed process) must be treated as a partial build
    and rebuilt, not trusted and crashed on first probe."""
    import os
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from lulu_crawler_ray.pipelines.annindex import BucketIndexArtifact

    root = str(tmp_path / "idx")

    def build():
        return rd.from_arrow(
            pa.table({"bucket": pa.array([0, 1, 2, 3], pa.int64()),
                      "v": pa.array([10, 11, 12, 13], pa.int64())})
        )

    art, built = BucketIndexArtifact.build_or_load(
        root, "d1", "bucket", build, n_shards=2, identity=True
    )
    assert built and art.num_shards_on_disk() == 2
    # simulate the interrupted cleanup: data/ gone, manifest intact
    shutil.rmtree(os.path.join(root, "data"))
    assert os.path.exists(os.path.join(root, "manifest.json"))
    art2, built2 = BucketIndexArtifact.build_or_load(
        root, "d1", "bucket", build, n_shards=2, identity=True
    )
    assert built2, "corrupt artifact must rebuild"
    assert art2.num_shards_on_disk() == 2
