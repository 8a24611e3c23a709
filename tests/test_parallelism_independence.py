"""SURVEY.md §5.2.5 — the same crawl at num_cpus=2 and num_cpus=8 in
FRESH processes must produce identical T4/T5 hashes (the determinism
leg of the N-vs-4N scaling evidence; BASELINE.json:6)."""

import hashlib
import subprocess
import sys
import textwrap


def _run(ncpu: int, out: str, extra_cfg: str = "") -> str:
    code = textwrap.dedent(f"""
        import hashlib, ray
        import pyarrow.compute as pc
        import pyarrow.dataset as pads
        ray.init(address="local", num_cpus={ncpu}, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        from lulu_crawler_ray.config import CrawlConfig, seed_urls
        from lulu_crawler_ray.pipelines.crawl import run_crawl
        from lulu_crawler_ray.state.seen import load_seen
        cfg = CrawlConfig(seed=21, budget=4, max_depth=3, max_urls=800,
                          n_hosts=15, num_shards=4{extra_cfg})
        run_crawl(seed_urls(cfg, 8), cfg, {out!r})
        led = pads.dataset({out!r} + "/ledger", format="parquet").to_table()
        led = led.take(pc.sort_indices(led, sort_keys=[("rank", "ascending")]))
        seen = load_seen({out!r})
        h = hashlib.sha256()
        h.update("".join(led["url"].to_pylist()).encode())
        for k in seen["url_sha1"].to_pylist():
            h.update(k)
        print("HASH", h.hexdigest())
        ray.shutdown()
    """)
    out_text = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True,
        timeout=300,
    ).stdout
    return [l for l in out_text.splitlines() if l.startswith("HASH")][0]


def test_identical_output_across_parallelism(tmp_path):
    h2 = _run(2, str(tmp_path / "c2"))
    h8 = _run(8, str(tmp_path / "c8"))
    assert h2 == h8


def test_distributed_hot_split_path_parallelism_independent(tmp_path):
    """The forced distributed selection with hot-domain splitting must
    also be a pure function of (seeds, config) — identical T4/T5 hashes
    at 2 vs 8 CPUs through the salted groupby + seq-broadcast path."""
    extra = ", driver_select_max=0, hot_host_threshold=3"
    h2 = _run(2, str(tmp_path / "d2"), extra)
    h8 = _run(8, str(tmp_path / "d8"), extra)
    assert h2 == h8


def _run_queries_hash(ncpu: int) -> str:
    """Hash of the concatenated, canonically-sorted outputs of the
    round-3 iterative/prefix-scan ops — the ones whose determinism
    depends on block structure (kmeans iterations, gram-matrix fold,
    pack's prefix scan, lm-score's broadcast model)."""
    code = textwrap.dedent(f"""
        import hashlib, ray
        ray.init(address="local", num_cpus={ncpu}, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        from lulu_crawler_ray.pipelines.kmeans import e_kmeans_int
        from lulu_crawler_ray.pipelines.annsearch import e_gram_topk
        from lulu_crawler_ray.pipelines.textops import t_pack, t_lm_score
        sf = "/root/testdata/sf0.01"
        h = hashlib.sha256()
        for fn in (e_kmeans_int, e_gram_topk, t_pack, t_lm_score):
            df = fn(sf).to_pandas()
            df = df[sorted(df.columns)].sort_values(list(sorted(df.columns)))
            h.update(df.to_csv(index=False).encode())
        print("QHASH", h.hexdigest())
        ray.shutdown()
    """)
    out_text = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True,
        timeout=420,
    ).stdout
    return [l for l in out_text.splitlines() if l.startswith("QHASH")][0]


def test_iterative_ops_parallelism_independent():
    """e_kmeans_int / e_gram_topk / t_pack / t_lm_score are exact-
    integer contracts: 2 CPUs and 16 CPUs (different block counts,
    different partial-fold orders) must produce byte-identical
    results."""
    assert _run_queries_hash(2) == _run_queries_hash(16)
