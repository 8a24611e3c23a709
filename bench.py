"""Benchmark harness (BASELINE.md protocol).

Plain run: executes the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default
32) and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "crawl": {"urls": U, "urls_per_sec": ..., "image_rows": I,
               "img_rows_per_sec": ..., "t4_t5_hash": ...}}

--scaling: runs the same bench twice in FRESH processes at num_cpus=8
and num_cpus=32 on the same input (the sandbox form of the N vs 4N
cluster-size criterion, BASELINE.json:14) and prints throughput at both
plus scaling efficiency; asserts the two runs' crawl T4/T5 hashes match
(the determinism leg).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time
from lulu_crawler_ray.state.seen import load_seen


def _crawl_bench(out_root: str, big: bool = False) -> dict:
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from lulu_crawler_ray.config import CrawlConfig, seed_urls
    from lulu_crawler_ray.pipelines.crawl import run_crawl

    if big:
        # scaling-mode config: ~3x the scalable work of the headline
        # crawl so the fixed per-wave term (~13 s: barriers, finalize
        # tasks, seals) reflects its weight at the 10^10 design point
        # rather than dominating a small run (BASELINE.md "scaling
        # protocol")
        cfg = CrawlConfig(
            seed=42, budget=24, max_depth=5, max_urls=2_500_000, n_hosts=40_000,
            num_shards=16, fetch_concurrency=8,
        )
        n_seeds = 40_000
    else:
        cfg = CrawlConfig(
            seed=42, budget=16, max_depth=4, max_urls=500_000, n_hosts=30_000,
            num_shards=16, fetch_concurrency=8,
        )
        n_seeds = 30_000
    out = os.path.join(out_root, "crawl")
    t0 = time.time()
    res = run_crawl(seed_urls(cfg, n_seeds), cfg, out)
    wall = time.time() - t0
    urls = res["metrics"]["ranks"]
    imgs = res["metrics"].get("images", 0)
    led = pads.dataset(f"{out}/ledger", format="parquet").to_table()
    led = led.take(pc.sort_indices(led, sort_keys=[("rank", "ascending")]))
    seen = load_seen(out)
    imgs_n = pads.dataset(f"{out}/waves", format="parquet").count_rows()
    h = hashlib.sha256()
    h.update("".join(led["url"].to_pylist()).encode())
    for k in seen["url_sha1"].to_pylist():
        h.update(k)
    return {
        "sec": round(wall, 3),
        "urls": urls,
        "urls_per_sec": round(urls / wall, 1),
        "image_rows": imgs_n,
        "img_rows_per_sec": round(imgs_n / wall, 1),
        "waves": res["metrics"]["waves"],
        "t4_t5_hash": h.hexdigest()[:16],
    }


def _consume(res) -> int:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_format="pyarrow", batch_size=65536):
            n += b.num_rows
        return n
    if isinstance(res, pa.Table):
        return res.num_rows
    return len(res)


def run_bench() -> dict:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=num_cpus, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import __ray_entry__ as entrymod

    qfns = entrymod.queries()
    bench_queries = [
        "q1_pricing_summary", "g1_groupby_count", "g4_hll_distinct",
        "j2_inner_join", "j3_broadcast_lookup", "o2_topk", "d1_first_by_key",
        "m6_filter_project", "w1_window_agg", "t_exact_dedup",
        "t_minhash_pairs", "t_token_count", "e_knn_bruteforce",
        "img_neardup_pairs",
    ]
    # warm the OS page cache so we measure compute + shuffle, not cold disk
    warm = qfns["g1_groupby_count"](sf)
    _consume(warm)

    out_root = os.environ.get("GRAFT_BENCH_OUT", "/tmp/lulu_ray_bench")
    if os.path.exists(out_root):
        shutil.rmtree(out_root)
    os.makedirs(out_root)

    times: dict[str, float] = {}
    t_all = time.time()
    # queries first (clean object store), then the crawl
    for name in bench_queries:
        t0 = time.time()
        _consume(qfns[name](sf))
        times[name] = round(time.time() - t0, 3)
    crawl = _crawl_bench(out_root, big=os.environ.get("GRAFT_SCALING_CRAWL") == "1")
    times["crawl"] = crawl["sec"]
    total = round(time.time() - t_all, 3)

    # round-4 additions timed OUTSIDE the headline total so `value`
    # stays comparable across rounds (the headline set is frozen)
    extra_queries = [
        "t_bpe_real", "t_prep_v3", "t_intradoc_repeats", "g20_quantile_hist",
        "g21_cms_registers", "g22_grouped_hll_registers", "j8_range_join",
        "j9_salted_join", "o8_percent_rank", "s11_pushdown_scan",
        "img_jpeg_pipeline", "x3_components", "img_blur_scores",
    ]
    # round-5 additions, same discipline: timed outside the frozen total
    extra_queries_r5 = [
        "img_jpeg_digest", "img_blur_digest", "audio_digest", "video_digest",
        "t_near_dedup", "q18_large_orders", "q16_supplier_cnt",
        "t_dupspans", "e_semdedup", "t_prep_v4",
        "g24_skew_kurt", "g25_entropy", "o10_weighted_sample",
        "m17_gaps_islands", "d9_except_all", "img_hash_variants_digest",
        "img_augment_digest", "x4_kcore",
        # continuation-session ops
        "x5_bfs", "t_pmi_bigrams", "g26_argmax", "g27_median",
        "audio_flac_digest",
        "t_ngram_novelty", "t_dsir_weights", "e_knn_graph",
        "w13_rolling_median", "j11_interval_join", "g28_chi2", "e_maxsim",
        "d10_intersect_all", "img_patchify_digest", "w15_daily_extremes",
        "w14_gap_fill", "g29_bitwise", "e_dim_stats", "e_cov_matrix",
        "e_whiten_digest", "w16_retention", "g30_zscore_outliers",
        "img_edge_digest", "w17_transitions", "img_otsu_digest",
        "img_blob_digest", "x6_sssp",
        "m19_regex_extract", "t_readability", "w18_ewm8",
        "g31_gini", "d11_edit_pairs", "w20_mad_outliers", "t_gopher_quality",
        "w21_path_mining", "w22_scd_intervals", "img_histeq_digest",
        "t_bpe_train", "s14_hive_roundtrip", "t_pii_redact",
        "j12_bloom_semi", "t_quality_clf", "img_resize_bilinear_digest",
        "img_trainprep_digest", "t_doc_embed", "x7_hits", "e_hnsw_ann",
        "s15_schema_evolution", "audio_resample_digest", "w19_windowed_topk",
        "video_clip_digest", "e_hnsw_ivf_ann", "t_prep_v5",
        "w23_cusum", "d12_entity_groups", "img_morph_digest",
        "img_rle_digest", "audio_wht_digest", "img_palette_digest",
        "img_shared_tiles_digest", "img_prep_v2", "audio_prep_v2", "video_prep_v2",
        "e_hard_negatives", "g32_quartiles", "s16_jsonl_gz_roundtrip",
        "e_mrl_overlap", "d13_upsert", "t_span_corruption", "m21_nfc_normalize", "w24_churn", "w25_autocorr",
        "d14_snapshot_diff", "j13_band_join", "w26_ohlc",
        "img_caption_align_digest", "img_ssim_digest", "audio_mfcc_digest",
        "t_source_sim", "x8_assortativity", "t_containment",
        "t_bm25", "x9_link_prediction", "e_rrf_fusion", "m20_url_parse",
        "s17_sitemap_seeds", "t_cluster_sizes", "e_inertia",
        "x10_clustering_coeff", "t_jaccard_histogram", "e_recall_eval",
    ]
    extras: dict[str, float] = {}
    extras5: dict[str, float] = {}
    if os.environ.get("GRAFT_SCALING_CRAWL") == "1":
        extra_queries = []  # scaling reps measure the crawl; skip extras
        extra_queries_r5 = []
    for name in extra_queries:
        if name not in qfns:
            continue
        t0 = time.time()
        _consume(qfns[name](sf))
        extras[name] = round(time.time() - t0, 3)
    for name in extra_queries_r5:
        if name not in qfns:
            continue
        t0 = time.time()
        _consume(qfns[name](sf))
        extras5[name] = round(time.time() - t0, 3)

    result = {
        "metric": "headline pipelines wall time (crawl + relational/text/ann) at sf",
        "value": total,
        "unit": "sec",
        "queries": times,
        "extra_queries_r4": extras,
        "extra_queries_r5": extras5,
        "sf": sf,
        "num_cpus": num_cpus,
        "crawl": crawl,
    }
    ray.shutdown()
    return result


def _quiesce() -> None:
    """Flush dirty pages + drop caches so each scaling rep starts from
    the same IO state (writeback from a previous rep's multi-GB output
    otherwise bleeds into the next measurement)."""
    os.system("sync")
    try:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3")
    except OSError:
        pass


def run_scaling() -> None:
    import subprocess

    def one(ncpu: int) -> dict:
        best = None
        for _ in range(2):  # min-of-2: the right statistic on a noisy box
            _quiesce()
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SCALING_CRAWL="1")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, check=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["value"] < best["value"]:
                best = r
        return best

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    crawl_eff = (r_lo["crawl"]["sec"] / r_hi["crawl"]["sec"]) / (hi / lo)
    print(
        json.dumps(
            {
                # the BASELINE.json:2 metric is sustained fetch+dedup
                # throughput; the scaling criterion applies to it, so the
                # headline value is the flagship crawl's efficiency.
                # "overall_efficiency" additionally covers the sf0.1
                # micro-queries, which are too small to occupy 32 CPUs
                # (several run faster at 8) and thus under-read.
                "metric": "crawl throughput scaling efficiency N->4N (num_cpus 8 vs 32, same input)",
                "value": round(crawl_eff, 3),
                "unit": "efficiency",
                "overall_efficiency": round(eff, 3),
                "sec_8": r_lo["value"],
                "sec_32": r_hi["value"],
                "crawl_urls_per_sec_8": r_lo["crawl"]["urls_per_sec"],
                "crawl_urls_per_sec_32": r_hi["crawl"]["urls_per_sec"],
                "crawl_efficiency": round(crawl_eff, 3),
                "hash_match": r_lo["crawl"]["t4_t5_hash"] == r_hi["crawl"]["t4_t5_hash"],
                "queries_8": r_lo["queries"],
                "queries_32": r_hi["queries"],
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
