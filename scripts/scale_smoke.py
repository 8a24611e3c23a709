"""10x scale smoke: synthesize a documents/embeddings table 10x the
size of sf0.1 (deterministic doc_id-offset replication with token
perturbation so dedup ops see realistic, not degenerate, duplication)
and run the heaviest corpus operators end to end. The point is not
timing precision — it is proving that no operator hides a driver-side
gather or a CPU-sized shuffle that only bites beyond bench scale.

Usage: python scripts/scale_smoke.py [--copies 10]
Writes scratch under /tmp/lulu_scale_smoke; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def build(src_sf: str, out_dir: str, copies: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(f"{src_sf}/documents.parquet")
    n = t.num_rows
    parts = []
    for c in range(copies):
        ids = pa.array(t["doc_id"].to_numpy(zero_copy_only=False) + c * n, pa.int64())
        if c == 0:
            texts = t["text"]
        else:
            # perturb: prefix a copy-tag token on ~half the docs so
            # exact/chunk dedup sees both true dups and near-dups
            tx = t["text"].to_pylist()
            texts = pa.array(
                [s if (i + c) % 2 else f"c{c} {s}" for i, s in enumerate(tx)]
            )
        cols = {"doc_id": ids, "text": texts}
        for name in t.column_names:
            if name not in cols:
                cols[name] = t[name]
        parts.append(pa.table(cols).select(t.column_names))
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/documents.parquet")
    e = pq.read_table(f"{src_sf}/embeddings.parquet")
    eparts = []
    for c in range(copies):
        ids = pa.array(e["vec_id"].to_numpy(zero_copy_only=False) + c * e.num_rows, pa.int64())
        eparts.append(pa.table({"vec_id": ids, "embedding": e["embedding"]}))
    pq.write_table(pa.concat_tables(eparts), f"{out_dir}/embeddings.parquet")
    # events replicate too (id/user offset) so the event-stream ops
    # (gaps-islands anti-joins, grouped moments, sessionize) get a
    # 10x leg; other relational tables aren't the target here
    ev = pq.read_table(f"{src_sf}/events.parquet")
    vparts = []
    for c in range(copies):
        vparts.append(
            pa.table(
                {
                    "event_id": pa.array(
                        ev["event_id"].to_numpy(zero_copy_only=False) + c * ev.num_rows,
                        pa.int64(),
                    ),
                    "ts": ev["ts"],
                    "user_id": pa.array(
                        ev["user_id"].to_numpy(zero_copy_only=False) + c * 1_000_000,
                        pa.int64(),
                    ),
                    "event_type": ev["event_type"],
                    "value": ev["value"],
                    "props": ev["props"],
                }
            )
        )
    pq.write_table(pa.concat_tables(vparts), f"{out_dir}/events.parquet")
    # orders replicates (keyspace offset) so the interval-overlap join
    # gets a true 10x leg; the offset shifts which keys land in each
    # residue side, which only changes WHICH intervals join, not scale
    od = pq.read_table(f"{src_sf}/orders.parquet")
    oparts = []
    for c in range(copies):
        ocols = {
            "o_orderkey": pa.array(
                od["o_orderkey"].to_numpy(zero_copy_only=False) + c * od.num_rows * 8,
                pa.int64(),
            )
        }
        for name in od.column_names:
            if name not in ocols:
                ocols[name] = od[name]
        oparts.append(pa.table(ocols).select(od.column_names))
    pq.write_table(pa.concat_tables(oparts), f"{out_dir}/orders.parquet")
    # relational ops aren't the target here; link the rest for read_table
    for name in ("region", "nation", "customer", "supplier", "part", "lineitem"):
        dst = f"{out_dir}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{src_sf}/{name}.parquet", dst)


def main() -> None:
    copies = 10
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    out_dir = "/tmp/lulu_scale_smoke"
    shutil.rmtree(out_dir, ignore_errors=True)
    build("/root/testdata/sf0.1", out_dir, copies)

    import __ray_entry__ as em

    q = em.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in (
        "t_exact_dedup", "t_chunk_dedup", "t_winnow", "t_winnow_pairs",
        "t_near_dedup", "t_minhash_pairs", "t_split", "e_mips_topk",
        "t_decontaminate", "t_pack", "t_dupspans", "e_semdedup",
        "t_prep_v4", "m17_gaps_islands", "g24_skew_kurt", "w11_sessionize",
        # continuation session: PMI collocations (10x docs), grouped
        # arg-max / exact median / window distinct (10x events)
        "t_pmi_bigrams", "g26_argmax", "g27_median", "w12_window_distinct",
        # final pass: novelty/DSIR (10x docs), rolling median / daily
        # extremes / chi2 (10x events), interval join (10x orders)
        "t_ngram_novelty", "t_dsir_weights", "w13_rolling_median",
        "w15_daily_extremes", "g28_chi2", "j11_interval_join",
        # closing trio: per-user gap-fill (10x events), bitwise folds
        # (10x events), per-dim moment vector (10x embeddings)
        "w14_gap_fill", "g29_bitwise", "e_dim_stats", "e_cov_matrix",
        # closing additions: whitening projection (10x embeddings),
        # cohort retention + exact 2-sigma outliers (10x events)
        "e_whiten_digest", "w16_retention", "g30_zscore_outliers",
        # closing session: regex pull / readability / Gopher gates
        # (10x docs), dyadic EWMA / MAD outliers / Gini / path mining
        # (10x events). d11_edit_pairs is omitted — its input (part)
        # isn't replicated; its quadratic step is vocab-bounded by
        # construction.
        "m19_regex_extract", "t_readability", "t_gopher_quality",
        "w18_ewm8", "w20_mad_outliers", "g31_gini", "w21_path_mining",
        # sixth pass: SCD run compression (10x events), PII scrub /
        # classifier scoring / hashed embeddings (10x docs), bloom
        # semi join (10x orders x lineitem)
        "w22_scd_intervals", "t_pii_redact", "t_quality_clf",
        "t_doc_embed", "j12_bloom_semi",
    ):
        t0 = time.time()
        res = q[name](out_dir)
        if hasattr(res, "count"):
            rows[name] = res.count()
        else:
            rows[name] = res.num_rows if hasattr(res, "num_rows") else len(res)
        timings[name] = round(time.time() - t0, 2)
    print(json.dumps({
        "copies": copies,
        "docs": copies * 5000,
        "timings": timings,
        "rows": rows,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
