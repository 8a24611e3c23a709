"""Regression: the composed t_prep_pipeline at num_cpus=32 (VERDICT r2
"What's wrong #1"). The gate/adaptive-join stages emit zero-row blocks
which Ray 2.49 carries as SCHEMA-LESS RefBundles; with 32 CPUs the
hash-shuffle joins inside near_dedup_minhash get enough partitions that
some right-side partition consists only of those schema-less empties,
and acero dies with ``ArrowInvalid: ... FieldRef.Name(__a)``. The fix
is the relational._nonempty guard on every shuffle-join input. This
test re-runs the driver's exact failing configuration (fresh process,
num_cpus=32, sf0.01) and must keep passing."""

import subprocess
import sys
import textwrap

SF = "/root/testdata/sf0.01"


def test_prep_pipeline_at_32_cpus():
    code = textwrap.dedent(f"""
        import ray
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        from lulu_crawler_ray.pipelines.textops import t_prep_pipeline
        out = t_prep_pipeline({SF!r}).to_pandas()
        assert len(out) == 5, out
        assert int(out["n_docs"].sum()) > 0
        print("PREP_OK", len(out))
        ray.shutdown()
    """)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "PREP_OK" in res.stdout


def test_outer_joins_at_32_cpus():
    """The outer-join entries feed SELECTIVE filters (urgent-orders)
    into shuffle_join — the exact zero-row-schema-less-block hazard —
    and additionally exercise acero's left/full-outer key coalescing
    under many partitions. Row counts are pinned to the sf0.01 oracle
    values (j6: every customer survives; j7: 150 users ∪ urgent
    custkeys; q18: 204 HAVING survivors)."""
    code = textwrap.dedent(f"""
        import ray
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        from lulu_crawler_ray.pipelines.relational import (
            j6_left_join, j7_full_outer, q18_large_orders)
        j6 = j6_left_join({SF!r}).to_pandas()
        assert len(j6) == 1500 and (j6["n_urgent"] >= 0).all(), len(j6)
        j7 = j7_full_outer({SF!r}).to_pandas()
        assert len(j7) == 1319 and j7["k"].notna().all(), len(j7)
        q18 = q18_large_orders({SF!r}).to_pandas()
        assert len(q18) == 204 and (q18["qty"] > 250).all(), len(q18)
        print("JOINS_OK")
        ray.shutdown()
    """)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "JOINS_OK" in res.stdout


def test_round3_late_ops_at_32_cpus():
    """q4 (EXISTS-decorrelated join), t_tfidf (vocab-cardinality join +
    grouped top-k) both shuffle-join downstream of selective stages —
    the schema-less-empty-block hazard class. o6/g12 ride along as
    driver-parity smoke. Row counts pinned to the sf0.01 oracle."""
    code = textwrap.dedent(f"""
        import ray
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        from lulu_crawler_ray.pipelines.relational import (
            q4_order_priority, g12_grouped_corr, o6_stratified_sample)
        from lulu_crawler_ray.pipelines.textops import t_tfidf
        q4 = q4_order_priority({SF!r}).to_pandas()
        assert len(q4) == 5 and int(q4["order_count"].sum()) > 0, q4
        tfidf = t_tfidf({SF!r}).to_pandas()
        assert len(tfidf) == 1500 and (tfidf["rank"] <= 3).all(), len(tfidf)
        g12 = g12_grouped_corr({SF!r}).to_pandas()
        assert len(g12) == 3, g12
        o6 = o6_stratified_sample({SF!r}).to_pandas()
        assert len(o6) == 15, o6
        from lulu_crawler_ray.pipelines.graph import x1_pagerank
        pr = x1_pagerank({SF!r}).to_pandas()
        assert len(pr) == 1000 and (pr["r3"] >= 150000).all(), len(pr)
        # w9's block-boundary prefix scan depends on to_arrow_refs
        # preserving sort order — many more blocks at 32 CPUs; the late
        # total is pinned to the sf0.01 oracle value
        from lulu_crawler_ray.pipelines.relational import w9_late_data
        w9 = w9_late_data({SF!r}).to_pandas()
        assert int(w9["n"].sum()) == 10000 and int(w9["n_late"].sum()) == 7014, (
            int(w9["n"].sum()), int(w9["n_late"].sum()))
        print("LATE_OPS_OK")
        ray.shutdown()
    """)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "LATE_OPS_OK" in res.stdout


def test_tpch_extra_at_32_cpus():
    """All 12 round-3 TPC-H shapes in one 32-CPU process — q8/q9/q12/
    q21 shuffle-join downstream of selective filters (the schema-less
    empty-block hazard class); the rest ride along as driver parity.
    Row counts pinned to the sf0.01 DuckDB oracle."""
    code = textwrap.dedent(f"""
        import ray
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        from lulu_crawler_ray.pipelines import tpch_extra as tx
        expect = {{
            "q2_min_cost_supplier": 121, "q8_market_share": 2,
            "q9_product_type_profit": 175, "q11_important_parts": 380,
            "q12_priority_lines": 2, "q13_custdist": 20,
            "q16_supplier_cnt": 988, "q17_small_qty_revenue": 1,
            "q19_discounted_revenue": 1, "q20_part_promotion": 82,
            "q21_last_shipper": 20, "q22_idle_customers": 5,
        }}
        for name, n in expect.items():
            got = getattr(tx, name)({SF!r}).to_pandas()
            assert len(got) == n, (name, len(got), n)
        # round-3 training ops: t_pack's prefix scan depends on
        # to_arrow_refs preserving the doc_id sort order (more blocks at
        # 32 CPUs); decontaminate broadcasts through a distinct shuffle
        from lulu_crawler_ray.pipelines import textops as to
        pk = to.t_pack({SF!r}).to_pandas().sort_values("doc_id")
        assert len(pk) == 500 and (pk["start_tok"].to_numpy()[1:] ==
            (pk["start_tok"] + pk["n_tok"]).to_numpy()[:-1]).all()
        assert len(to.t_decontaminate({SF!r}).to_pandas()) == 426
        assert len(to.t_sample_mix({SF!r}).to_pandas()) == 200
        # t_prep_v2 composes gate -> decontaminate -> both dedups ->
        # pack: the round-2 CORRECTNESS failure was exactly a composed
        # pipeline whose selective stages fed schema-less empty blocks
        # into joins at 32 CPUs — pin the oracle-verified funnel here
        pv = to.t_prep_v2({SF!r}).to_pydict()
        assert pv == {{"n_in": [500], "n_gate": [398], "n_decon": [23],
                      "n_exact": [23], "n_near": [23],
                      "total_tokens": [496], "n_chunks": [2]}}, pv
        print("TPCH_EXTRA_OK")
        ray.shutdown()
    """)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "TPCH_EXTRA_OK" in res.stdout


def test_round4_ops_at_32_cpus():
    """Round-4 ops at full parallelism: t_prep_v3's BPE-packed funnel
    pinned to the sf0.01 oracle values; the co-partitioned semi/anti
    joins, salted join, range join, and pushdown scan all run
    downstream of selective stages (the schema-less-empty-block hazard
    class) with many more blocks at 32 CPUs."""
    code = textwrap.dedent(f"""
        import ray
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        from lulu_crawler_ray.pipelines.textops import t_prep_v3, t_intradoc_repeats
        v3 = t_prep_v3({SF!r}).to_pandas()
        assert v3.iloc[0].to_dict() == {{
            "n_in": 500, "n_gate": 398, "n_decon": 23, "n_exact": 23,
            "n_near": 23, "total_tokens": 1289, "n_chunks": 5}}, v3
        rep = t_intradoc_repeats({SF!r}).to_pandas()
        assert int(rep["n_repeat_positions"].sum()) == 956, rep["n_repeat_positions"].sum()
        from lulu_crawler_ray.pipelines.relational import (
            j1_anti_join, d8_semi_join, j8_range_join, j9_salted_join,
            s11_pushdown_scan)
        j1 = j1_anti_join({SF!r}, broadcast_max=0).to_pandas()
        assert len(j1) > 0
        d8 = d8_semi_join({SF!r}, broadcast_max=0).to_pandas()
        assert len(d8) > 0
        j8 = j8_range_join({SF!r}).to_pandas()
        assert len(j8) == 31 and int(j8["n_ships"].sum()) > 0
        j9 = j9_salted_join({SF!r}).to_pandas()
        assert len(j9) == 3
        s11 = s11_pushdown_scan({SF!r}).to_pandas()
        assert len(s11) == 5
        print("ROUND4_OPS_OK")
        ray.shutdown()
    """)
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "ROUND4_OPS_OK" in res.stdout
