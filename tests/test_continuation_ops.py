"""Continuation-session ops: edge-case invariants for n-gram novelty,
DSIR weights, the exact kNN graph, and the rolling median. (DuckDB
oracle equality at sf0.01 runs via the auto-parametrized gate in
test_queries_oracle.py.)"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def _docs_dir(tmp_path, rows: dict) -> str:
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table(rows), str(d / "documents.parquet"))
    return str(d)


def test_novelty_identical_docs_first_wins(ray_session, tmp_path):
    """Three identical docs: doc 0 owns every trigram (novelty 1e6),
    docs 1/2 add nothing (novelty 0) but count the same grams."""
    from lulu_crawler_ray.pipelines.textops3 import t_ngram_novelty

    sf = _docs_dir(
        tmp_path,
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["a b c d e"] * 3),
            "lang": pa.array(["en"] * 3),
        },
    )
    df = t_ngram_novelty(sf).to_pandas()
    assert df["n_grams"].tolist() == [3, 3, 3]  # abc bcd cde
    assert df["n_novel"].tolist() == [3, 0, 0]
    assert df["novelty_ppm"].tolist() == [1_000_000, 0, 0]


def test_novelty_short_docs_emit_nothing(ray_session, tmp_path):
    from lulu_crawler_ray.pipelines.textops3 import t_ngram_novelty

    sf = _docs_dir(
        tmp_path,
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b", "x y z"]),
            "lang": pa.array(["en", "en"]),
        },
    )
    df = t_ngram_novelty(sf).to_pandas()
    assert df["doc_id"].tolist() == [1]  # doc 0 has no trigram


def test_dsir_all_target_saturates(ray_session, tmp_path):
    """Every doc in the target language -> every token term is exactly
    1e6 ppm, so dsir_avg_e6 saturates at 1e6 for every doc."""
    from lulu_crawler_ray.pipelines.textops3 import t_dsir_weights

    sf = _docs_dir(
        tmp_path,
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["hello world", "world again hello"]),
            "lang": pa.array(["en", "en"]),
        },
    )
    df = t_dsir_weights(sf).to_pandas()
    assert df["dsir_avg_e6"].tolist() == [1_000_000, 1_000_000]
    assert df["n_tokens"].tolist() == [2, 3]


def test_dsir_disjoint_vocab_zero(ray_session, tmp_path):
    """A non-target doc sharing no tokens with the target corpus
    scores exactly 0."""
    from lulu_crawler_ray.pipelines.textops3 import t_dsir_weights

    sf = _docs_dir(
        tmp_path,
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["aa bb cc", "xx yy"]),
            "lang": pa.array(["en", "de"]),
        },
    )
    df = t_dsir_weights(sf).to_pandas().set_index("doc_id")
    assert df.loc[1, "dsir_e6"] == 0
    assert df.loc[0, "dsir_avg_e6"] == 1_000_000


def test_knn_graph_agrees_with_mips_on_queries(ray_session):
    """The kNN graph restricted to vec_id < 3 must equal e_mips_topk's
    per-query neighbor lists (same quantization, same tie rule)."""
    from lulu_crawler_ray.pipelines.annsearch import e_knn_graph
    from lulu_crawler_ray.pipelines.textops2 import e_mips_topk

    k = 3
    g = e_knn_graph(SF, k=k).to_pandas()
    m = e_mips_topk(SF, k=k, n_queries=3).to_pandas()
    sub = g[g["vec_id"] < 3].reset_index(drop=True)
    assert sub["neighbor_id"].tolist() == m["neighbor_id"].tolist()
    assert sub["ip_e12"].tolist() == m["ip_e12"].tolist()


def test_knn_graph_refuses_above_bound(ray_session):
    from lulu_crawler_ray.pipelines.annsearch import e_knn_graph

    with pytest.raises(ValueError, match="IVF"):
        e_knn_graph(SF, k=3, dim_max=10)


def test_rolling_median_window_one_is_identity(ray_session):
    from lulu_crawler_ray.pipelines.relational import w13_rolling_median
    from lulu_crawler_ray.sources.testdata import read_table

    df = w13_rolling_median(SF, window=1).to_pandas()
    raw = (
        read_table(SF, "events", ["event_id", "value"])
        .to_pandas()
        .set_index("event_id")["value"]
    )
    assert np.allclose(df["med"].to_numpy(), raw.loc[df["event_id"]].round(4).to_numpy())
