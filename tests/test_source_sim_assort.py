"""t_source_sim / x8_assortativity: planted-law and naive-recompute
checks behind the DuckDB oracle gate (which runs at sf0.01; these run
at sf0.001 / on synthetic plants — independent evidence)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from lulu_crawler_ray.pipelines import textops2 as to2
from lulu_crawler_ray.pipelines.graph import x8_assortativity

SF = "/root/testdata/sf0.001"


def test_source_sim_planted_mirror(ray_session, tmp_path):
    """A source that mirrors another's text verbatim must match on all
    64 permutations; unrelated random-ish sources must not."""
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    a = docs.iloc[:10].copy()
    a["source"] = "mirror_a"
    b = a.copy()
    b["source"] = "mirror_b"  # verbatim mirror of mirror_a
    c = docs.iloc[10:20].copy()
    c["source"] = "other_c"
    synth = pd.concat([a, b, c]).reset_index(drop=True)
    synth["doc_id"] = np.arange(len(synth))
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(synth, preserve_index=False), d / "documents.parquet")
    out = to2.t_source_sim(str(d)).to_pandas().set_index(["src_a", "src_b"])
    assert out.loc[("mirror_a", "mirror_b"), "match_n"] == 64
    assert out.loc[("mirror_a", "other_c"), "match_n"] < 32
    assert out.loc[("mirror_b", "other_c"), "match_n"] == out.loc[("mirror_a", "other_c"), "match_n"]


def test_source_sim_symmetric_range(ray_session):
    out = to2.t_source_sim(SF).to_pandas()
    assert (out["match_n"] >= 0).all() and (out["match_n"] <= 64).all()
    # every unordered source pair appears exactly once, a < b
    assert (out["src_a"] < out["src_b"]).all()
    k = pd.concat([out["src_a"], out["src_b"]]).nunique()
    assert len(out) == k * (k - 1) // 2


def test_x8_matches_naive(ray_session):
    got = x8_assortativity(SF).to_pandas().iloc[0]
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    src = (li["l_orderkey"] % 1000).to_numpy()
    dst = (li["l_partkey"] % 1000).to_numpy()
    od = pd.Series(src).value_counts()
    idg = pd.Series(dst).value_counts()
    du = od[src].to_numpy(np.int64)
    dv = idg[dst].to_numpy(np.int64)
    assert got["m"] == len(src)
    assert got["s_du"] == du.sum()
    assert got["s_dv"] == dv.sum()
    assert got["s_dudv"] == (du * dv).sum()
    assert got["s_du2"] == (du * du).sum()
    assert got["s_dv2"] == (dv * dv).sum()


def test_containment_planted_prefix(ray_session, tmp_path):
    """A doc that is a strict token-prefix of another must surface as
    an LSH candidate with contained == 1 and inter_n == |prefix set|
    (its shingles are a subset of the superset doc's)."""
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    longest = docs["text"].str.split().str.len().idxmax()
    docs = pd.concat([docs.loc[[longest]], docs.drop(index=longest).iloc[:19]])
    base = docs.iloc[0]["text"]
    toks = base.split()
    assert len(toks) >= 40, "fixture doc long enough for the plant"
    prefix = " ".join(toks[: int(len(toks) * 0.75)])
    synth = docs.copy()
    synth.loc[synth.index[1], "text"] = prefix  # doc 1 := prefix of doc 0
    ids = synth["doc_id"].to_numpy()
    a_id, b_id = int(ids[0]), int(ids[1])
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(synth, preserve_index=False), d / "documents.parquet")
    out = to2.t_containment(str(d))
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    lo, hi = min(a_id, b_id), max(a_id, b_id)
    row = out[(out["a"] == lo) & (out["b"] == hi)]
    assert len(row) == 1, "planted prefix pair must be an LSH candidate"
    r = row.iloc[0]
    n_small = min(r["n_a"], r["n_b"])
    assert r["contained"] == 1
    assert r["inter_n"] == n_small  # strict subset: intersection == smaller set
