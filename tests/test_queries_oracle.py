"""Mirror of the driver's correctness gate: every queries() entry with
an oracle_sql() runs at sf0.01 and must match DuckDB on row count,
column names, and (sorted, rounded) values."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"
_SQL = entrymod.oracle_sql()
_QUERIES = entrymod.queries()


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", sorted(_SQL))
def test_query_vs_duckdb(ray_session, con, name):
    got = _normalize(_to_pandas(_QUERIES[name](SF)))
    want = _normalize(con.execute(_SQL[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    # check_dtype=True after _normalize (ints coerced to int64, datetimes to
    # str) catches exactly the driver-hash failure class: an engine int64
    # column vs an oracle HUGEINT→float64 column (g11_pivot, round 3).
    pd.testing.assert_frame_equal(got, want, check_dtype=True, check_exact=False, rtol=0, atol=1e-9)


def test_rows_only_queries_run(ray_session):
    """Queries without SQL oracles must still run and return rows with a
    stable schema (the driver's weaker check)."""
    for name in sorted(set(_QUERIES) - set(_SQL)):
        if name.startswith("crawl_"):
            continue  # covered (more strongly) by test_crawl_oracle
        res = _to_pandas(_QUERIES[name](SF))
        assert res is not None and len(res.columns) > 0, name


def test_entry_smoke(ray_session):
    ds = entrymod.entry()
    df = _to_pandas(ds)
    assert len(df) > 0
    assert list(df.columns) == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
