"""Continuation-session relational3 ops (d14 CDC diff, j13 band join,
w26 OHLC): independent naive recomputes at sf0.001 (a different SF
than the auto-parametrized DuckDB gate) plus combiner-associativity
laws on the shared merge kernels."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from lulu_crawler_ray.pipelines import relational3 as rl3

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    df["ts_us"] = df["ts"].astype("datetime64[us]").astype(np.int64)
    df["value_c"] = np.rint(df["value"].to_numpy() * 100).astype(np.int64)
    return df


def _naive_snapshot(df: pd.DataFrame, cutoff_us: int) -> dict[int, int]:
    sub = df[df["ts_us"] < cutoff_us]
    sub = sub.sort_values(["user_id", "ts_us", "event_id"])
    last = sub.groupby("user_id").tail(1)
    return dict(zip(last["user_id"], last["value_c"]))


def test_d14_matches_naive(ray_session):
    got = rl3.d14_snapshot_diff(SF).to_pandas().sort_values("user_id").reset_index(drop=True)
    df = _events()
    s1 = _naive_snapshot(df, rl3._T1)
    s2 = _naive_snapshot(df, rl3._T2)
    want = pd.DataFrame(
        {
            "user_id": sorted(s2),
            "old_c": [s1.get(u, -1) for u in sorted(s2)],
            "new_c": [s2[u] for u in sorted(s2)],
        }
    )
    want["status"] = np.where(
        want["old_c"] == -1,
        "added",
        np.where(want["old_c"] == want["new_c"], "same", "changed"),
    )
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # the diff is non-vacuous: both a user who existed at T1 and one
    # who only appears between T1 and T2 (or at least some spread)
    assert (got["old_c"] != -1).any()


def test_j13_matches_bruteforce(ray_session):
    got = rl3.j13_band_join(SF).to_pandas().sort_values("user_id").reset_index(drop=True)
    df = _events()
    clicks = df[df["event_type"] == "click"]
    buys = df[df["event_type"] == "purchase"]
    counts = {}
    for u, g in clicks.groupby("user_id"):
        b = buys[buys["user_id"] == u]["ts_us"].to_numpy()
        n = 0
        for t in g["ts_us"].to_numpy():
            n += int(np.sum(np.abs(b - t) <= rl3._EPS_US))
        if n:
            counts[u] = n
    want = pd.DataFrame(
        {"user_id": sorted(counts), "n_pairs": [counts[u] for u in sorted(counts)]}
    )
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    assert got["n_pairs"].sum() > 0  # the band is non-vacuous at sf0.001


def test_w26_matches_naive(ray_session):
    got = (
        rl3.w26_ohlc(SF)
        .to_pandas()
        .sort_values(["user_id", "day_idx"])
        .reset_index(drop=True)
    )
    df = _events()
    df["day_idx"] = df["ts_us"] // 86_400_000_000 - rl3._EPOCH_DAY
    rows = []
    for (u, d), g in df.sort_values(["ts_us", "event_id"]).groupby(
        ["user_id", "day_idx"]
    ):
        rows.append(
            {
                "user_id": u,
                "day_idx": d,
                "open_c": g["value_c"].iloc[0],
                "close_c": g["value_c"].iloc[-1],
                "high_c": g["value_c"].max(),
                "low_c": g["value_c"].min(),
                "n_events": len(g),
            }
        )
    want = (
        pd.DataFrame(rows).sort_values(["user_id", "day_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))
    # candle sanity laws
    assert (got["low_c"] <= got[["open_c", "close_c"]].min(axis=1)).all()
    assert (got["high_c"] >= got[["open_c", "close_c"]].max(axis=1)).all()
    assert got["n_events"].sum() == len(df)


def _ohlc_partial(df: pd.DataFrame) -> pa.Table:
    return pa.table(
        {
            "user_id": pa.array(df["user_id"].to_numpy(np.int64)),
            "day_idx": pa.array(
                df["ts_us"].to_numpy() // 86_400_000_000 - rl3._EPOCH_DAY
            ),
            "ots": pa.array(df["ts_us"].to_numpy(np.int64)),
            "oid": pa.array(df["event_id"].to_numpy(np.int64)),
            "open_c": pa.array(df["value_c"].to_numpy(np.int64)),
            "cts": pa.array(df["ts_us"].to_numpy(np.int64)),
            "cid": pa.array(df["event_id"].to_numpy(np.int64)),
            "close_c": pa.array(df["value_c"].to_numpy(np.int64)),
            "high_c": pa.array(df["value_c"].to_numpy(np.int64)),
            "low_c": pa.array(df["value_c"].to_numpy(np.int64)),
            "n_events": pa.array(np.ones(len(df), np.int64)),
        }
    )


def _sorted_pdf(t: pa.Table) -> pd.DataFrame:
    df = t.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_ohlc_merge_associative():
    """merge(merge(A) ∪ merge(B)) == merge(A ∪ B) for every split —
    the property that makes the per-batch combiner + final merge give
    block-structure-independent results."""
    df = _events()
    for cut in (1, len(df) // 3, len(df) // 2, len(df) - 1):
        a, b = df.iloc[:cut], df.iloc[cut:]
        partwise = rl3._ohlc_merge(
            pa.concat_tables(
                [rl3._ohlc_merge(_ohlc_partial(a)), rl3._ohlc_merge(_ohlc_partial(b))]
            )
        )
        whole = rl3._ohlc_merge(_ohlc_partial(df))
        pd.testing.assert_frame_equal(_sorted_pdf(partwise), _sorted_pdf(whole))


def test_snap_merge_associative():
    df = _events()
    df = df[df["ts_us"] < rl3._T2]

    def partial(d: pd.DataFrame) -> pa.Table:
        one = d[d["ts_us"] < rl3._T1]
        return pa.table(
            {
                "user_id": pa.array(
                    np.r_[d["user_id"].to_numpy(), one["user_id"].to_numpy()]
                ),
                "snap": pa.array(
                    np.r_[np.full(len(d), 2, np.int64), np.full(len(one), 1, np.int64)]
                ),
                "ts_us": pa.array(np.r_[d["ts_us"].to_numpy(), one["ts_us"].to_numpy()]),
                "event_id": pa.array(
                    np.r_[d["event_id"].to_numpy(), one["event_id"].to_numpy()]
                ),
                "value_c": pa.array(
                    np.r_[d["value_c"].to_numpy(), one["value_c"].to_numpy()]
                ),
            }
        )

    for cut in (1, len(df) // 2, len(df) - 1):
        a, b = df.iloc[:cut], df.iloc[cut:]
        partwise = rl3._snap_merge(
            pa.concat_tables([rl3._snap_merge(partial(a)), rl3._snap_merge(partial(b))])
        )
        whole = rl3._snap_merge(partial(df))
        pd.testing.assert_frame_equal(_sorted_pdf(partwise), _sorted_pdf(whole))
