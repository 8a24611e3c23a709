"""Round-5 final ops: perceptual-hash family kernels, the augmentation
stage, and scale-path equality for the anti-join gaps-and-islands.
(The DuckDB oracle equality for g24/o10/m17/d9 and the two image
digest pins run in test_queries_oracle.py via the auto-parametrized
gate.)"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from lulu_crawler_ray.functions.phash import ahash64, dhash64, phash64

SF = "/root/testdata/sf0.01"


def _img(seed: int = 7, h: int = 48, w: int = 64) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), np.uint8)


def test_hash_family_deterministic():
    img = _img()
    assert ahash64(img) == ahash64(img.copy())
    assert dhash64(img) == dhash64(img.copy())
    assert phash64(img) == phash64(img.copy())


def test_dhash_brightness_invariant_gradient_not():
    """dhash compares neighbor pixels, so a uniform brightness shift
    (no clipping) preserves every bit — while a horizontal GRADIENT
    overlay changes neighbor differences and must move dhash bits.
    (A uniform shift moves the mean along with every pixel, so ahash
    is uniform-shift-invariant too — the discriminating probe is the
    gradient, not the shift.)"""
    base = (_img() % 200).astype(np.uint8)
    shifted = (base.astype(np.int16) + 30).astype(np.uint8)
    assert dhash64(base) == dhash64(shifted)
    grad = np.clip(
        base.astype(np.int16) + np.arange(base.shape[1], dtype=np.int16)[None, :, None],
        0,
        255,
    ).astype(np.uint8)
    assert dhash64(base) != dhash64(grad)


def test_hash_family_distinguishes_content():
    a, b = _img(1), _img(2)
    assert ahash64(a) != ahash64(b)
    assert dhash64(a) != dhash64(b)


def test_augment_stage_matches_naive(ray_session):
    """AugmentStage's weighted sums equal a naive per-image recompute,
    and flip/rot/crop witnesses are pairwise distinct on an asymmetric
    image (the linear-x-linear flip/rot degeneracy is fixed by rot's
    quadratic row weight)."""
    from lulu_crawler_ray.functions.imagecodec import encode, resize_nearest
    from lulu_crawler_ray.pipelines.images_pipe import AugmentStage

    img = _img(11, h=24, w=32)
    t = pa.table(
        {
            "image_id": pa.array(["x"], pa.string()),
            "bytes": pa.array([encode(img, "raw")], pa.binary()),
            "fmt": pa.array(["raw"], pa.string()),
        }
    )
    out = AugmentStage()(t)
    h, w = img.shape[:2]
    yw = np.arange(1, h + 1, dtype=np.int64)[:, None, None]
    xw = np.arange(1, w + 1, dtype=np.int64)[None, :, None]
    flip = img[:, ::-1].astype(np.int64)
    assert out["flip_wsum"][0].as_py() == int((flip * yw * xw).sum())
    rot = np.rot90(img).astype(np.int64)
    yw2 = (np.arange(1, w + 1, dtype=np.int64) ** 2)[:, None, None]
    xw2 = np.arange(1, h + 1, dtype=np.int64)[None, :, None]
    assert out["rot_wsum"][0].as_py() == int((rot * yw2 * xw2).sum())
    ch, cw = h * 3 // 4, w * 3 // 4
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    crop = resize_nearest(img[y0 : y0 + ch, x0 : x0 + cw], w, h).astype(np.int64)
    assert out["crop_wsum"][0].as_py() == int((crop * yw * xw).sum())
    vals = {
        out["flip_wsum"][0].as_py(),
        out["rot_wsum"][0].as_py(),
        out["crop_wsum"][0].as_py(),
    }
    assert len(vals) == 3, "augment witnesses must be pairwise distinct"


def test_m17_both_scale_paths_equal(ray_session):
    """Gaps-and-islands via anti-join must return identical islands on
    the broadcast path (default) and the forced co-partitioned shuffle
    path (broadcast_max=0 pushes every anti past the bound)."""
    from lulu_crawler_ray.pipelines.relational import m17_gaps_islands

    small = m17_gaps_islands(SF).to_pandas()
    forced = m17_gaps_islands(SF, broadcast_max=1).to_pandas()
    assert small.equals(forced)
    # islands are well-formed: start <= end, len = end - start + 1,
    # disjoint and strictly ordered
    s = small["island_start"].to_numpy()
    e = small["island_end"].to_numpy()
    assert (e >= s).all()
    assert (small["island_len"].to_numpy() == e - s + 1).all()
    assert (s[1:] > e[:-1]).all()


def test_o10_weighted_sample_prefers_heavy(ray_session):
    """Priority-sampling sanity: the sampled orders' mean weight must
    exceed the population mean (that's what 'weighted' buys)."""
    import duckdb

    from lulu_crawler_ray.pipelines.relational import o10_weighted_sample

    got = o10_weighted_sample(SF).to_pandas()
    con = duckdb.connect()
    pop = con.execute(
        f"SELECT AVG(o_totalprice) FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    picked = con.execute(
        f"SELECT AVG(o_totalprice) FROM read_parquet('{SF}/orders.parquet') "
        f"WHERE o_orderkey IN ({','.join(str(k) for k in got['o_orderkey'])})"
    ).fetchone()[0]
    assert picked > pop


def test_g24_degenerate_groups_null_like_duckdb(ray_session):
    """Constant-value and tiny groups must yield NULL (not NaN-crash),
    matching DuckDB: skewness NULL for n < 3 or zero variance,
    kurtosis NULL for n < 4 or zero variance."""
    import os
    import tempfile

    import duckdb
    import pyarrow.parquet as pq

    from lulu_crawler_ray.pipelines.relational import (
        g24_skew_kurt,
        g24_skew_kurt_sql,
    )

    t = pa.table(
        {
            "event_id": pa.array(range(10), pa.int64()),
            "ts": pa.array([0] * 10, pa.timestamp("us")),
            "user_id": pa.array([1] * 10, pa.int64()),
            "event_type": pa.array(
                ["const"] * 4 + ["tiny3"] * 3 + ["pair"] * 2 + ["one"] * 1,
                pa.string(),
            ),
            "value": pa.array(
                [5.0, 5.0, 5.0, 5.0, 1.0, 2.0, 4.0, 1.0, 2.0, 7.0], pa.float64()
            ),
            "props": pa.array(["{}"] * 10, pa.string()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = g24_skew_kurt(d).to_pandas().set_index("event_type")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        want = con.execute(g24_skew_kurt_sql()).df().set_index("event_type")
        for et in ["const", "tiny3", "pair", "one"]:
            for c in ["skew_e4", "kurt_e4"]:
                g, w = got.loc[et, c], want.loc[et, c]
                assert (pd.isna(g) and pd.isna(w)) or g == w, (et, c, g, w)


def test_g30_isqrt_threshold_equals_square_rule():
    """The engine flags |c*n - sum| >= T with T = min{t>0 : t^2*(n-1) >
    4*n*(n*sumsq - sum^2)} (driver isqrt scan); the oracle flags
    d^2*(n-1) > 4*n*(n*sumsq - sum^2) in HUGEINT. Prove the two rules
    agree on every value of adversarial random integer groups,
    including all-equal (A=0) and n=1 (never flags) degenerate cases."""
    import math

    rng = np.random.default_rng(42)
    cases = [rng.integers(-50_000, 50_000, size=n).tolist() for n in (1, 2, 3, 17, 400)]
    cases.append([777] * 9)  # all-equal: A=0, rule = d != 0 = never
    cases.append([0, 0, 0, 1])  # near-degenerate
    for vals in cases:
        n = len(vals)
        sm = sum(vals)
        sq = sum(v * v for v in vals)
        a = 4 * n * (n * sq - sm * sm)
        if n < 2:
            tt = 0
        else:
            tt = max(math.isqrt(a // (n - 1)) - 2, 0)
            while tt * tt * (n - 1) <= a:
                tt += 1
        for c in vals + [min(vals) - 3, max(vals) + 3, 0]:
            d = abs(c * n - sm)
            engine = n >= 2 and tt > 0 and d >= tt
            oracle = d * d * (n - 1) > a
            assert engine == oracle, (vals, c, tt, a)


def test_w16_retention_shape(ray_session):
    """Cohort identity: offset 0 of every cohort counts exactly the
    cohort's size, offsets are non-negative, and summing distinct
    (user, offset-0) rows equals the distinct-user count."""
    from lulu_crawler_ray.pipelines.relational import w16_retention

    df = w16_retention(SF).to_pandas()
    assert (df["day_offset"] >= 0).all()
    base = df[df["day_offset"] == 0]
    assert (base.groupby("cohort_day")["n_users"].sum() > 0).all()
    import duckdb

    users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert base["n_users"].sum() == users


def test_w17_transitions_conservation(ray_session):
    """Every user with k>=1 events contributes exactly k-1 transitions:
    sum(n) == total events - distinct users (each user's stream has one
    fewer adjacent pair than events)."""
    import duckdb

    from lulu_crawler_ray.pipelines.relational import w17_transitions

    df = w17_transitions(SF).to_pandas()
    ev, users = duckdb.sql(
        f"SELECT COUNT(*), COUNT(DISTINCT user_id) FROM '{SF}/events.parquet'"
    ).fetchone()
    assert df["n"].sum() == ev - users
    assert (df["n"] > 0).all()


def test_e_recall_eval_matches_surfaces(ray_session):
    """The e_recall_eval pin must equal intersections recomputed from
    the three independently-checked query surfaces."""
    from lulu_crawler_ray.pipelines.annsearch import (
        e_ivf_ann,
        e_knn_bruteforce,
        e_lsh_ann,
        e_recall_eval,
    )

    sf = "/root/testdata/sf0.01"
    got = e_recall_eval(sf).to_pandas()
    exact = e_knn_bruteforce(sf).to_pandas()
    lsh = e_lsh_ann(sf).to_pandas()
    ivf = e_ivf_ann(sf).to_pandas()
    for _, r in got.iterrows():
        q = r["query_id"]
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        assert r["n_hit_lsh"] == len(set(lsh[lsh["query_id"] == q]["neighbor_id"]) & e)
        assert r["n_hit_ivf"] == len(set(ivf[ivf["query_id"] == q]["neighbor_id"]) & e)
        assert r["k"] == 10
    # the pinned oracle constants (driver hash-match contract)
    assert got.to_dict("records") == [
        {"query_id": 0, "n_hit_lsh": 9, "n_hit_ivf": 9, "k": 10},
        {"query_id": 1, "n_hit_lsh": 9, "n_hit_ivf": 8, "k": 10},
        {"query_id": 2, "n_hit_lsh": 7, "n_hit_ivf": 9, "k": 10},
    ]
