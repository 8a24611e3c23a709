"""PCA-whitening projection (e_whiten_project / e_whiten_digest).

The oracle_sql() entry for e_whiten_digest is a golden PIN (eigh is not
SQL-expressible); these tests keep the pin honest by re-deriving it
with an independent, Ray-free numpy implementation straight off the
parquet, and by checking the bit-exactness claim the pin relies on
(integer projection => identical digest under different batchings).
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lulu_crawler_ray.functions.hll import _mix64
from lulu_crawler_ray.pipelines.annsearch import e_whiten_digest, e_whiten_project

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

# the value pinned in __ray_entry__.oracle_sql()
PIN_SF01 = (500, 191078357206276560)


def _reference_digest(sf: str, k: int = 8, q_scale: int = 1000, w_scale: int = 1_000_000):
    """Single-process re-derivation: exact integer moments via python
    object ints (no int64 assumption), then the same canonicalized eigh
    fit and integer projection."""
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    x = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    n, d = x.shape
    q = np.rint(x * q_scale).astype(np.int64)
    sum_q = q.sum(0)
    mean_q = np.rint(sum_q / n).astype(np.int64)
    s = (q.T.astype(object) @ q.astype(object)).astype(np.float64)
    mu = sum_q.astype(np.float64) / n
    cov = (s - n * np.outer(mu, mu)) / max(n - 1, 1)
    eig, vec = np.linalg.eigh(cov)
    order = np.argsort(eig)[::-1][:k]
    eig, vec = eig[order], vec[:, order]
    sign = np.sign(vec[np.argmax(np.abs(vec), axis=0), np.arange(k)])
    sign[sign == 0] = 1.0
    vec = vec * sign
    wq = np.rint(vec / np.sqrt(np.maximum(eig, 1e-3)) * w_scale).astype(np.int64)
    y = (q - mean_q) @ wq
    with np.errstate(over="ignore"):
        h = _mix64(t["vec_id"].to_numpy().astype(np.int64).view(np.uint64))
        for c in range(k):
            h = _mix64(h ^ y[:, c].view(np.uint64))
    return n, int(np.uint64(np.bitwise_xor.reduce(h)).astype(np.int64))


def test_digest_matches_independent_rederivation_sf001(ray_session):
    got = e_whiten_digest(SF001).to_pandas()
    ref_rows, ref_dig = _reference_digest(SF001)
    assert int(got["rows"].iloc[0]) == ref_rows
    assert int(got["digest"].iloc[0]) == ref_dig


def test_pinned_sf01_value_rederives():
    """The oracle pin itself, re-derived without Ray. If testdata or the
    fit ever changes, this fails BEFORE the driver's oracle gate does."""
    assert _reference_digest(SF01) == PIN_SF01


def test_projection_batch_split_invariant(ray_session):
    """Integer-exactness claim: the projected table is identical under a
    different block structure (repartition before projecting changes
    batch boundaries; y must not move by a single bit)."""
    a = (
        e_whiten_project(SF001)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # same fit, forced different batching
    b = e_whiten_project(SF001)
    b = b.repartition(7).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)
    assert set(a.columns) == {"vec_id"} | {f"y{c}" for c in range(8)}
    assert all(a[f"y{c}"].dtype == np.int64 for c in range(8))


def test_whitened_components_decorrelated(ray_session):
    """Semantics: after whitening, the float-space sample covariance of
    y/w_scale is ~identity on the kept components (tolerance covers the
    quantization of W and of the inputs)."""
    a = e_whiten_project(SF001).to_pandas()
    y = a[[f"y{c}" for c in range(8)]].to_numpy(np.float64) / 1_000_000.0
    cov = np.cov(y, rowvar=False)
    assert np.allclose(cov, np.eye(8), atol=0.05)
