"""Unit/property tests for the closing-session relational2 ops beyond
the sf0.01 oracle gate (which covers end-to-end equality): the banded
Levenshtein kernel vs a naive full-matrix DP, and the Gini closed-form
count-table fold vs the direct rank definition."""

import random

import numpy as np

from lulu_crawler_ray.pipelines.relational2 import _banded_levenshtein


def _naive_levenshtein(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    d = np.zeros((la + 1, lb + 1), np.int64)
    d[:, 0] = np.arange(la + 1)
    d[0, :] = np.arange(lb + 1)
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            d[i, j] = min(
                d[i - 1, j] + 1,
                d[i, j - 1] + 1,
                d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
            )
    return int(d[la, lb])


def test_banded_levenshtein_matches_naive():
    rng = random.Random(7)
    alpha = "abcd"
    for _ in range(400):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 12)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 12)))
        for k in (0, 1, 2, 3):
            want = _naive_levenshtein(a, b)
            got = _banded_levenshtein(a, b, k)
            if want <= k:
                assert got == want, (a, b, k)
            else:
                assert got is None, (a, b, k, got, want)


def test_banded_levenshtein_edges():
    assert _banded_levenshtein("", "", 0) == 0
    assert _banded_levenshtein("", "ab", 2) == 2
    assert _banded_levenshtein("", "abc", 2) is None
    assert _banded_levenshtein("same", "same", 0) == 0
    # transposition costs 2 under unit ops (no Damerau swap)
    assert _banded_levenshtein("ab", "ba", 2) == 2


def test_gini_closed_form_matches_rank_definition():
    rng = np.random.default_rng(3)
    for _ in range(50):
        n = int(rng.integers(1, 60))
        c = rng.integers(0, 20, n).astype(np.int64)  # many ties
        c.sort()
        # direct rank definition
        i = np.arange(1, n + 1, dtype=np.int64)
        w_direct = int(np.sum(i * c))
        # count-table closed form (the g31 fold)
        v, k = np.unique(c, return_counts=True)
        p = np.concatenate(([0], np.cumsum(k)[:-1]))
        w_fold = int(np.sum(v * (k * p + k * (k + 1) // 2)))
        assert w_fold == w_direct


def test_bloom_no_false_negatives_and_fpp():
    """Kernel property: every inserted key probes True (bloom
    correctness invariant the exact pass relies on); the false-positive
    rate on disjoint keys stays near the k=4, m/n=10 textbook value."""
    import numpy as np

    from lulu_crawler_ray.pipelines.relational2 import (
        bloom_build_words,
        bloom_probe_mask,
    )

    rng = np.random.default_rng(7)
    keys = rng.choice(1 << 40, size=100_000, replace=False).astype(np.int64)
    ins, out = keys[:50_000], keys[50_000:]
    m_bits = 1 << 19  # ~10.5 bits/key
    words = bloom_build_words(ins, m_bits, 4)
    assert bloom_probe_mask(ins, words, 4).all()  # zero false negatives
    fpp = bloom_probe_mask(out, words, 4).mean()
    assert fpp < 0.03, fpp  # textbook ~1.2% at k=4, m/n~10.5


def test_j12_bloom_prefilter_reduces_shuffle_volume(ray_session):
    """The bloom pre-filter must drop (nearly) all non-urgent lineitem
    rows BEFORE the exact co-partitioned pass — the op's reason to
    exist. Checked by running the pre-filter stage alone."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from lulu_crawler_ray.pipelines.relational2 import (
        bloom_build_words,
        bloom_probe_mask,
    )

    SF = "/root/testdata/sf0.01"
    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])
    urgent = orders.filter(pc.equal(orders["o_orderpriority"], "1-URGENT"))["o_orderkey"]
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey"])["l_orderkey"]
    words = bloom_build_words(urgent.to_numpy(), 1 << 20, 4)
    mask = bloom_probe_mask(li.to_numpy(), words, 4)
    true_frac = np.isin(li.to_numpy(), urgent.to_numpy()).mean()
    # candidates = true matches + fpp; must be well under the full table
    assert true_frac <= mask.mean() <= true_frac + 0.03


def test_cusum_closed_form_matches_clamped_recursion():
    """w23's reflected-walk identity s_i = p_i - min(0, min_{j<=i} p_j)
    vs the naive clamped recursion s_i = max(0, s_{i-1} + y_i), on
    adversarial integer sequences including all-negative, all-positive
    and sign-flip runs — and the multi-segment offset trick on
    concatenated users."""
    rng = random.Random(23)
    for trial in range(200):
        n = rng.randrange(1, 40)
        y = np.array(
            [rng.randrange(-50, 50) for _ in range(n)], np.int64
        )
        if trial % 5 == 0:
            y = np.abs(y)
        if trial % 5 == 1:
            y = -np.abs(y)
        s_naive = []
        s = 0
        for v in y:
            s = max(0, s + int(v))
            s_naive.append(s)
        p = np.cumsum(y)
        runmin = np.minimum.accumulate(p)
        s_closed = p - np.minimum(0, runmin)
        assert list(s_closed) == s_naive

    # multi-segment: two users concatenated must not leak the running
    # min across the segment boundary (the decreasing-offset trick)
    y = np.array([-100, 5, 7, -1, 3, 9], np.int64)
    seg = np.array([0, 0, 0, 1, 1, 1], np.int64)
    starts = np.r_[True, seg[1:] != seg[:-1]]
    tot = np.cumsum(y)
    start_pos = np.flatnonzero(starts)
    base = np.where(start_pos > 0, tot[start_pos - 1], np.int64(0))
    p = tot - base[seg]
    span = int(p.max()) - int(p.min()) + 1
    shifted = p - seg * np.int64(span)
    runmin = np.minimum.accumulate(shifted) + seg * np.int64(span)
    s = p - np.minimum(np.int64(0), runmin)
    # user 2's walk starts fresh: -1 -> 0+3 -> wait: max(0,-1)=0, 3, 12
    assert list(s[3:]) == [0, 3, 12]
    assert list(s[:3]) == [0, 5, 12]
