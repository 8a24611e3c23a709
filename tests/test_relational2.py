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
