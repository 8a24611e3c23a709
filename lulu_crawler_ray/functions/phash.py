"""64-bit perceptual hash (F6) — classic DCT pHash, numpy only.

Algorithm: grayscale -> nearest-resize to 32x32 -> 2-D DCT-II ->
top-left 8x8 coefficients excluding DC -> threshold at their median ->
64-bit hash (row-major bit order). Deterministic; hamming distance on
the int64 is the near-dup metric (SURVEY.md §2 op J4).
"""

from __future__ import annotations

import numpy as np

from .imagecodec import resize_nearest

_N = 32


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] *= 1 / np.sqrt(2)
    return m * np.sqrt(2 / n)


_DCT = _dct_matrix(_N)


def phash64(img: np.ndarray) -> int:
    """(h, w, 3) uint8 -> signed int64 perceptual hash.

    Bit-identical to the naive gray-then-resize formulation, but
    cheaper: nearest-resize is pure index selection and grayscale is
    per-pixel, so they commute — resize FIRST (1024 px instead of
    h*w), then gray via exact integer channel-sum / 3 (uint8 channels
    sum exactly; float64(sum)/3 equals float64 mean bit-for-bit)."""
    small = _gray_small(img, _N, _N)
    coef = _DCT @ small @ _DCT.T
    block = coef[:8, :8].flatten()[1:]  # drop DC
    med = np.median(block)
    bits = np.concatenate([[False], block > med])  # DC bit fixed 0
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return int(np.int64(np.uint64(val)))  # two's-complement into int64


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))


_POP = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def hamming64_vec(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(a XOR b) over int64 arrays."""
    x = (a.astype(np.int64).view(np.uint64) ^ b.astype(np.int64).view(np.uint64))
    out = np.zeros(x.shape, np.int32)
    for s in range(0, 64, 8):
        out += _POP[((x >> np.uint64(s)) & np.uint64(0xFF)).astype(np.intp)]
    return out


def _gray_small(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Shared helper: nearest-resize then exact integer-sum grayscale
    (same commuting argument as phash64)."""
    small3 = resize_nearest(img, w, h)
    return small3.sum(axis=2, dtype=np.int64).astype(np.float64) / 3.0


def ahash64(img: np.ndarray) -> int:
    """Average hash: gray 8x8, bit = pixel > mean. The cheapest of the
    perceptual-hash family (no DCT) — the first-pass gate LAION-style
    curation runs before the more selective pHash."""
    g = _gray_small(img, 8, 8)
    bits = (g > g.mean()).ravel()
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return int(np.int64(np.uint64(val)))


def dhash64(img: np.ndarray) -> int:
    """Difference hash: gray 9x8, bit = left pixel > right neighbor
    (horizontal gradient sign). Robust to uniform brightness shifts,
    which flip every ahash bit but no dhash bit."""
    g = _gray_small(img, 9, 8)
    bits = (g[:, :-1] > g[:, 1:]).ravel()
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return int(np.int64(np.uint64(val)))
