"""HyperLogLog sketch (G4) — the 10^10-scale approximate distinct
counter (SURVEY.md §2.5). Standard HLL with 2^p registers and the
Flajolet et al. bias-corrected estimator; registers are a tiny numpy
uint8 array, mergeable by elementwise max (one sketch per batch, merged
in a second stage — the mergeable-sketch aggregation pattern)."""

from __future__ import annotations

import numpy as np

# splitmix64 constants — a good 64-bit integer mixer
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + _GOLD).astype(np.uint64)
        x ^= x >> np.uint64(30)
        x *= _C1
        x ^= x >> np.uint64(27)
        x *= _C2
        x ^= x >> np.uint64(31)
    return x


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, np.uint8)

    def add_many(self, values: np.ndarray) -> None:
        """Vectorized insert of uint64 values."""
        h = _mix64(values.astype(np.uint64))
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of rest + 1 (rest has low bits set, so
        # rank <= 64 - p + 1 always)
        rank = np.zeros(len(h), np.uint8)
        mask = np.ones(len(h), bool)
        bit = np.uint64(1) << np.uint64(63)
        r = np.uint8(1)
        cur = rest.copy()
        while mask.any() and r <= 64 - self.p + 1:
            top = (cur & bit) != 0
            rank[mask & top] = r
            mask = mask & ~top
            cur = (cur << np.uint64(1)).astype(np.uint64)
            r += 1
        np.maximum.at(self.registers, idx, rank)

    def merge_registers(self, data: bytes) -> None:
        other = np.frombuffer(data, np.uint8)
        np.maximum(self.registers, other, out=self.registers)

    def count(self) -> float:
        m = float(self.m)
        am = 0.7213 / (1 + 1.079 / m)
        est = am * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)
        return float(est)
