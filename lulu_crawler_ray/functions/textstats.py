"""Text-analysis kernels for the documents table: token counting,
quality ratios, n-gram language ID, simhash, minhash signatures,
winnowing fingerprints. Pure Python/numpy — the Ray stages in
pipelines/textops.py wrap these in map_batches / actor pools."""

from __future__ import annotations

import hashlib
import re

import numpy as np

_TOKEN = re.compile(r"\S+")
_ALPHA = re.compile(r"[A-Za-z]")
_DIGIT = re.compile(r"[0-9]")

STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "that", "for"},
    "fr": {"le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"},
    "es": {"el", "la", "y", "de", "un", "una", "es", "que", "por", "en"},
}


def tokens(text: str) -> list[str]:
    return text.split()


def token_count(text: str) -> int:
    return len(text.split())


# GPT-2-style pre-tokenizer shape (contractions | word | number | punct
# run | whitespace run), restricted to RE2-compatible syntax (no
# lookahead) so the DuckDB oracle computes the IDENTICAL count
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
_BPE = re.compile(BPE_PATTERN)


def bpe_token_count(text: str) -> int:
    """BPE-ish token count — the pre-tokenization granularity a BPE
    tokenizer would split further; the standard corpus-size statistic."""
    return len(_BPE.findall(text))


def quality_ratios(text: str) -> tuple[float, float]:
    """(alpha_ratio, digit_ratio) over characters; 0 for empty text."""
    n = len(text)
    if n == 0:
        return 0.0, 0.0
    return len(_ALPHA.findall(text)) / n, len(_DIGIT.findall(text)) / n


def char_class_counts(text: str) -> tuple[int, int]:
    """(n_alpha, n_digit) character-class counts."""
    return len(_ALPHA.findall(text)), len(_DIGIT.findall(text))


def stopword_ratio(text: str, lang: str = "en") -> float:
    toks = [t.lower() for t in text.split()]
    if not toks:
        return 0.0
    sw = STOPWORDS.get(lang, STOPWORDS["en"])
    return sum(t in sw for t in toks) / len(toks)


def langid(text: str) -> str:
    """Stopword-vote language ID over {en,fr,de,es}; 'und' when no
    stopword evidence. A real system uses char-n-gram models; the
    heuristic keeps the stage shape (per-doc classification) honest."""
    toks = set(t.lower() for t in text.split())
    best, best_n = "und", 0
    for lang, sw in STOPWORDS.items():
        n = len(toks & sw)
        if n > best_n:
            best, best_n = lang, n
    return best


def _h64(data: bytes) -> int:
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big")


def shingles(text: str, k: int = 3) -> set[int]:
    """Hashed word k-gram shingles."""
    toks = text.split()
    if len(toks) < k:
        return {_h64(" ".join(toks).encode())} if toks else set()
    return {_h64(" ".join(toks[i : i + k]).encode()) for i in range(len(toks) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


# minhash: h_i(x) = mix64(x XOR seed_i) — a seeded splitmix64 hash
# family, fully vectorized in uint64 (the classic (ax+b) mod p family
# needs 128-bit modular math, which forces Python-object arithmetic)
def minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    seeds = rng.integers(0, 1 << 63, num_perm).astype(np.uint64)
    return seeds, seeds  # (kept as a pair for API stability)


def minhash_signature(sh: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """uint64 signature of len(a); all-max for empty shingle sets."""
    from .hll import _mix64

    if not sh:
        return np.full(len(a), np.iinfo(np.uint64).max, np.uint64)
    x = np.fromiter(sh, np.uint64, count=len(sh))
    return _mix64(x[:, None] ^ a[None, :]).min(axis=0)


def simhash64(text: str) -> int:
    """Classic 64-bit simhash over whitespace tokens."""
    acc = np.zeros(64, np.int64)
    for t in text.split():
        h = _h64(t.lower().encode())
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits == 1, 1, -1)
    val = 0
    for i in range(64):
        if acc[i] > 0:
            val |= 1 << i
    return int(np.int64(np.uint64(val)))


def winnow_fingerprints(text: str, k: int = 5, w: int = 4) -> set[int]:
    """Winnowing (Schleimer et al. 2003): k-gram char hashes, sliding
    window-w minimum — the document fingerprint set."""
    s = text.lower()
    if len(s) < k:
        return {_h64(s.encode())} if s else set()
    hs = [_h64(s[i : i + k].encode()) for i in range(len(s) - k + 1)]
    out: set[int] = set()
    for i in range(max(1, len(hs) - w + 1)):
        out.add(min(hs[i : i + w]))
    return out
