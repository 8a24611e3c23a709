"""Real byte-pair-encoding tokenization (Sennrich et al. 2016) with a
DuckDB-expressible application form.

Training: classic BPE — word-frequency table, iteratively merge the
most frequent adjacent symbol pair; ties break deterministically
(highest count, then lexicographically smallest pair). The merge table
shipped here (MERGES_SF0001) was trained on the sf0.001 documents
corpus and is PINNED; tests/test_training_ops.py retrains and asserts
equality, so the constant can never drift from the procedure.

Application: the token sequence is rendered as '<t1><t2>...' — every
token wrapped in its own brackets — and merge (a, b) is the literal
string replacement '<a><b>' -> '<ab>'. Because each token carries its
own delimiters, (1) a match can never start mid-token ('<pa><r>' does
not contain '<a><r>'), and (2) adjacent matches share no characters,
so one left-to-right replacement pass merges exactly the occurrences
greedy BPE merges. That makes a chain of REPLACE(...) in ANSI SQL
bit-equivalent to this function — the trick that turns t_bpe_real
into a hash-checked oracle query instead of a rows-only one. The
corpus charset (lowercase + space, verified in the query) guarantees
'<' and '>' are free to use as delimiters."""

from __future__ import annotations

from collections import Counter

# 40 merges trained on /root/testdata/sf0.001/documents.parquet
MERGES_SF0001: list[tuple[str, str]] = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"),
    ("s", "ort"), ("par", "t"), ("u", "p"), ("a", "g"), ("ag", "g"),
    ("a", "lu"), ("alu", "e"), ("v", "alue"), ("in", "e"),
    ("l", "ine"), ("e", "y"), ("k", "ey"), ("j", "o"), ("jo", "in"),
    ("g", "e"), ("mer", "ge"), ("er", "y"),
]


def train_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Deterministic BPE training over whitespace-split words."""
    vocab: Counter[str] = Counter()
    for s in texts:
        for w in s.split(" "):
            if w:
                vocab[w] += 1
    return train_bpe_from_vocab(dict(vocab), n_merges)


def train_bpe_from_vocab(
    vocab: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """The merge loop over a (word -> frequency) table — the form a
    DISTRIBUTED trainer feeds after its word-count reduction (real
    tokenizer trainers iterate on word counts, never raw text)."""
    words = {w: tuple(w) for w in vocab}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, sym in words.items():
            f = vocab[w]
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        top = max(pairs.values())
        a, b = sorted(p for p, f in pairs.items() if f == top)[0]
        merges.append((a, b))
        ab = a + b
        new = {}
        for w, sym in words.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new[w] = tuple(out)
        words = new
    return merges


def bpe_tokenize(word: str, merges: list[tuple[str, str]] | None = None) -> list[str]:
    """Tokens of one word after applying ``merges`` in order, via the
    bracket-replace form (identical to the SQL chain)."""
    if merges is None:
        merges = MERGES_SF0001
    s = "".join(f"<{c}>" for c in word)
    for a, b in merges:
        s = s.replace(f"<{a}><{b}>", f"<{a}{b}>")
    return [t for t in s[1:-1].split("><")] if s else []


def bpe_token_count(word: str, merges: list[tuple[str, str]] | None = None) -> int:
    if not word:
        return 0
    if merges is None:
        merges = MERGES_SF0001
    s = "".join(f"<{c}>" for c in word)
    for a, b in merges:
        s = s.replace(f"<{a}><{b}>", f"<{a}{b}>")
    return s.count("<")


def bpe_oracle_expr(text_col: str, merges: list[tuple[str, str]] | None = None) -> str:
    """The DuckDB expression computing the post-merge token count of
    ``text_col`` (spaces excluded), bit-equivalent to summing
    bpe_token_count over the words — see module docstring for why the
    REPLACE chain is exact."""
    if merges is None:
        merges = MERGES_SF0001
    expr = f"regexp_replace({text_col}, '(.)', '<\\1>', 'g')"
    for a, b in merges:
        expr = f"replace({expr}, '<{a}><{b}>', '<{a}{b}>')"
    spaces = f"(LENGTH({text_col}) - LENGTH(replace({text_col}, ' ', '')))"
    tokens = f"(LENGTH({expr}) - LENGTH(replace({expr}, '<', '')))"
    return f"CAST({tokens} - {spaces} AS BIGINT)"
