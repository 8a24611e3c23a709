"""Regex HTML link/image extraction (M7/M9) — no bs4 in this sandbox.

Extracts, in document order, anchors ``<a href=...>text</a>`` and image
refs ``<img src=... alt=...>``. Position j (0-based over ALL refs in
document order) feeds the deterministic seq formula
seq = (rank + 1) * L + j (SURVEY.md §3.2.3). Captions (img alt / anchor
text) are whitespace-normalized and NFC'd (M9; BASELINE.json:15
"caption equality").
"""

from __future__ import annotations

import re
import unicodedata

_REF = re.compile(
    rb'<a\s+href="(?P<href>[^"]*)"\s*>(?P<text>.*?)</a>'
    rb'|<img\s+src="(?P<src>[^"]*)"(?:\s+alt="(?P<alt>[^"]*)")?\s*/?>',
    re.S,
)
_WS = re.compile(r"\s+")


def norm_caption(text: str) -> str:
    return unicodedata.normalize("NFC", _WS.sub(" ", text).strip())


def extract_refs(body: bytes) -> list[tuple[int, str, str, str]]:
    """body -> [(j, kind, target, caption)] in document order;
    kind in {"link", "image"}."""
    out: list[tuple[int, str, str, str]] = []
    j = 0
    for m in _REF.finditer(body):
        if m.group("href") is not None:
            out.append(
                (j, "link", m.group("href").decode("utf-8", "replace"),
                 norm_caption(m.group("text").decode("utf-8", "replace")))
            )
        else:
            alt = m.group("alt") or b""
            out.append(
                (j, "image", m.group("src").decode("utf-8", "replace"),
                 norm_caption(alt.decode("utf-8", "replace")))
            )
        j += 1
    return out
