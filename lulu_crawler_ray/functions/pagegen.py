"""Deterministic synthetic web graph + image payloads + robots rules
(FIXTURES.md §B) — the sandbox stand-in for live HTTP (no network;
SURVEY.md §0.2). Pure functions of (seed, url); shared by the Ray
engine's SyntheticFetcher and the single-threaded oracle crawler, so
both see the identical web.

The host link-mass is Zipf(alpha) over ``h{i}.test`` — guaranteeing the
skew that the engine's hot-domain handling (SURVEY.md §4.3) must absorb.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

from .imagecodec import FORMATS, encode


def _h(parts: str) -> bytes:
    return hashlib.sha256(parts.encode("utf-8")).digest()


@lru_cache(maxsize=8)
def _zipf_cdf(n_hosts: int, alpha: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n_hosts + 1) ** alpha
    return np.cumsum(w) / w.sum()


def zipf_host(n_hosts: int, alpha: float, u16: int) -> int:
    """Map a 16-bit value to a Zipf-distributed host index."""
    cdf = _zipf_cdf(n_hosts, alpha)
    return int(np.searchsorted(cdf, u16 / 65536.0, side="right"))


def _n_links(u16: int, max_links: int) -> int:
    """Capped-Zipf out-degree: weights ~ 1/k, k = 1..max_links."""
    w = 1.0 / np.arange(1, max_links + 1)
    cdf = np.cumsum(w) / w.sum()
    return int(np.searchsorted(cdf, u16 / 65536.0, side="right")) + 1


def page_bytes(
    seed: int,
    url: str,
    *,
    n_hosts: int,
    alpha: float,
    max_links: int,
    formats: tuple = ("raw", "ppm", "png"),
) -> bytes:
    """Synthetic HTML-like body for a canonical page URL.

    Document order: n_links anchors then exactly one <img>. ~60% of
    links are same-host relative paths, ~40% cross-host absolute.
    ``formats`` is the image-format universe pages draw from (defaults
    to the lossless trio; include "ldt" for the lossy path).
    """
    H = _h(f"{seed}|{url}")
    n = _n_links(int.from_bytes(H[0:2], "big"), max_links)
    out = ["<html><body>"]
    for j in range(n):
        hj = _h(f"{seed}|{url}|link|{j}")
        if hj[0] < 154:  # ~60% same-host relative
            target = f"/p/{hj.hex()[:8]}"
        else:
            host = zipf_host(n_hosts, alpha, int.from_bytes(hj[1:3], "big"))
            target = f"http://h{host}.test/p/{hj.hex()[:8]}"
        out.append(f'<a href="{target}">t{j}</a>')
    fmt = formats[H[2] % len(formats)]
    hi = _h(f"{seed}|{url}|img")
    caption = "cap-" + H.hex()[:16]
    out.append(f'<img src="/img/{hi.hex()[:12]}.{fmt}" alt="{caption}">')
    out.append("</body></html>")
    return "\n".join(out).encode("utf-8")


_SIZES = (32, 48, 64, 96, 128)


def image_pixels(seed: int, image_url: str, sizes: tuple = _SIZES) -> np.ndarray:
    """Deterministic gradient image for a canonical image URL (B.2).
    ``sizes`` is a property of the synthetic universe (FIXTURES.md B.2
    default); bench configs may use a smaller palette."""
    Hi = _h(f"{seed}|{image_url}")
    w = sizes[Hi[0] % len(sizes)]
    h = sizes[Hi[1] % len(sizes)]
    ax, ay, ac = Hi[3], Hi[4], Hi[5]
    # int32 is exact here (terms are byte-sized x dims <= 2^7ish, far
    # below 2^31) and ~2x faster than the int64 original — same values
    x = np.arange(w, dtype=np.int32)[None, :, None]
    y = np.arange(h, dtype=np.int32)[:, None, None]
    c = np.arange(3, dtype=np.int32)[None, None, :]
    base = np.array([Hi[0], Hi[1], Hi[2]], np.int32)[None, None, :]
    return ((x * ax + y * ay + c * ac + base) % 256).astype(np.uint8)


def image_payload(
    seed: int, image_url: str, sizes: tuple = _SIZES
) -> tuple[int, int, str, bytes]:
    """(w, h, fmt, encoded bytes) for a canonical image URL; fmt comes
    from the URL extension (written by page_bytes)."""
    fmt = image_url.rsplit(".", 1)[-1]
    if fmt not in FORMATS:
        fmt = "raw"
    img = image_pixels(seed, image_url, sizes)
    h, w, _ = img.shape
    return w, h, fmt, encode(img, fmt)


def robots_rules(seed: int, host: str) -> list[tuple[str, bool]]:
    """Per-host robots prefix rules (B.4): ~5% full disallow, ~20%
    disallow one /p/<hexchar> prefix, else no rules (allow all)."""
    r = _h(f"{seed}|robots|{host}")
    if r[0] < 13:  # ~5%
        return [("/", False)]
    if r[0] < 64:  # ~20%
        return [("/p/" + "0123456789abcdef"[r[1] % 16], False)]
    return []
