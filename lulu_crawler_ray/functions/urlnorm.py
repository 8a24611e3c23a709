"""URL canonicalization (M1-M4) — the normative algorithm of SURVEY.md §3.2.1.

Canonical form c(u): RFC-3986 parse; lowercase scheme+host; strip
fragment; drop default ports (:80 http, :443 https); resolve "." / ".."
path segments; empty path -> "/"; percent-decode only unreserved
characters and uppercase remaining escapes; preserve the query string
byte-for-byte (no param sorting — sorting merges distinct resources);
IDN hosts to punycode. Idempotent by construction (property-tested).

This module is shared by the Ray engine and the single-threaded oracle
crawler, so "canonicalization equality" is structural.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urlsplit, urljoin

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = set("0123456789abcdefABCDEF")
_DEFAULT_PORT = {"http": "80", "https": "443"}


def _norm_pct(s: str) -> str:
    """Percent-decode unreserved chars; uppercase remaining escapes;
    leave malformed escapes untouched."""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "%" and i + 2 <= n - 1 and s[i + 1] in _HEX and s[i + 2] in _HEX:
            val = chr(int(s[i + 1 : i + 3], 16))
            if val in _UNRESERVED:
                out.append(val)
            else:
                out.append("%" + s[i + 1 : i + 3].upper())
            i += 3
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1) if path.startswith("/") else path.find("/")
            if i == -1:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


# fast path: URLs that PROVABLY equal their canonical form — lowercase
# http scheme+host, no port/userinfo/query/fragment/percent-escapes,
# non-empty path with no empty or dot segments. The crawl's synthetic
# URLs are almost all of this shape; correctness is guarded by the
# hypothesis test asserting fast == full on generated inputs.
_FAST_CANON = re.compile(
    r"^http://[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?"
    r"/(?:[A-Za-z0-9_~.-]+(?:/[A-Za-z0-9_~.-]+)*/?)?$"
)


def _fast_canonical(u: str) -> bool:
    return (
        _FAST_CANON.match(u) is not None
        and "/../" not in u
        and "/./" not in u
        and not u.endswith(("/..", "/."))
    )


def canonicalize(url: str) -> str:
    """c(u) — see module docstring. Raises ValueError on unparseable URLs."""
    if _fast_canonical(url):
        return url
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = parts.hostname or ""
    if not scheme or not host:
        raise ValueError(f"not an absolute URL: {url!r}")
    try:
        host = host.encode("idna").decode("ascii") if not host.isascii() else host
    except UnicodeError:
        raise ValueError(f"bad IDN host: {url!r}")
    host = host.lower().rstrip(".")
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORT.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = _norm_pct(parts.path)
    path = _remove_dot_segments(path) or "/"
    if not path.startswith("/"):
        path = "/" + path
    query = parts.query  # preserved byte-for-byte; fragment stripped
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += f"?{query}"
    return out


def resolve(base: str, href: str) -> str:
    """M4 — relative->absolute join against a (canonical) base, then c()."""
    if _fast_canonical(href):
        return href
    if href.startswith("/") and not href.startswith("//") and _fast_canonical(base):
        cand = "http://" + base[7:].split("/", 1)[0] + href
        if _fast_canonical(cand):
            return cand
    return canonicalize(urljoin(base, href))


def sha1_bytes(canonical_url: str) -> bytes:
    """M2 — url_sha1 = SHA1(utf8(canonical)) (BASELINE.json:6)."""
    return hashlib.sha1(canonical_url.encode("utf-8")).digest()


def host_of(canonical_url: str) -> str:
    """M3 — registrable host, lowercased (already lowered by c())."""
    return urlsplit(canonical_url).hostname or ""


def path_of(canonical_url: str) -> str:
    """Path component for robots matching (query excluded)."""
    return urlsplit(canonical_url).path or "/"


def host_hash(host: str) -> int:
    """M3 — uint64 prefix of SHA1(host): the range-partitioning key."""
    return int.from_bytes(hashlib.sha1(host.encode("utf-8")).digest()[:8], "big")


def frontier_fields(url: str) -> tuple[str, bytes, str, int]:
    """(canonical, url_sha1, host, host_hash) in one pass."""
    c = canonicalize(url)
    h = host_of(c)
    return c, sha1_bytes(c), h, host_hash(h)
