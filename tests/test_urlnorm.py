"""M1-M4 golden vectors + idempotence property (SURVEY.md §5.2.1/2)."""

import string

import pytest
from hypothesis import given, strategies as st

from lulu_crawler_ray.functions import urlnorm

GOLDEN = [
    # (input, canonical)
    ("http://Example.COM/", "http://example.com/"),
    ("HTTP://example.com", "http://example.com/"),
    ("http://example.com:80/x", "http://example.com/x"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("http://example.com/a/./b", "http://example.com/a/b"),
    ("http://example.com/a/../b", "http://example.com/b"),
    ("http://example.com/a/b/../../c", "http://example.com/c"),
    ("http://example.com/../x", "http://example.com/x"),
    ("http://example.com/a/", "http://example.com/a/"),
    ("http://example.com/x#frag", "http://example.com/x"),
    ("http://example.com/#f", "http://example.com/"),
    ("http://example.com/%7Euser", "http://example.com/~user"),
    ("http://example.com/%7euser", "http://example.com/~user"),
    ("http://example.com/%2fx", "http://example.com/%2Fx"),
    ("http://example.com/%41%42", "http://example.com/AB"),
    ("http://example.com/a%zz", "http://example.com/a%zz"),  # malformed escape kept
    ("http://example.com/x?b=2&a=1", "http://example.com/x?b=2&a=1"),  # query untouched
    ("http://example.com/x?", "http://example.com/x"),
    ("http://example.com./x", "http://example.com/x"),
    ("  http://example.com/x  ", "http://example.com/x"),
    ("http://h0.test/s/0", "http://h0.test/s/0"),
    ("http://bücher.example/x", "http://xn--bcher-kva.example/x"),
    ("http://example.com/a/b/./../c/", "http://example.com/a/c/"),
    ("http://EXAMPLE.com:00080/y", "http://example.com/y"),
]


@pytest.mark.parametrize("raw,want", GOLDEN)
def test_golden(raw, want):
    assert urlnorm.canonicalize(raw) == want


@pytest.mark.parametrize("raw,want", GOLDEN)
def test_idempotent_golden(raw, want):
    assert urlnorm.canonicalize(want) == want


def test_rejects_relative():
    with pytest.raises(ValueError):
        urlnorm.canonicalize("/just/a/path")
    with pytest.raises(ValueError):
        urlnorm.canonicalize("notaurl")


_path_chars = st.text(
    alphabet=string.ascii_letters + string.digits + "/._~%-!$&'()*+,;=:@",
    max_size=40,
)


@given(
    host=st.from_regex(r"[a-z]([a-z0-9-]{0,10}[a-z0-9])?(\.[a-z]{2,5}){1,2}", fullmatch=True),
    path=_path_chars,
    query=st.text(alphabet=string.ascii_letters + string.digits + "=&%", max_size=20),
)
def test_idempotent_property(host, path, query):
    url = f"http://{host}/{path}"
    if query:
        url += f"?{query}"
    c = urlnorm.canonicalize(url)
    assert urlnorm.canonicalize(c) == c


@given(st.from_regex(r"http://[a-z]{1,8}\.test/[a-z0-9/]{0,20}", fullmatch=True))
def test_resolve_absolute_fixpoint(url):
    c = urlnorm.canonicalize(url)
    assert urlnorm.resolve("http://other.test/base", c) == c


def test_resolve_relative():
    assert urlnorm.resolve("http://h.test/a/b", "c") == "http://h.test/a/c"
    assert urlnorm.resolve("http://h.test/a/b", "/p/x") == "http://h.test/p/x"
    assert urlnorm.resolve("http://h.test/a/", "../x") == "http://h.test/x"


def test_sha1_known_vector():
    # sha1("http://example.com/") — classic test vector, computed with hashlib
    import hashlib

    assert urlnorm.sha1_bytes("http://example.com/") == hashlib.sha1(
        b"http://example.com/"
    ).digest()
    assert len(urlnorm.sha1_bytes("x")) == 20


def test_host_hash_range():
    hh = urlnorm.host_hash("h0.test")
    assert 0 <= hh < 2**64


# -- fast-path equivalence: the provably-canonical shortcut must agree
# with the full RFC pipeline on every input it might see ---------------
_seg = st.text(alphabet=string.ascii_letters + string.digits + "_~.-", min_size=1, max_size=8)


@given(
    host=st.from_regex(r"[a-z0-9]([a-z0-9.-]{0,12}[a-z0-9])?", fullmatch=True),
    segs=st.lists(_seg, max_size=4),
    trail=st.booleans(),
)
def test_fast_path_matches_full(host, segs, trail):
    url = f"http://{host}/" + "/".join(segs) + ("/" if trail and segs else "")
    from lulu_crawler_ray.functions.urlnorm import _fast_canonical, _remove_dot_segments, _norm_pct
    import urllib.parse as up

    if _fast_canonical(url):
        # full pipeline must be the identity exactly when the fast path fires
        parts = up.urlsplit(url)
        full = f"http://{parts.hostname.lower().rstrip('.')}" + (
            _remove_dot_segments(_norm_pct(parts.path)) or "/"
        )
        assert full == url


@given(
    base=st.from_regex(r"http://[a-z0-9]{1,8}\.test/[a-z0-9/]{0,12}", fullmatch=True),
    href=st.one_of(
        st.from_regex(r"/p/[a-f0-9]{1,8}", fullmatch=True),
        st.from_regex(r"http://h[0-9]{1,3}\.test/p/[a-f0-9]{1,8}", fullmatch=True),
        st.from_regex(r"[a-z0-9./%?#]{0,12}", fullmatch=True),
    ),
)
def test_resolve_fast_matches_urljoin(base, href):
    from urllib.parse import urljoin

    try:
        got = urlnorm.resolve(base, href)
    except ValueError:
        return
    want = urlnorm.canonicalize(urljoin(base, href))
    assert got == want
