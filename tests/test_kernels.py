"""Unit + property tests for image codecs, phash, cuckoo filter,
robots matcher, page generator (SURVEY.md §5.2.1/2)."""

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from lulu_crawler_ray.functions import imagecodec as ic
from lulu_crawler_ray.functions import pagegen, robots
from lulu_crawler_ray.functions.cuckoo import CuckooFilter
from lulu_crawler_ray.functions.htmlparse import extract_refs, norm_caption
from lulu_crawler_ray.functions.phash import hamming64, hamming64_vec, phash64


# ---------------------------------------------------------------- codecs
@pytest.mark.parametrize("fmt", ic.LOSSLESS)
@pytest.mark.parametrize("wh", [(32, 32), (48, 96), (1, 1), (128, 64)])
def test_codec_roundtrip(fmt, wh):
    w, h = wh
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    data = ic.encode(img, fmt)
    out = ic.decode(data, fmt)
    assert out.shape == img.shape
    assert (out == img).all()
    assert ic.psnr(img, out) == float("inf")  # lossless => PSNR >= 40dB trivially


@pytest.mark.parametrize("wh", [(32, 32), (48, 96), (1, 1), (128, 64), (33, 17)])
def test_ldt_lossy_roundtrip_psnr(wh):
    """The lossy DCT codec makes the PSNR >= 40 dB fidelity criterion
    (BASELINE.json:15) a REAL assertion: default quality clears it, a
    degraded quality measurably fails it, and the roundtrip is not
    bit-exact (genuinely lossy)."""
    w, h = wh
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    data = ic.encode(img, "ldt")
    out = ic.decode(data, "ldt")
    assert out.shape == img.shape
    assert ic.psnr(img, out) >= 40.0


def test_ldt_over_synthetic_universe():
    """Worst-case PSNR over the synthetic image universe clears 40 dB at
    the default quality; a low quality fails the gate (non-vacuous); the
    default-quality encoding is genuinely lossy on these images."""
    worst = float("inf")
    any_lossy = False
    for i in range(40):
        img = pagegen.image_pixels(42, f"http://h{i % 7}.test/img/{i:04x}.ldt")
        out = ic.decode(ic.encode(img, "ldt"), "ldt")
        worst = min(worst, ic.psnr(img, out))
        any_lossy = any_lossy or not np.array_equal(img, out)
    assert worst >= 40.0
    assert any_lossy
    # degraded quality: the same gate genuinely fails
    img = pagegen.image_pixels(42, "http://h0.test/img/0000.ldt")
    bad = ic.decode_ldt(ic.encode_ldt(img, quality=50), )
    assert ic.psnr(img, bad) < 40.0


def test_ldt_subsample_flag_roundtrip():
    """4:2:0 header flag decodes through the same path (lower fidelity
    on pixel-scale chroma detail, still shape-correct)."""
    img = pagegen.image_pixels(42, "http://h1.test/img/abcd.ldt")
    data = ic.encode_ldt(img, quality=90, subsample=True)
    out = ic.decode_ldt(data)
    assert out.shape == img.shape
    assert ic.psnr(img, out) > 10.0


def test_psnr_nontrivial():
    a = np.zeros((8, 8, 3), np.uint8)
    b = a.copy()
    b[0, 0, 0] = 255
    assert 0 < ic.psnr(a, b) < 100


def test_resize_nearest():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = ic.resize_nearest(img, 2, 2)
    assert out.shape == (2, 2, 3)
    assert (ic.resize_nearest(img, 4, 4) == img).all()


# ---------------------------------------------------------------- phash
def test_phash_deterministic_and_robust():
    img = pagegen.image_pixels(42, "http://h0.test/img/abc.raw")
    h1 = phash64(img)
    assert h1 == phash64(img.copy())
    assert -(2**63) <= h1 < 2**63
    # small noise -> small hamming distance
    noisy = img.astype(np.int16) + np.random.default_rng(1).integers(-4, 5, img.shape)
    h2 = phash64(noisy.clip(0, 255).astype(np.uint8))
    assert hamming64(h1, h2) <= 16
    # different image -> large distance
    other = pagegen.image_pixels(42, "http://h1.test/img/zzz.raw")
    assert hamming64(h1, phash64(other)) > 16


def test_hamming_vec_matches_scalar():
    rng = np.random.default_rng(3)
    a = rng.integers(-(2**62), 2**62, 50, np.int64)
    b = rng.integers(-(2**62), 2**62, 50, np.int64)
    vec = hamming64_vec(a, b)
    for i in range(50):
        assert vec[i] == hamming64(int(a[i]), int(b[i]))


# ---------------------------------------------------------------- cuckoo
def test_cuckoo_basic():
    f = CuckooFilter(1000, seed=1)
    keys = [hashlib.sha1(str(i).encode()).digest() for i in range(500)]
    for k in keys:
        assert f.add(k)
    for k in keys:
        assert k in f  # no false negatives
    absent = [hashlib.sha1(f"x{i}".encode()).digest() for i in range(5000)]
    fp = sum(k in f for k in absent)
    assert fp / 5000 < 0.01  # fp rate ~2^-13 at 4x16-bit; generous bound


def test_cuckoo_dump_load():
    f = CuckooFilter(100, seed=2)
    keys = [hashlib.sha1(str(i).encode()).digest() for i in range(80)]
    for k in keys:
        f.add(k)
    g = CuckooFilter.load(f.dump())
    assert g.size == f.size
    assert (g.table == f.table).all()
    for k in keys:
        assert k in g


@settings(max_examples=25)
@given(st.lists(st.binary(min_size=20, max_size=20), max_size=200, unique=True))
def test_cuckoo_no_false_negatives(keys):
    f = CuckooFilter(max(64, len(keys) * 2), seed=0)
    ok = [k for k in keys if f.add(k)]
    for k in ok:
        assert k in f


# ---------------------------------------------------------------- robots
def test_robots_longest_prefix():
    rules = [("/", False), ("/public", True)]
    assert not robots.allowed("/private/x", rules)
    assert robots.allowed("/public/x", rules)
    assert robots.allowed("/anything", [])
    # allow wins length ties
    assert robots.allowed("/p", [("/p", False), ("/p", True)])


def test_parse_robots_txt():
    txt = "User-agent: *\nDisallow: /private\nAllow: /private/ok\n\nUser-agent: bot\nDisallow: /\n"
    rules = robots.parse_robots_txt(txt)
    assert rules == [("/private", False), ("/private/ok", True)]
    assert robots.allowed("/private/ok/x", rules)
    assert not robots.allowed("/private/no", rules)


# ---------------------------------------------------------------- pagegen
def test_pagegen_deterministic():
    b1 = pagegen.page_bytes(42, "http://h0.test/s/0", n_hosts=50, alpha=1.1, max_links=12)
    b2 = pagegen.page_bytes(42, "http://h0.test/s/0", n_hosts=50, alpha=1.1, max_links=12)
    assert b1 == b2
    assert b1 != pagegen.page_bytes(43, "http://h0.test/s/0", n_hosts=50, alpha=1.1, max_links=12)


def test_pagegen_parse_shape():
    body = pagegen.page_bytes(42, "http://h0.test/s/0", n_hosts=50, alpha=1.1, max_links=12)
    refs = extract_refs(body)
    kinds = [k for _, k, _, _ in refs]
    assert kinds.count("image") == 1
    assert kinds[-1] == "image"  # image last in document order
    assert 1 <= kinds.count("link") <= 12
    js = [j for j, _, _, _ in refs]
    assert js == list(range(len(refs)))
    # image has a caption
    cap = refs[-1][3]
    assert cap.startswith("cap-") and len(cap) == 20


def test_image_payload_roundtrip():
    for ext in ("raw", "ppm", "png"):
        url = f"http://h0.test/img/0011aabbccdd.{ext}"
        w, h, fmt, data = pagegen.image_payload(42, url)
        assert fmt == ext
        img = ic.decode(data, fmt)
        assert img.shape == (h, w, 3)
        assert (img == pagegen.image_pixels(42, url)).all()


def test_caption_norm():
    assert norm_caption("  a\t\nb  ") == "a b"


def test_zipf_skew():
    # host 0 must receive noticeably more link mass than host 25
    hits = [pagegen.zipf_host(50, 1.1, v) for v in range(0, 65536, 13)]
    assert hits.count(0) > hits.count(25) > 0 or hits.count(0) > 50


def test_cuckoo_vectorized_lookup_matches_scalar():
    f = CuckooFilter(5000, seed=3)
    keys = [hashlib.sha1(str(i).encode()).digest() for i in range(3000)]
    for k in keys[:1500]:
        f.add(k)
    vec = f.contains_many_np(keys)
    assert (vec == np.array([k in f for k in keys])).all()
    assert f.contains_many_np([]).shape == (0,)


def test_cuckoo_capacity_math_for_1e10():
    """The BASELINE.json:6 capacity claim: 10^10 entries across K=64
    shards at 4-way/16-bit — verify the arithmetic the design rests on
    (SURVEY.md §5.3) without allocating it."""
    target, shards, load = 10**10, 64, 0.95
    per_shard = target / shards
    nb = 1
    while nb * 4 < per_shard / load:
        nb *= 2
    table_bytes = nb * 4 * 2  # uint16 slots
    assert table_bytes <= 600 * 2**20  # each shard's filter under 600 MB
    assert shards * table_bytes <= 40 * 2**30  # fleet-wide under 40 GB
    # and the constructor actually sizes that way
    f = CuckooFilter(1000)
    assert f.nbuckets * 4 >= 1000 / 0.95
    assert f.table.nbytes == f.nbuckets * 4 * 2


def test_image_table_io_fallback():
    """No lance wheel in this sandbox -> the IO seam must select the
    Parquet fallback (same schema, same call sites)."""
    from lulu_crawler_ray.sources import image_table

    assert image_table.LANCE_AVAILABLE is False


def test_cuckoo_add_many_equals_add():
    """Bulk insert (restore fast path) must preserve the zero-false-
    negative contract and agree with per-key add on membership."""
    import hashlib as _h

    keys = [_h.sha1(str(i).encode()).digest() for i in range(5000)]
    a = CuckooFilter(8192, seed=3)
    for k in keys:
        a.add(k)
    b = CuckooFilter(8192, seed=3)
    b.add_many(keys)
    assert b.size == len(keys)
    m = b.contains_many_np(keys)
    assert m.all()  # no false negatives
    # dense-prefix invariant survives bulk insert
    import numpy as np

    occ = b.table != 0
    assert (np.diff(occ.astype(int), axis=1) <= 0).all()


def test_cuckoo_add_many_into_loaded_filter():
    """Bulk insert on top of an already-populated filter (delta-chain
    replay shape) keeps earlier and later keys both present."""
    import hashlib as _h

    first = [_h.sha1(f"a{i}".encode()).digest() for i in range(2000)]
    second = [_h.sha1(f"b{i}".encode()).digest() for i in range(2000)]
    f = CuckooFilter(8192, seed=4)
    f.add_many(first)
    f.add_many(second)
    assert f.contains_many_np(first).all()
    assert f.contains_many_np(second).all()


def test_png_foreign_filters_decode():
    """decode_png must accept FOREIGN PNGs using filter types 1-4
    (Sub/Up/Average/Paeth), not only our filter-0 encoder output."""
    import struct
    import zlib

    import numpy as np

    from lulu_crawler_ray.functions.imagecodec import _PNG_SIG, decode_png

    rng = np.random.default_rng(8)
    h, w = 10, 13
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    raw = img.reshape(h, w * 3).astype(np.int32)

    def filt_row(y, ftype):
        cur = raw[y]
        prior = raw[y - 1] if y else np.zeros(w * 3, np.int32)
        left = np.r_[np.zeros(3, np.int32), cur[:-3]]
        ul = np.r_[np.zeros(3, np.int32), prior[:-3]]
        if ftype == 0:
            return cur % 256
        if ftype == 1:
            return (cur - left) % 256
        if ftype == 2:
            return (cur - prior) % 256
        if ftype == 3:
            return (cur - ((left + prior) >> 1)) % 256
        p = left + prior - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul))
        return (cur - pred) % 256

    scan = bytearray()
    for y in range(h):
        f = y % 5
        scan.append(f)
        scan += bytes(filt_row(y, f).astype(np.uint8))

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    png = (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), img)


def _png_chunk(tag, payload):
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _make_png(w, h, ctype, raw_rows, interlace=0, plte=b"", bit=8):
    """Assemble a PNG from pre-filtered scanline bytes (filter 0)."""
    import struct
    import zlib

    from lulu_crawler_ray.functions.imagecodec import _PNG_SIG

    out = _PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, bit, ctype, 0, 0, interlace)
    )
    if plte:
        out += _png_chunk(b"PLTE", plte)
    out += _png_chunk(b"IDAT", zlib.compress(raw_rows)) + _png_chunk(b"IEND", b"")
    return out


def test_png_color_type_variants_decode():
    """Round-5: real-web PNG variants — grayscale, palette, gray+alpha,
    RGBA — all decode to the (h, w, 3) RGB contract (alpha drops, gray
    replicates, palette indexes PLTE)."""
    import numpy as np

    from lulu_crawler_ray.functions.imagecodec import decode_png

    rng = np.random.default_rng(4)
    h, w = 9, 11

    def rows(px):  # filter-0 scanlines from (h, w, c) uint8
        c = px.shape[2]
        scan = np.empty((h, 1 + w * c), np.uint8)
        scan[:, 0] = 0
        scan[:, 1:] = px.reshape(h, w * c)
        return scan.tobytes()

    gray = rng.integers(0, 256, (h, w, 1), np.uint8)
    out = decode_png(_make_png(w, h, 0, rows(gray)))
    assert np.array_equal(out, np.repeat(gray, 3, axis=2))

    ga = rng.integers(0, 256, (h, w, 2), np.uint8)
    out = decode_png(_make_png(w, h, 4, rows(ga)))
    assert np.array_equal(out, np.repeat(ga[:, :, :1], 3, axis=2))

    rgba = rng.integers(0, 256, (h, w, 4), np.uint8)
    out = decode_png(_make_png(w, h, 6, rows(rgba)))
    assert np.array_equal(out, rgba[:, :, :3])

    pal = rng.integers(0, 256, (16, 3), np.uint8)
    idx = rng.integers(0, 16, (h, w, 1), np.uint8)
    out = decode_png(_make_png(w, h, 3, rows(idx), plte=pal.tobytes()))
    assert np.array_equal(out, pal[idx[:, :, 0]])


def test_png_adam7_interlace_decode():
    """Round-5: Adam7-interlaced RGB decode — the 7 pass sub-images
    (each independently filtered) must reassemble pixel-exactly."""
    import numpy as np

    from lulu_crawler_ray.functions.imagecodec import _ADAM7, decode_png

    rng = np.random.default_rng(6)
    for h, w in ((16, 16), (13, 9), (5, 3), (1, 1), (2, 10)):
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        raw = bytearray()
        for x0, y0, xs, ys in _ADAM7:
            sub = img[y0::ys, x0::xs]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            scan = np.empty((ph, 1 + pw * 3), np.uint8)
            scan[:, 0] = 0
            scan[:, 1:] = sub.reshape(ph, pw * 3)
            raw += scan.tobytes()
        out = decode_png(_make_png(w, h, 2, bytes(raw), interlace=1))
        assert np.array_equal(out, img), (h, w)


def test_png_rgba_foreign_filters_decode():
    """Filters 1-4 must unfilter correctly at bpp=4 (RGBA), not just
    the bpp=3 path the round-4 decoder hardcoded."""
    import numpy as np

    from lulu_crawler_ray.functions.imagecodec import decode_png

    rng = np.random.default_rng(9)
    h, w, c = 8, 7, 4
    img = rng.integers(0, 256, (h, w, c), np.uint8)
    raw = img.reshape(h, w * c).astype(np.int32)
    scan = bytearray()
    for y in range(h):
        f = y % 5
        cur = raw[y]
        prior = raw[y - 1] if y else np.zeros(w * c, np.int32)
        left = np.r_[np.zeros(c, np.int32), cur[:-c]]
        ul = np.r_[np.zeros(c, np.int32), prior[:-c]]
        if f == 0:
            enc = cur % 256
        elif f == 1:
            enc = (cur - left) % 256
        elif f == 2:
            enc = (cur - prior) % 256
        elif f == 3:
            enc = (cur - ((left + prior) >> 1)) % 256
        else:
            p = left + prior - ul
            pa, pb, pc_ = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc_), left, np.where(pb <= pc_, prior, ul))
            enc = (cur - pred) % 256
        scan.append(f)
        scan += bytes(enc.astype(np.uint8))
    out = decode_png(_make_png(w, h, 6, bytes(scan)))
    assert np.array_equal(out, img[:, :, :3])


def test_png_16bit_decode():
    """Round-5: 16-bit-per-channel PNGs (gray / RGB / RGBA / gray+alpha)
    reduce to the big-endian high byte and land in the (h, w, 3)
    contract."""
    import numpy as np

    from lulu_crawler_ray.functions.imagecodec import decode_png

    rng = np.random.default_rng(11)
    h, w = 7, 10

    def rows16(px16):  # (h, w, c) uint16 -> filter-0 big-endian scanlines
        c = px16.shape[2]
        be = px16.astype(">u2").view(np.uint8).reshape(h, w * c * 2)
        scan = np.empty((h, 1 + w * c * 2), np.uint8)
        scan[:, 0] = 0
        scan[:, 1:] = be
        return scan.tobytes()

    for ctype, c in ((0, 1), (2, 3), (4, 2), (6, 4)):
        px = rng.integers(0, 1 << 16, (h, w, c), np.uint16)
        out = decode_png(_make_png(w, h, ctype, rows16(px), bit=16))
        hi = (px >> 8).astype(np.uint8)
        want = {0: np.repeat(hi, 3, 2), 2: hi, 4: np.repeat(hi[:, :, :1], 3, 2), 6: hi[:, :, :3]}[ctype]
        assert np.array_equal(out, want), ctype


def test_png_16bit_foreign_filters_decode():
    """16-bit rows filtered with Sub/Up/Average/Paeth must unfilter at
    the spec's byte step (bpp = channels*2), not per 8-bit pixel."""
    import numpy as np

    from lulu_crawler_ray.functions.imagecodec import decode_png

    rng = np.random.default_rng(12)
    h, w, c = 9, 6, 3
    px = rng.integers(0, 1 << 16, (h, w, c), np.uint16)
    raw = px.astype(">u2").view(np.uint8).reshape(h, w * c * 2).astype(np.int32)
    bpp = c * 2
    scan = bytearray()
    for y in range(h):
        f = (y % 4) + 1  # filters 1-4 only
        cur = raw[y]
        prior = raw[y - 1] if y else np.zeros(w * bpp, np.int32)
        left = np.r_[np.zeros(bpp, np.int32), cur[:-bpp]]
        ul = np.r_[np.zeros(bpp, np.int32), prior[:-bpp]]
        if f == 1:
            enc = (cur - left) % 256
        elif f == 2:
            enc = (cur - prior) % 256
        elif f == 3:
            enc = (cur - ((left + prior) >> 1)) % 256
        else:
            p = left + prior - ul
            pa, pb, pc_ = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc_), left, np.where(pb <= pc_, prior, ul))
            enc = (cur - pred) % 256
        scan.append(f)
        scan += bytes(enc.astype(np.uint8))
    out = decode_png(_make_png(w, h, 2, bytes(scan), bit=16))
    assert np.array_equal(out, (px >> 8).astype(np.uint8))


def test_png_sub8bit_decode():
    """1/2/4-bit gray (full-range scaled) and 1/2/4-bit palette
    (PLTE-indexed) decode, including non-byte-aligned row widths."""
    import numpy as np

    from lulu_crawler_ray.functions.imagecodec import decode_png

    rng = np.random.default_rng(13)
    h, w = 6, 11  # 11 pixels: ragged at every sub-byte depth

    def pack_rows(codes, bit):  # (h, w) codes -> filter-0 packed scanlines
        per = 8 // bit
        padw = (w + per - 1) // per * per
        c = np.zeros((h, padw), np.uint8)
        c[:, :w] = codes
        shifts = (np.arange(per)[::-1] * bit).astype(np.uint8)
        packed = np.zeros((h, padw // per), np.uint8)
        for j in range(per):
            packed |= (c[:, j::per] << shifts[j]).astype(np.uint8)
        rowbytes = packed.shape[1]
        scan = np.empty((h, 1 + rowbytes), np.uint8)
        scan[:, 0] = 0
        scan[:, 1:] = packed
        return scan.tobytes()

    for bit in (1, 2, 4):
        codes = rng.integers(0, 1 << bit, (h, w), np.uint8)
        out = decode_png(_make_png(w, h, 0, pack_rows(codes, bit), bit=bit))
        scale = 255 // ((1 << bit) - 1)
        assert np.array_equal(out, np.repeat((codes * scale)[:, :, None].astype(np.uint8), 3, 2)), bit

        pal = rng.integers(0, 256, (1 << bit, 3), np.uint8)
        out = decode_png(_make_png(w, h, 3, pack_rows(codes, bit), plte=pal.tobytes(), bit=bit))
        assert np.array_equal(out, pal[codes]), bit


def test_sobel_stage_matches_naive_convolution():
    """SobelStage's shifted-slice kernels vs a literal per-pixel 3x3
    convolution with edge replication, on a random image — every
    emitted statistic must agree exactly."""
    import pyarrow as pa

    from lulu_crawler_ray.functions.imagecodec import encode
    from lulu_crawler_ray.pipelines.images_pipe import SobelStage

    rng = np.random.default_rng(123)
    img = rng.integers(0, 256, (13, 17, 3), np.uint8)
    t = pa.table(
        {
            "image_id": pa.array([1], pa.int64()),
            "bytes": pa.array([encode(img, "raw")], pa.binary()),
            "fmt": pa.array(["raw"], pa.string()),
        }
    )
    got = SobelStage()(t)

    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.int64)
    ky = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.int64)
    g = img.astype(np.int64).sum(axis=2)
    p = np.pad(g, 1, mode="edge")
    h, w = g.shape
    gx = np.zeros((h, w), np.int64)
    gy = np.zeros((h, w), np.int64)
    for y in range(h):
        for x in range(w):
            win = p[y : y + 3, x : x + 3]
            gx[y, x] = int((win * kx).sum())
            gy[y, x] = int((win * ky).sum())
    edge = gx * gx + gy * gy >= 900 * 900
    yw = np.arange(1, h + 1, dtype=np.int64)[:, None]
    xw = np.arange(1, w + 1, dtype=np.int64)[None, :]
    assert got["grad_abs_sum"][0].as_py() == int((np.abs(gx) + np.abs(gy)).sum())
    assert got["n_edge"][0].as_py() == int(edge.sum())
    assert got["edge_wsum"][0].as_py() == int((yw * xw * edge).sum())


def test_otsu_stage_matches_float_reference():
    """OtsuStage's exact cross-multiplied argmax vs the textbook float
    between-class-variance scan on random images (away from exact ties
    the two agree; ties are absent w.h.p. in random data). Also checks
    the degenerate constant image: no valid split -> thr 0, all fg."""
    import pyarrow as pa

    from lulu_crawler_ray.functions.imagecodec import encode
    from lulu_crawler_ray.pipelines.images_pipe import OtsuStage

    rng = np.random.default_rng(99)
    imgs = [rng.integers(0, 256, (21, 33, 3), np.uint8) for _ in range(4)]
    imgs.append(np.full((9, 9, 3), 40, np.uint8))  # constant: W == w0 everywhere
    t = pa.table(
        {
            "image_id": pa.array(range(len(imgs)), pa.int64()),
            "bytes": pa.array([encode(im, "raw") for im in imgs], pa.binary()),
            "fmt": pa.array(["raw"] * len(imgs), pa.string()),
        }
    )
    got = OtsuStage()(t)
    for i, img in enumerate(imgs[:-1]):
        g = img.astype(np.int64).sum(axis=2)
        hist = np.bincount(g.ravel(), minlength=766).astype(np.float64)
        w0 = np.cumsum(hist)
        s0 = np.cumsum(hist * np.arange(766))
        W, S = w0[-1], s0[-1]
        best_t, best_v = 0, -1.0
        for tt in range(766):
            wa = w0[tt]
            if wa == 0 or wa == W:
                continue
            v = (s0[tt] * W - wa * S) ** 2 / (wa * (W - wa))
            if v > best_v:
                best_t, best_v = tt, v
        assert got["otsu_thr"][i].as_py() == best_t
        assert got["n_fg"][i].as_py() == int((g > best_t).sum())
    assert got["otsu_thr"][len(imgs) - 1].as_py() == 0
    assert got["n_fg"][len(imgs) - 1].as_py() == 81  # 40*3 > 0 everywhere


def test_blob_stats_matches_flood_fill():
    """Run-based union-find CCL vs a naive BFS flood fill on random and
    structured masks (checkerboard = every pixel its own 4-conn blob;
    full = one blob; empty = zero)."""
    from collections import deque

    from lulu_crawler_ray.pipelines.images_pipe import _blob_stats

    def naive(mask):
        seen = np.zeros_like(mask, bool)
        h, w = mask.shape
        count, best = 0, 0
        for y in range(h):
            for x in range(w):
                if mask[y, x] and not seen[y, x]:
                    count += 1
                    size = 0
                    dq = deque([(y, x)])
                    seen[y, x] = True
                    while dq:
                        cy, cx = dq.popleft()
                        size += 1
                        for ny, nx in ((cy-1, cx), (cy+1, cx), (cy, cx-1), (cy, cx+1)):
                            if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] and not seen[ny, nx]:
                                seen[ny, nx] = True
                                dq.append((ny, nx))
                    best = max(best, size)
        return count, best

    rng = np.random.default_rng(5)
    masks = [rng.random((h, w)) < p for h, w, p in
             ((12, 15, 0.3), (20, 20, 0.5), (7, 31, 0.7), (16, 16, 0.05))]
    cb = np.indices((10, 10)).sum(axis=0) % 2 == 0
    masks += [cb, np.ones((6, 6), bool), np.zeros((4, 9), bool)]
    for m in masks:
        assert _blob_stats(m) == naive(m)


def test_histeq_stage_matches_reference():
    """HistEqStage's integer LUT vs a literal per-pixel re-derivation
    of the textbook equalization map (floor semantics asserted
    exactly), plus the constant-image degenerate (maps to 0) and the
    monotonicity property (equalization never reorders gray levels)."""
    import pyarrow as pa

    from lulu_crawler_ray.functions.imagecodec import encode
    from lulu_crawler_ray.pipelines.images_pipe import HistEqStage

    rng = np.random.default_rng(123)
    imgs = [rng.integers(0, 256, (17, 29, 3), np.uint8) for _ in range(4)]
    imgs.append(np.full((8, 11, 3), 77, np.uint8))  # constant
    t = pa.table(
        {
            "image_id": pa.array(range(len(imgs)), pa.int64()),
            "bytes": pa.array([encode(im, "raw") for im in imgs], pa.binary()),
            "fmt": pa.array(["raw"] * len(imgs), pa.string()),
        }
    )
    got = HistEqStage()(t)
    for i, img in enumerate(imgs[:-1]):
        g = img.astype(np.int64).sum(axis=2)
        hist = np.bincount(g.ravel(), minlength=766)
        cdf = np.cumsum(hist)
        npix = int(cdf[-1])
        cdf_min = int(cdf[np.flatnonzero(hist)[0]])
        # per-pixel reference, plain python ints
        esum = 0
        ewsum = 0
        h, w = g.shape
        for y in range(h):
            for x in range(w):
                m = (int(cdf[g[y, x]]) - cdf_min) * 765 // (npix - cdf_min)
                esum += m
                ewsum += (y + 1) * (x + 1) * m
        assert got["eq_sum"][i].as_py() == esum
        assert got["eq_wsum"][i].as_py() == ewsum
        # monotone: sorted gray levels map to sorted outputs
        lut = (cdf - cdf_min) * 765 // (npix - cdf_min)
        assert (np.diff(lut) >= 0).all()
        # range holds on POPULATED bins (below cdf_min no pixel exists;
        # the stage clamps those unreachable entries to 0)
        pop = lut[hist > 0]
        assert pop.min() >= 0 and pop.max() <= 765
    assert got["eq_sum"][len(imgs) - 1].as_py() == 0  # constant -> all 0


def test_resize_bilinear_identity_and_constant():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert np.array_equal(ic.resize_bilinear(img, 17, 13), img)
    c = np.full((9, 7, 3), 137, np.uint8)
    assert (ic.resize_bilinear(c, 20, 5) == 137).all()
    g = rng.integers(0, 256, (11, 6), dtype=np.uint8)
    assert ic.resize_bilinear(g, 8, 8).shape == (8, 8)


def test_resize_bilinear_matches_rational_reference():
    """The vectorized fixed-point kernel == a per-pixel plain-python-int
    re-derivation of the half-pixel-center bilinear formula (keeps the
    img_resize_bilinear_digest golden pin honest)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)

    def naive(img, w, h):
        sh, sw = img.shape[:2]
        out = np.zeros((h, w, img.shape[2]), np.uint8)
        for dy in range(h):
            ny = (2 * dy + 1) * sh - h
            y0 = ny // (2 * h)
            fy = ny - y0 * 2 * h
            ya, yb = min(max(y0, 0), sh - 1), min(max(y0 + 1, 0), sh - 1)
            for dx in range(w):
                nx = (2 * dx + 1) * sw - w
                x0 = nx // (2 * w)
                fx = nx - x0 * 2 * w
                xa, xb = min(max(x0, 0), sw - 1), min(max(x0 + 1, 0), sw - 1)
                for ch in range(img.shape[2]):
                    p00, p01 = int(img[ya, xa, ch]), int(img[ya, xb, ch])
                    p10, p11 = int(img[yb, xa, ch]), int(img[yb, xb, ch])
                    acc = (2 * h - fy) * ((2 * w - fx) * p00 + fx * p01) + fy * (
                        (2 * w - fx) * p10 + fx * p11
                    )
                    den = 4 * w * h
                    out[dy, dx, ch] = (acc + den // 2) // den
        return out

    for (w, h) in [(5, 9), (30, 4), (1, 1), (40, 24)]:
        assert np.array_equal(ic.resize_bilinear(img, w, h), naive(img, w, h)), (w, h)


def test_trainprep_stage_matches_naive_composition():
    """TrainPrepStage == the straightforward resize->crop->stats
    composition recomputed per image (keeps the img_trainprep_digest
    pin honest); square images crop nothing."""
    import pyarrow as pa

    from lulu_crawler_ray.pipelines.images_pipe import TrainPrepStage, build_image_fixture

    t = build_image_fixture(24)
    got = TrainPrepStage()(t)
    S = TrainPrepStage.S
    for i in range(t.num_rows):
        img = ic.decode(t["bytes"][i].as_py(), t["fmt"][i].as_py())
        h, w = img.shape[:2]
        if h <= w:
            nh, nw = S, (2 * w * S + h) // (2 * h)
        else:
            nh, nw = (2 * h * S + w) // (2 * w), S
        r = ic.resize_bilinear(img, nw, nh)
        oy, ox = (nh - S) // 2, (nw - S) // 2
        c = r[oy : oy + S, ox : ox + S].astype(np.int64)
        assert got["r_sum"][i].as_py() == int(c[:, :, 0].sum())
        assert got["sq_sum"][i].as_py() == int((c * c).sum())
    # square image: crop is a no-op (resize IS the SxS grid)
    sq_img = np.arange(50 * 50 * 3, dtype=np.int64).reshape(50, 50, 3) % 256
    sq_img = sq_img.astype(np.uint8)
    enc = ic.encode(sq_img, "png")
    t2 = pa.table(
        {
            "image_id": pa.array(["sq"]),
            "bytes": pa.array([enc], pa.binary()),
            "fmt": pa.array(["png"]),
        }
    )
    got2 = TrainPrepStage()(t2)
    ref = ic.resize_bilinear(sq_img, S, S).astype(np.int64)
    assert got2["r_sum"][0].as_py() == int(ref[:, :, 0].sum())


def test_resample_linear_int16_matches_rational_reference():
    """Integer linear resampler == per-sample plain-int re-derivation
    (keeps the audio_resample_digest golden pin honest); identity and
    constant-signal properties hold."""
    from lulu_crawler_ray.stages.multimodal import resample_linear_int16

    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32768, 777, dtype=np.int16)
    assert np.array_equal(resample_linear_int16(x, 8000, 8000), x)
    c = np.full(100, -1234, np.int16)
    assert (resample_linear_int16(c, 8000, 16000) == -1234).all()

    def naive(x, si, so):
        n = len(x)
        m = n * so // si
        out = np.empty(m, np.int16)
        for t in range(m):
            num = t * si
            i0 = num // so
            f = num - i0 * so
            i1 = min(i0 + 1, n - 1)
            acc = int(x[i0]) * (so - f) + int(x[i1]) * f
            q, r = divmod(abs(acc), so)
            v = q + (1 if 2 * r >= so else 0)
            out[t] = v if acc >= 0 else -v
        return out

    for (si, so) in [(8000, 16000), (16000, 8000), (8000, 11025), (44100, 16000)]:
        assert np.array_equal(resample_linear_int16(x, si, so), naive(x, si, so)), (si, so)


def test_clip_sampler_matches_index_law():
    """ClipSampler == the TSN segment-center law recomputed directly
    on the decoded frames (keeps the video_clip_digest pin honest)."""
    import pyarrow as pa

    from lulu_crawler_ray.stages.multimodal import (
        ClipSampler,
        decode_avi_rgb24,
        encode_avi_rgb24,
    )

    frames = [
        ((np.indices((16, 16)).sum(axis=0)[:, :, None] * 3 + 7 * kf) % 256)
        .astype(np.uint8)
        .repeat(3, axis=2)
        for kf in range(17)  # N not divisible by S
    ]
    data = encode_avi_rgb24(frames, fps=10)
    t = pa.table(
        {
            "media_id": pa.array(["x"]),
            "bytes": pa.array([data], pa.binary()),
            "codec": pa.array(["avi"]),
        }
    )
    got = ClipSampler(n_segments=5)(t)
    dec, _ = decode_avi_rgb24(data)
    n, S = len(dec), 5
    for s in range(S):
        lo, hi = s * n // S, (s + 1) * n // S
        idx = lo + (hi - lo - 1) // 2
        assert got["frame_idx"][s].as_py() == idx
        g = dec[idx].astype(np.int64).sum(axis=2)
        assert got["px_sum"][s].as_py() == int(g.sum())
    # more segments than frames: one per frame
    t2 = pa.table(
        {
            "media_id": pa.array(["y"]),
            "bytes": pa.array([encode_avi_rgb24(frames[:3], fps=10)], pa.binary()),
            "codec": pa.array(["avi"]),
        }
    )
    got2 = ClipSampler(n_segments=5)(t2)
    assert got2.num_rows == 3
    assert got2["frame_idx"].to_pylist() == [0, 1, 2]


def test_morph3_matches_naive_neighborhood():
    """MorphStage's shifted-slice 3x3 erode/dilate vs a per-pixel
    neighborhood loop with edge replication, on random, constant and
    single-pixel masks."""
    import numpy as np

    from lulu_crawler_ray.pipelines.images_pipe import _morph3

    rng = np.random.default_rng(5)

    def naive(mask, op):
        h, w = mask.shape
        p = np.pad(mask, 1, mode="edge")
        out = np.zeros_like(mask)
        for y in range(h):
            for x in range(w):
                nb = p[y : y + 3, x : x + 3]
                out[y, x] = nb.all() if op == "erode" else nb.any()
        return out

    cases = [
        rng.random((9, 7)) > 0.5,
        np.zeros((5, 5), bool),
        np.ones((5, 5), bool),
        np.eye(6, dtype=bool),
    ]
    one = np.zeros((5, 5), bool)
    one[2, 2] = True
    cases.append(one)
    for m in cases:
        for op in ("erode", "dilate"):
            assert (_morph3(m, op) == naive(m, op)).all(), op
    # opening removes an isolated pixel, keeps a 3x3 block
    block = np.zeros((7, 7), bool)
    block[2:5, 2:5] = True
    speck = block.copy()
    speck[0, 6] = True
    opened = _morph3(_morph3(speck, "erode"), "dilate")
    assert (opened == block).all()


def test_rle_mask_roundtrip():
    """rle_decode(rle_encode(m)) == m on random, constant, leading-fg,
    single-pixel and checkerboard masks; encoding starts with a
    background run (COCO convention)."""
    import numpy as np

    from lulu_crawler_ray.pipelines.images_pipe import (
        rle_decode_mask,
        rle_encode_mask,
    )

    rng = np.random.default_rng(11)
    cases = [
        rng.random((8, 6)) > 0.5,
        np.zeros((4, 4), bool),
        np.ones((4, 4), bool),
        np.indices((5, 5)).sum(axis=0) % 2 == 0,  # checkerboard, fg at (0,0)
    ]
    one = np.zeros((3, 3), bool)
    one[0, 0] = True
    cases.append(one)
    for m in cases:
        runs = rle_encode_mask(m)
        assert runs.sum() == m.size
        # even indices are background runs: a leading-fg mask must
        # start with a zero-length bg run
        if m.ravel(order="F")[0]:
            assert runs[0] == 0
        back = rle_decode_mask(runs, *m.shape)
        assert (back == m).all()


def test_wht_parseval_and_naive_hadamard():
    """wht_fast vs the O(n^2) explicit Hadamard-matrix product, plus
    the exact Parseval identity sum(X^2) == n * sum(x^2) and the
    non-power-of-two loud failure."""
    import numpy as np
    import pytest

    from lulu_crawler_ray.stages.multimodal import wht_fast

    def hadamard(n):
        H = np.array([[1]], np.int64)
        while H.shape[0] < n:
            H = np.block([[H, H], [H, -H]])
        return H

    rng = np.random.default_rng(3)
    for n in (1, 2, 4, 8, 64, 256):
        x = rng.integers(-32768, 32768, n).astype(np.int64)
        got = wht_fast(x)
        want = hadamard(n) @ x
        assert (got == want).all(), n
        assert int((got.astype(object) ** 2).sum()) == n * int(
            (x.astype(object) ** 2).sum()
        )
    with pytest.raises(ValueError):
        wht_fast(np.zeros(6, np.int64))


def test_midcut_palette_matches_naive_and_degenerates():
    """midcut_palette vs an independent per-pixel implementation of
    the same split rule, plus the constant-image (1 box, 0 error) and
    exact-two-color (error 0 with enough rounds) degenerates."""
    import numpy as np

    from lulu_crawler_ray.pipelines.images_pipe import midcut_palette

    def naive(img, rounds=2):
        px = [tuple(int(v) for v in p) for p in img.reshape(-1, 3)]
        boxes = [list(range(len(px)))]
        for _ in range(rounds):
            out = []
            for box in boxes:
                los = [min(px[i][c] for i in box) for c in range(3)]
                his = [max(px[i][c] for i in box) for c in range(3)]
                rngs = [h - l for h, l in zip(his, los)]
                c = rngs.index(max(rngs))
                if rngs[c] == 0:
                    out.append(box)
                    continue
                t = (los[c] + his[c]) // 2
                out.append([i for i in box if px[i][c] <= t])
                out.append([i for i in box if px[i][c] > t])
            boxes = out
        pal, err = [], 0
        for box in boxes:
            col = [sum(px[i][c] for i in box) // len(box) for c in range(3)]
            pal.append(col)
            err += sum(abs(px[i][c] - col[c]) for i in box for c in range(3))
        return np.array(pal, np.int64), err

    rng = np.random.default_rng(9)
    for _ in range(5):
        img = rng.integers(0, 256, (6, 5, 3)).astype(np.uint8)
        pal_f, _lab, err_f = midcut_palette(img)
        pal_n, err_n = naive(img)
        assert (pal_f == pal_n).all()
        assert err_f == err_n

    const = np.full((4, 4, 3), 77, np.uint8)
    pal, lab, err = midcut_palette(const)
    assert len(pal) == 1 and err == 0 and (pal[0] == 77).all()

    two = np.zeros((4, 4, 3), np.uint8)
    two[:, 2:] = 200
    pal, lab, err = midcut_palette(two, rounds=2)
    assert err == 0  # two pure colors separate exactly


def test_shared_tiles_finds_exactly_the_planted_watermark(ray_session):
    """The tile detector over the fixture must mark exactly the
    stamped subset (same-shape images share the full watermark tile;
    the naive recompute is an independent dict-based pass)."""
    import numpy as np

    from lulu_crawler_ray.functions.imagecodec import decode
    from lulu_crawler_ray.pipelines.images_pipe import (
        _WATERMARK,
        _is_stamped,
        _tile_hashes,
        TileHashStage,
        build_image_fixture,
    )

    t = build_image_fixture(60)
    # naive: per image the distinct tile hash set, then dict counting
    sets = {}
    for i in range(t.num_rows):
        img = decode(t["bytes"][i].as_py(), t["fmt"][i].as_py())
        iid = t["image_id"][i].as_py()
        if _is_stamped(iid):
            img = img.copy()
            img[:16, :16, :] = _WATERMARK[: img.shape[0], : img.shape[1], :]
        sets[iid] = set(np.unique(_tile_hashes(img)).tolist())
    counts = {}
    for s in sets.values():
        for h in s:
            counts[h] = counts.get(h, 0) + 1
    naive_shared = {
        iid: sum(1 for h in s if counts[h] >= 2) for iid, s in sets.items()
    }
    # the stage emits the same pair set
    out = TileHashStage()(t)
    got = {}
    for iid, h in zip(out["image_id"].to_pylist(), out["tile_hash"].to_pylist()):
        got.setdefault(iid, set()).add(h)
    assert got == sets
    # every image with a shared tile is stamped OR shares by size-
    # truncated stamp; at minimum, two same-shape stamped images share
    stamped = [iid for iid in sets if _is_stamped(iid)]
    assert len(stamped) >= 2
    shared_imgs = {iid for iid, n in naive_shared.items() if n > 0}
    assert shared_imgs, "planted watermark must be detected"
    assert all(_is_stamped(iid) for iid in shared_imgs), (
        "only stamped images may share tiles in this fixture"
    )


def test_img_prep_v2_stage_equals_component_stages(ray_session):
    """The composed single-decode ImgPrepV2Stage must emit exactly what
    the standalone Blur/Blob/Palette stages emit — the read-once
    optimization can never change a gate signal."""
    from lulu_crawler_ray.pipelines.images_pipe import (
        BlobStage,
        BlurScoreStage,
        ImgPrepV2Stage,
        PaletteStage,
        build_image_fixture,
    )

    t = build_image_fixture(24)
    comp = ImgPrepV2Stage()(t)
    blur = BlurScoreStage()(t)
    blob = BlobStage()(t)
    pal = PaletteStage()(t)
    assert comp["sharpness_c"].to_pylist() == blur["sharpness_c"].to_pylist()
    assert comp["n_blobs"].to_pylist() == blob["n_blobs"].to_pylist()
    assert comp["pal_err"].to_pylist() == pal["l1_err"].to_pylist()


def test_audio_prep_v2_planted_vad_law(ray_session):
    """The capstone's VAD must find EXACTLY the planted burst count per
    file through every real codec (wav PCM, IMA-ADPCM, FLAC)."""
    import pyarrow as pa

    from lulu_crawler_ray.pipelines.images_pipe import (
        AudioPrepV2Stage,
        _audio_prep_fixture,
    )

    ds = _audio_prep_fixture(18)
    t = pa.concat_tables(
        list(
            ds.map_batches(
                AudioPrepV2Stage,
                batch_format="pyarrow",
                batch_size=16,
                concurrency=1,
            ).iter_batches(batch_format="pyarrow")
        )
    )
    got = dict(zip(t["media_id"].to_pylist(), t["n_segments"].to_pylist()))
    for i in range(18):
        assert got[f"ap{i:04d}"] == 1 + (i // 3) % 3, (i, got[f"ap{i:04d}"])
    # resampled spectral energy is nonzero for every file (tones carry
    # band mass; a broken resample or WHT would zero it)
    assert all(v > 0 for v in t["band0_l1"].to_pylist())


def test_video_prep_v2_planted_scene_law(ray_session):
    """The capstone's cut detector must find exactly scenes-1 cuts per
    video through BOTH real containers (RGB24 and MJPEG AVIs)."""
    import pyarrow as pa

    from lulu_crawler_ray.pipelines.images_pipe import (
        VideoPrepV2Stage,
        _video_prep_fixture,
    )

    ds = _video_prep_fixture(12)
    t = pa.concat_tables(
        list(
            ds.map_batches(
                VideoPrepV2Stage,
                batch_format="pyarrow",
                batch_size=8,
                concurrency=1,
            ).iter_batches(batch_format="pyarrow")
        )
    )
    got = dict(zip(t["media_id"].to_pylist(), t["n_cuts"].to_pylist()))
    for v in range(12):
        assert got[f"vp{v:03d}"] == (v // 2) % 3, (v, got[f"vp{v:03d}"])
    assert set(t["codec"].to_pylist()) == {"avi", "mjpeg"}
