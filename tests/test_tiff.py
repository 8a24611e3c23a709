"""TIFF codec (functions/tiff.py): LZW/PackBits/uncompressed strips,
both byte orders, photometrics, predictor, multi-strip."""

import struct

import numpy as np

from lulu_crawler_ray.functions.tiff import (
    _lzw_decode_tiff,
    _lzw_encode_tiff,
    _unpackbits,
    decode_tiff,
    encode_tiff,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


def test_roundtrip_uncompressed_and_lzw():
    for h, w in ((5, 7), (1, 1), (64, 64), (9, 13)):
        img = _rng(h * w).integers(0, 256, (h, w, 3), np.uint8)
        assert np.array_equal(decode_tiff(encode_tiff(img, 1)), img), (h, w)
        assert np.array_equal(decode_tiff(encode_tiff(img, 5)), img), (h, w)


def test_lzw_width_growth_and_reset():
    # 64x64x3 random bytes push the dictionary past 511, 1023, 2047 and
    # through at least one Clear/reset cycle
    data = _rng(42).integers(0, 256, 20000, np.uint8).tobytes()
    enc = _lzw_encode_tiff(data)
    assert _lzw_decode_tiff(enc, len(data)) == data
    # highly repetitive data (long matches, sparse dictionary)
    data = b"abcabcabc" * 3000
    enc = _lzw_encode_tiff(data)
    assert len(enc) < len(data) // 3  # it actually compresses
    assert _lzw_decode_tiff(enc, len(data)) == data


def test_unpackbits():
    # literal(3) "abc", repeat 'z' x4, noop(-128), literal(1) "qr"[0:2]
    stream = bytes([2]) + b"abc" + bytes([253]) + b"z" + bytes([128]) + bytes([1]) + b"qr"
    assert _unpackbits(stream, 9) == b"abczzzzqr"


def _ifd_le(entries, tail=b"", data_off=None):
    """Assemble a little-endian TIFF from (tag, type, count, value)
    entries; values > 4 bytes must already be in ``tail`` with correct
    offsets."""
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3 and cnt == 1:
            out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += tail
    return bytes(out)


def test_gray_and_whiteiszero():
    h, w = 4, 6
    g = _rng(1).integers(0, 256, (h, w), np.uint8)
    base = 8 + 2 + 12 * 7 + 4
    for photo in (0, 1):
        entries = [
            (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, photo), (273, 4, 1, base), (279, 4, 1, h * w),
        ]
        data = _ifd_le(entries, tail=g.tobytes())
        want = (255 - g) if photo == 0 else g
        assert np.array_equal(decode_tiff(data), np.repeat(want[:, :, None], 3, 2))


def test_palette_colormap():
    h, w = 3, 5
    idx = _rng(2).integers(0, 16, (h, w), np.uint8)
    pal8 = _rng(3).integers(0, 256, (16, 3), np.uint8)
    cmap = (pal8.astype(np.uint16) << 8).T  # (3, 16) 16-bit entries
    base = 8 + 2 + 12 * 8 + 4
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3), (273, 4, 1, base + 96), (279, 4, 1, h * w),
        (320, 3, 48, base),
    ]
    tail = cmap.astype("<u2").tobytes() + idx.tobytes()
    assert np.array_equal(decode_tiff(_ifd_le(entries, tail=tail)), pal8[idx])


def test_big_endian_gray():
    h, w = 2, 3
    g = np.array([[1, 2, 3], [250, 128, 0]], np.uint8)
    base = 8 + 2 + 12 * 7 + 4
    out = bytearray(b"MM\x00*" + struct.pack(">I", 8))
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, base), (279, 4, 1, h * w),
    ]
    out += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        if typ == 3:
            out += struct.pack(">HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack(">HHII", tag, typ, cnt, val)
    out += struct.pack(">I", 0) + g.tobytes()
    assert np.array_equal(decode_tiff(bytes(out)), np.repeat(g[:, :, None], 3, 2))


def test_predictor2_and_multistrip():
    h, w = 6, 5
    img = _rng(4).integers(0, 256, (h, w, 3), np.uint8)
    diff = img.astype(np.int16).copy()
    diff[:, 1:] = (img[:, 1:].astype(np.int16) - img[:, :-1].astype(np.int16)) % 256
    diff = diff.astype(np.uint8)
    rps = 2
    strips = [diff[i : i + rps].tobytes() for i in range(0, h, rps)]
    base = 8 + 2 + 12 * 10 + 4
    offs, offcur = [], base + 2 * len(strips) * 4
    for s in strips:
        offs.append(offcur)
        offcur += len(s)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, base - 6 - 6),  # placeholder
        (259, 3, 1, 1), (262, 3, 1, 2),
        (273, 4, 3, base), (277, 3, 1, 3), (278, 3, 1, rps),
        (279, 4, 3, base + len(strips) * 4), (317, 3, 1, 2),
    ]
    # BitsPerSample needs a 6-byte out-of-line value: append after counts
    bps_off = offcur
    entries[2] = (258, 3, 3, bps_off)
    tail = (
        b"".join(struct.pack("<I", o) for o in offs)
        + b"".join(struct.pack("<I", len(s)) for s in strips)
        + b"".join(strips)
        + struct.pack("<HHH", 8, 8, 8)
    )
    assert np.array_equal(decode_tiff(_ifd_le(entries, tail=tail)), img)


def test_packbits_rgb():
    h, w = 2, 4
    img = np.zeros((h, w, 3), np.uint8)
    img[0] = [10, 20, 30]
    img[1, :2] = 200
    img[1, 2:] = [1, 2, 3]
    # rows: 12 bytes each; encode with runs + literals
    row0 = bytes([253]) + bytes([10]) if False else None
    # simpler: pack whole image with a reference packer
    raw = img.tobytes()
    stream = bytearray()
    i = 0
    while i < len(raw):  # naive: all literals in <=128 chunks
        n = min(128, len(raw) - i)
        stream += bytes([n - 1]) + raw[i : i + n]
        i += n
    base = 8 + 2 + 12 * 8 + 4
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 32773),
        (262, 3, 1, 2), (273, 4, 1, base), (277, 3, 1, 3), (279, 4, 1, len(stream)),
    ]
    assert np.array_equal(decode_tiff(_ifd_le(entries, tail=bytes(stream))), img)


def test_dispatch_registered():
    from lulu_crawler_ray.functions.imagecodec import decode, encode

    img = _rng(5).integers(0, 256, (6, 6, 3), np.uint8)
    assert np.array_equal(decode(encode(img, "tiff"), "tiff"), img)


def test_roundtrip_deflate():
    """Compression 8 (Adobe Deflate via stdlib zlib), including the
    legacy 32946 alias on the decode side and deflate+predictor-2
    interaction on a hand-built multi-strip file."""
    import zlib

    for h, w in ((5, 7), (1, 1), (64, 64)):
        img = _rng(h * w + 1).integers(0, 256, (h, w, 3), np.uint8)
        data = encode_tiff(img, 8)
        assert np.array_equal(decode_tiff(data), img), (h, w)
        # legacy deflate tag: rewrite compression 8 -> 32946 in the IFD
        legacy = bytearray(data)
        # find the compression entry (tag 259, SHORT, count 1, value 8)
        pat = struct.pack("<HHIHH", 259, 3, 1, 8, 0)
        i = bytes(legacy).index(pat)
        # 32946 exceeds SHORT-in-place packing; write the entry as LONG
        legacy[i:i + 12] = struct.pack("<HHII", 259, 4, 1, 32946)
        assert np.array_equal(decode_tiff(bytes(legacy)), img), (h, w)
