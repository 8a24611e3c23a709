"""QOI codec (functions/qoi.py): all six chunk ops, roundtrips,
integrity checks, dispatch through imagecodec.decode."""

import struct

import numpy as np
import pytest

from lulu_crawler_ray.functions.qoi import _END, decode_qoi, encode_qoi


def _rng(seed=0):
    return np.random.default_rng(seed)


def test_roundtrips_cover_all_ops():
    h, w = 37, 53
    grad = ((np.indices((h, w)).sum(0)[:, :, None] + np.arange(3)) % 256).astype(np.uint8)
    rand = _rng(3).integers(0, 256, (h, w, 3), np.uint8)  # RGB-op heavy
    flat = np.full((h, w, 3), 77, np.uint8)  # RUN heavy
    pal = (_rng(4).integers(0, 4, (h, w, 1), np.uint8).repeat(3, 2) * 60)  # INDEX heavy
    for name, img in [("grad", grad), ("rand", rand), ("flat", flat), ("pal", pal)]:
        enc = encode_qoi(img)
        assert np.array_equal(decode_qoi(enc), img), name
    # the encodings actually use the compact ops (flat ~= pure runs)
    assert len(encode_qoi(flat)) < flat.size // 50
    assert len(encode_qoi(grad)) < grad.size // 2


def test_long_run_split_and_tiny_images():
    img = np.full((3, 200, 3), 9, np.uint8)  # run 600 > 62 -> split chunks
    assert np.array_equal(decode_qoi(encode_qoi(img)), img)
    one = np.array([[[5, 6, 7]]], np.uint8)
    assert np.array_equal(decode_qoi(encode_qoi(one)), one)


def test_rgba_stream_drops_alpha():
    # hand-built 2x1 RGBA stream: RGBA op then INDEX hit on the same px
    px = (10, 20, 30, 40)
    k = (10 * 3 + 20 * 5 + 30 * 7 + 40 * 11) % 64
    data = (
        b"qoif"
        + struct.pack(">IIBB", 2, 1, 4, 0)
        + bytes([0xFF, *px])
        + bytes([k])
        + _END
    )
    out = decode_qoi(data)
    assert out.shape == (1, 2, 3)
    assert (out == [10, 20, 30]).all()


def test_integrity_raises():
    img = _rng(1).integers(0, 256, (8, 8, 3), np.uint8)
    enc = encode_qoi(img)
    with pytest.raises(ValueError):
        decode_qoi(enc[:-12])  # truncated
    with pytest.raises(ValueError):
        decode_qoi(b"qoix" + enc[4:])  # magic
    with pytest.raises(ValueError):
        decode_qoi(enc[:-8] + b"\x00" * 6 + b"\x02\x01")  # end marker
    # pixel-count short: claim a taller image than the stream carries
    hdr = b"qoif" + struct.pack(">IIBB", 8, 9, 3, 0)
    with pytest.raises(ValueError):
        decode_qoi(hdr + enc[14:])


def test_dispatch():
    from lulu_crawler_ray.functions.imagecodec import decode, encode

    img = _rng(2).integers(0, 256, (16, 16, 3), np.uint8)
    assert np.array_equal(decode(encode(img, "qoi"), "qoi"), img)
