"""BMP codec (functions/bmp.py): roundtrip, header variants, palette
depths, bitfields, RLE8/RLE4, row direction, padding."""

import struct

import numpy as np

from lulu_crawler_ray.functions.bmp import decode_bmp, encode_bmp


def _rng(seed=0):
    return np.random.default_rng(seed)


def _info_bmp(w, h, bpp, comp, pix, pal=b"", masks=b"", hdrsize=40, ncolors=0):
    off = 14 + hdrsize + len(masks) + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", hdrsize, w, h, 1, bpp, comp, len(pix), 0, 0, ncolors, 0
    )
    dib += b"\x00" * (hdrsize - 40)
    return hdr + dib + masks + pal + pix


def test_roundtrip_24bit_odd_widths():
    for h, w in ((5, 7), (1, 1), (3, 2), (16, 16), (9, 13)):
        img = _rng(w).integers(0, 256, (h, w, 3), np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (h, w)


def test_8bit_palette_bottomup_and_topdown():
    h, w = 6, 11
    pal_rgb = _rng(1).integers(0, 256, (256, 3), np.uint8)
    idx = _rng(2).integers(0, 256, (h, w), np.uint8)
    pal = np.zeros((256, 4), np.uint8)
    pal[:, :3] = pal_rgb[:, ::-1]  # BGRA entries
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = idx[::-1]  # bottom-up
    data = _info_bmp(w, h, 8, 0, rows.tobytes(), pal=pal.tobytes())
    assert np.array_equal(decode_bmp(data), pal_rgb[idx])
    rows[:, :w] = idx  # top-down: negative height
    data = _info_bmp(w, h, 8, 0, rows.tobytes(), pal=pal.tobytes())
    data = data[:18] + struct.pack("<i", w) + struct.pack("<i", -h) + data[26:]
    assert np.array_equal(decode_bmp(data), pal_rgb[idx])


def test_sub8bit_palette():
    h, w = 4, 11  # ragged at 1- and 4-bit packing
    for bpp in (1, 4):
        nc = 1 << bpp
        pal_rgb = _rng(bpp).integers(0, 256, (nc, 3), np.uint8)
        idx = _rng(bpp + 10).integers(0, nc, (h, w), np.uint8)
        pal = np.zeros((nc, 4), np.uint8)
        pal[:, :3] = pal_rgb[:, ::-1]
        per = 8 // bpp
        padw = (w + per - 1) // per * per
        codes = np.zeros((h, padw), np.uint8)
        codes[:, :w] = idx[::-1]
        packed = np.zeros((h, padw // per), np.uint8)
        for j in range(per):
            packed |= (codes[:, j::per] << np.uint8((per - 1 - j) * bpp)).astype(np.uint8)
        stride = ((w * bpp + 31) // 32) * 4
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : packed.shape[1]] = packed
        data = _info_bmp(w, h, bpp, 0, rows.tobytes(), pal=pal.tobytes())
        assert np.array_equal(decode_bmp(data), pal_rgb[idx]), bpp


def test_16bit_555_default_and_565_bitfields():
    h, w = 3, 5
    r5 = _rng(3).integers(0, 32, (h, w), np.uint32)
    g5 = _rng(4).integers(0, 32, (h, w), np.uint32)
    b5 = _rng(5).integers(0, 32, (h, w), np.uint32)
    px = (r5 << 10) | (g5 << 5) | b5
    stride = (w * 2 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 2] = px[::-1].astype("<u2").view(np.uint8).reshape(h, w * 2)
    out = decode_bmp(_info_bmp(w, h, 16, 0, rows.tobytes()))

    def s5(x):
        return ((x * 255 + 15) // 31).astype(np.uint8)

    assert np.array_equal(out, np.stack([s5(r5), s5(g5), s5(b5)], 2))

    g6 = _rng(6).integers(0, 64, (h, w), np.uint32)
    px = (r5 << 11) | (g6 << 5) | b5
    rows[:, : w * 2] = px[::-1].astype("<u2").view(np.uint8).reshape(h, w * 2)
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    out = decode_bmp(_info_bmp(w, h, 16, 3, rows.tobytes(), masks=masks))
    g8 = ((g6 * 255 + 31) // 63).astype(np.uint8)
    assert np.array_equal(out, np.stack([s5(r5), g8, s5(b5)], 2))


def test_32bit_default_and_v4_header():
    h, w = 4, 3
    img = _rng(7).integers(0, 256, (h, w, 3), np.uint8)
    px = (
        (img[:, :, 0].astype(np.uint32) << 16)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | img[:, :, 2].astype(np.uint32)
    )
    pix = px[::-1].astype("<u4").view(np.uint8).reshape(h, w * 4).tobytes()
    assert np.array_equal(decode_bmp(_info_bmp(w, h, 32, 0, pix)), img)
    # V4 header (108 B): BI_BITFIELDS masks live at offset 54 inside it
    masks = struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
    data = _info_bmp(w, h, 32, 3, pix, hdrsize=108)
    data = data[: 14 + 40] + masks + data[14 + 40 + 12 :]
    assert np.array_equal(decode_bmp(data), img)


def test_core_header_24bit():
    h, w = 3, 4
    img = _rng(8).integers(0, 256, (h, w, 3), np.uint8)
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    off = 14 + 12
    pix = rows.tobytes()
    data = (
        b"BM"
        + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        + struct.pack("<IHHHH", 12, w, h, 1, 24)
        + pix
    )
    assert np.array_equal(decode_bmp(data), img)


def test_rle8_runs_absolute_delta():
    # 4x8, palette = identity grayscale; stream exercises every escape
    pal_rgb = np.stack([np.arange(256, dtype=np.uint8)] * 3, 1)
    pal = np.zeros((256, 4), np.uint8)
    pal[:, :3] = pal_rgb[:, ::-1]
    w, h = 8, 4
    # row0 (file order = bottom row): run of 8 x 5
    # row1: absolute [1,2,3] (padded), then run 5 x 9
    # row2: run 2 x 7, delta (2,1) -> skips to row3 x=4, run 4 x 6
    stream = bytes(
        [8, 5, 0, 0]
        + [0, 3, 1, 2, 3, 0]  # absolute 3 literals + pad byte
        + [5, 9, 0, 0]
        + [2, 7, 0, 2, 2, 1]  # run then delta dx=2 dy=1
        + [4, 6, 0, 1]  # end of bitmap
    )
    want_idx = np.zeros((h, w), np.uint8)
    want_idx[0] = 5
    want_idx[1] = [1, 2, 3, 9, 9, 9, 9, 9]
    want_idx[2, :2] = 7
    want_idx[3, 4:8] = 6
    data = _info_bmp(w, h, 8, 1, stream, pal=pal.tobytes())
    assert np.array_equal(decode_bmp(data), pal_rgb[want_idx[::-1]])


def test_rle4_runs_and_absolute():
    pal_rgb = _rng(9).integers(0, 256, (16, 3), np.uint8)
    pal = np.zeros((16, 4), np.uint8)
    pal[:, :3] = pal_rgb[:, ::-1]
    w, h = 7, 2
    # row0: run of 7 alternating 0xAB -> A B A B A B A
    # row1: absolute 5 nibbles [1,2,3,4,5] (3 bytes, padded to 4), run 2 x C
    stream = bytes(
        [7, 0xAB, 0, 0]
        + [0, 5, 0x12, 0x34, 0x50, 0]
        + [2, 0xCC, 0, 1]
    )
    want_idx = np.zeros((h, w), np.uint8)
    want_idx[0] = [0xA, 0xB, 0xA, 0xB, 0xA, 0xB, 0xA]
    want_idx[1] = [1, 2, 3, 4, 5, 0xC, 0xC]
    data = _info_bmp(w, h, 4, 2, stream, pal=pal.tobytes())
    assert np.array_equal(decode_bmp(data), pal_rgb[want_idx[::-1]])


def test_dispatch_registered():
    from lulu_crawler_ray.functions.imagecodec import decode, encode

    img = _rng(10).integers(0, 256, (6, 6, 3), np.uint8)
    assert np.array_equal(decode(encode(img, "bmp"), "bmp"), img)
