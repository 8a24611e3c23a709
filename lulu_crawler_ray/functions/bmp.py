"""BMP (Windows DIB) codec, pure numpy + stdlib — the most common
legacy raster format a web crawl still meets. Implemented from the
public Windows BITMAP structures (no PIL in this sandbox, SURVEY.md
§0.2).

Decode covers the real-web matrix:
  - headers: BITMAPCOREHEADER (12 B), BITMAPINFOHEADER (40 B) and the
    V4/V5 extensions (108/124 B — same leading layout)
  - bit depths 1/4/8 (palette), 16/32 (BI_BITFIELDS with arbitrary
    contiguous masks; 555 / 8888 defaults for BI_RGB), 24 (BGR)
  - BI_RLE8 and BI_RLE4 compression (end-of-line / end-of-bitmap /
    delta escapes, absolute mode with word padding)
  - bottom-up (positive height) and top-down (negative height) rows,
    4-byte row padding

Encoder writes 24-bit BI_RGB bottom-up (the canonical interchange
form). Output contract matches the other codecs: (h, w, 3) uint8 RGB.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) RGB -> 24-bit BI_RGB bottom-up BMP."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pix = rows.tobytes()
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return hdr + dib + pix


def _scale_channel(v: np.ndarray, mask: int) -> np.ndarray:
    """Extract a masked channel and rescale to 0..255 with exact
    integer rounding ((x*255 + m//2) // m)."""
    if mask == 0:
        return np.zeros(v.shape, np.uint8)
    shift = (mask & -mask).bit_length() - 1
    m = mask >> shift
    x = (v >> np.uint32(shift)) & np.uint32(m)
    return ((x.astype(np.uint32) * 255 + m // 2) // m).astype(np.uint8)


def _unrle(data: bytes, w: int, h: int, four_bit: bool) -> np.ndarray:
    """BI_RLE8 / BI_RLE4 -> (h, w) palette indexes, bottom-up rows.
    Escapes: 00 00 end-of-line, 00 01 end-of-bitmap, 00 02 dx dy delta,
    00 n>=3 absolute run (word-aligned)."""
    out = np.zeros((h, w), np.uint8)
    x = y = i = 0
    n = len(data)
    while i + 1 < n:
        c, v = data[i], data[i + 1]
        i += 2
        if c:  # encoded run: c pixels of v
            if four_bit:
                run = np.empty(c, np.uint8)
                run[0::2] = v >> 4
                run[1::2] = v & 0xF
            else:
                run = np.full(c, v, np.uint8)
            end = min(x + c, w)
            if y < h:
                out[y, x:end] = run[: end - x]
            x += c
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute mode: v literal pixels
            if four_bit:
                nb = (v + 1) // 2
                lit = np.frombuffer(data[i : i + nb], np.uint8)
                px = np.empty(nb * 2, np.uint8)
                px[0::2] = lit >> 4
                px[1::2] = lit & 0xF
                px = px[:v]
                i += (nb + 1) & ~1  # pad to word
            else:
                px = np.frombuffer(data[i : i + v], np.uint8)
                i += (v + 1) & ~1
            end = min(x + v, w)
            if y < h:
                out[y, x:end] = px[: end - x]
            x += v
    return out[::-1]  # RLE bitmaps are always bottom-up


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("bmp: bad magic")
    (off,) = struct.unpack("<I", data[10:14])
    (hdrsize,) = struct.unpack("<I", data[14:18])
    if hdrsize == 12:  # BITMAPCOREHEADER: 16-bit dims, no compression
        w, h, _planes, bpp = struct.unpack("<HHHH", data[18:26])
        comp, topdown, pal_off, pal_entry = 0, False, 14 + 12, 3
        ncolors = 0
    elif hdrsize in (40, 52, 56, 108, 124):
        w, h, _planes, bpp, comp = struct.unpack("<iiHHI", data[18:34])
        (ncolors,) = struct.unpack("<I", data[46:50])
        topdown = h < 0
        h = abs(h)
        pal_off, pal_entry = 14 + hdrsize, 4
    else:
        raise ValueError(f"bmp: unsupported DIB header size {hdrsize}")
    if w <= 0 or h <= 0:
        raise ValueError("bmp: bad dimensions")

    masks = None
    if comp == 3:  # BI_BITFIELDS: masks follow the info header (or are in V4+)
        mo = 14 + 40 if hdrsize == 40 else 54
        r, g, b = struct.unpack("<III", data[mo : mo + 12])
        masks = (r, g, b)
        if hdrsize == 40:
            pal_off += 12
        comp = 0
    elif comp == 0 and bpp == 16:
        masks = (0x7C00, 0x03E0, 0x001F)  # 555 default
    elif comp == 0 and bpp == 32:
        masks = (0x00FF0000, 0x0000FF00, 0x000000FF)  # BGRX default

    if bpp <= 8:  # palette formats
        nc = ncolors or (1 << bpp)
        pal = np.frombuffer(data[pal_off : pal_off + nc * pal_entry], np.uint8)
        pal = pal.reshape(nc, pal_entry)[:, :3][:, ::-1]  # BGR(A) -> RGB
        if comp in (1, 2):  # RLE8 / RLE4
            if (comp == 1) != (bpp == 8):
                raise ValueError("bmp: RLE mode / bit depth mismatch")
            idx = _unrle(data[off:], w, h, four_bit=comp == 2)
            return pal[idx]
        stride = ((w * bpp + 31) // 32) * 4
        raw = np.frombuffer(data[off : off + stride * h], np.uint8).reshape(h, stride)
        if bpp == 8:
            idx = raw[:, :w]
        else:
            per = 8 // bpp
            shifts = (np.arange(per)[::-1] * bpp).astype(np.uint8)
            vals = (raw[:, : (w + per - 1) // per, None] >> shifts[None, None, :]) & (
                (1 << bpp) - 1
            )
            idx = vals.reshape(h, -1)[:, :w]
        img = pal[idx]
        return img if topdown else img[::-1]

    stride = ((w * bpp + 31) // 32) * 4
    raw = np.frombuffer(data[off : off + stride * h], np.uint8).reshape(h, stride)
    if bpp == 24:
        img = raw[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    elif bpp in (16, 32):
        width = bpp // 8
        dt = np.uint16 if bpp == 16 else np.uint32
        px = (
            raw[:, : w * width]
            .reshape(h, w, width)
            .copy()
            .view(dt)
            .reshape(h, w)
            .astype(np.uint32)
        )
        img = np.stack([_scale_channel(px, m) for m in masks], axis=2)
    else:
        raise ValueError(f"bmp: unsupported bit depth {bpp}")
    return (img if topdown else img[::-1]).copy()
