"""In-repo lossless image codecs (M8) — no PIL/opencv in this sandbox
(SURVEY.md §0.2). Formats:

    raw — b"RAW0" + w:uint32le + h:uint32le + RGB8 C-order pixels
    ppm — binary P6, maxval 255
    png — real PNG: 8-bit RGB, zlib IDAT, filter type 0 only

All lossless => decoded-pixel equality is exact and PSNR = inf >= 40 dB,
satisfying the per-row fidelity invariant of BASELINE.json:15. ``fmt``
stays a real column so lossy codecs can be added when codecs exist.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw", "ppm", "png")

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_raw(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"RAW0" + struct.pack("<II", w, h) + img.astype(np.uint8).tobytes()


def decode_raw(data: bytes) -> np.ndarray:
    if data[:4] != b"RAW0":
        raise ValueError("bad raw magic")
    w, h = struct.unpack("<II", data[4:12])
    px = np.frombuffer(data, np.uint8, count=w * h * 3, offset=12)
    return px.reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("bad ppm magic")
    # header: magic, w, h, maxval — whitespace separated, then one byte sep
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(data[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(fields[0]), int(fields[1]), int(fields[2])
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    px = np.frombuffer(data, np.uint8, count=w * h * 3, offset=i)
    return px.reshape(h, w, 3).copy()


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    scan = np.empty((h, 1 + w * 3), np.uint8)
    scan[:, 0] = 0  # filter type 0 per row
    scan[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(scan.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("bad png signature")
    i, w, h, idat = 8, 0, 0, b""
    while i < len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        tag = data[i + 4 : i + 8]
        payload = data[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            w, h, bit, ctype = struct.unpack(">IIBB", payload[:10])
            if bit != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        i += 12 + length
    scan = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, 1 + w * 3)
    if (scan[:, 0] != 0).any():
        raise ValueError("only filter type 0 supported")
    return scan[:, 1:].reshape(h, w, 3).copy()


_ENC = {"raw": encode_raw, "ppm": encode_ppm, "png": encode_png}
_DEC = {"raw": decode_raw, "ppm": decode_ppm, "png": decode_png}


def encode(img: np.ndarray, fmt: str) -> bytes:
    return _ENC[fmt](img)


def decode(data: bytes, fmt: str) -> np.ndarray:
    """bytes -> (h, w, 3) uint8 ndarray."""
    return _DEC[fmt](data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize (numpy only) — used by phash and the
    image-transform stage."""
    sh, sw = img.shape[:2]
    ys = (np.arange(h) * sh // h).clip(0, sh - 1)
    xs = (np.arange(w) * sw // w).clip(0, sw - 1)
    return img[np.ix_(ys, xs)]
