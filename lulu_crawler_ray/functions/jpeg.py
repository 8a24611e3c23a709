"""Baseline JFIF (JPEG) codec, pure numpy + stdlib — no PIL/libjpeg in
this environment, so the most-hit web-image codec is implemented from
the public ITU-T T.81 spec: 8-bit baseline sequential DCT, Huffman
entropy coding with the Annex K tables, quality-scaled Annex K quant
tables (libjpeg's 5000/q formula), JFIF markers.

Encoder writes 4:4:4 (1x1 sampling, simplest interchange form);
decoder accepts ANY sampling factors up to 2x2 (so real-web 4:2:0
files decode too), multiple DQT/DHT segments, DRI restart markers,
and PROGRESSIVE (SOF2) streams — multi-scan spectral selection +
successive approximation with DC/AC first and refinement scans and
EOB runs (round 5; encode_jpeg_progressive is the matching encoder).
12-BIT precision (SOF1 extended sequential) decodes too — level shift
2^11, 16-bit DQT entries, extended DC/AC magnitude categories —
reducing to the uint8 output contract by /16 (the PNG-16 MSB
treatment); encode_jpeg_ext12 is the matching encoder (per-image
canonical Huffman tables, since Annex K's 8-bit tables have no code
space for the 12-bit categories). Arithmetic coding and hierarchical
mode raise NotImplementedError — they are declared seams, like the
other compressed codecs in stages/multimodal.py.

The per-block math is vectorized (all 8x8 blocks DCT'd in one einsum);
only the entropy coder is a Python loop, which is inherent to Huffman
bit-serial decode and acceptable for an actor-pool decode stage."""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- tables (Annex K)
_QL = np.array([  # luminance quant, natural (row-major) order
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], np.int32).reshape(8, 8)

_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], np.int32).reshape(8, 8)

_ZZ = np.array([  # zigzag: index i of natural order -> position in zigzag
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)
_UNZZ = np.argsort(_ZZ)

# (bits-per-length[1..16], values) — standard Huffman tables, Annex K.3
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# DCT-II basis, orthonormal (C @ x @ C.T). C[k,n] = a(k) cos((2n+1)k pi/16)
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(1 / 8) if _k == 0 else 0.5) * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = int(min(max(quality, 1), 100))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((_QL * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255).astype(np.int32)
    return ql, qc


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical Huffman per T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(bw: _BitWriter, z: np.ndarray, pred: int, enc_dc, enc_ac) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    dc = int(z[0])
    s, bits = _magnitude(dc - pred)
    code, ln = enc_dc[s]
    bw.write(code, ln)
    if s:
        bw.write(bits, s)
    run = 0
    last_nz = np.flatnonzero(z[1:])
    last = int(last_nz[-1]) + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(z[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = enc_ac[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = enc_ac[(run << 4) | s]
        bw.write(code, ln)
        bw.write(bits, s)
        run = 0
    if last < 63:
        code, ln = enc_ac[0x00]  # EOB
        bw.write(code, ln)
    return dc


def encode_jpeg_baseline(img: np.ndarray, quality: int = 85, subsample: str = "444") -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) gray) -> baseline JFIF bytes with
    the standard Huffman tables. subsample: '444' (1x1 everywhere) or
    '420' (luma 2x2, chroma boxed down 2x — the real-web default)."""
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg_baseline: 1 or 3 channels")
    f = img.astype(np.float64)
    if nc == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [f[..., 0]]

    sub = subsample == "420" and nc == 3
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * nc
    if sub:
        # box-downsample chroma by 2 (pad odd dims by edge first)
        for ci in (1, 2):
            p = planes[ci]
            ph, pw = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
            p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
            planes[ci] = 0.25 * (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2])

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    ql, qc = _quality_tables(quality)
    qts = [ql] + ([qc] if nc == 3 else [])
    enc_dc = [_huff_encode_table(*_DC_L), _huff_encode_table(*_DC_C)]
    enc_ac = [_huff_encode_table(*_AC_L), _huff_encode_table(*_AC_C)]

    # quantized zigzag coefficients per component, padded to the MCU
    # grid, all blocks DCT'd in one einsum
    qcoef = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        gh, gw = mcuy * vi * 8, mcux * hi * 8
        p = np.pad(
            plane,
            ((0, gh - plane.shape[0]), (0, gw - plane.shape[1])),
            mode="edge",
        )
        blk = p.reshape(gh // 8, 8, gw // 8, 8).transpose(0, 2, 1, 3) - 128.0
        F = np.einsum("km,ijmn,ln->ijkl", _C, blk, _C)
        Z = np.rint(F / qts[min(ci, 1)]).astype(np.int64)
        qcoef.append(Z.reshape(gh // 8, gw // 8, 64)[:, :, _ZZ])

    bw = _BitWriter()
    pred = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                hi, vi = samp[ci]
                ti = min(ci, 1)
                for by in range(vi):
                    for bx in range(hi):
                        z = qcoef[ci][my * vi + by, mx * hi + bx]
                        pred[ci] = _encode_block(bw, z, pred[ci], enc_dc[ti], enc_ac[ti])
    scan = bw.flush()

    out = bytearray()
    out += b"\xFF\xD8"  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate(qts):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in q.reshape(-1)[_ZZ])
    # SOF0
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        hi, vi = samp[ci]
        out += bytes([ci + 1, (hi << 4) | vi, min(ci, 1)])
    # DHT
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_L), (1, 0, _AC_L), (0, 1, _DC_C), (1, 1, _AC_C)
    )[: (4 if nc == 3 else 2)]:
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals)) + bytes([(cls << 4) | tid])
        out += bytes(bits) + bytes(vals)
    # SOS
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        t = min(ci, 1)
        out += bytes([ci + 1, (t << 4) | t])
    out += b"\x00\x3F\x00"
    out += scan
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self._overrun = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            # past EOI padding: feed 1-bits (a finished decoder reads a
            # few pad bits here), but a TRUNCATED scan would otherwise
            # silently decode garbage pixels — allow a small post-end
            # tail then raise (ADVICE r4)
            self._overrun += 8
            if self._overrun > 64:
                raise ValueError("jpeg: entropy-coded data truncated (read past end of scan)")
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
            return
        b = self.data[self.pos]
        self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _entropy_end(data: bytes, start: int) -> int:
    """Index of the first real marker (not stuffing, not RSTn) at or
    after ``start`` — the end of one scan's entropy-coded data."""
    i, n = start, len(data)
    while i < n - 1:
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return i
        i += 1
    return n


def _split_restarts(raw: bytes) -> list[bytes]:
    """Unstuff 0xFF00 and split the entropy stream at restart markers."""
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0xFF and i + 1 < len(raw):
            nxt = raw[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments


def _comp_blocks(frame: dict, c: dict, hmax: int, vmax: int) -> tuple[int, int]:
    """(blocks down, blocks across) of one component for NON-interleaved
    scans (per T.81 A.2.2: ceil of the component's sample dims / 8)."""
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_scan_sequential(frame, comps, sc_by_id, huff_dc, huff_ac,
                            segments, restart_interval, mcux, mcuy):
    """Baseline sequential scan: full-band interleaved MCU decode."""
    seg_idx = 0
    br = _BitReader(segments[0])
    pred = {c["id"]: 0 for c in comps}
    mcu = 0
    scan_comps = [c for c in comps if c["id"] in sc_by_id]
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError(
                        f"jpeg: missing restart segment {seg_idx} "
                        f"(stream carries {len(segments)}, restart_interval implies more)"
                    )
                br = _BitReader(segments[seg_idx])
                pred = {c["id"]: 0 for c in comps}
            for c in scan_comps:
                s = sc_by_id[c["id"]]
                dct, act = huff_dc[s["dc"]], huff_ac[s["ac"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        z = np.zeros(64, np.int64)
                        t = _decode_huff(br, dct)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        pred[c["id"]] += diff
                        z[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, act)
                            r, t = rs >> 4, rs & 0xF
                            if t == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            z[k] = _extend(br.read_bits(t), t)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = z
            mcu += 1


def _decode_scan_progressive(frame, comps, scan_comps, huff_dc, huff_ac,
                             segments, restart_interval, mcux, mcuy,
                             ss, se, ah, al, hmax, vmax):
    """One progressive (SOF2) scan into the persistent coefficient
    arrays: DC first/refine (interleaved or single-component) or AC
    first/refine (single-component, EOB-run semantics per T.81 G.1.2)."""
    sc_by_id = {s["id"]: s for s in scan_comps}
    members = [c for c in comps if c["id"] in sc_by_id]
    seg_idx = 0
    br = _BitReader(segments[0])
    state = {"eobrun": 0, "pred": {c["id"]: 0 for c in members}, "unit": 0}

    def restart_if_due():
        if restart_interval and state["unit"] and state["unit"] % restart_interval == 0:
            nonlocal_seg = state.get("seg", 0) + 1
            state["seg"] = nonlocal_seg
            if nonlocal_seg >= len(segments):
                raise ValueError(
                    f"jpeg: missing restart segment {nonlocal_seg} "
                    f"(stream carries {len(segments)}, restart_interval implies more)"
                )
            state["br"] = _BitReader(segments[nonlocal_seg])
            state["eobrun"] = 0
            state["pred"] = {c["id"]: 0 for c in members}

    state["br"] = br
    state["seg"] = 0

    if ss == 0:  # DC scan (first or refine); se must be 0
        if se != 0:
            raise ValueError("jpeg: DC scan with Se != 0")
        if len(members) > 1 or (len(members) == len(comps) and len(comps) > 1):
            # interleaved MCU order
            for my in range(mcuy):
                for mx in range(mcux):
                    restart_if_due()
                    b = state["br"]
                    for c in members:
                        s = sc_by_id[c["id"]]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = c["coef"][(my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)]
                                if ah == 0:
                                    t = _decode_huff(b, huff_dc[s["dc"]])
                                    diff = _extend(b.read_bits(t), t) if t else 0
                                    state["pred"][c["id"]] += diff
                                    blk[0] = state["pred"][c["id"]] << al
                                else:
                                    if b.read_bit():
                                        blk[0] |= 1 << al
                    state["unit"] += 1
        else:
            c = members[0]
            s = sc_by_id[c["id"]]
            bh_n, bw_n = _comp_blocks(frame, c, hmax, vmax)
            for row in range(bh_n):
                for col in range(bw_n):
                    restart_if_due()
                    b = state["br"]
                    blk = c["coef"][row * c["bw"] + col]
                    if ah == 0:
                        t = _decode_huff(b, huff_dc[s["dc"]])
                        diff = _extend(b.read_bits(t), t) if t else 0
                        state["pred"][c["id"]] += diff
                        blk[0] = state["pred"][c["id"]] << al
                    else:
                        if b.read_bit():
                            blk[0] |= 1 << al
                    state["unit"] += 1
        return

    # AC scan: exactly one component (T.81 G.1.1)
    if len(members) != 1:
        raise ValueError("jpeg: progressive AC scan must be single-component")
    c = members[0]
    s = sc_by_id[c["id"]]
    act = huff_ac[s["ac"]]
    bh_n, bw_n = _comp_blocks(frame, c, hmax, vmax)
    p1 = np.int64(1) << al
    m1 = -(np.int64(1) << al)

    for row in range(bh_n):
        for col in range(bw_n):
            restart_if_due()
            b = state["br"]
            z = c["coef"][row * c["bw"] + col]
            if ah == 0:  # AC first scan
                if state["eobrun"] > 0:
                    state["eobrun"] -= 1
                else:
                    k = ss
                    while k <= se:
                        rs = _decode_huff(b, act)
                        r, t = rs >> 4, rs & 0xF
                        if t:
                            k += r
                            if k > se:
                                raise ValueError("jpeg: AC index overflow")
                            z[k] = np.int64(_extend(b.read_bits(t), t)) << al
                            k += 1
                        else:
                            if r == 15:
                                k += 16
                                continue
                            state["eobrun"] = (1 << r) - 1
                            if r:
                                state["eobrun"] += b.read_bits(r)
                            break
            else:  # AC refinement scan (T.81 G.1.2.3 / libjpeg structure)
                k = ss
                if state["eobrun"] == 0:
                    while k <= se:
                        rs = _decode_huff(b, act)
                        r, t = rs >> 4, rs & 0xF
                        if t == 0:
                            if r != 15:
                                state["eobrun"] = (1 << r)
                                if r:
                                    state["eobrun"] += b.read_bits(r)
                                break
                            val = np.int64(0)  # ZRL: skip 16 zero-history coefs
                        else:
                            if t != 1:
                                raise ValueError("jpeg: invalid refinement magnitude")
                            val = p1 if b.read_bit() else m1
                        while k <= se:
                            if z[k] != 0:
                                if b.read_bit() and (z[k] & p1) == 0:
                                    z[k] += p1 if z[k] > 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val != 0 and k <= se:
                            z[k] = val
                        k += 1
                if state["eobrun"] > 0:
                    while k <= se:
                        if z[k] != 0:
                            if b.read_bit() and (z[k] & p1) == 0:
                                z[k] += p1 if z[k] > 0 else m1
                        k += 1
                    state["eobrun"] -= 1
            state["unit"] += 1


def decode_jpeg_baseline(data: bytes) -> np.ndarray:
    """JFIF bytes -> (h, w, 3) uint8 RGB (gray replicated). Decodes
    baseline sequential (SOF0/1) AND progressive (SOF2: spectral
    selection + successive approximation, DC/AC first and refinement
    scans, EOB runs) — the two real-web DCT modes — plus 12-bit
    extended sequential (SOF1), MSB-reduced to uint8. Accepts sampling
    factors up to 2x2 (4:2:0 et al.), multiple DQT/DHT segments, DRI
    restarts. Arithmetic coding / hierarchical remain declared
    NotImplementedError seams."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("jpeg: missing SOI")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    progressive = False
    comps = None
    hmax = vmax = mcux = mcuy = 0
    saw_scan = False
    pos = 2
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq:  # 16-bit (big-endian) table entries — rare but legal
                    tbl = np.frombuffer(seg[o + 1 : o + 129], ">u2").astype(np.int32)
                    o += 129
                else:
                    tbl = np.frombuffer(seg[o + 1 : o + 65], np.uint8).astype(np.int32)
                    o += 65
                qt[tq] = tbl[_UNZZ].reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec not in (8, 12):
                raise NotImplementedError(f"jpeg: {prec}-bit precision")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "prec": prec}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax > 2 or vmax > 2:
                raise NotImplementedError("jpeg: sampling factors > 2")
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c["bw"] = mcux * c["h"]
                c["bh"] = mcuy * c["v"]
                c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("jpeg: unsupported SOF mode (lossless/arithmetic/hierarchical)")
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                cls, tid = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17 : o + 17 + nv])
                (huff_ac if cls else huff_dc)[tid] = _huff_decode_table(bits, vals)
                o += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — one scan (of possibly many)
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            ss_, se_, a_ = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah_, al_ = a_ >> 4, a_ & 0xF
            scan_start = pos + 2 + seglen
            end = _entropy_end(data, scan_start)
            segments = _split_restarts(data[scan_start:end])
            if progressive:
                _decode_scan_progressive(
                    frame, comps, scan_comps, huff_dc, huff_ac, segments,
                    restart_interval, mcux, mcuy, ss_, se_, ah_, al_, hmax, vmax,
                )
            else:
                sc_by_id = {s["id"]: s for s in scan_comps}
                _decode_scan_sequential(
                    frame, comps, sc_by_id, huff_dc, huff_ac, segments,
                    restart_interval, mcux, mcuy,
                )
            saw_scan = True
            pos = end
            continue
        pos += 2 + seglen
    if frame is None or not saw_scan:
        raise ValueError("jpeg: missing SOF/SOS")

    h, w = frame["h"], frame["w"]
    planes = []
    for c in comps:
        q = qt[c["tq"]].reshape(-1)
        # coef[:, _UNZZ] is natural-order; q is already natural-order
        # (stored de-zigzagged at DQT parse) — apply it plain
        F = (c["coef"][:, _UNZZ] * q[None, :]).astype(np.float64).reshape(-1, 8, 8)
        # IDCT: x[m,n] = sum_kl C[k,m] F[k,l] C[l,n]  (= C.T @ F @ C)
        # level shift is 2^(P-1); 12-bit samples reduce to the uint8
        # output contract by /16 (the PNG-16 MSB treatment)
        prec = frame.get("prec", 8)
        blk = np.einsum("km,ikl,ln->imn", _C, F, _C) + float(1 << (prec - 1))
        if prec > 8:
            blk = blk / float(1 << (prec - 8))
        bh, bw_ = c["bh"], c["bw"]
        plane = blk.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        # upsample to full MCU grid resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[: mcuy * vmax * 8, : mcux * hmax * 8])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        rgb = np.stack([y, y, y], axis=-1)
    else:
        y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb[:h, :w]), 0, 255).astype(np.uint8)


# ------------------------------------------------------- progressive encoder


class _ProgressiveAcWriter:
    """AC-scan entropy RECORDER with EOB-run buffering (T.81 G.1.2).
    Records (symbol / raw-bit) ops so the scan can be serialized with a
    per-scan Huffman table — the Annex K AC tables have no code space
    for the EOBn (n>1) symbols progressive scans need (their length-16
    band is full to 0xFFFE), so each AC scan emits its own compact DHT.
    The refinement path mirrors the decoder's advance loop position for
    position, so correction-bit interleaving is sync-exact by
    construction rather than by trusting a re-derivation of G.7."""

    def __init__(self):
        self.ops: list[tuple] = []  # ("sym", s) | ("bits", v, n)
        self.eobrun = 0
        self.ebits: list[int] = []  # correction bits owed by buffered EOBs

    def flush_eob(self) -> None:
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            self.ops.append(("sym", nbits << 4))
            if nbits:
                self.ops.append(("bits", self.eobrun - (1 << nbits), nbits))
            self.eobrun = 0
        for b in self.ebits:
            self.ops.append(("bits", b, 1))
        self.ebits = []

    def sym(self, symbol: int, extra_bits: list[tuple[int, int]]) -> None:
        self.flush_eob()
        self.ops.append(("sym", symbol))
        for v, n in extra_bits:
            self.ops.append(("bits", v, n))

    def eob(self, corr_bits: list[int]) -> None:
        self.eobrun += 1
        self.ebits.extend(corr_bits)
        if self.eobrun == 0x7FFF or len(self.ebits) > 900:
            self.flush_eob()

    def serialize(self) -> tuple[bytes, list[int], list[int]]:
        """(entropy bytes, DHT bits, DHT vals): fixed-length canonical
        codes over exactly the symbols this scan uses (all-ones code
        left unused, as T.81 requires)."""
        syms = sorted({op[1] for op in self.ops if op[0] == "sym"}) or [0x00]
        L = 1
        while (1 << L) < len(syms) + 1:
            L += 1
        bits = [0] * 16
        bits[L - 1] = len(syms)
        enc = _huff_encode_table(bits, syms)
        bw = _BitWriter()
        for op in self.ops:
            if op[0] == "sym":
                code, ln = enc[op[1]]
                bw.write(code, ln)
            else:
                bw.write(op[1], op[2])
        return bw.flush(), bits, syms


def _encode_ac_first_block(w: _ProgressiveAcWriter, z: np.ndarray, ss: int, se: int, al: int) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = int(z[k])
        av = abs(v) >> al
        if av == 0:
            r += 1
            continue
        while r > 15:
            w.sym(0xF0, [])
            r -= 16
        s, bits = _magnitude(av if v > 0 else -av)
        w.sym((r << 4) | s, [(bits, s)])
        r = 0
    if r > 0:
        # trailing zero-history coefs: this block ends in (buffered) EOB
        w.eob([])


def _encode_ac_refine_block(w: _ProgressiveAcWriter, z: np.ndarray, ss: int, se: int, ah: int, al: int) -> None:
    vals = [int(z[k]) for k in range(ss, se + 1)]
    hist = [(abs(v) >> ah) != 0 for v in vals]
    newnz = [(not h) and ((abs(v) >> al) != 0) for v, h in zip(vals, hist)]
    corr = [(abs(v) >> al) & 1 for v in vals]
    n = len(vals)
    pos = 0
    while pos < n:
        nxt = None
        for j in range(pos, n):
            if newnz[j]:
                nxt = j
                break
        if nxt is None:
            # EOB: decoder reads a correction bit for every remaining
            # history coef of this block after the run is emitted
            w.eob([corr[j] for j in range(pos, n) if hist[j]])
            return
        zeros = sum(1 for j in range(pos, nxt) if not hist[j])
        while zeros > 15:
            # ZRL consumes 16 zero-history coefs; its appended bits are
            # the history coefs passed over up to and incl. the 16th zero
            passed, zc, j = [], 0, pos
            while j < n and zc < 16:
                if hist[j]:
                    passed.append(corr[j])
                else:
                    zc += 1
                j += 1
            w.sym(0xF0, [(b, 1) for b in passed])
            pos = j
            zeros -= 16
        passed = [corr[j] for j in range(pos, nxt) if hist[j]]
        sign = 1 if vals[nxt] > 0 else 0
        w.sym((zeros << 4) | 1, [(sign, 1)] + [(b, 1) for b in passed])
        pos = nxt + 1
    # band ended exactly at a newly-nonzero coef: no EOB needed


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85, subsample: str = "444") -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) gray) -> PROGRESSIVE (SOF2) JFIF
    bytes. Scan script (exercises all four progressive scan types,
    including EOB runs and refinement correction bits):

        1. DC first     (interleaved, Ah=0 Al=1)
        2. DC refine    (interleaved, Ah=1 Al=0)
        3. per comp: AC first  (Ss=1 Se=63, Ah=0 Al=1)
        4. per comp: AC refine (Ss=1 Se=63, Ah=1 Al=0)

    Coefficients match encode_jpeg_baseline exactly (same quant /
    DCT), so progressive decode must be pixel-identical to decoding
    the baseline encoding of the same image — the cross-check the
    tests pin."""
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg_progressive: 1 or 3 channels")
    f = img.astype(np.float64)
    if nc == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [f[..., 0]]
    sub = subsample == "420" and nc == 3
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * nc
    if sub:
        for ci in (1, 2):
            p = planes[ci]
            ph, pw = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
            p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
            planes[ci] = 0.25 * (p[0::2, 0::2] + p[1::2, 0::2] + p[0::2, 1::2] + p[1::2, 1::2])
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    ql, qc = _quality_tables(quality)
    qts = [ql] + ([qc] if nc == 3 else [])
    enc_dc = [_huff_encode_table(*_DC_L), _huff_encode_table(*_DC_C)]

    qcoef = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        gh, gw = mcuy * vi * 8, mcux * hi * 8
        p = np.pad(plane, ((0, gh - plane.shape[0]), (0, gw - plane.shape[1])), mode="edge")
        blk = p.reshape(gh // 8, 8, gw // 8, 8).transpose(0, 2, 1, 3) - 128.0
        F = np.einsum("km,ijmn,ln->ijkl", _C, blk, _C)
        Z = np.rint(F / qts[min(ci, 1)]).astype(np.int64)
        qcoef.append(Z.reshape(gh // 8, gw // 8, 64)[:, :, _ZZ])

    out = bytearray()
    out += b"\xFF\xD8"
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate(qts):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in q.reshape(-1)[_ZZ])
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)  # SOF2
    for ci in range(nc):
        hi, vi = samp[ci]
        out += bytes([ci + 1, (hi << 4) | vi, min(ci, 1)])
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_L), (1, 0, _AC_L), (0, 1, _DC_C), (1, 1, _AC_C)
    )[: (4 if nc == 3 else 2)]:
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals)) + bytes([(cls << 4) | tid])
        out += bytes(bits) + bytes(vals)

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        hdr = struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for cid in comp_ids:
            t = min(cid - 1, 1)
            hdr += bytes([cid, (t << 4) | t])
        hdr += bytes([ss, se, (ah << 4) | al])
        return b"\xFF\xDA" + hdr

    # scan 1: DC first (Al=1), interleaved
    bw = _BitWriter()
    pred = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                hi, vi = samp[ci]
                ti = min(ci, 1)
                for by in range(vi):
                    for bx in range(hi):
                        dc = int(qcoef[ci][my * vi + by, mx * hi + bx, 0]) >> 1
                        s, bits = _magnitude(dc - pred[ci])
                        code, ln = enc_dc[ti][s]
                        bw.write(code, ln)
                        if s:
                            bw.write(bits, s)
                        pred[ci] = dc
    out += sos_header(list(range(1, nc + 1)), 0, 0, 0, 1) + bw.flush()

    # scan 2: DC refine (Ah=1, Al=0), interleaved — one raw bit per block
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        bw.write(int(qcoef[ci][my * vi + by, mx * hi + bx, 0]) & 1, 1)
    out += sos_header(list(range(1, nc + 1)), 0, 0, 1, 0) + bw.flush()

    def comp_blocks(ci: int):
        hi, vi = samp[ci]
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        for row in range(-(-ch // 8)):
            for col in range(-(-cw // 8)):
                yield qcoef[ci][row, col]

    def emit_ac_scan(ci: int, refine: bool) -> bytes:
        wr = _ProgressiveAcWriter()
        for z in comp_blocks(ci):
            if refine:
                _encode_ac_refine_block(wr, z, 1, 63, 1, 0)
            else:
                _encode_ac_first_block(wr, z, 1, 63, 1)
        wr.flush_eob()
        scan, bits, vals = wr.serialize()
        tid = min(ci, 1)
        dht = (
            b"\xFF\xC4" + struct.pack(">H", 19 + len(vals))
            + bytes([(1 << 4) | tid]) + bytes(bits) + bytes(vals)
        )
        ah, al = (1, 0) if refine else (0, 1)
        return dht + sos_header([ci + 1], 1, 63, ah, al) + scan

    # scans 3..: AC first per component (Al=1), then AC refine
    for ci in range(nc):
        out += emit_ac_scan(ci, refine=False)
    for ci in range(nc):
        out += emit_ac_scan(ci, refine=True)

    out += b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------- 12-bit encoder (SOF1)


class _SymCollect(dict):
    """Stand-in Huffman encode table for the collection pass: records
    every symbol _encode_block asks for and hands back a dummy code."""

    def __init__(self):
        super().__init__()
        self.seen: set[int] = set()

    def __getitem__(self, sym: int) -> tuple[int, int]:
        self.seen.add(sym)
        return (0, 1)


def _flat_huff(syms: set[int]) -> tuple[list[int], list[int]]:
    """Fixed-length canonical code over exactly `syms` (T.81-legal: the
    all-ones code of the chosen length stays unused) — the same scheme
    the progressive encoder's per-scan DHTs use."""
    vals = sorted(syms) or [0x00]
    L = 1
    while (1 << L) < len(vals) + 1:
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(vals)
    return bits, vals


def encode_jpeg_ext12(img: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) or (h, w) uint16 with 12-bit samples (0..4095) ->
    extended-sequential JFIF bytes (SOF1, precision 12, 4:4:4).
    Annex K's Huffman tables cover only the 8-bit magnitude categories
    (DC<=11, AC<=10), so a 12-bit stream needs wider tables: a
    collection pass records the symbols this image actually emits and
    each table is a compact fixed-length canonical code over them.
    Quant tables are the quality-scaled Annex K tables x16 (same
    relative step in the 12-bit domain), stored as 16-bit DQT (pq=1)."""
    if img.dtype != np.uint16:
        raise ValueError("encode_jpeg_ext12: uint16 samples required")
    if img.max() > 4095:
        raise ValueError("encode_jpeg_ext12: samples exceed 12 bits")
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg_ext12: 1 or 3 channels")
    f = img.astype(np.float64)
    if nc == 3:
        r, g, b = f[..., 0], f[..., 1], f[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            2048.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            2048.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [f[..., 0]]

    mcux = -(-w // 8)
    mcuy = -(-h // 8)
    ql8, qc8 = _quality_tables(quality)
    qts = [np.minimum(ql8.astype(np.int64) * 16, 65535)]
    if nc == 3:
        qts.append(np.minimum(qc8.astype(np.int64) * 16, 65535))

    qcoef = []
    for ci, plane in enumerate(planes):
        gh, gw = mcuy * 8, mcux * 8
        p = np.pad(
            plane,
            ((0, gh - plane.shape[0]), (0, gw - plane.shape[1])),
            mode="edge",
        )
        blk = p.reshape(gh // 8, 8, gw // 8, 8).transpose(0, 2, 1, 3) - 2048.0
        F = np.einsum("km,ijmn,ln->ijkl", _C, blk, _C)
        Z = np.rint(F / qts[min(ci, 1)].astype(np.float64)).astype(np.int64)
        qcoef.append(Z.reshape(gh // 8, gw // 8, 64)[:, :, _ZZ])

    def run_blocks(enc_dc, enc_ac, bw):
        pred = [0] * nc
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    ti = min(ci, 1)
                    z = qcoef[ci][my, mx]
                    pred[ci] = _encode_block(bw, z, pred[ci], enc_dc[ti], enc_ac[ti])

    # pass 1: collect the symbol alphabet per table
    ntab = 2 if nc == 3 else 1
    col_dc = [_SymCollect() for _ in range(ntab)]
    col_ac = [_SymCollect() for _ in range(ntab)]
    run_blocks(col_dc, col_ac, _BitWriter())
    tables = []  # (cls, tid, bits, vals)
    enc_dc, enc_ac = [], []
    for ti in range(ntab):
        bits, vals = _flat_huff(col_dc[ti].seen)
        tables.append((0, ti, bits, vals))
        enc_dc.append(_huff_encode_table(bits, vals))
        bits, vals = _flat_huff(col_ac[ti].seen)
        tables.append((1, ti, bits, vals))
        enc_ac.append(_huff_encode_table(bits, vals))

    bw = _BitWriter()
    run_blocks(enc_dc, enc_ac, bw)
    scan = bw.flush()

    out = bytearray()
    out += b"\xFF\xD8"
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate(qts):
        out += b"\xFF\xDB" + struct.pack(">H", 131) + bytes([(1 << 4) | tid])
        out += q.reshape(-1)[_ZZ].astype(">u2").tobytes()
    out += b"\xFF\xC1" + struct.pack(">HBHHB", 8 + 3 * nc, 12, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, min(ci, 1)])
    for cls, tid, bits, vals in tables:
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals)) + bytes([(cls << 4) | tid])
        out += bytes(bits) + bytes(vals)
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        t = min(ci, 1)
        out += bytes([ci + 1, (t << 4) | t])
    out += b"\x00\x3F\x00"
    out += scan
    out += b"\xFF\xD9"
    return bytes(out)
