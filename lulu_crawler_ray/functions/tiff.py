"""Baseline TIFF codec, pure numpy + stdlib — the remaining legacy
raster format a crawl meets after BMP. Implemented from the public
TIFF 6.0 specification (no PIL/libtiff in this sandbox, SURVEY.md
§0.2).

Decode covers baseline strip-based files:
  - both byte orders (II little- / MM big-endian), classic 8-byte
    header + IFD chain (first IFD only — multi-page reads page 1)
  - photometric 0/1 (gray, WhiteIsZero inverted), 2 (RGB, 8-bit
    samples, SamplesPerPixel >= 3 with extra samples dropped),
    3 (palette via the 16-bit ColorMap, high byte)
  - compression 1 (none), 5 (LZW — MSB-first bit packing with the
    TIFF early code-width change, Clear/EOI 256/257), 32773 (PackBits)
  - predictor 2 (horizontal differencing), multiple strips, any
    RowsPerStrip

Encoder writes 8-bit RGB, little-endian, single IFD, compression
none or LZW (used by the roundtrip tests). Output contract matches the
other codecs: (h, w, 3) uint8 RGB.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-variant LZW: 9->12-bit codes, MSB-first packing, Clear=256
    EOI=257, EARLY code-width change (width bumps when the next free
    entry index reaches 2^width - 1 — one code earlier than GIF)."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def reset():
        nonlocal width
        width = 9
        return {bytes([i]): i for i in range(256)}, 258

    table, next_code = reset()
    emit(256)  # Clear
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # early change: after assigning code 511/1023/2047 the NEXT
        # emission uses the wider code (the decoder mirrors this one
        # append later, at table length 2^w - 1)
        if next_code == (1 << width) and width < 12:
            width += 1
        w = bytes([b])
        if next_code >= 4094:
            emit(256)
            table, next_code = reset()
    if w:
        emit(table[w])
    emit(257)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """Inverse of _lzw_encode_tiff (TIFF 6.0 LZW pseudo-code)."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # Clear
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:  # EOI
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out)
    return bytes(out)


def _unpackbits(data: bytes, expected: int) -> bytes:
    """Apple PackBits: n in 0..127 -> n+1 literals; n in -127..-1 ->
    repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
    return bytes(out[:expected])


def encode_tiff(img: np.ndarray, compression: int = 1) -> bytes:
    """(h, w, 3) RGB -> little-endian baseline TIFF, one strip,
    compression 1 (none), 5 (LZW) or 8 (Adobe Deflate, stdlib zlib)."""
    import zlib

    h, w, _ = img.shape
    raw = img.astype(np.uint8).tobytes()
    if compression == 5:
        strip = _lzw_encode_tiff(raw)
    elif compression == 8:
        strip = zlib.compress(raw)
    else:
        strip = raw
    entries = [
        (256, 3, 1, w),  # ImageWidth
        (257, 3, 1, h),  # ImageLength
        (258, 3, 3, None),  # BitsPerSample (offset value)
        (259, 3, 1, compression),
        (262, 3, 1, 2),  # Photometric RGB
        (273, 4, 1, None),  # StripOffsets
        (277, 3, 1, 3),  # SamplesPerPixel
        (278, 3, 1, h),  # RowsPerStrip
        (279, 4, 1, len(strip)),
    ]
    ifd_off = 8
    ifd_len = 2 + 12 * len(entries) + 4
    bps_off = ifd_off + ifd_len
    strip_off = bps_off + 6
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 258:
            val = bps_off
        elif tag == 273:
            val = strip_off
        if typ == 3 and cnt == 1:
            out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # next IFD
    out += struct.pack("<HHH", 8, 8, 8)
    out += strip
    return bytes(out)


def decode_tiff(data: bytes) -> np.ndarray:
    if data[:2] == b"II" and data[2:4] == b"*\x00":
        e = "<"
    elif data[:2] == b"MM" and data[2:4] == b"\x00*":
        e = ">"
    else:
        raise ValueError("tiff: bad magic")
    (ifd,) = struct.unpack(e + "I", data[4:8])
    (n,) = struct.unpack(e + "H", data[ifd : ifd + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n):
        o = ifd + 2 + 12 * i
        tag, typ, cnt = struct.unpack(e + "HHI", data[o : o + 8])
        if typ not in _TYPE_SIZE:
            continue
        size = _TYPE_SIZE[typ] * cnt
        vo = o + 8 if size <= 4 else struct.unpack(e + "I", data[o + 8 : o + 12])[0]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I", 5: "II"}[typ]
        vals: list[int] = []
        step = _TYPE_SIZE[typ]
        for j in range(cnt):
            vals.extend(struct.unpack(e + fmt, data[vo + j * step : vo + (j + 1) * step]))
        tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"tiff: missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    bps = tags.get(258, [1])
    spp = one(277, 1)
    comp = one(259, 1)
    photo = one(262)
    pred = one(317, 1)
    rps = one(278, h) or h
    offsets = tags.get(273, [])
    counts = tags.get(279, [len(data) - o for o in offsets])
    if any(b != 8 for b in bps):
        raise NotImplementedError(f"tiff: only 8-bit samples supported (got {bps})")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(f"tiff: photometric {photo} unsupported")

    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        nrows = min(rps, h - si * rps)
        expected = nrows * w * spp
        chunk = data[off : off + cnt]
        if comp == 1:
            raw = chunk[:expected]
        elif comp == 5:
            raw = _lzw_decode_tiff(chunk, expected)
        elif comp == 32773:
            raw = _unpackbits(chunk, expected)
        elif comp in (8, 32946):  # Adobe Deflate / legacy Deflate
            import zlib

            raw = zlib.decompress(chunk)[:expected]
        else:
            raise NotImplementedError(f"tiff: compression {comp} unsupported")
        arr = np.frombuffer(raw, np.uint8, count=expected).reshape(nrows, w, spp)
        if pred == 2:  # horizontal differencing: undo with a row cumsum
            arr = np.cumsum(arr.astype(np.uint16), axis=1).astype(np.uint8)
        rows.append(arr)
    img = np.concatenate(rows, axis=0)

    if photo == 2:
        return img[:, :, :3].copy()  # extra samples (alpha) drop
    if photo == 3:
        cmap = tags.get(320)
        if not cmap:
            raise ValueError("tiff: palette image without ColorMap")
        nc = len(cmap) // 3
        pal = (np.array(cmap, np.uint32).reshape(3, nc).T >> 8).astype(np.uint8)
        return pal[img[:, :, 0]]
    g = img[:, :, 0]
    if photo == 0:  # WhiteIsZero
        g = 255 - g
    return np.repeat(g[:, :, None], 3, axis=2)
