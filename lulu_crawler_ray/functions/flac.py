"""FLAC codec (RFC 9639 subset), pure stdlib+numpy — a real LOSSLESS
compressed audio codec for the multimodal seam, closing the "compressed
audio beyond ADPCM" gap. No reference file:line can exist (reference
dir is empty — SURVEY.md §0); the format is public (xiph.org / RFC
9639) and the implementation is from-scratch.

Decoder (``decode_flac``) is the full frame layer a crawler meets on
real .flac files: STREAMINFO parsing, all four subframe types
(CONSTANT / VERBATIM / FIXED orders 0-4 / LPC orders 1-32), Rice and
Rice2 residual partitions including the raw-bits escape, wasted-bits
shifting, all four channel assignments (independent, left/side,
right/side, mid/side), UTF-8-coded frame numbers, and the three
integrity layers (header CRC-8, frame CRC-16, stream MD5) verified —
corrupt bytes raise instead of decoding garbage.

Encoder (``encode_flac``) exists so the decoder has an in-repo
roundtrip oracle (no network, no foreign .flac files): CONSTANT /
FIXED 0-4 / VERBATIM subframe selection by coded cost, wasted-bits
detection, single- or multi-partition Rice residuals, mid/side //
left/side // right/side stereo decorrelation, and optional forced
LPC / escape paths so every decoder branch is exercised by tests.

Scale note: decode is per-file sequential (bit-serial entropy coding —
inherent to FLAC), so parallelism comes from the actor-pool
``map_batches`` stage over many files, exactly like the JPEG/GIF/TIFF
codecs. Fixed-predictor reconstruction is vectorized (k-fold cumsum);
only Rice symbol extraction and LPC filtering are per-sample.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------- CRC

_CRC8_TBL = np.zeros(256, np.uint8)
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TBL[_i] = _c

_CRC16_TBL = np.zeros(256, np.uint16)
for _i in range(256):
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TBL[_i] = _c


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TBL[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ int(_CRC16_TBL[((c >> 8) ^ b) & 0xFF])
    return c


# ------------------------------------------------------------- bit IO


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, value: int) -> None:
        # FLAC unary: `value` zero bits then a one bit
        while value >= 32:
            self.write(0, 32)
            value -= 32
        self.write(1, value + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _BitReader:
    """MSB-first bit reader. Reads past end raise ValueError (truncated
    streams fail loudly — the JPEG lesson, ADVICE r4)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0  # bits already consumed in data[byte]

    def tell_bytes(self) -> int:
        return self.byte + (1 if self.bit else 0)

    def read(self, nbits: int) -> int:
        out = 0
        d, b, p = self.data, self.bit, self.byte
        while nbits > 0:
            if p >= len(d):
                raise ValueError("flac: bitstream truncated")
            avail = 8 - b
            take = min(avail, nbits)
            cur = d[p]
            out = (out << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            b += take
            nbits -= take
            if b == 8:
                b = 0
                p += 1
        self.bit, self.byte = b, p
        return out

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v & (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        n = 0
        d = self.data
        while True:
            if self.byte >= len(d):
                raise ValueError("flac: bitstream truncated in unary")
            cur = d[self.byte] & ((1 << (8 - self.bit)) - 1)
            if cur == 0:
                n += 8 - self.bit
                self.bit = 0
                self.byte += 1
                continue
            # position of the highest set bit within the remaining bits
            top = cur.bit_length()
            zeros = (8 - self.bit) - top
            n += zeros
            self.bit += zeros + 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


# ----------------------------------------------------- UTF-8 numbers


def _utf8_encode(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    out = []
    nbytes = 2
    while v >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    for _ in range(nbytes - 1):
        out.append(0x80 | (v & 0x3F))
        v >>= 6
    lead_ones = nbytes
    prefix = (0xFF << (8 - lead_ones)) & 0xFF if lead_ones < 8 else 0xFE
    out.append(prefix | v)
    return bytes(reversed(out))


def _utf8_decode(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n == 0:
        raise ValueError("flac: invalid UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        bx = r.read(8)
        if bx & 0xC0 != 0x80:
            raise ValueError("flac: invalid UTF-8 continuation")
        v = (v << 6) | (bx & 0x3F)
    return v


# -------------------------------------------------------- predictors

_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_restore(warmup: np.ndarray, residual: np.ndarray, order: int) -> np.ndarray:
    """Vectorized k-fold integration: residual = Δ^order x, so x is
    recovered by `order` cumulative sums seeded from the warmup's
    difference table."""
    if order == 0:
        return residual.astype(np.int64)
    seq = residual.astype(np.int64)
    w = warmup.astype(np.int64)
    for m in range(order - 1, -1, -1):
        init = int(np.diff(w, m)[-1]) if m else int(w[-1])
        seq = np.cumsum(seq) + init
    return np.concatenate([w, seq])


def _lpc_restore(
    warmup: np.ndarray, residual: np.ndarray, coefs: list[int], shift: int
) -> np.ndarray:
    order = len(coefs)
    n = order + len(residual)
    x = np.empty(n, np.int64)
    x[:order] = warmup
    c = np.array(coefs[::-1], np.int64)  # c[j] multiplies x[i-order+j]
    if shift >= 0:
        for i in range(order, n):
            x[i] = int(residual[i - order]) + (int(np.dot(c, x[i - order : i])) >> shift)
    else:
        for i in range(order, n):
            x[i] = int(residual[i - order]) + (int(np.dot(c, x[i - order : i])) << -shift)
    return x


# ------------------------------------------------------------ encode


def _zigzag(r: np.ndarray) -> np.ndarray:
    r = r.astype(np.int64)
    return np.where(r >= 0, r << 1, (-r << 1) - 1).astype(np.uint64)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """(param, coded_bits) minimizing unary+remainder cost."""
    best_p, best_cost = 0, None
    n = len(u)
    for p in range(15):
        cost = n * (p + 1) + int((u >> np.uint64(p)).sum())
        if best_cost is None or cost < best_cost:
            best_p, best_cost = p, cost
        elif cost > best_cost * 2:
            break
    return best_p, best_cost


def _write_residual(
    w: _BitWriter,
    residual: np.ndarray,
    order: int,
    block_size: int,
    partition_order: int,
    force_escape: bool,
) -> None:
    w.write(0, 2)  # method 0: 4-bit Rice
    while block_size % (1 << partition_order) or (block_size >> partition_order) <= order:
        partition_order -= 1
    w.write(partition_order, 4)
    nparts = 1 << partition_order
    per = block_size >> partition_order
    pos = 0
    for pi in range(nparts):
        cnt = per - order if pi == 0 else per
        part = residual[pos : pos + cnt]
        pos += cnt
        u = _zigzag(part)
        if force_escape:
            rawbits = int(max(int(np.abs(part).max() if len(part) else 0).bit_length() + 1, 1))
            w.write(0xF, 4)
            w.write(rawbits, 5)
            for v in part:
                w.write(int(v) & ((1 << rawbits) - 1), rawbits)
            continue
        p, _ = _best_rice_param(u)
        w.write(p, 4)
        for v in u:
            q = int(v) >> p
            w.write_unary(q)
            w.write(int(v), p)


def _encode_subframe(
    w: _BitWriter,
    x: np.ndarray,
    bps: int,
    partition_order: int,
    force_lpc: bool,
    force_escape: bool,
    force_verbatim: bool,
) -> None:
    n = len(x)
    # wasted bits: common trailing zeros across the block
    wasted = 0
    if not force_verbatim and np.any(x):
        orv = int(np.bitwise_or.reduce(x.astype(np.int64)))
        wasted = min((orv & -orv).bit_length() - 1, bps - 1) if orv else 0
    eff = x >> wasted if wasted else x
    ebps = bps - wasted

    def header(stype: int) -> None:
        w.write(0, 1)
        w.write(stype, 6)
        if wasted:
            w.write(1, 1)
            w.write_unary(wasted - 1)
        else:
            w.write(0, 1)

    if not force_verbatim and n and np.all(eff == eff[0]):
        header(0)  # CONSTANT
        w.write(int(eff[0]) & ((1 << ebps) - 1), ebps)
        return
    if force_lpc:
        # order-2 LPC with integer coefficients [2, -1], shift 0 —
        # exercises the LPC decode path with exact integer semantics
        order, coefs, shift, prec = 2, [2, -1], 0, 5
        res = eff[order:] - (2 * eff[order - 1 : -1] - eff[: -order])
        header(32 + order - 1)
        for v in eff[:order]:
            w.write(int(v) & ((1 << ebps) - 1), ebps)
        w.write(prec - 1, 4)
        w.write(shift, 5)
        for c in coefs:
            w.write(c & ((1 << prec) - 1), prec)
        _write_residual(w, res, order, n, partition_order, force_escape)
        return
    best = None
    if not force_verbatim:
        e = eff.astype(np.int64)
        for order in range(min(4, n - 1) + 1):
            # residual = Δ^order x at positions order..n-1; np.diff
            # already drops the warmup positions
            res = np.diff(e, order)
            u = _zigzag(res)
            _, cost = _best_rice_param(u)
            cost += order * ebps
            if best is None or cost < best[0]:
                best = (cost, order, res)
    verb_cost = n * ebps
    if force_verbatim or best is None or best[0] >= verb_cost:
        header(1)  # VERBATIM
        for v in eff:
            w.write(int(v) & ((1 << ebps) - 1), ebps)
        return
    _, order, res = best
    header(8 + order)  # FIXED
    for v in eff[:order]:
        w.write(int(v) & ((1 << ebps) - 1), ebps)
    _write_residual(w, res, order, n, partition_order, force_escape)


def encode_flac(
    pcm: np.ndarray,
    sample_rate: int = 8000,
    bps: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "auto",
    partition_order: int = 0,
    force_lpc: bool = False,
    force_escape: bool = False,
    force_verbatim: bool = False,
) -> bytes:
    """PCM int array (n,) or (n, channels) -> FLAC bytes.

    stereo_mode for 2 channels: "auto"/"ms" (mid/side), "ls"
    (left/side), "rs" (right/side), "indep". The force_* knobs exist
    for decoder-coverage tests."""
    x = np.asarray(pcm)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    if not 1 <= nch <= 8:
        raise ValueError("flac: 1-8 channels")
    x = x.astype(np.int64)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if x.size and (x.min() < lo or x.max() > hi):
        raise ValueError(f"flac: samples out of {bps}-bit range")

    md5 = hashlib.md5()
    if bps % 8 == 0:
        width = bps // 8
        inter = x.astype("<i8").reshape(-1)
        raw = inter.astype("<i8").tobytes()
        # little-endian bps/8-byte signed samples, channel-interleaved
        by = np.frombuffer(raw, np.uint8).reshape(-1, 8)[:, :width]
        md5.update(by.tobytes())

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n & ((1 << 36) - 1), 36)
    # bps not a byte multiple: the sample-MD5 convention doesn't apply;
    # write the spec's 16 zero bytes meaning "unset" (an empty-string
    # MD5 here would make conforming verifying decoders reject the file)
    body = si.getvalue() + (md5.digest() if bps % 8 == 0 else b"\x00" * 16)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body  # last-block STREAMINFO

    bs_code_tbl = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        blk = x[start : start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        if nch == 2 and stereo_mode in ("auto", "ms"):
            assign = 10
            chans = [(blk[:, 0] + blk[:, 1]) >> 1, blk[:, 0] - blk[:, 1]]
            chbps = [bps, bps + 1]
        elif nch == 2 and stereo_mode == "ls":
            assign = 8
            chans = [blk[:, 0], blk[:, 0] - blk[:, 1]]
            chbps = [bps, bps + 1]
        elif nch == 2 and stereo_mode == "rs":
            assign = 9
            chans = [blk[:, 0] - blk[:, 1], blk[:, 1]]
            chbps = [bps + 1, bps]
        else:
            assign = nch - 1
            chans = [blk[:, c] for c in range(nch)]
            chbps = [bps] * nch

        h = _BitWriter()
        h.write(0b11111111111110, 14)
        h.write(0, 1)
        h.write(0, 1)  # fixed blocksize strategy
        h.write(7, 4)  # 16-bit blocksize-1 follows
        h.write(0, 4)  # sample rate from STREAMINFO
        h.write(assign, 4)
        h.write(bs_code_tbl.get(bps, 0), 3)
        h.write(0, 1)
        hdr = h.getvalue() + _utf8_encode(frame_no) + struct.pack(">H", bs - 1)
        hdr += bytes([_crc8(hdr)])

        fw = _BitWriter()
        for ch, cbps in zip(chans, chbps):
            _encode_subframe(
                fw, ch, cbps, partition_order, force_lpc, force_escape, force_verbatim
            )
        fw.align()
        frame = hdr + fw.getvalue()
        out += frame + struct.pack(">H", _crc16(frame))
        frame_no += 1
    return bytes(out)


# ------------------------------------------------------------ decode

_BLOCKSIZE_TBL = {1: 192, **{i: 576 << (i - 2) for i in range(2, 6)},
                  **{i: 256 << (i - 8) for i in range(8, 16)}}
_SAMPLERATE_TBL = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                   6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_TBL = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_residual(r: _BitReader, bs: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    po = r.read(4)
    nparts = 1 << po
    if bs % nparts or (bs >> po) <= order:
        raise ValueError("flac: invalid partition order")
    per = bs >> po
    out = np.empty(bs - order, np.int64)
    pos = 0
    for pi in range(nparts):
        cnt = per - order if pi == 0 else per
        param = r.read(pbits)
        if param == (1 << pbits) - 1:
            rawbits = r.read(5)
            if rawbits == 0:
                out[pos : pos + cnt] = 0
            else:
                for k in range(cnt):
                    out[pos + k] = r.read_signed(rawbits)
        else:
            for k in range(cnt):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                out[pos + k] = (u >> 1) ^ -(u & 1)
        pos += cnt
    return out


def _read_subframe(r: _BitReader, bs: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    ebps = bps - wasted
    if ebps <= 0:
        raise ValueError("flac: wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        v = r.read_signed(ebps)
        x = np.full(bs, v, np.int64)
    elif stype == 1:  # VERBATIM
        x = np.array([r.read_signed(ebps) for _ in range(bs)], np.int64)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = np.array([r.read_signed(ebps) for _ in range(order)], np.int64)
        res = _read_residual(r, bs, order)
        x = _fixed_restore(warm, res, order)
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        warm = np.array([r.read_signed(ebps) for _ in range(order)], np.int64)
        prec = r.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = r.read(5)
        if shift & 0x10:
            shift -= 32
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, bs, order)
        x = _lpc_restore(warm, res, coefs, shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    return x << wasted if wasted else x


def decode_flac(data: bytes, verify_md5: bool = True):
    """FLAC bytes -> (samples int64 (n, channels), sample_rate, bps).
    CRC-8/CRC-16/MD5 mismatches and truncations raise ValueError."""
    if data[:4] != b"fLaC":
        raise ValueError("flac: bad magic")
    pos = 4
    si = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + ln]
        if btype == 0:
            r = _BitReader(body)
            r.read(16)
            r.read(16)
            r.read(24)
            r.read(24)
            sr = r.read(20)
            nch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            si = (sr, nch, bps, total, body[18:34])
        pos += 4 + ln
        if last:
            break
    if si is None:
        raise ValueError("flac: missing STREAMINFO")
    sr, nch, bps, total, md5_ref = si

    chunks: list[np.ndarray] = []
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        hdr_start = pos
        r = _BitReader(data, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        r.read(1)
        r.read(1)  # blocking strategy (both coded numbers decode the same way)
        bs_code = r.read(4)
        sr_code = r.read(4)
        assign = r.read(4)
        bps_code = r.read(3)
        if r.read(1):
            raise ValueError("flac: reserved header bit set")
        _utf8_decode(r)
        if bs_code == 0:
            raise ValueError("flac: reserved block size code")
        elif bs_code == 6:
            bs = r.read(8) + 1
        elif bs_code == 7:
            bs = r.read(16) + 1
        else:
            bs = _BLOCKSIZE_TBL[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample rate code")
        hdr_end = r.tell_bytes()
        crc8 = r.read(8)
        if _crc8(data[hdr_start:hdr_end]) != crc8:
            raise ValueError("flac: frame header CRC-8 mismatch")
        fbps = _BPS_TBL.get(bps_code, bps) if bps_code else bps

        if assign <= 7:
            nc, adj = assign + 1, [0] * (assign + 1)
        elif assign == 8:  # left/side
            nc, adj = 2, [0, 1]
        elif assign == 9:  # right/side
            nc, adj = 2, [1, 0]
        elif assign == 10:  # mid/side
            nc, adj = 2, [0, 1]
        else:
            raise ValueError("flac: reserved channel assignment")
        if nc != nch:
            raise ValueError("flac: frame channel count != STREAMINFO")

        subs = [_read_subframe(r, bs, fbps + adj[c]) for c in range(nc)]
        r.align()
        fend = r.tell_bytes()
        if fend + 2 > len(data):
            raise ValueError("flac: truncated at frame CRC-16")
        crc16 = struct.unpack(">H", data[fend : fend + 2])[0]
        if _crc16(data[hdr_start:fend]) != crc16:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = fend + 2

        if assign == 8:
            left, side = subs
            chans = [left, left - side]
        elif assign == 9:
            side, right = subs
            chans = [right + side, right]
        elif assign == 10:
            mid, side = subs
            m2 = (mid << 1) | (side & 1)
            chans = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            chans = subs
        chunks.append(np.stack(chans, axis=1))
        got += bs

    out = np.concatenate(chunks, axis=0) if chunks else np.zeros((0, nch), np.int64)
    if total and len(out) != total:
        raise ValueError("flac: sample count != STREAMINFO total")
    if verify_md5 and bps % 8 == 0 and md5_ref != b"\x00" * 16:
        width = bps // 8
        raw = out.astype("<i8").reshape(-1).tobytes()
        by = np.frombuffer(raw, np.uint8).reshape(-1, 8)[:, :width]
        if hashlib.md5(by.tobytes()).digest() != md5_ref:
            raise ValueError("flac: stream MD5 mismatch")
    return out, sr, bps


def decode_flac_pcm(data: bytes) -> tuple[np.ndarray, int]:
    """Stage-contract helper mirroring decode_wav_pcm: float32 mono in
    [-1, 1) (channel mean) + sample rate."""
    x, sr, bps = decode_flac(data)
    y = (x.astype(np.float64) / float(1 << (bps - 1))).mean(axis=1)
    return y.astype(np.float32), sr
