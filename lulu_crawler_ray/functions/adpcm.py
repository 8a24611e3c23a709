"""IMA ADPCM WAV codec (wFormatTag 0x11), pure stdlib+numpy — a real
COMPRESSED audio codec for the multimodal seam (stdlib `wave` only
speaks PCM, so the RIFF container is parsed by hand here). Standard
block layout: each block opens with a 4-byte state header (predictor
int16, step index uint8, reserved) followed by 4-bit nibbles, two
samples per byte, low nibble first; samples_per_block = 1 +
(block_align - 4) * 2. Blocks reset the predictor, so a corrupt block
cannot poison the rest of the stream — and block decode is
independently parallelizable. 4x compression vs PCM16. Mono and
stereo (channels interleave as alternating 4-byte nibble groups per
the spec; stereo decodes and downmixes to mono like decode_wav_pcm)."""

from __future__ import annotations

import struct

import numpy as np

_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], np.int32)
_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)


def _decode_block(nibbles: np.ndarray, pred: int, index: int) -> np.ndarray:
    out = np.empty(len(nibbles), np.int32)
    for i, d in enumerate(nibbles):
        step = int(_STEP[index])
        diff = step >> 3
        if d & 1:
            diff += step >> 2
        if d & 2:
            diff += step >> 1
        if d & 4:
            diff += step
        if d & 8:
            diff = -diff
        pred = min(max(pred + diff, -32768), 32767)
        index = min(max(index + int(_INDEX[d & 7]), 0), 88)
        out[i] = pred
    return out


def _encode_block(samples: np.ndarray, pred: int, index: int) -> tuple[np.ndarray, int, int]:
    nib = np.empty(len(samples), np.uint8)
    for i, s in enumerate(samples):
        step = int(_STEP[index])
        diff = int(s) - pred
        d = 0
        if diff < 0:
            d = 8
            diff = -diff
        acc = step >> 3
        if diff >= step:
            d |= 4
            diff -= step
            acc += step
        if diff >= step >> 1:
            d |= 2
            diff -= step >> 1
            acc += step >> 1
        if diff >= step >> 2:
            d |= 1
            acc += step >> 2
        pred = min(max(pred + (-acc if d & 8 else acc), -32768), 32767)
        index = min(max(index + int(_INDEX[d & 7]), 0), 88)
        nib[i] = d
    return nib, pred, index


def encode_wav_ima_adpcm(
    pcm: np.ndarray, sample_rate: int = 8000, block_align: int = 256
) -> bytes:
    """(n,) mono or (n, 2) stereo float32 [-1, 1] -> IMA-ADPCM WAV
    bytes (fmt tag 0x11). Stereo blocks: one 4-byte state header per
    channel, then alternating 4-byte nibble groups (8 samples of L,
    8 of R, ...) per the spec."""
    x = np.clip(np.asarray(pcm, np.float64), -1.0, 1.0)
    if x.ndim == 1:
        x = x[:, None]
    if x.shape[1] not in (1, 2):
        raise ValueError("adpcm: 1 or 2 channels")
    nch = x.shape[1]
    s16 = np.rint(x * 32767.0).astype(np.int32)
    spb = 1 + (block_align - 4 * nch) * 2 // nch
    preds = [0] * nch
    idxs = [0] * nch
    blocks = bytearray()
    n = len(s16)
    n_blocks = max(-(-n // spb), 1)
    for b in range(n_blocks):
        seg = s16[b * spb : (b + 1) * spb]
        if len(seg) == 0:
            seg = np.zeros((1, nch), np.int32)
        ch_nibs = []
        for c in range(nch):
            preds[c] = int(seg[0, c])  # header carries first sample
            blocks += struct.pack("<hBB", preds[c], idxs[c], 0)
            rest = seg[1:, c]
            pad = spb - 1 - len(rest)
            if pad:
                rest = np.r_[rest, np.full(pad, preds[c], np.int32)]
            nib, preds[c], idxs[c] = _encode_block(rest, preds[c], idxs[c])
            ch_nibs.append((nib[0::2] | (nib[1::2] << 4)).astype(np.uint8))
        # interleave 4-byte groups: L0..L3, R0..R3, L4..L7, ...
        groups = len(ch_nibs[0]) // 4
        inter = np.empty(groups * 4 * nch, np.uint8)
        for c in range(nch):
            g = ch_nibs[c].reshape(groups, 4)
            inter.reshape(groups, nch, 4)[:, c, :] = g
        blocks += inter.tobytes()
    data = bytes(blocks)
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, nch, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    out = bytearray()
    out += b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4 + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"fact" + struct.pack("<II", 4, n)
    out += b"data" + struct.pack("<I", len(data)) + data
    return bytes(out)


def decode_wav_ima_adpcm(data: bytes) -> tuple[np.ndarray, int]:
    """IMA-ADPCM WAV bytes -> (mono float32 [-1, 1], sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("adpcm: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    n_samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt = body
        elif tag == b"fact" and len(body) >= 4:
            (n_samples,) = struct.unpack("<I", body[:4])
        elif tag == b"data":
            payload = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or payload is None:
        raise ValueError("adpcm: missing fmt/data chunk")
    wtag, nch, sr, _br, block_align = struct.unpack("<HHIIH", fmt[:14])
    if wtag != 0x11:
        raise ValueError(f"adpcm: not IMA ADPCM (fmt tag 0x{wtag:x})")
    if nch not in (1, 2):
        raise NotImplementedError("adpcm: only mono/stereo supported")
    out = []
    # a foreign encoder may write a SHORT final block (sample count not
    # filling block_align) — decode whatever nibbles it carries rather
    # than silently dropping up to samples_per_block-1 samples
    for off in range(0, len(payload), block_align):
        blk = payload[off : off + block_align]
        if len(blk) < 4 * nch + 1:
            break
        chans = []
        for c in range(nch):
            pred, index, _r = struct.unpack("<hBB", blk[4 * c : 4 * c + 4])
            chans.append((int(pred), int(index)))
        body = np.frombuffer(blk[4 * nch :], np.uint8)
        groups = len(body) // (4 * nch)
        per_ch = []
        for c in range(nch):
            packed = body[: groups * 4 * nch].reshape(groups, nch, 4)[:, c, :].reshape(-1)
            nib = np.empty(len(packed) * 2, np.uint8)
            nib[0::2] = packed & 0x0F
            nib[1::2] = packed >> 4
            pred, index = chans[c]
            per_ch.append(np.r_[np.int32(pred), _decode_block(nib, pred, index)])
        m = min(len(a) for a in per_ch)
        frame = np.stack([a[:m] for a in per_ch], axis=1)
        out.append(frame.mean(axis=1))  # downmix, matching decode_wav_pcm
    x = np.concatenate(out) if out else np.zeros(0, np.float64)
    if n_samples is not None:
        x = x[:n_samples]
    return (x / 32767.0).astype(np.float32), sr
