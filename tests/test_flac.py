"""FLAC codec (functions/flac.py): subframe-type roundtrips, all four
stereo assignments, Rice escapes, wasted bits, partitioned residuals,
CRC/MD5 integrity, and the stage-contract decode helper."""

import hashlib

import numpy as np
import pytest

from lulu_crawler_ray.functions.flac import (
    _crc8,
    _crc16,
    _utf8_decode,
    _utf8_encode,
    _BitReader,
    decode_flac,
    decode_flac_pcm,
    encode_flac,
)


def _tone(n=20000, sr=8000, f=440.0, amp=3000.0, seed=None):
    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * f * t / sr) + amp / 6 * np.sin(2 * np.pi * 97 * t / sr)
    if seed is not None:
        x = x + np.random.default_rng(seed).integers(-5, 6, n)
    return x.astype(np.int64)


def test_mono_roundtrip_compresses():
    x = _tone()
    enc = encode_flac(x, 8000)
    dec, sr, bps = decode_flac(enc)
    assert (sr, bps) == (8000, 16)
    assert np.array_equal(dec[:, 0], x)
    assert len(enc) < len(x) * 2 * 0.6  # beats PCM16 by >40% on tones


@pytest.mark.parametrize("mode,assign_byte", [("ms", 10), ("ls", 8), ("rs", 9), ("indep", 1)])
def test_stereo_assignments_roundtrip(mode, assign_byte):
    x = _tone(6000)
    st = np.stack([x, (x * 0.7).astype(np.int64) + _tone(6000, f=50, amp=7, seed=3) // 2], 1)
    enc = encode_flac(st, 8000, stereo_mode=mode)
    dec, _, _ = decode_flac(enc)
    assert np.array_equal(dec, st), mode
    # the assignment actually on the wire is the one requested:
    # frame header byte 2 (after 42 metadata bytes + 2 sync bytes)
    # carries [assign:4][bps:3][0:1]
    assert enc[42 + 2 + 1] >> 4 == assign_byte


def test_constant_verbatim_escape_lpc_wasted_partitions():
    x = _tone(5000)
    cases = {
        "constant": (np.full(5000, -123, np.int64), {}),
        "verbatim": (
            np.random.default_rng(1).integers(-32768, 32768, 5000),
            {"force_verbatim": True},
        ),
        "escape": (x, {"force_escape": True}),
        "lpc": (x, {"force_lpc": True}),
        "wasted": ((x >> 3) << 3, {}),
        "wasted_lpc": ((x >> 2) << 2, {"force_lpc": True}),
        "partitions": (_tone(16384), {"partition_order": 4}),
    }
    for name, (sig, kw) in cases.items():
        dec, _, _ = decode_flac(encode_flac(sig, 8000, **kw))
        assert np.array_equal(dec[:, 0], sig), name


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_bit_depths(bps):
    x = _tone() >> (16 - min(bps, 16))
    if bps == 24:
        x = _tone() * 200
    dec, _, got = decode_flac(encode_flac(x, bps=bps))
    assert got == bps
    assert np.array_equal(dec[:, 0], x)


def test_partial_last_frame_and_tiny_inputs():
    for n in (1, 2, 5, 4095, 4097):
        x = _tone(n)
        dec, _, _ = decode_flac(encode_flac(x))
        assert np.array_equal(dec[:, 0], x), n


def test_corruption_raises_not_garbage():
    enc = bytearray(encode_flac(_tone(5000)))
    bad = bytearray(enc)
    bad[60] ^= 0x40  # frame body -> CRC-16
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    bad = bytearray(enc)
    bad[44] ^= 0x01  # frame header -> CRC-8
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError):
        decode_flac(b"fLaX" + bytes(enc[4:]))
    with pytest.raises(ValueError):
        decode_flac(bytes(enc[: len(enc) // 2]))  # truncation


def test_review_fixes():
    x = _tone(5000)
    enc = encode_flac(x)
    # truncation exactly at the frame-CRC16 boundary raises ValueError
    # (was struct.error), so except-ValueError skip logic works
    for cut in (1, 2):
        with pytest.raises(ValueError):
            decode_flac(enc[:-cut])
    # non-byte-multiple bps: STREAMINFO MD5 is the spec's 16 zero
    # bytes ("unset"), not the MD5 of the empty string
    e12 = encode_flac(_tone(2000) >> 4, bps=12)
    assert e12[26:42] == b"\x00" * 16
    dec, _, got = decode_flac(e12)
    assert got == 12 and np.array_equal(dec[:, 0], _tone(2000) >> 4)
    # empty PCM encodes to a valid zero-sample stream
    empty = encode_flac(np.array([], np.int64))
    out, sr, _ = decode_flac(empty)
    assert out.shape == (0, 1)


def test_md5_is_real_and_checked():
    x = _tone(3000)
    enc = bytearray(encode_flac(x, 8000))
    # STREAMINFO md5 lives at bytes 8+18 .. 8+34; flip one bit there
    ref = bytes(enc[26:42])
    assert ref == hashlib.md5(x.astype("<i2").tobytes()).digest()
    enc[26] ^= 1
    # header CRC doesn't cover metadata, so only the MD5 gate catches it
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(enc))
    dec, _, _ = decode_flac(bytes(enc), verify_md5=False)
    assert np.array_equal(dec[:, 0], x)


def test_utf8_frame_numbers():
    r5 = lambda v: _utf8_decode(_BitReader(_utf8_encode(v)))
    for v in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1, (1 << 36) - 1):
        assert r5(v) == v
    # many-frame stream exercises multi-byte numbers on the wire
    x = _tone(40 * 256)
    dec, _, _ = decode_flac(encode_flac(x, block_size=256))
    assert np.array_equal(dec[:, 0], x)


def test_crc_tables_match_reference_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005, init 0 (public check words)
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_stage_decode_helper_and_dispatch():
    x = _tone(8000)
    st = np.stack([x, x // 2], 1)
    pcm, sr = decode_flac_pcm(encode_flac(st, 8000))
    assert sr == 8000 and pcm.dtype == np.float32 and pcm.shape == (8000,)
    ref = (st.astype(np.float64) / 32768).mean(axis=1)
    assert np.allclose(pcm, ref, atol=1e-6)

    from lulu_crawler_ray.stages.multimodal import AudioSegmenter

    import pyarrow as pa

    seg = AudioSegmenter(deterministic_fake=False)
    sr = 8000
    tone = 0.5 * np.sin(2 * np.pi * 300 * np.arange(sr // 5) / sr)
    sig = np.concatenate([tone, np.zeros(sr // 5), tone])
    flac_bytes = encode_flac((sig * 32767).astype(np.int64), sr)
    t = pa.table(
        {
            "media_id": pa.array(["f0"]),
            "bytes": pa.array([flac_bytes], pa.binary()),
            "codec": pa.array(["flac"]),
        }
    )
    out = seg(t)
    segs = out.to_pydict()
    # two voiced bursts with a silent gap -> exactly 2 segments
    assert segs["seg_idx"] == [0, 1]
    assert segs["start_ms"] == [0, 400]
