"""Baseline JPEG codec (functions/jpeg.py): roundtrip PSNR gates,
4:2:0 general-sampling decode, marker robustness, and the codec
registry wiring."""

import numpy as np
import pytest

from lulu_crawler_ray.functions.jpeg import decode_jpeg_baseline, encode_jpeg_baseline
from lulu_crawler_ray.functions.imagecodec import decode, encode, psnr


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 255 / max(w - 1, 1)), (yy * 255 / max(h - 1, 1)), ((xx + yy) * 255 / max(h + w - 2, 1))],
        axis=-1,
    ).astype(np.uint8)


def test_roundtrip_psnr_gate_smooth():
    """Quality>=90 on smooth content must clear 40 dB; degraded quality
    must measurably lose fidelity (same REAL-assertion shape as the ldt
    codec's BASELINE.json PSNR>=40 criterion)."""
    img = _gradient(48, 64)
    hi = decode_jpeg_baseline(encode_jpeg_baseline(img, 95))
    lo = decode_jpeg_baseline(encode_jpeg_baseline(img, 10))
    assert psnr(img, hi) >= 40.0
    assert psnr(img, lo) < psnr(img, hi) - 5.0


def test_roundtrip_shapes_and_sizes():
    rng = np.random.default_rng(5)
    for shape in [(1, 1, 3), (7, 5, 3), (8, 8, 3), (9, 17, 3), (16, 16, 3), (23, 31, 3)]:
        im = rng.integers(0, 256, shape, dtype=np.uint8)
        for sub in ("444", "420"):
            out = decode_jpeg_baseline(encode_jpeg_baseline(im, 90, subsample=sub))
            assert out.shape == shape
            assert out.dtype == np.uint8


def test_420_subsampled_decode_path():
    """4:2:0 exercises the decoder's general MCU layout (2x2 luma
    blocks per MCU + chroma upsampling); luma fidelity must survive."""
    img = _gradient(50, 70)  # not a multiple of 16 -> MCU edge padding
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, 95, subsample="420"))
    assert out.shape == img.shape
    assert psnr(img, out) >= 35.0


def test_grayscale_single_component():
    yy = np.tile(np.arange(48, dtype=np.uint8), (32, 1)).T[:48, :32]
    out = decode_jpeg_baseline(encode_jpeg_baseline(yy, 92))
    assert out.shape == (48, 32, 3)
    assert psnr(np.stack([yy] * 3, axis=-1), out) >= 40.0


def test_flat_block_dc_only():
    """A flat image compresses to DC-only blocks and must decode to the
    same flat value within quantization error."""
    img = np.full((16, 16, 3), 130, np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img, 95))
    assert np.abs(out.astype(int) - 130).max() <= 2


def test_deterministic_bytes():
    img = _gradient(24, 24)
    assert encode_jpeg_baseline(img, 85) == encode_jpeg_baseline(img, 85)


def test_registry_dispatch():
    img = _gradient(16, 24)
    data = encode(img, "jpeg")
    out = decode(data, "jpeg")
    assert out.shape == img.shape
    assert psnr(img, out) >= 25.0  # default q=85 on a tiny gradient


def test_declared_seams_raise():
    img = _gradient(8, 8)
    data = bytearray(encode_jpeg_baseline(img, 85))
    i = data.find(b"\xFF\xC0")
    data[i + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError, match="arithmetic|unsupported"):
        decode_jpeg_baseline(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"not a jpeg")


def test_byte_stuffing_and_restart_tolerance():
    """Images whose entropy stream contains 0xFF bytes must unstuff
    cleanly (encoder inserts 0x00 after every 0xFF)."""
    rng = np.random.default_rng(17)
    for _ in range(3):
        im = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        out = decode_jpeg_baseline(encode_jpeg_baseline(im, 75))
        assert out.shape == im.shape


def test_img_jpeg_pipeline_digest_pinned(ray_session):
    """End-to-end actor-pool JPEG decode over the deterministic fixture:
    every payload decode-validates and the integer pixel digest is
    pinned (any codec regression moves it)."""
    from lulu_crawler_ray.pipelines.images_pipe import img_jpeg_pipeline_query

    t = img_jpeg_pipeline_query("/root/testdata/sf0.001").to_pandas()
    assert list(t["subsample"]) == ["420", "444"]
    assert list(t["n_rows"]) == [15, 15]
    assert list(t["n_ok"]) == [15, 15]
    assert list(t["px_sum"]) == [8612515, 6905200]


def test_img_stats_and_resize_integer_digests_pinned(ray_session):
    """Integer-digest contracts for the formerly rows-only image
    queries (VERDICT r3 item 7): exact pinned fold of img_stats'
    grouped output and img_resize's (w, h, phash-xor, id-hash) — any
    decoder/resize/phash regression moves these."""
    import numpy as np
    from lulu_crawler_ray.pipelines.images_pipe import img_resize_query, img_stats_query

    sf = "/root/testdata/sf0.001"
    s = img_stats_query(sf)
    s = (s.to_pandas() if hasattr(s, "to_pandas") else s).sort_values("fmt").reset_index(drop=True)
    assert list(s["fmt"]) == ["png", "ppm", "raw"]
    assert list(s["n"]) == [100, 100, 100]

    r = img_resize_query(sf)
    r = r.to_pandas() if hasattr(r, "to_pandas") else r
    assert len(r) == 300
    assert set(zip(r["w"], r["h"])) == {(32, 32)}
    ph = r["phash"].to_numpy().astype(np.int64)
    idh = np.bitwise_xor.reduce(
        [int(x[:16], 16) - (1 << 63) for x in sorted(r["image_id"])]
    )
    digest = (int(np.bitwise_xor.reduce(ph)), int(idh))
    assert digest == PINNED_RESIZE_DIGEST, digest
    assert list(np.sort(s["avg_px"].to_numpy())) == PINNED_STATS_AVGPX, list(np.sort(s["avg_px"].to_numpy()))


PINNED_RESIZE_DIGEST = (885481482856359965, -6709845456964182415)
PINNED_STATS_AVGPX = [12739, 12745, 12757]


def test_img_blur_scores_digest_pinned(ray_session):
    """Laplacian-variance blur gate over the deterministic fixture:
    integer digest pinned (decode/grayscale/kernel regressions move it)."""
    from lulu_crawler_ray.pipelines.images_pipe import img_blur_scores_query

    t = img_blur_scores_query("/root/testdata/sf0.001").to_pandas()
    assert t.iloc[0].to_dict() == {"n": 300, "n_sharp": 300, "sum_sharp_c": 1432037688}


def test_truncated_scan_raises_not_garbage():
    """ADVICE r4: a truncated entropy-coded scan must raise, not decode
    1-bit padding into garbage pixels."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 48, 3), np.uint8)
    data = encode_jpeg_baseline(img, quality=90)
    # cut the stream well inside the scan (markers intact up to SOS)
    sos = data.find(b"\xff\xda")
    assert sos > 0
    truncated = data[: sos + (len(data) - sos) // 3]
    with pytest.raises(ValueError, match="jpeg"):
        decode_jpeg_baseline(truncated)


def test_missing_restart_segment_raises():
    """ADVICE r4: fewer restart segments than restart_interval implies
    must raise a ValueError, not IndexError."""
    img = np.full((32, 32, 3), 128, np.uint8)
    data = encode_jpeg_baseline(img, quality=85)
    assert b"\xff\xdd" not in data[:2]  # encoder writes no DRI
    # inject a DRI segment (restart_interval=1) right before SOS: the
    # scan then promises a restart marker per MCU that is not there
    sos = data.find(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x01"
    patched = data[:sos] + dri + data[sos:]
    with pytest.raises((ValueError, KeyError)):
        decode_jpeg_baseline(patched)


def test_progressive_decode_matches_baseline_exactly():
    """Round-5 (VERDICT r4 item 9): progressive (SOF2) decode must be
    PIXEL-IDENTICAL to decoding the baseline encoding of the same image
    — both carry the same quantized coefficients, so any entropy-layer
    bug (EOB runs, refinement correction-bit interleave, per-scan DHTs)
    breaks the equality."""
    from lulu_crawler_ray.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(5)
    cases = [((40, 56, 3), "444"), ((33, 41, 3), "420"), ((24, 24), "444")]
    for shape, sub in cases:
        img = rng.integers(0, 256, shape, np.uint8)
        sub_eff = sub if img.ndim == 3 else "444"
        base = decode_jpeg_baseline(encode_jpeg_baseline(img, 85, sub_eff))
        prog = decode_jpeg_baseline(encode_jpeg_progressive(img, 85, sub_eff))
        assert np.array_equal(base, prog), (shape, sub)
    # flat + smooth inputs drive LONG EOB runs (EOBn>1 symbols) and
    # refinement-heavy scans
    flat = np.full((64, 64, 3), 77, np.uint8)
    assert np.array_equal(
        decode_jpeg_baseline(encode_jpeg_baseline(flat, 85)),
        decode_jpeg_baseline(encode_jpeg_progressive(flat, 85)),
    )
    gy, gx = np.mgrid[0:100, 0:120]
    grad = np.stack([(gy * 2) % 256, (gx * 2) % 256, (gy + gx) % 256], -1).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg_baseline(encode_jpeg_baseline(grad, 60)),
        decode_jpeg_baseline(encode_jpeg_progressive(grad, 60)),
    )


def test_progressive_psnr_and_marker_shape():
    """The progressive stream is a real SOF2 multi-scan file: one SOF2,
    2 + 2*nc SOS markers, per-AC-scan DHTs; decode quality matches the
    baseline PSNR gate."""
    from lulu_crawler_ray.functions.jpeg import encode_jpeg_progressive

    img = _gradient(48, 64)
    data = encode_jpeg_progressive(img, quality=90)
    assert data.count(b"\xFF\xC2") == 1 and b"\xFF\xC0" not in data
    assert data.count(b"\xFF\xDA") == 2 + 2 * 3
    out = decode_jpeg_baseline(data)
    assert psnr(img, out) >= 30.0


def test_16bit_quant_table_decode():
    """DQT pq=1 (16-bit big-endian entries) is legal T.81; rewriting an
    encoded stream's 8-bit DQTs to 16-bit form must decode to
    IDENTICAL pixels (same table values, wider encoding)."""
    import struct

    from lulu_crawler_ray.functions.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    img = _gradient(40, 56)
    data = encode_jpeg_baseline(img, quality=80)
    out = bytearray()
    pos = 0
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] == 0xDB:
            seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
            seg = data[pos + 4 : pos + 2 + seglen]
            new = bytearray()
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                assert pq == 0  # our encoder writes 8-bit tables
                new.append(0x10 | tq)  # pq=1
                for v in seg[o + 1 : o + 65]:
                    new += struct.pack(">H", v)
                o += 65
            out += b"\xFF\xDB" + struct.pack(">H", 2 + len(new)) + new
            pos += 2 + seglen
        else:
            out.append(data[pos])
            pos += 1
    out.append(data[-1])
    assert np.array_equal(decode_jpeg_baseline(bytes(out)), decode_jpeg_baseline(data))


def test_ext12_roundtrip_psnr():
    """12-bit extended sequential (SOF1): encode 12-bit samples, decode
    through the shared path, compare against the /16 MSB reduction."""
    from lulu_crawler_ray.functions.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_ext12,
    )

    y, x = np.mgrid[0:40, 0:56]
    base = ((y * 60 + x * 40) % 4096).astype(np.uint16)
    img12 = np.stack([base, (base * 2) % 4096, 4095 - base], axis=-1).astype(np.uint16)
    out = decode_jpeg_baseline(encode_jpeg_ext12(img12, quality=95))
    ref = np.clip(np.rint(img12 / 16.0), 0, 255)
    mse = ((out.astype(np.float64) - ref) ** 2).mean()
    assert 10 * np.log10(255**2 / mse) >= 38.0
    assert out.shape == (40, 56, 3)


def test_ext12_gray_and_extended_categories():
    """Grayscale 12-bit roundtrip, plus a max-contrast block image that
    forces DC-diff magnitude categories beyond Annex K's 8-bit range
    (the reason the encoder builds per-image tables)."""
    from lulu_crawler_ray.functions.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_ext12,
    )

    y, x = np.mgrid[0:40, 0:56]
    g = ((y * 17 + x * 31) % 4096).astype(np.uint16)
    out = decode_jpeg_baseline(encode_jpeg_ext12(g, quality=95))
    ref = np.clip(np.rint(g / 16.0), 0, 255)
    mse = ((out[:, :, 0].astype(np.float64) - ref) ** 2).mean()
    assert 10 * np.log10(255**2 / mse) >= 40.0
    # alternating 0/4095 8px blocks: DC swings of +-4095*8 between
    # adjacent blocks -> categories ~13-15, undecodable with Annex K
    rng = np.random.default_rng(5)
    hard = (rng.integers(0, 2, (32, 32, 1)) * 4095).astype(np.uint16).repeat(3, axis=2)
    o2 = decode_jpeg_baseline(encode_jpeg_ext12(hard, quality=90))
    assert o2.shape == (32, 32, 3)
    # extreme blocks survive the quant/DCT trip to near-saturation
    ref2 = hard[:, :, 0] // 16
    err = np.abs(o2[:, :, 0].astype(np.int64)[4:-4, 4:-4] - ref2[4:-4, 4:-4])
    assert np.median(err) <= 30


def test_ext12_rejects_bad_input():
    import pytest as _pytest

    from lulu_crawler_ray.functions.jpeg import encode_jpeg_ext12

    with _pytest.raises(ValueError):
        encode_jpeg_ext12(np.zeros((8, 8, 3), np.uint8))
    with _pytest.raises(ValueError):
        encode_jpeg_ext12(np.full((8, 8), 5000, np.uint16))
