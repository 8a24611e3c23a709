"""Multimodal2 ops: caption-image alignment gate construction laws,
SSIM naive re-derivation + identity/monotonicity, MFCC naive-DFT
re-derivation + amplitude-scale and tone-localization laws — the
honesty checks behind the three golden-pin digest oracles."""

import numpy as np
import pyarrow as pa

from lulu_crawler_ray.functions.imagecodec import decode
from lulu_crawler_ray.pipelines import multimodal2 as mm

SF = "/root/testdata/sf0.01"


# ------------------------------------------------- caption alignment


def test_describe_image_handbuilt():
    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 0] = 250  # bright-ish red, flat
    bright, texture, chan = mm.describe_image(img)
    assert (bright, texture, chan) == ("dark", "flat", "red")  # 250 < 382.5 as 3x-luma
    img2 = np.full((8, 8, 3), 200, np.uint8)  # 3x-luma 600 >= 382.5
    img2[..., 2] = 255
    assert mm.describe_image(img2) == ("bright", "flat", "blue")


def test_caption_align_construction_laws():
    """Aligned rows score exactly 3, planted misalignments exactly 0
    (antonyms on all three attributes), and counts add up."""
    t = mm.build_captioned_fixture(70)
    scored = mm.CaptionAlignStage()(t)
    s = scored["align_n"].to_numpy()
    planted = np.array([i % 7 == 3 for i in range(70)])
    assert (s[~planted] == 3).all()
    assert (s[planted] == 0).all()
    assert scored["kept"].to_numpy().sum() == 70 - planted.sum()


def test_caption_align_scorer_reads_caption_not_index():
    """Swapping two captions must swap the scores — the stage scores
    the (caption, pixels) pair, not the row position."""
    t = mm.build_captioned_fixture(14)
    cap = t["caption"].to_pylist()
    cap[0], cap[3] = cap[3], cap[0]  # row 3 is a planted misalignment
    t2 = t.set_column(t.schema.get_field_index("caption"), "caption", pa.array(cap))
    s2 = mm.CaptionAlignStage()(t2)["align_n"].to_numpy()
    # row 0 now carries row 3's antonym caption of a DIFFERENT image:
    # not guaranteed 0, but guaranteed not the aligned 3 on attribute
    # 'chan' unless images coincide; assert the swap moved both scores
    s1 = mm.CaptionAlignStage()(t)["align_n"].to_numpy()
    assert s1[0] == 3 and s1[3] == 0
    assert s2[0] != 3 or s2[3] != 0


# ------------------------------------------------------------- SSIM


def _naive_ssim(x: np.ndarray, y: np.ndarray, win: int = 8) -> float:
    vals = []
    for i in range(x.shape[0] - win + 1):
        for j in range(x.shape[1] - win + 1):
            a = x[i : i + win, j : j + win].ravel()
            b = y[i : i + win, j : j + win].ravel()
            ma, mb = a.mean(), b.mean()
            va = (a * a).mean() - ma * ma
            vb = (b * b).mean() - mb * mb
            cab = (a * b).mean() - ma * mb
            vals.append(
                ((2 * ma * mb + mm._C1) * (2 * cab + mm._C2))
                / ((ma * ma + mb * mb + mm._C1) * (va + vb + mm._C2))
            )
    return float(np.mean(vals))


def test_ssim_matches_naive():
    rng = np.random.default_rng(11)
    x = rng.integers(0, 256, (20, 24)).astype(np.float64)
    y = np.clip(x + rng.normal(0, 12, x.shape), 0, 255)
    assert abs(mm.ssim_uniform(x, y) - _naive_ssim(x, y)) < 1e-9


def test_ssim_identity_and_bounds():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, (16, 16)).astype(np.float64)
    assert mm.ssim_uniform(x, x) == 1.0
    y = rng.integers(0, 256, (16, 16)).astype(np.float64)
    s = mm.ssim_uniform(x, y)
    assert -1.0 <= s < 1.0


def test_ssim_quality_monotone():
    """Mean SSIM against a q=80 recompression must beat q=15 on the
    fixture (full-reference metric tracks the distortion knob)."""
    from lulu_crawler_ray.pipelines.images_pipe import build_image_fixture

    t = build_image_fixture(12)
    hi = mm.SsimStage(quality=80)(t)["ssim_c"].to_numpy()
    lo = mm.SsimStage(quality=15)(t)["ssim_c"].to_numpy()
    assert hi.mean() > lo.mean()
    assert (hi >= lo).mean() > 0.8  # allow rare per-image inversions


# ------------------------------------------------------------- MFCC


def test_rfft_power_matches_naive_dft():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, mm.N_FFT)
    spec = np.fft.rfft(x)
    k = np.arange(mm.N_FFT // 2 + 1)[:, None]
    n = np.arange(mm.N_FFT)[None, :]
    w = np.exp(-2j * np.pi * k * n / mm.N_FFT)
    naive = w @ x
    assert np.abs(spec - naive).max() < 1e-8


def test_mel_filterbank_shape_laws():
    fb = mm.mel_filterbank()
    assert fb.shape == (mm.N_MELS, mm.N_FFT // 2 + 1)
    assert (fb >= 0).all() and (fb <= 1).all()
    assert (fb.sum(axis=1) > 0).all()  # no empty filter at 8 kHz / 16 mels
    # centers are ordered: argmax bin strictly increases
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) > 0).all()


def test_dct_orthonormal_rows():
    d = mm.dct2_orthonormal(mm.N_MELS, mm.N_MELS)  # square for the law
    assert np.abs(d @ d.T - np.eye(mm.N_MELS)).max() < 1e-12


def test_mfcc_amplitude_scale_law():
    """Scaling the signal by 2 adds exactly ln(4) to every log-mel bin
    (power is quadratic, mel is linear-positive), so c0 shifts by
    4*ln(4) (the DC row of the orthonormal DCT sums to sqrt(1/16)*16)
    and c1..c7 stay put."""
    sr = 8000
    # broadband noise: every mel band's power dwarfs the 1e-8 log
    # epsilon, so the shift law is exact (a pure tone leaves far bands
    # at ~1e-15 power where the epsilon floor breaks the law)
    base = 0.1 * np.random.default_rng(9).normal(0, 1, sr)
    a = mm.mfcc_frames(base, sr)
    b = mm.mfcc_frames(2 * base, sr)
    d = (b - a).mean(axis=0)
    assert abs(d[0] - 4 * np.log(4.0)) < 1e-6
    assert np.abs(d[1:]).max() < 1e-6


def test_mfcc_tone_localization():
    """A higher tone moves the mel-energy argmax up — the front end
    hears frequency, not just amplitude."""
    sr = 8000
    t_axis = np.arange(sr) / sr

    def band(freq):
        x = 0.3 * np.sin(2 * np.pi * freq * t_axis)
        frames = x[: mm.N_FFT]
        hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(mm.N_FFT) / mm.N_FFT)
        p = np.abs(np.fft.rfft(frames * hann)) ** 2 / mm.N_FFT
        return int((mm.mel_filterbank(sr=sr) @ p).argmax())

    assert band(220.0) < band(880.0) < band(3000.0)


def test_mfcc_extractor_stereo_mono_mix():
    """A stereo clip with identical channels must produce the same
    witnesses as its mono version (channel averaging is exact)."""
    from lulu_crawler_ray.stages.multimodal import encode_wav_pcm16

    sr = 8000
    t_axis = np.arange(sr, dtype=np.float32) / sr
    tone = (0.25 * np.sin(2 * np.pi * 550.0 * t_axis)).astype(np.float32)
    stereo = np.repeat(tone, 2)
    tbl = pa.table(
        {
            "media_id": pa.array(["mono", "stereo"]),
            "bytes": pa.array(
                [encode_wav_pcm16(tone, sr), encode_wav_pcm16(stereo, sr, n_channels=2)],
                pa.binary(),
            ),
            "codec": pa.array(["wav", "wav"]),
            "sample_rate": pa.array([sr, sr], pa.int32()),
            "n_channels": pa.array([1, 2], pa.int32()),
        }
    )
    out = mm.MfccExtractor()(tbl)
    assert out["c0_sum"][0].as_py() == out["c0_sum"][1].as_py()
    assert out["mfcc_mix"][0].as_py() == out["mfcc_mix"][1].as_py()
