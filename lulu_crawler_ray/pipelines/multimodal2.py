"""Continuation-session multimodal operators (round 5): the
caption-image alignment gate (the CLIP-filter shape with the model
stubbed by a deterministic rule-based scorer — the Ray plumbing is
real: actor-pool stage, Arrow batches, digest output), full-reference
SSIM quality scoring against a JPEG recompression, and a real
log-mel / MFCC spectral front end (numpy rfft + triangular mel bank +
orthonormal DCT-II).

No reference file:line citations are possible — /root/reference is
empty (SURVEY.md §0). Public algorithm bases: SSIM (Wang et al., IEEE
TIP 2004, uniform-window variant), MFCC/HTK mel binning (Davis &
Mermelstein 1980), CLIP-style image-text filtering (Radford et al.
2021 — stubbed scorer, see class docstring)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions import pagegen
from ..functions.imagecodec import decode
from ..functions.jpeg import decode_jpeg_baseline, encode_jpeg_baseline
from ..functions.urlnorm import sha1_bytes
from . import images_pipe as ip

# --------------------------------------------- caption-image alignment

_CHAN_WORDS = ("red", "green", "blue")


def describe_image(img: np.ndarray) -> tuple[str, str, str]:
    """Integer-exact attribute triple of an RGB image: brightness
    (mean 3x-luma >= 382.5, cross-multiplied), texture (mean |horizontal
    luma diff| >= 8), dominant channel (argmax of channel sums, ties to
    the lowest index). The ground-truth captioner AND the alignment
    scorer share this rule — the 'model' is the rule, deterministically."""
    g = img.astype(np.int64).sum(axis=2)  # 0..765 exact
    npx = g.size
    bright = "bright" if 2 * int(g.sum()) >= 765 * npx else "dark"
    d = np.abs(np.diff(g, axis=1)).sum()
    texture = "textured" if int(d) >= 8 * g.shape[0] * (g.shape[1] - 1) else "flat"
    sums = img.reshape(-1, 3).astype(np.int64).sum(axis=0)
    chan = _CHAN_WORDS[int(np.argmax(sums))]
    return bright, texture, chan


def build_captioned_fixture(n_rows: int, seed: int = 42, mis_mod: int = 7) -> pa.Table:
    """T3-schema fixture whose captions DESCRIBE the pixels (template
    'a {bright} {texture} photo, {chan} dominant') — except rows with
    i % mis_mod == 3, which get the full antonym caption (wrong on all
    three attributes) as planted misalignments."""
    from ..functions.phash import phash64
    from .. import schemas

    cols: dict[str, list] = {f.name: [] for f in schemas.IMAGE_TABLE}
    fmts = ("raw", "ppm", "png")
    for i in range(n_rows):
        url = f"http://cap{i % 50}.test/img/{i:012x}.{fmts[i % 3]}"
        w, h, fmt, data = pagegen.image_payload(seed, url)
        img = decode(data, fmt)
        bright, texture, chan = describe_image(img)
        if i % mis_mod == 3:
            bright = "dark" if bright == "bright" else "bright"
            texture = "flat" if texture == "textured" else "textured"
            chan = _CHAN_WORDS[(_CHAN_WORDS.index(chan) + 1) % 3]
        cols["image_id"].append(sha1_bytes(url).hex())
        cols["bytes"].append(data)
        cols["w"].append(w)
        cols["h"].append(h)
        cols["fmt"].append(fmt)
        cols["caption"].append(f"a {bright} {texture} photo, {chan} dominant")
        cols["phash"].append(phash64(img))
    return pa.Table.from_pydict(
        {f.name: pa.array(cols[f.name], f.type) for f in schemas.IMAGE_TABLE},
        schema=schemas.IMAGE_TABLE,
    )


class CaptionAlignStage:
    """Actor-pool caption-image alignment scorer — the LAION/DataComp
    CLIP-filter stage shape with the neural scorer STUBBED by the
    deterministic describe_image rule (this container has no image
    model; the Ray side — actor pool, zero-copy Arrow batches, integer
    outputs, gate threshold — is the real contract). Score = number of
    caption attribute tokens (brightness / texture / dominant channel)
    that match the pixels, 0..3; kept = all three match."""

    def __call__(self, t: pa.Table) -> pa.Table:
        scores = []
        for i in range(t.num_rows):
            img = decode(t["bytes"][i].as_py(), t["fmt"][i].as_py())
            bright, texture, chan = describe_image(img)
            toks = set(t["caption"][i].as_py().replace(",", " ").split())
            scores.append(int(bright in toks) + int(texture in toks) + int(chan in toks))
        s = np.array(scores, np.int64)
        return pa.table(
            {
                "image_id": t["image_id"],
                "align_n": pa.array(s),
                "kept": pa.array((s == 3).astype(np.int64)),
            }
        )


def img_caption_align_digest_query(sf: str) -> pa.Table:
    """queries() entry (golden-pin oracle): the caption-image alignment
    gate over the captioned fixture (1-in-7 planted full misalignments),
    one digest row. Pin kept honest by the construction law tests in
    tests/test_multimodal2.py (aligned rows score exactly 3, planted
    rows exactly 0, counts add up)."""
    n = 400 if ip._is_big_sf(sf) else 200
    ds = ray.data.from_arrow(build_captioned_fixture(n)).repartition(8)
    out = ds.map_batches(
        CaptionAlignStage, batch_format="pyarrow", batch_size=64, concurrency=2
    )
    t = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow", batch_size=65536))
    ).combine_chunks()
    t = t.take(pc.sort_indices(t, sort_keys=[("image_id", "ascending")]))
    return ip._one_row_digest(t, ["align_n", "kept"])


# --------------------------------------------- SSIM vs recompression

_C1 = (0.01 * 255.0) ** 2
_C2 = (0.03 * 255.0) ** 2


def _box_sum(a: np.ndarray, win: int) -> np.ndarray:
    c = np.cumsum(np.cumsum(a, axis=0, dtype=np.float64), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    return c[win:, win:] - c[:-win, win:] - c[win:, :-win] + c[:-win, :-win]


def ssim_uniform(x: np.ndarray, y: np.ndarray, win: int = 8) -> float:
    """Mean SSIM over all win x win windows (uniform window, population
    variance — the Wang et al. 2004 index with the gaussian replaced by
    a box, which keeps the kernel integral-image exact). Inputs are 2-D
    float64 luma in [0, 255]. ssim(x, x) == 1.0 exactly (identical
    arithmetic on both operands)."""
    if x.shape != y.shape or x.shape[0] < win or x.shape[1] < win:
        raise ValueError("ssim_uniform: shapes must match and exceed the window")
    n = win * win
    mx = _box_sum(x, win) / n
    my = _box_sum(y, win) / n
    sxx = _box_sum(x * x, win) / n - mx * mx
    syy = _box_sum(y * y, win) / n - my * my
    sxy = _box_sum(x * y, win) / n - mx * my
    s = ((2 * mx * my + _C1) * (2 * sxy + _C2)) / (
        (mx * mx + my * my + _C1) * (sxx + syy + _C2)
    )
    return float(s.mean())


class SsimStage:
    """Actor-pool full-reference quality gate: recompress each image as
    baseline JPEG (quality/subsampling fixed per stage instance) and
    score the decode against the original with uniform-window SSIM on
    the luma plane — the curation signal that catches images that
    survive transcoding badly (dense texture, synthetic edges)."""

    def __init__(self, quality: int = 40, subsample: str = "420"):
        self.quality = quality
        self.subsample = subsample

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        for i in range(t.num_rows):
            img = decode(t["bytes"][i].as_py(), t["fmt"][i].as_py())
            jb = encode_jpeg_baseline(img, quality=self.quality, subsample=self.subsample)
            rec = decode_jpeg_baseline(jb)
            x = img.astype(np.float64).mean(axis=2)
            y = rec.astype(np.float64).mean(axis=2)
            out.append(int(np.rint(ssim_uniform(x, y) * 10000)))
        return pa.table(
            {
                "image_id": t["image_id"],
                "ssim_c": pa.array(out, pa.int64()),
            }
        )


def img_ssim_digest_query(sf: str) -> pa.Table:
    """queries() entry (golden-pin oracle): SSIM against a quality-40
    4:2:0 JPEG recompression over the deterministic fixture, one digest
    row. Pin kept honest by the naive per-window SSIM re-derivation and
    the identity/quality-monotonicity laws in tests/test_multimodal2.py."""
    n = 400 if ip._is_big_sf(sf) else 200
    ds = ip.fixture_dataset(n)
    out = ds.map_batches(
        SsimStage, batch_format="pyarrow", batch_size=32, concurrency=2
    )
    t = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow", batch_size=65536))
    ).combine_chunks()
    t = t.take(pc.sort_indices(t, sort_keys=[("image_id", "ascending")]))
    return ip._one_row_digest(t, ["ssim_c"])


# --------------------------------------------- log-mel / MFCC front end

N_FFT = 512
HOP = 256
N_MELS = 16
N_MFCC = 8


def mel_filterbank(n_mels: int = N_MELS, n_fft: int = N_FFT, sr: int = 8000) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filters, HTK mel scale with
    floor-binned breakpoints (Davis & Mermelstein via the HTK manual)."""

    def mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def imel(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    pts = imel(np.linspace(mel(0.0), mel(sr / 2.0), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / sr).astype(np.int64)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float64)
    for m in range(1, n_mels + 1):
        lo, ce, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, ce):
            fb[m - 1, k] = (k - lo) / max(ce - lo, 1)
        for k in range(ce, hi):
            fb[m - 1, k] = (hi - k) / max(hi - ce, 1)
    return fb


def dct2_orthonormal(n_out: int = N_MFCC, n_in: int = N_MELS) -> np.ndarray:
    """(n_out, n_in) orthonormal DCT-II matrix."""
    k = np.arange(n_out, dtype=np.float64)[:, None]
    j = np.arange(n_in, dtype=np.float64)[None, :]
    d = np.cos(np.pi * k * (2 * j + 1) / (2 * n_in)) * np.sqrt(2.0 / n_in)
    d[0] /= np.sqrt(2.0)
    return d


def mfcc_frames(pcm: np.ndarray, sr: int) -> np.ndarray:
    """(n_frames, N_MFCC) MFCC matrix of a mono float signal in [-1, 1]:
    hann-windowed N_FFT frames at HOP, rfft power spectrum, triangular
    mel bank, log, orthonormal DCT-II."""
    if len(pcm) < N_FFT:
        return np.zeros((0, N_MFCC), np.float64)
    n_frames = 1 + (len(pcm) - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = pcm[idx].astype(np.float64)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(N_FFT) / N_FFT)
    spec = np.fft.rfft(frames * hann, axis=1)
    power = (spec.real**2 + spec.imag**2) / N_FFT
    fb = mel_filterbank(sr=sr)
    logmel = np.log(power @ fb.T + 1e-8)
    return logmel @ dct2_orthonormal().T


class MfccExtractor:
    """Actor-pool MFCC front end over WAV clips (the speech/audio
    curation feature stage): decode PCM, average channels to mono,
    frame + window + rfft + mel + log + DCT once per clip — filterbank
    and DCT matrices built once per ACTOR in __init__, every frame of
    a clip processed in one vectorized matmul chain. Emits per clip:
    n_frames, c0_sum (sum over frames of round(c0 * 1000)) and
    mfcc_mix (xor of all rounded coefficients x rank) — integerized
    witnesses of the whole coefficient matrix."""

    def __init__(self):
        self._fb = mel_filterbank()
        self._dct = dct2_orthonormal()
        n = N_FFT
        self._hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..stages.multimodal import decode_wav_pcm

        nf_l, c0_l, mix_l = [], [], []
        for i in range(t.num_rows):
            # decode_wav_pcm already downmixes to mono float in [-1, 1]
            mono, sr, nch = decode_wav_pcm(t["bytes"][i].as_py())
            if len(mono) < N_FFT:
                nf_l.append(0)
                c0_l.append(0)
                mix_l.append(0)
                continue
            n_frames = 1 + (len(mono) - N_FFT) // HOP
            idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
            frames = mono[idx] * self._hann
            spec = np.fft.rfft(frames, axis=1)
            power = (spec.real**2 + spec.imag**2) / N_FFT
            co = np.log(power @ self._fb.T + 1e-8) @ self._dct.T
            q = np.rint(co * 1000).astype(np.int64)
            rank = np.arange(1, q.size + 1, dtype=np.int64)
            nf_l.append(n_frames)
            c0_l.append(int(q[:, 0].sum()))
            mix_l.append(int(np.bitwise_xor.reduce(q.ravel() * rank)))
        return pa.table(
            {
                "media_id": t["media_id"],
                "n_frames": pa.array(nf_l, pa.int64()),
                "c0_sum": pa.array(c0_l, pa.int64()),
                "mfcc_mix": pa.array(mix_l, pa.int64()),
            }
        )


def _tone_fixture(n: int, sr: int = 8000) -> pa.Table:
    from ..stages.multimodal import AUDIO_SCHEMA, encode_wav_pcm16

    rows = {"media_id": [], "bytes": [], "codec": [], "sample_rate": [], "n_channels": []}
    t_axis = np.arange(sr, dtype=np.float32) / sr
    for i in range(n):
        freq = 110.0 * (1 + i % 8)
        amp = 0.2 + 0.1 * (i % 5)
        tone = (amp * np.sin(2 * np.pi * freq * t_axis)).astype(np.float32)
        rows["media_id"].append(f"m{i:04d}")
        rows["bytes"].append(encode_wav_pcm16(tone, sr))
        rows["codec"].append("wav")
        rows["sample_rate"].append(sr)
        rows["n_channels"].append(1)
    return pa.Table.from_pydict(
        {
            "media_id": pa.array(rows["media_id"]),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "codec": pa.array(rows["codec"]),
            "sample_rate": pa.array(rows["sample_rate"], pa.int32()),
            "n_channels": pa.array(rows["n_channels"], pa.int32()),
        },
        schema=AUDIO_SCHEMA,
    )


def audio_mfcc_digest_query(sf: str) -> pa.Table:
    """queries() entry (golden-pin oracle): the MFCC front end over the
    deterministic sine-tone WAV fixture, one digest row. Pin kept honest
    by the naive-DFT re-derivation, the amplitude-scale law (c1..c7
    invariant, c0 shifts by exactly 4*ln(4)) and the tone-localization
    law in tests/test_multimodal2.py."""
    n = 60 if ip._is_big_sf(sf) else 30
    ds = ray.data.from_arrow(_tone_fixture(n)).repartition(4)
    out = ds.map_batches(
        MfccExtractor, batch_format="pyarrow", batch_size=16, concurrency=2
    )
    t = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow", batch_size=65536))
    ).combine_chunks()
    t = t.take(pc.sort_indices(t, sort_keys=[("media_id", "ascending")]))
    return ip._one_row_digest(t, ["n_frames", "c0_sum", "mfcc_mix"])
