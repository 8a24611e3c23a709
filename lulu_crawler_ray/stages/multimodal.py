"""Multimodal columns as opaque binary + typed metadata.

Image decode/resize/phash are REAL in this repo (in-repo codecs —
stages/crawl_stages.py, pipelines/images_pipe.py), and so are the
common audio/video containers: integer PCM WAV (8/16/24-bit),
IEEE-float32 WAV, IMA ADPCM WAV (functions/adpcm.py), FLAC
(functions/flac.py — full subframe/stereo/Rice layer with CRC-8/16 +
MD5 verification), uncompressed RGB24 AVI, and MJPEG AVI (per-frame
baseline JPEG through functions/jpeg.py). Codecs beyond those (MP3,
H.264, ...) have no
library in this sandbox and remain STUBS behind clearly-marked
NotImplementedError with the Ray-side plumbing (schemas, actor
signature, batch sizing, output layout) real and tested: swap the
``_decode_*`` branch for a real library call and the stage works
unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("bytes", pa.binary()),
        ("codec", pa.string()),
        ("sample_rate", pa.int32()),
        ("n_channels", pa.int32()),
    ]
)

AUDIO_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("duration_s", pa.float64()),
        ("features", pa.list_(pa.float32())),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("bytes", pa.binary()),
        ("codec", pa.string()),
        ("fps", pa.float32()),
        ("n_frames", pa.int32()),
    ]
)

FRAME_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("frame_idx", pa.int32()),
        ("frame_png", pa.binary()),
    ]
)


def encode_wav_pcm16(pcm: np.ndarray, sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """float32 [-1, 1] -> PCM16 WAV bytes (stdlib wave — no external
    codec needed). Interleaved if pcm is (n, channels)."""
    import io
    import wave

    x = np.clip(pcm, -1.0, 1.0)
    ints = np.rint(x * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def _parse_riff_wav(data: bytes) -> tuple[int, int, int, int, bytes]:
    """Minimal RIFF/WAVE walk -> (audio_format, n_channels,
    sample_rate, bits_per_sample, data bytes). Used for the formats
    stdlib wave refuses (IEEE float, tag 3)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav: not a RIFF/WAVE file")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            payload = body
        pos += 8 + size + (size & 1)
    if fmt is None or payload is None:
        raise ValueError("wav: missing fmt/data chunk")
    afmt, nch, sr, _br, _ba, bits = fmt
    return afmt, nch, sr, bits, payload


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """(mu-law, A-law) 256-entry int16 expansion tables, built from the
    ITU-T G.711 segment formulas (the Sun g711.c expansion — pytest
    checks byte-for-byte parity against stdlib audioop)."""
    u = np.arange(256, dtype=np.uint8)
    v = (~u) & 0xFF  # mu-law codes transmit complemented
    t = ((((v & 0x0F).astype(np.int32)) << 3) + 0x84) << ((v >> 4) & 0x07)
    mu = np.where(v & 0x80, 0x84 - t, t - 0x84).astype(np.int16)
    a = u ^ 0x55  # A-law codes transmit with even bits inverted
    ta = ((a & 0x0F).astype(np.int32)) << 4
    seg = ((a >> 4) & 0x07).astype(np.int32)
    ta = np.where(
        seg == 0,
        ta + 8,
        np.where(seg == 1, ta + 0x108, (ta + 0x108) << np.maximum(seg - 1, 0)),
    )
    al = np.where(a & 0x80, ta, -ta).astype(np.int16)
    return mu, al


def decode_wav_pcm(data: bytes) -> tuple[np.ndarray, int, int]:
    """PCM WAV bytes -> (mono float32 in [-1, 1], sample_rate,
    n_channels). Stdlib wave handles the RIFF container for integer
    PCM (8/16/24-bit); the manual RIFF walk decodes the tags stdlib
    wave refuses — IEEE-float32 (tag 3) and G.711 A-law / mu-law
    telephony (tags 6/7) — together the real-web WAV variants a crawl
    actually ingests."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            sr = w.getframerate()
            nch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except wave.Error:
        afmt, nch, sr, bits, raw = _parse_riff_wav(data)
        if afmt == 3 and bits == 32:
            x = np.frombuffer(raw, "<f4").astype(np.float32)
        elif afmt in (6, 7) and bits == 8:  # G.711 A-law / mu-law telephony
            mu, al = _g711_tables()
            codes = np.frombuffer(raw, np.uint8)
            x = (al if afmt == 6 else mu)[codes].astype(np.float32) / 32768.0
        else:
            raise NotImplementedError(f"wav: format tag {afmt} / {bits}-bit unsupported")
        if nch > 1:
            x = x.reshape(-1, nch).mean(axis=1)
        return np.clip(x, -1.0, 1.0), sr, nch
    if width == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 127.0
    elif width == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = (v ^ 0x800000) - 0x800000  # sign-extend 24 bits
        x = v.astype(np.float32) / 8388607.0
    else:
        raise NotImplementedError(f"PCM width {width} not supported")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, sr, nch


class AudioFeatureExtractor:
    """Actor-pool stage: audio bytes -> fixed-size feature vector.

    codec == "wav" decodes FOR REAL via the stdlib wave module (PCM
    8/16-bit; no external library needed). Other codecs: use
    ``deterministic_fake=True`` (default in tests) for a seeded fake
    that keeps the plumbing testable, or get NotImplementedError at the
    decode call — the marked seam for a real decoder (soundfile)."""

    def __init__(self, n_features: int = 16, deterministic_fake: bool = True):
        self.n_features = n_features
        self.fake = deterministic_fake

    def _decode_audio(self, data: bytes, codec: str) -> tuple[np.ndarray, int | None]:
        """(pcm, decoded sample_rate or None). The DECODED rate wins
        over the metadata column when available — metadata drift is the
        normal case real decode exists to fix."""
        if codec == "wav":
            pcm, sr, _nch = decode_wav_pcm(data)
            return pcm, sr
        if codec == "adpcm":
            from ..functions.adpcm import decode_wav_ima_adpcm

            return decode_wav_ima_adpcm(data)
        if codec == "flac":
            from ..functions.flac import decode_flac_pcm

            return decode_flac_pcm(data)
        if self.fake:
            seed = int.from_bytes(hashlib.sha256(data).digest()[:4], "big")
            return np.random.default_rng(seed).standard_normal(8000).astype(np.float32), None
        raise NotImplementedError(
            "non-WAV audio codecs unavailable in this sandbox — plug a real decoder here"
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"media_id": [], "duration_s": [], "features": []}
        for i in range(t.num_rows):
            pcm, sr_decoded = self._decode_audio(t["bytes"][i].as_py(), t["codec"][i].as_py())
            sr = sr_decoded or t["sample_rate"][i].as_py() or 8000
            # coarse spectral-band energies — real work happens vectorized
            chunks = np.array_split(pcm, self.n_features)
            feats = np.array([float(np.sqrt((c**2).mean())) for c in chunks], np.float32)
            out["media_id"].append(t["media_id"][i].as_py())
            out["duration_s"].append(len(pcm) / sr)
            out["features"].append(feats.tolist())
        return pa.Table.from_pydict(
            {f.name: pa.array(out[f.name], f.type) for f in AUDIO_FEATURES_SCHEMA},
            schema=AUDIO_FEATURES_SCHEMA,
        )


def encode_avi_rgb24(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """(h, w, 3) uint8 frames -> an uncompressed RGB24 AVI (RIFF/DIB:
    bottom-up BGR rows padded to 4 bytes — the real container
    convention, readable by standard players). Pure stdlib/numpy."""
    import struct

    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)

    def dib(frame: np.ndarray) -> bytes:
        bgr = frame[:, :, ::-1]
        return b"".join(bgr[r].tobytes() + pad for r in range(h - 1, -1, -1))

    movi_body = b"movi"
    for f in frames:
        d = dib(f)
        movi_body += b"00db" + struct.pack("<I", len(d)) + d
        if len(d) % 2:
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body

    us_per_frame = int(1_000_000 / fps)
    # avih payload: 14 uint32s (us/frame, maxbytes, padding, flags,
    # total frames, initial, streams, sugbuf, width, height, 4 reserved)
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, stride * h, w, h, 0, 0, 0, 0,
    )
    strh = b"strh" + struct.pack("<I", 56) + b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIIIHHHH", 0, 0, 0, 0, 1, fps, 0, len(frames), stride * h, 0xFFFFFFFF, 0, 0, 0, w, h
    )
    strf = b"strf" + struct.pack("<I", 40) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
    )
    strl_body = b"strl" + strh + strf
    strl = b"LIST" + struct.pack("<I", len(strl_body)) + strl_body
    hdrl_body = b"hdrl" + avih + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10, quality: int = 85) -> bytes:
    """(h, w, 3) uint8 frames -> an MJPEG AVI (fourcc MJPG, one
    standalone baseline JPEG per '00dc' chunk — the real motion-JPEG
    container convention). Pure stdlib/numpy via functions/jpeg.py."""
    import struct

    from ..functions.jpeg import encode_jpeg_baseline

    h, w, _ = frames[0].shape
    movi_body = b"movi"
    maxbuf = 0
    for f in frames:
        d = encode_jpeg_baseline(f, quality=quality)
        maxbuf = max(maxbuf, len(d))
        movi_body += b"00dc" + struct.pack("<I", len(d)) + d
        if len(d) % 2:
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body

    us_per_frame = int(1_000_000 / fps)
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, maxbuf, w, h, 0, 0, 0, 0,
    )
    strh = b"strh" + struct.pack("<I", 56) + b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIIHHHH", 0, 0, 0, 0, 1, fps, 0, len(frames), maxbuf, 0xFFFFFFFF, 0, 0, 0, w, h
    )
    strf = (
        b"strf" + struct.pack("<I", 40)
        + struct.pack("<IiiHH", 40, w, h, 1, 24)
        + b"MJPG" + struct.pack("<IiiII", 0, 0, 0, 0, 0)
    )
    strl_body = b"strl" + strh + strf
    strl = b"LIST" + struct.pack("<I", len(strl_body)) + strl_body
    hdrl_body = b"hdrl" + avih + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_rgb24(data: bytes):
    """AVI -> (frames list of (h, w, 3) uint8 RGB, fps). Parses the
    RIFF chunk tree for avih (dims, frame timing) and the movi
    '00db'/'00dc' payloads: uncompressed RGB24 DIBs (bottom-up BGR,
    4-byte row stride) AND MJPEG frames (standalone JPEGs, decoded by
    the in-repo T.81 codec — round 5). Other compressions raise the
    declared NotImplementedError seam."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    w = h = n_frames = None
    us_per_frame = 100_000
    frames: list[np.ndarray] = []

    def walk(buf: int, end: int):
        nonlocal w, h, n_frames, us_per_frame
        pos = buf
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (sz,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + sz)
            elif cid == b"avih":
                vals = struct.unpack("<IIIIIIIIII", data[body : body + 40])
                us_per_frame, n_frames, w, h = vals[0], vals[4], vals[8], vals[9]
            elif cid in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("movi before avih")
                payload = data[body : body + sz]
                if payload[:2] == b"\xFF\xD8":
                    # MJPEG stream: each frame is a standalone JPEG
                    # (round 5 — rides the in-repo T.81 decoder)
                    from ..functions.jpeg import decode_jpeg_baseline

                    frames.append(decode_jpeg_baseline(payload))
                else:
                    stride = (w * 3 + 3) & ~3
                    if sz < stride * h:
                        raise NotImplementedError("compressed AVI stream not supported")
                    arr = np.frombuffer(data[body : body + stride * h], np.uint8)
                    rows = arr.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                    frames.append(rows[::-1, :, ::-1].copy())  # bottom-up BGR -> RGB
            pos = body + sz + (sz & 1)

    walk(12, len(data))
    fps = 1_000_000 / us_per_frame if us_per_frame else 10.0
    return frames, fps


class VideoFrameSampler:
    """Actor-pool stage: video bytes -> every k-th frame as PNG rows
    (1 video -> N frame rows). codec == "avi" decodes FOR REAL
    (uncompressed RGB24 RIFF/DIB via decode_avi_rgb24 — no external
    library); other codecs use the deterministic fake or the declared
    NotImplementedError seam."""

    def __init__(self, every_k: int = 10, deterministic_fake: bool = True):
        self.every_k = every_k
        self.fake = deterministic_fake

    def _decode_frames(self, data: bytes, codec: str, n_frames: int):
        if codec == "avi":
            frames, _fps = decode_avi_rgb24(data)
            for idx in range(0, len(frames), self.every_k):
                yield idx, frames[idx]
            return
        if self.fake:
            seed = hashlib.sha256(data).digest()
            for idx in range(0, max(n_frames, 1), self.every_k):
                base = (seed[idx % 32] + idx) % 256
                yield idx, np.full((16, 16, 3), base, np.uint8)
            return
        raise NotImplementedError(
            "non-AVI video codecs unavailable in this sandbox — plug a real decoder here"
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.imagecodec import encode_png

        out = {"media_id": [], "frame_idx": [], "frame_png": []}
        for i in range(t.num_rows):
            mid = t["media_id"][i].as_py()
            for idx, frame in self._decode_frames(
                t["bytes"][i].as_py(), t["codec"][i].as_py(), t["n_frames"][i].as_py()
            ):
                out["media_id"].append(mid)
                out["frame_idx"].append(idx)
                out["frame_png"].append(encode_png(frame))
        return pa.Table.from_pydict(
            {f.name: pa.array(out[f.name], f.type) for f in FRAME_SCHEMA},
            schema=FRAME_SCHEMA,
        )


SCENE_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("cut_idx", pa.int32()),
        ("diff_e4", pa.int64()),
    ]
)


class SceneCutDetector:
    """Actor-pool stage: video bytes -> scene-cut rows. A cut at frame
    i means mean |frame_i - frame_{i-1}| > threshold (8-bit scale).
    codec == "avi" decodes FOR REAL; the diff is vectorized over the
    full frame stack (one np.abs(np.diff(...)) per video). diff_e4 is
    the mean absolute difference in 1e-4 units (int64, exact compare
    in tests)."""

    def __init__(self, threshold: float = 24.0, deterministic_fake: bool = True):
        self.threshold = threshold
        self.fake = deterministic_fake

    def _frames(self, data: bytes, codec: str, n_frames: int) -> np.ndarray:
        if codec == "avi":
            frames, _fps = decode_avi_rgb24(data)
            return np.stack(frames).astype(np.int16)
        if self.fake:
            seed = hashlib.sha256(data).digest()
            return np.stack(
                [
                    np.full((16, 16, 3), (seed[i % 32] + i) % 256, np.int16)
                    for i in range(max(n_frames, 1))
                ]
            )
        raise NotImplementedError(
            "non-AVI video codecs unavailable in this sandbox — plug a real decoder here"
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"media_id": [], "cut_idx": [], "diff_e4": []}
        for i in range(t.num_rows):
            mid = t["media_id"][i].as_py()
            stack = self._frames(
                t["bytes"][i].as_py(), t["codec"][i].as_py(), t["n_frames"][i].as_py()
            )
            if len(stack) < 2:
                continue
            diffs = np.abs(np.diff(stack, axis=0)).mean(axis=(1, 2, 3))
            for j in np.flatnonzero(diffs > self.threshold):
                out["media_id"].append(mid)
                out["cut_idx"].append(int(j) + 1)
                out["diff_e4"].append(int(np.rint(diffs[j] * 10000)))
        return pa.Table.from_pydict(
            {f.name: pa.array(out[f.name], f.type) for f in SCENE_SCHEMA},
            schema=SCENE_SCHEMA,
        )


SEGMENT_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("seg_idx", pa.int32()),
        ("start_ms", pa.int64()),
        ("end_ms", pa.int64()),
    ]
)


class AudioSegmenter:
    """Actor-pool stage: audio bytes -> voiced-segment rows (energy
    gating / VAD shape). Frames of ``frame_ms`` get an RMS each
    (vectorized: one reshape + one mean over the frame axis); a frame
    is voiced when RMS > threshold; maximal runs of voiced frames
    become (start_ms, end_ms) segments. codec == "wav" (stdlib wave) and
    codec == "adpcm" (IMA ADPCM, functions/adpcm.py) decode FOR REAL;
    same fake/seam policy as the other stages."""

    def __init__(self, frame_ms: int = 20, threshold: float = 0.1, deterministic_fake: bool = True):
        self.frame_ms = frame_ms
        self.threshold = threshold
        self.fake = deterministic_fake

    def _decode(self, data: bytes, codec: str) -> tuple[np.ndarray, int]:
        if codec == "wav":
            pcm, sr, _ = decode_wav_pcm(data)
            return pcm, sr
        if codec == "adpcm":
            from ..functions.adpcm import decode_wav_ima_adpcm

            return decode_wav_ima_adpcm(data)
        if codec == "flac":
            from ..functions.flac import decode_flac_pcm

            return decode_flac_pcm(data)
        if self.fake:
            seed = int.from_bytes(hashlib.sha256(data).digest()[:4], "big")
            return np.random.default_rng(seed).standard_normal(8000).astype(np.float32), 8000
        raise NotImplementedError(
            "non-WAV audio codecs unavailable in this sandbox — plug a real decoder here"
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"media_id": [], "seg_idx": [], "start_ms": [], "end_ms": []}
        for i in range(t.num_rows):
            mid = t["media_id"][i].as_py()
            pcm, sr = self._decode(t["bytes"][i].as_py(), t["codec"][i].as_py())
            spf = max(1, sr * self.frame_ms // 1000)  # samples per frame
            n_frames = len(pcm) // spf
            if n_frames == 0:
                continue
            rms = np.sqrt(
                (pcm[: n_frames * spf].reshape(n_frames, spf) ** 2).mean(axis=1)
            )
            voiced = rms > self.threshold
            # run boundaries via diff on the padded mask
            d = np.diff(np.r_[0, voiced.astype(np.int8), 0])
            starts = np.flatnonzero(d == 1)
            ends = np.flatnonzero(d == -1)
            for j, (s, e) in enumerate(zip(starts, ends)):
                out["media_id"].append(mid)
                out["seg_idx"].append(j)
                out["start_ms"].append(int(s) * self.frame_ms)
                out["end_ms"].append(int(e) * self.frame_ms)
        return pa.Table.from_pydict(
            {f.name: pa.array(out[f.name], f.type) for f in SEGMENT_SCHEMA},
            schema=SEGMENT_SCHEMA,
        )


def resample_linear_int16(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear sample-rate conversion, INTEGER-EXACT (the audio sibling
    of imagecodec.resize_bilinear): output length n_out = n_in *
    sr_out // sr_in; output sample t reads source position
    t * sr_in / sr_out as the exact rational (num = t * sr_in, den =
    sr_out), blending the two neighbor samples with integer weights
    that sum to den and one half-away-from-zero division at the end.
    int16-safe in int64 for any real rate pair; identical rates return
    the input bit-for-bit; a constant signal stays constant. (Linear
    interpolation is the deterministic baseline; a windowed-sinc
    resampler drops into the same stage slot.)"""
    x = x.astype(np.int64)
    n = len(x)
    if sr_in == sr_out or n == 0:
        return x.astype(np.int16)
    n_out = n * sr_out // sr_in
    t = np.arange(n_out, dtype=np.int64)
    num = t * sr_in
    i0 = num // sr_out
    frac = num - i0 * sr_out
    i1 = np.minimum(i0 + 1, n - 1)
    acc = x[i0] * (sr_out - frac) + x[i1] * frac
    den = sr_out
    out = np.where(acc >= 0, (acc + den // 2) // den, -((-acc + den // 2) // den))
    return out.astype(np.int16)


class AudioResampler:
    """Actor-pool stage: WAV int16 PCM -> target sample rate via the
    integer-exact linear resampler. Decodes the RAW int16 samples (no
    float normalization — the integer domain is the determinism
    contract), resamples, and emits per row the output length, the
    exact L1 energy (the raw sum of a symmetric tone is identically
    zero — no signal), and a position-weighted witness (an off-by-one
    phase or a dropped tail cannot hash-match)."""

    def __init__(self, target_rate: int = 16000):
        self.target_rate = target_rate

    def __call__(self, t: pa.Table) -> pa.Table:
        import io
        import wave

        n_l, s_l, w_l = [], [], []
        for i in range(t.num_rows):
            with wave.open(io.BytesIO(t["bytes"][i].as_py()), "rb") as w:
                if w.getsampwidth() != 2 or w.getnchannels() != 1:
                    raise NotImplementedError("AudioResampler: mono int16 PCM only")
                sr = w.getframerate()
                x = np.frombuffer(w.readframes(w.getnframes()), "<i2")
            y = resample_linear_int16(x, sr, self.target_rate).astype(np.int64)
            pos = np.arange(1, len(y) + 1, dtype=np.int64)
            n_l.append(len(y))
            s_l.append(int(np.abs(y).sum()))
            w_l.append(int((y * pos).sum()))
        return pa.table(
            {
                "media_id": t["media_id"],
                "n_out": pa.array(n_l, pa.int64()),
                "out_abs": pa.array(s_l, pa.int64()),
                "out_wsum": pa.array(w_l, pa.int64()),
            }
        )


class ClipSampler:
    """Actor-pool stage: TSN-style UNIFORM SEGMENT sampling (Wang et
    al. 2016, the standard video-training frame selection): the N
    decoded frames divide into ``n_segments`` spans (span s covers
    [s*N//S, (s+1)*N//S)), and the deterministic eval-mode pick is
    each span's CENTER frame, start + (len-1)//2 — no RNG, so output
    is bit-identical across runs and batch splits. Emits one row per
    (video, segment) with the picked frame index, its exact pixel sum,
    and a position-weighted witness (a transposed or off-by-one frame
    cannot hash-match). codec == "avi" decodes for real (RGB24 or
    MJPG); others hit the declared seam."""

    def __init__(self, n_segments: int = 5):
        self.n_segments = n_segments

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"media_id": [], "seg_idx": [], "frame_idx": [], "px_sum": [], "px_wsum": []}
        for i in range(t.num_rows):
            codec = t["codec"][i].as_py()
            if codec != "avi":
                raise NotImplementedError(
                    "non-AVI video codecs unavailable in this sandbox — plug a real decoder here"
                )
            frames, _fps = decode_avi_rgb24(t["bytes"][i].as_py())
            n = len(frames)
            S = min(self.n_segments, n)
            for s in range(S):
                lo, hi = s * n // S, (s + 1) * n // S
                idx = lo + (hi - lo - 1) // 2
                f = frames[idx].astype(np.int64)
                g = f.sum(axis=2)
                h, w = g.shape
                yw = np.arange(1, h + 1, dtype=np.int64)[:, None]
                xw = np.arange(1, w + 1, dtype=np.int64)[None, :]
                out["media_id"].append(t["media_id"][i].as_py())
                out["seg_idx"].append(s)
                out["frame_idx"].append(idx)
                out["px_sum"].append(int(g.sum()))
                out["px_wsum"].append(int((yw * xw * g).sum()))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "seg_idx": pa.array(out["seg_idx"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int64()),
                "px_sum": pa.array(out["px_sum"], pa.int64()),
                "px_wsum": pa.array(out["px_wsum"], pa.int64()),
            }
        )


def wht_fast(x: np.ndarray) -> np.ndarray:
    """In-place-style fast Walsh-Hadamard transform (natural /
    Hadamard order) of a length-2^k int64 vector — the ±1-coefficient
    orthogonal transform, so the output is INTEGER-EXACT (no
    irrational twiddles, unlike the DFT): butterflies are adds and
    subtracts only. O(n log n); Parseval holds exactly as
    sum(X^2) == n * sum(x^2) (pytest-gated)."""
    y = x.astype(np.int64).copy()
    n = len(y)
    if n & (n - 1):
        raise ValueError(f"wht: length {n} is not a power of two")
    h = 1
    while h < n:
        y = y.reshape(-1, 2, h)
        a = y[:, 0, :] + y[:, 1, :]
        b = y[:, 0, :] - y[:, 1, :]
        y = np.stack([a, b], axis=1).reshape(-1)
        h *= 2
    return y


class AudioWhtExtractor:
    """Actor-pool stage: WALSH-HADAMARD spectral band energies per
    fixed-length frame — the integer-exact stand-in for the
    mel-spectrogram front end of an audio-training pipeline (WHT
    features are the classic fixed-point spectral analysis; a
    learned / FFT front end drops into the same slot, but its float
    twiddles can't be bit-pinned across hosts, so the WHT keeps the
    digest contract exact). Each decoded mono PCM stream frames into
    non-overlapping 256-sample windows; each frame's WHT coefficients
    (natural order) fold into 4 sequency bands of L1 energy
    (sum |X_j| over j in band b = [64b, 64b+64)). Emits per media row
    n_frames + the 4 band totals; everything int64-exact (|X| <=
    256 * 32768 and frames are bounded, loudly checked)."""

    FRAME = 256
    N_BANDS = 4

    def __call__(self, t: pa.Table) -> pa.Table:
        out: dict[str, list[int]] = {
            "media_id": [],
            "n_frames": [],
            **{f"band{b}_l1": [] for b in range(self.N_BANDS)},
        }
        for i in range(t.num_rows):
            data = t["bytes"][i].as_py()
            codec = t["codec"][i].as_py()
            if codec == "wav":
                x, _sr, _nch = decode_wav_pcm(data)
                # decode_wav_pcm's contract is float32 in [-1, 1]
                # (exactly v/32767 for the 16-bit path); rint * 32767
                # recovers the original int16 samples bit-exactly
                pcm = np.rint(x.astype(np.float64) * 32767.0).astype(np.int64)
            elif codec == "flac":
                from ..functions.flac import decode_flac

                samples, _sr, _bps = decode_flac(data)
                pcm = samples[:, 0].astype(np.int64)
            else:
                raise NotImplementedError(f"audio_wht: codec {codec!r}")
            nf = len(pcm) // self.FRAME
            bands = np.zeros(self.N_BANDS, np.int64)
            for f in range(nf):
                seg = pcm[f * self.FRAME : (f + 1) * self.FRAME]
                coef = np.abs(wht_fast(seg))
                w = self.FRAME // self.N_BANDS
                bands += coef.reshape(self.N_BANDS, w).sum(axis=1)
            out["media_id"].append(t["media_id"][i].as_py())
            out["n_frames"].append(nf)
            for b in range(self.N_BANDS):
                out[f"band{b}_l1"].append(int(bands[b]))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "n_frames": pa.array(out["n_frames"], pa.int64()),
                **{
                    f"band{b}_l1": pa.array(out[f"band{b}_l1"], pa.int64())
                    for b in range(self.N_BANDS)
                },
            }
        )
