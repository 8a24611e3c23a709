"""Multimodal columns as opaque binary + typed metadata.

Image decode/resize/phash are REAL in this repo (in-repo codecs —
stages/crawl_stages.py, pipelines/images_pipe.py). Audio and video
libraries are not installed in this sandbox, so those decoders are
STUBS behind clearly-marked NotImplementedError with the Ray-side
plumbing (schemas, actor signature, batch sizing, output layout) real
and tested: swap ``_decode_*`` for a real library call and the stage
works unchanged.
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


def decode_wav_pcm(data: bytes) -> tuple[np.ndarray, int, int]:
    """PCM WAV bytes -> (mono float32 in [-1, 1], sample_rate,
    n_channels). Stdlib wave handles the RIFF container; 16-bit and
    8-bit PCM supported (the common training-corpus cases)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32767.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 127.0
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


class VideoFrameSampler:
    """Actor-pool stage: video bytes -> every k-th frame as PNG rows
    (1 video -> N frame rows). The decode is the stub seam; the fake
    emits deterministic gradient frames via the in-repo PNG encoder."""

    def __init__(self, every_k: int = 10, deterministic_fake: bool = True):
        self.every_k = every_k
        self.fake = deterministic_fake

    def _decode_frames(self, data: bytes, codec: str, n_frames: int):
        if self.fake:
            seed = hashlib.sha256(data).digest()
            for idx in range(0, max(n_frames, 1), self.every_k):
                base = (seed[idx % 32] + idx) % 256
                yield idx, np.full((16, 16, 3), base, np.uint8)
            return
        raise NotImplementedError(
            "video codecs unavailable in this sandbox — plug a real decoder here"
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
