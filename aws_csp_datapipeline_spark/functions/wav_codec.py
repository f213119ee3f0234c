"""Minimal real WAV (RIFF/PCM) codec on the standard library.

Companion to ``png_codec.py`` for the audio modality: WAV is a public
container (RIFF chunks + PCM frames) and Python ships a parser in the
``wave`` stdlib module, so the audio lane's decode and
feature-extract steps can be real here — no native library needed.
Compressed audio (mp3/aac/opus) stays behind the codec gate like
JPEG does for images.

Same scale contract as the image lane: bytes-in → features/bytes-out
per payload inside Arrow-batched ``mapInPandas``; swapping this for
libsndfile at production scale changes nothing Spark-side.
"""

from __future__ import annotations

import io
import struct
import wave


def is_wav(data: bytes) -> bool:
    d = bytes(data[:12])
    return len(d) == 12 and d[:4] == b"RIFF" and d[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """WAV bytes -> (sample_rate, channels, sample_width_bytes, pcm
    frames). PCM only (the wave module rejects compressed formats)."""
    with wave.open(io.BytesIO(bytes(data))) as w:
        return (
            w.getframerate(),
            w.getnchannels(),
            w.getsampwidth(),
            w.readframes(w.getnframes()),
        )


def encode_wav(pcm: bytes, sample_rate: int, channels: int, sample_width: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sample_width)
        w.setframerate(sample_rate)
        w.writeframes(pcm)
    return buf.getvalue()


def _samples(pcm: bytes, sample_width: int) -> list[int]:
    if sample_width == 2:
        return [s for (s,) in struct.iter_unpack("<h", pcm)]
    if sample_width == 1:  # 8-bit WAV is unsigned, centered at 128
        return [b - 128 for b in pcm]
    raise NotImplementedError(f"sample width {sample_width} (8/16-bit supported)")


def wav_features(data: bytes) -> tuple[int, int, int, float, float, int]:
    """-> (sample_rate, channels, n_frames, duration_ms, rms, peak) —
    the metadata + loudness stats an audio curation pipeline keys on
    (silence/clipping filters, duration caps)."""
    rate, channels, width, pcm = decode_wav(data)
    xs = _samples(pcm, width)
    n_frames = len(xs) // max(channels, 1)
    if xs:
        rms = (sum(x * x for x in xs) / len(xs)) ** 0.5
        peak = max(abs(x) for x in xs)
    else:
        rms, peak = 0.0, 0
    duration_ms = 1000.0 * n_frames / rate if rate else 0.0
    return rate, channels, n_frames, duration_ms, rms, peak


def downsample_wav(data: bytes, factor: int) -> bytes:
    """Keep every ``factor``-th frame (naive decimation — the contract
    stand-in for a real resampler), preserving channel interleaving."""
    rate, channels, width, pcm = decode_wav(data)
    frame_size = channels * width
    out = bytearray()
    for i in range(0, len(pcm) // frame_size, factor):
        out += pcm[i * frame_size : (i + 1) * frame_size]
    return encode_wav(bytes(out), max(rate // factor, 1), channels, width)
