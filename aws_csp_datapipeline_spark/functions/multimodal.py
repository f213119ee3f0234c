"""Multimodal columns: media as opaque binary + typed metadata.

Pattern for image/audio/video at corpus scale: the payload is a
``binary`` column (or a (path, offset, length) pointer into object
storage), metadata is a typed struct, and decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages —
per-batch Python cost, never per-row, and the batch size bounds
executor memory regardless of corpus size.

Codec status: PNG decode/resize is REAL (``png_codec.py`` — a
stdlib-only implementation of the public PNG format; exercised on
real image bytes in tests/test_multimodal_codec.py), and JPEG
metadata is REAL (``jpeg_meta.py`` — SOF marker walk). Full JPEG
pixel decode / compressed audio / video frames genuinely need native
libraries absent from this container, so those payloads raise
``NotImplementedError`` unless ``fake=True``, in which case they get
a deterministic fake decode derived from the payload bytes — the
Spark-side plumbing (schemas, batching, partitioning) is real and
tested either way. Real-codec calls are try/except-guarded so a
corrupt payload behind a matching magic byte degrades to the fake
lane (under ``fake=True``) instead of failing the whole job.
"""

from __future__ import annotations

import struct
import wave
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A payload can match a codec's magic bytes and still be corrupt or an
# unsupported variant (palette/interlaced PNG, truncated RIFF, malformed
# MP4 boxes). Real-codec calls are wrapped so that under fake_decode the
# fake lane absorbs the failure — one bad payload must not kill a
# corpus-scale job. With fake_decode=False the error propagates: the
# caller asked for real decode only.
_CODEC_ERRORS = (
    ValueError,
    NotImplementedError,
    zlib.error,
    wave.Error,
    struct.error,
    EOFError,
    IndexError,
)

MEDIA_SCHEMA = (
    "doc_id long, payload binary, mime string, n_bytes long"
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, mean_byte double, width int, height int, channels int"
)


def to_media_column(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from a text corpus by treating the UTF-8
    bytes as an opaque payload (the stand-in for real image bytes):
    (id, payload:binary, mime, n_bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _fake_image_meta(payload: bytes) -> tuple[int, int, int]:
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) & 0x7FFFFFFF
    return (64 + h % 192, 64 + (h >> 8) % 192, 3 if h % 4 else 1)


def decode_image_meta(payload: bytes, fake: bool) -> tuple[int, int, int]:
    """Decode → (width, height, channels).

    PNG payloads take the REAL decode path (``png_codec.decode_png``,
    stdlib-only) and JPEG payloads the REAL SOF-marker header walk
    (``jpeg_meta.jpeg_meta``) regardless of ``fake``. Other formats
    need a native codec (ffmpeg/libwebp) that is not in this
    container: with ``fake=True`` they get a deterministic fake
    derived from the payload so the pipeline shape stays testable;
    otherwise NotImplementedError. A corrupt payload behind a
    matching magic byte falls back to the fake lane under
    ``fake=True`` instead of failing the job.
    """
    from aws_csp_datapipeline_spark.functions import jpeg_meta, png_codec

    try:
        if png_codec.is_png(payload):
            w, h, c, _ = png_codec.decode_png(bytes(payload))
            return (w, h, c)
        if jpeg_meta.is_jpeg(payload):
            return jpeg_meta.jpeg_meta(bytes(payload))
    except _CODEC_ERRORS:
        if not fake:
            raise
        return _fake_image_meta(bytes(payload))
    if not fake:
        raise NotImplementedError(
            "non-PNG/JPEG decode requires a codec library (PIL/ffmpeg); "
            "not available here"
        )
    return _fake_image_meta(bytes(payload))


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Feature extraction over media batches via mapInPandas: byte
    stats (real) + decoded dimensions (real PNG/JPEG headers,
    fake lane for other formats). Arrow moves
    whole batches; Python touches each batch once."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode_image_meta(p, fake_decode) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "mean_byte": [
                        float(sum(p)) / len(p) if len(p) else 0.0 for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(per_batch, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' over the opaque payload: emit every Nth slice
    as a frame row (id, frame_idx, frame:binary) — the 1→N explode
    shape of video frame extraction, as a pure column expression."""
    idx = F.sequence(F.lit(0), F.least(
        F.floor(F.length("payload") / every_n_bytes).cast("int") - 1,
        F.lit(max_frames - 1),
    ))
    frames = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(F.col("payload"), i * every_n_bytes + 1, every_n_bytes).alias(
                "frame"
            ),
        ),
    )
    return (
        media.filter(F.length("payload") >= every_n_bytes)
        .select("doc_id", F.explode(frames).alias("f"))
        .select("doc_id", F.col("f.frame_idx").alias("frame_idx"), F.col("f.frame").alias("frame"))
    )


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, channels int, n_frames long, "
    "duration_ms double, rms double, peak int"
)


def extract_audio_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Audio feature extraction via Arrow-batched mapInPandas: WAV/PCM
    payloads take the REAL stdlib decode (``wav_codec``) and yield the
    loudness/duration stats curation filters key on; compressed audio
    needs a native codec — deterministic fake under ``fake_decode``,
    NotImplementedError otherwise. Same per-batch Python cost model as
    the image lane."""
    from aws_csp_datapipeline_spark.functions import wav_codec

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if wav_codec.is_wav(p):
                    try:
                        rate, ch, n, dur, rms, peak = wav_codec.wav_features(
                            bytes(p)
                        )
                    except _CODEC_ERRORS:
                        if not fake_decode:
                            raise
                        rate = ch = n = peak = 0
                        dur = rms = 0.0
                elif fake_decode:
                    h = 0
                    for b in bytes(p)[:64]:
                        h = (h * 131 + b) & 0x7FFFFFFF
                    n = len(p)
                    rate, ch = 8000 + h % 40000, 1 + h % 2
                    dur, rms, peak = 1000.0 * n / rate, float(h % 128), h % 256
                else:
                    raise NotImplementedError(
                        "non-WAV audio decode requires a codec library; "
                        "not available here"
                    )
                rows.append((doc_id, rate, ch, n, dur, rms, peak))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "channels", "n_frames",
                    "duration_ms", "rms", "peak",
                ],
            )

    return media.mapInPandas(per_batch, schema=AUDIO_FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id long, payload binary, width int, height int"


def resize_images(
    media: DataFrame, width: int, height: int, fake_decode: bool = True
) -> DataFrame:
    """Batch image resize via Arrow-batched mapInPandas: decode →
    resample to (width, height) → re-encode. PNG payloads go through
    the REAL stdlib codec (nearest-neighbor, ``png_codec.resize_png``).
    For other formats the 'resize' is a deterministic fake emitting
    exactly width*height bytes cycled from the source, so output size
    — the property the downstream pipeline depends on (fixed tensor
    shape, bounded batch memory) — behaves like a real resampler. The
    Spark plumbing (Arrow batch shape, binary columns both ways,
    output schema) is identical in both lanes."""
    from aws_csp_datapipeline_spark.functions import png_codec

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                if png_codec.is_png(p):
                    try:
                        out.append(png_codec.resize_png(bytes(p), width, height))
                        continue
                    except _CODEC_ERRORS:
                        if not fake_decode:
                            raise
                        # corrupt PNG → fake lane below
                elif not fake_decode:
                    raise NotImplementedError(
                        "non-PNG resize requires a codec library (PIL); "
                        "not available here"
                    )
                reps = target // max(len(p), 1) + 1
                out.append(bytes((p * reps)[:target]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(per_batch, schema=RESIZED_SCHEMA)


VIDEO_META_SCHEMA = (
    "doc_id long, duration_ms double, n_tracks int, width int, height int"
)


def extract_video_meta(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Video container metadata via Arrow-batched mapInPandas: MP4
    payloads take the REAL stdlib box parse (``mp4_meta`` — duration,
    track count, video dimensions: the fields duration caps and
    resolution floors filter on before any decode). Frame DECODING
    needs ffmpeg-class native code for every real container, so
    non-MP4 payloads follow the fake/gate contract of the other
    lanes."""
    from aws_csp_datapipeline_spark.functions import mp4_meta as M

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if M.is_mp4(p):
                    try:
                        dur, n_tracks, w, h = M.mp4_meta(bytes(p))
                    except _CODEC_ERRORS:
                        if not fake_decode:
                            raise
                        dur = 0.0
                        n_tracks = w = h = 0
                elif fake_decode:
                    hsh = 0
                    for b in bytes(p)[:64]:
                        hsh = (hsh * 131 + b) & 0x7FFFFFFF
                    dur = 1000.0 + hsh % 60000
                    n_tracks, w, h = 1 + hsh % 3, 320 + hsh % 1600, 240 + (hsh >> 8) % 900
                else:
                    raise NotImplementedError(
                        "non-MP4 container parse requires a media library; "
                        "not available here"
                    )
                rows.append((doc_id, dur, n_tracks, w, h))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "duration_ms", "n_tracks", "width", "height"],
            )

    return media.mapInPandas(per_batch, schema=VIDEO_META_SCHEMA)


MODALITY_SCHEMA = "doc_id long, modality string, n_bytes long"


def dispatch_modalities(media: DataFrame) -> DataFrame:
    """Magic-byte sniffing router: classify each opaque payload and
    hand it to its modality lane (image/audio/video — the decode
    stage in each lane is the same stubbed codec story as
    ``decode_image_meta``). This is the fan-out a mixed-media landing
    zone runs before per-modality processing. Routing is a
    deterministic function of the payload's leading character, so the
    whole dispatch is oracle-checkable even though it runs in
    Arrow-batched Python; per-modality rollups stay JVM-side after
    the mapInPandas."""

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lanes = ("image", "audio", "video")
        for pdf in batches:
            mods, nbytes = [], []
            for p in pdf["payload"]:
                cp = ord(bytes(p).decode("utf-8")[0]) if len(p) else 0
                mods.append(lanes[cp % 3])
                nbytes.append(len(p))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "modality": mods, "n_bytes": nbytes}
            )

    return media.mapInPandas(per_batch, schema=MODALITY_SCHEMA)


# --- perceptual hashing (image near-dup) ---


def gray_grid(
    pixels: bytes, width: int, height: int, channels: int, gw: int = 9, gh: int = 8
) -> list[list[float]]:
    """Box-mean grayscale downsample to a gw x gh grid — the resize
    step of dHash. Pure stdlib; O(pixels) per image. Images smaller
    than the grid are handled by letting boxes overlap (nearest-
    neighbor upsample), so small icons hash instead of failing — but a
    width-1 strip (or empty image) has NO horizontal signal, every
    gradient bit would be 0 and all such images would silently collide
    on hash 0, so degenerate dimensions are rejected (→ fake lane
    under fake_decode, loud error otherwise)."""
    if width < 2 or height < 1:
        raise ValueError("image has no horizontal gradient signal")
    grid = []
    for gy in range(gh):
        y0 = (gy * height) // gh
        y1 = max(y0 + 1, ((gy + 1) * height) // gh)
        row = []
        for gx in range(gw):
            x0 = (gx * width) // gw
            x1 = max(x0 + 1, ((gx + 1) * width) // gw)
            acc = 0
            n = 0
            for y in range(y0, y1):
                base = (y * width) * channels
                for x in range(x0, x1):
                    px = base + x * channels
                    acc += sum(pixels[px : px + channels])
                    n += channels
            row.append(acc / n if n else 0.0)
        grid.append(row)
    return grid


def dhash64_from_pixels(
    pixels: bytes, width: int, height: int, channels: int
) -> int:
    """Difference hash: 8 rows x 8 horizontal gradients of the 9x8
    grayscale grid → 64 bits. Near-identical images (small edits,
    re-encodes, minor noise) agree on most bits; hamming distance
    over the hash is the cheap near-dup verify."""
    g = gray_grid(pixels, width, height, channels)
    bits = 0
    for y in range(8):
        for x in range(8):
            bits = (bits << 1) | (1 if g[y][x] > g[y][x + 1] else 0)
    # two's-complement into signed 64-bit so Spark LongType holds it
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def dhash_hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _fake_pixels(payload: bytes) -> tuple[bytes, int, int, int]:
    """Deterministic 16x16 grayscale pseudo-image from the payload —
    the fake-decode stand-in: identical payloads give identical
    pixels (so dedup semantics survive), different payloads diverge."""
    import hashlib

    out = bytearray()
    seed = bytes(payload[:64])
    block = b""
    while len(out) < 256:
        block = hashlib.md5(seed + block).digest()
        out += block
    return bytes(out[:256]), 16, 16, 1


def _fake_pixels_portable(payload: bytes) -> tuple[bytes, int, int, int]:
    """The PORTABLE fake-pixel family: the md5 chain runs over ASCII
    hex STRINGS instead of raw digest bytes, so any engine whose
    ``md5(varchar)`` returns lowercase hex (DuckDB, Postgres, Trino)
    can reproduce the pixels — which is how mm7/mm8's driver oracles
    restate the whole fake-lane dHash in SQL (same pattern as
    ``text.winnow_fingerprints(hash="portable")``). Same dedup
    semantics as the default family (identical payloads → identical
    pixels); one extra hex encode per block of per-image cost."""
    import hashlib

    seed = bytes(payload[:64]).hex()
    out = bytearray()
    block = ""
    while len(out) < 256:
        block = hashlib.md5((seed + block).encode("ascii")).hexdigest()
        out += bytes.fromhex(block)
    return bytes(out[:256]), 16, 16, 1


def image_dhash(
    media: DataFrame, fake_decode: bool = True, fake_family: str = "chain"
) -> DataFrame:
    """Per-image 64-bit dHash over a media table via Arrow-batched
    mapInPandas: PNG payloads take the REAL stdlib decode; other
    payloads use the deterministic fake lane under ``fake_decode``
    (or raise without it), and corrupt PNGs degrade to the fake lane
    rather than failing the job.

    ``fake_family`` picks the fake-pixel generator: ``"chain"``
    (default, raw md5-digest chain — cheapest) or ``"portable"``
    (hex-string md5 chain, reproducible by any SQL engine — the mm7/
    mm8 oracle family; see ``_fake_pixels_portable``). Both are
    content-deterministic, so dedup semantics are identical.

    This is the image twin of text MinHash: a narrow projection
    producing a fixed-width fingerprint; grouping or hamming-banding
    the hash finds near-dup images without ever joining pixel data.
    Python cost is per-image O(pixels) inside per-batch loops — no
    per-row serialization beyond the Arrow batch."""
    from aws_csp_datapipeline_spark.functions import png_codec

    if fake_family == "chain":
        fake_fn = _fake_pixels
    elif fake_family == "portable":
        fake_fn = _fake_pixels_portable
    else:
        raise ValueError(f"unknown fake-pixel family: {fake_family!r}")

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for payload in pdf["payload"]:
                data = bytes(payload)
                try:
                    if png_codec.is_png(data):
                        w, h, c, px = png_codec.decode_png(data)
                        hashes.append(dhash64_from_pixels(px, w, h, c))
                        continue
                    if not fake_decode:
                        raise NotImplementedError(
                            "non-PNG dhash needs a codec library"
                        )
                except _CODEC_ERRORS:
                    if not fake_decode:
                        raise
                px, w, h, c = fake_fn(data)
                hashes.append(dhash64_from_pixels(px, w, h, c))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "dhash": pd.Series(hashes, dtype="int64")}
            )

    return media.mapInPandas(per_batch, "doc_id long, dhash long")
