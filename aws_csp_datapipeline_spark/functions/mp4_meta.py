"""Minimal real MP4 (ISO base media / ISO 14496-12) metadata parser.

Completes the multimodal codec triple (png_codec, wav_codec): an MP4
container is a tree of length-prefixed boxes, so track count, movie
duration, and video dimensions parse with stdlib ``struct`` alone —
the metadata a video curation pipeline filters on (duration caps,
resolution floors, track sanity) before any expensive decode. Actual
frame decoding genuinely needs ffmpeg-class native code and stays
behind the NotImplementedError gate.

Box layout parsed here (all public spec): 4-byte big-endian size +
4-byte type, size==1 → 64-bit largesize follows; ``moov`` contains
``mvhd`` (timescale + duration) and per-track ``trak``/``tkhd``
(track id + 16.16 fixed-point width/height).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def is_mp4(data: bytes) -> bool:
    d = bytes(data[:12])
    return len(d) >= 8 and d[4:8] == b"ftyp"


def _boxes(data: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                break
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            header = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < header or pos + size > end:
            break
        yield btype, pos + header, pos + size
        pos += size


def _walk(data: bytes, start: int, end: int, path: tuple[bytes, ...] = ()):
    for btype, b0, b1 in _boxes(data, start, end):
        yield path + (btype,), b0, b1
        if btype in _CONTAINERS:
            yield from _walk(data, b0, b1, path + (btype,))


def mp4_meta(data: bytes) -> tuple[float, int, int, int]:
    """-> (duration_ms, n_tracks, width, height). Width/height come
    from the first track with nonzero tkhd dimensions (the video
    track); duration from mvhd timescale units."""
    data = bytes(data)
    if not is_mp4(data):
        raise ValueError("not an MP4 (no ftyp box)")
    duration_ms = 0.0
    n_tracks = 0
    width = height = 0
    for path, b0, b1 in _walk(data, 0, len(data)):
        if path == (b"moov", b"mvhd"):
            version = data[b0]
            if version == 1:
                timescale, duration = struct.unpack(">IQ", data[b0 + 20 : b0 + 32])
            else:
                timescale, duration = struct.unpack(">II", data[b0 + 12 : b0 + 20])
            if timescale:
                duration_ms = 1000.0 * duration / timescale
        elif path == (b"moov", b"trak"):
            n_tracks += 1
        elif path == (b"moov", b"trak", b"tkhd") and not width:
            version = data[b0]
            # tkhd: width/height are the last 8 bytes, 16.16 fixed point
            w_fx, h_fx = struct.unpack(">II", data[b1 - 8 : b1])
            if w_fx and h_fx:
                width, height = w_fx >> 16, h_fx >> 16
    return duration_ms, n_tracks, width, height
