"""Real JPEG metadata parse — stdlib-only SOF marker walk.

JPEG/JFIF is a public ISO/ITU format (ITU-T T.81): a stream of
``0xFF``-prefixed marker segments. Frame dimensions and component
count live in the SOF (Start Of Frame) segment, so a header walk —
no entropy decode, no libjpeg — recovers (width, height, channels):
the fields resolution floors and aspect filters key on in a media
curation pipeline. Mirrors the MP4 box-walk approach in
``mp4_meta.py``: parse the container structure with ``struct``,
never the compressed payload.

Segment layout after the SOI marker (FFD8): each segment is
``FF <marker> <len:u16be> <len-2 bytes>``; standalone markers
(TEM, RST0-7) carry no length. SOFn markers are 0xC0-0xCF minus
0xC4 (DHT), 0xC8 (JPG extension), 0xCC (DAC); their payload is
``precision:u8 height:u16 width:u16 n_components:u8``.
"""

from __future__ import annotations

import struct

_SOI = b"\xff\xd8"
# SOFn markers: C0-CF excluding C4 (DHT), C8 (JPG), CC (DAC).
_SOF_MARKERS = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)
# Standalone markers with no length field: TEM (01), RST0-7 (D0-D7).
_STANDALONE = frozenset([0x01]) | frozenset(range(0xD0, 0xD8))


def is_jpeg(payload: bytes) -> bool:
    return bytes(payload[:2]) == _SOI


def jpeg_meta(payload: bytes) -> tuple[int, int, int]:
    """Walk the marker stream to the first SOF segment and return
    (width, height, channels). Raises ValueError on a stream that
    matches the SOI signature but is truncated or malformed."""
    if not is_jpeg(payload):
        raise ValueError("not a JPEG payload (missing SOI)")
    i, n = 2, len(payload)
    while i < n:
        # Skip fill bytes: the spec allows any number of 0xFF pad
        # bytes before a marker code.
        if payload[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        while i < n and payload[i] == 0xFF:
            i += 1
        if i >= n:
            break
        marker = payload[i]
        i += 1
        if marker in _STANDALONE or marker == 0xD9:  # EOI
            if marker == 0xD9:
                break
            continue
        if i + 2 > n:
            raise ValueError("truncated segment length")
        (seg_len,) = struct.unpack_from(">H", payload, i)
        if seg_len < 2 or i + seg_len > n:
            raise ValueError("segment overruns payload")
        if marker in _SOF_MARKERS:
            if seg_len < 8:
                raise ValueError("SOF segment too short")
            _prec, height, width, n_comp = struct.unpack_from(
                ">BHHB", payload, i + 2
            )
            if width == 0 or height == 0 or n_comp == 0:
                raise ValueError("SOF with zero dimension/components")
            return (width, height, n_comp)
        if marker == 0xDA:  # SOS — entropy data follows; SOF must precede
            break
        i += seg_len
    raise ValueError("no SOF marker found before SOS/EOI")


def make_jpeg(width: int, height: int, channels: int = 3) -> bytes:
    """Build a minimal syntactically-valid JPEG header (SOI + APP0 +
    SOF0 + EOI) for fixtures — enough structure for any SOF-walking
    parser; not a decodable image."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof_components = b"".join(
        struct.pack(">BBB", cid + 1, 0x11, 0) for cid in range(channels)
    )
    sof_payload = struct.pack(">BHHB", 8, height, width, channels) + sof_components
    return (
        _SOI
        + b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
        + b"\xff\xd9"
    )
