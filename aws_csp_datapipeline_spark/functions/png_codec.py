"""Minimal real PNG codec on the standard library.

The multimodal lane's decode step was fully stubbed ("no PIL/ffmpeg in
this container"). PNG, however, is a small public format (W3C PNG
spec / RFC 2083): zlib-compressed scanlines behind one of five
per-row byte filters. This module implements enough of it — 8-bit
greyscale / RGB / grey+alpha / RGBA, non-interlaced — to give the
Spark pipeline a REAL decode→transform→encode path for PNG payloads,
with no third-party dependency. JPEG headers parse for real too
(``jpeg_meta.py``); full JPEG pixel decode / video stay behind the
NotImplementedError gate (their codecs genuinely need native libs).

Scope and scale notes: this is a correctness lane for fixtures and
tests, pure Python per image. At production scale the same
mapInPandas stages would call a native codec (PIL/libvips) on exactly
the same (payload bytes in → payload bytes out) contract, which is
the point: the Spark-side plumbing does not change when the codec
does.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes -> (width, height, channels, raw pixels row-major).

    Handles bit depth 8, color types {0,2,4,6}, interlace 0; applies
    all five scanline filters (None/Sub/Up/Average/Paeth)."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} (only 8 supported)")
            if color not in _CHANNELS:
                raise NotImplementedError(f"color type {color} (palette unsupported)")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None or channels is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = bytearray(height * stride)
    prev_start = -1  # previous reconstructed row offset in `out`
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        row_start = y * stride
        if f == 0:  # None
            out[row_start : row_start + stride] = line
        elif f == 1:  # Sub
            for i in range(stride):
                left = out[row_start + i - channels] if i >= channels else 0
                out[row_start + i] = (line[i] + left) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                up = out[prev_start + i] if prev_start >= 0 else 0
                out[row_start + i] = (line[i] + up) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = out[row_start + i - channels] if i >= channels else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                out[row_start + i] = (line[i] + (left + up) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = out[row_start + i - channels] if i >= channels else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                ul = (
                    out[prev_start + i - channels]
                    if (prev_start >= 0 and i >= channels)
                    else 0
                )
                out[row_start + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad filter byte {f}")
        prev_start = row_start
    return width, height, channels, bytes(out)


def encode_png(pixels: bytes, width: int, height: int, channels: int) -> bytes:
    """Raw row-major pixels -> PNG bytes (filter 0 rows, one IDAT)."""
    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of a raw pixel buffer."""
    src = memoryview(pixels)
    out = bytearray(new_w * new_h * channels)
    for ny in range(new_h):
        sy = min(ny * height // new_h, height - 1)
        src_row = sy * width * channels
        dst_row = ny * new_w * channels
        for nx in range(new_w):
            sx = min(nx * width // new_w, width - 1)
            s = src_row + sx * channels
            d = dst_row + nx * channels
            out[d : d + channels] = src[s : s + channels]
    return bytes(out)


def resize_png(data: bytes, new_w: int, new_h: int) -> bytes:
    """PNG in -> PNG out at (new_w, new_h), nearest-neighbor."""
    w, h, c, px = decode_png(data)
    return encode_png(resize_nearest(px, w, h, c, new_w, new_h), new_w, new_h, c)
