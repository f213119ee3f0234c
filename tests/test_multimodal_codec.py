"""Real PNG codec lane for the multimodal operators.

The decode step was previously fully stubbed; png_codec.py implements
the public PNG format on the stdlib. These tests exercise: encode →
decode round-trip over every supported color type, hand-crafted
scanline filters (Sub/Up/Average/Paeth — built by filtering known
pixels by hand and checking the decoder reconstructs them), nearest-
neighbor resize, and the Spark mapInPandas lane decoding REAL image
bytes (fake_decode=False) end to end.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from aws_csp_datapipeline_spark.functions import png_codec as P
from aws_csp_datapipeline_spark.functions.multimodal import (
    FEATURE_SCHEMA,
    extract_features,
    resize_images,
)


def _gradient(w: int, h: int, c: int) -> bytes:
    return bytes(((x * 7 + y * 13 + ch * 29) & 0xFF)
                 for y in range(h) for x in range(w) for ch in range(c))


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_color_types(channels):
    w, h = 13, 9  # deliberately non-square, non-power-of-two
    px = _gradient(w, h, channels)
    data = P.encode_png(px, w, h, channels)
    assert P.is_png(data)
    w2, h2, c2, px2 = P.decode_png(data)
    assert (w2, h2, c2) == (w, h, channels)
    assert px2 == px


def _png_with_filters(rows_filtered: list[tuple[int, bytes]], w: int, c: int) -> bytes:
    """Build a PNG whose IDAT uses the given (filter_byte, filtered
    row bytes) pairs verbatim."""
    h = len(rows_filtered)
    raw = bytearray()
    for f, line in rows_filtered:
        raw.append(f)
        raw += line
    color = {1: 0, 3: 2, 2: 4, 4: 6}[c]

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


def test_sub_up_average_paeth_filters():
    """Two 4-px greyscale rows with known pixel values, each filter
    applied by hand; the decoder must reconstruct the originals."""
    row1 = [10, 25, 45, 70]   # reconstructed target, y=0
    row2 = [12, 30, 55, 85]   # reconstructed target, y=1

    # Sub on row1: line[i] = x[i] - x[i-1]
    sub1 = bytes([(row1[0]) & 0xFF] + [(row1[i] - row1[i - 1]) & 0xFF for i in [1, 2, 3]])
    # Up on row2: line[i] = x[i] - prev[i]
    up2 = bytes([(row2[i] - row1[i]) & 0xFF for i in range(4)])
    w, h, c, px = P.decode_png(_png_with_filters([(1, sub1), (2, up2)], 4, 1))
    assert list(px) == row1 + row2

    # Average on row2: line[i] = x[i] - (left + up)//2
    avg2 = bytearray()
    for i in range(4):
        left = row2[i - 1] if i else 0
        avg2.append((row2[i] - (left + row1[i]) // 2) & 0xFF)
    w, h, c, px = P.decode_png(_png_with_filters([(1, sub1), (3, bytes(avg2))], 4, 1))
    assert list(px) == row1 + row2

    # Paeth on row2
    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else cc

    pae2 = bytearray()
    for i in range(4):
        left = row2[i - 1] if i else 0
        ul = row1[i - 1] if i else 0
        pae2.append((row2[i] - paeth(left, row1[i], ul)) & 0xFF)
    w, h, c, px = P.decode_png(_png_with_filters([(1, sub1), (4, bytes(pae2))], 4, 1))
    assert list(px) == row1 + row2


def test_resize_nearest_semantics():
    # 2x2 RGB quadrants scaled to 4x4: each quadrant becomes a 2x2 block
    q = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    px = bytes(v for p in q for v in p)
    out = P.resize_nearest(px, 2, 2, 3, 4, 4)
    got = [tuple(out[i : i + 3]) for i in range(0, len(out), 3)]
    assert got[0] == got[1] == got[4] == got[5] == q[0]
    assert got[2] == got[3] == got[6] == got[7] == q[1]
    assert got[8] == got[9] == got[12] == got[13] == q[2]
    assert got[10] == got[11] == got[14] == got[15] == q[3]


def test_spark_lane_decodes_real_png(spark):
    """mapInPandas feature extraction with fake_decode=False over REAL
    PNG bytes — the previously-stubbed path, now exercised for real."""
    imgs = [
        (1, P.encode_png(_gradient(17, 11, 3), 17, 11, 3)),
        (2, P.encode_png(_gradient(8, 21, 1), 8, 21, 1)),
        (3, P.encode_png(_gradient(5, 5, 4), 5, 5, 4)),
    ]
    media = spark.createDataFrame(
        [(i, bytearray(d), "image/png", len(d)) for i, d in imgs],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    feats = {r["doc_id"]: r for r in extract_features(media, fake_decode=False).collect()}
    assert (feats[1]["width"], feats[1]["height"], feats[1]["channels"]) == (17, 11, 3)
    assert (feats[2]["width"], feats[2]["height"], feats[2]["channels"]) == (8, 21, 1)
    assert (feats[3]["width"], feats[3]["height"], feats[3]["channels"]) == (5, 5, 4)

    resized = {r["doc_id"]: r for r in resize_images(media, 6, 4, fake_decode=False).collect()}
    for i in (1, 2, 3):
        w, h, c, px = P.decode_png(bytes(resized[i]["payload"]))
        assert (w, h) == (6, 4)
        assert len(px) == 6 * 4 * c


def test_unknown_format_still_gated(spark):
    # GIF magic: neither PNG nor JPEG — real-decode mode must refuse.
    media = spark.createDataFrame(
        [(1, bytearray(b"GIF89a not decodable"), "image/gif", 20)],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(media, fake_decode=False).collect()


def test_jpeg_meta_marker_walk():
    from aws_csp_datapipeline_spark.functions import jpeg_meta as J

    data = J.make_jpeg(1024, 768, 3)
    assert J.is_jpeg(data)
    assert J.jpeg_meta(data) == (1024, 768, 3)
    assert J.jpeg_meta(J.make_jpeg(31, 7, 1)) == (31, 7, 1)

    # Progressive JPEG (SOF2, 0xC2) with fill bytes before the marker
    # and an RST standalone marker in between — the walk must skip both.
    sof0 = J.make_jpeg(640, 480, 3)
    body = sof0[2:-2]  # APP0 + SOF0 segments
    progressive = (
        b"\xff\xd8" + b"\xff\xd0"          # RST0 standalone (no length)
        + b"\xff\xff" + body.replace(b"\xff\xc0", b"\xff\xc2", 1)
        + b"\xff\xd9"
    )
    assert J.jpeg_meta(progressive) == (640, 480, 3)

    # Truncated/malformed streams raise ValueError, never parse garbage.
    with pytest.raises(ValueError):
        J.jpeg_meta(b"\xff\xd8\xff\xe0\x00")      # truncated length
    with pytest.raises(ValueError):
        J.jpeg_meta(b"\xff\xd8\xff\xda\x00\x04ab")  # SOS before any SOF
    with pytest.raises(ValueError):
        J.jpeg_meta(b"\xff\xd8garbage")            # no marker where required


def test_spark_lane_parses_real_jpeg(spark):
    """mm1-style feature extraction with fake_decode=False over JPEG
    bytes — the SOF header walk runs inside the mapInPandas lane."""
    from aws_csp_datapipeline_spark.functions import jpeg_meta as J

    imgs = [
        (1, J.make_jpeg(1920, 1080, 3)),
        (2, J.make_jpeg(64, 64, 1)),
        (3, P.encode_png(_gradient(9, 6, 3), 9, 6, 3)),  # mixed formats
    ]
    media = spark.createDataFrame(
        [(i, bytearray(d), "image/*", len(d)) for i, d in imgs],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    feats = {r["doc_id"]: r for r in extract_features(media, fake_decode=False).collect()}
    assert (feats[1]["width"], feats[1]["height"], feats[1]["channels"]) == (1920, 1080, 3)
    assert (feats[2]["width"], feats[2]["height"], feats[2]["channels"]) == (64, 64, 1)
    assert (feats[3]["width"], feats[3]["height"], feats[3]["channels"]) == (9, 6, 3)


def test_corrupt_payloads_fall_back_not_fail(spark):
    """A payload matching a codec's magic bytes but corrupt must not
    kill the job under fake_decode=True (falls back to the fake lane /
    zero features) and must raise under fake_decode=False."""
    from aws_csp_datapipeline_spark.functions.multimodal import (
        extract_audio_features,
        extract_video_meta,
    )

    bad_png = b"\x89PNG\r\n\x1a\n" + b"garbage-after-signature"
    bad_jpeg = b"\xff\xd8\xff\xe0\x00"  # truncated APP0 length
    bad_wav = b"RIFF\x00\x00\x00\x00WAVEgarbage"

    # ftyp + moov(mvhd) whose mvhd body is truncated at file end, so
    # the timescale/duration unpack reads past the payload.
    def _box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    bad_mp4 = _box(b"ftyp", b"isom") + _box(b"moov", _box(b"mvhd", b"\x00" * 4))

    imedia = spark.createDataFrame(
        [(1, bytearray(bad_png), "image/png", 0),
         (2, bytearray(bad_jpeg), "image/jpeg", 0)],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    rows = extract_features(imedia, fake_decode=True).collect()
    assert len(rows) == 2 and all(r["width"] > 0 for r in rows)
    with pytest.raises(Exception):
        extract_features(imedia, fake_decode=False).collect()
    rrows = resize_images(imedia, 4, 3, fake_decode=True).collect()
    assert len(rrows) == 2 and all(len(r["payload"]) == 12 for r in rrows)

    amedia = spark.createDataFrame(
        [(1, bytearray(bad_wav), "audio/wav", 0)],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    arows = extract_audio_features(amedia, fake_decode=True).collect()
    assert len(arows) == 1 and arows[0]["n_frames"] == 0
    with pytest.raises(Exception):
        extract_audio_features(amedia, fake_decode=False).collect()

    vmedia = spark.createDataFrame(
        [(1, bytearray(bad_mp4), "video/mp4", 0)],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    vrows = extract_video_meta(vmedia, fake_decode=True).collect()
    assert len(vrows) == 1 and vrows[0]["n_tracks"] == 0
    with pytest.raises(Exception):
        extract_video_meta(vmedia, fake_decode=False).collect()


def test_wav_roundtrip_and_features():
    import math

    from aws_csp_datapipeline_spark.functions import wav_codec as W

    rate, n = 8000, 800
    pcm = b"".join(
        struct.pack("<h", int(12000 * math.sin(2 * math.pi * 440 * i / rate)))
        for i in range(n)
    )
    data = W.encode_wav(pcm, rate, 1, 2)
    assert W.is_wav(data)
    r2, ch, width, pcm2 = W.decode_wav(data)
    assert (r2, ch, width) == (rate, 1, 2)
    assert pcm2 == pcm
    sr, channels, frames, dur, rms, peak = W.wav_features(data)
    assert frames == n and abs(dur - 100.0) < 1e-6
    # sine RMS ≈ amplitude/sqrt(2)
    assert abs(rms - 12000 / math.sqrt(2)) < 120
    assert 11900 <= peak <= 12000
    half = W.downsample_wav(data, 2)
    sr2, _, frames2, dur2, _, _ = W.wav_features(half)
    assert frames2 == n // 2 and sr2 == rate // 2


def test_spark_lane_decodes_real_wav(spark):
    import math

    from aws_csp_datapipeline_spark.functions import wav_codec as W
    from aws_csp_datapipeline_spark.functions.multimodal import extract_audio_features

    def tone(freq, n, rate=8000):
        return W.encode_wav(
            b"".join(
                struct.pack("<h", int(9000 * math.sin(2 * math.pi * freq * i / rate)))
                for i in range(n)
            ),
            rate, 1, 2,
        )

    media = spark.createDataFrame(
        [(1, bytearray(tone(440, 400)), "audio/wav", 0),
         (2, bytearray(tone(880, 1600)), "audio/wav", 0)],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    got = {r["doc_id"]: r for r in extract_audio_features(media, fake_decode=False).collect()}
    assert got[1]["n_frames"] == 400 and got[2]["n_frames"] == 1600
    assert abs(got[1]["duration_ms"] - 50.0) < 1e-6
    assert abs(got[2]["duration_ms"] - 200.0) < 1e-6
    assert got[1]["sample_rate"] == 8000 and got[1]["channels"] == 1


def _mini_mp4(duration_ms=2500, width=640, height=360, timescale=1000):
    """Hand-built ISO-BMFF: ftyp + moov(mvhd v0 + trak(tkhd v0))."""
    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd_body = (
        b"\x00\x00\x00\x00"                       # version/flags
        + struct.pack(">II", 0, 0)                  # ctime, mtime
        + struct.pack(">II", timescale, duration_ms * timescale // 1000)
        + b"\x00" * 80                              # rate..next_track_id
    )
    tkhd_body = (
        b"\x00\x00\x00\x07"                        # version/flags (enabled)
        + struct.pack(">II", 0, 0)                  # ctime, mtime
        + struct.pack(">I", 1) + b"\x00" * 4        # track id + reserved
        + struct.pack(">I", duration_ms)            # duration
        + b"\x00" * 52                              # reserved..matrix
        + struct.pack(">II", width << 16, height << 16)
    )
    moov = box(b"moov", box(b"mvhd", mvhd_body) + box(b"trak", box(b"tkhd", tkhd_body)))
    return ftyp + moov


def test_mp4_meta_parses_handbuilt_container():
    from aws_csp_datapipeline_spark.functions import mp4_meta as M

    data = _mini_mp4(duration_ms=2500, width=640, height=360)
    assert M.is_mp4(data)
    dur, n_tracks, w, h = M.mp4_meta(data)
    assert abs(dur - 2500.0) < 1e-6
    assert n_tracks == 1 and (w, h) == (640, 360)


def test_spark_lane_parses_real_mp4(spark):
    from aws_csp_datapipeline_spark.functions.multimodal import extract_video_meta

    media = spark.createDataFrame(
        [(1, bytearray(_mini_mp4(2500, 640, 360)), "video/mp4", 0),
         (2, bytearray(_mini_mp4(120000, 1920, 1080)), "video/mp4", 0)],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    got = {r["doc_id"]: r for r in extract_video_meta(media, fake_decode=False).collect()}
    assert (got[1]["width"], got[1]["height"]) == (640, 360)
    assert (got[2]["width"], got[2]["height"]) == (1920, 1080)
    assert abs(got[2]["duration_ms"] - 120000.0) < 1e-6
    assert got[1]["n_tracks"] == 1


def test_dhash_real_png_neardup_semantics(spark):
    """dHash over REAL PNGs: a one-pixel edit keeps hamming distance
    small (near-dup), an unrelated image is far, identical bytes
    collide exactly — and the mapInPandas lane agrees with the local
    computation."""
    from aws_csp_datapipeline_spark.functions import multimodal as MM
    from aws_csp_datapipeline_spark.functions.png_codec import encode_png

    w = h = 32
    base = bytearray()
    for y in range(h):
        for x in range(w):
            base.append((16 * (x // 4) + (8 if y >= 16 else 0)) & 0xFF)
    edited = bytearray(base)
    edited[5] = (edited[5] + 9) & 0xFF  # one-pixel edit
    noise = bytes(((x * 73 + 41) ** 2 + 7 * x) % 256 for x in range(w * h))

    pngs = {
        1: encode_png(bytes(base), w, h, 1),
        2: encode_png(bytes(edited), w, h, 1),
        3: encode_png(noise, w, h, 1),
        4: encode_png(bytes(base), w, h, 1),  # identical re-encode
    }
    media = spark.createDataFrame(
        [(k, bytearray(v), "image/png", len(v)) for k, v in pngs.items()],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    got = {
        r["doc_id"]: r["dhash"]
        for r in MM.image_dhash(media, fake_decode=False).collect()
    }
    assert got[1] == got[4]  # exact dup collides
    assert MM.dhash_hamming(got[1], got[2]) <= 4  # near-dup stays close
    assert MM.dhash_hamming(got[1], got[3]) > 10  # unrelated is far
    # distributed lane == local computation
    from aws_csp_datapipeline_spark.functions.png_codec import decode_png

    w1, h1, c1, px = decode_png(pngs[1])
    assert got[1] == MM.dhash64_from_pixels(px, w1, h1, c1)


def test_dhash_fake_lane_and_corrupt_fallback(spark):
    from aws_csp_datapipeline_spark.functions import multimodal as MM

    corrupt_png = b"\x89PNG\r\n\x1a\n" + b"garbage"
    media = spark.createDataFrame(
        [
            (1, bytearray(b"same text"), "t", 9),
            (2, bytearray(b"same text"), "t", 9),
            (3, bytearray(corrupt_png), "image/png", len(corrupt_png)),
        ],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    got = {
        r["doc_id"]: r["dhash"]
        for r in MM.image_dhash(media, fake_decode=True).collect()
    }
    assert got[1] == got[2]  # identical payloads collide in fake lane
    assert 3 in got  # corrupt payload degraded, job survived
    import pytest as _pt

    with _pt.raises(Exception):
        MM.image_dhash(media, fake_decode=False).collect()


def test_dhash_tiny_png_hashes_instead_of_failing(spark):
    """A valid PNG smaller than the 9x8 hash grid must hash via the
    overlapping-box upsample — under fake_decode=False (no fake lane
    to hide behind) — and identical tiny images must collide."""
    from aws_csp_datapipeline_spark.functions import multimodal as MM
    from aws_csp_datapipeline_spark.functions.png_codec import encode_png

    tiny = encode_png(bytes(range(16)), 4, 4, 1)
    tiny2 = encode_png(bytes(reversed(range(16))), 4, 4, 1)
    media = spark.createDataFrame(
        [(1, bytearray(tiny), "image/png", len(tiny)),
         (2, bytearray(tiny), "image/png", len(tiny)),
         (3, bytearray(tiny2), "image/png", len(tiny2))],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    got = {
        r["doc_id"]: r["dhash"]
        for r in MM.image_dhash(media, fake_decode=False).collect()
    }
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_image_neardup_pairs_banded(spark):
    """The banded hamming join finds the one-pixel-edit pair and the
    identical re-encode pair, and keeps the unrelated image out —
    near-dup IMAGE dedup end to end on real PNGs."""
    from aws_csp_datapipeline_spark.functions import multimodal as MM
    from aws_csp_datapipeline_spark.functions.dedup import hamming_candidate_pairs
    from aws_csp_datapipeline_spark.functions.png_codec import encode_png

    w = h = 32
    base = bytearray()
    for y in range(h):
        for x in range(w):
            base.append((16 * (x // 4) + (8 if y >= 16 else 0)) & 0xFF)
    edited = bytearray(base)
    edited[5] = (edited[5] + 9) & 0xFF
    noise = bytes(((x * 73 + 41) ** 2 + 7 * x) % 256 for x in range(w * h))
    pngs = {
        1: encode_png(bytes(base), w, h, 1),
        2: encode_png(bytes(edited), w, h, 1),
        3: encode_png(noise, w, h, 1),
        4: encode_png(bytes(base), w, h, 1),
    }
    media = spark.createDataFrame(
        [(k, bytearray(v), "image/png", len(v)) for k, v in pngs.items()],
        "doc_id long, payload binary, mime string, n_bytes long",
    )
    hashes = MM.image_dhash(media, fake_decode=False)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hamming_candidate_pairs(
            hashes, "doc_id", "dhash", max_hamming=6
        ).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 0  # identical re-encode
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6  # one-pixel edit
    assert (2, 4) in pairs  # transitivity of the planted trio
    assert not any(3 in p for p in pairs)  # unrelated image excluded


def test_portable_dhash_oracle(spark):
    """The portable fake-pixel family's contract is that ANY engine
    with md5(varchar) can reproduce the dHash — pin the machine-
    generated DuckDB restatement (`plans.q_streaming._dhash_oracle_cte`)
    bit-identical to the Spark lane over edge-case payloads: empty,
    shorter/longer than the 64-byte seed cut, a multibyte char SPLIT
    by the cut (the cut is bytes, not codepoints, on both sides), and
    exact duplicates (must stay collided)."""
    import duckdb

    from aws_csp_datapipeline_spark.functions import multimodal as MM
    from aws_csp_datapipeline_spark.plans.q_streaming import _dhash_oracle_cte

    texts = [
        "",
        "a",
        "short text",
        "short text",  # duplicate must collide
        "x" * 63 + "é",  # é = 2 bytes: the seed cut splits it
        "the quick brown fox jumps over the lazy dog " * 5,
        "naïve déjà-vu — ünïcödé body " * 4,
        "\t\n weird   whitespace \x7f",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    media = MM.to_media_column(
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id",
        "text",
    )
    got = {
        r["doc_id"]: r["dhash"]
        for r in MM.image_dhash(
            media, fake_decode=True, fake_family="portable"
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = dict(
        con.execute(
            f"WITH {_dhash_oracle_cte()} SELECT doc_id, dhash FROM hashes"
        ).fetchall()
    )
    assert got == want
    assert got[2] == got[3]  # duplicates collide in the portable family


def test_mm_meta_oracle_sniff_paths(spark, tmp_path):
    """mm5/mm6's oracles assume a text payload that SNIFFS as WAV/MP4
    (both magic sequences are valid UTF-8, unlike PNG/JPEG's) still
    fails the real parse and degrades to the all-zeros row. Plant
    sniffing payloads and pin lane == oracle on the planted corpus."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_csp_datapipeline_spark.plans import registry

    texts = [
        "plain document body with nothing special",
        "RIFFxxxxWAVEfmt not actually a wave file at all",  # WAV sniffer
        "abcdftypisom pretends to be an mp4 container box",  # MP4 sniffer
        "RIFF1234WAV_ not quite the magic",  # near-miss: no WAVE at 8:12
        "",
    ]
    rows = list(enumerate(texts))
    pq.write_table(
        pa.table({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}),
        str(tmp_path / "documents.parquet"),
    )
    qs = {s.name: s for s in registry._REGISTRY}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    for name in ("mm5_audio_features", "mm6_video_meta"):
        spec = qs[name]
        got = sorted(tuple(r) for r in spec.fn(spark, str(tmp_path)).collect())
        want = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
        assert got == want, name
    # the WAV sniffer really did take the degraded real-decode branch
    mm5 = {r["doc_id"]: r for r in qs["mm5_audio_features"].fn(spark, str(tmp_path)).collect()}
    assert mm5[1]["sample_rate"] == 0 and mm5[1]["n_frames"] == 0
    assert mm5[3]["sample_rate"] != 0  # near-miss stays on the fake lane
