"""Multimodal operator plumbing: schemas, stubs, byte-slicing."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_crawler_spark.operators.multimodal import (
    FEATURE_DIM,
    audio_chunk_energy,
    byte_histogram_features,
    decode_media,
    resize_stub,
    sample_frames,
    synthesize_media,
)


def media_df(spark):
    docs = spark.createDataFrame(
        [(0, "aaaabbbbccccdddd"), (1, "0123456789abcdef0123456789abcdef"), (2, "xyz" * 8)],
        ["doc_id", "text"],
    )
    return synthesize_media(docs)


def test_synthesize_media_schema_and_kinds(spark):
    m = media_df(spark)
    rows = {r["media_id"]: r for r in m.collect()}
    assert rows[0]["kind"] == "image"
    assert rows[1]["kind"] == "audio"
    assert rows[2]["kind"] == "video"
    assert bytes(rows[0]["data"]) == b"aaaabbbbccccdddd"
    assert rows[2]["meta"]["n_frames"] == 10  # 8 + 2%8


def test_decode_media_stub_is_deterministic(spark):
    d1 = {r["media_id"]: r for r in decode_media(media_df(spark)).collect()}
    d2 = {r["media_id"]: r for r in decode_media(media_df(spark)).collect()}
    assert d1.keys() == d2.keys()
    for k in d1:
        assert d1[k] == d2[k]
    # byte_mean of 'aaaabbbbccccdddd' = mean(97*4,98*4,99*4,100*4) = 98.5
    assert abs(d1[0]["byte_mean"] - 98.5) < 1e-12
    assert d1[0]["mode"] == "FAKE"  # stub path in this container
    assert d1[0]["n_bytes"] == 16


def test_byte_histogram_features_l1_normalized(spark):
    feats = media_df(spark).select(
        "media_id", byte_histogram_features(F.col("data")).alias("f")
    ).collect()
    for r in feats:
        f = r["f"]
        assert len(f) == FEATURE_DIM
        assert abs(sum(f) - 1.0) < 1e-9
        assert all(w >= 0 for w in f)
    # 'aaaa...' bytes 97..100 land in bins 24 (96-99) and 25 (100-103)
    f0 = {i: w for i, w in enumerate(feats[0]["f"]) if w > 0}
    assert set(f0) == {24, 25}
    assert abs(f0[24] - 12 / 16) < 1e-12  # a,b,c = 12 of 16 bytes


def test_sample_frames_byte_slicing(spark):
    # media 2: video, 24 bytes, n_frames=10 -> fs=2, frames 0,2,4,6,8
    frames = sample_frames(media_df(spark), every=2).collect()
    by_no = {r["frame_no"]: bytes(r["frame_bytes"]) for r in frames if r["media_id"] == 2}
    assert sorted(by_no) == [0, 2, 4, 6, 8]
    data = b"xyz" * 8
    for no, fb in by_no.items():
        assert fb == data[no * 2 : no * 2 + 2]


def test_audio_chunk_energy_values(spark):
    # media 1: audio, '0123456789abcdef' * 2, 32 bytes -> 4 chunks of 8
    rows = [r for r in audio_chunk_energy(media_df(spark), n_chunks=4).collect()]
    by_chunk = {r["chunk_no"]: r["energy"] for r in rows if r["media_id"] == 1}
    data = b"0123456789abcdef0123456789abcdef"
    for c in range(4):
        chunk = data[c * 8 : (c + 1) * 8]
        assert abs(by_chunk[c] - sum(chunk) / len(chunk)) < 1e-9


def test_resize_stub_plumbing(spark):
    out = {r["media_id"]: r for r in resize_stub(media_df(spark), target_w=8, target_h=6).collect()}
    for r in out.values():
        assert r["width"] == 8 and r["height"] == 6
        assert len(bytes(r["data"])) >= 1
    # media 0: 64x48 meta -> ratio 64*48/48 = 64 -> 16 bytes stride-64 -> 1 byte
    assert len(bytes(out[0]["data"])) == 1


def test_arrow_byte_stats_empty_blob_guard(spark):
    """An empty blob must yield n_bytes=0, byte_sum=0, NULL first/last —
    not a read of the NEIGHBOUR blob's bytes through the shared Arrow
    value buffer (offsets collapse to starts == ends)."""
    from flink_crawler_spark.operators.multimodal import arrow_byte_stats

    docs = spark.createDataFrame(
        [(0, "ab"), (1, ""), (2, "cd")], ["doc_id", "text"]
    )
    media = synthesize_media(docs).coalesce(1)  # one batch: adjacency is real
    out = {r["media_id"]: r for r in arrow_byte_stats(media).collect()}
    assert out[1]["n_bytes"] == 0 and out[1]["byte_sum"] == 0
    assert out[1]["first_byte"] is None and out[1]["last_byte"] is None
    assert out[0]["first_byte"] == ord("a") and out[0]["last_byte"] == ord("b")
    assert out[2]["first_byte"] == ord("c") and out[2]["last_byte"] == ord("d")
    # all-empty batch: value buffer has zero length
    empty_docs = spark.createDataFrame([(7, "")], ["doc_id", "text"])
    r = arrow_byte_stats(synthesize_media(empty_docs)).collect()[0]
    assert r["n_bytes"] == 0 and r["first_byte"] is None


# ---------------------------------------------------------------------------
# r7: JPEG/EXIF metadata extraction — real marker/TIFF-IFD parsing, no
# image library (pixel decode stays behind the PIL gate; metadata does not
# need it). Synthetic-but-VALID jpeg marker streams built byte-by-byte.
# ---------------------------------------------------------------------------


def _jpeg(width=640, height=480, orientation=None, endian="II"):
    import struct

    out = b"\xff\xd8"  # SOI
    if orientation is not None:
        if endian == "II":
            tiff = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
            tiff += struct.pack("<H", 1)  # one IFD entry
            tiff += struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<H", orientation) + b"\x00\x00"
            tiff += struct.pack("<I", 0)
        else:
            tiff = b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8)
            tiff += struct.pack(">H", 1)
            tiff += struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", orientation) + b"\x00\x00"
            tiff += struct.pack(">I", 0)
        app1 = b"Exif\x00\x00" + tiff
        out += b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    sof = b"\x08" + struct.pack(">HH", height, width) + b"\x03" + b"\x01\x11\x00" * 3
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += b"\xff\xd9"  # EOI
    return out


def test_parse_jpeg_meta_pure():
    from flink_crawler_spark.operators.multimodal import parse_jpeg_meta

    m = parse_jpeg_meta(_jpeg(800, 600, orientation=6))
    assert (m["is_jpeg"], m["width"], m["height"], m["n_components"]) == (True, 800, 600, 3)
    assert m["exif_present"] and m["orientation"] == 6
    # big-endian (MM) TIFF reads identically
    mm = parse_jpeg_meta(_jpeg(320, 240, orientation=3, endian="MM"))
    assert (mm["width"], mm["height"], mm["orientation"]) == (320, 240, 3)
    # no EXIF segment
    p = parse_jpeg_meta(_jpeg(64, 48))
    assert p["is_jpeg"] and not p["exif_present"] and p["orientation"] is None
    # hostile inputs never raise
    assert parse_jpeg_meta(b"") == {
        "is_jpeg": False, "width": None, "height": None,
        "n_components": None, "orientation": None, "exif_present": False,
    }
    assert parse_jpeg_meta(b"\xff\xd8\xff\xc0\x00\x02")["is_jpeg"] is True
    assert parse_jpeg_meta(b"PNG not jpeg")["is_jpeg"] is False


def test_jpeg_meta_distributed(spark):
    from flink_crawler_spark.operators.multimodal import jpeg_meta

    rows = [
        (1, _jpeg(800, 600, orientation=8)),
        (2, _jpeg(100, 50)),
        (3, b"not an image"),
    ]
    media = spark.createDataFrame(rows, "media_id long, data binary")
    got = {r["media_id"]: r.asDict() for r in jpeg_meta(media).collect()}
    assert got[1]["width"] == 800 and got[1]["orientation"] == 8
    assert got[2]["height"] == 50 and got[2]["exif_present"] is False
    assert got[3]["is_jpeg"] is False and got[3]["width"] is None


def test_parse_image_meta_png_gif_and_dispatch(spark):
    import struct

    from flink_crawler_spark.operators.multimodal import image_meta, parse_image_meta

    png = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", 1024, 768) + b"\x08\x06\x00\x00\x00" + b"\x00" * 4
    )
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 6
    p = parse_image_meta(png)
    assert (p["format"], p["width"], p["height"]) == ("png", 1024, 768)
    g = parse_image_meta(gif)
    assert (g["format"], g["width"], g["height"]) == ("gif", 320, 200)
    j = parse_image_meta(_jpeg(64, 48, orientation=6))
    assert (j["format"], j["width"], j["orientation"]) == ("jpeg", 64, 6)
    assert parse_image_meta(b"plain text here")["format"] is None
    assert parse_image_meta(b"")["format"] is None
    # truncated PNG header: format sniffed, dims absent, no crash
    assert parse_image_meta(b"\x89PNG\r\n\x1a\n\x00\x00")["format"] == "png"

    media = spark.createDataFrame(
        [(1, png), (2, gif), (3, b"nope")], "media_id long, data binary"
    )
    got = {r["media_id"]: r.asDict() for r in image_meta(media).collect()}
    assert got[1]["width"] == 1024 and got[2]["format"] == "gif"
    assert got[3]["format"] is None
