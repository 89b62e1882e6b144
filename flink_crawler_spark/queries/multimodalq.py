"""Multimodal-pipeline queries with oracles.

The media table is synthesized deterministically from ``documents``
(data = UTF-8 bytes of text) in BOTH engines, so even the mapInPandas
decode stage (running its deterministic fake path) is value-checked:
DuckDB reproduces byte-level math through ``to_hex`` + list lambdas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    FEATURE_DIM,
    audio_chunk_energy,
    byte_histogram_features,
    decode_media,
    resize_stub,
    sample_frames,
    synthesize_media,
)
from .base import register, t

MEDIA_SQL = """
media AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         octet_length(encode(text)) AS n_bytes,
         lower(to_hex(encode(text))) AS hx,
         CAST(64 + doc_id % 256 AS INTEGER) AS width,
         CAST(48 + doc_id % 192 AS INTEGER) AS height,
         CAST(8 + doc_id % 8 AS INTEGER) AS n_frames,
         md5(text) AS digest
  FROM documents
)
"""

# byte values of the blob as a list of ints (via hex pairs)
DUCK_BYTES = (
    "list_transform(generate_series(1, n_bytes),"
    " i -> CAST('0x' || substring(hx, i*2-1, 2) AS INTEGER))"
)


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synthesize_media(t(spark, sf_dir, "documents"))


@register(
    "media_stats",
    oracle=f"""
WITH {MEDIA_SQL.strip()}
SELECT media_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes, digest FROM media
""",
)
def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-binary scan surface: per-media kind, byte length, digest —
    column pruning keeps `data` out of any plan not touching it."""
    m = _media(spark, sf_dir)
    return m.select(
        "media_id", "kind", F.length("data").cast("long").alias("n_bytes"),
        F.md5(F.col("data")).alias("digest"),
    )


@register(
    "media_decode_stats",
    oracle=f"""
WITH {MEDIA_SQL.strip()}
SELECT media_id, kind, width, height, 'FAKE' AS mode,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       round(list_avg({DUCK_BYTES}), 6) AS byte_mean
FROM media
""",
)
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode stage (stub path) — byte_mean must match
    DuckDB's hex-derived byte average bit-for-bit."""
    d = decode_media(_media(spark, sf_dir))
    return d.select(
        "media_id", "kind", "width", "height", "mode", "n_bytes",
        F.round("byte_mean", 6).alias("byte_mean"),
    )


@register(
    "video_frame_sample",
    oracle=f"""
WITH {MEDIA_SQL.strip()},
v AS (SELECT media_id, hx, n_frames, CAST(n_bytes // n_frames AS INTEGER) AS fs
      FROM media WHERE kind = 'video'),
idx AS (SELECT media_id, hx, fs, unnest(range(0, n_frames, 2)) AS frame_no FROM v)
SELECT media_id, CAST(frame_no AS INTEGER) AS frame_no,
       substring(hx, frame_no * fs * 2 + 1, fs * 2) AS frame_hex
FROM idx
""",
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling as pure byte-slicing (no UDF): every 2nd frame of
    each video, compared as hex."""
    frames = sample_frames(_media(spark, sf_dir), every=2)
    return frames.select(
        "media_id", "frame_no", F.lower(F.hex("frame_bytes")).alias("frame_hex")
    )


@register(
    "audio_chunk_energy",
    oracle=f"""
WITH {MEDIA_SQL.strip()},
a AS (SELECT media_id, hx, CAST(n_bytes // 4 AS INTEGER) AS cs
      FROM media WHERE kind = 'audio'),
idx AS (SELECT media_id, hx, cs, unnest(range(0, 4)) AS chunk_no FROM a),
chunks AS (
  SELECT media_id, CAST(chunk_no AS INTEGER) AS chunk_no,
         list_transform(generate_series(1, cs),
             i -> CAST('0x' || substring(hx, chunk_no*cs*2 + i*2 - 1, 2) AS INTEGER)) AS bytes
  FROM idx
)
SELECT media_id, chunk_no,
       round(CASE WHEN len(bytes) > 0 THEN list_avg(bytes) ELSE 0.0 END, 6) AS energy
FROM chunks
""",
)
def audio_chunk_energy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunk energy via JVM-side hex aggregation (4 chunks/clip)."""
    e = audio_chunk_energy(_media(spark, sf_dir), n_chunks=4)
    return e.select("media_id", "chunk_no", F.round("energy", 6).alias("energy"))


@register(
    "media_feature_fold",
    oracle=f"""
WITH {MEDIA_SQL.strip()},
b AS (SELECT media_id, n_bytes, unnest({DUCK_BYTES}) AS byte FROM media),
counts AS (
  SELECT media_id, byte // 4 AS bin, count(*) AS c
  FROM b GROUP BY media_id, byte // 4
),
dense AS (
  SELECT m.media_id, g.bin, coalesce(c.c, 0) AS c, m.n_bytes
  FROM media m
  CROSS JOIN (SELECT unnest(range(0, {FEATURE_DIM})) AS bin) g
  LEFT JOIN counts c ON c.media_id = m.media_id AND c.bin = g.bin
)
SELECT media_id, CAST(bin AS INTEGER) AS bin,
       round(CAST(c AS DOUBLE) / n_bytes, 6) AS weight
FROM dense
""",
)
def media_feature_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF feature extraction (byte histogram folded to 64 dims,
    L1-normalized), exploded long-form so the oracle can rebuild it."""
    m = _media(spark, sf_dir)
    feats = m.select("media_id", byte_histogram_features(F.col("data")).alias("f"))
    return feats.select(
        "media_id", F.posexplode("f").alias("bin", "weight")
    ).select("media_id", "bin", F.round("weight", 6).alias("weight"))


@register(
    "media_resize_stub",
    oracle=f"""
WITH {MEDIA_SQL.strip()},
r AS (SELECT media_id, n_bytes,
             greatest(1, CAST(floor(width * height / 768.0) AS INTEGER)) AS ratio
      FROM media)
SELECT media_id, 32 AS width, 24 AS height,
       CAST((n_bytes + ratio - 1) // ratio AS INTEGER) AS n_bytes
FROM r
""",
)
def media_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (binary in -> binary out + new dims). The stub
    subsamples every ratio-th byte (ratio = area shrink factor), so the
    output LENGTH is exactly ceil(n/ratio) — value-checked; only the
    byte payload itself is engine-internal."""
    r = resize_stub(_media(spark, sf_dir), target_w=32, target_h=24)
    return r.select("media_id", "width", "height", F.length("data").alias("n_bytes"))


@register(
    "media_arrow_byte_stats",
    oracle=f"""
WITH {MEDIA_SQL.strip()}
SELECT media_id,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(list_aggregate({DUCK_BYTES}, 'sum') AS BIGINT) AS byte_sum,
       CASE WHEN n_bytes = 0 THEN NULL
            ELSE CAST('0x' || substring(hx, 1, 2) AS INTEGER) END AS first_byte,
       CASE WHEN n_bytes = 0 THEN NULL
            ELSE CAST('0x' || substring(hx, n_bytes*2-1, 2) AS INTEGER) END AS last_byte
FROM media
""",
)
def media_arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy Arrow kernel over the media blobs: per-blob byte count,
    byte sum, first/last byte via ``mapInArrow`` reading the binary
    column's offset+value buffers directly as numpy views
    (operators/multimodal.py::arrow_byte_stats) — no per-row Python, no
    pandas materialization of the bytes. DuckDB reproduces the byte
    math through hex expansion, value-checking the rawest Python API
    surface in the engine."""
    media = synthesize_media(t(spark, sf_dir, "documents"))
    from ..operators.multimodal import arrow_byte_stats

    return arrow_byte_stats(media)


# --------------------------------------------------------------------------
# media_content_dedup — exact binary dedup + per-kind retention stats
# --------------------------------------------------------------------------


@register(
    "media_content_dedup",
    oracle=f"""
WITH {MEDIA_SQL.strip()},
uniq AS (
  SELECT kind, digest, min(media_id) AS keep_id, count(*) AS n_copies
  FROM media GROUP BY kind, digest
)
SELECT kind,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(sum(n_copies) AS BIGINT) AS n_total,
       CAST(sum(n_copies) - count(*) AS BIGINT) AS n_dropped,
       min(keep_id) AS min_keep_id
FROM uniq GROUP BY kind
""",
)
def media_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the BINARY column (the image/audio dedup stage of
    a multimodal corpus): md5 the blob, keep the lowest media_id per
    (kind, digest), report per-kind retention. Only (kind, digest, id)
    tuples shuffle — the blobs never leave their scan partitions, which
    is the whole point at 100 TB of media."""
    m = _media(spark, sf_dir).select(
        "media_id", "kind", F.md5(F.col("data")).alias("digest")
    )
    uniq = m.groupBy("kind", "digest").agg(
        F.min("media_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )
    return uniq.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("n_copies").alias("n_total"),
        (F.sum("n_copies") - F.count(F.lit(1))).alias("n_dropped"),
        F.min("keep_id").alias("min_keep_id"),
    )
