"""WARC record building + sink.

Reference: ``warc/CreateWARCWritableFunction.java:20-112`` (FetchResultUrl
-> one-time ``warcinfo`` header + per-page ``resource`` records),
``warc/WARCOutputFormat.java`` / ``WARCFileWriter.java:29-46,95`` (gzip
WARC files with 1 GB segment rotation). Format per the public ISO 28500
WARC/1.0 spec.

Spark-first: record *construction* is a pure projection — native binary
``concat`` (headers are strings, payload is the content column), fully
codegen'd, duckdb-checkable on the header text. The *sink* is a
``foreachPartition`` writer producing ``<prefix>-<partition>-<seg>.warc.gz``
with size-based rotation — the standard Spark pattern for byte-stream
formats no built-in sink covers (the analytics-preferred path is plain
parquet with the binary column, reference sinks W1 vs W3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WARC_VERSION = "WARC/1.0"
CRLF = "\r\n"


def _warc_date(status_time_ms: Column) -> Column:
    return F.date_format(
        F.timestamp_millis(status_time_ms), "yyyy-MM-dd'T'HH:mm:ss'Z'"
    )


def warc_record_expr(
    url: Column, status_time_ms: Column, content: Column, content_type: Column
) -> Column:
    """One WARC ``resource`` record as bytes (header block + payload).

    WARC-Record-ID is derived (urn:uuid from md5(url||date)) so records
    are deterministic — the reference uses random UUIDs, which would
    break replay/equivalence testing.
    """
    rid = F.md5(F.concat(url, F.lit("|"), status_time_ms.cast("string")))
    header = F.concat(
        F.lit(WARC_VERSION + CRLF),
        F.lit("WARC-Type: resource" + CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(CRLF),
        F.lit("WARC-Date: "), _warc_date(status_time_ms), F.lit(CRLF),
        F.lit("WARC-Record-ID: <urn:uuid:"), rid, F.lit(">" + CRLF),
        F.lit("Content-Type: "), F.coalesce(content_type, F.lit("application/octet-stream")),
        F.lit(CRLF),
        F.lit("Content-Length: "), F.length(content).cast("string"), F.lit(CRLF),
        F.lit(CRLF),
    )
    return F.concat(F.encode(header, "UTF-8"), content, F.encode(F.lit(CRLF + CRLF), "UTF-8"))


def warcinfo_record(agent: str, timestamp_ms: int) -> bytes:
    """The one-time ``warcinfo`` header record (one per output segment,
    CreateWARCWritableFunction.java:55-85)."""
    body = (
        f"software: flink-crawler-spark{CRLF}"
        f"format: WARC File Format 1.0{CRLF}"
        f"http-header-user-agent: {agent}{CRLF}"
    ).encode()
    import datetime as dt

    date = dt.datetime.fromtimestamp(timestamp_ms / 1000, dt.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    header = (
        f"{WARC_VERSION}{CRLF}"
        f"WARC-Type: warcinfo{CRLF}"
        f"WARC-Date: {date}{CRLF}"
        f"Content-Type: application/warc-fields{CRLF}"
        f"Content-Length: {len(body)}{CRLF}"
        f"{CRLF}"
    ).encode()
    return header + body + CRLF.encode() * 2


def build_warc_records(fetch_results: DataFrame) -> DataFrame:
    """FETCHED pages -> (url, warc: binary) rows; non-FETCHED dropped
    (CreateWARCWritableFunction.java:87-111)."""
    fetched = fetch_results.filter(
        (F.col("status") == "FETCHED") & F.col("content").isNotNull()
    )
    return fetched.select(
        "url",
        warc_record_expr(
            F.col("url"), F.col("status_time"), F.col("content"), F.col("content_type")
        ).alias("warc"),
    )


def write_warc(
    records: DataFrame,
    output_dir: str,
    *,
    agent: str = "flink-crawler",
    timestamp_ms: int = 0,
    segment_bytes: int = 1 << 30,  # warc.output.segment.size (1 GB)
) -> None:
    """Write WARC records to gzip segment files, one writer per partition,
    rotating at ``segment_bytes`` (WARCFileWriter.java:95 semantics)."""
    import os

    os.makedirs(output_dir, exist_ok=True)
    info = warcinfo_record(agent, timestamp_ms)

    def write_partition(rows):
        import gzip
        import os

        from pyspark import TaskContext

        # partition id, NOT os.getpid(): Spark reuses Python workers, so
        # two partitions on one worker would collide and overwrite files
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else os.getpid()
        seg, written, out = 0, 0, None
        try:
            for row in rows:
                if out is None or written > segment_bytes:
                    if out is not None:
                        out.close()
                        seg += 1
                    out = gzip.open(
                        os.path.join(output_dir, f"part-{pid}-{seg:04d}.warc.gz"), "wb"
                    )
                    out.write(info)  # every segment starts with warcinfo
                    written = len(info)
                out.write(row["warc"])
                written += len(row["warc"])
        finally:
            if out is not None:
                out.close()

    records.foreachPartition(write_partition)
