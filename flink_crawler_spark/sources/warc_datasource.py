"""Custom batch DataSource READER for WARC files — the source half of
the WARC surface (``operators/warc.py`` is the sink half).

Reference: the crawler both WRITES WARC segments
(``warc/WARCOutputFormat.java``) and READS page records out of
CommonCrawl's WARC archives (``fetcher/CommonCrawlFetcher.java:235-286``
— gzip member per record, parsed by header fields). This reader exposes
that record structure relationally::

    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").option("path", "/crawl/segments").load()
    # file, record_offset, warc_type, target_uri, warc_date, record_id,
    # content_type, content_length, content(binary)

Scale shape: one input partition per ``.warc.gz`` segment file — gzip
streams are not splittable, and segments are already size-bounded by the
writer's 1 GB rotation, so file-per-task IS the right granularity (the
same contract Hadoop applies to gzip text). A byte-range variant for
uncompressed/CDX-indexed archives would add (offset, length) partitions
per the CDX index, exactly how the CommonCrawl fetcher addresses single
records.
"""

from __future__ import annotations

import glob as _glob
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

WARC_SCHEMA = (
    "file string, record_offset long, warc_type string, target_uri string, "
    "warc_date string, record_id string, content_type string, "
    "content_length long, content binary"
)

_CRLF = b"\r\n"


def parse_warc_stream(fh, file_name: str) -> Iterator[tuple]:
    """Parse one (decompressed) WARC byte stream into record tuples.

    Tolerant reader: skips stray blank lines between records, stops at
    EOF or a malformed header block (a truncated tail never raises —
    crawl archives do get truncated)."""
    offset = 0
    while True:
        # skip inter-record blank lines
        line = fh.readline()
        if not line:
            return
        start = offset
        offset += len(line)
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            return  # not a record boundary: malformed/truncated tail
        headers: dict[str, str] = {}
        while True:
            h = fh.readline()
            if not h:
                return
            offset += len(h)
            if h.strip() == b"":
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        content = fh.read(length)
        offset += len(content)
        if len(content) < length:
            return  # truncated payload
        yield (
            file_name,
            start,
            headers.get("warc-type"),
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            headers.get("warc-record-id"),
            headers.get("content-type"),
            length,
            content,
        )


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires option 'path'")
        self.types = options.get("warc_types")  # e.g. "resource,response"

    def partitions(self):
        pattern = (
            self.path
            if any(c in self.path for c in "*?[")
            else os.path.join(self.path, "*.warc*")
        )
        files = sorted(_glob.glob(pattern))
        if not files:
            raise FileNotFoundError(f"no WARC files match {pattern!r}")
        return [_WarcFilePartition(p) for p in files]

    def read(self, partition: _WarcFilePartition):
        import gzip

        wanted = (
            {t.strip() for t in self.types.split(",")} if self.types else None
        )
        opener = gzip.open if partition.path.endswith(".gz") else open
        with opener(partition.path, "rb") as fh:
            for rec in parse_warc_stream(fh, os.path.basename(partition.path)):
                if wanted is None or rec[2] in wanted:
                    yield rec


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> WarcReader:
        return WarcReader(self.options)
