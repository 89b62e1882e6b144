"""Custom streaming DataSource for continuous seed ingestion.

Reference: ``sources/SeedUrlSource.java`` — a long-lived source operator
that trickles seed URLs (10 ms/record), skips ``#`` comments/blanks
(:254-261), and checkpoints its read index (``ListCheckpointed<Integer>``,
:153-166) so a restart resumes where it left off.

Spark-first: the PySpark DataSource API (Spark 4). The checkpointed
read index is the stream *offset* — Spark persists it in the
checkpoint location and calls ``readBetweenOffsets`` on replay, giving
the same resume-on-restart guarantee the reference hand-rolls.

Usage::

    spark.dataSource.register(SeedDataSource)
    seeds = (spark.readStream.format("seed_source")
             .option("path", "/path/seeds.txt")
             .option("batch_size", "100")   # records per micro-batch
             .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


def _read_seed_lines(path: str) -> list[tuple[str, float]]:
    """Parse a seed file: ``url [score]`` per line, '#' comments skipped."""
    out: list[tuple[str, float]] = []
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            score = float(parts[1]) if len(parts) > 1 else 1.0
            out.append((parts[0], score))
    return out


class SeedStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("seed_source requires option 'path'")
        self.batch_size = int(options.get("batch_size", "0"))  # 0 = all at once
        self._lines: list[tuple[str, float]] | None = None

    def _seeds(self) -> list[tuple[str, float]]:
        if self._lines is None:
            self._lines = _read_seed_lines(self.path)
        return self._lines

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        seeds = self._seeds()
        i = int(start.get("index", 0))
        j = len(seeds) if self.batch_size <= 0 else min(i + self.batch_size, len(seeds))
        return iter(seeds[i:j]), {"index": j}

    def readBetweenOffsets(self, start: dict, end: dict):
        seeds = self._seeds()
        return iter(seeds[int(start.get("index", 0)) : int(end.get("index", 0))])


class SeedDataSource(DataSource):
    """Streaming seed-URL source with a checkpointed line-index offset."""

    @classmethod
    def name(cls) -> str:
        return "seed_source"

    def schema(self) -> str:
        return "url string, score double"

    def simpleStreamReader(self, schema) -> SeedStreamReader:
        return SeedStreamReader(self.options)
