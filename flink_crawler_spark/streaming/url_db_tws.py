"""Stateful URL DB on Spark 4's transformWithStateInPandas API.

Same reference semantics as ``streaming/url_db.py``
(``functions/UrlDBFunction.java:419-528`` upsert +
``urldb/DefaultUrlStateMerger.java:18-61`` lattice), re-expressed on the
successor stateful API: a ``StatefulProcessor`` keyed by pld whose URL
map is a first-class ``MapState`` (url -> state row) instead of the flat
parallel-array struct ``applyInPandasWithState`` forces. That is exactly
the reference's state layout (``MapState<Long, CrawlStateUrl>``,
UrlDBFunction.java:94-139) — but resident in Spark's state store, with
per-entry point updates instead of whole-value rewrites, which is the
scale win: a hot PLD with millions of tracked URLs no longer
deserializes its entire map per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .url_db import OBS_SCHEMA, OUT_SCHEMA, merge_one

_URL_KEY_SCHEMA = "url string"
_VAL_SCHEMA = "status string, status_time bigint, score double, next_fetch_time bigint"


class UrlDbProcessor(StatefulProcessor):
    """Per-PLD URL DB: merge every observation through the lattice,
    emit the post-merge row for each URL touched in the batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._urls = handle.getMapState("urldb", _URL_KEY_SCHEMA, _VAL_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pld = key[0]
        touched: dict[str, tuple] = {}
        for pdf in rows:
            for url, status, status_time, score, nft in zip(
                pdf["url"], pdf["status"], pdf["status_time"], pdf["score"],
                pdf["next_fetch_time"], strict=True,
            ):
                cur = touched.get(url)
                if cur is None and self._urls.containsKey((url,)):
                    row = self._urls.getValue((url,))
                    cur = (row[0], row[1], row[2], row[3])
                touched[url] = merge_one(
                    cur, status, int(status_time), float(score), int(nft)
                )
        out = []
        for url, (status, status_time, score, nft) in touched.items():
            self._urls.updateValue((url,), (status, status_time, score, nft))
            out.append((url, pld, status, status_time, score, nft))
        yield pd.DataFrame(
            out,
            columns=["url", "pld", "status", "status_time", "score", "next_fetch_time"],
        )

    def close(self) -> None:
        pass


def run_obs_stream_to_state_tws(
    spark: SparkSession, obs_dir: str, name: str
) -> DataFrame:
    """Replay an observation directory through the TWS URL DB into a
    memory sink; returns the sink table (one emission per touched url
    per batch, Update mode)."""
    stream = spark.readStream.schema(OBS_SCHEMA).parquet(obs_dir)
    merged = stream.groupBy("pld").transformWithStateInPandas(
        UrlDbProcessor(),
        outputStructType=OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    q = (
        merged.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
