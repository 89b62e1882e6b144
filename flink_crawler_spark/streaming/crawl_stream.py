"""Continuous crawl: Structured Streaming wrapper around the batch tick.

Reference: the whole point of flink-crawler is ONE always-running job
continuously fed by ``SeedUrlSource``. Spark-side, continuous operation
is the streaming shell around the identical per-tick batch logic
(SURVEY §7): the seed DataSource emits new seed lines per micro-batch
(offset = file index, checkpointed by Spark), ``foreachBatch`` merges
them into the durable state table and advances the crawl a few ticks.

Exactly-once seed ingestion comes from the DataSource offset (replayed
batches re-merge the same rows — idempotent for already-fetched URLs,
and Spark's checkpoint prevents re-delivery in the first place), which
is the reference's checkpointed read index (SeedUrlSource.java:153-166)
reborn as stream offsets.
"""

from __future__ import annotations

import os
from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession

from ..operators.merge import merge_crawl_state, merge_updates
from ..plans.crawl_loop import CrawlConfig, clean_urls, crawl, seeds_to_state


def _latest_tick(state_dir: str) -> int | None:
    marker = os.path.join(state_dir, "_LATEST")
    if not os.path.exists(marker):
        return None
    with open(marker) as fh:
        return int(fh.read().strip())


def ingest_seeds(
    spark: SparkSession,
    seeds: DataFrame,
    state_dir: str,
    *,
    now_ms: int,
    single_domain: str | None = None,
) -> None:
    """Merge a batch of (new) seed rows into the durable state table."""
    cleaned = clean_urls(seeds, single_domain=single_domain)
    obs = seeds_to_state(cleaned, now_ms=now_ms)
    tick = _latest_tick(state_dir)
    if tick is None:
        state, tick = merge_crawl_state(obs), 0
    else:
        current = spark.read.parquet(os.path.join(state_dir, f"state_t{tick}"))
        # materialize + cut lineage BEFORE overwriting the path we just
        # read ("cannot overwrite a path that is also being read from")
        state = merge_updates(current, obs).localCheckpoint(eager=True)
    os.makedirs(state_dir, exist_ok=True)
    state.write.mode("overwrite").parquet(os.path.join(state_dir, f"state_t{tick}"))
    tmp = os.path.join(state_dir, "_LATEST.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(tick))
    os.replace(tmp, os.path.join(state_dir, "_LATEST"))


def continuous_crawl(
    spark: SparkSession,
    *,
    seed_path: str,
    pages: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    config: CrawlConfig | None = None,
    ticks_per_batch: int = 3,
    seeds_per_batch: int = 0,  # 0 = whole file in one batch
    start_ms: int = 1_700_000_000_000,
    available_now: bool = True,
):
    """Run the crawl as a streaming job fed by the seed DataSource.

    Returns the StreamingQuery. ``available_now=True`` drains one
    read() worth of seeds and stops (note: a SimpleDataSourceStreamReader
    snapshot is ONE read call — set seeds_per_batch=0 so the drain covers
    the whole file). ``available_now=False`` keeps triggering micro-batches
    (the always-on deployment; stop via query.stop() or
    processAllAvailable() for tests).
    """
    from ..sources.seed_datasource import SeedDataSource

    cfg = config or CrawlConfig()
    try:
        spark.dataSource.register(SeedDataSource)
    except Exception:
        pass  # already registered in this session

    stream = (
        spark.readStream.format("seed_source")
        .option("path", seed_path)
        .option("batch_size", str(seeds_per_batch))
        .load()
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        tick = _latest_tick(state_dir) or 0
        now_ms = start_ms + tick * cfg.tick_ms
        ingest_seeds(
            spark, batch_df, state_dir, now_ms=now_ms, single_domain=cfg.single_domain
        )
        batch_cfg = replace(
            cfg,
            state_dir=state_dir,
            max_ticks=tick + ticks_per_batch,
            trace=False,
        )
        empty_seeds = spark.createDataFrame([], "url string, score double")
        crawl(spark, empty_seeds, pages=pages, config=batch_cfg, start_ms=start_ms)

    writer = stream.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
