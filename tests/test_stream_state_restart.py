"""State-store recovery across a streaming restart.

test_crawl_stream covers SOURCE recovery (checkpointed offsets are not
re-delivered). This covers the other half of fault tolerance: the state
store. A watermarked window aggregation is stopped mid-stream and
restarted on the same checkpoint; windows spanning the stop point can
only be correct if the aggregation state was recovered, and append-mode
emission must stay exactly-once across the restart (no duplicate window
rows in the file sink)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_windowed_agg_state_survives_restart(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    os.makedirs(src)

    events = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .filter(F.col("user_id") < 50)
        .select("event_id", "user_id", "event_type", "ts")
    )
    # split by TIME: run 1's watermark ends at t_mid - 10min, so run 2's
    # rows are never late-discarded, and every window overlapping the
    # boundary needs run-1 state recovered to count both halves
    ms = F.unix_millis(F.col("ts").cast("timestamp_ltz"))
    t_mid = events.agg(F.expr(
        "percentile(unix_millis(cast(ts as timestamp_ltz)), 0.5)"
    )).collect()[0][0]
    a = events.filter(ms <= F.lit(int(t_mid)))
    b = events.filter(ms > F.lit(int(t_mid)))
    max_ts = events.agg(F.max("ts")).collect()[0][0]

    a.coalesce(1).write.parquet(os.path.join(src, "part_a"))
    schema = spark.read.parquet(os.path.join(src, "part_a")).schema

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
            .withColumn("ts_t", F.col("ts").cast("timestamp_ltz"))
        )
        agg = (
            stream.withWatermark("ts_t", "10 minutes")
            .groupBy(F.window("ts_t", "5 minutes"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.unix_millis(F.col("window.start")).alias("w_start"),
                "event_type",
                "n",
            )
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # processes half A; some windows emit, open ones stay state

    # half B + a far-future sentinel that pushes the watermark past every
    # real window, forcing all remaining state to emit in run 2
    sentinel = spark.createDataFrame(
        [(10**9, 0, "__sentinel__", max_ts)], schema=events.schema
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 DAYS"))
    b.unionByName(sentinel).coalesce(1).write.parquet(os.path.join(src, "part_b"))
    run_once()  # restart on the same checkpoint

    got = (
        spark.read.parquet(out)
        .filter(F.col("event_type") != "__sentinel__")
        .collect()
    )
    # exactly-once: one row per (window, type) across both runs
    keys = [(r.w_start, r.event_type) for r in got]
    assert len(keys) == len(set(keys)), "duplicate window emissions after restart"

    expected = {
        (r.w_start, r.event_type): r.n
        for r in events.select(
            (
                F.floor(F.unix_millis(F.col("ts").cast("timestamp_ltz")) / 300000)
                * 300000
            ).alias("w_start"),
            "event_type",
        )
        .groupBy("w_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got_map = {(r.w_start, r.event_type): r.n for r in got}
    # every window's count covers BOTH halves — impossible without the
    # run-1 aggregation state being recovered in run 2
    assert got_map == expected
