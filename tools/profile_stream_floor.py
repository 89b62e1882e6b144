"""Adjudicate the streaming-query floor (r12 verdict task 7): split one
representative bounded replay (the stream_window_counts_append shape) into
  prep      — batch jobs before .start() (sentinel write, max() agg)
  start+b1  — engine init + first micro-batch (state-store provisioning)
  batches   — remaining micro-batch work (from recentProgress durationMs)
  drain     — awaitTermination tail + memory-sink read + stop/cleanup
at the current $SPARK_GRAFT_CPUS. Run once at 32 and once at 8; numbers go
to SCALE.md. Usage: SPARK_GRAFT_CPUS=8 python tools/profile_stream_floor.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("FCS_STREAM_REPS", "3"))

    from pyspark.sql import functions as F

    from flink_crawler_spark.queries import streamq
    from flink_crawler_spark.queries.base import t
    from flink_crawler_spark.session import get_spark

    spark = get_spark("stream_floor")
    spark.sparkContext.setLogLevel("ERROR")
    n_cpus = spark.sparkContext.defaultParallelism
    spark.range(10).count()

    # bench.py's streaming warmup (absorb one-time engine init so rep 1
    # measures the query, matching the bench's accounting)
    import tempfile
    import uuid

    warm = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    wdir = tempfile.mkdtemp(prefix="fcs_sf_warm_")
    warm.limit(3).write.mode("overwrite").parquet(wdir)
    wstream = streamq._stream_session(spark).readStream.schema(warm.schema).parquet(wdir)
    wq = (
        wstream.groupBy("n_regionkey").count()
        .writeStream.outputMode("complete").format("memory")
        .queryName("sfwarm_" + uuid.uuid4().hex[:6])
        .trigger(availableNow=True).start()
    )
    wq.awaitTermination()

    for rep in range(reps):
        t0 = time.time()
        # --- prep (mirrors stream_window_counts_append exactly) ---
        path = os.path.join(sf_dir, "events.parquet")
        ev = t(spark, sf_dir, "events")
        schema = ev.schema
        stream_dir = tempfile.mkdtemp(prefix="fcs_sfp_")
        os.symlink(path, os.path.join(stream_dir, "events.parquet"))
        mx = ev.agg(F.max("ts"), F.max("event_id")).first()
        import datetime

        sentinel_ts = mx[0] + datetime.timedelta(hours=3)
        sentinel = [(mx[1] + 1, sentinel_ts, -1, "view", 0.0, "{}")]
        streamq._literal_rows(spark, schema, sentinel).coalesce(1).write.mode(
            "append"
        ).parquet(stream_dir)
        t_prep = time.time() - t0

        ss = streamq._stream_session(spark)
        stream = (
            ss.readStream.schema(schema).parquet(stream_dir)
            .withColumn("ts_t", F.col("ts").cast("timestamp_ltz"))
        )
        agg = (
            stream.withWatermark("ts_t", "10 minutes")
            .groupBy(F.window("ts_t", "5 minutes"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        )
        name = "sfp_" + uuid.uuid4().hex[:8]
        ckpt = streamq._temp_ckpt()
        t0 = time.time()
        q = (
            agg.writeStream.outputMode("append").format("memory")
            .queryName(name).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        # poll for first progress
        first_batch_at = None
        while q.isActive:
            if first_batch_at is None and q.recentProgress:
                first_batch_at = time.time() - t0
            time.sleep(0.02)
        q.awaitTermination()
        t_stream = time.time() - t0
        progress = q.recentProgress
        batch_ms = [
            (p["batchId"], p["durationMs"].get("triggerExecution", 0),
             p["durationMs"].get("addBatch", 0), p["numInputRows"])
            for p in progress
        ]
        t0 = time.time()
        n = ss.table(name).count()
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
        t_drain = time.time() - t0
        print(
            f"rep{rep} cpus={n_cpus}: prep={t_prep:.2f}s stream={t_stream:.2f}s"
            f" (first_progress={first_batch_at if first_batch_at is None else round(first_batch_at,2)}s)"
            f" drain={t_drain:.2f}s rows={n}",
            flush=True,
        )
        print(f"  batches (id, triggerMs, addBatchMs, inRows): {batch_ms}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
