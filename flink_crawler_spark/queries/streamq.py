"""Structured Streaming queries (§2.14).

The reference runs one always-on DataStream job with processing-time
semantics; Spark-side the equivalent is Structured Streaming. Here the
events table is replayed through a real streaming query
(readStream -> window agg -> memory sink, availableNow trigger) and the
final result is compared against a plain SQL oracle — the streaming
runtime must converge to the batch answer (the Structured Streaming
paper's core claim: prefix consistency).

events.ts is a parquet TIMESTAMP (micros, no tz); the stream casts it
to a session-zone (UTC) timestamp for watermarks/windows so the integer
epoch arithmetic matches duckdb's epoch_ms(ts).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# parent session -> dedicated stream-replay clone (keyed by the parent
# object itself so the parent stays alive as long as its clone does)
_STREAM_SESSIONS: dict[SparkSession, SparkSession] = {}


def _stream_session(spark: SparkSession, n: int = 4) -> SparkSession:
    """Dedicated cloned session (same SparkContext, own SQL conf) for the
    bounded stream replays, with the shuffle/state partition count pinned
    to ``n``. Every micro-batch provisions one state store per shuffle
    partition per stateful operator, and on a bounded local replay that
    provisioning IS the floor (measured: the stream-stream join runs
    19.9 s at 32 state partitions vs 7.8 s at 4, identical results).

    A clone instead of a scoped ``spark.conf.set``: mutating the caller's
    session — even save/restore — silently re-plans any batch query built
    concurrently on it with 4 shuffle partitions, and two interleaved
    scopes restore the wrong saved value. Per-session conf is the
    isolation Spark actually provides, so use it. Streams, their static
    join sides, and their memory-sink tables must all live on this one
    session (cross-session plan mixing is an error in Spark), which is
    why the helpers below build everything through it. A real deployment
    sizes this to its cluster — state partitioning is pinned at the
    FIRST checkpoint and kept for the query's life either way."""
    clone = _STREAM_SESSIONS.get(spark)
    if clone is None:
        clone = spark.newSession()
        # newSession() starts from the shared SparkConf; carry over the
        # runtime SQL confs the oracles' semantics depend on
        for k in ("spark.sql.session.timeZone", "spark.sql.adaptive.enabled"):
            try:
                clone.conf.set(k, spark.conf.get(k))
            except Exception:
                pass
        clone.conf.set("spark.sql.shuffle.partitions", str(n))
        _STREAM_SESSIONS[spark] = clone
    return clone


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark = _stream_session(spark)
    path = os.path.join(sf_dir, "events.parquet")
    # r12 (guide §1.2): schema via the memoized table handle — each
    # spark.read.parquet re-derivation cost 100-260 ms of driver work
    schema = t(spark, sf_dir, "events").schema
    # FileStreamSource wants a directory — expose the table file through one
    stream_dir = tempfile.mkdtemp(prefix="fcs_stream_src_")
    os.symlink(path, os.path.join(stream_dir, "events.parquet"))
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    return stream.withColumn("ts_t", F.col("ts").cast("timestamp_ltz"))


def _temp_ckpt(prefix: str = "fcs_ckpt_") -> str:
    """Throwaway checkpoint dir for the bounded replays, on tmpfs when
    available: the offset/commit logs and state-store files fsync per
    micro-batch, and for a convergence check whose checkpoint is deleted
    afterwards that disk round-trip is pure floor. A durable deployment
    configures its own (HDFS/S3) checkpointLocation — this helper is the
    local-temp path only.

    tmpfs is used only when it has real headroom: containers commonly
    mount /dev/shm at 64 MB, and the offset/commit logs plus state
    snapshots hitting ENOSPC there would fail replays that work fine on
    disk — so require ≥256 MB free before preferring it."""
    base = None
    if os.access("/dev/shm", os.W_OK):
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= 256 * 1024 * 1024:
                base = "/dev/shm"
        except OSError:
            pass
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def _literal_rows(spark: SparkSession, schema, rows) -> DataFrame:
    """Schema-shaped literal rows as EXPRESSIONS (``range(1).select(lit …)``)
    instead of ``createDataFrame``: a Python-local relation written to
    parquet pays a ~5 s Python-worker round-trip PER WRITE (measured —
    the expression-built twin costs 0.2 s), and the sentinel files these
    build are on every availableNow replay's critical path."""
    frames = [
        spark.range(1).select(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for f, v in zip(schema.fields, r)
            ]
        )
        for r in rows
    ]
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def _run_to_memory(agg: DataFrame, prefix: str, mode: str = "complete") -> DataFrame:
    # agg was built on the stream-replay session; the memory sink registers
    # its table there too, so read it back through the same session
    spark = agg.sparkSession
    name = prefix + uuid.uuid4().hex[:8]
    ckpt = _temp_ckpt()
    q = (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # an EXPLICIT checkpointLocation is never auto-deleted (only the
    # engine's own temp dirs are) — drop it, the replay is done
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


from .base import register, t  # noqa: E402
from .base import dec_to_double_wide as _d2dw  # noqa: E402
from .base import dsum_wide as _dsum_wide  # noqa: E402
from .base import dsum_wide_sql as _dws  # noqa: E402


@register(
    "stream_window_counts",
    oracle=f"""
SELECT epoch_ms(ts) // 300000 * 300000 AS window_start_ms,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       {_dws('value', 'total_value')}
FROM events
GROUP BY 1, 2
""",
)
def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling event-time windows per event_type, computed by an
    actual streaming query (availableNow), read back from the memory sink."""
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts_t", "10 minutes")
        .groupBy(F.window("ts_t", "5 minutes"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum_wide(F.col("value"), "total_value"),
        )
    )
    out = _run_to_memory(agg, "stream_out_")
    return out.select(
        F.unix_millis(F.col("window.start")).alias("window_start_ms"),
        "event_type",
        "n",
        "total_value",
    )


from .core import MERGED_SQL, OBS_SQL, crawl_obs  # noqa: E402


@register(
    "stream_url_db_merge",
    oracle=f"""
WITH {OBS_SQL.strip()}, {MERGED_SQL.strip()}
SELECT url, pld, status, status_time, round(score, 6) AS score, next_fetch_time
FROM merged
""",
)
def stream_url_db_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful streaming URL DB (applyInPandasWithState keyed by pld,
    streaming/url_db.py) replaying the same observations the batch
    merge-lattice query folds — it must converge to the identical state.
    This is UrlDBFunction's semantics checked end-to-end through the
    Structured Streaming runtime."""
    import tempfile
    import uuid

    from ..streaming.url_db import run_obs_stream_to_state

    from ..operators import ensure_parallelism

    obs_dir = tempfile.mkdtemp(prefix="fcs_obs_")
    # r12 (guide §2.5/§6): the obs derivation inherits the single-file
    # lineitem scan's one partition, so coalesce(1) made the write one
    # task AND the stream replay read one split. Spread it instead —
    # availableNow with no maxFilesPerTrigger still replays everything
    # as ONE batch, so per-url merge grouping is unchanged.
    ensure_parallelism(crawl_obs(spark, sf_dir)).write.mode("overwrite").parquet(obs_dir)
    sink = run_obs_stream_to_state(
        _stream_session(spark), obs_dir, "urldb_" + uuid.uuid4().hex[:8]
    )
    # update-mode sink may hold one emission per (url, batch); keep the
    # final merge per url (argmax on the merge-progress ordering)
    final = (
        sink.groupBy("url")
        .agg(
            F.max(
                F.struct("status_time", "score", "status", "next_fetch_time", "pld")
            ).alias("w")
        )
        .select("url", "w.pld", "w.status", "w.status_time", "w.score", "w.next_fetch_time")
    )
    return final.select(
        "url", "pld", "status", "status_time", F.round("score", 6).alias("score"),
        "next_fetch_time",
    )


@register(
    "stream_dedup",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicates with watermarked state) —
    the continuous form of the training-pipeline dedup gate; must
    converge to batch DISTINCT."""
    stream = _event_stream(spark, sf_dir)
    dedup = stream.withWatermark("ts_t", "24 hours").dropDuplicates(
        ["user_id", "event_type"]
    ).select("user_id", "event_type")
    return _run_to_memory(dedup, "stream_dedup_", mode="append")


@register(
    "stream_sessionize",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_ms(ts) - lag(epoch_ms(ts))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id) > 3600000
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM gaps GROUP BY user_id
""",
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows through the streaming runtime (session_window with
    a 1 h gap) must produce exactly the sessions the batch lag-window
    query derives — same oracle as sessionize_events."""
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts_t", "2 hours")
        .groupBy(F.session_window("ts_t", "1 hour"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = _run_to_memory(agg, "stream_sess_")
    return out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events")
    )


@register(
    "stream_rate_gauge",
    oracle="""
SELECT (epoch_ms(ts) // 10000 - k.o) * 10000 AS window_start_ms,
       event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS o) k
GROUP BY 1, 2
""",
)
def stream_rate_gauge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch-rate gauge (TimedCounter, FetchUrlsFunction.java:169-224) as a
    streaming 30 s sliding count per event_type. Exact oracle: every
    event lands in exactly 3 of the 10 s-slide windows (starts
    floor(t/10s)*10s - {0,10,20}s, all > t-30s), so the sliding window
    is a 3-offset cross join in plain SQL."""
    stream = _event_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts_t", "1 minute")
        .groupBy(F.window("ts_t", "30 seconds", "10 seconds"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = _run_to_memory(agg, "stream_rate_")
    return out.select(
        F.unix_millis(F.col("window.start")).alias("window_start_ms"), "event_type", "n"
    )


@register(
    "stream_stream_join",
    oracle="""
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       CAST(epoch_ms(p.ts) - epoch_ms(c.ts) AS BIGINT) AS delta_ms
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND epoch_ms(p.ts) >= epoch_ms(c.ts)
 AND epoch_ms(p.ts) <  epoch_ms(c.ts) + 1800000
""",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (click -> purchase within
    30 minutes, per user): both sides are real file streams with 1-hour
    watermarks; the interval condition bounds the join state so neither
    side buffers forever — the scale requirement for stream-stream joins.
    Inner join + watermark converges exactly to the batch join (oracle).
    """
    # ms-truncated integer time on BOTH the payload and the join/watermark
    # column, so the interval comparison runs at the same precision the
    # oracle's epoch_ms uses
    clicks = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.expr("timestamp_millis(unix_millis(cast(ts as timestamp_ltz)))").alias("c_time"),
            F.expr("unix_millis(cast(ts as timestamp_ltz))").alias("c_ms"),
        )
        .withWatermark("c_time", "1 hour")
    )
    purchases = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.expr("timestamp_millis(unix_millis(cast(ts as timestamp_ltz)))").alias("p_time"),
            F.expr("unix_millis(cast(ts as timestamp_ltz))").alias("p_ms"),
        )
        .withWatermark("p_time", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_time") >= F.col("c_time"))
        & (F.col("p_time") < F.col("c_time") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    )
    return _run_to_memory(joined, "ssj_", mode="append").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.col("p_ms") - F.col("c_ms")).alias("delta_ms"),
    )


@register(
    "stream_stream_left_join",
    oracle="""
SELECT c.user_id,
       c.event_id AS click_id,
       CAST(coalesce(p.event_id, -1) AS BIGINT) AS purchase_id,
       CAST(coalesce(epoch_ms(p.ts) - epoch_ms(c.ts), -1) AS BIGINT) AS delta_ms
FROM (SELECT * FROM events WHERE event_type = 'click') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND epoch_ms(p.ts) >= epoch_ms(c.ts)
 AND epoch_ms(p.ts) <  epoch_ms(c.ts) + 1800000
""",
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER watermarked stream-stream interval join — the hard
    streaming case: unmatched left rows may only be emitted once the
    watermark has passed their join window, and under an availableNow
    replay the watermark normally stops at max(event_time) - delay,
    leaving the tail of unmatched rows stuck in state forever.

    The fix is a *sentinel flush*: a far-future (+3 h) event for a
    reserved user id is appended to the source directory as a second
    file. The batch watermark then advances past every real event's join
    window, and the no-data micro-batch availableNow runs after the data
    batch evicts the join state and emits every unmatched row — the
    streaming result converges EXACTLY to the batch left join, which is
    the oracle. Sentinel rows are dropped from the output; null join
    columns are coalesced to -1 on both engines so the value hash is
    null-free.
    """
    sspark = _stream_session(spark)
    path = os.path.join(sf_dir, "events.parquet")
    ev = t(spark, sf_dir, "events")  # r12: memoized handle (guide §1.2)
    schema = ev.schema
    stream_dir = tempfile.mkdtemp(prefix="fcs_ssj_left_")
    os.symlink(path, os.path.join(stream_dir, "events.parquet"))
    mx = ev.agg(F.max("ts"), F.max("event_id")).first()
    import datetime
    sentinel_ts = mx[0] + datetime.timedelta(hours=3)
    sentinel = [
        (mx[1] + 1, sentinel_ts, -1, "click", 0.0, "{}"),
        (mx[1] + 2, sentinel_ts, -1, "purchase", 0.0, "{}"),
    ]
    _literal_rows(spark, schema, sentinel).coalesce(1).write.mode("append").parquet(
        stream_dir
    )

    def side(event_type: str, pre: str) -> DataFrame:
        s = sspark.readStream.schema(schema).parquet(stream_dir)
        return (
            s.filter(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{pre}_user"),
                F.col("event_id").alias(f"{pre}_id"),
                F.expr("timestamp_millis(unix_millis(cast(ts as timestamp_ltz)))").alias(f"{pre}_time"),
                F.expr("unix_millis(cast(ts as timestamp_ltz))").alias(f"{pre}_ms"),
            )
            .withWatermark(f"{pre}_time", "1 hour")
        )

    joined = side("click", "c").join(
        side("purchase", "p"),
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_time") >= F.col("c_time"))
        & (F.col("p_time") < F.col("c_time") + F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    )
    return (
        _run_to_memory(joined, "ssjl_", mode="append")
        .filter(F.col("c_user") != -1)
        .select(
            F.col("c_user").alias("user_id"),
            F.col("c_id").alias("click_id"),
            F.coalesce(F.col("p_id"), F.lit(-1)).cast("bigint").alias("purchase_id"),
            F.coalesce(F.col("p_ms") - F.col("c_ms"), F.lit(-1)).cast("bigint").alias("delta_ms"),
        )
    )




@register(
    "stream_static_join",
    oracle=f"""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_events,
       {_dws('e.value', 'total_value')},
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    customer dimension, then aggregated — the canonical streaming-ETL
    shape (facts stream in, dims sit in a table). The static side needs
    no watermark and no state: each micro-batch plans a fresh broadcast
    hash join against the dim snapshot, so a dim update is picked up on
    the next batch for free. Converges exactly to the batch join
    (oracle)."""
    stream = _event_stream(spark, sf_dir)
    # static side MUST come from the stream-replay session — Spark rejects
    # joins that mix plans from two sessions
    cu = t(stream.sparkSession, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = stream.join(F.broadcast(cu), stream.user_id == cu.c_custkey)
    # streaming allows ONE aggregation per query: do the stateful
    # (segment, user) level in the stream; the per-segment rollup —
    # including the exact distinct-user count, which streaming aggs
    # can't express — is a batch query over the sink result
    agg = joined.groupBy("c_mktsegment", "user_id").agg(
        F.count(F.lit(1)).alias("n_e"),
        F.sum(F.round("value", 6).cast("decimal(28,6)")).alias("v_dec"),
    )
    out = _run_to_memory(agg, "stream_static_")
    return out.groupBy("c_mktsegment").agg(
        F.sum("n_e").alias("n_events"),
        _d2dw(F.sum("v_dec")).alias("total_value"),
        F.count(F.lit(1)).alias("n_users"),
    )


@register(
    "stream_window_counts_append",
    oracle=f"""
SELECT epoch_ms(ts) // 300000 * 300000 AS window_start_ms,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       {_dws('value', 'total_value')}
FROM events
GROUP BY 1, 2
""",
)
def stream_window_counts_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same 5-minute tumbling windows as `stream_window_counts`, but
    in APPEND output mode — the mode that scales: each window row is
    emitted exactly once when the watermark closes it and its state is
    dropped, instead of complete mode's re-emit-everything-per-batch.
    Append mode only emits closed windows, so (as in
    stream_stream_left_join) a far-future sentinel event is appended as
    a second source file: the watermark then passes every real window
    and the availableNow no-data micro-batch flushes them all. Sentinel
    rows carry user_id -1 and land in one far-future window that is
    filtered from the output; the result converges EXACTLY to the batch
    aggregation (oracle)."""
    path = os.path.join(sf_dir, "events.parquet")
    ev = t(spark, sf_dir, "events")  # r12: memoized handle (guide §1.2)
    schema = ev.schema
    stream_dir = tempfile.mkdtemp(prefix="fcs_swa_")
    os.symlink(path, os.path.join(stream_dir, "events.parquet"))
    mx = ev.agg(F.max("ts"), F.max("event_id")).first()
    import datetime

    sentinel_ts = mx[0] + datetime.timedelta(hours=3)
    sentinel = [(mx[1] + 1, sentinel_ts, -1, "view", 0.0, "{}")]
    _literal_rows(spark, schema, sentinel).coalesce(1).write.mode("append").parquet(
        stream_dir
    )
    stream = (
        _stream_session(spark).readStream.schema(schema)
        .parquet(stream_dir)
        .withColumn("ts_t", F.col("ts").cast("timestamp_ltz"))
    )
    agg = (
        stream.withWatermark("ts_t", "10 minutes")
        .groupBy(F.window("ts_t", "5 minutes"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum_wide(F.col("value"), "total_value"),
        )
    )
    out = _run_to_memory(agg, "stream_swa_", mode="append")
    # drop the sentinel's far-future window
    cutoff = F.lit(mx[0]).cast("timestamp_ltz")
    return out.filter(F.col("window.start") <= cutoff).select(
        F.unix_millis(F.col("window.start")).alias("window_start_ms"),
        "event_type",
        "n",
        "total_value",
    )


@register(
    "stream_dedup_within_watermark",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark — the STATE-BOUNDED streaming dedup
    (vs stream_dedup's dropDuplicates, whose key state lives forever):
    a key's dedup state is dropped once the watermark passes it, so
    state size tracks the watermark window instead of the key
    cardinality — the only dedup that survives an unbounded stream.
    Replayed in one availableNow batch no duplicate straddles an
    expired window, so the result converges to batch DISTINCT (oracle
    shared with stream_dedup)."""
    stream = _event_stream(spark, sf_dir)
    dedup = (
        stream.withWatermark("ts_t", "24 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run_to_memory(dedup, "stream_ddww_", mode="append")


@register(
    "stream_update_mode_counts",
    oracle="""
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
""",
)
def stream_update_mode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE output mode — the third mode (complete and append are
    gated elsewhere): each micro-batch emits only the keys whose state
    changed, so the sink accumulates one row per (key, updating batch)
    and the consumer takes the LAST update per key. Counts are monotone,
    so last == max — the standard idempotent-consumer contract for
    update-mode sinks. Converges to the batch aggregate (oracle).
    n_users is a two-level agg batch-side off the per-(type,user) stream
    state, as in stream_static_join."""
    stream = _event_stream(spark, sf_dir)
    agg = stream.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n_e"))
    sink = _run_to_memory(agg, "stream_upd_", mode="update")
    # last update per (event_type, user_id): counts are monotone -> max
    final = sink.groupBy("event_type", "user_id").agg(F.max("n_e").alias("n_e"))
    return final.groupBy("event_type").agg(
        F.sum("n_e").alias("n"), F.count(F.lit(1)).alias("n_users")
    )


@register(
    "sessionize_session_window_batch",
    oracle="""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_ms(ts) - lag(epoch_ms(ts))
                      OVER (PARTITION BY user_id ORDER BY ts, event_id) > 3600000
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM gaps GROUP BY user_id
""",
)
def sessionize_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window in BATCH mode — the FOURTH sessionization
    implementation against the same oracle (lag-window, streaming
    session_window, grouped-map applyInPandas, and now the batch
    session_window aggregate): the gap-merge operator must behave
    identically whether driven by the streaming state store or the
    batch aggregation path. One caveat pinned here: session_window's
    gap is strict (events exactly 1 h apart merge iff lag <= gap), so
    the lag formulation uses the matching > comparison."""
    from .base import t

    ev = t(spark, sf_dir, "events").withColumn(
        "ts_t", F.col("ts").cast("timestamp_ltz")
    )
    per_session = ev.groupBy(
        F.session_window("ts_t", "1 hour"), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"), F.sum("n").alias("n_events")
    )
