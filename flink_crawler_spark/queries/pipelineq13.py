"""Wave 14: data-layout and sequence analytics.

  * zorder_layout_stats — Z-order (Morton) vs linear clustering: the
    min/max-index pruning statistics that drive a Delta/Iceberg
    ``OPTIMIZE ZORDER BY`` decision, computed exactly per bucket.
  * event_markov_transitions — first-order Markov transition matrix of
    per-user event-type sequences (the sequential-pattern primitive).
  * weighted_median_price — per-flag weighted median via the new
    ``distributed_keyed_running_sum`` (3 keys would otherwise pull a
    third of the fact table through one window task).
  * session_max_concurrency — sweep-line max concurrent sessions per
    day; the interval-overlap operator, again on the keyed prefix sum.

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.partitioning import distributed_keyed_running_sum
from .base import EV_MS, register, t
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws

DAY_MS = 86_400_000

# ---------------------------------------------------------------------------
# zorder_layout_stats
# ---------------------------------------------------------------------------


def _morton16(divop: str) -> str:
    """32-bit Morton interleave of two 16-bit values ``x``/``y`` as pure
    non-negative integer arithmetic (div/mod/mul — identical semantics
    in Spark SQL ``div`` and DuckDB ``//``), so ONE generated expression
    drives both engines bit-for-bit."""
    terms = []
    for k in range(16):
        terms.append(f"(((x {divop} {1 << k}) % 2) * {1 << (2 * k)})")
        terms.append(f"(((y {divop} {1 << k}) % 2) * {1 << (2 * k + 1)})")
    return " + ".join(terms)


_ZORACLE = f"""
WITH o AS (
  SELECT o_custkey AS cx,
         CAST(epoch_ms(o_orderdate) AS BIGINT) // {DAY_MS} AS cy
  FROM orders
),
b AS (
  SELECT min(cx) AS x0, greatest(max(cx) - min(cx), 1) AS xr,
         min(cy) AS y0, greatest(max(cy) - min(cy), 1) AS yr
  FROM o
),
n AS (
  SELECT ((cx - x0) * 65535) // xr AS x, ((cy - y0) * 65535) // yr AS y
  FROM o CROSS JOIN b
),
z AS (SELECT x, y, ({_morton16('//')}) // {1 << 26} AS bucket FROM n),
l AS (SELECT x, y, x // 1024 AS bucket FROM n)
SELECT 'zorder' AS layout, bucket, CAST(count(*) AS BIGINT) AS cnt,
       min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
FROM z GROUP BY bucket
UNION ALL
SELECT 'linear' AS layout, bucket, CAST(count(*) AS BIGINT) AS cnt,
       min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
FROM l GROUP BY bucket
"""


@register("zorder_layout_stats", oracle=_ZORACLE)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout comparison behind ``OPTIMIZE ZORDER BY(custkey,
    orderdate)``: normalize both dimensions to 16 bits, interleave into
    a 32-bit Morton code, bucket rows into 64 z-range "files", and emit
    each bucket's per-dimension min/max — the pruning index a box query
    consults. The 'linear' rows are the same stats for a
    custkey-sorted layout (64 equal key-ranges): it bounds custkey
    tightly but each bucket spans the whole date axis. Both layouts tile
    the same total area — z-order's advantage is BALANCED spans
    (~8192x8192 tiles), so a date-band predicate prunes most z-buckets
    while pruning zero custkey-sorted buckets (pytest pins both the
    survivor counts and the span balance). Everything is projection + one
    groupBy per layout — no shuffle beyond the 64-row aggregates, and
    the min/max normalizer is a broadcast scalar; the morton expression
    is generated ONCE and inlined into both engines' plans."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cx"),
        F.expr(f"unix_millis(cast(o_orderdate as timestamp_ltz)) div {DAY_MS}").alias(
            "cy"
        ),
    )
    b = o.agg(
        F.min("cx").alias("x0"),
        F.greatest(F.max("cx") - F.min("cx"), F.lit(1)).alias("xr"),
        F.min("cy").alias("y0"),
        F.greatest(F.max("cy") - F.min("cy"), F.lit(1)).alias("yr"),
        # 1-row normalizer broadcast into BOTH layout branches; pin it so
        # each branch doesn't re-run the min/max scan
    ).localCheckpoint(eager=True)
    n = o.crossJoin(F.broadcast(b)).select(
        F.expr("((cx - x0) * 65535) div xr").alias("x"),
        F.expr("((cy - y0) * 65535) div yr").alias("y"),
    )
    stats = [
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    ]
    zed = (
        n.withColumn("bucket", F.expr(f"({_morton16('div')}) div {1 << 26}"))
        .groupBy("bucket")
        .agg(*stats)
        .select(F.lit("zorder").alias("layout"), "*")
    )
    lin = (
        n.withColumn("bucket", F.expr("x div 1024"))
        .groupBy("bucket")
        .agg(*stats)
        .select(F.lit("linear").alias("layout"), "*")
    )
    return zed.unionByName(lin)


# ---------------------------------------------------------------------------
# event_markov_transitions
# ---------------------------------------------------------------------------


@register(
    "event_markov_transitions",
    oracle="""
WITH e AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
c AS (
  SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS cnt
  FROM e WHERE nxt IS NOT NULL GROUP BY src, nxt
),
tot AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS tot FROM c GROUP BY src)
SELECT c.src, c.dst, c.cnt,
       round(CAST(c.cnt AS DOUBLE) / CAST(tot.tot AS DOUBLE), 9) AS prob
FROM c JOIN tot USING (src)
""",
)
def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: P(next=dst | cur=src) with counts — the
    sequential-pattern / next-event-prediction primitive (and the
    feature a behavioral-abuse detector consumes). ``lead`` runs under
    a PER-USER window (bounded partitions — nothing global), the
    transition counts are one shuffle on (src, dst), and the per-src
    totals re-aggregate the already-tiny count table (|event types|^2
    rows) with a broadcast join back. The probability is one exact
    IEEE division of two BIGINTs rounded to 9dp, so both engines agree
    bit-for-bit."""
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr(EV_MS).alias("ms"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    c = (
        e.withColumn("dst", F.lead("event_type").over(w))
        .filter(F.col("dst").isNotNull())
        .groupBy(F.col("event_type").alias("src"), "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # feeds the per-src totals AND the final join; pinning the tiny
        # |types|^2 table stops the full lead-window pass running twice
        .localCheckpoint(eager=True)
    )
    tot = c.groupBy("src").agg(F.sum("cnt").cast("long").alias("tot"))
    return c.join(F.broadcast(tot), "src").select(
        "src",
        "dst",
        "cnt",
        F.round(F.col("cnt").cast("double") / F.col("tot").cast("double"), 9).alias(
            "prob"
        ),
    )


# ---------------------------------------------------------------------------
# weighted_median_price
# ---------------------------------------------------------------------------


@register(
    "weighted_median_price",
    oracle=f"""
WITH li AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)) AS price,
         CAST(round(l_quantity, 2) AS DECIMAL(18,2)) AS w
  FROM lineitem
),
g AS (
  SELECT flag, price, CAST(sum(w) AS DECIMAL(28,2)) AS w
  FROM li GROUP BY flag, price
),
c AS (
  SELECT flag, price, w,
         CAST(sum(w) OVER (PARTITION BY flag ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(28,2)) AS cum
  FROM g
),
tt AS (SELECT flag, CAST(sum(w) AS DECIMAL(28,2)) AS tot FROM g GROUP BY flag)
SELECT c.flag AS l_returnflag,
       CAST(min(c.price) AS DOUBLE) AS w_median,
       {_d2dws('min(tt.tot)', 2)} AS total_w
FROM c JOIN tt USING (flag)
WHERE 2 * c.cum >= tt.tot
GROUP BY c.flag
""",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag QUANTITY-WEIGHTED median extended price — the
    smallest price whose cumulative weight reaches half the flag's
    total (the weighted order statistic a price-index or robust-center
    report needs; plain medians ignore volume).

    The cumulative weight is the scale hazard: only THREE flag values
    exist, so ``Window.partitionBy(flag).orderBy(price)`` would drag a
    third of the fact table through one task. It runs instead on
    ``distributed_keyed_running_sum`` (range partition on (flag, price),
    per-(partition, key) window sums, broadcast boundary carries — at
    most nparts-1 carry rows whatever the key skew). Weights and the
    half-total comparison are exact DECIMAL algebra, so the knife-edge
    2*cum >= total selection matches the oracle bit-for-bit."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice"), 2).cast("decimal(18,2)").alias("price"),
        F.round(F.col("l_quantity"), 2).cast("decimal(18,2)").alias("w"),
    )
    g = (
        li.groupBy("flag", "price")
        .agg(F.sum("w").cast("decimal(28,2)").alias("w"))
        # feeds the prefix-sum helper AND the per-flag totals; pin so the
        # fact scan + shuffle run once
        .localCheckpoint(eager=True)
    )
    # r12 (guide §1.2 step 1, the order-statistics idiom made weighted):
    # the full keyed running sum computed a cumulative weight for EVERY
    # distinct price just to find THREE crossing rows. Same range
    # partitioning, but the per-(partition, flag) weight sums (a ~100-row
    # collect, the same trip the helper's carry table takes) locate each
    # flag's half-total crossing partition in the driver; the within-
    # partition running sum then runs only over those <=3 partition
    # slices, with the exact DECIMAL carry/total re-entering as literals.
    # The first qualifying row is IN the crossing partition (cumulative
    # weight only grows with price), so min(price) over it equals the
    # global selection; decimal addition is exact, so carry + within-cum
    # is bit-identical to the helper's global cum.
    from decimal import Decimal

    from ..operators.partitioning import _resolve_nparts

    nparts = _resolve_nparts(spark, None)
    ranged = (
        g.repartitionByRange(nparts, "flag", "price")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    per: dict = {}
    for r in ranged.groupBy("__pid", "flag").agg(F.sum("w").alias("ps")).collect():
        per.setdefault(r["flag"], []).append((r["__pid"], r["ps"]))
    tots, crossing, carries = {}, {}, {}
    for flag, lst in per.items():
        lst.sort()
        tot = sum((d for _, d in lst), Decimal(0))
        run = Decimal(0)
        for pid, d in lst:
            if 2 * (run + d) >= tot:
                crossing[flag], carries[flag] = pid, run
                break
            run += d
        tots[flag] = tot

    def _case(vals: dict, typ: str) -> str:
        return (
            "CASE "
            + " ".join(
                f"WHEN flag = '{f}' THEN CAST('{v}' AS {typ})"
                for f, v in vals.items()
            )
            + " END"
        )

    sel = ranged.where(
        F.expr(
            " OR ".join(
                f"(flag = '{f}' AND __pid = {pid})" for f, pid in crossing.items()
            )
        )
    )
    win = (
        Window.partitionBy("flag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sel.withColumn(
        "cum",
        F.sum("w").over(win) + F.expr(_case(carries, "DECIMAL(28,2)")),
    )
    return (
        cum.filter(F.lit(2) * F.col("cum") >= F.expr(_case(tots, "DECIMAL(28,2)")))
        .groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            F.min("price").cast("double").alias("w_median"),
            _d2dw(
                F.min(F.expr(_case(tots, "DECIMAL(28,2)"))).cast("decimal(28,2)"), 2
            ).alias("total_w"),
        )
    )


# ---------------------------------------------------------------------------
# session_max_concurrency
# ---------------------------------------------------------------------------

GAP_MS = 1_800_000  # 30-min session gap


@register(
    "session_max_concurrency",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, CAST(epoch_ms(ts) AS BIGINT) AS ms FROM events
),
g AS (
  SELECT user_id, ms, event_id,
         CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id)
                   > {GAP_MS} THEN 1 ELSE 0 END AS brk
  FROM e
),
s AS (
  SELECT user_id, ms,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM g
),
iv AS (SELECT user_id, sess, min(ms) AS t0, max(ms) AS t1 FROM s GROUP BY user_id, sess),
seg AS (
  SELECT unnest(generate_series(t0 // {DAY_MS}, t1 // {DAY_MS})) AS dayn, t0, t1
  FROM iv
),
cl AS (
  SELECT dayn, greatest(t0, dayn * {DAY_MS}) AS s0,
         least(t1, (dayn + 1) * {DAY_MS} - 1) AS s1
  FROM seg
),
bd AS (
  SELECT dayn, s0 AS tt, 0 AS phase, 1 AS delta FROM cl
  UNION ALL
  SELECT dayn, s1 AS tt, 1 AS phase, -1 AS delta FROM cl
),
net AS (
  SELECT dayn, tt, phase, CAST(sum(delta) AS BIGINT) AS net
  FROM bd GROUP BY dayn, tt, phase
),
run AS (
  SELECT dayn, phase, net,
         CAST(sum(net) OVER (PARTITION BY dayn ORDER BY tt, phase
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
  FROM net
)
SELECT dayn, CAST(max(run) AS BIGINT) AS max_conc,
       CAST(sum(CASE WHEN phase = 0 THEN net ELSE 0 END) AS BIGINT) AS n_sessions
FROM run GROUP BY dayn
""",
)
def session_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval-overlap: the maximum number of SIMULTANEOUS
    user sessions per day (capacity planning / load-envelope read), plus
    how many sessions touched the day. Sessions are 30-min-gap runs per
    user (per-user windows — bounded), clipped to day boundaries via an
    exploded day spine; each segment contributes a +1 at its start and a
    -1 at its end (closed intervals: starts sort before ends at the same
    millisecond, so a back-to-back handoff counts both sessions).
    Boundary deltas are pre-aggregated per (day, ts, phase) so the
    running sum is over a well-defined group sequence — and that running
    sum is the skew case again (31 day keys), so it rides
    ``distributed_keyed_running_sum``, not a 31-partition window."""
    e = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr(EV_MS).alias("ms")
    )
    wu = Window.partitionBy("user_id").orderBy("ms", "event_id")
    s = e.withColumn(
        "brk",
        F.when(F.col("ms") - F.lag("ms").over(wu) > GAP_MS, 1).otherwise(0),
    ).withColumn(
        "sess",
        F.sum("brk").over(wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    iv = s.groupBy("user_id", "sess").agg(
        F.min("ms").alias("t0"), F.max("ms").alias("t1")
    )
    cl = iv.select(
        F.explode(
            F.sequence(F.expr(f"t0 div {DAY_MS}"), F.expr(f"t1 div {DAY_MS}"))
        ).alias("dayn"),
        "t0",
        "t1",
    ).select(
        "dayn",
        F.greatest(F.col("t0"), F.col("dayn") * DAY_MS).alias("s0"),
        F.least(F.col("t1"), (F.col("dayn") + 1) * DAY_MS - 1).alias("s1"),
    )
    bd = cl.select(
        "dayn",
        F.explode(
            F.array(
                F.struct(
                    F.col("s0").alias("tt"),
                    F.lit(0).alias("phase"),
                    F.lit(1).alias("delta"),
                ),
                F.struct(
                    F.col("s1").alias("tt"),
                    F.lit(1).alias("phase"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("b"),
    ).select("dayn", "b.tt", "b.phase", "b.delta")
    net = bd.groupBy("dayn", "tt", "phase").agg(
        F.sum("delta").cast("long").alias("net")
    )
    run = distributed_keyed_running_sum(
        net, ["dayn"], [F.col("tt"), F.col("phase")], "net", out="run"
    )
    return run.groupBy("dayn").agg(
        F.max("run").cast("long").alias("max_conc"),
        F.sum(F.when(F.col("phase") == 0, F.col("net")).otherwise(0))
        .cast("long")
        .alias("n_sessions"),
    )
