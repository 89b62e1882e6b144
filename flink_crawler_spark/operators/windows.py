"""Windowed aggregations: moving averages, fetch-rate, politeness lag.

Reference:
  * ``functions/MovingAverageFunction.java:14-51`` +
    ``MovingAverageAccumulator.java:6-39`` — per-PLD mean of the last 10
    scores (count-based sliding window over arrival order).
  * ``functions/FetchUrlsFunction.java:169-224`` — ``TimedCounter`` 30 s
    ring buffer -> fetches/sec gauge.
  * ``functions/FetchUrlsFunction.java:88-97`` — per-domain politeness:
    next allowed fetch time = previous fetch + crawl_delay.

All three are exact Spark window functions — no state machinery needed in
batch mode. (The Structured Streaming variants live in streaming/.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def moving_average(
    df: DataFrame,
    *,
    key: str = "pld",
    order: str = "seq",
    value: str = "score",
    window_size: int = 10,
    out: str = "moving_avg",
) -> DataFrame:
    """Count-based sliding mean — ROWS BETWEEN (n-1) PRECEDING AND CURRENT."""
    w = Window.partitionBy(key).orderBy(order).rowsBetween(-(window_size - 1), 0)
    return df.withColumn(out, F.avg(value).over(w))


def rate_over_window(
    df: DataFrame,
    *,
    ts: str = "ts",
    key: str | None = None,
    range_seconds: int = 30,
    out: str = "events_in_window",
) -> DataFrame:
    """Sliding event-count over a trailing time range (TimedCounter analogue).

    Numeric RANGE frame over epoch seconds — portable to any SQL engine.
    """
    epoch = F.unix_timestamp(F.col(ts)).alias("__epoch")
    base = df.withColumn("__epoch", epoch)
    w = Window.orderBy("__epoch").rangeBetween(-range_seconds, 0)
    if key:
        w = Window.partitionBy(key).orderBy("__epoch").rangeBetween(-range_seconds, 0)
    return base.withColumn(out, F.count(F.lit(1)).over(w)).drop("__epoch")


def politeness_gaps(
    df: DataFrame,
    *,
    key: str = "pld",
    ts: str = "fetch_time",
    min_gap_ms: int | None = None,
    out: str = "gap_ms",
) -> DataFrame:
    """Per-domain as-of gap to the previous fetch (lag window).

    With ``min_gap_ms`` set, adds a ``violates_delay`` flag — the batch
    analogue of the reference's SKIPPED_CRAWLDELAY decision.
    """
    w = Window.partitionBy(key).orderBy(ts)
    res = df.withColumn(out, F.col(ts) - F.lag(ts).over(w))
    if min_gap_ms is not None:
        res = res.withColumn(
            "violates_delay", F.coalesce(F.col(out) < F.lit(min_gap_ms), F.lit(False))
        )
    return res


def status_counts(crawl_state: DataFrame) -> DataFrame:
    """Per-status row counts (metrics/CounterUtils.java:64-146 observable form)."""
    return crawl_state.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: tuple[str, ...],
) -> DataFrame:
    """As-of (backward) join: each left row picks the right row with the
    greatest ``right_ts`` <= ``left_ts`` for the same key.

    The classic feature-store / point-in-time-correctness operator
    (generalizes the politeness as-of lookup J4). Spark has no ASOF
    JOIN; a range join would explode. This is the scalable idiom: union
    both sides, ONE shuffle on the key, and a running `last_value(...,
    ignorenulls)` window carries the latest right payload forward onto
    left rows — O(1) window state per key, linear cost, no range
    explosion. Ties (left_ts == right_ts) match, like DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts`` (the oracle).
    """
    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__p"),
    )
    l_cols = [c for c in left.columns]
    l = left.select(
        *l_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    ).select(F.col(key), "__ts", "__side", "__p", *[c for c in l_cols if c != key])

    unioned = r.select(
        key, "__ts", "__side", "__p",
        *[F.lit(None).cast(dict(zip(l.schema.names, l.schema.fields))[c].dataType).alias(c)
          for c in l.columns if c not in (key, "__ts", "__side", "__p")],
    ).unionByName(l)

    # right rows sort before left rows at equal ts so ties match
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__match", F.last("__p", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1).drop("__side", "__p")
    for c in right_cols:
        out = out.withColumn(c, F.col(f"__match.{c}"))
    return out.drop("__match")


def salted_count_distinct(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per group via salting.

    COUNT DISTINCT has no map-side partial aggregation — a hot group
    funnels every one of its values through one task. Salting by a hash
    of the VALUE keeps exactness (each distinct value lands in exactly
    one bucket, so per-bucket distinct counts sum to the total) while
    spreading a hot group over ``buckets`` tasks. Two shuffles, both
    balanced — the standard skew-breaking shape for distinct aggregation
    at 100 TB.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets)).alias("__salt")
    partial = (
        df.select(F.col(group_col), F.col(value_col), salt)
        .groupBy(group_col, "__salt")
        .agg(F.count_distinct(F.col(value_col)).alias("__d"))
    )
    return partial.groupBy(group_col).agg(F.sum("__d").alias("n_distinct"))


# ---------------------------------------------------------------------------
# r7: bounded-frame cumulative helpers — WindowExec-free prefix aggregates
# ---------------------------------------------------------------------------

def _lex_strictly_before(order: list[tuple[str, bool]]):
    """Lexicographic '__r row sorts strictly before __l row' predicate for
    an order spec [(col, ascending)] — the join condition that replaces an
    unpartitioned Window's ordering.

    NULL-safe with Spark's Window ordering semantics (asc = NULLS FIRST,
    desc = NULLS LAST): a plain ``<`` would make NULL keys match nothing,
    silently dropping their rows from the cumsum's inner join and giving
    every NULL-key row rank 1 (r7 review finding)."""
    cond = F.lit(False)
    eqs = F.lit(True)
    for name, asc in order:
        lc, rc = F.col(f"__l.{name}"), F.col(f"__r.{name}")
        if asc:  # NULLS FIRST: a null sorts before every non-null
            step = (rc.isNull() & lc.isNotNull()) | (rc < lc)
        else:  # NULLS LAST: every non-null sorts before a null
            step = (lc.isNull() & rc.isNotNull()) | (rc > lc)
        cond = cond | (eqs & step)
        eqs = eqs & rc.eqNullSafe(lc)
    return cond


def bounded_row_number(df: DataFrame, order: list[tuple[str, bool]], *, out: str = "rn") -> DataFrame:
    """``row_number() OVER (ORDER BY ...)`` for a frame that is PROVABLY
    tiny (grouped-by-day tables, top-k heads, vocabularies): a triangular
    broadcast self-join counting strict predecessors instead of an
    unpartitioned WindowExec.

    Why not the window: a global ORDER BY window funnels the frame
    through ONE task and logs the single-partition WARN on every run —
    on frames bounded by construction the warning is pure noise that
    buries real ones (round-6 verdict task 7), and the O(n²) join on a
    ≤ a-few-hundred-row frame is cheaper than the window's sort +
    all-to-one exchange. The order spec must be a TOTAL order (include a
    unique tiebreaker), exactly like the window it replaces.

    Stronger consequence of the total-order requirement (r7 advice): the
    groupBy below keys on EVERY column of ``df``, so input rows must be
    whole-row DISTINCT — fully duplicate rows would merge into one
    output row with an inflated predecessor count (a window would have
    numbered them separately). A total order over the row implies
    distinctness, but callers adding non-ordering payload columns must
    not introduce duplicates. All columns must also be groupable types
    (no MapType).
    """
    assert out not in df.columns, f"output column {out!r} already in frame"
    names = [n for n, _ in order]
    left = df.alias("__l")
    # __one marks a MATCHED row: counting a (possibly NULL) key column
    # would undercount predecessors whose first key is NULL
    right = df.select(*names).withColumn("__one", F.lit(1)).alias("__r")
    strict = _lex_strictly_before(order)
    keep = [F.col(f"__l.{c}") for c in df.columns]
    return (
        left.join(F.broadcast(right), strict, "left")
        .groupBy(*keep)
        .agg((F.count(F.col("__r.__one")) + 1).cast("long").alias(out))
    )


def bounded_cumsum(
    df: DataFrame,
    order: list[tuple[str, bool]],
    sums: list[tuple[str, str, bool]],
    *,
    count_out: str | None = None,
) -> DataFrame:
    """Running sums over a provably tiny frame without a WindowExec:
    ``sums`` is [(src_col, out_col, inclusive)] — inclusive=True is
    ``ROWS UNBOUNDED PRECEDING..CURRENT ROW``, False stops at
    ``1 PRECEDING``. ``count_out`` optionally adds the inclusive running
    row count. One triangular broadcast self-join computes every
    requested prefix aggregate at once; decimal/long sums are exact and
    order-independent, so the values are bit-identical to the window's.
    The order spec must be a total order (unique tiebreaker); as with
    :func:`bounded_row_number`, the whole-row groupBy requires input
    rows to be whole-row distinct and every column groupable (no
    MapType) — duplicates would merge and inflate the prefix sums.
    """
    for _, out, _ in sums:
        assert out not in df.columns, f"output column {out!r} already in frame"
    names = [n for n, _ in order]
    src_cols = sorted({s for s, _, _ in sums})
    left = df.alias("__l")
    right = df.select(*names, *[c for c in src_cols if c not in names]).alias("__r")
    strict = _lex_strictly_before(order)
    eq = F.lit(True)
    for n in names:
        eq = eq & F.col(f"__r.{n}").eqNullSafe(F.col(f"__l.{n}"))
    keep = [F.col(f"__l.{c}") for c in df.columns]
    aggs = []
    for src, out, inclusive in sums:
        val = F.col(f"__r.{src}")
        aggs.append(
            F.sum(val if inclusive else F.when(strict, val)).alias(out)
        )
    if count_out is not None:
        aggs.append(F.count(F.lit(1)).cast("long").alias(count_out))
    return (
        left.join(F.broadcast(right), strict | eq, "inner")
        .groupBy(*keep)
        .agg(*aggs)
    )
