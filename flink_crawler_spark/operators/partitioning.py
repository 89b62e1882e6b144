"""Explicit partitioning seams (K3 rebalance / K4 HashPartitioner).

Reference: ``functions/HashPartitioner.java:9-11`` — ``abs(key % n)``
over the domain hash key (``FlinkUtils.makeKeyForDomain``), used to pin
every URL of a domain onto one subtask so per-domain state and
politeness live executor-local.

Spark-first: ``repartition(n, col)`` IS that contract — a hash exchange
on the key, deterministic for a given partition count. The crawl loop
normally does NOT call this explicitly (its per-PLD windows already
imply hashpartitioning(pld) and Catalyst plans the exchange); the
explicit seam exists for writers that want domain-bucketed output files
and for pipelines that pre-partition once and reuse the layout across
several per-domain stages without re-shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_partition_by_domain(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Hash-exchange ``df`` on ``pld`` (K4). All rows of one domain land
    in exactly one partition — the co-location contract the reference's
    HashPartitioner provides for keyed domain state."""
    if num_partitions is not None:
        return df.repartition(num_partitions, F.col("pld"))
    return df.repartition(F.col("pld"))


def rebalance(df: DataFrame, num_partitions: int) -> DataFrame:
    """K3 ``rebalance()`` (CrawlTopologyBuilder.java:280) — break skew by
    round-robin redistribution before a parallel stage. Spark's
    ``repartition(n)`` without keys is the same round-robin exchange."""
    return df.repartition(num_partitions)


def _resolve_nparts(spark, nparts: int | None) -> int:
    """Explicit ``nparts`` wins (including 0 → treated as unset was a
    bug: 0 is rejected, None means unset); otherwise the session's
    shuffle-partition setting, falling back to ``defaultParallelism``
    when the conf value is non-numeric (e.g. ``auto``)."""
    if nparts is not None:
        if nparts <= 0:
            raise ValueError(f"nparts must be positive, got {nparts}")
        return nparts
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def distributed_row_number(
    df: DataFrame, order_cols, *, out: str = "rank", nparts: int | None = None
) -> DataFrame:
    """Global ``row_number()`` over ``order_cols`` WITHOUT a
    single-partition window — the two-phase distributed rank:

      1. ``repartitionByRange`` on the sort key (partition i's keys all
         precede partition i+1's);
      2. count rows per partition — a bounded driver round-trip of ONE
         value per partition, the same trip Spark's own RangePartitioner
         takes to sample boundaries;
      3. broadcast the exclusive offsets back and rank WITHIN each
         partition; global rank = partition offset + local row_number.

    A plain ``Window.orderBy`` serializes the whole input through one
    task; this shape holds at any cardinality (used by
    frontier_fairness_gini over 10^7-10^8 PLDs and ppjoin's token-rarity
    rank over the corpus vocabulary). The range-partitioned frame is
    pinned with one localCheckpoint because it is scanned twice
    (partition sizes + final rank) and range boundaries must not be
    resampled between the scans."""
    spark = df.sparkSession
    from pyspark.sql import Window

    nparts = _resolve_nparts(spark, nparts)
    ranged = (
        df.repartitionByRange(nparts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, running = [], 0
    for pid in range(nparts):
        offsets.append((pid, running))
        running += sizes.get(pid, 0)
    off = spark.createDataFrame(offsets, "__pid int, __rank_base long")
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(off), "__pid")
        .withColumn(out, F.col("__rank_base") + F.row_number().over(w))
        .drop("__pid", "__rank_base")
    )


def _materialize_keys(df: DataFrame, key_cols):
    """Project expression keys into real columns. The keyed-rank helpers
    groupBy/join on the key NAMES after a repartitionByRange; a Column
    expression that is not a plain column of ``df`` (e.g. ``F.lower(c)``)
    would derive a name that does not exist on the ranged frame. Returns
    ``(df, key_names, added)`` where ``added`` lists helper columns the
    caller must drop from its result.

    Only a bare string key rides the fast path. Any Column expression is
    materialized into a fresh ``__key{i}`` column — even one whose derived
    name already exists on ``df`` (``F.lower("grp").alias("grp")`` would
    otherwise silently rank by the RAW ``grp`` column instead of the
    expression)."""
    names, added = [], []
    for i, k in enumerate(key_cols):
        if isinstance(k, str) and k in df.columns:
            names.append(k)
            continue
        name = f"__key{i}"
        df = df.withColumn(name, F.col(k) if isinstance(k, str) else k)
        added.append(name)
        names.append(name)
    return df, names, added


def distributed_order_statistics(
    df: DataFrame, order_cols, positions, *, nparts: int | None = None
):
    """Exact values at the given 1-based global rank ``positions`` of
    ``df`` ordered by ``order_cols`` — the targeted sibling of
    ``distributed_row_number`` for when only a handful of order
    statistics are needed (r12, guide §1.2 step 1: don't compute things
    you throw away).

    Same two-phase structure (range partition -> per-partition counts ->
    offset ranks), but the per-partition rank window runs ONLY over the
    partitions that contain a requested position instead of sorting the
    whole table (measured on winsorized_mean_price: the full-table sort
    + full-table gather aggregate were ~2/3 of the query). Returns
    ``{position: Row}`` with the order columns of each found position;
    positions beyond the row count are absent (callers replicate the
    NULL-neighbor blend semantics). Also returns the exact total row
    count derived from the same partition counts, so callers drop their
    separate count() pass: ``({pos: Row}, n_rows)``. ``positions`` may
    be a callable ``n_rows -> [position]`` for ranks that depend on the
    total (e.g. conformal's ceil((n+1)*0.9)-th residual)."""
    spark = df.sparkSession
    from pyspark.sql import Window

    nparts = _resolve_nparts(spark, nparts)
    ranged = (
        df.repartitionByRange(nparts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n_rows = sum(sizes.values())
    if callable(positions):
        positions = positions(n_rows)
    offsets, running = {}, 0
    for pid in range(nparts):
        offsets[pid] = running
        running += sizes.get(pid, 0)
    want = sorted(p for p in positions if 1 <= p <= n_rows)
    pids = set()
    for p in want:
        for pid in range(nparts):
            if offsets[pid] < p <= offsets[pid] + sizes.get(pid, 0):
                pids.add(pid)
                break
    if not pids:
        return {}, n_rows
    off = spark.createDataFrame(
        [(pid, offsets[pid]) for pid in sorted(pids)], "__pid int, __rank_base long"
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    found = (
        ranged.filter(F.col("__pid").isin(*[int(p) for p in pids]))
        .join(F.broadcast(off), "__pid")
        .withColumn("__rn", F.col("__rank_base") + F.row_number().over(w))
        .filter(F.col("__rn").isin(*[int(p) for p in want]))
        .drop("__pid", "__rank_base")
        .collect()
    )
    return {int(r["__rn"]): r for r in found}, n_rows


def distributed_keyed_row_number(
    df: DataFrame, key_cols, order_cols, *, out: str = "rank", nparts: int | None = None
) -> DataFrame:
    """``row_number() OVER (PARTITION BY key ORDER BY order_cols)``
    WITHOUT a per-key single-task sort — the keyed twin of
    ``distributed_row_number`` for when one key dominates (at web scale
    one language holds half the corpus; ``Window.partitionBy(lang)``
    would pull those rows through one task).

      1. ``repartitionByRange`` on (key, order): a key's rows occupy a
         CONTIGUOUS run of partitions, sorted;
      2. count rows per (partition, key) — a distributed aggregate, no
         driver collect of per-key state;
      3. a key needs a nonzero offset only in partitions AFTER the first
         one it appears in — at most (nparts - 1) boundary-spanning
         entries exist in total, so the offset table is broadcast-sized
         by construction regardless of key cardinality;
      4. rank within (partition, key) + broadcast offset.
    """
    spark = df.sparkSession
    from pyspark.sql import Window

    df, key_names, added = _materialize_keys(df, key_cols)
    nparts = _resolve_nparts(spark, nparts)
    ranged = (
        df.repartitionByRange(nparts, *key_names, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    cnt = ranged.groupBy("__pid", *key_names).agg(F.count(F.lit(1)).alias("__cnt"))
    wk = (
        Window.partitionBy(*key_names)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        cnt.withColumn("__rank_base", F.coalesce(F.sum("__cnt").over(wk), F.lit(0)))
        .filter(F.col("__rank_base") > 0)
        .select("__pid", *key_names, "__rank_base")
    )
    w = Window.partitionBy("__pid", *key_names).orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(spans), ["__pid", *key_names], "left")
        .withColumn(
            out, F.coalesce(F.col("__rank_base"), F.lit(0)) + F.row_number().over(w)
        )
        .drop("__pid", "__rank_base", *added)
    )


def distributed_keyed_running_sum(
    df: DataFrame, key_cols, order_cols, value_col: str, *, out: str = "run_sum",
    nparts: int | None = None
) -> DataFrame:
    """INCLUSIVE ``sum(value) OVER (PARTITION BY key ORDER BY order_cols)``
    WITHOUT a per-key single-task sort — the prefix-SUM sibling of
    ``distributed_keyed_row_number``, for running sums whose key has few
    or skewed values (a per-returnflag cumulative weight has THREE keys;
    ``Window.partitionBy(flag)`` would pull a third of the fact table
    through one task):

      1. ``repartitionByRange`` on (key, order): a key's rows occupy a
         CONTIGUOUS sorted run of partitions;
      2. sum per (partition, key) — a distributed aggregate;
      3. a key carries a nonzero base only into partitions AFTER the
         first one it appears in — at most (nparts - 1) boundary-spanning
         entries total, so the carry table is broadcast-sized regardless
         of key cardinality;
      4. per-(partition, key) inclusive window sum + broadcast carry.
    """
    spark = df.sparkSession
    from pyspark.sql import Window

    df, key_names, added = _materialize_keys(df, key_cols)
    nparts = _resolve_nparts(spark, nparts)
    ranged = (
        df.repartitionByRange(nparts, *key_names, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    psum = ranged.groupBy("__pid", *key_names).agg(F.sum(value_col).alias("__psum"))
    wk = (
        Window.partitionBy(*key_names)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        psum.withColumn("__carry", F.sum("__psum").over(wk))
        .filter(F.col("__carry").isNotNull())
        .select("__pid", *key_names, "__carry")
    )
    w = (
        Window.partitionBy("__pid", *key_names)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(spans), ["__pid", *key_names], "left")
        .withColumn(
            out,
            F.sum(value_col).over(w)
            + F.coalesce(F.col("__carry"), F.lit(0).cast(ranged.schema[value_col].dataType)),
        )
        .drop("__pid", "__carry", *added)
    )


def distributed_running_max(
    df: DataFrame, order_cols, value_col: str, *, out: str = "run_max",
    nparts: int | None = None
) -> DataFrame:
    """EXCLUSIVE global running max of ``value_col`` over ``order_cols``
    (max over rows strictly earlier in the order; NULL for the first
    row) WITHOUT a single-partition window — the prefix-MAX sibling of
    ``distributed_row_number``:

      1. ``repartitionByRange`` on the order key;
      2. one max per partition — a bounded driver round-trip;
      3. broadcast each partition's EXCLUSIVE carry-in (the max over
         all earlier partitions) and combine with a per-partition
         exclusive window max via null-skipping ``greatest``.

    Powers skyline/Pareto frontiers (the strictly-dominating running
    max over a sorted value domain) at cardinalities where
    ``Window.orderBy`` would serialize the input through one task."""
    from pyspark.sql import Window
    from pyspark.sql.types import IntegerType, StructField, StructType

    spark = df.sparkSession
    nparts = _resolve_nparts(spark, nparts)
    ranged = (
        df.repartitionByRange(nparts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    pmax = {
        r["__pid"]: r["mx"]
        for r in ranged.groupBy("__pid").agg(F.max(value_col).alias("mx")).collect()
    }
    vtype = ranged.schema[value_col].dataType
    carry, run = [], None
    for pid in range(nparts):
        carry.append((pid, run))
        m = pmax.get(pid)
        if m is not None and (run is None or m > run):
            run = m
    carry_df = spark.createDataFrame(
        carry,
        StructType(
            [
                StructField("__pid", IntegerType(), False),
                StructField("__carry", vtype, True),
            ]
        ),
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.join(F.broadcast(carry_df), "__pid")
        .withColumn(out, F.greatest(F.max(value_col).over(w), F.col("__carry")))
        .drop("__pid", "__carry")
    )
