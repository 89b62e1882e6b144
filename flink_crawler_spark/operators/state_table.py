"""Bucketed crawl-state table — the durable URL DB at 100 TB.

The reference keeps the URL DB in Flink keyed MapState
(functions/UrlDBFunction.java:94-139); the batch-loop engine keeps it
as data. At bench scale a plain parquet path suffices
(plans/crawl_loop.py state_dir); at 100 B tracked URLs the state table
must be BUCKETED by the merge key so the per-tick merge never shuffles
the state side:

  * saved via ``bucketBy(n, "url").sortBy("url")`` — Spark records the
    bucketing in the catalog and every scan reports
    ``outputPartitioning = HashPartitioning(url, n)``
  * ``merge_updates_join`` (operators/merge.py) then plans as a
    bucket-local sort-merge join: the only Exchange is the small
    per-tick delta's, and a ``groupBy("url")`` over the state is
    Exchange-free

Pick ``buckets`` so one bucket ~ a few GB at target scale (e.g. 16384
buckets for a 30 TB state table); the bucket count is a physical-layout
constant the table keeps for life, so size it for the END state of the
crawl, not the seed list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed_state(state: DataFrame, table: str, *, buckets: int = 64) -> None:
    """Persist the crawl state as a bucketed+sorted catalog table."""
    (
        state.write.mode("overwrite")
        .bucketBy(buckets, "url")
        .sortBy("url")
        .format("parquet")
        .saveAsTable(table)
    )


def load_bucketed_state(spark: SparkSession, table: str) -> DataFrame:
    """Read the bucketed state; scans report HashPartitioning(url, n) so
    downstream key-aligned joins/aggregations skip their Exchange.

    Recovery: if a tick crashed between the two renames in
    ``tick_merge_bucketed``, the previous state survives as
    ``<table>__old`` — restore it."""
    if not spark.catalog.tableExists(table) and spark.catalog.tableExists(f"{table}__old"):
        spark.sql(f"ALTER TABLE {table}__old RENAME TO {table}")
        # the rename can leave a cached relation with a stale file
        # listing (FAILED_READ_FILE.FILE_NOT_EXIST on the next scan)
        spark.catalog.refreshTable(table)
    # NOTE: no unconditional refreshTable here — refreshing cascades an
    # eviction through every cached frame that references the table,
    # which would wipe the crawl tick's persisted caches on each merge
    # read. The swap paths (tick_merge_bucketed / compact_state_log)
    # refresh explicitly after their renames instead.
    return spark.table(table)


def tick_merge_bucketed(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    *,
    buckets: int = 64,
    merged_transform=None,
    tick: int | None = None,
    now_ms: int | None = None,
) -> DataFrame:
    """One durable tick: join-merge the delta into the bucketed table and
    crash-safely replace it (write to a staging table, rename the old
    state aside, swap, drop the backup — every crash window leaves a
    recoverable table). Returns the new state frame.

    ``merged_transform`` (optional) decorates the merged frame before the
    write — the crawl loop uses it to attach ``df.observe`` status
    counters so per-tick metrics ride the state write job instead of
    costing a second action.

    ``tick`` (optional) is stamped as the ``crawl.tick`` property on the
    STAGING table BEFORE the swap: saveAsTable creates the staging table
    without properties, so stamping after the swap would leave a crash
    window in which the new state resumes at tick 0 (regressed now_ms,
    wrong politeness windows). Stamped-before-rename, the property and
    the data move atomically together."""
    from .merge import merge_updates_join

    # read the LOG VIEW, not just the base: a table previously run in
    # log mode may carry committed-but-uncompacted delta ticks — merging
    # from the bare base would silently drop them. With no pending
    # deltas this is exactly the base scan.
    state = read_state_log(spark, table)
    merged = merge_updates_join(state, updates)
    if merged_transform is not None:
        merged = merged_transform(merged)
    staging = f"{table}__staging"
    save_bucketed_state(merged, staging, buckets=buckets)
    if tick is not None:
        set_state_tick(spark, staging, tick, now_ms=now_ms)
        # the swap folds any pending deltas too — advance the base marker
        spark.sql(
            f"ALTER TABLE {staging} SET TBLPROPERTIES ('crawl.base_tick'='{int(tick)}')"
        )
    # crash-safe swap: the old state is renamed aside (recoverable) before
    # the staging table takes the name; only then is the backup dropped.
    # A crash in any window leaves either <table> or <table>__old existing
    # — load_bucketed_state restores from __old automatically.
    old = f"{table}__old"
    spark.sql(f"DROP TABLE IF EXISTS {old}")
    spark.sql(f"ALTER TABLE {table} RENAME TO {old}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    spark.sql(f"DROP TABLE IF EXISTS {old}")
    spark.catalog.refreshTable(table)  # drop the pre-swap file listing
    if tick is not None:
        _sweep_deltas(spark, table, up_to=tick)
    return load_bucketed_state(spark, table)


def set_state_tick(
    spark: SparkSession, table: str, tick: int, *, now_ms: int | None = None
) -> None:
    """Record the completed tick number (and, optionally, the simulated
    clock) on the state table itself, so a restarted crawl resumes at
    the right now_ms — including refetch-mode clock jumps, which a
    tick-count-derived clock would silently rewind (the batch-loop
    analogue of the reference's checkpointed iteration counter)."""
    props = f"'crawl.tick'='{int(tick)}'"
    if now_ms is not None:
        props += f", 'crawl.now_ms'='{int(now_ms)}'"
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({props})")


def get_state_tick(spark: SparkSession, table: str) -> int:
    """Completed-tick number stored on the table; 0 when unset."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    props = {r["key"]: r["value"] for r in rows}
    return int(props.get("crawl.tick", 0))


def get_state_now_ms(spark: SparkSession, table: str) -> int | None:
    """Persisted simulated clock; None when unset (pre-clock tables)."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    props = {r["key"]: r["value"] for r in rows}
    v = props.get("crawl.now_ms")
    return int(v) if v is not None else None


# ---------------------------------------------------------------------------
# LSM-style delta log: per-tick writes are O(delta), not O(state)
# ---------------------------------------------------------------------------
#
# tick_merge_bucketed keeps the merge COMPUTE delta-only but still
# REWRITES the whole table every tick (plain parquet has no row-level
# MERGE). The log backend removes that: each tick appends ONE small
# bucketed delta table (`<table>__delta_t<N>`), reads view the state as
# base ⋈ merge(deltas) — still a bucket-local join, both sides bucketed
# by url — and every `compact_every` ticks the view is folded back into
# the base with the same crash-safe swap. Per-tick write cost is
# O(delta); the full rewrite is amortized 1/compact_every. This is the
# LSM/merge-on-read layout Delta/Iceberg implement natively; on plain
# parquet the per-tick delta TABLE (not append) keeps exactly-once:
# the base's crawl.tick property is the authoritative marker, a crash
# between delta-create and marker-set leaves an orphan delta that the
# re-run of the same tick drops and recreates.


def _sweep_deltas(spark: SparkSession, table: str, *, up_to: int) -> None:
    """Drop every folded delta table (t <= up_to) by prefix listing, so
    orphans from a crash between a swap and its drops are also swept."""
    import re as _re

    pref = f"{table}__delta_t"
    # SHOW TABLES LIKE, not catalog.listTables(): the latter decodes
    # every table's full metadata (and trips EXPRESSION_DECODING_FAILED
    # on some temp-view mixes); the SQL listing returns bare names
    for r in spark.sql(f"SHOW TABLES LIKE '{pref}*'").collect():
        name = r["tableName"]
        m = _re.fullmatch(_re.escape(pref) + r"(\d+)", name)
        if m and int(m.group(1)) <= up_to:
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def _base_tick(spark: SparkSession, table: str) -> int:
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    props = {r["key"]: r["value"] for r in rows}
    return int(props.get("crawl.base_tick", 0))


def tick_append_log(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    *,
    buckets: int,
    tick: int,
    now_ms: int | None = None,
) -> None:
    """One log-mode tick: write this tick's pre-merged delta as its own
    bucketed table, then flip the authoritative tick marker."""
    from .merge import merge_crawl_state, OBS_COLS

    delta = merge_crawl_state(updates.select(*OBS_COLS))
    dt = f"{table}__delta_t{tick}"
    # re-running a crashed tick replaces its orphan delta: exactly-once
    spark.sql(f"DROP TABLE IF EXISTS {dt}")
    save_bucketed_state(delta, dt, buckets=buckets)
    set_state_tick(spark, table, tick, now_ms=now_ms)


def read_state_log(
    spark: SparkSession, table: str, *, at_tick: int | None = None
) -> DataFrame:
    """The merged state view: base ⋈ merge(committed deltas). Lazy —
    evaluated by whatever job consumes it (the crawl loop's frontier
    scan). Orphan deltas past the marker are ignored.

    ``at_tick`` reads the state AS OF that tick (time travel): the base
    holds everything up to ``crawl.base_tick``, so any tick between the
    last compaction and the marker is reconstructable by folding only
    the delta prefix — the free audit/debug dividend of the LSM layout
    (what did the URL DB say before the tick that went wrong?).
    History older than the base is compacted away: ``at_tick`` below
    ``crawl.base_tick`` raises, as does a tick past the marker. The
    retention window is exactly ``state_log_every`` ticks — size it for
    the audit horizon you want.

    All pending deltas fold through ONE delta-sized groupBy-merge and
    ONE bucket-local join with the base, so the per-scan cost is
    O(state) + O(sum-of-deltas) regardless of how many ticks have
    passed since the last compaction (the lattice is order- and
    partitioning-independent — property-pinned in
    test_merge_lattice_laws — so the k-way fold equals the pairwise
    one). An earlier pairwise implementation chained one join per
    pending delta: measured +~0.5 s/tick of read amplification PER
    uncompacted tick (tools/state_log_ab.py). The deltas are read as
    plain parquet FILES, not catalog tables: a Union of co-bucketed
    table scans falsely advertises the children's HashPartitioning
    while owning the concatenated partition count (zip crash /
    missing-exchange hazard); file scans claim no partitioning, and the
    tiny delta union then shuffles normally into the merge."""
    from .merge import OBS_COLS, merge_crawl_state, merge_updates_join

    base = load_bucketed_state(spark, table)
    b0 = _base_tick(spark, table)
    tick = get_state_tick(spark, table)
    if at_tick is not None:
        if at_tick < b0:
            raise ValueError(
                f"state history before tick {b0} is compacted away "
                f"(requested at_tick={at_tick}; raise state_log_every to "
                f"widen the retention window)"
            )
        if at_tick > tick:
            raise ValueError(
                f"at_tick={at_tick} is past the committed marker ({tick})"
            )
        tick = at_tick
    files: list[str] = []
    for t in range(b0 + 1, tick + 1):
        dt = f"{table}__delta_t{t}"
        if spark.catalog.tableExists(dt):
            files.extend(spark.table(dt).inputFiles())
    if not files:
        return base
    deltas = spark.read.parquet(*files).select(*OBS_COLS)
    return merge_updates_join(base, merge_crawl_state(deltas))


def compact_state_log(
    spark: SparkSession, table: str, *, buckets: int, merged_transform=None
) -> DataFrame:
    """Fold the committed deltas into the base with the crash-safe swap,
    advance crawl.base_tick, and drop the folded delta tables."""
    b0 = _base_tick(spark, table)
    tick = get_state_tick(spark, table)
    if tick <= b0:
        return load_bucketed_state(spark, table)
    merged = read_state_log(spark, table)
    if merged_transform is not None:
        merged = merged_transform(merged)
    staging = f"{table}__staging"
    save_bucketed_state(merged, staging, buckets=buckets)
    # carry ALL markers on the staging table so they swap with the data —
    # including the persisted simulated clock: dropping crawl.now_ms here
    # would rewind a refetch-mode crawl that stops on a compaction
    # boundary to start_ms + tick*tick_ms, re-deriving its timer-sleep
    # jumps (the regression the clock-persistence fix closed).
    set_state_tick(spark, staging, tick, now_ms=get_state_now_ms(spark, table))
    spark.sql(
        f"ALTER TABLE {staging} SET TBLPROPERTIES ('crawl.base_tick'='{int(tick)}')"
    )
    old = f"{table}__old"
    spark.sql(f"DROP TABLE IF EXISTS {old}")
    spark.sql(f"ALTER TABLE {table} RENAME TO {old}")
    spark.sql(f"ALTER TABLE {staging} RENAME TO {table}")
    spark.sql(f"DROP TABLE IF EXISTS {old}")
    spark.catalog.refreshTable(table)  # drop the pre-swap file listing
    _sweep_deltas(spark, table, up_to=tick)
    return load_bucketed_state(spark, table)
