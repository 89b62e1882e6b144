"""SparkSession factory + table loaders.

Local test profile is local[N] single-JVM; the configs below are chosen
so the same code scales to a real cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), shuffle partitions sized to
cores locally (override via spark.sql.shuffle.partitions for a cluster),
Arrow enabled for every Python<->JVM crossing, UTC session timezone so
results are reproducible against any oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(app_name: str = "flink_crawler_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # A multi-hundred-query session generates thousands of Janino
        # classes.  Near the JVM's default 240 MB code-cache ceiling the
        # sweeper churns still-warm compiled methods (no "CodeCache is
        # full" warning is ever printed — measured in SCALE.md, commit
        # 341eab5), costing ~12% of suite runtime with heavy-tailed
        # per-query spikes.  512 MB keeps warm methods resident for the
        # whole 282-query bench.
        #
        # Launch-mode caveat: builder-set driver extraJavaOptions only
        # take effect when THIS process launches the JVM.  Under
        # spark-submit or a pre-existing gateway this is a silent no-op —
        # set the flag in spark-defaults.conf / --driver-java-options
        # there.  _log_code_cache_size() below makes a no-op visible.
        .config(
            "spark.driver.extraJavaOptions",
            # Append (not replace) any user-supplied JVM flags so an
            # unrelated export (e.g. GC tuning) doesn't silently drop
            # the code-cache sizing.  A user ReservedCodeCacheSize wins:
            # on duplicate -XX flags the JVM honours the last one.
            (
                "-XX:ReservedCodeCacheSize=512m "
                + os.environ.get("SPARK_DRIVER_JAVA_OPTS", "")
            ).strip(),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # r12 (optimization round, guide §3.1): let the planner pick
        # shuffled-hash over sort-merge when its size conditions hold
        # (build side < shuffle-partition-count x threshold), and let AQE
        # rewrite a planned SMJ to SHJ at runtime when every post-shuffle
        # partition is under 64 MB — skipping both sort passes. Measured
        # (tools/spot_bench.py, 3-rep min, sf0.1): hits_hub_authority
        # 5.66->4.46 s, rfm_user_segments 4.03->3.14, graph_jaccard
        # 9.95->8.44, ppjoin_pairs 5.31->4.54, weighted_median 3.65->3.25;
        # -10.6% over the 8-query join-heavy A/B set, no regressions
        # outside noise. Scale-safe: both knobs are size-GATED (the 64 MB
        # per-partition bound caps build-side hash maps exactly like a
        # broadcast threshold does), not local-core tuning; override via
        # SPARK_GRAFT_EXTRA_CONF on memory-tight clusters.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(64 * 1024 * 1024),
        )
        # NOTE: deliberately NOT setting spark.sql.legacy.parquet.nanosAsLong.
        # With it, a TIMESTAMP(NANOS) testdata regeneration would silently
        # read ts as BIGINT nanos and every cast(ts as timestamp_ltz) would
        # interpret nanos as seconds — garbage epochs far from the cause.
        # Without it, such a physical-type change fails fast at scan time.
    )
    # A/B-probe / deployment seam: extra confs from the environment, e.g.
    # SPARK_GRAFT_EXTRA_CONF="spark.speculation=true;spark.speculation.quantile=0.9"
    # (";"-separated — conf VALUES may contain commas). Builder confs only
    # bind when this process launches the JVM, same caveat as above.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in filter(None, (s.strip() for s in extra.split(";"))):
        k, sep, v = kv.partition("=")
        if not sep or not k.strip():
            # r12 (ADVICE): a segment without '=' used to be applied as
            # config(key, "") — a typo'd A/B probe silently set an
            # empty-string conf instead of surfacing. Fail loudly.
            raise ValueError(
                f"SPARK_GRAFT_EXTRA_CONF segment {kv!r} is not key=value"
            )
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    _log_code_cache_size(spark)
    return spark


def _log_code_cache_size(spark: SparkSession) -> None:
    """Print the JVM's effective code-cache reservation once per process.

    Builder-set extraJavaOptions silently no-op when the JVM pre-exists
    this Python process (spark-submit, shared gateway); surfacing the
    real reservation makes that visible instead of reappearing as the
    ~12% late-run sweeper-churn degradation documented in SCALE.md.
    """
    global _code_cache_logged
    if _code_cache_logged:
        return
    _code_cache_logged = True
    try:
        pools = (
            spark._jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()  # type: ignore[union-attr]
        )
        total = 0
        for i in range(pools.size()):
            pool = pools.get(i)
            name = pool.getName()
            # JDK 9+ segments the cache into three CodeHeap pools; older
            # JVMs expose a single "CodeCache" pool.
            if "CodeHeap" in name or name == "CodeCache":
                # getMax() is documented to return -1 when the pool has
                # no defined max; skip those rather than undercounting
                m = pool.getUsage().getMax()
                if m > 0:
                    total += m
        if total:
            import sys as _sys

            # stderr, NOT stdout: bench.py's contract is ONE JSON line
            # on stdout and the driver parses it
            mb = total // (1024 * 1024)
            print(
                f"[flink_crawler_spark] JVM code cache reserved: {mb} MB",
                file=_sys.stderr,
                flush=True,
            )
            if mb < 384:
                print(
                    "[flink_crawler_spark] WARNING: code cache < 384 MB — the "
                    "512m builder flag did not reach this JVM (pre-existing "
                    "gateway / spark-submit?). Expect ~12% late-run slowdown "
                    "on multi-hundred-plan sessions; set "
                    "-XX:ReservedCodeCacheSize=512m in --driver-java-options.",
                    file=_sys.stderr,
                    flush=True,
                )
    except Exception:
        pass  # diagnostics only — never fail session creation


_code_cache_logged = False


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load the star-schema parquet tables and register temp views.

    Plain ``spark.read.parquet`` so Catalyst gets full pushdown/pruning
    into the scan; views let queries be written in SQL where clearer.
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
