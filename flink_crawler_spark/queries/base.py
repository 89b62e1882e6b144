"""Query-pair registry plumbing."""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryPair:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


REGISTRY: dict[str, QueryPair] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QueryPair(fn=fn, oracle=oracle)
        return fn

    return deco


# r12 (guide §1.2): one spark.read.parquet costs 100-260 ms of
# driver-side work (py4j round trip + file listing + footer schema
# read) and the registry has ~310 call sites — ~45 s of the sf0.1
# bench was spent re-deriving the SAME immutable lazy scan handle.
# Memoize per (session, path): a DataFrame is an immutable logical
# plan, so reuse across queries changes nothing downstream (no data is
# cached — every action still scans the parquet), and keying on the
# session object drops the cache with the session. The corpora are
# immutable for a bench/oracle run (regenerating testdata means a new
# process), matching parquet_row_count's cache contract below.
_TABLE_HANDLE_CACHE: dict[tuple[SparkSession, str], DataFrame] = {}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table (plain parquet scan -> full pushdown)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (spark, path)
    df = _TABLE_HANDLE_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(path)
        _TABLE_HANDLE_CACHE[key] = df
    return df


_ROW_COUNT_CACHE: dict[str, int] = {}


def parquet_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of one star-schema table from parquet footer
    metadata — driver-side, zero Spark actions (replaces the
    `df.count()` job the r9 verdict flagged in the ANN path guards;
    parquet footers carry exact num_rows, so this is not an estimate).
    Cached per path for the session (the corpora are immutable)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    hit = _ROW_COUNT_CACHE.get(path)
    if hit is None:
        import pyarrow.dataset as ds

        hit = ds.dataset(path, format="parquet").count_rows()
        _ROW_COUNT_CACHE[path] = hit
    return hit


def ann_exact_path(sf_dir: str, max_exact_rows: int, *, query: str) -> bool:
    """Pick the ANN candidate path for the pair-mining queries: True =
    exact broadcast cross join, False = bucketed IVF candidate join
    (``ivf_probe_candidates``).

    ``FCS_ANN_CANDIDATES`` overrides explicitly (``exact`` |
    ``bucketed``); the default ``auto`` compares the embeddings table's
    TOTAL footer row count — both sides of a pair-mining split combined
    — against ``max_exact_rows``. When auto flips to bucketed it warns
    loudly: bucketed candidates are approximate (n_probe of n_lists
    lists), so a value-oracle run at that scale would mismatch by
    design and must either pin FCS_ANN_CANDIDATES=exact or accept the
    approximation (round-9 advice: the silent size switch was a latent
    oracle trap)."""
    mode = os.environ.get("FCS_ANN_CANDIDATES", "auto").lower()
    if mode == "exact":
        return True
    if mode == "bucketed":
        return False
    exact = parquet_row_count(sf_dir, "embeddings") <= max_exact_rows
    if not exact:
        import warnings

        warnings.warn(
            f"{query}: embeddings > {max_exact_rows} rows -> bucketed IVF "
            "candidate path (approximate: n_probe of n_lists). Value "
            "oracles will mismatch at this scale unless "
            "FCS_ANN_CANDIDATES=exact is set.",
            stacklevel=3,
        )
    return exact


def dsum(col, alias: str):
    """Exact order-independent sum of a double expression: round to 6dp,
    sum as DECIMAL(28,6), expose as DOUBLE — THE decimal discipline every
    oracle-compared sum uses (single definition; do not copy).

    ENGINE-IDENTITY BOUND (r11, caught by the first full sf1.0-equivalent
    magnitude gate): the final DECIMAL(28,6)->DOUBLE cast is bit-identical
    across engines only while |sum| * 1e6 < 2^53, i.e. |sum| < ~9.007e9.
    Above that, the scaled integer no longer fits a double: Spark
    correctly-rounds the true rational once (BigDecimal.doubleValue)
    while DuckDB rounds twice (int128->double, then /1e6) — a 1-ulp
    divergence that strikes probabilistically (measured: 3 of 62 sum
    columns drew it at sf1.0 revenue magnitudes ~3-6e10). Sums that can
    cross the bound use dsum_wide/DSUM_WIDE_SQL below."""
    from pyspark.sql import functions as F

    return F.sum(F.round(col, 6).cast("decimal(28,6)")).cast("double").alias(alias)


# Engine-identity bound of the floor-split wide sum: the integer part
# must fit a double exactly (2^53 = 9.007e15); guard with margin so the
# decimal-vs-double comparison itself can't straddle the true bound.
DSUM_WIDE_BOUND = 9.0e15


def dec_to_double_wide(s0, digits: int = 6):
    """Guarded floor-split DECIMAL->DOUBLE conversion of an aggregate
    (or window-aggregate, or re-aggregated-partial) decimal Column —
    the engine-identical replacement for ``.cast("double")`` on any
    decimal whose magnitude can cross 2^53/10^digits. Semantics and
    proof in ``dsum_wide``; twin: ``dec_to_double_wide_sql``."""
    from pyspark.sql import functions as F

    # r12 (verdict task 4): loud raise at the engine-identity bound —
    # the ewma/cusum guard idiom (lazy CASE, never fires in range;
    # tests/test_overflow_guards.py pins the raise_error semantics).
    # The DECIMAL(28,digits) pin after the guard is lossless wherever
    # the guard passes (|sum| < 9.0e15 = 16 int digits <= 28-digits for
    # digits <= 12) and keeps the floor-split subtraction below Spark's
    # 38-digit cap for every scale in use (2/6/8/9/12): floor(D(28,d))
    # -> D(29-d,0), s - i -> D(30,d) exact — no silent scale reduction.
    s = (
        F.when(
            F.abs(s0) >= F.lit(DSUM_WIDE_BOUND),
            F.raise_error(
                F.lit(
                    "dsum_wide: |sum| >= 9.0e15 breaches the 2^53 "
                    "floor-split engine-identity bound; rescale the input"
                )
            ),
        )
        .otherwise(s0)
        .cast(f"decimal(28,{digits})")
    )
    i = F.floor(s)
    return i.cast("double") + (s - i).cast("double")


def dec_to_double_wide_sql(s0: str, digits: int = 6) -> str:
    """DuckDB twin of dec_to_double_wide: ``s0`` is the SQL text of the
    decimal aggregate / window expression (engines dedupe the repeated
    identical aggregate)."""
    s = (
        f"CAST(CASE WHEN abs({s0}) >= 9.0e15 THEN error("
        f"'dsum_wide: |sum| >= 9.0e15 breaches the 2^53 floor-split "
        f"engine-identity bound; rescale the input') "
        f"ELSE {s0} END AS DECIMAL(28,{digits}))"
    )
    return f"(CAST(floor({s}) AS DOUBLE) + CAST({s} - floor({s}) AS DOUBLE))"


def dsum_wide_expr(col, digits: int = 6, prec: int = 28):
    """Unaliased Column form of ``dsum_wide`` (for ratios / HAVING /
    divide-by-count composites). Semantics and proof in ``dsum_wide``."""
    from pyspark.sql import functions as F

    return dec_to_double_wide(
        F.sum(F.round(col, digits).cast(f"decimal({prec},{digits})")), digits
    )


def dsum_wide(col, alias: str, digits: int = 6, prec: int = 28):
    """dsum for sums that may exceed the 2^53/10^digits one-step-cast
    bound (revenue-scale aggregates): split the exact decimal sum at
    floor() — exact DECIMAL floor in BOTH engines (measured, incl.
    negatives and 17-digit values; the decimal->decimal CAST is NOT
    usable here: Spark rounds HALF_UP, DuckDB truncates) — convert each
    part to DOUBLE (each conversion is a single correctly-rounded op:
    the integer part is exact below 2^53, the scaled fraction is one
    k/10^digits division with k < 10^digits <= 1e12 < 2^53), and
    combine with ONE shared IEEE add — engine-identical up to
    |sum| < 2^53 ≈ 9.0e15 (sf ~1e5 at revenue magnitudes), and loudly
    guarded there (r12). ``digits``/``prec`` mirror each site's
    original per-row rounding discipline so per-row behavior is
    unchanged by the r12 sweep. The oracle twin is dsum_wide_sql; both
    sides must use the same form (the split differs from the one-step
    cast by double-rounding draws, so mixing forms across engines is
    itself a bug)."""
    return dsum_wide_expr(col, digits, prec).alias(alias)


def dsum_wide_expr_sql(expr: str, digits: int = 6, prec: int = 28) -> str:
    """DuckDB twin of dsum_wide_expr (unaliased, parenthesized)."""
    s0 = f"sum(CAST(round({expr}, {digits}) AS DECIMAL({prec},{digits})))"
    return dec_to_double_wide_sql(s0, digits)


def dsum_wide_sql(expr: str, alias: str, digits: int = 6, prec: int = 28) -> str:
    """DuckDB twin of dsum_wide for oracle f-strings."""
    return f"{dsum_wide_expr_sql(expr, digits, prec)} AS {alias}"


def ts_lit(s: str):
    """timestamp_ntz literal for date-filter pushdown."""
    from pyspark.sql import functions as F

    return F.lit(s).cast("timestamp_ntz")


def ts_millis(col):
    """Epoch millis from a parquet TIMESTAMP_NTZ column (UTC session)."""
    from pyspark.sql import functions as F

    return F.unix_millis(col.cast("timestamp_ltz"))


# events.ts is a parquet TIMESTAMP (micros, no tz) -> Spark TIMESTAMP_NTZ;
# with the UTC session these match duckdb's epoch_ms(ts) / epoch_ms(ts)//1000
EV_MS = "unix_millis(cast(ts as timestamp_ltz))"   # epoch millis
EV_SEC = "unix_seconds(cast(ts as timestamp_ltz))"  # epoch secs


# ---------------------------------------------------------------------------
# r7 (round-6 verdict task 5): the near-dup family's shared shingle base
# ---------------------------------------------------------------------------

_SHINGLE_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def shingle_tables(spark: SparkSession, sf_dir: str, n: int = 3):
    """Corpus-wide word-``n``-gram shingle tables, computed ONCE per
    (session, corpus) and memoized:

      sets — ``(doc_id, sh: sorted distinct array<string>)``, eagerly
             checkpointed (the r1 shingle-once refactor, generalized
             across the whole family);
      ex   — ``(doc_id, s)`` exploded view of ``sets``.

    near_dup_threshold_sweep / softdedup_loss_weights /
    ngram_novelty_score / coverage_budget_curve / the containment +
    calibration verifies all start from this identical structure; a
    production pipeline materializes it once per corpus snapshot instead
    of re-shingling per consumer. The checkpoint is session-lived and
    O(corpus shingles) — the same frame each query previously pinned
    privately."""
    from pyspark.sql import functions as F

    key = (spark, sf_dir, n)
    hit = _SHINGLE_CACHE.get(key)
    if hit is None:
        from ..operators import ensure_parallelism
        from ..operators.dedup import shingles_expr

        docs = ensure_parallelism(t(spark, sf_dir, "documents"))
        sets = docs.select(
            "doc_id", F.array_sort(shingles_expr(F.col("text"), n)).alias("sh")
        ).localCheckpoint(eager=True)
        ex = sets.select("doc_id", F.explode("sh").alias("s"))
        hit = (sets, ex)
        _SHINGLE_CACHE[key] = hit
    return hit


def clear_query_caches() -> None:
    """Drop every memoized family materialization (shingle base, cluster
    assignment, bigram-LM scores, merged crawl state). Two callers need
    this: measurement harnesses that must time each query's FULL cost
    (tools/scaling_curves.py clears between timed runs so a cache hit is
    never recorded as a query's scaling point), and any tool that
    rewrites a corpus directory mid-session (the caches key on the path,
    not the data). Dropping the references lets Spark's ContextCleaner
    reclaim the checkpointed blocks."""
    _SHINGLE_CACHE.clear()
    _ROW_COUNT_CACHE.clear()
    from . import core, dedupq, pipelineq3, pipelineq5, simq

    core._MERGED_STATE_CACHE.clear()
    dedupq._CLUSTER_CACHE.clear()
    dedupq._VERIFIED_PAIRS_CACHE.clear()
    dedupq._SIGS_CACHE.clear()
    pipelineq3._PQ_CORE_CACHE.clear()
    pipelineq5._BIGRAM_NLL_CACHE.clear()
    simq._IVF_CENT_CACHE.clear()
