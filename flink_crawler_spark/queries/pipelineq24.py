"""Wave 25: sketch calibration, robust means, banded anomaly alarms.

  * minhash_estimate_calibration — MinHash Jaccard estimate vs the
    exact shingle Jaccard on the LSH candidate pairs: the sketch-QA
    read that says how much to trust the 8-hash signature.
  * winsorized_mean_price — mean after clamping to the exact
    interpolated P5/P95 (the robust-mean alternative to trimming).
  * rolling_quantile_band_alarms — daily revenue vs its trailing
    28-day P10/P90 band: the rolling-quantile anomaly monitor.

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import lsh_candidate_pairs, minhash_signatures, ngram_jaccard
from .base import register, t
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws
from .dedupq import BANDS, DUCK_SHINGLES, DUCK_TOKS, NUM_HASHES, _buckets_sql, _sigs_sql

# ---------------------------------------------------------------------------
# minhash_estimate_calibration
# ---------------------------------------------------------------------------

_MH_MATCH = " + ".join(
    f"(CASE WHEN sa.mh{k} = sb.mh{k} THEN 1 ELSE 0 END)" for k in range(NUM_HASHES)
)


_MAE_SUM = (
    "sum(CAST(round(abs(jaccard_est - jaccard_exact), 9)"
    " AS DECIMAL(38,9)))"
)


@register(
    "minhash_estimate_calibration",
    oracle=f"""
WITH {_sigs_sql().strip()},
buckets AS (
{_buckets_sql()}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id < b.doc_id
),
shs AS (SELECT doc_id, {DUCK_SHINGLES} AS sh
        FROM (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents) x),
cal AS (
  SELECT p.id_a, p.id_b,
         CAST({_MH_MATCH} AS BIGINT) AS n_match,
         round(CAST({_MH_MATCH} AS DOUBLE) / {NUM_HASHES}, 6) AS jaccard_est,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6)
           AS jaccard_exact
  FROM pairs p
  JOIN sigs sa ON sa.doc_id = p.id_a
  JOIN sigs sb ON sb.doc_id = p.id_b
  JOIN shs a ON a.doc_id = p.id_a
  JOIN shs b ON b.doc_id = p.id_b
),
mae AS (
  SELECT round({_d2dws(_MAE_SUM, 9)} / count(*), 9) AS mae
  FROM cal
)
SELECT cal.id_a, cal.id_b, cal.n_match, cal.jaccard_est, cal.jaccard_exact,
       round(abs(cal.jaccard_est - cal.jaccard_exact), 6) AS abs_err,
       mae.mae
FROM cal CROSS JOIN mae
""",
)
def minhash_estimate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch QA for the dedup chain: on every LSH candidate pair, the
    MinHash Jaccard ESTIMATE (matching hashes / K) against the EXACT
    shingle Jaccard, with the global mean absolute error — the
    calibration read that says whether K=8 hashes is enough before the
    verify stage's threshold is trusted (pairs with near_dup_threshold
    _sweep, which tunes the threshold given exact values). Reuses the
    verified signature -> band -> bucket-join chain unchanged, so the
    candidate set is identical to production; the estimate is an exact
    integer ratio and the error aggregate is a rounded-once DECIMAL
    sum."""
    # r12 (guide §2.4): the memoized family signature table + exact
    # verify from the session-shared shingle base (bit-identical; see
    # minhash_sigs / ngram_jaccard_pairs)
    from ..operators.dedup import _jaccard_on_shingles
    from .base import shingle_tables
    from .dedupq import minhash_sigs

    sets, _ = shingle_tables(spark, sf_dir, 3)
    sigs = minhash_sigs(spark, sf_dir)
    pairs = lsh_candidate_pairs(sigs, num_hashes=NUM_HASHES, bands=BANDS)
    sa = sigs.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"mh{k}").alias(f"a{k}") for k in range(NUM_HASHES)]
    )
    sb = sigs.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"mh{k}").alias(f"b{k}") for k in range(NUM_HASHES)]
    )
    match = " + ".join(
        f"(CASE WHEN a{k} = b{k} THEN 1 ELSE 0 END)" for k in range(NUM_HASHES)
    )
    est = (
        pairs.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .selectExpr(
            "id_a",
            "id_b",
            f"CAST({match} AS BIGINT) AS n_match",
            f"round(CAST({match} AS DOUBLE) / {NUM_HASHES}, 6) AS jaccard_est",
        )
    )
    exact = _jaccard_on_shingles(sets, pairs, id_col="doc_id").select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard_exact")
    )
    # pin kept deliberately (r12 A/B): unpinned, the mae and output
    # branches each re-run the exact-verify array set ops per pair —
    # 7.3 s vs 2.1 s pinned. Exchange reuse only covers work BELOW the
    # exchanges; the per-pair array_intersect/union sits above them.
    cal = est.join(exact, ["id_a", "id_b"]).localCheckpoint(eager=True)
    mae = cal.agg(
        F.round(
            _d2dw(
                F.sum(
                    F.expr(
                        "CAST(round(abs(jaccard_est - jaccard_exact), 9)"
                        " AS DECIMAL(38,9))"
                    )
                ),
                9,
            )
            / F.count(F.lit(1)),
            9,
        ).alias("mae")
    )
    return cal.crossJoin(F.broadcast(mae)).selectExpr(
        "id_a",
        "id_b",
        "n_match",
        "jaccard_est",
        "jaccard_exact",
        "round(abs(jaccard_est - jaccard_exact), 6) AS abs_err",
        "mae",
    )


# ---------------------------------------------------------------------------
# winsorized_mean_price
# ---------------------------------------------------------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


@register(
    "winsorized_mean_price",
    oracle=f"""
WITH x AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS xc FROM lineitem),
q AS (
  SELECT quantile_cont(xc, {WINSOR_LO}) AS lo, quantile_cont(xc, {WINSOR_HI}) AS hi
  FROM x
),
w AS (
  SELECT CAST(round(greatest(q.lo, least(q.hi, CAST(x.xc AS DOUBLE))) / 100, 6)
              AS DECIMAL(38,6)) AS cl
  FROM x CROSS JOIN q
)
SELECT CAST(count(*) AS BIGINT) AS n,
       round((SELECT lo FROM q) / 100, 6) AS p05,
       round((SELECT hi FROM q) / 100, 6) AS p95,
       round({_d2dws('sum(cl)')} / count(*), 6) AS winsorized_mean
FROM w
""",
)
def winsorized_mean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of the lineitem price (clamp at the exact
    interpolated P5/P95, then average) — the robust location estimate
    that keeps every row's vote but caps outlier leverage (the
    complement of trimmed_mean_price_udaf, which drops the tails
    instead). Percentiles are exact interpolated quantiles on the
    integer cent domain (engine-identical, as the repo's percentile
    family already pins); clamped values are rounded once and
    DECIMAL-summed. Two passes over one column: the quantile aggregate
    (broadcast back as two scalars) and the clamped sum."""
    x = t(spark, sf_dir, "lineitem").selectExpr(
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS xc"
    )
    # exact interpolated quantiles WITHOUT the percentile() aggregate —
    # its merge concatenates every value into one buffer (the theil_sen
    # r6 finding: 600k+ values through a single task). r12 (guide §1.2
    # step 1): the previous distributed_row_number form sorted and
    # gather-scanned the WHOLE table to read 4 order statistics;
    # distributed_order_statistics ranks only the range partitions that
    # contain the requested positions, and the same count pass yields n.
    # The blend is the identical index = p*(n-1), x[lo]*(ceil-idx) +
    # x[hi]*(idx-floor) double arithmetic percentile() computes — done
    # on the collected exact integer cents in the SAME IEEE order, so
    # the quantile_cont oracle keeps matching bit-for-bit (the theil_sen
    # literal-re-entry precedent).
    import math

    from ..operators.partitioning import distributed_order_statistics
    from .base import parquet_row_count

    # footer row count (zero Spark jobs): x projects every lineitem row
    n = parquet_row_count(sf_dir, "lineitem")
    positions = [
        math.floor(p * (n - 1)) + k for p in (WINSOR_LO, WINSOR_HI) for k in (1, 2)
    ]
    probe, n_check = distributed_order_statistics(x, ["xc"], positions)
    assert n_check == n  # the footer count and the ranked count must agree

    def _blend(p: float) -> float:
        idx = p * float(n - 1)
        flo = math.floor(idx)
        vf = float(probe[flo + 1]["xc"])
        if math.ceil(idx) == flo:
            return vf
        vc = float(probe[flo + 2]["xc"])
        return vf * (float(math.ceil(idx)) - idx) + vc * (idx - float(flo))

    # CAST('<repr>' AS DOUBLE) re-enters each blend bit-identically
    # (Double.parseDouble of the shortest round-trip repr — the
    # facility_location literal idiom); a bare decimal literal would
    # type as DECIMAL and change the clamp arithmetic.
    lo, hi = f"CAST('{_blend(WINSOR_LO)!r}' AS DOUBLE)", f"CAST('{_blend(WINSOR_HI)!r}' AS DOUBLE)"
    w = x.select(
        F.expr(
            f"CAST(round(greatest({lo}, least({hi}, CAST(xc AS DOUBLE))) / 100, 6)"
            " AS DECIMAL(38,6)) AS cl"
        ),
    )
    return w.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(_d2dw(F.sum("cl")) / F.count(F.lit(1)), 6).alias(
            "winsorized_mean"
        ),
    ).selectExpr(
        "n",
        f"round({lo} / 100, 6) AS p05",
        f"round({hi} / 100, 6) AS p95",
        "winsorized_mean",
    )


# ---------------------------------------------------------------------------
# rolling_quantile_band_alarms
# ---------------------------------------------------------------------------

BAND_WINDOW = 28
BAND_LO = 0.10
BAND_HI = 0.90


@register(
    "rolling_quantile_band_alarms",
    oracle=f"""
WITH d AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_idx,
         CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
  FROM orders GROUP BY 1
),
bands AS (
  SELECT a.day_idx, min(a.rev) AS rev,
         CAST(count(*) AS BIGINT) AS n_window,
         quantile_cont({_d2dws('b.rev', 2)}, {BAND_LO}) AS p_lo,
         quantile_cont({_d2dws('b.rev', 2)}, {BAND_HI}) AS p_hi
  FROM d a JOIN d b
    ON b.day_idx < a.day_idx AND b.day_idx >= a.day_idx - {BAND_WINDOW}
  GROUP BY a.day_idx
)
SELECT day_idx, {_d2dws('rev', 2)} AS revenue, n_window,
       round(p_lo, 6) AS band_lo, round(p_hi, 6) AS band_hi,
       CASE WHEN {_d2dws('rev', 2)} < p_lo THEN -1
            WHEN {_d2dws('rev', 2)} > p_hi THEN 1 ELSE 0 END AS alarm
FROM bands
""",
)
def rolling_quantile_band_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-quantile anomaly monitor: each day's revenue against the
    P10/P90 band of its TRAILING 28 days (exclusive) — the
    non-parametric alarm that, unlike z-scores, survives heavy tails
    and level shifts (pairs with event_cusum_alarms' parametric
    changepoint view). The banded self-join lives on the
    calendar-bounded day table (|days| x 28 rows), quantiles are exact
    interpolated values over each 28-value window, and the alarm
    compares against the unrounded band exactly as the oracle does.
    The day rollup is the only data-sized step."""
    d = (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day_idx")
        )
        .agg(
            F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("rev")
        )
        .localCheckpoint(eager=True)
    )
    a = d.selectExpr("day_idx", "rev")
    b = d.select(
        F.col("day_idx").alias("day_b"), _d2dw(F.col("rev"), 2).alias("rev_b")
    )
    bands = (
        a.join(
            b,
            (F.col("day_b") < F.col("day_idx"))
            & (F.col("day_b") >= F.col("day_idx") - BAND_WINDOW),
        )
        .groupBy("day_idx")
        .agg(
            F.min("rev").alias("rev"),
            F.count(F.lit(1)).cast("long").alias("n_window"),
            F.expr(f"percentile(rev_b, {BAND_LO})").alias("p_lo"),
            F.expr(f"percentile(rev_b, {BAND_HI})").alias("p_hi"),
        )
    )
    rev_d = _d2dw(F.col("rev"), 2)
    return bands.select(
        "day_idx",
        rev_d.alias("revenue"),
        "n_window",
        F.round("p_lo", 6).alias("band_lo"),
        F.round("p_hi", 6).alias("band_hi"),
        F.when(rev_d < F.col("p_lo"), -1)
        .when(rev_d > F.col("p_hi"), 1)
        .otherwise(0)
        .alias("alarm"),
    )
