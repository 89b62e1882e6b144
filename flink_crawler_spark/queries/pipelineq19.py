"""Wave 20: embedding hygiene, bitext mining, tail statistics, sampling.

  * embedding_dim_stats — per-dimension mean/std/min/max + a
    low-variance prune flag: the embedding-table health check before
    any indexing/whitening decision.
  * margin_mnn_pairs — margin-based mutual-nearest-neighbor pair
    mining between two corpus sides (Artetxe & Schwenk 2019): the
    parallel-corpus / bitext miner for translation data.
  * hill_tail_index — Hill estimator of the price distribution's
    power-law tail exponent from the top-k order statistics.
  * gumbel_topk_sample — weighted sampling WITHOUT replacement as a
    deterministic Gumbel top-k (Efraimidis-Spirakis): the one-pass
    distributed corpus sampler.

All exact-value DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws
from .base import ann_exact_path, register, t
from .simq import _norm_sql

_HEX = "0123456789abcdef"

# ---------------------------------------------------------------------------
# embedding_dim_stats
# ---------------------------------------------------------------------------

DIM_LOWVAR_THRESHOLD = 0.05


@register(
    "embedding_dim_stats",
    oracle=f"""
WITH x AS (
  SELECT o.ord - 1 AS dim, CAST(embedding[o.ord] AS DOUBLE) AS v
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS ord) o
),
s AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n,
         {_d2dws('sum(CAST(round(v, 9) AS DECIMAL(38,9)))', 9)} AS sv,
         {_d2dws('sum(CAST(round(v * v, 12) AS DECIMAL(38,12)))', 12)} AS svv,
         min(v) AS vmin, max(v) AS vmax
  FROM x GROUP BY dim
)
SELECT dim, n,
       round(sv / n, 9) AS mean,
       round(sqrt(greatest(svv / n - (sv / n) * (sv / n), 0.0)), 9) AS std,
       round(vmin, 6) AS vmin, round(vmax, 6) AS vmax,
       CASE WHEN round(sqrt(greatest(svv / n - (sv / n) * (sv / n), 0.0)), 9)
                 < {DIM_LOWVAR_THRESHOLD} THEN 1 ELSE 0 END AS low_var
FROM s
""",
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension statistics of the embedding table (mean, std,
    min, max, and a low-variance prune flag) — the hygiene pass before
    PQ subspace choice, whitening, or dead-dim pruning. One posexplode
    (x DIM rows, map-side) into one aggregate keyed by the 64-value dim
    id; float32 values widen to double EXACTLY, per-term rounding +
    DECIMAL sums make mean/std engine-identical, and the knife-edge
    low_var flag compares the ROUNDED std so both engines flag the same
    dims. Output is constant-size (one row per dimension)."""
    x = t(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("dim", "vf")
    ).selectExpr("dim", "CAST(vf AS DOUBLE) AS v")
    s = x.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _d2dw(F.sum(F.expr("CAST(round(v, 9) AS DECIMAL(38,9))")), 9).alias("sv"),
        _d2dw(F.sum(F.expr("CAST(round(v * v, 12) AS DECIMAL(38,12))")), 12).alias(
            "svv"
        ),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    std = "round(sqrt(greatest(svv / n - (sv / n) * (sv / n), 0.0)), 9)"
    return s.selectExpr(
        "dim",
        "n",
        "round(sv / n, 9) AS mean",
        f"{std} AS std",
        "round(vmin, 6) AS vmin",
        "round(vmax, 6) AS vmax",
        f"CASE WHEN {std} < {DIM_LOWVAR_THRESHOLD} THEN 1 ELSE 0 END AS low_var",
    )


# ---------------------------------------------------------------------------
# margin_mnn_pairs
# ---------------------------------------------------------------------------

MNN_K = 4  # neighborhood size for the margin denominator
# Above this TOTAL embeddings row count (both pair-mining sides
# combined — each side is roughly half) the exact x-side x y-side
# broadcast cross join gives way to the bucketed IVF candidate join;
# below it the exact pass runs (and stays oracle-comparable at test
# scales). Path pick: base.ann_exact_path — parquet-footer count (no
# Spark action) + FCS_ANN_CANDIDATES override + loud warn on auto-flip.
MNN_MAX_EXACT_ROWS = 100_000
MNN_N_LISTS = 16
MNN_N_PROBE = 4


def _dot64(a: str, b: str, base: int) -> str:
    return " + ".join(
        f"CAST({a}[{i + base}] AS DOUBLE) * CAST({b}[{i + base}] AS DOUBLE)"
        for i in range(64)
    )


@register(
    "margin_mnn_pairs",
    oracle=f"""
WITH x AS (
  SELECT vec_id AS x_id, embedding AS e, {_norm_sql('embedding', 1)} AS nrm
  FROM embeddings WHERE label < 5
),
y AS (
  SELECT vec_id AS y_id, embedding AS e, {_norm_sql('embedding', 1)} AS nrm
  FROM embeddings WHERE label >= 5
),
p AS (
  SELECT x.x_id, y.y_id,
         round(({_dot64('x.e', 'y.e', 1)}) / (x.nrm * y.nrm), 6) AS cos
  FROM x CROSS JOIN y
),
kx AS (
  SELECT x_id, {_d2dws('sum(CAST(cos AS DECIMAL(18,6)))')} / {MNN_K} AS mx
  FROM (SELECT x_id, cos,
               row_number() OVER (PARTITION BY x_id ORDER BY cos DESC, y_id ASC) AS rn
        FROM p) WHERE rn <= {MNN_K} GROUP BY x_id
),
ky AS (
  SELECT y_id, {_d2dws('sum(CAST(cos AS DECIMAL(18,6)))')} / {MNN_K} AS my
  FROM (SELECT y_id, cos,
               row_number() OVER (PARTITION BY y_id ORDER BY cos DESC, x_id ASC) AS rn
        FROM p) WHERE rn <= {MNN_K} GROUP BY y_id
),
m AS (
  SELECT p.x_id, p.y_id,
         round(p.cos / ((kx.mx + ky.my) / 2), 6) AS margin
  FROM p JOIN kx ON kx.x_id = p.x_id JOIN ky ON ky.y_id = p.y_id
),
bx AS (
  SELECT x_id, y_id, margin,
         row_number() OVER (PARTITION BY x_id ORDER BY margin DESC, y_id ASC) AS rx
  FROM m
),
by_ AS (
  SELECT x_id, y_id,
         row_number() OVER (PARTITION BY y_id ORDER BY margin DESC, x_id ASC) AS ry
  FROM m
)
SELECT bx.x_id, bx.y_id, bx.margin
FROM bx JOIN by_ ON by_.x_id = bx.x_id AND by_.y_id = bx.y_id
WHERE bx.rx = 1 AND by_.ry = 1
""",
)
def margin_mnn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based mutual-nearest-neighbor mining between two corpus
    sides (Artetxe & Schwenk 2019, the standard bitext/parallel-corpus
    miner): score(x,y) = cos(x,y) / mean of the two local k-NN
    neighborhoods, keep pairs where each is the other's best margin.
    The ratio margin cancels hubness that raw cosine thresholds can't.
    Below MNN_MAX_EXACT_ROWS total rows the candidate step is the exact
    broadcast cross join (the labeled fallback; sides here: label
    parity); above it, candidates route through the bucketed IVF join
    (``ivf_probe_candidates``) and the margin/mutual steps run on the
    candidate set unchanged — never a cross product at 100 TB.
    Equivalence of the two candidate paths is property-tested in
    tests/test_ann_guard.py (n_probe == n_lists ==> identical output).
    k-NN means are exact DECIMAL sums of the rounded cosines; the margin
    quotient is O(1) magnitude so 6dp rounding is well inside double
    precision (the large-magnitude quotient trap does not apply)."""
    return _margin_mnn_impl(spark, sf_dir)


def _margin_mnn_impl(
    spark: SparkSession,
    sf_dir: str,
    *,
    max_exact_rows: int = MNN_MAX_EXACT_ROWS,
    n_lists: int = MNN_N_LISTS,
    n_probe: int = MNN_N_PROBE,
) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    x = e.where(F.col("label") < 5).selectExpr(
        "vec_id AS x_id", "embedding AS ex", f"{_norm_sql('embedding', 0)} AS nx"
    )
    y = e.where(F.col("label") >= 5).selectExpr(
        "vec_id AS y_id", "embedding AS ey", f"{_norm_sql('embedding', 0)} AS ny"
    )
    if ann_exact_path(sf_dir, max_exact_rows, query="margin_mnn_pairs"):
        # exact path (r10): the bipartite blocked Arrow kernel computes
        # the SAME left-assoc doubles as the unrolled 64-term SQL chain
        # (operators/similarity.py exactness contract) at numpy speed —
        # the pair materialization was this query's dominant cost
        # (profiled 4.4-7.2 s of the 7.4 s total at sf0.1; the earlier
        # "repartition before BroadcastNL" note moved the chain off one
        # task, the kernel removes the scalar chain entirely). Block
        # grid sized from the parquet footer count — zero extra actions.
        from .base import parquet_row_count
        from ..operators.similarity import bipartite_cosine_pairs

        half = max(1, parquet_row_count(sf_dir, "embeddings") // 2)
        # r12 (guide §2.5): the checkpointed pair table AQE-coalesces to
        # very few partitions (13 MB of skinny rows), starving the four
        # window/agg passes below; spread it after pinning (no-op once
        # the pair set is wide).
        from ..operators import ensure_parallelism

        p = ensure_parallelism(
            bipartite_cosine_pairs(
                x.select("x_id", "ex"),
                y.select("y_id", "ey"),
                x_vec="ex",
                y_vec="ey",
                x_rows=half,
                y_rows=half,
            ).localCheckpoint(eager=True)
        )
    else:
        from ..operators.similarity import ivf_centroids, ivf_probe_candidates

        cents = ivf_centroids(e, n_lists=n_lists)
        cand = ivf_probe_candidates(
            x,
            y,
            centroids=cents,
            n_probe=n_probe,
            query_vec_col="ex",
            corpus_vec_col="ey",
        )
        p = cand.selectExpr(
            "x_id",
            "y_id",
            f"round(({_dot64('ex', 'ey', 0)}) / (nx * ny), 6) AS cos",
        ).localCheckpoint(eager=True)
    wx = Window.partitionBy("x_id").orderBy(F.desc("cos"), F.asc("y_id"))
    kx = (
        p.withColumn("rn", F.row_number().over(wx))
        .where(F.col("rn") <= MNN_K)
        .groupBy("x_id")
        .agg(
            (_d2dw(F.sum(F.col("cos").cast("decimal(18,6)"))) / MNN_K).alias("mx")
        )
    )
    wy = Window.partitionBy("y_id").orderBy(F.desc("cos"), F.asc("x_id"))
    ky = (
        p.withColumn("rn", F.row_number().over(wy))
        .where(F.col("rn") <= MNN_K)
        .groupBy("y_id")
        .agg(
            (_d2dw(F.sum(F.col("cos").cast("decimal(18,6)"))) / MNN_K).alias("my")
        )
    )
    # r12: no checkpoint — the margin frame has exactly ONE consumer
    # (the chained rx/ry windows), so pinning it only paid an extra
    # single-task materialization of the 1M-row pair stream.
    m = (
        p.join(kx, "x_id")
        .join(ky, "y_id")
        .selectExpr("x_id", "y_id", "round(cos / ((mx + my) / 2), 6) AS margin")
    )
    rx = Window.partitionBy("x_id").orderBy(F.desc("margin"), F.asc("y_id"))
    ry = Window.partitionBy("y_id").orderBy(F.desc("margin"), F.asc("x_id"))
    best = (
        m.withColumn("rx", F.row_number().over(rx))
        .withColumn("ry", F.row_number().over(ry))
        .where((F.col("rx") == 1) & (F.col("ry") == 1))
    )
    return best.select("x_id", "y_id", "margin")


# ---------------------------------------------------------------------------
# hill_tail_index
# ---------------------------------------------------------------------------

HILL_K = 100


_LN_EXCESS_SUM = (
    "sum(CAST(round(ln(CAST(topv.xc AS DOUBLE) / CAST(thr.xk1 AS DOUBLE)), 12)"
    " AS DECIMAL(38,12)))"
)


@register(
    "hill_tail_index",
    oracle=f"""
WITH topv AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS xc
  FROM lineitem ORDER BY xc DESC LIMIT {HILL_K + 1}
),
thr AS (SELECT min(xc) AS xk1 FROM topv),
lnsum AS (
  SELECT {_d2dws(_LN_EXCESS_SUM, 12)} AS s,
         CAST(count(*) AS BIGINT) AS m
  FROM topv CROSS JOIN thr WHERE topv.xc > thr.xk1
)
SELECT {HILL_K} AS k, thr.xk1 AS threshold_cents, lnsum.m AS n_exceed,
       round(lnsum.m / lnsum.s, 6) AS hill_alpha,
       round(lnsum.s / lnsum.m, 9) AS mean_log_excess
FROM lnsum CROSS JOIN thr
""",
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the power-law tail exponent of the price
    distribution from the top-k order statistics — the heavy-tail
    diagnostic behind skew-aware partitioning decisions and
    extreme-value capacity planning (alpha answers "how bad can the
    hot key get"). The only distributed step is a top-(k+1) selection
    (TakeOrderedAndProject — no global sort); everything after runs on
    k+1 values. Strict exceedances over the (k+1)-th value make the
    estimator invariant to how ties at the boundary are cut; log
    excesses are rounded once and DECIMAL-summed."""
    topv = (
        t(spark, sf_dir, "lineitem")
        .selectExpr("CAST(round(l_extendedprice * 100) AS BIGINT) AS xc")
        .orderBy(F.desc("xc"))
        .limit(HILL_K + 1)
    )
    # the threshold is a window min over the (k+1)-row survivor set —
    # bounded by construction, so the whole estimator is ONE pass after
    # the distributed top-k (no checkpoint, no second consumption)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    lnsum = (
        topv.withColumn("xk1", F.min("xc").over(wall))
        .where(F.col("xc") > F.col("xk1"))
        .agg(
            _d2dw(
                F.sum(
                    F.expr(
                        "CAST(round(ln(CAST(xc AS DOUBLE) / CAST(xk1 AS DOUBLE)), 12)"
                        " AS DECIMAL(38,12))"
                    )
                ),
                12,
            ).alias("s"),
            F.count(F.lit(1)).cast("long").alias("m"),
            F.min("xk1").alias("xk1"),
        )
    )
    return lnsum.selectExpr(
        f"CAST({HILL_K} AS BIGINT) AS k",
        "xk1 AS threshold_cents",
        "m AS n_exceed",
        "round(m / s, 6) AS hill_alpha",
        "round(s / m, 9) AS mean_log_excess",
    )


# ---------------------------------------------------------------------------
# gumbel_topk_sample
# ---------------------------------------------------------------------------

GUMBEL_K = 50


def _md5_u(key: str, *, duck: bool) -> str:
    """Uniform in (0,1): (first-6-hex-digits + 0.5) / 16^6, never 0/1.

    r11 (caught by the sf1.0 magnitude gate): the literals are
    E-NOTATION so both engines do pure DOUBLE arithmetic — a bare `0.5`
    made Spark type the whole expression DECIMAL(12,10), TRUNCATING u to
    10 digits while DuckDB computed the exact double; the Gumbel key's
    1/(u ln u) amplification near u->1 (exactly the top-k region) turned
    that 1e-10 skew into up-to-1e-4 key differences at 50k docs and
    flipped 6dp roundings. With e0 literals u is EXACT in both engines
    (h < 2^24 and the divisor is a power of two), leaving only ulp-level
    ln() libm drift, which the amplification bound keeps ~1e-11 relative
    at 50k docs — far inside the 6dp quantum."""
    fn = "strpos" if duck else "locate"
    args = (
        (lambda i: f"('{_HEX}', substr(md5({key}), {i + 1}, 1))")
        if duck
        else (lambda i: f"(substr(md5({key}), {i + 1}, 1), '{_HEX}')")
    )
    h = " + ".join(f"({fn}{args(i)} - 1) * {16 ** (5 - i)}" for i in range(6))
    return f"((({h}) + 0.5e0) / {16 ** 6}e0)"


@register(
    "gumbel_topk_sample",
    oracle=f"""
WITH g AS (
  SELECT doc_id, n_chars,
         round(ln(CAST(n_chars AS DOUBLE)) - ln(-ln({_md5_u("CAST(doc_id AS VARCHAR)", duck=True)})), 6)
           AS gumbel_key
  FROM documents WHERE n_chars > 0
),
r AS (
  SELECT doc_id, n_chars, gumbel_key,
         CAST(row_number() OVER (ORDER BY gumbel_key DESC, doc_id ASC) AS BIGINT) AS rnk
  FROM g
)
SELECT doc_id, n_chars, gumbel_key, rnk FROM r WHERE rnk <= {GUMBEL_K}
""",
)
def gumbel_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement as a deterministic Gumbel
    top-k (Efraimidis-Spirakis 2006 via the Gumbel-max trick): each doc
    gets key ln(w) - ln(-ln(u)) with weight w = n_chars and u a
    deterministic md5 uniform, and the k largest keys ARE a weighted
    sample without replacement. This is THE one-pass distributed
    corpus sampler: no sequential reservoir, no rejection loop — just a
    map-side key and a top-k (TakeOrderedAndProject), so it
    parallelizes to any cluster size and is reproducible by seed
    construction. Keys are rounded before ranking (ties broken by
    doc_id) so both engines select the identical sample."""
    u = _md5_u("CAST(doc_id AS STRING)", duck=False)
    g = (
        t(spark, sf_dir, "documents")
        .where(F.col("n_chars") > 0)
        .selectExpr(
            "doc_id",
            "n_chars",
            f"round(ln(CAST(n_chars AS DOUBLE)) - ln(-ln({u})), 6) AS gumbel_key",
        )
    )
    # top-k FIRST (TakeOrderedAndProject — distributed), then rank the
    # k survivors; never a global row_number window over the corpus
    top = g.orderBy(F.desc("gumbel_key"), F.asc("doc_id")).limit(GUMBEL_K)
    w = Window.orderBy(F.desc("gumbel_key"), F.asc("doc_id"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).select(
        "doc_id", "n_chars", "gumbel_key", "rnk"
    )
