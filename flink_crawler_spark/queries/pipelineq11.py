"""Wave 12: submodular data selection, continuous rollup maintenance,
and RFM behavioral segmentation.

  * facility_location_select — greedy facility-location maximization
    over embedding cosines (Nemhauser greedy / Lin & Bilmes 2011): the
    classic diverse-coverage data-selection algorithm, bit-exact via
    DECIMAL coverage state against an unrolled MATERIALIZED-CTE oracle.
  * stream_incremental_mv — the per-(custkey, month) revenue rollup
    maintained CONTINUOUSLY by foreachBatch partial-aggregate merges
    over a multi-batch order stream; final MV must equal the one-shot
    batch aggregate exactly.
  * rfm_user_segments — recency/frequency/monetary quintile
    segmentation of event users, all three ranks distributed.
"""

from __future__ import annotations

import decimal
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.partitioning import distributed_row_number
from .base import register, t
from .base import dec_to_double_wide as _d2dw
from .base import dec_to_double_wide_sql as _d2dws
from .simq import _dot_sql, _norm_sql

# ---------------------------------------------------------------------------
# facility_location_select
# ---------------------------------------------------------------------------

FL_K = 8  # selections
FL_CANDS = 32  # candidate pool size (md5-ordered draw)
# r12: corpora up to this many vectors run the greedy on the collected
# (n x FL_CANDS) DECIMAL sims proxy (identical arithmetic, zero per-round
# jobs); larger corpora keep the distributed per-round aggregate loop.
# ~200k x 32 decimals is tens of MB on the driver — the same budget the
# cosine collect guard uses.
FL_DRIVER_MAX = 200_000


def _fl_oracle() -> str:
    # unrolled greedy: every level MATERIALIZED (each is referenced by
    # its gain agg AND the next level — the duplicated-subtree rule)
    cand = f"""
cand AS MATERIALIZED (
  SELECT vec_id AS c, embedding AS cv, {_norm_sql('embedding', 1)} AS nc
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {FL_CANDS}
),
uni AS MATERIALIZED (
  SELECT vec_id AS v, embedding AS dv, {_norm_sql('embedding', 1)} AS nd
  FROM embeddings
),
sims AS MATERIALIZED (
  SELECT uni.v, cand.c,
         CAST(round(({_dot_sql('cand.cv', 'uni.dv', 1)}) / (cand.nc * uni.nd), 9)
              AS DECIMAL(18,9)) AS s
  FROM uni CROSS JOIN cand
),
lvl0 AS MATERIALIZED (SELECT v, CAST(0 AS DECIMAL(18,9)) AS cur FROM uni)"""
    parts = [cand]
    for i in range(1, FL_K + 1):
        prev = f"lvl{i - 1}"
        excl = (
            " WHERE sims.c NOT IN ("
            + " UNION ALL ".join(f"SELECT c FROM pick{j}" for j in range(1, i))
            + ")"
            if i > 1
            else ""
        )
        parts.append(f"""
g{i} AS MATERIALIZED (
  SELECT sims.c,
         sum(CAST(greatest(sims.s, p.cur) - p.cur AS DECIMAL(28,9))) AS g
  FROM sims JOIN {prev} p ON p.v = sims.v{excl}
  GROUP BY sims.c
),
pick{i} AS MATERIALIZED (SELECT c, g FROM g{i} ORDER BY g DESC, c LIMIT 1),
lvl{i} AS MATERIALIZED (
  SELECT p.v, greatest(p.cur, CAST(coalesce(s2.s, 0) AS DECIMAL(18,9))) AS cur
  FROM {prev} p
  LEFT JOIN sims s2 ON s2.v = p.v AND s2.c = (SELECT c FROM pick{i})
)""")
        # lvl{i}.cur stays DECIMAL(18,9): greatest of two DECIMAL(18,9)
    finals = []
    for i in range(1, FL_K + 1):
        srcs = ", ".join(f"pick{j}" for j in range(1, i + 1))
        cov = " + ".join(f"pick{j}.g" for j in range(1, i + 1))
        finals.append(
            f"SELECT CAST({i} AS BIGINT) AS sel_rank, pick{i}.c AS vec_id,\n"
            f"       CAST(pick{i}.g AS DOUBLE) AS gain,\n"
            f"       CAST({cov} AS DOUBLE) AS coverage\nFROM {srcs}"
        )
    return "WITH " + ",".join(parts) + "\n" + "\nUNION ALL\n".join(finals)


@register("facility_location_select", oracle=_fl_oracle())
def facility_location_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy facility-location data selection: pick K=8 vectors from a
    32-candidate md5-ordered pool maximizing F(S) = sum over the corpus
    of max cosine to any selected vector — the submodular coverage
    objective (Lin & Bilmes 2011) behind diverse-subset selection, with
    the Nemhauser 1-1/e guarantee per greedy step.

    Bit-exactness: cosines come from the shared unrolled left-assoc
    dot/norm chains, rounded to 9 dp and held as DECIMAL(18,9); the
    per-candidate marginal gains are DECIMAL sums (order-free) and the
    argmax breaks ties on candidate id — so the greedy trajectory is
    IDENTICAL on both engines, which the unrolled 8-level MATERIALIZED
    oracle verifies pick by pick (gain and cumulative coverage per
    selection; coverage_k = sum of gains because F(empty) = 0).

    Spark shape: the corpus is scanned ONCE into a frame holding the
    32-element sim ARRAY per row (the candidate matrix inlined as an
    array-of-arrays literal, the dot an array fold — the kmeans
    zip_with/aggregate idiom, which matches the unrolled left-assoc SQL
    chain bit-for-bit and keeps every generated method tiny; 32
    separate unrolled sim columns blow the 64 KB codegen method limit
    and cost 15 s in compile-then-fallback) plus the coverage column,
    pinned with an eager localCheckpoint. Every greedy round is then 32
    tiny element_at decimal aggregates over that frame (one O(corpus)
    scan, one 32-value driver pull) and the update is
    greatest(cur, s[chosen]) — a pure column op, re-pinned per round
    (the per-iteration materialization discipline). Zero shuffles of
    anything wider than the 32 aggregate values."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.expr(_norm_sql("embedding", 0)).alias("nd")
    )
    cands = (
        e.select(
            F.col("vec_id").alias("c"),
            F.col("embedding").alias("cv"),
            F.col("nd").alias("nc"),
        )
        .orderBy(F.md5(F.encode(F.col("c").cast("string"), "UTF-8")), "c")
        .limit(FL_CANDS)
        .collect()
    )
    cand_ids = [r["c"] for r in cands]
    # r12 (guide §1.2, the SimHash/LSH-string precedent): the nested
    # F.array/F.lit literal paid ~2k py4j round trips (~1.4 s measured);
    # ONE parsed expression builds the same tree. CAST('<repr>' AS
    # DOUBLE) goes through Double.parseDouble of Python's shortest
    # round-trip repr — bit-identical doubles to F.lit(float(x)).
    _d = lambda x: f"CAST('{float(x)!r}' AS DOUBLE)"  # noqa: E731
    cmat = F.expr(
        "array(" + ",".join(
            "array(" + ",".join(_d(x) for x in r["cv"]) + ")" for r in cands
        ) + ")"
    )
    ncarr = F.expr("array(" + ",".join(_d(r["nc"]) for r in cands) + ")")

    # nd is a materialized column, so the lambdas below capture cheap
    # refs only (the interpreted-HOF capture trap)
    def sims(cv: F.Column, i: F.Column) -> F.Column:
        prod = F.zip_with(cv, F.col("embedding"), lambda a, b: a * b.cast("double"))
        dot = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
        return F.round(
            dot / (F.element_at(ncarr, i + 1) * F.col("nd")), 9
        ).cast("decimal(18,9)")

    # r12 (guide §2.5): the 32-candidate x 64-dim interpreted-HOF sim
    # pass ran on the single-row-group scan's ONE task; spread it first
    # (no-op on multi-file inputs)
    from ..operators import ensure_parallelism

    sims_frame = ensure_parallelism(e).select(
        F.col("vec_id").alias("v"), F.transform(cmat, sims).alias("s")
    )

    chosen: list[tuple[int, decimal.Decimal]] = []
    picked_ids: set[int] = set()
    from .base import parquet_row_count

    if parquet_row_count(sf_dir, "embeddings") <= FL_DRIVER_MAX:
        # r12 (guide §1.2/§8): the greedy DECIDES on the (n_vecs x 32)
        # DECIMAL(18,9) sims proxy — at this corpus size each distributed
        # round was ~1 s of plan-compile + scheduling for a 32-value
        # aggregate over 2000 rows (profiled; the K=8 loop was ~8 s of
        # the query's 8.0 s steady state). Collect the proxy ONCE and run
        # the identical decimal algebra on the driver: Python Decimal
        # sums of exact DECIMAL(18,9) values are the same order-free
        # exact arithmetic as the Spark decimal aggregate (no rounding
        # below context precision 28 >= the 13 digits these sums reach),
        # greatest() ties and the (gain, -cand) argmax replicate
        # verbatim. Results are bit-identical (oracle-verified at
        # sf0.001/0.01/0.1); only the execution venue changes.
        rows = [r["s"] for r in sims_frame.collect()]
        zero = decimal.Decimal(0)
        curs = [zero] * len(rows)
        for _ in range(FL_K):
            remaining = [(j, c) for j, c in enumerate(cand_ids) if c not in picked_ids]
            best = None
            for j, c in remaining:
                gtot = zero
                for s, cur_v in zip(rows, curs):
                    sv = s[j]
                    # Spark's greatest() skips NULLs: a null sim leaves
                    # the coverage untouched
                    if sv is not None and sv > cur_v:
                        gtot += sv - cur_v
                if best is None or (gtot, -c) > (best[0], -best[1]):
                    best = (gtot, c, j)
            g, cid, j = best
            picked_ids.add(cid)
            chosen.append((cid, g))
            for idx, s in enumerate(rows):
                sv = s[j]
                if sv is not None and sv > curs[idx]:
                    curs[idx] = sv
    else:
        # 100 TB path: the coverage state is corpus-sized — keep it
        # distributed; every greedy round is 32 tiny element_at decimal
        # aggregates over the pinned frame (one O(corpus) scan, one
        # 32-value driver pull). Identical arithmetic to the driver
        # kernel above.
        cur = sims_frame.withColumn(
            "cur", F.lit(0).cast("decimal(18,9)")
        ).localCheckpoint(eager=True)
        for _ in range(FL_K):
            remaining = [(j, c) for j, c in enumerate(cand_ids) if c not in picked_ids]
            gains = cur.agg(
                *[
                    F.sum(
                        (
                            F.greatest(F.element_at("s", j + 1), F.col("cur"))
                            - F.col("cur")
                        ).cast("decimal(28,9)")
                    ).alias(f"g_{c}")
                    for j, c in remaining
                ]
            ).collect()[0]
            g, jc = max(((gains[f"g_{c}"], (j, c)) for j, c in remaining),
                        key=lambda t_: (t_[0], -t_[1][1]))
            j, cid = jc
            picked_ids.add(cid)
            chosen.append((cid, g))
            # no per-round re-pin: the update is <=K nested greatest() over
            # the ONE checkpointed sims frame — recomputing that lineage in
            # the next round's aggregate costs microseconds on the tiny
            # (n_vecs x K-array) frame, while an eager localCheckpoint costs
            # a whole scheduled job per round (measured: ~0.4 s x K rounds)
            cur = cur.withColumn(
                "cur", F.greatest(F.col("cur"), F.element_at("s", j + 1))
            )

    out, cov = [], decimal.Decimal(0)
    for i, (cid, g) in enumerate(chosen, start=1):
        cov += g
        out.append((i, cid, float(g), float(cov)))
    return spark.createDataFrame(
        out, "sel_rank long, vec_id long, gain double, coverage double"
    )


# ---------------------------------------------------------------------------
# stream_incremental_mv
# ---------------------------------------------------------------------------


@register(
    "stream_incremental_mv",
    oracle=f"""
SELECT o_custkey,
       CAST(EXTRACT(year FROM o_orderdate) * 100
            + EXTRACT(month FROM o_orderdate) AS BIGINT) AS ym,
       CAST(count(*) AS BIGINT) AS n_orders,
       {_d2dws("sum(CAST(round(o_totalprice, 6) AS DECIMAL(28,6)))")}
         AS revenue
FROM orders
GROUP BY o_custkey, ym
""",
)
def stream_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-(customer, month) revenue rollup maintained CONTINUOUSLY:
    orders arrive as a 3-file stream (one file per micro-batch via
    maxFilesPerTrigger), and every foreachBatch merges that batch's
    partial aggregate into the stored MV with a full-outer
    coalesce-and-add, writing the new MV atomically (stage directory +
    rename — the same swap discipline as the crawl state table). After
    the stream drains, the MV must equal the one-shot batch aggregate
    bit-for-bit — DECIMAL partials make the merge associative, so
    arrival order and batch boundaries cannot move the answer. This is
    the streaming twin of `incremental_mv_refresh` and the §2.14
    continuous-operation shape for rollups: history is NEVER rescanned,
    each tick costs O(delta) + O(affected MV keys)."""
    orders = t(spark, sf_dir, "orders")
    stream_dir = tempfile.mkdtemp(prefix="fcs_mvstream_")
    # 3 arrival files split by order date (deterministic, uneven)
    splits = [
        orders.filter(F.year("o_orderdate") <= 1994),
        orders.filter((F.year("o_orderdate") > 1994) & (F.year("o_orderdate") <= 1996)),
        orders.filter(F.year("o_orderdate") > 1996),
    ]
    for i, part in enumerate(splits):
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(stream_dir, f"batch_{i}")
        )
    arrivals = os.path.join(stream_dir, "arrivals")
    os.makedirs(arrivals)
    n_files = 0
    for i in range(3):
        bdir = os.path.join(stream_dir, f"batch_{i}")
        for f_ in os.listdir(bdir):
            if f_.endswith(".parquet"):
                os.rename(
                    os.path.join(bdir, f_), os.path.join(arrivals, f"b{i}.parquet")
                )
                n_files += 1
    assert n_files == 3

    mv_dir = os.path.join(stream_dir, "mv")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long").alias(
        "ym"
    )

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        partial = batch.groupBy("o_custkey", ym).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice"), 6).cast("decimal(28,6)")).alias(
                "rev"
            ),
        )
        if os.path.exists(mv_dir):
            old = sp.read.parquet(mv_dir)
            zero = F.lit(0).cast("decimal(28,6)")
            o, d = old.alias("o"), partial.alias("d")
            merged = o.join(d, ["o_custkey", "ym"], "full_outer").select(
                "o_custkey",
                "ym",
                (
                    F.coalesce(F.col("o.n"), F.lit(0))
                    + F.coalesce(F.col("d.n"), F.lit(0))
                ).alias("n"),
                (
                    F.coalesce(F.col("o.rev"), zero)
                    + F.coalesce(F.col("d.rev"), zero)
                ).cast("decimal(28,6)").alias("rev"),
            )
        else:
            merged = partial
        stage = mv_dir + f".stage{batch_id}"
        merged.write.mode("overwrite").parquet(stage)
        if os.path.exists(mv_dir):
            shutil.rmtree(mv_dir)
        os.rename(stage, mv_dir)

    schema = orders.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals)
    )
    from .streamq import _temp_ckpt

    ckpt = _temp_ckpt("fcs_mv_ckpt_")
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)  # explicit ckpts never auto-delete

    return spark.read.parquet(mv_dir).select(
        "o_custkey",
        "ym",
        F.col("n").alias("n_orders"),
        _d2dw(F.col("rev")).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# rfm_user_segments
# ---------------------------------------------------------------------------

RFM_Q = 5  # quintiles
RFM_ASOF = "2024-01-31 00:00:00"


@register(
    "rfm_user_segments",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         CAST(epoch_ms(max(ts)) AS BIGINT) AS last_ms,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(round(value, 6) AS DECIMAL(28,6))) AS DECIMAL(38,6))
           AS monetary
  FROM events GROUP BY user_id
),
n AS (SELECT count(*) AS n FROM u),
r AS (
  SELECT u.*,
         row_number() OVER (ORDER BY last_ms, user_id) AS rr,
         row_number() OVER (ORDER BY freq, user_id) AS rf,
         row_number() OVER (ORDER BY monetary, user_id) AS rm
  FROM u
),
sc AS (
  SELECT user_id, monetary,
         CAST(((rr - 1) * {RFM_Q}) // (SELECT n FROM n) AS BIGINT) AS r_q,
         CAST(((rf - 1) * {RFM_Q}) // (SELECT n FROM n) AS BIGINT) AS f_q,
         CAST(((rm - 1) * {RFM_Q}) // (SELECT n FROM n) AS BIGINT) AS m_q
  FROM r
)
SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_users,
       round({_d2dws('sum(monetary)')} / count(*), 6) AS avg_monetary
FROM sc GROUP BY r_q, f_q, m_q
""",
)
def rfm_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM behavioral segmentation: per user, recency (last event
    time), frequency (event count), monetary (decimal-exact value sum);
    each dimension cut into population quintiles and users bucketed by
    the (R, F, M) triple — the classic marketing/engagement
    segmentation, here as a three-rank pipeline where every rank is the
    shared `distributed_row_number` two-phase rank (user cardinality is
    web-scale; a bare Window.orderBy would serialize it).

    Rank keys are exact (BIGINT epoch-ms, BIGINT counts, DECIMAL sums —
    rounded state BEFORE ranking by construction), tie-broken by
    user_id, so quintile assignment is deterministic and engine-equal.
    """
    from .base import ts_millis

    ev = t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(ts_millis(F.col("ts"))).alias("last_ms"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("value"), 6).cast("decimal(28,6)"))
        .cast("decimal(38,6)")
        .alias("monetary"),
    )
    u = u.localCheckpoint(eager=True)  # probed three times + aggregated
    # r12 (guide §1.2 step 1): quintile ASSIGNMENT does not need a rank
    # per row — only the 4 boundary keys per dimension. q(rank) >= i
    # <=> rank >= ceil(i*n/5)+1 <=> (dim, user_id) >= the key at that
    # rank (the tie-broken order is total), so each user's quintile is
    # a sum of 4 key comparisons against collected boundary literals.
    # The previous form chained THREE full two-phase rank towers
    # (3 range shuffles + checkpoints of the wide frame + windows over
    # every row); now three slim targeted selections feed one CASE-sum
    # pass over the pinned user table. Boundaries are 4 rows per
    # dimension at any corpus size — the standard quantile-cut shape.
    from ..operators.partitioning import distributed_order_statistics

    def _bounds(dim: str):
        probe, n = distributed_order_statistics(
            u.select(dim, "user_id"),
            [dim, "user_id"],
            lambda n_: [(i * n_ + 4) // 5 + 1 for i in range(1, RFM_Q)],
        )
        return [
            (probe[(i * n + 4) // 5 + 1][dim], probe[(i * n + 4) // 5 + 1]["user_id"])
            for i in range(1, RFM_Q)
        ]

    # the three probes are independent driver barriers over the pinned
    # user table — overlap them (guide §2.6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        bounds = dict(
            zip(("last_ms", "freq", "monetary"),
                pool.map(_bounds, ("last_ms", "freq", "monetary")))
        )

    def _q(dim: str, lit: str, out: str):
        cases = " + ".join(
            f"(CASE WHEN {dim} > {lit.format(v=v)} OR ({dim} = {lit.format(v=v)}"
            f" AND user_id >= {uid}L) THEN 1 ELSE 0 END)"
            for v, uid in bounds[dim]
        )
        return F.expr(f"CAST({cases} AS BIGINT)").alias(out)

    sc = u.select(
        "user_id",
        "monetary",
        _q("last_ms", "{v}L", "r_q"),
        _q("freq", "{v}L", "f_q"),
        _q("monetary", "CAST('{v}' AS DECIMAL(38,6))", "m_q"),
    )
    return sc.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(_d2dw(F.sum("monetary")) / F.count(F.lit(1)), 6).alias(
            "avg_monetary"
        ),
    )
