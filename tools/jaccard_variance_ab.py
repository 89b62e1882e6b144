"""graph_jaccard_link_prediction variance-shrink A/B (r10, round-9
verdict task 3).

The r9 spike adjudication pinned graph_jaccard's occasional 28-39 s
draws (median 8-9 s) on host scheduling noise amplified by the suite's
largest single-stage shuffle: the ~18M-row two-hop wedge stream feeding
the (a, c) common-neighbor aggregation. The plan is already the right
shape — this experiment is ONE honest attempt at shrinking the
straggler surface, per the verdict: fewer shuffle bytes per wedge means
a straggling task holds less work.

Variants (all return bit-identical rows — asserted before timing):

  A  the pre-r10 registry plan: rows (a, c, is_edge int) into
     groupBy(a, c).agg(sum(when(is_edge=0)), max(is_edge)).
  B  packed-key + signed-weight fold: rows (k bigint = a<<32|c,
     w long = +1 hop / -2^40 marker) into groupBy(k).agg(sum(w)) —
     one 8-byte key instead of two, ONE agg buffer instead of two;
     marker groups go negative and are filtered, cn is the surviving
     sum. NOT scale-safe: packing needs both keys < 2^31, which a
     ~100 TB part-key domain exceeds.
  C  signed-weight fold, unpacked keys (scale-safe): groupBy(a,
     c).agg(sum(w)) — the single-buffer win without the packing.
     ADOPTED by the registry in r10 (medians inside host noise, but
     the straggler tail shrank: A max 22.7 s vs B/C max <= 10.5 s over
     30 paired reps, and the fold is strictly less agg state).

Protocol: verify each variant == A once, then alternate A,B,C per rep
(pairing neutralizes slow host windows — the discriminator the r9
verdict institutionalized), report per-rep times, medians, p90.

Usage: python tools/jaccard_variance_ab.py [--reps 10] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq25 import _LP_ANCHOR_SPARK, LP_TOPK

PACK = 1 << 32
BIG = 1 << 40


def variant_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r10 registry plan, frozen here for the paired record:
    rows (a, c, is_edge int) into groupBy(a, c).agg(conditional sum,
    max(is_edge)). The registry adopted variant C after the A/B/C run
    (see SCALE.md r10)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.selectExpr("l_orderkey", "l_partkey AS pa")
    b = li.selectExpr("l_orderkey", "l_partkey AS pb")
    e = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    nbr = e.unionAll(e.selectExpr("pb AS pa", "pa AS pb")).localCheckpoint(eager=True)
    deg = nbr.groupBy("pa").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    anchors = nbr.where(F.expr(_LP_ANCHOR_SPARK)).select("pa").distinct()
    x = nbr.join(F.broadcast(anchors), "pa").selectExpr("pa AS a", "pb AS n")
    y = nbr.selectExpr("pa AS n", "pb AS c")
    hops = (
        x.join(y, "n")
        .where(F.col("c") != F.col("a"))
        .select("a", "c", F.lit(0).alias("is_edge"))
    )
    marker = (
        nbr.join(F.broadcast(anchors), "pa")
        .selectExpr("pa AS a", "pb AS c")
        .withColumn("is_edge", F.lit(1))
    )
    common = (
        hops.unionByName(marker)
        .groupBy("a", "c")
        .agg(
            F.sum(F.when(F.col("is_edge") == 0, 1).otherwise(0))
            .cast("long")
            .alias("cn"),
            F.max("is_edge").alias("__e"),
        )
        .filter(F.col("__e") == 0)
        .drop("__e")
    )
    cand = common.join(
        F.broadcast(deg.selectExpr("pa AS a", "deg AS deg_a")), "a"
    ).join(F.broadcast(deg.selectExpr("pa AS c", "deg AS deg_c")), "c")
    jacc = "round(CAST(cn AS DOUBLE) / CAST(deg_a + deg_c - cn AS DOUBLE), 6)"
    w = Window.partitionBy("a").orderBy(F.expr(jacc).desc(), F.asc("c"))
    return (
        cand.withColumn("jacc", F.expr(jacc))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= LP_TOPK)
        .selectExpr("a AS part_a", "c AS predicted_part", "cn AS n_common", "jacc", "rnk")
    )


def variant_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.selectExpr("l_orderkey", "l_partkey AS pa")
    b = li.selectExpr("l_orderkey", "l_partkey AS pb")
    e = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    nbr = e.unionAll(e.selectExpr("pb AS pa", "pa AS pb")).localCheckpoint(eager=True)
    deg = nbr.groupBy("pa").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    anchors = nbr.where(F.expr(_LP_ANCHOR_SPARK)).select("pa").distinct()
    x = nbr.join(F.broadcast(anchors), "pa").selectExpr("pa AS a", "pb AS n")
    y = nbr.selectExpr("pa AS n", "pb AS c")
    hops = (
        x.join(y, "n")
        .where(F.col("c") != F.col("a"))
        .select(
            (F.col("a") * F.lit(PACK) + F.col("c")).alias("k"),
            F.lit(1).cast("long").alias("w"),
        )
    )
    marker = (
        nbr.join(F.broadcast(anchors), "pa")
        .select(
            (F.col("pa") * F.lit(PACK) + F.col("pb")).alias("k"),
            F.lit(-BIG).cast("long").alias("w"),
        )
    )
    common = (
        hops.unionByName(marker)
        .groupBy("k")
        .agg(F.sum("w").alias("s"))
        .filter(F.col("s") > 0)
        .selectExpr(
            f"CAST(k DIV {PACK} AS BIGINT) AS a",
            f"CAST(k % {PACK} AS BIGINT) AS c",
            "s AS cn",
        )
    )
    cand = common.join(
        F.broadcast(deg.selectExpr("pa AS a", "deg AS deg_a")), "a"
    ).join(F.broadcast(deg.selectExpr("pa AS c", "deg AS deg_c")), "c")
    jacc = "round(CAST(cn AS DOUBLE) / CAST(deg_a + deg_c - cn AS DOUBLE), 6)"
    w = Window.partitionBy("a").orderBy(F.expr(jacc).desc(), F.asc("c"))
    return (
        cand.withColumn("jacc", F.expr(jacc))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= LP_TOPK)
        .selectExpr("a AS part_a", "c AS predicted_part", "cn AS n_common", "jacc", "rnk")
    )


def variant_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-weight fold WITHOUT key packing (scale-safe at any key
    domain): rows (a, c, w long = +1 hop / -2^40 marker) into
    groupBy(a, c).agg(sum(w)) — one agg buffer instead of two, same
    two-column key as A. Isolates the single-buffer win from B's
    packed-key win (packing needs both keys < 2^31, which a ~100 TB
    TPC-H part-key domain exceeds)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.selectExpr("l_orderkey", "l_partkey AS pa")
    b = li.selectExpr("l_orderkey", "l_partkey AS pb")
    e = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
    )
    nbr = e.unionAll(e.selectExpr("pb AS pa", "pa AS pb")).localCheckpoint(eager=True)
    deg = nbr.groupBy("pa").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    anchors = nbr.where(F.expr(_LP_ANCHOR_SPARK)).select("pa").distinct()
    x = nbr.join(F.broadcast(anchors), "pa").selectExpr("pa AS a", "pb AS n")
    y = nbr.selectExpr("pa AS n", "pb AS c")
    hops = (
        x.join(y, "n")
        .where(F.col("c") != F.col("a"))
        .select("a", "c", F.lit(1).cast("long").alias("w"))
    )
    marker = (
        nbr.join(F.broadcast(anchors), "pa")
        .selectExpr("pa AS a", "pb AS c")
        .withColumn("w", F.lit(-BIG).cast("long"))
    )
    common = (
        hops.unionByName(marker)
        .groupBy("a", "c")
        .agg(F.sum("w").alias("cn"))
        .filter(F.col("cn") > 0)
    )
    cand = common.join(
        F.broadcast(deg.selectExpr("pa AS a", "deg AS deg_a")), "a"
    ).join(F.broadcast(deg.selectExpr("pa AS c", "deg AS deg_c")), "c")
    jacc = "round(CAST(cn AS DOUBLE) / CAST(deg_a + deg_c - cn AS DOUBLE), 6)"
    w = Window.partitionBy("a").orderBy(F.expr(jacc).desc(), F.asc("c"))
    return (
        cand.withColumn("jacc", F.expr(jacc))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= LP_TOPK)
        .selectExpr("a AS part_a", "c AS predicted_part", "cn AS n_common", "jacc", "rnk")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from flink_crawler_spark.session import get_spark

    spark = get_spark("jaccard_ab")
    spark.sparkContext.setLogLevel("ERROR")

    variants = {"A": variant_a, "B": variant_b, "C": variant_c}

    # correctness first: B must be row-identical to A
    rows = {}
    for name, fn in variants.items():
        rows[name] = sorted(
            tuple(r) for r in fn(spark, args.sf).collect()
        )
    for name in variants:
        assert rows[name] == rows["A"], f"variant {name} result differs from A"
    print(f"identical: {len(rows['A'])} rows", flush=True)

    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, fn in variants.items():
            t0 = time.time()
            fn(spark, args.sf).collect()
            dt = time.time() - t0
            times[name].append(dt)
            print(f"rep {rep} {name}: {dt:.2f}s", flush=True)

    def stats(v: list[float]) -> dict:
        s = sorted(v)
        return {
            "median": round(statistics.median(s), 2),
            "min": round(s[0], 2),
            "max": round(s[-1], 2),
            "p90": round(s[max(0, int(0.9 * len(s)) - 1)], 2),
        }

    out: dict = {k: stats(v) for k, v in times.items()}
    for k in variants:
        if k != "A":
            out[f"paired_deltas_A_minus_{k}"] = [
                round(a - b, 2) for a, b in zip(times["A"], times[k])
            ]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
