"""Scale probe for the bucketed-ANN candidate guard (r8 verdict task 2).

Times hard-negative-style candidate generation + top-k ranking over a
synthetic embedding corpus at x1/x5/x10 sizes, exact broadcast
cross-join path vs the bucketed IVF path (`ivf_probe_candidates`),
printing per-cell wall time and the fitted x1→x10 scaling exponent for
each.  This is the measurement behind the MAX_EXACT_ROWS guard in
queries/pipelineq17.py / pipelineq19.py: below the threshold exact is
cheap and oracle-comparable; above it the cross product's quadratic
work dominates and candidates must come from the inverted lists.

Usage: python tools/probe_ann_guard.py [base_n] [dim]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flink_crawler_spark.operators.similarity import (  # noqa: E402
    ivf_centroids,
    ivf_probe_candidates,
)
from flink_crawler_spark.session import get_spark  # noqa: E402

TOP_K = 5
N_LISTS = 32
N_PROBE = 4
ANCHOR_FRACTION = 64  # 1 anchor per 64 corpus rows


def make_embeddings(spark, n: int, dim: int):
    """Deterministic synthetic corpus: dim-float arrays from seeded
    per-(row, component) hashes — no Date.now/random, reproducible."""
    comps = [
        (
            F.pmod(F.xxhash64(F.col("vec_id") * (d + 1) + d), F.lit(1000)).cast("double")
            / 500.0
            - 1.0
        ).alias(f"c{d}")
        for d in range(dim)
    ]
    return (
        spark.range(n)
        .withColumnRenamed("id", "vec_id")
        .select("vec_id", F.array(*comps).alias("embedding"))
        .localCheckpoint(eager=True)
    )


def rank_topk(cand, dim: int):
    # the unrolled left-associated dot chain the real pair-mining
    # queries compile (whole-stage codegen, no higher-order functions)
    dot = " + ".join(f"a_emb[{i}] * embedding[{i}]" for i in range(dim))
    na = "sqrt(" + " + ".join(f"a_emb[{i}] * a_emb[{i}]" for i in range(dim)) + ")"
    nb = "sqrt(" + " + ".join(f"embedding[{i}] * embedding[{i}]" for i in range(dim)) + ")"
    pairs = cand.where(F.col("vec_id") != F.col("a_id")).selectExpr(
        "a_id", "vec_id AS neg_id", f"round(({dot}) / (({na}) * ({nb})), 6) AS cosine"
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cosine"), F.asc("neg_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
    )


def main() -> int:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("ann_guard_probe")
    spark.sparkContext.setLogLevel("ERROR")
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # warm both paths untimed
    warm = make_embeddings(spark, 2000, dim)
    wa = warm.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb")
    ).where(F.col("a_id") % ANCHOR_FRACTION == 0)
    rank_topk(warm.crossJoin(F.broadcast(wa)), dim).count()
    cw = ivf_centroids(warm, n_lists=8)
    rank_topk(
        ivf_probe_candidates(wa, warm, centroids=cw, n_probe=2, query_vec_col="a_emb"),
        dim,
    ).count()

    results: dict[tuple[str, int], float] = {}
    for mult in (1, 5, 10):
        n = base_n * mult
        emb = make_embeddings(spark, n, dim)
        anch = emb.select(
            F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb")
        ).where(F.col("a_id") % ANCHOR_FRACTION == 0)

        t0 = time.time()
        exact = rank_topk(
            emb.repartition(shuffle_parts).crossJoin(F.broadcast(anch)), dim
        ).count()
        results[("exact", mult)] = dt = time.time() - t0
        print(f"exact    x{mult:<3d} n={n:>7d} ranked={exact:>9d} {dt:7.2f}s", flush=True)

        t0 = time.time()
        cents = ivf_centroids(emb, n_lists=N_LISTS)
        bucketed = rank_topk(
            ivf_probe_candidates(
                anch, emb, centroids=cents, n_probe=N_PROBE, query_vec_col="a_emb"
            ),
            dim,
        ).count()
        results[("bucketed", mult)] = dt = time.time() - t0
        print(f"bucketed x{mult:<3d} n={n:>7d} ranked={bucketed:>9d} {dt:7.2f}s", flush=True)

    for mode in ("exact", "bucketed"):
        expo = math.log(results[(mode, 10)] / results[(mode, 1)]) / math.log(10)
        print(f"{mode} scaling exponent (x1->x10): {expo:.2f}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
