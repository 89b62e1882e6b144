"""Skew-guard scale probe for lsh_candidate_pairs (r8 verdict task 5).

Builds synthetic minhash-signature frames at x1/x5/x10 sizes with ONE
injected hot band (10% of docs share a constant band-0 hash — the
boilerplate-cluster shape), then times candidate generation with the
bucket-size guard on (max_bucket=1024, salting) vs off (max_bucket=None,
the pre-r8 code path).  Prints one row per (scale, mode) plus the
fitted scaling exponent log(t_x10/t_x1)/log(10); results land in
SCALE.md's exponent table.

Usage: python tools/probe_lsh_skew.py [base_n]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_crawler_spark.operators.dedup import lsh_candidate_pairs  # noqa: E402
from flink_crawler_spark.session import get_spark  # noqa: E402

NUM_HASHES, BANDS = 8, 4
HOT_MOD = 10  # 1 in 10 docs joins the hot band-0 bucket


def make_signatures(spark, n: int):
    """(doc_id, mh0..mh7): docs with id%HOT_MOD==0 share a constant
    band-0 hash (mh0,mh1 constant); every other hash is unique per doc,
    so band 0 holds one n/10-sized hot bucket and all other buckets are
    singletons."""
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    hot = F.col("doc_id") % HOT_MOD == 0
    cols = []
    for k in range(NUM_HASHES):
        unique = F.md5(F.concat(F.lit(f"{k}|"), F.col("doc_id").cast("string")))
        if k < 2:  # band 0 = (mh0, mh1)
            cols.append(F.when(hot, F.lit("HOTBAND")).otherwise(unique).alias(f"mh{k}"))
        else:
            cols.append(unique.alias(f"mh{k}"))
    return df.select("doc_id", *cols).localCheckpoint(eager=True)


def main() -> int:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_spark("lsh_skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm both code paths untimed (codegen, exchange machinery) so the
    # first timed cell measures the operator, not session spin-up
    warm = make_signatures(spark, 2000)
    for mb in (1024, None):
        lsh_candidate_pairs(warm, num_hashes=NUM_HASHES, bands=BANDS, max_bucket=mb).count()

    results: dict[tuple[str, int], float] = {}
    for mode, max_bucket in (("guarded", 1024), ("unguarded", None)):
        for mult in (1, 5, 10):
            n = base_n * mult
            sigs = make_signatures(spark, n)
            t0 = time.time()
            cnt = lsh_candidate_pairs(
                sigs,
                num_hashes=NUM_HASHES,
                bands=BANDS,
                max_bucket=max_bucket,
            ).count()
            dt = time.time() - t0
            results[(mode, mult)] = dt
            print(f"{mode:10s} x{mult:<3d} n={n:>7d} pairs={cnt:>12d} {dt:7.2f}s", flush=True)
    for mode in ("guarded", "unguarded"):
        expo = math.log(results[(mode, 10)] / results[(mode, 1)]) / math.log(10)
        print(f"{mode} scaling exponent (x1->x10): {expo:.2f}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
