"""cProfile the crawl_reachability query at the bench SF (r13 verdict
task 4): split wall time into Python-side plan construction vs py4j wait
(JVM analysis + execution) per phase. Usage:

  python tools/profile_reachability.py [--sf-dir DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from flink_crawler_spark.queries.crawlq import crawl_reachability
    from flink_crawler_spark.session import get_spark

    spark = get_spark("profile_reach")
    spark.sparkContext.setLogLevel("ERROR")
    # session warm: one tiny job
    spark.range(10).count()
    # warm run (absorbs parquet footer, codegen-off interpreter paths)
    t0 = time.time()
    crawl_reachability(spark, args.sf_dir).count()
    print(f"warm run: {time.time() - t0:.2f}s", flush=True)

    for rep in range(args.reps):
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        n = crawl_reachability(spark, args.sf_dir).count()
        pr.disable()
        wall = time.time() - t0
        buf = io.StringIO()
        st = pstats.Stats(pr, stream=buf)
        st.sort_stats("cumulative").print_stats(28)
        print(f"rep {rep}: wall {wall:.2f}s rows {n}")
        print(buf.getvalue()[:6000], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
