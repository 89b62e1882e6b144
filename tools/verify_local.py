"""Local replica of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the same
parquet tables, then compares row count + column names + values
(column-name-sorted, row-sorted, exact). Stricter than a value hash: any
pass here implies the driver's hash matches.

Usage:
  python tools/verify_local.py [sf_dir] [query ...]
  python tools/verify_local.py --full-gate

``--full-gate`` is the closing-checklist mode (r10 lesson, r11 verdict
task 6): the FULL registry at sf0.1 — 10x the driver's gate scale —
which is the sweep that caught the two magnitude-dependent
engine-rounding bugs small SFs structurally cannot see. It prints a
final one-line JSON record (query count, failures, wall runtime) for
SCALE.md; expect ~25-35 min on an idle local[32] host.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The oracle gate compares EXACT semantics, so pin the ANN pair-mining
# candidate path to exact whatever the corpus size — at a scale factor
# where the auto guard would flip to the bucketed (approximate) path,
# the DuckDB twin would mismatch by design (r9 advice). Explicit env
# wins if the caller set one.
os.environ.setdefault("FCS_ANN_CANDIDATES", "exact")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

# Queries whose oracle pins a probabilistic-sketch error bound through a
# 0/1 verdict column (oracle side hardcodes literal 1). A mismatch there
# is usually a BOUND FLIP on a new corpus, not an arithmetic regression —
# name the column so the failure isn't misdiagnosed (r10 advice).
VERDICT_NOTES = {
    "hll_distinct_users": (
        "verdict column est_within_5pct: oracle hardcodes 1; a mismatch can "
        "mean the HLL estimate legitimately exceeded the 5% bound on this "
        "corpus, not that the exact counts diverged — inspect _hll_frame"
    ),
    "approx_percentile_prices": (
        "verdict column approx_within_rank_bound: oracle hardcodes 1; a "
        "mismatch can mean the sketch's rank-error bound flipped on this "
        "corpus, not an arithmetic regression — inspect "
        "_approx_percentile_frame"
    ),
}


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda x: str(x) if x is not None else None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    # the driver's value hash is TYPE-sensitive: a DuckDB HUGEINT sum
    # arrives as float64 and hash-mismatches Spark's int64 even when the
    # values are equal, and list cells crash its pandas sort. Flag both
    # here so they never reach the driver.
    for c in spark_pdf.columns:
        ka, kb = spark_pdf[c].dtype.kind, duck_pdf[c].dtype.kind
        if (ka in "iu") != (kb in "iu") or (ka == "f") != (kb == "f") or (ka == "b") != (kb == "b"):
            problems.append(
                f"dtype mismatch in col {c}: spark={spark_pdf[c].dtype} duck={duck_pdf[c].dtype}"
                " (the driver hash is type-sensitive — CAST the oracle column)"
            )
        if ka == "O" and len(spark_pdf) and isinstance(spark_pdf[c].iloc[0], (list, dict)):
            problems.append(
                f"complex-typed output col {c}: the driver canon cannot sort list/map cells"
                " — array_join to a scalar"
            )
    if problems:
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            col_a, col_b = a[c], b[c]
            if col_a.dtype.kind == "f" or col_b.dtype.kind == "f":
                col_a = col_a.astype(float).round(9)
                col_b = col_b.astype(float).round(9)
                eq = (col_a.fillna(-1e308) == col_b.fillna(-1e308)).all()
            else:
                eq = col_a.fillna("<NA>").astype(str).equals(col_b.fillna("<NA>").astype(str))
            if not eq:
                mism = (col_a.fillna(-1) != col_b.fillna(-1)) if col_a.dtype.kind == "f" else (
                    col_a.fillna("<NA>").astype(str) != col_b.fillna("<NA>").astype(str)
                )
                idx = mism[mism].index[:3].tolist()
                examples = [(i, a[c].iloc[i], b[c].iloc[i]) for i in idx]
                problems.append(f"values differ in col {c}: {examples}")
    return problems


def main() -> int:
    full_gate = len(sys.argv) > 1 and sys.argv[1] == "--full-gate"
    if full_gate:
        sf_dir = "/root/testdata/sf0.1"
        only = set()
    else:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
        only = set(sys.argv[2:])
    gate_t0 = time.time()

    from flink_crawler_spark import queries as q
    from flink_crawler_spark.session import get_spark

    spark = get_spark("verify_local")
    con = duck_con(sf_dir)

    registry = q.REGISTRY
    names = [n for n in registry if not only or n in only]
    failures = []
    for name in names:
        pair = registry[name]
        t0 = time.time()
        try:
            sdf = pair.fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        if pair.oracle is None:
            print(f"ok*   {name}: rows={len(sdf)} (rows-only, no oracle) [{time.time()-t0:.1f}s]")
            if len(sdf) == 0:
                print(f"      WARNING: zero rows")
            continue
        try:
            ddf = con.execute(pair.oracle).fetchdf()
        except Exception:
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL  {name}: rows={len(sdf)}/{len(ddf)} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
            if name in VERDICT_NOTES:
                print(f"      note: {VERDICT_NOTES[name]}")
            failures.append(name)
        else:
            print(f"ok    {name}: rows={len(sdf)} match [{time.time()-t0:.1f}s]")

    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    if failures:
        print("failures:", " ".join(failures))
    if full_gate:
        import json

        print(
            json.dumps(
                {
                    "gate": "sf0.1-full",
                    "sf_dir": sf_dir,
                    "n_queries": len(names),
                    "n_match": len(names) - len(failures),
                    "failures": sorted(failures),
                    "runtime_sec": round(time.time() - gate_t0, 1),
                }
            )
        )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
