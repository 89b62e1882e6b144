"""Full-fidelity driver-schema corpus generator for the magnitude gate.

The r10 lesson: magnitude-dependent engine-rounding divergence is the
one bug class small scale factors structurally cannot see — the first
full sf0.1 oracle sweep caught two real bugs the sf0.001/sf0.01 gates
missed. This tool generates the NEXT magnitude: all 10 driver tables
(TESTDATA.md schema, column-for-column physical types) at any multiple
of the sf0.1 row counts, so `tools/verify_local.py <dir>` can run the
full Spark-vs-DuckDB oracle gate at sf1.0-equivalent scale.

The gate's power comes from MAGNITUDE, not distribution fidelity — both
engines read the SAME parquet, so any self-consistent corpus works —
but distributions still mirror the driver's (measured on
/root/testdata/sf0.1: prices 2dp in the same ranges, discount/tax
grids, exponential event values with mean 50, unit-norm 64-dim
embeddings in 10 clusters, word-salad documents with ~10% near-dups,
the same calendar spans) so every query keeps realistic selectivity and
group cardinalities. Deterministic: every value is a pure hash of the
row id — no rand(), no partitioning sensitivity.

Usage: PYTHONPATH=. python tools/gen_full_sf.py [--mult 10] [--out DIR]
(mult 10 = sf1.0 equivalent; writes DIR/{table}.parquet + _DONE marker)
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# sf0.1 row counts (measured on the driver's testdata)
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
    "users": 1_500,  # events.user_id domain, scales with events
}

REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
EVENT_TYPES = ("view", "click", "signup", "purchase", "error")
LANGS = ("en", "en", "de", "es", "fr", "zh")  # en ~2x weight, driver-like mix
P_ADJ = ("large", "hot", "blue", "small", "green", "red", "cold", "tiny")
P_NOUN = ("ring", "bolt", "nut", "screw", "washer", "gear", "pin", "cap")
P_TYPES = ("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query plan join shuffle stage task core disk read write "
    "merge spill skew cache row"
).split()


def _h(col, salt: int):
    """Deterministic uniform nonneg int from (col, salt)."""
    return F.abs(F.xxhash64(col, F.lit(salt)))


def _pick(col, salt: int, values):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_h(col, salt) % len(values) + 1).cast("int"))


def _pick_ordinal(idcol, values):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.col(idcol) + 1).cast("int"))


def gen(spark, out: str, mult: int) -> None:
    os.makedirs(out, exist_ok=True)
    n_cust = BASE["customer"] * mult
    n_supp = BASE["supplier"] * mult
    n_part = BASE["part"] * mult
    n_ord = BASE["orders"] * mult
    n_li = BASE["lineitem"] * mult
    n_ev = BASE["events"] * mult
    n_doc = BASE["documents"] * mult
    n_vec = BASE["embeddings"] * mult
    n_users = BASE["users"] * mult

    def write(df, name, parts=None):
        # single FILE per table (driver layout; verify_local's DuckDB
        # views read plain paths, not directory globs) — write the
        # one-part dir, then hoist the part file
        import glob as _glob

        tmp = os.path.join(out, f"_tmp_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(part, os.path.join(out, f"{name}.parquet"))
        shutil.rmtree(tmp, ignore_errors=True)

    write(
        spark.range(5).select(
            F.col("id").cast("int").alias("r_regionkey"),
            _pick_ordinal("id", REGIONS).alias("r_name"),
        ),
        "region",
        1,
    )
    write(
        spark.range(25).select(
            F.col("id").cast("int").alias("n_nationkey"),
            F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
            (F.col("id") % 5).cast("int").alias("n_regionkey"),
        ),
        "nation",
        1,
    )
    write(
        spark.range(n_cust).select(
            F.col("id").alias("c_custkey"),
            F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
            (_h("id", 101) % 25).cast("int").alias("c_nationkey"),
            # driver acctbal: uniform(-1000, 10000), 2dp
            ((_h("id", 102) % 1_100_001 - 100_000) / F.lit(100.0)).alias("c_acctbal"),
            _pick("id", 103, SEGMENTS).alias("c_mktsegment"),
        ),
        "customer",
    )
    write(
        spark.range(n_supp).select(
            F.col("id").alias("s_suppkey"),
            F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
            (_h("id", 111) % 25).cast("int").alias("s_nationkey"),
            ((_h("id", 112) % 1_100_001 - 100_000) / F.lit(100.0)).alias("s_acctbal"),
        ),
        "supplier",
    )
    write(
        spark.range(n_part).select(
            F.col("id").alias("p_partkey"),
            F.concat(
                _pick("id", 121, P_ADJ), F.lit(" "), _pick("id", 122, P_NOUN)
            ).alias("p_name"),
            F.concat(F.lit("Brand#"), (_h("id", 123) % 25)).alias("p_brand"),
            _pick("id", 124, P_TYPES).alias("p_type"),
            (_h("id", 125) % 50 + 1).cast("int").alias("p_size"),
            # driver pattern: 900.0 + key/10, 2dp (range stays sf-stable)
            (F.lit(900.0) + (F.col("id") % BASE["part"]) / F.lit(10.0)).alias(
                "p_retailprice"
            ),
        ),
        "part",
    )
    write(
        spark.range(n_ord).select(
            F.col("id").alias("o_orderkey"),
            (_h("id", 131) % n_cust).alias("o_custkey"),
            _pick("id", 132, ("F", "O", "P")).alias("o_orderstatus"),
            # driver: uniform 2dp in [1000, 500000]
            ((_h("id", 133) % 49_900_001 + 100_000) / F.lit(100.0)).alias(
                "o_totalprice"
            ),
            # driver span: 1995-01-01 .. 2001-08-01 (2404 days), midnight
            F.date_add(F.lit("1995-01-01").cast("date"), (_h("id", 134) % 2405).cast("int"))
            .cast("timestamp_ntz")
            .alias("o_orderdate"),
            _pick("id", 135, PRIORITIES).alias("o_orderpriority"),
        ),
        "orders",
    )
    write(
        spark.range(n_li).select(
            (_h("id", 141) % n_ord).alias("l_orderkey"),
            (_h("id", 142) % n_part).alias("l_partkey"),
            (_h("id", 143) % n_supp).alias("l_suppkey"),
            # driver: random 1..7 (NOT sequential within order)
            (_h("id", 144) % 7 + 1).cast("int").alias("l_linenumber"),
            (_h("id", 145) % 50 + 1).cast("double").alias("l_quantity"),
            # driver: uniform 2dp in [900.68, 104999.91] — use [900, 105000]
            ((_h("id", 146) % 10_410_001 + 90_000) / F.lit(100.0)).alias(
                "l_extendedprice"
            ),
            # driver grids: discount 0.00..0.10 (11 values), tax 0.00..0.08 (9)
            ((_h("id", 147) % 11) / F.lit(100.0)).alias("l_discount"),
            ((_h("id", 148) % 9) / F.lit(100.0)).alias("l_tax"),
            _pick("id", 149, ("A", "N", "R")).alias("l_returnflag"),
            _pick("id", 150, ("F", "O")).alias("l_linestatus"),
            # driver span: 1995-01-02 .. 2001-11-04 (2498 days), midnight
            F.date_add(F.lit("1995-01-02").cast("date"), (_h("id", 151) % 2499).cast("int"))
            .cast("timestamp_ntz")
            .alias("l_shipdate"),
        ),
        "lineitem",
    )
    # events: 30 days of Jan 2024 at MICROSECOND grain (driver ts has
    # nonzero micros everywhere); value ~ Exp(mean 50) rounded 2dp
    # (driver: mean 49.9, std 49.6, median 34.8, max ~560 at 100k rows)
    month_us = 30 * 86_400 * 1_000_000
    u = (_h("id", 161) % 1_000_000 + 1) / F.lit(1_000_001.0)  # (0,1]
    write(
        spark.range(n_ev).select(
            F.col("id").alias("event_id"),
            # 2024-01-01T00:00:00Z epoch-micros + uniform offset; the UTC
            # session makes the LTZ->NTZ cast a wall-clock no-op, and the
            # parquet physical type lands TIMESTAMP(MICROS, adj=false)
            # like the driver's events.ts
            F.timestamp_micros(
                F.lit(1_704_067_200_000_000) + (_h("id", 162) % month_us)
            ).cast("timestamp_ntz").alias("ts"),
            (_h("id", 163) % n_users).alias("user_id"),
            _pick("id", 164, EVENT_TYPES).alias("event_type"),
            F.round(-F.lit(50.0) * F.log(u), 2).alias("value"),
            F.format_string('{"k": %d}', (_h("id", 165) % 100).cast("int")).alias(
                "props"
            ),
        ),
        "events",
    )
    # documents: word-salad text over the 31-token vocabulary, ~10% of
    # docs near-copies of their predecessor (real near-dup structure),
    # n_chars = length(text) (driver invariant)
    words = F.array(*[F.lit(w) for w in VOCAB])
    def _salad(idcol):
        n_words = _h(idcol, 171) % 70 + 10
        return F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), n_words.cast("int")),
                lambda i: F.element_at(
                    words, (F.abs(F.xxhash64(idcol, i)) % len(VOCAB) + 1).cast("int")
                ),
            ),
        )
    prev = F.col("doc_id") - 1
    text = F.when(
        (F.col("doc_id") % 10 == 1) & (F.col("doc_id") > 0),
        F.concat(F.lit("dup "), _salad(prev)),
    ).otherwise(_salad(F.col("doc_id")))
    write(
        spark.range(n_doc)
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id",
            text.alias("text"),
            _pick("doc_id", 172, LANGS).alias("lang"),
            F.concat(F.lit("src"), (F.col("doc_id") % 20)).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long")),
        "documents",
    )
    # embeddings: unit-normalized 64-dim float with 10 label clusters
    # (cluster centroid offset + per-vector jitter, then L2-normalize —
    # driver vectors all have |v| = 1.0 ± 1e-7)
    dims = F.sequence(F.lit(1), F.lit(64))
    label = (_h("id", 181) % 10).cast("int")
    # the cluster offset keys on the SAME label expression, so
    # label-conditioned queries (hard negatives, maxsim, kmeans recall)
    # see true cluster structure
    raw = F.transform(
        dims,
        lambda i: (
            (F.abs(F.xxhash64(label, i, F.lit(182))) % 2001 - 1000)
            / F.lit(1000.0)
            + (F.abs(F.xxhash64("id", i, F.lit(183))) % 2001 - 1000) / F.lit(2000.0)
        ),
    )
    nrm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
    emb = F.transform(raw, lambda x: (x / nrm).cast("float"))
    write(
        spark.range(n_vec).select(
            F.col("id").alias("vec_id"),
            emb.alias("embedding"),
            label.alias("label"),
        ),
        "embeddings",
    )
    with open(os.path.join(out, "_DONE"), "w") as fh:
        fh.write(f"mult={mult}\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10, help="multiple of sf0.1 (10 = sf1.0)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    out = args.out or f"/tmp/fcs_full_sf/x{args.mult}"
    if os.path.exists(os.path.join(out, "_DONE")) and not args.force:
        print(f"already generated: {out}")
        return 0
    shutil.rmtree(out, ignore_errors=True)

    from flink_crawler_spark.session import get_spark

    spark = get_spark("gen_full_sf")
    spark.sparkContext.setLogLevel("ERROR")
    gen(spark, out, args.mult)
    for t in sorted(os.listdir(out)):
        if t.endswith(".parquet"):
            n = spark.read.parquet(os.path.join(out, t)).count()
            print(f"{t}: {n} rows")
    print(f"done: {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
