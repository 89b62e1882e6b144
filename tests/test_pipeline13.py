"""Wave-14 operators: invariants beyond the DuckDB value oracles — the
keyed prefix sum against a plain window, z-order's bounding-area
advantage, Markov row-stochasticity + a literal sequence replay, the
weighted median and sweep-line concurrency against brute-force."""

from __future__ import annotations

import decimal
from collections import defaultdict

from pyspark.sql import functions as F

from flink_crawler_spark.operators.partitioning import distributed_keyed_running_sum
from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq13 import (
    DAY_MS,
    GAP_MS,
    event_markov_transitions,
    session_max_concurrency,
    weighted_median_price,
    zorder_layout_stats,
)


def test_keyed_running_sum_equals_window(spark):
    from pyspark.sql import Window

    # 3 skewed keys over 2000 rows — keys span many range partitions
    df = spark.range(2000).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").alias("o"),
        ((F.col("id") * 7) % 13).alias("v"),
    )
    got = {
        (r["k"], r["o"]): r["rs"]
        for r in distributed_keyed_running_sum(
            df, ["k"], [F.col("o")], "v", out="rs"
        ).collect()
    }
    w = (
        Window.partitionBy("k")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["k"], r["o"]): r["rs"]
        for r in df.withColumn("rs", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_zorder_bounds_both_dims(spark, sf_dir):
    rows = zorder_layout_stats(spark, sf_dir).collect()
    by_layout = defaultdict(list)
    for r in rows:
        by_layout[r["layout"]].append(r)
    assert len(by_layout["zorder"]) > 16 and len(by_layout["linear"]) > 16

    # both layouts tile the same total area; z-order's win is BALANCED
    # per-dimension spans (~8192x8192 tiles), so a date-band predicate
    # prunes most z-buckets while pruning NO custkey-sorted bucket
    lo, hi = 20000, 24095  # normalized-date band, width 4096

    def survivors(rs):
        return sum(1 for r in rs if r["min_y"] <= hi and r["max_y"] >= lo)

    z_surv = survivors(by_layout["zorder"])
    l_surv = survivors(by_layout["linear"])
    assert z_surv <= len(by_layout["zorder"]) // 2
    assert l_surv >= 0.9 * len(by_layout["linear"])
    # balanced spans: mean x-span and y-span within 4x of each other
    zx = sum(r["max_x"] - r["min_x"] + 1 for r in by_layout["zorder"])
    zy = sum(r["max_y"] - r["min_y"] + 1 for r in by_layout["zorder"])
    assert zx < 4 * zy and zy < 4 * zx
    # custkey-sorted buckets span essentially the whole date axis
    ymin = min(r["min_y"] for r in rows)
    ymax = max(r["max_y"] for r in rows)
    lin_yspan = sum(
        r["max_y"] - r["min_y"] + 1 for r in by_layout["linear"]
    ) / len(by_layout["linear"])
    assert lin_yspan > 0.8 * (ymax - ymin + 1)


def test_markov_replay_and_row_stochastic(spark, sf_dir):
    rows = event_markov_transitions(spark, sf_dir).collect()
    by_src = defaultdict(float)
    for r in rows:
        by_src[r["src"]] += r["prob"]
    for src, tot in by_src.items():
        assert abs(tot - 1.0) < 1e-6, (src, tot)
    ev = sorted(
        t(spark, sf_dir, "events")
        .select("user_id", "event_type", F.expr(
            "unix_millis(cast(ts as timestamp_ltz))").alias("ms"), "event_id")
        .collect(),
        key=lambda r: (r["user_id"], r["ms"], r["event_id"]),
    )
    counts: dict = defaultdict(int)
    for a, b in zip(ev, ev[1:]):
        if a["user_id"] == b["user_id"]:
            counts[(a["event_type"], b["event_type"])] += 1
    assert {(r["src"], r["dst"]): r["cnt"] for r in rows} == dict(counts)


def test_weighted_median_brute_force(spark, sf_dir):
    rows = weighted_median_price(spark, sf_dir).collect()
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round("l_extendedprice", 2).cast("decimal(18,2)").alias("p"),
        F.round("l_quantity", 2).cast("decimal(18,2)").alias("w"),
    ).collect()
    per: dict = defaultdict(list)
    for r in li:
        per[r["l_returnflag"]].append((r["p"], r["w"]))
    assert len(rows) == len(per)
    for r in rows:
        pts = sorted(per[r["l_returnflag"]])
        tot = sum(w for _, w in pts)
        cum = decimal.Decimal(0)
        med = None
        for p, w in pts:
            cum += w
            if 2 * cum >= tot:
                med = p
                break
        assert float(med) == r["w_median"]
        assert float(tot) == r["total_w"]


def test_concurrency_brute_force(spark, sf_dir):
    rows = {r["dayn"]: r for r in session_max_concurrency(spark, sf_dir).collect()}
    ev = sorted(
        t(spark, sf_dir, "events")
        .select("user_id", F.expr(
            "unix_millis(cast(ts as timestamp_ltz))").alias("ms"), "event_id")
        .collect(),
        key=lambda r: (r["user_id"], r["ms"], r["event_id"]),
    )
    sessions = []
    cur_user, t0, t1 = None, None, None
    for r in ev:
        if r["user_id"] != cur_user or r["ms"] - t1 > GAP_MS:
            if cur_user is not None:
                sessions.append((t0, t1))
            cur_user, t0 = r["user_id"], r["ms"]
        t1 = r["ms"]
    sessions.append((t0, t1))
    # concurrency at every session boundary instant, clipped per day
    days = sorted({d for s, e in sessions for d in range(s // DAY_MS, e // DAY_MS + 1)})
    for day in days:
        d0, d1 = day * DAY_MS, (day + 1) * DAY_MS - 1
        segs = [
            (max(s, d0), min(e, d1)) for s, e in sessions if s <= d1 and e >= d0
        ]
        instants = {x for s, e in segs for x in (s, e)}
        best = max(
            sum(1 for s, e in segs if s <= x <= e) for x in instants
        )
        assert rows[day]["max_conc"] == best, day
        assert rows[day]["n_sessions"] == len(segs), day
    assert set(rows) == set(days)
