"""Wave-13 operators: invariants beyond the DuckDB value oracles —
the skyline is cross-checked against the quadratic dominance
definition, CUSUM against a literal replay of Page's recurrence."""

from __future__ import annotations

import decimal
from collections import defaultdict

from pyspark.sql import functions as F

from flink_crawler_spark.operators.partitioning import distributed_running_max
from flink_crawler_spark.queries.base import t
from flink_crawler_spark.queries.pipelineq12 import (
    event_cusum_alarms,
    pareto_skyline_orders,
)


def test_skyline_matches_quadratic_dominance(spark, sf_dir):
    pts = [
        (r["o_orderkey"], r["price"], r["order_ms"])
        for r in t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.unix_millis(F.col("o_orderdate").cast("timestamp_ltz")).alias(
                "order_ms"
            ),
        )
        .collect()
    ]
    expected = set()
    for k, p, d in pts:
        dominated = any(
            p2 <= p and d2 >= d and (p2 < p or d2 > d) for _, p2, d2 in pts
        )
        if not dominated:
            expected.add(k)
    got = {r["o_orderkey"] for r in pareto_skyline_orders(spark, sf_dir).collect()}
    assert got == expected


def test_distributed_running_max_equals_window(spark):
    from pyspark.sql import Window

    df = spark.range(500).select(
        F.col("id"),
        ((F.col("id") * 37 + 11) % 101).alias("v"),
    )
    got = {
        r["id"]: r["rm"]
        for r in distributed_running_max(df, [F.col("id")], "v", out="rm").collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["id"]: r["rm"]
        for r in df.withColumn("rm", F.max("v").over(w)).collect()
    }
    assert got == want


def test_cusum_matches_recurrence_replay(spark, sf_dir):
    rows = event_cusum_alarms(spark, sf_dir).collect()
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_millis(cast(ts as timestamp_ltz)) div 86400000").alias("dayn"),
        F.round(F.col("value"), 6).cast("decimal(28,6)").alias("v"),
    ).collect()
    daily: dict = defaultdict(lambda: defaultdict(decimal.Decimal))
    for r in ev:
        daily[r["user_id"]][r["dayn"]] += r["v"]
    all_x = [x for per in daily.values() for x in per.values()]
    k = decimal.Decimal(
        str(round(float(sum(all_x)) / len(all_x), 6))
    )
    h = 2 * k
    by_user = {}
    for u, per in daily.items():
        s = decimal.Decimal(0)
        max_s, alarm = decimal.Decimal(0), -1
        for dayn in sorted(per):
            s = max(decimal.Decimal(0), s + per[dayn] - k)
            max_s = max(max_s, s)
            if alarm == -1 and s > h:
                alarm = dayn
        by_user[u] = (len(per), float(max_s), alarm)
    assert len(rows) == len(by_user)
    saw_alarm = saw_quiet = False
    for r in rows:
        n, ms, al = by_user[r["user_id"]]
        assert r["n_days"] == n, r
        assert abs(r["max_s"] - ms) < 1e-6, (r, ms)
        assert r["alarm_day"] == al, (r, al)
        saw_alarm |= al != -1
        saw_quiet |= al == -1
    # the threshold separates users (both outcomes occur on this data)
    assert saw_alarm and saw_quiet
