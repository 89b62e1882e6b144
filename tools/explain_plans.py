"""Plan-quality audit (the reference's dot-file topology dump, W4).

Dumps `explain(formatted)` for registered queries and flags physical-plan
smells: scans without pushed filters where the query filters, nested-loop
joins, missing codegen, full sorts where top-k was intended.

Usage: python tools/explain_plans.py [query ...]   (default: key queries)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_QUERIES = [
    "pricing_summary",
    "revenue_by_region",
    "shipping_priority_q3",
    "crawl_merge_lattice",
    "frontier_topk",
    "topk_orders_global",
    "seen_urls_semi_join",
    "lsh_candidate_pairs",
    "surt_cdx_lookup",
    "moving_avg_10",
    "forecast_revenue_q6",
    "volume_shipping_q7",
    "customer_distribution_q13",
    "top_supplier_q15",
    "disjunctive_revenue_q19",
    "order_priority_exists_q4",
    "min_cost_supplier_q2",
    "bloom_bucket_prefilter",
    "kmv_distinct_custkey_monthly",
    "grouping_sets_priority_status",
    "pivot_priority_by_year",
    "gap_fill_daily_revenue",
    "tfidf_top_terms",
    "funnel_view_click_purchase",
    "customer_snapshot_diff",
    "json_props_extract",
    "copurchase_triangles",
    "bigram_lift_top100",
    "skew_salted_join",
    "partitioned_parquet_pruning",
]

# queries that intentionally attach a 1-row scalar (threshold/average)
# via broadcast cross join — BroadcastNestedLoopJoin with a single-row
# build side is O(n) and shuffle-free, the right plan for the pattern
SCALAR_BROADCAST_OK = {
    "idle_customers_q22",
    "nation_balance_share_q11",
    "market_share_q8",
    # 1-row bucket-bitmap / bounds builds attached via broadcast cross join
    "bloom_bucket_prefilter",
    "gap_fill_daily_revenue",
    "tfidf_top_terms",
}


def audit(name: str, plan: str) -> list[str]:
    notes = []
    if "BroadcastNestedLoopJoin" in plan and name not in SCALAR_BROADCAST_OK:
        notes.append("BroadcastNestedLoopJoin present (cartesian-ish; OK only for theta joins or 1-row scalar broadcasts)")
    if re.search(r"\bSortMergeJoin\b", plan) and "broadcast" in name:
        notes.append("sort-merge join where broadcast expected")
    if "TakeOrderedAndProject" not in plan and re.search(r"\btopk|priority_q3", name):
        notes.append("top-k query without TakeOrderedAndProject (full sort?)")
    if "PushedFilters: []" in plan and re.search(r"Filter", plan):
        notes.append("scan with empty PushedFilters under a Filter node")
    # AQE plans print `isFinalPlan=false` before execution and only then
    # annotate codegen ids — absence of codegen markers is meaningful
    # only for non-adaptive plans
    if "codegen id" not in plan and "AdaptiveSparkPlan" not in plan:
        notes.append("no WholeStageCodegen span")
    return notes


def main() -> int:
    from flink_crawler_spark import queries as q
    from flink_crawler_spark.session import get_spark

    spark = get_spark("explain", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    names = sys.argv[1:] or KEY_QUERIES
    any_notes = False
    for name in names:
        df = q.REGISTRY[name].fn(spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        print(f"\n{'='*70}\n{name}\n{'='*70}")
        print(plan)
        for note in audit(name, plan):
            any_notes = True
            print(f"  !! {note}")
    return 1 if any_notes else 0


if __name__ == "__main__":
    sys.exit(main())
