"""Declared query registry — the correctness gate.

Every operator claimed in SURVEY.md §2 (plus the training-data-pipeline
extensions) is exercised here as a (Spark callable, DuckDB oracle SQL)
pair over the driver's star-schema testdata. The driver compares
row-count + schema + order-insensitive value hash at sf=0.01.

Queries with ``oracle=None`` are non-SQL-expressible (streaming state,
LSH approximations whose candidate sets are engine-internal) and get the
weaker rows-only check.
"""

from __future__ import annotations

from .base import REGISTRY, QueryPair, register  # noqa: F401

# import for registration side effects
from . import core  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import tpch2  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import urlq  # noqa: E402,F401
from . import textops  # noqa: E402,F401
from . import dedupq  # noqa: E402,F401
from . import simq  # noqa: E402,F401
from . import streamq  # noqa: E402,F401
from . import crawlq  # noqa: E402,F401
from . import multimodalq  # noqa: E402,F401
from . import sketchq  # noqa: E402,F401
from . import analytics2  # noqa: E402,F401
from . import sqlbreadth  # noqa: E402,F401
from . import sourcesq  # noqa: E402,F401
from . import pipelineq  # noqa: E402,F401
from . import pipelineq2  # noqa: E402,F401
from . import pipelineq3  # noqa: E402,F401
from . import textops2  # noqa: E402,F401
from . import streamq2  # noqa: E402,F401
from . import extq  # noqa: E402,F401
from . import pipelineq4  # noqa: E402,F401
from . import pipelineq5  # noqa: E402,F401
from . import pipelineq6  # noqa: E402,F401
from . import pipelineq7  # noqa: E402,F401
from . import pipelineq8  # noqa: E402,F401
from . import pipelineq9  # noqa: E402,F401
from . import pipelineq10  # noqa: E402,F401
from . import pipelineq11  # noqa: E402,F401
from . import pipelineq12  # noqa: E402,F401
from . import pipelineq13  # noqa: E402,F401
from . import pipelineq14  # noqa: E402,F401
from . import pipelineq15  # noqa: E402,F401
from . import pipelineq16  # noqa: E402,F401
from . import pipelineq17  # noqa: E402,F401
from . import pipelineq18  # noqa: E402,F401
from . import pipelineq19  # noqa: E402,F401
from . import pipelineq20  # noqa: E402,F401
from . import pipelineq21  # noqa: E402,F401
from . import pipelineq22  # noqa: E402,F401
from . import pipelineq23  # noqa: E402,F401
from . import pipelineq24  # noqa: E402,F401
from . import pipelineq25  # noqa: E402,F401
from . import pipelineq26  # noqa: E402,F401
from . import pipelineq27  # noqa: E402,F401
from . import pipelineq28  # noqa: E402,F401
from . import pipelineq29  # noqa: E402,F401
from . import pipelineq30  # noqa: E402,F401
from . import pipelineq31  # noqa: E402,F401
from . import pipelineq32  # noqa: E402,F401


# The driver's CORRECTNESS check covers the first 50 queries in the order
# `queries()` yields them (round-1 verdict: positions 1-50 only).  Emit a
# curated window first so the hard driver signal lands on one-or-more
# representatives of EVERY SURVEY §2 family (normalize/validate/robots/
# parse/sitemap/CDX/crawl-loop/merge/frontier/windows/politeness/joins/
# streaming) and every LLM-pipeline family (dedup, similarity, text,
# multimodal, sketch, sources).  Everything else follows in registration
# order and is still verified by bench + pytest.
PRIORITY_WINDOW = [
    # --- r12 rotation (OPTIMIZATION round; r11 verdict task 2 +
    # changed-queries-first rule). 119 queries changed since the r11
    # window went green (the full dsum_wide migration sweep + this
    # round's ~40 optimization restructures) — far more than 50 slots,
    # so slots 1-39 take the most-RESTRUCTURED queries (driver folds,
    # boundary-key probes, shared-materialization reuse, action folds,
    # window-elimination rewrites — the changes most able to drift if
    # wrong); the remaining changed set is call-site-mechanical (dsum
    # rename/parse-expression forms) and is covered by this round's
    # full 282-query sf0.001 + sf0.1 gates and the sf1.0-equivalent
    # magnitude gate recorded in OPTIMIZATION_r12.md. Every change
    # was individually value-oracled at sf0.001 + sf0.01 when made.
    "facility_location_select",   # driver greedy on collected decimal proxy
    "hits_hub_authority",         # driver fold (modulo-bounded graph)
    "sssp_bellman_ford",          # driver min-plus fold
    "theil_sen_trend",            # numpy exact k-selection
    "winsorized_mean_price",      # distributed_order_statistics
    "conformal_prediction_interval",  # targeted order statistic
    "weighted_median_price",      # driver-located crossing partitions
    "rfm_user_segments",          # quintile boundary-key probes
    "lift_gains_deciles",         # decile boundary-key probes
    "customer_deciles",           # decile boundary-key probes
    "length_bucket_packing",      # decile boundary-key probes
    "quality_dedup_calibration",  # decile boundary-key probes
    "graph_jaccard_link_prediction",  # wedge broadcast + one keyed exchange
    "margin_mnn_pairs",           # pair-table spread, margin unpin
    "rrf_rank_fusion",            # pinned 20-row top-k heads
    "bm25_search_topk",           # one tokenize pass
    "curation_funnel",            # pinned funnel stage outputs
    "coverage_budget_curve",      # spread scan + pinned rank table
    "random_projection_embed",    # one-selectExpr JL chain
    "ann_recall_report",          # one-action unioned report
    "sessionize_grouped_map",     # slim Arrow boundary, numpy kernel
    "stupid_backoff_score",       # spread tokenize scan
    "stream_url_db_merge",        # vectorized state kernel
    "crawl_reachability",         # keep_parsed=False + memoized trees
    "bucketed_state_merge",       # crawl_obs spread-before-render
    "kmv_set_algebra",            # 6 driver actions -> 1 collected union
    "benchmark_contamination",    # spread scan + unpinned grams
    "cross_source_contamination", # shared verified-pairs reuse
    "leakage_safe_split",         # shared near_dup_clusters reuse
    "near_dup_clusters",          # rides shared sigs/verified pairs
    "near_dup_threshold_sweep",   # single-consumer unpin
    "matryoshka_truncation_recall",  # single-consumer unpin
    "bigram_lift_top100",         # map-only in-array pairing (window gone)
    "association_rules_pairs",    # four-consumer unpin (ReuseExchange)
    "minhash_estimate_calibration",  # shared signature table
    "excerpt_containment_pairs",  # shared signature table
    "anova_f_event_values",       # sf1.0-gate find: ssb/ssw floor-idiom
    # (ngram_jaccard_pairs' shared-sig change is exercised in-window by
    # minhash_estimate_calibration + near_dup_clusters, which consume
    # the same memoized signature/pair chain)
    "doc_simhash",                # parsed-SQL 60-bit expression tree
    "simhash_near_dup_pairs",     # parsed-SQL 60-bit expression tree
    # --- slots 40-50: the 11 r5-vintage leftovers named by the r11
    # verdict (task 2) — after this round no cumulative green row is
    # older than r6. Four of them also changed this round (skew_salted
    # join's Spark-side wide-form fix; stream_static_join /
    # stream_window_counts_append / variant_props_extract touched by
    # the dsum sweep), so they satisfy both rules at once.
    "sessionize_session_window_batch",
    "sitemap_failed_report",
    "skew_salted_join",
    "stream_dedup_within_watermark",
    "stream_quality_gate_counts",
    "stream_rate_gauge",
    "stream_static_join",
    "stream_update_mode_counts",
    "stream_window_counts_append",
    "variant_props_extract",
    "vocab_coverage",
]


def _ordered() -> dict[str, QueryPair]:
    missing = [n for n in PRIORITY_WINDOW if n not in REGISTRY]
    assert not missing, f"PRIORITY_WINDOW names not registered: {missing}"
    out = {n: REGISTRY[n] for n in PRIORITY_WINDOW}
    out.update((n, p) for n, p in REGISTRY.items() if n not in out)
    return out


def queries():
    return {name: pair.fn for name, pair in _ordered().items()}


def oracle_sql():
    return {name: pair.oracle for name, pair in _ordered().items() if pair.oracle is not None}
