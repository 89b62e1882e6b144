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
    # --- r6 rotation (round-5 verdict task 1): ALL 50 slots drawn from
    # the 121 oracled queries the driver has never verified (155/282 seen
    # across r1-r5).  This window burns the never-seen backlog down to 71
    # (77 incl. the six rows-only ANN/sketch queries, which by design get
    # the weaker check whenever they rotate in).  Every r5-window row
    # rotated OUT (all were driver-green r5; still covered by the local
    # gate + pytest + bench).  Composition per the verdict: the queued
    # SQL-breadth rows, robots_crawl_delay_budget (last never-seen §2
    # query), stream_incremental_mv / hits_hub_authority /
    # redirect_chain_resolve, and the heaviest wave-9..33 pipeline +
    # statistics queries.  All 50 green on the stricter local gate at
    # sf0.01 before this rotation (tools/verify_local.py).
    #
    # r7 backlog (71 oracled, never driver-seen after this window —
    # rotate 50 of these next round, the rest + the 6 rows-only ANN/
    # sketch queries in r8): doc_entropy_score, ccnet_bigram_nll,
    # filter_agreement_matrix, word_rank_curve, embedding_outlier_prune,
    # cross_source_contamination, tokenizer_fertility_by_lang,
    # random_projection_embed, near_dup_cluster_histogram,
    # excerpt_containment_pairs, shard_balance_report, rfm_user_segments,
    # pareto_skyline_orders, event_cusum_alarms, zorder_layout_stats,
    # event_markov_transitions, weighted_median_price,
    # session_max_concurrency, association_rules_pairs,
    # anova_f_event_values, seasonal_decompose_weekly,
    # kaplan_meier_conversion, woe_iv_price_bins,
    # ols_price_on_qty_discount, chi_square_priority_status,
    # psi_price_drift, benford_price_digits, acf_daily_revenue,
    # naive_bayes_lang_classify, info_gain_feature_rank,
    # ewma_smoothed_revenue, embedding_dim_stats, hill_tail_index,
    # gumbel_topk_sample, target_encoding_loo, dp_laplace_counts,
    # ngram_novelty_score, class_balanced_downsample,
    # cdc_changelog_apply, ipw_treatment_effect, brier_calibration_bins,
    # auc_urgent_by_price, matryoshka_truncation_recall,
    # near_dup_threshold_sweep, welch_t_test_price,
    # filter_kappa_agreement, ndcg_same_label_eval, mann_kendall_trend,
    # lift_gains_deciles, source_diversity_indices,
    # minhash_estimate_calibration, winsorized_mean_price,
    # rolling_quantile_band_alarms, query_likelihood_retrieval,
    # simpson_paradox_check, zipf_fit_slope, user_burstiness_index,
    # fano_factor_daily, entropy_rate_markov, dedup_survivor_quality,
    # conformal_prediction_interval, cuped_variance_reduction,
    # mcnemar_gate_test, shapley_two_feature, worst_group_metric,
    # ab_srm_check, session_gap_sensitivity,
    # purchase_attribution_models, dau_mau_stickiness,
    # slo_latency_report, error_budget_burn.
    # Rows-only (⊘ by design): ann_topk_lsh, ann_topk_ivf,
    # embedding_near_dup_lsh, ann_recall_report, hll_distinct_users,
    # approx_percentile_prices.
    # --- SQL breadth / analytics backlog (never driver-seen) ---
    "hierarchical_time_rollup",
    "corpus_token_stats",
    "bigram_lift_top100",
    "kmv_set_algebra",
    "funnel_view_click_purchase",
    "customer_snapshot_diff",
    "corr_qty_price_exact",
    "doc_meta_map_explode",
    "cohort_retention_weekly",
    "rolling_7d_distinct_users",
    "pivot_priority_by_year",
    "customer_set_ops",
    "gap_fill_daily_revenue",
    "order_rank_distributions",
    "mad_price_by_flag",
    "locf_fill_daily",
    "price_range_density",
    "unpivot_priority_metrics",
    "nullsafe_join_semantics",
    "order_quantity_hof",
    "weekday_revenue_profile",
    "explode_outer_semantics",
    "hourly_weekday_heatmap",
    "price_histogram_buckets",
    "quartiles_one_pass",
    # --- §2 crawl core: the one never-driver-seen §2 query ---
    "robots_crawl_delay_budget",
    # --- named by the r5 verdict ---
    "stream_incremental_mv",
    "hits_hub_authority",
    "redirect_chain_resolve",
    "theil_sen_trend",
    "softdedup_loss_weights",
    "coverage_budget_curve",
    "graph_jaccard_link_prediction",
    # --- heaviest never-seen pipeline / retrieval / stats ---
    "ks_two_sample_price",
    "poisson_bootstrap_ci",
    "facility_location_select",
    "ccnet_perplexity_buckets",
    "rrf_rank_fusion",
    "dbscan_core_points",
    "margin_mnn_pairs",
    "hard_negative_mining",
    "maxsim_label_retrieval",
    "bm25_search_topk",
    "stupid_backoff_score",
    "systematic_pps_sample",
    "length_bucket_packing",
    "embedding_int8_quantize",
    "temporal_split_embargo",
    "quality_dedup_calibration",
    "incremental_mv_refresh",
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
