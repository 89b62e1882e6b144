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
    # --- r5 rotation: ALL 50 slots drawn from the 74 oracled queries the
    # driver has never verified (r4 verdict task 1 — 105/185 seen across
    # r1-r4; this window burns the unseen backlog down to 24, all of them
    # plain-aggregate SQL-breadth rows left for r6). Every r4-window row
    # rotated OUT (all were driver-green r4; still covered by the local
    # gate + pytest + bench).
    # r6 backlog (never driver-seen after this window): the 24 SQL-breadth
    # rows noted in round-5 records PLUS the wave-9..12 additions
    # (systematic_pps_sample, length_bucket_packing,
    # embedding_int8_quantize, stupid_backoff_score, bm25_search_topk,
    # redirect_chain_resolve, incremental_mv_refresh,
    # quality_dedup_calibration, maxsim_label_retrieval,
    # temporal_split_embargo, robots_crawl_delay_budget,
    # facility_location_select, stream_incremental_mv, rfm_user_segments)
    # wave 13 (pareto_skyline_orders, event_cusum_alarms), and wave 14
    # (zorder_layout_stats, event_markov_transitions,
    # weighted_median_price, session_max_concurrency), and wave 15
    # (association_rules_pairs, rrf_rank_fusion, anova_f_event_values,
    # seasonal_decompose_weekly), and wave 16 (poisson_bootstrap_ci,
    # kaplan_meier_conversion, woe_iv_price_bins, theil_sen_trend),
    # and wave 17 (ols_price_on_qty_discount, chi_square_priority_status,
    # psi_price_drift, ks_two_sample_price), and wave 18
    # (softdedup_loss_weights, hard_negative_mining, benford_price_digits,
    # acf_daily_revenue), and wave 19 (naive_bayes_lang_classify,
    # info_gain_feature_rank, ewma_smoothed_revenue, dbscan_core_points),
    # and wave 20 (embedding_dim_stats, margin_mnn_pairs, hill_tail_index,
    # gumbel_topk_sample), and wave 21 (target_encoding_loo,
    # dp_laplace_counts, ngram_novelty_score, class_balanced_downsample),
    # and wave 22 (cdc_changelog_apply, ipw_treatment_effect,
    # brier_calibration_bins, auc_urgent_by_price), and wave 23
    # (matryoshka_truncation_recall, near_dup_threshold_sweep,
    # welch_t_test_price, filter_kappa_agreement), and wave 24
    # (ndcg_same_label_eval, mann_kendall_trend, lift_gains_deciles,
    # source_diversity_indices), and wave 25 (minhash_estimate_calibration,
    # winsorized_mean_price, rolling_quantile_band_alarms), and wave 26
    # (query_likelihood_retrieval, graph_jaccard_link_prediction,
    # simpson_paradox_check), and wave 27 (zipf_fit_slope,
    # user_burstiness_index, fano_factor_daily), and wave 28
    # (coverage_budget_curve, entropy_rate_markov, dedup_survivor_quality),
    # and wave 29 (conformal_prediction_interval, cuped_variance_reduction,
    # mcnemar_gate_test), and wave 30 (shapley_two_feature,
    # worst_group_metric), and wave 31 (ab_srm_check,
    # session_gap_sensitivity), and wave 32 (purchase_attribution_models,
    # dau_mau_stickiness), and wave 33 (slo_latency_report,
    # error_budget_burn)
    # — all green on the stricter local gate at sf0.001 AND sf0.01.
    # --- §2 crawl core (never driver-seen) ---
    "frontier_refetch_due",       # continuous re-crawl admission (new r4)
    "crawl_reachability_rcte",    # §2.14 loop, declarative recursive-CTE twin
    "sitemap_failed_report",      # F4 failed-sitemap surfacing
    "html_tree_parse",            # U1 structural HTML parse
    "html_outlink_extract_udtf",  # §2.15 UDTF extension surface
    "skew_salted_join",           # hot-PLD skew mitigation
    # --- graph / iterative ---
    "pagerank_5iter",
    "sssp_bellman_ford",
    "copurchase_triangles",
    # --- streaming (6 never-seen surfaces; verdict task 7 asked ≥3) ---
    "stream_stream_left_join",
    "stream_window_counts_append",
    "stream_dedup_within_watermark",
    "stream_update_mode_counts",
    "stream_static_join",
    "stream_rate_gauge",
    "stream_quality_gate_counts",
    "sessionize_session_window_batch",
    # --- dedup family (never-seen members) ---
    "doc_simhash",
    "ngram_jaccard_pairs",
    "fuzzy_name_pairs",
    "near_dup_keep_best",
    "doc_fingerprint",
    "hash_stratified_sample",
    "cluster_stratified_sample",
    # --- text / curation (never-seen members) ---
    "doc_quality_features",
    "doc_filter_pipeline",
    "doc_repetition_filter",
    "doc_pii_redact",
    "doc_chunk_sliding",
    "segment_boilerplate_filter",
    "model_quality_classifier",
    "corpus_mix_budget",
    "dataset_card_rollup",
    "doc_bpe_pretoken",
    "bpe_merge_candidates",
    "vocab_coverage",
    # --- similarity ---
    "ann_topk_pq_adc",
    # --- multimodal (never-seen members) ---
    "media_decode_stats",
    "audio_chunk_energy",
    "media_feature_fold",
    "media_resize_stub",
    # --- sources / formats (never-seen roundtrips) ---
    "json_sink_source_roundtrip",
    "csv_sink_source_roundtrip",
    "orc_sink_source_roundtrip",
    "json_props_extract",
    "variant_props_extract",
    # --- SQL breadth (hardest never-seen analytic shapes) ---
    "order_gap_islands",
    "scd2_versioned_revenue",
    "grouping_sets_priority_status",
    "quantity_bag_ops",
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
