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
    # --- r7 rotation (round-6 verdict task 1): ALL 50 slots drawn from
    # the 71 oracled queries the driver has never verified (205/282 seen
    # across r1-r6).  This window burns the never-seen backlog down to 21
    # oracled (27 incl. the six rows-only ANN/sketch queries) — rotate
    # those in r8.  Every r6-window row rotated OUT (all driver-green r6;
    # still covered by the local gate + pytest + bench).  Composition per
    # the verdict: the heaviest/trickiest first (near-dup sweep, survivor
    # audit, containment, contamination, ccnet, novelty, minhash
    # calibration, KM survival, skyline, seasonal decompose), then the
    # waves-16..33 statistics/eval family.  All 50 green on the stricter
    # local gate at sf0.01 before this rotation (tools/verify_local.py).
    #
    # r8 backlog (21 oracled, never driver-seen after this window):
    # doc_entropy_score, filter_agreement_matrix, word_rank_curve,
    # embedding_outlier_prune, random_projection_embed,
    # near_dup_cluster_histogram, shard_balance_report, rfm_user_segments,
    # event_cusum_alarms, zorder_layout_stats, event_markov_transitions,
    # weighted_median_price, session_max_concurrency,
    # association_rules_pairs, anova_f_event_values, gumbel_topk_sample,
    # embedding_dim_stats, hill_tail_index, dau_mau_stickiness,
    # error_budget_burn, worst_group_metric.
    # Rows-only (⊘ by design): ann_topk_lsh, ann_topk_ivf,
    # embedding_near_dup_lsh, ann_recall_report, hll_distinct_users,
    # approx_percentile_prices.
    # --- verdict-named heaviest/trickiest ---
    "near_dup_threshold_sweep",
    "dedup_survivor_quality",
    "excerpt_containment_pairs",
    "cross_source_contamination",
    "ccnet_bigram_nll",
    "ngram_novelty_score",
    "minhash_estimate_calibration",
    "kaplan_meier_conversion",
    "pareto_skyline_orders",
    "seasonal_decompose_weekly",
    # --- corpus / retrieval / tokenizer ---
    "tokenizer_fertility_by_lang",
    "query_likelihood_retrieval",
    "matryoshka_truncation_recall",
    "naive_bayes_lang_classify",
    "class_balanced_downsample",
    "target_encoding_loo",
    "dp_laplace_counts",
    "cdc_changelog_apply",
    "source_diversity_indices",
    "lift_gains_deciles",
    "ndcg_same_label_eval",
    "filter_kappa_agreement",
    # --- statistics / eval (waves 16-33) ---
    "ols_price_on_qty_discount",
    "chi_square_priority_status",
    "psi_price_drift",
    "benford_price_digits",
    "acf_daily_revenue",
    "ewma_smoothed_revenue",
    "info_gain_feature_rank",
    "welch_t_test_price",
    "mann_kendall_trend",
    "winsorized_mean_price",
    "rolling_quantile_band_alarms",
    "simpson_paradox_check",
    "zipf_fit_slope",
    "user_burstiness_index",
    "fano_factor_daily",
    "entropy_rate_markov",
    "conformal_prediction_interval",
    "cuped_variance_reduction",
    "mcnemar_gate_test",
    "shapley_two_feature",
    "ab_srm_check",
    "session_gap_sensitivity",
    "purchase_attribution_models",
    "slo_latency_report",
    "ipw_treatment_effect",
    "brier_calibration_bins",
    "auc_urgent_by_price",
    "woe_iv_price_bins",
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
