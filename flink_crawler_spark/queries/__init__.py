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
    # --- r11 rotation (round-10 verdict task 1; plan was written here
    # in r10 and is executed verbatim, changed-queries-first rule
    # applied): slots 1-2 are the two queries CHANGED this round —
    # both gained loud magnitude guards (r10 ADVICE): ewma asserts the
    # 2^53 floor(x*1e6+0.5) exactness bound per row; cusum fails loudly
    # instead of Spark's silent non-ANSI NULL when a window sum would
    # overflow the pinned DECIMAL(28,6). Results are unchanged where
    # the guards pass (re-verified sf0.001 + sf0.01 + full sf0.1 gate),
    # but the code change voids their r10 green rows.
    "ewma_smoothed_revenue",
    "event_cusum_alarms",
    # slots 3-5: the dsum_wide fixes — the first sf1.0-equivalent
    # magnitude gate (tools/gen_full_sf.py corpus, SCALE.md r11) caught
    # the dsum one-step DECIMAL->DOUBLE cast diverging by 1 ulp between
    # engines once |sum|*1e6 > 2^53 (revenue sums ~3-6e10 at sf1.0);
    # these three now ride the floor-split wide form on both sides,
    # re-verified value-exact at sf0.001/sf0.01/sf0.1/x1/x10.
    "pricing_summary",
    "revenue_by_region",
    "revenue_rollup",
    # slots 6-8: second wave of sf1.0-gate finds. gumbel/dp_laplace: a
    # bare 0.5 literal made Spark type the md5-uniform DECIMAL(12,10)
    # (u truncated to 10 digits) while DuckDB computed the exact double;
    # the Gumbel key's 1/(u ln u) amplification near u->1 turned that
    # into 6dp flips at 50k docs. Now e0 literals -> exact identical u.
    # dbscan: the != pair join streamed a 1-partition localCheckpoint
    # through BroadcastNestedLoopJoin (the r5 single-split trap) -> the
    # 400M-pair kernel ran ONE task at 20k vectors; ensure_parallelism
    # fixes it (x10 spark side >16min -> 10.6s). All three re-verified
    # at sf0.001/sf0.01 (+x10 for gumbel/dp_laplace; dbscan's x10
    # ORACLE is quadratic-cost, bounded like ppjoin's).
    "gumbel_topk_sample",
    "dp_laplace_counts",
    "dbscan_core_points",
    # slot 9: third-wave sf1.0 find — burstiness' DECIMAL(38,0)
    # squared-gap sum cast (hugeint->double is multi-step in DuckDB,
    # correctly-rounded in the JVM) PLUS a round()-at-3e13 knife edge
    # on the std; now a per-row hi/lo bigint split + the r10
    # floor(x*1e6+0.5)/1e6 idiom. Re-verified sf0.001/sf0.01/x10.
    "user_burstiness_index",
    # --- re-verification: the 41 stalest green rows — the 12 remaining
    # r4-vintage rows + the 29 alphabetically-first r5-vintage rows
    # (none changed since their vintage; pure freshness rotation — the
    # cumulative ledger carries no row older than r5 after this round).
    "sequence_pack_chop",
    "simhash_near_dup_pairs",
    "status_counts",
    "stream_dedup",
    "stream_doc_dedup_stats",
    "stream_sessionize",
    "stream_stream_join",
    "stream_window_counts",
    "tfidf_top_terms",
    "trimmed_mean_price_udaf",
    "tsv_content_lines",
    "video_frame_sample",
    # (r5 tier from here; the 11 r5 rows left over —
    # sessionize_session_window_batch, sitemap_failed_report,
    # skew_salted_join (displaced by the dsum_wide slots),
    # stream_dedup_within_watermark, stream_quality_gate_counts,
    # stream_rate_gauge, stream_static_join, stream_update_mode_counts,
    # stream_window_counts_append, variant_props_extract, vocab_coverage —
    # roll into the r12 window together with whatever r12 changes.
    # r12 plan (SCALE.md r11 magnitude-gate section): migrate the other
    # 59 dsum oracle sites to the floor-split wide form in ONE sweep —
    # those changed queries fill most of the r12 window by the
    # changed-queries-first rule.)
    "audio_chunk_energy",
    "cluster_stratified_sample",
    "copurchase_triangles",
    "corpus_mix_budget",
    "crawl_reachability_rcte",
    "csv_sink_source_roundtrip",
    "dataset_card_rollup",
    "doc_bpe_pretoken",
    "doc_chunk_sliding",
    "doc_filter_pipeline",
    "doc_fingerprint",
    "doc_pii_redact",
    "doc_quality_features",
    "doc_repetition_filter",
    "doc_simhash",
    "fuzzy_name_pairs",
    "grouping_sets_priority_status",
    "hash_stratified_sample",
    "html_outlink_extract_udtf",
    "html_tree_parse",
    "json_props_extract",
    "json_sink_source_roundtrip",
    "media_decode_stats",
    "media_feature_fold",
    "media_resize_stub",
    "model_quality_classifier",
    "ngram_jaccard_pairs",
    "orc_sink_source_roundtrip",
    "order_gap_islands",
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
