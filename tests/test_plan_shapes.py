"""Physical-plan shape assertions for the corpus-assembly wave — the
scale claims in SCALE.md, checked against `.explain` output so a
refactor that silently de-scales a plan fails here, not at 100 TB."""

from __future__ import annotations

from flink_crawler_spark.queries.pipelineq2 import (
    corpus_mix_budget,
    model_quality_classifier,
    sequence_pack_chop,
)
from flink_crawler_spark.queries.textops2 import doc_bpe_pretoken


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_classifier_is_shuffle_free(spark, sf_dir):
    plan = _plan(model_quality_classifier(spark, sf_dir))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pretokenizer_is_shuffle_free(spark, sf_dir):
    plan = _plan(doc_bpe_pretoken(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_pack_has_no_single_partition_window(spark, sf_dir):
    plan = _plan(sequence_pack_chop(spark, sf_dir))
    # the prefix-sum window must be keyed by bucket — a global (empty
    # partition spec) window would serialize the whole corpus
    for line in plan.splitlines():
        if line.strip().startswith("Window ") or " Window " in line:
            assert "bucket" in line, line
    # the only full-shuffle allowed is the hash partitioning on bucket;
    # never a SinglePartition exchange
    assert "SinglePartition" not in plan, plan


def test_mix_budget_window_keyed_by_source(spark, sf_dir):
    plan = _plan(corpus_mix_budget(spark, sf_dir))
    for line in plan.splitlines():
        if line.strip().startswith("Window ") or " Window " in line:
            assert "source" in line, line
    assert "SinglePartition" not in plan, plan


def test_gini_rank_window_is_partitioned(spark, sf_dir):
    """The fairness rank must use the two-phase distributed rank: every
    Window in the plan is keyed by the range-partition id — a global
    (empty partition spec) row_number would serialize all 10^7-10^8
    per-PLD rows through one task at crawl scale. (The final 1-row
    gini aggregate legitimately funnels its tiny partials to one
    partition, so no blanket SinglePartition assert here.)"""
    from flink_crawler_spark.queries.core import frontier_fairness_gini

    plan = _plan(frontier_fairness_gini(spark, sf_dir))
    win_lines = [
        line for line in plan.splitlines()
        if line.strip().startswith("Window ") or " Window " in line
    ]
    assert win_lines, plan  # the rank window must exist
    for line in win_lines:
        assert "__pid" in line, line
