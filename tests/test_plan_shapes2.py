"""Physical-plan shape assertions for the wave 17-24 statistics and
retrieval operators — each 100 TB claim in the docstrings is pinned
against `.explain` output so a refactor that silently de-scales a plan
fails here, not on a cluster."""

from __future__ import annotations

from flink_crawler_spark.queries.pipelineq16 import ks_two_sample_price
from flink_crawler_spark.queries.pipelineq17 import hard_negative_mining
from flink_crawler_spark.queries.pipelineq19 import (
    gumbel_topk_sample,
    hill_tail_index,
    margin_mnn_pairs,
)
from flink_crawler_spark.queries.pipelineq20 import target_encoding_loo
from flink_crawler_spark.queries.pipelineq21 import auc_urgent_by_price
from flink_crawler_spark.queries.pipelineq23 import lift_gains_deciles


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _window_lines(plan: str) -> list[str]:
    return [
        line
        for line in plan.splitlines()
        if line.strip().startswith("Window ") or " Window " in line
    ]


def test_ks_prefix_sum_windows_are_partitioned(spark, sf_dir):
    """The ECDF running sum must ride the two-phase distributed prefix
    sum: every Window keyed by the range-partition id, never a global
    ordered window over the value domain."""
    plan = _plan(ks_two_sample_price(spark, sf_dir))
    wins = _window_lines(plan)
    assert wins, "expected the prefix-sum window in the plan"
    for line in wins:
        assert "__pid" in line, line


def test_auc_prefix_sum_windows_are_partitioned(spark, sf_dir):
    plan = _plan(auc_urgent_by_price(spark, sf_dir))
    for line in _window_lines(plan):
        assert "__pid" in line, line


def test_hard_negatives_broadcast_anchors(spark, sf_dir):
    """Anchors broadcast; the corpus side must not hash-shuffle before
    the join (the only exchanges allowed are the broadcast itself and
    the keyed top-k window shuffle on the anchor id)."""
    plan = _plan(hard_negative_mining(spark, sf_dir))
    assert "BroadcastExchange" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_margin_mnn_keyed_windows(spark, sf_dir):
    """The mutual-best ranking windows must be keyed per side (the
    anchor broadcast itself sits above a checkpoint boundary and is
    pinned by the hard-negatives test, which shares the pair shape)."""
    plan = _plan(margin_mnn_pairs(spark, sf_dir))
    wins = _window_lines(plan)
    assert wins, "expected the mutual-best ranking windows"
    for line in wins:
        assert ("x_id" in line) or ("y_id" in line), line
    assert "SinglePartition" not in plan, plan


def test_gumbel_sample_is_top_k_not_global_sort(spark, sf_dir):
    """The sampler must select via TakeOrderedAndProject (distributed
    top-k); ranking happens only on the k survivors."""
    plan = _plan(gumbel_topk_sample(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_hill_top_k_not_global_sort(spark, sf_dir):
    plan = _plan(hill_tail_index(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_lift_deciles_use_distributed_rank(spark, sf_dir):
    """r12: decile assignment rides boundary-key comparisons collected
    by the targeted order-statistic probe (the rank window now exists
    only inside the probe, over the boundary partitions). The final
    plan must therefore contain NO window over the fact table — the
    only windows allowed are on the 10-row decile table."""
    plan = _plan(lift_gains_deciles(spark, sf_dir))
    for line in _window_lines(plan):
        assert "decile" in line, line


def test_target_encoding_broadcasts_category_stats(spark, sf_dir):
    """The encoder is one bounded aggregate broadcast onto the fact
    scan — the fact side must not shuffle for the join."""
    plan = _plan(target_encoding_loo(spark, sf_dir))
    assert "BroadcastExchange" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_zipf_rank_window_is_partitioned(spark, sf_dir):
    """The vocabulary rank must be the two-phase distributed row_number
    (a web-scale vocab is 10^7+ tokens)."""
    from flink_crawler_spark.queries.pipelineq26 import zipf_fit_slope

    plan = _plan(zipf_fit_slope(spark, sf_dir))
    wins = _window_lines(plan)
    assert wins, "expected the distributed rank window"
    for line in wins:
        assert "__pid" in line, line


def test_conformal_rank_window_is_partitioned(spark, sf_dir):
    """The calibration order statistic must come from the distributed
    rank, never a global ordered window over the residuals."""
    from flink_crawler_spark.queries.pipelineq28 import (
        conformal_prediction_interval,
    )

    plan = _plan(conformal_prediction_interval(spark, sf_dir))
    for line in _window_lines(plan):
        assert "__pid" in line, line


def test_coverage_curve_rank_window_is_partitioned(spark, sf_dir):
    from flink_crawler_spark.queries.pipelineq27 import coverage_budget_curve

    plan = _plan(coverage_budget_curve(spark, sf_dir))
    for line in _window_lines(plan):
        assert "__pid" in line, line


def test_coverage_curve_single_pass_no_pcts_expansion(spark, sf_dir):
    """r5 verdict fix: the curve is ONE conditional-sum aggregate over
    the shingle-min table — the only nested-loop join left is the 1-row
    scalar N frame, not a pcts-frame row expansion, and the budget
    points appear as stacked literals, never as a joined table."""
    from flink_crawler_spark.queries.pipelineq27 import coverage_budget_curve

    plan = _plan(coverage_budget_curve(spark, sf_dir))
    bnlj = [ln for ln in plan.splitlines() if "BroadcastNestedLoopJoin" in ln]
    assert len(bnlj) <= 1, plan
    assert "LocalTableScan" not in plan, plan  # no pcts literal frame
    assert "stack(4" in plan.lower() or "Generate" in plan, plan


def test_query_likelihood_is_top_k(spark, sf_dir):
    """The retrieval cut must be TakeOrderedAndProject, and the model
    statistics must broadcast onto the doc scan."""
    from flink_crawler_spark.queries.pipelineq25 import query_likelihood_retrieval

    plan = _plan(query_likelihood_retrieval(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastExchange" in plan, plan
