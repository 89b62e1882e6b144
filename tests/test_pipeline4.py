"""Pipeline wave-4 shape and invariant pins (beyond the value oracles).

The driver gate proves VALUES match; these tests pin the physical plan
shapes that make the operators 100 TB-safe (broadcast sides, no
corpus-side shuffles before the decision) and the semantic invariant
the leakage-safe split exists for.
"""

from __future__ import annotations

import os

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mixture_sample_corpus_side_never_shuffles(spark):
    from flink_crawler_spark.queries.pipelineq4 import mixture_temperature_sample

    plan = _plan(mixture_temperature_sample(spark, SF))
    # the decision join builds on the broadcast (tiny rates) side; the
    # corpus scan streams through without an Exchange of its own
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semantic_contamination_benchmark_broadcasts(spark):
    from flink_crawler_spark.queries.pipelineq4 import semantic_contamination

    plan = _plan(semantic_contamination(spark, SF))
    # corpus x benchmark is a broadcast nested-loop (benchmark side
    # built), never a shuffled cartesian of the corpus
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_leakage_safe_split_never_splits_a_cluster(spark):
    from flink_crawler_spark.queries.pipelineq4 import leakage_safe_split

    rows = leakage_safe_split(spark, SF).collect()
    by_cluster: dict[int, set[str]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    multi = {c for c, members in by_cluster.items() if len(members) > 1}
    assert not multi, f"clusters straddling splits: {sorted(multi)[:5]}"
    # and the split is a real partition of the corpus
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    assert len(rows) == len({r["doc_id"] for r in rows})


def test_curation_funnel_is_monotone(spark):
    """Funnel stages only ever narrow: nd_keep ⇒ exact_keep ⇒ q_keep,
    accepted ⇒ nd_keep, shard set iff accepted."""
    from flink_crawler_spark.queries.pipelineq4 import curation_funnel

    rows = curation_funnel(spark, SF).collect()
    for r in rows:
        if r["accepted"]:
            assert r["nd_keep"]
        if r["nd_keep"]:
            assert r["exact_keep"]
        if r["exact_keep"]:
            assert r["q_keep"]
        assert (r["shard"] is not None) == bool(r["accepted"])
