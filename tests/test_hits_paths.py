"""hits_hub_authority path equivalence.

r12 moved the 5 HITS iterations onto the collected edge list for
modulo-bounded graphs, replicating the distributed half-step's exact
arithmetic (round-to-12dp contribution -> DECIMAL(38,18) sum -> max
normalizer -> one double division) with Python Decimal. This pins the
two paths to row-identical output on the same corpus: the gate must
only ever pick between equivalent computations.
"""

from __future__ import annotations

from conftest import SF_DIR


def _rows(df):
    return sorted((r["id"], r["hub"], r["auth"]) for r in df.collect())


def test_driver_and_distributed_paths_identical(spark, monkeypatch):
    from flink_crawler_spark.queries import pipelineq6

    driver = _rows(pipelineq6.hits_hub_authority(spark, SF_DIR))
    monkeypatch.setattr(pipelineq6, "HITS_DRIVER_MAX_EDGES", -1)
    distributed = _rows(pipelineq6.hits_hub_authority(spark, SF_DIR))
    assert driver == distributed
