"""sssp_bellman_ford path equivalence.

r12 moved the 8 relaxation rounds onto the collected edge list for
modulo-bounded graphs (all-integer min-plus arithmetic, so the driver
fold is exactly the distributed min-fold). This pins the two paths to
row-identical output on the same corpus: the gate must only ever pick
between equivalent computations.
"""

from __future__ import annotations

from conftest import SF_DIR


def _rows(df):
    return sorted((r["node"], r["dist"]) for r in df.collect())


def test_driver_and_distributed_paths_identical(spark, monkeypatch):
    from flink_crawler_spark.queries import crawlq

    driver = _rows(crawlq.sssp_bellman_ford(spark, SF_DIR))
    monkeypatch.setattr(crawlq, "SSSP_DRIVER_MAX_EDGES", -1)
    distributed = _rows(crawlq.sssp_bellman_ford(spark, SF_DIR))
    assert driver == distributed
