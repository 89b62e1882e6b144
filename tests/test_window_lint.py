"""Repo-wide single-partition-window lint (r5 verdict task 7).

SCALE.md's standing promise — "windows are always partitioned, or
provably bounded" — pinned as an invariant over EVERY registered query:
any Window with an empty partitionSpec must sit above a structurally
bounded input (Limit / top-k / one-row aggregate / literal relation).
A new query that sneaks in a partition-less window over an unbounded
frame fails here, not on a cluster.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from window_lint import unpartitioned_unbounded_windows  # noqa: E402


def test_every_registered_query_is_window_lint_clean(spark, sf_dir):
    from flink_crawler_spark.queries import REGISTRY

    failures: dict[str, list[str]] = {}
    for name, pair in REGISTRY.items():
        try:
            bad = unpartitioned_unbounded_windows(pair.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            bad = [f"error building plan: {e!r}"]
        if bad:
            failures[name] = bad
    assert not failures, failures
