"""Single-partition-window lint (r5 verdict task 7).

SCALE.md promises "windows are always partitioned — or provably bounded".
This tool turns that promise into a checkable invariant: for every
registered query, walk the OPTIMIZED logical plan and flag any Window
node with an EMPTY partitionSpec whose input subtree carries no
boundedness marker. A partition-less window serializes its entire input
through one task — fatal at 100 TB unless the input is bounded by
construction.

Boundedness markers (any one in the window's input subtree):
  * GlobalLimit / LocalLimit — explicit top-k / limit cut
  * Aggregate with NO grouping expressions — a one-row global aggregate
  * Aggregate whose every grouping key is a bounded-domain expression is
    NOT assumed — only the structural markers count
  * LocalRelation / OneRowRelation — literal driver-side frames
  * LogicalRDD from a localCheckpoint is NOT bounded (opaque), so a
    checkpointed big frame under a bare window still flags.

Usage: python tools/window_lint.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOUNDED_CLASSES = {"GlobalLimit", "LocalLimit", "LocalRelation", "OneRowRelation"}


def _build_tree(nodes: list[dict]) -> dict:
    """toJSON emits the plan pre-order with num-children; rebuild it."""
    pos = 0

    def build() -> dict:
        nonlocal pos
        node = dict(nodes[pos])
        pos += 1
        node["children"] = [build() for _ in range(node.get("num-children", 0))]
        return node

    root = build()
    return root


def _cls(node: dict) -> str:
    return node["class"].split(".")[-1]


def _is_bounded(node: dict) -> bool:
    c = _cls(node)
    if c in BOUNDED_CLASSES:
        return True
    if c == "Aggregate" and not node.get("groupingExpressions"):
        return True
    return any(_is_bounded(ch) for ch in node["children"])


def _walk(node: dict, out: list[dict]) -> None:
    out.append(node)
    for ch in node["children"]:
        _walk(ch, out)


def unpartitioned_unbounded_windows(df) -> list[str]:
    """Names of window expressions that are partition-less AND sit above
    an unbounded input subtree. Empty list == lint-clean."""
    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    tree = _build_tree(nodes)
    flat: list[dict] = []
    _walk(tree, flat)
    bad = []
    for n in flat:
        if _cls(n) != "Window":
            continue
        if n.get("partitionSpec"):
            continue
        # the window's input is its only child
        if n["children"] and _is_bounded(n["children"][0]):
            continue
        exprs = json.dumps(n.get("windowExpressions"))[:200]
        bad.append(f"partition-less Window over unbounded input: {exprs}")
    return bad


def lint_query(spark, name: str, fn, sf_dir: str) -> tuple[str, list[str]]:
    df = fn(spark, sf_dir)
    return name, unpartitioned_unbounded_windows(df)


def main() -> int:
    from flink_crawler_spark.queries import REGISTRY
    from flink_crawler_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("window_lint")
    spark.sparkContext.setLogLevel("ERROR")
    failures = {}
    for name in names:
        try:
            _, bad = lint_query(spark, name, REGISTRY[name].fn, sf_dir)
        except Exception as e:  # noqa: BLE001
            bad = [f"error building plan: {e!r:.200}"]
        if bad:
            failures[name] = bad
            print(f"FLAG  {name}: {bad}")
        else:
            print(f"ok    {name}")
    print(f"\n{len(names) - len(failures)}/{len(names)} lint-clean")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
