"""Physical-plan audit helpers.

The engine's scale properties (SCALE.md) are plan-shape properties:
filters pushed into scans, narrow ReadSchemas, broadcast vs
sort-merge joins, partial aggregation. This module turns a
DataFrame's executed plan into a small summary dict so tests can
assert those properties and catch plan regressions — the moral
equivalent of the reference's strategy unit (it rewires steps at
plan time, ``Neo4jGraphStepStrategy.java:45-61``; we instead verify
that Catalyst applied the rewrites we rely on).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_summary(df: DataFrame) -> dict:
    """Counts of the plan features we care about, from the
    final (AQE-resolved where applicable) executed plan string."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "exchanges": plan.count("Exchange"),
        "hash_aggregates": plan.count("HashAggregate"),
        "pushed_filter_scans": sum(1 for p in pushed if p.strip()),
        "partition_filter_scans": sum(
            1
            for p in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
            if p.strip()
        ),
        "scan_widths": [len(s.split(",")) if s else 0 for s in read_schemas],
        "python_evals": plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython")
        + plan.count("MapInPandas"),
    }
