"""Physical-plan inspection helpers.

The reference hand-optimizes its physical plan in Java (SURVEY.md §4);
this engine delegates to Catalyst and VERIFIES the outcome instead:
tests assert that filters reach the parquet scan, dimension joins
broadcast, scans prune columns, and operators don't shuffle more than
their algebra requires.  A plan regression (a lost pushdown, a join
that silently degrades to sort-merge-exchange) fails the suite even
while results stay correct — at 100 TB the plan IS the product.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # pragma: no cover
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the final plan (reused ones counted once)."""
    plan = executed_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or "BroadcastNestedLoopJoin" in executed_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in executed_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans.

    Parsed from the FORMATTED explain: the simple plan string
    truncates long FileScan lines, silently dropping the filter list
    (which made this check pass vacuously for single-filter scans and
    fail for multi-filter ones)."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]\n]*)", plan)


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets each file scan actually reads (pruning check).

    Parsed from the `FileScan <format> [col#1,col#2,...]` output list
    (the ReadSchema struct is truncated by plan toString); covers
    parquet, csv, and json scans."""
    plan = executed_plan(df)
    out = []
    for m in re.findall(r"FileScan \w+ \[([^\]]*)\]", plan):
        cols = {c.strip().split("#")[0] for c in m.split(",") if c.strip()}
        out.append(cols)
    return out
