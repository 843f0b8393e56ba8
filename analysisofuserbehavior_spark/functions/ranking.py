"""Distributed global ranking — dense ordinal rank and ntile over an
arbitrarily large frame without a single-partition sort.

`Window.orderBy(...)` with no partition key funnels the entire frame
through one task — the same 100 TB scale-killer `operators/packing.py`
documents for prefix sums.  The two-pass form here is the textbook
distributed rank:

1. rows land in value-range buckets (count of broadcast sampled
   split points below the value — monotone, so bucket order IS
   sort order);
2. per-bucket counts (a `n_buckets`-row frame) take a driver-scale
   running total, giving each bucket its global rank offset;
3. each row's rank = bucket offset + its row_number inside a window
   PARTITIONED by bucket — one shuffle, buckets sorted in parallel.

Bucket boundaries are SAMPLED QUANTILES (percentile_approx split
points — the RangePartitioner discipline), not equal-width value
ranges: per-user money sums and similar heavy-tailed columns stretch
an equal-width span by orders of magnitude (one whale lands every
other row in bucket 0 — a one-task sort), while quantile splits give
near-equal bucket COUNTS for any value distribution.  Bucket id is a
pure monotone function of the VALUE alone (count of split points
below it), so equal values always share a bucket and bucket order is
sort order; sketch error in the split points moves only the
boundaries (task balance), never the rank.  Residual caveat: a value
duplicated across a large fraction of rows necessarily shares one
bucket — within-bucket sorting of a Zipf-duplicated value is the one
remaining hot task (pre-aggregate such domains before ranking).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def with_global_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    n_buckets: int = 32,
    rank_col: str = "global_rank",
    _pre_truncated: bool = False,
) -> DataFrame:
    """row_number over (value_col, tiebreak_col) ascending, computed
    two-pass.  value_col must be numeric and non-null; tiebreak_col
    must make the order total."""
    from .ckpt import ckpt

    # The machinery consumes `df` through FOUR branches (the splits
    # scalar subquery, the bucketed frame, the per-bucket totals, the
    # final join) and plan-level reuse does not deduplicate re-derived
    # branches — profiled on top_decile_spend_share at sf0.1: the
    # upstream filter+groupBy re-executed 8× (once per broadcast/
    # subquery job), 18 jobs for one query.  Truncate once: every
    # branch then reads the materialized |rows|-sized frame (ranking
    # inputs are always pre-aggregated, so the checkpoint is small).
    # `_pre_truncated` lets a caller that already truncated (and has
    # its own extra consumers of the same frame, e.g.
    # distributed_ntile's total count) skip the second copy.
    if not _pre_truncated:
        df = ckpt(df)
    splits = df.agg(
        F.percentile_approx(
            value_col,
            F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)]),
            F.lit(10_000),
        ).alias("_splits")
    )
    bucketed = (
        df.crossJoin(F.broadcast(splits))
        .withColumn(
            # count of split points strictly below the value — a pure
            # monotone function of the value, so equal values share a
            # bucket and bucket order IS sort order
            "_bucket",
            F.size(F.filter(F.col("_splits"), lambda s: s < F.col(value_col))),
        )
        .drop("_splits")
    )
    btotals = bucketed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_bn"))
    boffsets = btotals.withColumn(
        "_boffset",
        F.coalesce(
            F.sum("_bn").over(
                Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("_bucket", "_boffset")
    w = Window.partitionBy("_bucket").orderBy(
        F.asc(value_col), F.asc(tiebreak_col)
    )
    return (
        bucketed.join(F.broadcast(boffsets), "_bucket")
        .withColumn(
            rank_col,
            (F.col("_boffset") + F.row_number().over(w)).cast("bigint"),
        )
        .drop("_bucket", "_boffset")
    )


def ntile_from_rank(rank_col: str, total_col: str, k: int) -> Column:
    """SQL ntile(k) bucket from a 1-based global rank column and a
    total-row-count column (by NAME): the first (total % k) buckets
    hold ceil(total/k) rows, the rest floor(total/k).  Pure integer
    `div`/`%` — no double division anywhere, so it matches Spark's
    and DuckDB's ntile exactly at any row count."""
    r, t = rank_col, total_col
    return F.expr(
        f"""CASE
          WHEN {r} <= ({t} % {k}) * (({t} div {k}) + 1)
          THEN ({r} - 1) div (({t} div {k}) + 1) + 1
          ELSE ({t} % {k})
               + ({r} - 1 - ({t} % {k}) * (({t} div {k}) + 1)) div ({t} div {k})
               + 1
        END"""
    ).cast("int")


def distributed_ntile(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    k: int,
    n_buckets: int = 32,
    out_col: str = "decile",
) -> DataFrame:
    """ntile(k) over (value_col, tiebreak_col) without a global-order
    window: two-pass rank + broadcast scalar total + closed-form
    bucket assignment."""
    from .ckpt import ckpt

    # one truncation serves BOTH consumers (the ranking machinery's
    # four branches and the total count) — counting from `ranked`
    # instead would re-plan the whole window subtree a second time
    # (and re-introduce a duplicate single-partition offset window,
    # which the plan lint counts)
    df = ckpt(df)
    ranked = with_global_rank(
        df, value_col, tiebreak_col, n_buckets, _pre_truncated=True
    )
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("_total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out_col, ntile_from_rank("global_rank", "_total", k))
        .drop("_total", "global_rank")
    )


def with_grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    n_buckets: int = 32,
    rank_col: str = "group_rank",
) -> DataFrame:
    """`with_global_rank` per group: row_number over (value_col,
    tiebreak_col) ascending WITHIN each group_cols tuple, computed
    two-pass.  The naive form — `Window.partitionBy(group)` — sorts
    |rows|/|groups| per task, a straggler whenever groups are few or
    skewed (the exact shape the SinglePartition-window lint guards
    globally).  Here each group's value range splits into n_buckets
    via one per-group percentile_approx; per-(group, bucket) counts
    roll into prefix offsets with a window over the
    (|groups|·n_buckets)-row offset frame; the final row_number
    window partitions by (group, bucket) — every task sorts ~1/32 of
    ONE group."""
    from .ckpt import ckpt

    # same multi-branch re-derivation as with_global_rank: truncate
    # the (pre-aggregated, small) input once for all four branches
    df = ckpt(df)
    splits = df.groupBy(*group_cols).agg(
        F.percentile_approx(
            value_col,
            F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)]),
            F.lit(10_000),
        ).alias("_splits")
    )
    bucketed = (
        df.join(F.broadcast(splits), group_cols)
        .withColumn(
            "_bucket",
            F.size(F.filter(F.col("_splits"), lambda s: s < F.col(value_col))),
        )
        .drop("_splits")
    )
    btotals = bucketed.groupBy(*group_cols, "_bucket").agg(
        F.count(F.lit(1)).alias("_bn")
    )
    boffsets = btotals.withColumn(
        "_boffset",
        F.coalesce(
            F.sum("_bn").over(
                Window.partitionBy(*group_cols)
                .orderBy("_bucket")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(*group_cols, "_bucket", "_boffset")
    w = Window.partitionBy(*group_cols, "_bucket").orderBy(
        F.asc(value_col), F.asc(tiebreak_col)
    )
    return (
        bucketed.join(F.broadcast(boffsets), [*group_cols, "_bucket"])
        .withColumn(
            rank_col,
            (F.col("_boffset") + F.row_number().over(w)).cast("bigint"),
        )
        .drop("_bucket", "_boffset")
    )
