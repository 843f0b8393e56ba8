"""Distributed global ranking — dense ordinal rank and ntile over an
arbitrarily large frame without a single-partition sort.

`Window.orderBy(...)` with no partition key funnels the entire frame
through one task — the same 100 TB scale-killer `operators/packing.py`
documents for prefix sums.  The two-pass form here is the textbook
distributed rank:

1. rows land in value-range buckets (pure arithmetic against the
   broadcast (min, max) of the sort column — monotone, so bucket
   order IS sort order);
2. per-bucket counts (a `n_buckets`-row frame) take a driver-scale
   running total, giving each bucket its global rank offset;
3. each row's rank = bucket offset + its row_number inside a window
   PARTITIONED by bucket — one shuffle, buckets sorted in parallel.

Equal-width value buckets assume the sort column isn't pathologically
concentrated; for a known-skewed column pre-quantize or salt the
bucket id by the tiebreak column's hash range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def with_global_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    n_buckets: int = 32,
    rank_col: str = "global_rank",
) -> DataFrame:
    """row_number over (value_col, tiebreak_col) ascending, computed
    two-pass.  value_col must be numeric and non-null; tiebreak_col
    must make the order total."""
    lo_hi = df.agg(
        F.min(value_col).alias("_lo"),
        (F.max(value_col) - F.min(value_col) + 1).alias("_span"),
    )
    bucketed = df.crossJoin(F.broadcast(lo_hi)).withColumn(
        "_bucket",
        (
            (F.col(value_col) - F.col("_lo")).cast("bigint")
            * n_buckets
            / F.col("_span")
        ).cast("bigint"),
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
        .drop("_bucket", "_lo", "_span", "_boffset")
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
    ranked = with_global_rank(df, value_col, tiebreak_col, n_buckets)
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("_total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(out_col, ntile_from_rank("global_rank", "_total", k))
        .drop("_total", "global_rank")
    )
