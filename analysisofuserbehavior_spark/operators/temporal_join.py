"""Temporal joins Spark has no native operator for: as-of (point-in-
time) join and interval/range join.

The reference has no equivalent — its nearest construct is the
per-batch "latest state" lookup in the streaming module
(AdClickRealTimeStatSpark.java:300-341, re-reading MySQL state per
record).  These are the set-oriented, shuffle-bounded forms a
training-data / feature pipeline needs at 100 TB:

- `asof_join`: union-tag + carry-forward window.  ONE shuffle on the
  `by` key; no per-row probe, no range explosion, no driver loop.
  This is the same plan shape Flink's temporal table join and
  QuestDB/kdb ASOF execute, expressed in vanilla Spark operators.
- `range_join_buckets`: fixed-width bucket equi-join + residual
  filter.  Turns the O(points × intervals) nested-loop theta join
  Catalyst would otherwise pick (BroadcastNestedLoopJoin) into an
  equi-shuffle proportional to points + interval-bucket spans —
  the standard trick behind Databricks' range-join bin hints.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    carry: Sequence[str],
    tiebreak: str,
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach `carry` columns from the latest right
    row with right_ts < left_ts (<= if strict=False), matching on
    `by`.  Left rows with no prior right row keep nulls (left-outer
    as-of semantics).

    Implementation: tag and union both sides, then ONE window
    partitioned by `by` ordered by (ts, tag, tiebreak) carries the
    last non-null right values forward onto left rows.  At equal
    timestamps the tag orders left BEFORE right when strict (so a
    same-instant right row is invisible) and AFTER when inclusive.
    Among right ties on ts the largest `tiebreak` wins —
    deterministic, and mirrored in the oracle's max() pre-dedupe.

    Scale: one hash shuffle on `by`, window state is O(1) per row
    (running last), no skew beyond the key's own cardinality —
    a hot key can be pre-split by time range if needed.
    """
    by = list(by)
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_tag", F.lit(0 if strict else 1)
    )
    rt = (
        right.withColumn("_ts", F.col(right_ts))
        .withColumn("_tag", F.lit(1 if strict else 0))
        .select(*by, "_ts", "_tag", *carry)
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy("_ts", "_tag", F.col(tiebreak).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_left = F.col("_tag") == F.lit(0 if strict else 1)
    carried = [
        F.last(F.when(~is_left, F.col(c)), ignorenulls=True).over(w).alias(f"prior_{c}")
        for c in carry
    ]
    prior_ts = F.last(F.when(~is_left, F.col("_ts")), ignorenulls=True).over(w)
    out = merged.select(
        "*", *carried, prior_ts.alias("_prior_ts")
    ).where(is_left)
    # carry columns must not collide with left's columns (alias on the
    # right before calling); on surviving left rows they are all null.
    return out.drop("_tag", "_ts", *carry)


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of points to half-open intervals [start, end) on
    containment, with NO equi key — the pure range-join case.

    Each interval explodes into the fixed-width buckets it covers
    (end-1, so an interval never claims the bucket past its open
    end); each point lands in exactly one bucket, so containment
    matches are found exactly once — no post-join dedup.  Pick
    `bucket_width` ≈ the typical interval length: spans then explode
    to ~2 rows each and the join is an equi-shuffle, not a nested
    loop.
    """
    b_pts = points.withColumn("_bkt", F.expr(f"{point_ts} div {bucket_width}"))
    b_iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.expr(f"{start} div {bucket_width}"),
                F.expr(f"({end} - 1) div {bucket_width}"),
            )
        ),
    )
    return (
        b_iv.join(b_pts, "_bkt")
        .where((F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end)))
        .drop("_bkt")
    )
