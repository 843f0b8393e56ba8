"""Distributed sweep-line over intervals: peak concurrency per hour.

The reference has no interval-concurrency operator — its closest
analytics are the per-(day,hour) session quotas used by the random
extract (UserVisitSessionAnalyzeSpark.java:900-1010, countByKey over
"date_hour" keys), which count session STARTS per hour.  Peak
CONCURRENT sessions — "how many sessions were open at the busiest
instant of each hour" — is the capacity-planning twin of that count,
and the classic way to compute it (sort every boundary event, run a
global +1/-1 prefix sum) is a single-threaded algorithm.

This module is the shuffle-bounded form:

1. per-session [start_us, end_us+1) intervals → ±1 boundary deltas
   (end exclusive at `max(ts)+1µs`, so a one-event session is live
   for exactly one microsecond — never a negative dip);
2. deltas are pre-aggregated BY TIMESTAMP (`groupBy(ts_us)` → net),
   which both removes any tie-ordering ambiguity (concurrency is
   only observed AFTER all deltas at an instant apply — order inside
   the instant cannot matter) and collapses the frame to ≤ 2 rows
   per distinct boundary instant;
3. the prefix sum is two-level: an in-bucket running sum windowed by
   HOUR (each hour's deltas sort independently — the per-partition
   sort is bounded by one hour of boundaries, not the whole corpus),
   plus a carry-in offset = cumulative net of all prior hours.  The
   offset frame is one row per hour-with-boundaries (O(#hours) —
   thousands of rows for years of data), so its single-partition
   window is a deliberate, bounded serial step, the same shape as
   `vocab_growth`'s checkpoint frame.

Relation to `open_orders_daily` (registry.py): that query runs the
same ±1 sweep at DAY granularity, where the delta frame is
calendar-bounded and one unpartitioned window is legitimately tiny.
Here boundaries are MICROSECOND-granular — the delta frame scales
with the corpus, so the prefix sum must decompose; the hour bucket
is what turns "one giant sorted partition" into "many bounded sorts
plus a calendar-bounded offset frame".

Output: one row per hour that contains ≥1 session boundary —
between boundaries concurrency is constant, so an interior hour with
no boundaries has max-concurrency equal to the carried offset; the
operator reports observable CHANGE points only and documents that
contract (the oracle mirrors it).

Scale: one shuffle to the session rollup (shared with session_stats),
one `groupBy(ts_us)` shuffle proportional to distinct boundary
instants, one hour-window sort, one broadcast join of the tiny
offset frame.  No global sort of the full corpus at any point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..sources.loaders import epoch_us

US_PER_HOUR = 3_600_000_000


def session_intervals(actions: DataFrame) -> DataFrame:
    """(session_id, start_us, end_us) with end EXCLUSIVE at
    max(ts)+1µs — a session is "open" through its last event's
    microsecond."""
    return actions.groupBy("session_id").agg(
        F.min(epoch_us("ts")).alias("start_us"),
        (F.max(epoch_us("ts")) + F.lit(1)).alias("end_us"),
    )


def concurrency_by_hour(
    intervals: DataFrame, bucket_us: int = US_PER_HOUR
) -> DataFrame:
    """Peak concurrency per hour via the two-level prefix sum.

    Returns (hour, max_concurrent, at_ts_us): for each hour with at
    least one boundary, the maximum number of simultaneously-open
    intervals observed at any boundary instant in that hour, and the
    earliest instant attaining it.

    `bucket_us` sets the inner-window width (default 1 h).  The
    decomposition is exact for ANY width — output is still keyed by
    HOUR — so a corpus whose boundaries all land inside a few hours
    (a traffic burst, a backfilled day) drops to minute- or
    second-wide buckets and keeps every sort bounded; the offset
    frame grows to #buckets-with-boundaries rows, still calendar-
    bounded.  `tests/test_round8_ops.py` pins hour/minute/second
    widths producing identical results on the same corpus.
    """
    if US_PER_HOUR % bucket_us != 0:
        # bucket edges must nest inside hour edges or the final
        # per-hour regroup would split a bucket across hours
        raise ValueError("bucket_us must divide one hour")
    # intervals feeds TWO branches (starts, ends) and deltas feeds TWO
    # more (running sums, bucket nets).  Round 8 measured AQE's
    # ReusedExchange deduplicating these branches at runtime; by
    # round 12 that no longer held end-to-end — the per-stage profile
    # showed FOUR identical map stages (each re-scanning the actions
    # frame and re-writing the same 1.6 MB interval exchange), 26 s
    # total executor time for a dimension-sized result.  Both frames
    # are now lineage-truncated like the rest of the multi-consumer
    # family (functions/ckpt.py): 11 stages → 7, one upstream scan,
    # executor time −25% at sf0.1.  The round-8 reuse pin in
    # tests/test_round8_ops.py became a compute-once pin (exactly one
    # interval-aggregate exchange in the executed plan).
    from ..functions.ckpt import ckpt

    intervals = ckpt(intervals)
    deltas = ckpt(
        intervals.select(F.col("start_us").alias("ts_us"), F.lit(1).alias("d"))
        .unionByName(
            intervals.select(F.col("end_us").alias("ts_us"), F.lit(-1).alias("d"))
        )
        .groupBy("ts_us")
        .agg(F.sum("d").alias("net"))
        .withColumn("hour_us", (F.col("ts_us") - F.col("ts_us") % bucket_us))
    )
    in_hour = Window.partitionBy("hour_us").orderBy("ts_us").rowsBetween(
        Window.unboundedPreceding, 0
    )
    running = deltas.withColumn("run", F.sum("net").over(in_hour))
    # carry-in: cumulative net of all PRIOR hours.  One row per
    # hour-with-boundaries — a bounded frame whose single-partition
    # window is the only serial step (documented above).
    hour_net = deltas.groupBy("hour_us").agg(F.sum("net").alias("hour_net"))
    prior = (
        Window.orderBy("hour_us").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = hour_net.select(
        "hour_us",
        F.coalesce(F.sum("hour_net").over(prior), F.lit(0)).alias("carry_in"),
    )
    conc = running.join(F.broadcast(offsets), "hour_us").withColumn(
        "concurrent", F.col("run") + F.col("carry_in")
    )
    # per-hour max via a PARTITION-ONLY window, not a groupBy+self-join
    # (the join form recomputes the whole upstream for each branch and
    # adds a shuffle; the window reuses the running-sum's hash(hour_us)
    # partitioning, and the final groupBy's clustering is satisfied by
    # the same partitioning — net zero extra exchanges on the default
    # hour-bucket path, verified by count_exchanges in tests)
    if bucket_us == US_PER_HOUR:
        part_col = "hour_us"
    else:
        part_col = "out_hour_us"
        conc = conc.withColumn(
            part_col, F.col("ts_us") - F.col("ts_us") % US_PER_HOUR
        )
    mx = F.max("concurrent").over(Window.partitionBy(part_col))
    at = (
        conc.withColumn("max_concurrent", mx)
        .where(F.col("concurrent") == F.col("max_concurrent"))
        .groupBy(part_col, "max_concurrent")
        .agg(F.min("ts_us").alias("at_ts_us"))
        .withColumnRenamed(part_col, "hour_us")
    )
    # hour label stays in the epoch-micros domain (bigint): formatting
    # it through timestamp_micros would re-enter session-timezone
    # territory (the driver runs a VANILLA session whose TZ is not
    # pinned UTC), and a bigint compares hash-exact in any engine.
    return at.select(
        F.col("hour_us").cast("bigint").alias("hour_start_us"),
        F.col("max_concurrent").cast("bigint").alias("max_concurrent"),
        F.col("at_ts_us").cast("bigint").alias("at_ts_us"),
    )


def session_concurrency_hourly(actions: DataFrame) -> DataFrame:
    """End-to-end: sessionized actions → intervals → hourly peaks."""
    return concurrency_by_hour(session_intervals(actions))
