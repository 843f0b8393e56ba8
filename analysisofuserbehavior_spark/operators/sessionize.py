"""Gap-based sessionization of the event stream.

The reference's clickstream arrives pre-sessionized (`session_id` is
a mock-generated UUID, util/MockData.java:43); the driver testdata's
`events` table has no session column, so the engine derives sessions
the standard way: a new session starts when a user's inter-event gap
exceeds `gap_seconds` (default 30 min — the mock generator's "one
session spans ≤ 1 hour" invariant, MockData.java:44,50, motivates the
scale).

Plan shape: ONE shuffle (hash partition by `user_id`), then two
window passes over the same sort order — Catalyst reuses the single
sort for both `lag` and the running `sum`.  At 100 TB this is the
minimal shuffle for any per-user ordering; if the input is already
bucketed/partitioned by `user_id` the exchange is elided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SESSION_GAP_SECONDS = 1800


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = SESSION_GAP_SECONDS,
) -> DataFrame:
    """Add `session_id` (= "<user>_<seq>") and `session_seq` columns."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    seq = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return events.withColumn("session_seq", seq).withColumn(
        "session_id", F.concat_ws("_", F.col(user_col), F.col("session_seq"))
    )


def session_window_rollup(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Session rollup via the built-in `session_window` — the same
    gap semantics as `sessionize` expressed as a grouping key, which
    is what Structured Streaming needs for incremental sessionization
    (state-store backed; `sessionize`'s global window can't stream).

    Boundary note: session_window closes at `last + gap` EXCLUSIVE
    (an event exactly `gap` later starts a new session), whereas the
    lag-based `sessionize` keeps it (`> gap` splits).  The oracle for
    this operator mirrors the session_window convention.
    """
    return (
        events.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


def gap_sensitivity(
    events: DataFrame,
    gaps_minutes: tuple[int, ...] = (5, 15, 30, 60),
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Session-count sensitivity to the gap threshold: how many
    sessions the corpus yields at each candidate inactivity gap — the
    calibration sweep run BEFORE pinning `gap_seconds` (a session
    count that still moves steeply at the chosen gap means the
    threshold sits on a cliff of the inter-event-gap distribution,
    and every downstream session KPI inherits that instability).

    One pass, not |gaps| re-sessionizations: a session START at gap g
    is simply an inter-event gap > g (or a user's first event), so
    the per-row lag computes ONCE and each threshold is one more
    conditional sum over the same window frame — the 16-bucket
    accumulator discipline (SURVEY §2.4) applied to a parameter
    sweep.  Plan: the sessionize shuffle, |gaps| sums, |gaps| output
    rows."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev_ts = F.lag(ts_col).over(w)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    flags = events.select(
        *[
            F.when(prev_ts.isNull() | (gap > g * 60), 1)
            .otherwise(0)
            .alias(f"_g{g}")
            for g in gaps_minutes
        ]
    )
    one = flags.agg(
        *[F.sum(f"_g{g}").cast("bigint").alias(f"_n{g}") for g in gaps_minutes]
    )
    return (
        one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(g).cast("bigint").alias("gap_minutes"),
                            F.col(f"_n{g}").alias("n_sessions"),
                        )
                        for g in gaps_minutes
                    ]
                )
            ).alias("r")
        )
        .select("r.gap_minutes", "r.n_sessions")
        .orderBy("gap_minutes")
    )
