"""Stream-stream interval join: click→view attribution.

The reference never joins two live streams — its realtime module
enriches a single Kafka stream against static MySQL dims
(AdClickRealTimeStatSpark.java:300-341).  A modern attribution
pipeline needs the two-stream form: every click joined to the views
that preceded it within an attribution window, both sides unbounded.

Structured Streaming executes this as a StreamingSymmetricHashJoin:
both sides shuffle on user_id, each keeps a watermark-bounded state
store, and the time-range conjunct lets the engine evict state as
the watermark advances — bounded memory at any scale.  Without the
time bound the state would grow forever; the watermark + interval
condition IS the scale design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def click_view_attribution(
    clicks: DataFrame,
    views: DataFrame,
    attribution: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """All (click, prior view) pairs within the attribution window,
    per user: v.ts in (c.ts - attribution, c.ts].  Inner join —
    append-mode output, state evicted `watermark + attribution`
    behind the slower stream.  Gap reported in whole seconds
    (integer µs div — exact cross-engine)."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("v_ts"),
    )
    return (
        c.join(
            v,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("v_ts") <= F.col("c_ts"))
            & (F.col("v_ts") > F.col("c_ts") - F.expr(f"INTERVAL {attribution}")),
        )
        .select(
            "click_id",
            "view_id",
            "user_id",
            F.expr("(unix_micros(c_ts) - unix_micros(v_ts)) div 1000000")
            .cast("bigint")
            .alias("gap_s"),
        )
    )


def click_view_attribution_outer(
    clicks: DataFrame,
    views: DataFrame,
    attribution: str = "24 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every click, with its
    prior-view matches — or a NULL view once the watermark proves no
    match can still arrive.  The semantics the inner form cannot
    express: "which clicks had NO preceding view" is itself the
    attribution-gap signal, and in streaming it is only answerable
    via state eviction (a click is unmatched-FOR-SURE exactly when
    the view-side watermark passes its timestamp, since matches need
    v_ts <= c_ts).

    Same shuffle/state shape as the inner join
    (StreamingSymmetricHashJoin on user_id, watermark-bounded state);
    the extra output is driven by eviction, so null rows for trailing
    clicks inside the final watermark delay are NOT emitted — bounded
    replay determinism therefore depends on the final watermark,
    which the batch oracle reproduces from max event times."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("v_ts"),
    )
    return (
        c.join(
            v,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("v_ts") <= F.col("c_ts"))
            & (F.col("v_ts") > F.col("c_ts") - F.expr(f"INTERVAL {attribution}")),
            "left_outer",
        )
        .select(
            "click_id",
            "view_id",
            "user_id",
            F.expr("(unix_micros(c_ts) - unix_micros(v_ts)) div 1000000")
            .cast("bigint")
            .alias("gap_s"),
        )
    )
