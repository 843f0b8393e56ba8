"""Adapter: the reference's native `user_visit_action` schema → the
engine's action model.

A reference user's existing Hive tables (schema at
util/MockData.java:87-100: date, user_id, session_id, page_id,
action_time, search_keyword, click_category_id, click_product_id,
order_/pay_ CSV columns, city_id) plug into every engine operator
through this one projection — sessions come pre-assigned (the mock
UUIDs), the action type is recovered from the column-exclusivity
invariant (exactly one action group non-null per row), and CSV id
lists explode through functions.explode_csv_ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import day_col, hour_col


def actions_from_user_visit_action(uva: DataFrame) -> DataFrame:
    """Engine action frame from the reference's clickstream schema.

    event_type ∈ {search, click, order, pay} recovered from which
    action column group is non-null (MockData.java:58-72 exclusivity);
    `ts` parsed from the string action_time; `category_id` is the
    click category (order/pay CSV lists stay in their columns for
    explode-based consumers)."""
    ts = F.to_timestamp("action_time", "yyyy-MM-dd HH:mm:ss")
    event_type = (
        F.when(F.col("search_keyword").isNotNull(), "search")
        .when(F.col("click_category_id").isNotNull(), "click")
        .when(F.col("order_category_ids").isNotNull(), "order")
        .otherwise("pay")
    )
    return uva.select(
        F.monotonically_increasing_id().alias("event_id"),
        ts.alias("ts"),
        "user_id",
        event_type.alias("event_type"),
        F.lit(0.0).alias("value"),
        # NOTE: no session_seq column — session_stats then groups by
        # the pre-assigned session_id directly (its fallback branch)
        "session_id",
        day_col(ts).alias("day"),
        hour_col(ts).alias("hour"),
        F.col("click_category_id").alias("category_id"),
        F.col("click_product_id").alias("product_id"),
        "page_id",
        "city_id",
        "search_keyword",
        "order_category_ids",
        "order_product_ids",
        "pay_category_ids",
        "pay_product_ids",
    )
