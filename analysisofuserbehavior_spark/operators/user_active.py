"""Module 5 — user-active-degree queries.

Reference: scala/tsetspark2_0/UserActiveDegreeAnalyze.scala (fully
commented out in the repo but part of its stated surface): top-10
users by visit count (:53-67), by purchase money (:72-79),
period-over-period visit growth (:92-108), period-over-period
purchase-money growth (:114-130), and first-7-days-after-signup
activity for a signup cohort (:135-159).

Spark-first divergences from the reference plans:

* The reference joins the full action log against `user_base_info`
  BEFORE aggregating (:57) — at 100 TB that shuffles the whole fact
  table to enrich rows that are then collapsed to ≤10 users.  We
  aggregate first, take the top-10, and broadcast-join the dimension
  onto ten rows.
* The growth queries build two filtered datasets with ±1 / ±money
  "signed value" columns and union them (:92-108) — two scans of the
  fact table.  We do ONE scan with a conditional signed aggregation
  (sum(case when period2 then 1 when period1 then -1 end)).
* The testdata has no registration date; "signup" is the user's
  first-seen day (min(day) over the full log), which keeps the
  cohort query's shape (dim-attribute date window per user, :137-141)
  with a derived dimension.
* Money sums use integer-cents arithmetic (functions.cents_sum) so
  the distributed sum is bit-identical to the serial oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import cents_sum, day_col

# events span 2024-01-01..2024-01-30 at every SF (TESTDATA.md)
PERIOD1 = ("2024-01-01", "2024-01-15")  # previous period
PERIOD2 = ("2024-01-16", "2024-01-30")  # current period


def _with_day(events: DataFrame) -> DataFrame:
    return events.withColumn("day", day_col("ts"))


def _day_range(start: str, end: str) -> Column:
    """`day BETWEEN start AND end`, plus the equivalent ntz-literal
    range on the source `ts` column — the only form that reaches the
    parquet scan (`day` is a computed date_format, invisible to
    row-group pruning)."""
    import datetime as dt

    from ..sources import ntz_lit

    cond = F.col("day").between(start, end)
    end_next = (dt.date.fromisoformat(end) + dt.timedelta(days=1)).isoformat()
    return cond & (F.col("ts") >= ntz_lit(start)) & (F.col("ts") < ntz_lit(end_next))


def _maybe_day_range(events: DataFrame, start: str, end: str) -> Column:
    if dict(events.dtypes).get("ts", "").startswith("timestamp"):
        return _day_range(start, end)
    return F.col("day").between(start, end)


def _top10(df: DataFrame, metric: str, users: DataFrame) -> DataFrame:
    """Global top-10 by `metric` (user_id tie-break), enriched with
    the user dimension AFTER the limit — ten broadcast lookups, not a
    fact-wide join."""
    top = df.orderBy(F.col(metric).desc(), F.col("user_id")).limit(10)
    return top.join(F.broadcast(users.select("user_id", "city", "area")), "user_id")


def top10_active_users(
    events: DataFrame,
    users: DataFrame,
    start: str = PERIOD2[0],
    end: str = PERIOD2[1],
) -> DataFrame:
    """Top-10 users by click count in a date range (ref :53-67)."""
    ev = _with_day(events)
    counts = (
        ev.where((F.col("event_type") == "click") & _maybe_day_range(ev, start, end))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("action_count"))
    )
    return _top10(counts, "action_count", users)


def top10_purchase_users(
    events: DataFrame,
    users: DataFrame,
    start: str = PERIOD2[0],
    end: str = PERIOD2[1],
) -> DataFrame:
    """Top-10 users by purchase money in a date range (ref :72-79)."""
    ev = _with_day(events)
    money = (
        ev.where((F.col("event_type") == "purchase") & _maybe_day_range(ev, start, end))
        .groupBy("user_id")
        .agg(cents_sum("value").alias("purchase_money"))
    )
    return _top10(money, "purchase_money", users)


def _period_sign(p1: tuple[str, str], p2: tuple[str, str]) -> Column:
    return (
        F.when(F.col("day").between(*p2), F.lit(1))
        .when(F.col("day").between(*p1), F.lit(-1))
        .otherwise(F.lit(0))
    )


def top10_visit_growth(
    events: DataFrame,
    users: DataFrame,
    p1: tuple[str, str] = PERIOD1,
    p2: tuple[str, str] = PERIOD2,
) -> DataFrame:
    """Top-10 users by period-over-period click-count growth
    (ref :92-108) — one scan, signed conditional sum."""
    growth = (
        _with_day(events)
        .where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.sum(_period_sign(p1, p2)).alias("action_incr"))
    )
    return _top10(growth, "action_incr", users)


def top10_purchase_growth(
    events: DataFrame,
    users: DataFrame,
    p1: tuple[str, str] = PERIOD1,
    p2: tuple[str, str] = PERIOD2,
) -> DataFrame:
    """Top-10 users by period-over-period purchase-money growth
    (ref :114-130)."""
    growth = (
        _with_day(events)
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(cents_sum("value", sign=_period_sign(p1, p2)).alias("money_incr"))
    )
    return _top10(growth, "money_incr", users)


def top10_first_week_active(
    events: DataFrame,
    users: DataFrame,
    cohort_start: str = "2024-01-01",
    cohort_end: str = "2024-01-10",
) -> DataFrame:
    """Top-10 first-seen-cohort users by clicks within 7 days of
    their first event (ref :135-146; signup date := first-seen day).

    Both aggregations key on user_id, so the first-seen frame and the
    click log co-partition — Catalyst reuses one shuffle exchange for
    the self-join."""
    ev = _with_day(events)
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    cohort = first_seen.where(F.col("first_day").between(cohort_start, cohort_end))
    counts = (
        ev.where(F.col("event_type") == "click")
        .join(cohort, "user_id")
        .where(F.col("day") <= F.date_format(F.date_add(F.col("first_day"), 7), "yyyy-MM-dd"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("action_count"))
    )
    return _top10(counts, "action_count", users)
