"""Module-5 user-active-degree queries (UserActiveDegreeAnalyze.scala).

Tiny literal frames pin the semantics: period windows, signed
growth sums, integer-cents money arithmetic, first-seen cohorts,
and the top-10 tie-break by user_id.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.operators import user_active as ua


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h), u, et, v, "{}")
            for i, (d, h, u, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def _users(spark, ids):
    return spark.createDataFrame(
        [(u, f"city{u}", f"area{u % 2}") for u in ids],
        "user_id long, city string, area string",
    )


def test_top10_active_users_counts_current_period_clicks(spark):
    ev = _events(
        spark,
        [
            (20, 0, 1, "click", 0.0),
            (21, 0, 1, "click", 0.0),
            (22, 0, 2, "click", 0.0),
            (2, 0, 1, "click", 0.0),  # period-1: excluded
            (20, 0, 2, "view", 0.0),  # non-click: excluded
        ],
    )
    got = {
        r["user_id"]: r["action_count"]
        for r in ua.top10_active_users(ev, _users(spark, [1, 2])).collect()
    }
    assert got == {1: 2, 2: 1}


def test_top10_purchase_growth_signed_cents(spark):
    ev = _events(
        spark,
        [
            (20, 0, 1, "purchase", 10.005),  # p2: floor(1000.5+0.5)=1001 cents
            (2, 0, 1, "purchase", 4.004),  # p1: -400 cents
            (25, 0, 2, "purchase", 1.0),  # p2: +100
            (3, 0, 2, "purchase", 5.0),  # p1: -500
        ],
    )
    got = {
        r["user_id"]: r["money_incr"]
        for r in ua.top10_purchase_growth(ev, _users(spark, [1, 2])).collect()
    }
    assert got == {1: 6.01, 2: -4.0}


def test_top10_visit_growth_one_scan_signed(spark):
    ev = _events(
        spark,
        [(20, 0, 1, "click", 0.0)] * 3
        + [(2, 0, 1, "click", 0.0)]
        + [(2, 0, 2, "click", 0.0)] * 2,
    )
    got = {
        r["user_id"]: r["action_incr"]
        for r in ua.top10_visit_growth(ev, _users(spark, [1, 2])).collect()
    }
    assert got == {1: 2, 2: -2}


def test_first_week_cohort_window(spark):
    ev = _events(
        spark,
        [
            (1, 0, 1, "click", 0.0),  # first seen 01-01
            (8, 0, 1, "click", 0.0),  # day 8 = first_day+7 → included
            (9, 1, 1, "click", 0.0),  # day 9 > first_day+7 → excluded
            (12, 0, 2, "click", 0.0),  # first seen 01-12: outside cohort
        ],
    )
    rows = ua.top10_first_week_active(
        ev, _users(spark, [1, 2]), cohort_start="2024-01-01", cohort_end="2024-01-10"
    ).collect()
    assert {(r["user_id"], r["action_count"]) for r in rows} == {(1, 2)}


def test_top10_limit_and_tiebreak(spark):
    # 12 users, all with 1 click each → tie broken by user_id asc
    ev = _events(spark, [(20, 0, u, "click", 0.0) for u in range(12)])
    rows = ua.top10_active_users(ev, _users(spark, range(12))).collect()
    assert sorted(r["user_id"] for r in rows) == list(range(10))
