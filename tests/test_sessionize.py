from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.operators.sessionize import sessionize


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_gap_splits_sessions(spark):
    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), 7, "view"),
        (2, datetime(2024, 1, 1, 10, 10, 0), 7, "click"),
        # 31 min gap → new session
        (3, datetime(2024, 1, 1, 10, 41, 0), 7, "view"),
        # other user interleaved
        (4, datetime(2024, 1, 1, 10, 5, 0), 9, "view"),
    ]
    out = {
        r["event_id"]: r["session_id"]
        for r in sessionize(_events(spark, rows)).collect()
    }
    assert out[1] == out[2] == "7_1"
    assert out[3] == "7_2"
    assert out[4] == "9_1"


def test_exact_gap_boundary_stays_in_session(spark):
    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), 7, "view"),
        (2, datetime(2024, 1, 1, 10, 30, 0), 7, "view"),  # gap == 1800s, same session
        (3, datetime(2024, 1, 1, 11, 0, 1), 7, "view"),   # gap 1801s → new
    ]
    out = {
        r["event_id"]: r["session_id"]
        for r in sessionize(_events(spark, rows)).collect()
    }
    assert out[1] == out[2]
    assert out[3] != out[2]


def test_single_shuffle_plan(spark):
    """Both window passes must share ONE exchange on user_id."""
    rows = [(1, datetime(2024, 1, 1), 7, "view")]
    plan = sessionize(_events(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") <= 2  # one sort reused (plus possible ensure-ordering)
