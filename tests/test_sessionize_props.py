"""Property-based sessionize invariants (hypothesis).

The gap-sessionizer's defining properties, checked over randomized
event streams rather than fixtures:
  1. partition: every event lands in exactly one session;
  2. gap rule: consecutive events of one user share a session IFF
     their gap <= threshold;
  3. sessions never span users.
One Spark job per example; examples kept small and few (Spark startup
dominates, the point is input-shape coverage, not volume)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.operators.sessionize import sessionize

GAP = 1800


@st.composite
def event_streams(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for i in range(n):
        user = draw(st.integers(min_value=1, max_value=3))
        # offsets cluster around the gap boundary on purpose
        off = draw(
            st.one_of(
                st.integers(min_value=0, max_value=10),
                st.integers(min_value=GAP - 2, max_value=GAP + 2),
                st.integers(min_value=0, max_value=90_000),
            )
        )
        rows.append((i, user, off))
    return rows


@given(event_streams())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_sessionize_invariants(spark, rows):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (eid, base + dt.timedelta(seconds=off), user, "click", 1.0, "{}")
            for eid, user, off in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = sessionize(df).select("event_id", "user_id", "ts", "session_id").collect()

    assert len(out) == len(rows)  # partition: no events lost or duplicated
    assert len({r["event_id"] for r in out}) == len(rows)

    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    seen_sessions: dict[str, int] = {}
    for user, evs in by_user.items():
        evs.sort(key=lambda r: (r["ts"], r["event_id"]))
        for prev, cur in zip(evs, evs[1:]):
            gap = (cur["ts"] - prev["ts"]).total_seconds()
            same = prev["session_id"] == cur["session_id"]
            assert same == (gap <= GAP), (user, gap, same)
        for r in evs:
            owner = seen_sessions.setdefault(r["session_id"], user)
            assert owner == user  # sessions never span users
