"""seasonal_anomaly_dow: leave-one-out weekday baseline, integer-exact
flagging, and the float-z/integer-flag agreement."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from analysisofuserbehavior_spark.operators.diagnostics import seasonal_anomaly_dow

EVENTS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
MONDAY = datetime(2024, 1, 1, 12, 0)  # the operator's anchor Monday


def _days(spark, counts_by_day):
    """counts_by_day: {day_offset: n_events} — all 'click' events."""
    rows, eid = [], 0
    for off, n in counts_by_day.items():
        for _ in range(n):
            rows.append((eid, MONDAY + timedelta(days=off), 1, "click", 0.0, "{}"))
            eid += 1
    return spark.createDataFrame(rows, EVENTS)


def test_inflated_weekday_flagged_others_not(spark):
    # 5 Mondays at 10 events, one Monday at 50; Tuesdays flat at 10
    counts = {7 * i: 10 for i in range(5)}
    counts[7 * 5] = 50
    counts.update({7 * i + 1: 10 for i in range(6)})
    out = {r["day"]: r for r in seasonal_anomaly_dow(_days(spark, counts)).collect()}
    assert out["2024-02-05"]["is_anomaly"] is True  # the inflated Monday
    assert out["2024-02-05"]["dow"] == 0
    # its PEERS are the quiet Mondays only (leave-one-out): mean 10.0
    assert out["2024-02-05"]["dow_mean"] == 10.0
    # every other day: flat vs flat peers... except quiet Mondays,
    # whose peer set CONTAINS the spike — high variance, not flagged
    for day, r in out.items():
        if day != "2024-02-05":
            assert r["is_anomaly"] is False, day


def test_integer_flag_agrees_with_float_z(spark):
    # randomized-ish counts: the BIGINT verdict must equal |z| > 2
    # computed from the reported pieces
    counts = {}
    vals = [12, 9, 15, 11, 30, 13, 8, 14, 10, 12, 11, 16]
    for i, v in enumerate(vals):
        counts[7 * i] = v  # all Mondays
    rows = seasonal_anomaly_dow(_days(spark, counts)).collect()
    assert len(rows) == len(vals)
    for r in rows:
        if r["zscore"] is None:
            continue
        assert r["is_anomaly"] == (abs(r["zscore"]) > 2.0), r


def test_small_peer_groups_excluded(spark):
    # two Mondays → np = 1 < 2: no verdict rows at all
    out = seasonal_anomaly_dow(_days(spark, {0: 10, 7: 20})).collect()
    assert out == []


def test_zero_variance_peers_flag_any_deviation(spark):
    # peers all exactly 10, current day 11 → z undefined (NULL) but
    # the integer test flags the deviation (documented semantics)
    counts = {7 * i: 10 for i in range(4)}
    counts[28] = 11
    out = {r["day"]: r for r in seasonal_anomaly_dow(_days(spark, counts)).collect()}
    spike = out["2024-01-29"]
    assert spike["zscore"] is None and spike["is_anomaly"] is True
    flat = out["2024-01-01"]
    assert flat["is_anomaly"] is False


def test_holt_trend_matches_straightline_recursion(spark):
    """holt_trend_daily vs a straight-line Python Holt (α=β=½,
    l₁=y₁, b₁=0): levels, trends and one-step forecasts must match
    the reference recursion exactly (after the shared 4-dp quantize),
    and the first day's forecast must be NULL."""
    from analysisofuserbehavior_spark.operators.diagnostics import (
        holt_trend_daily,
    )

    ys = [4, 5, 4, 6, 7, 3, 8, 8, 2, 10]
    rows, eid = [], 0
    for d, y in enumerate(ys):
        for _ in range(y):
            rows.append(
                (eid, MONDAY + timedelta(days=d), 1, "click", 0.0, "{}")
            )
            eid += 1
        # non-click noise must be ignored
        rows.append((10_000 + d, MONDAY + timedelta(days=d), 2, "view", 0.0, "{}"))
    df = spark.createDataFrame(rows, EVENTS)
    got = holt_trend_daily(df).collect()
    assert len(got) == len(ys)

    def q4(x):
        return math.floor(x * 10000 + 0.5) / 10000

    l, b = float(ys[0]), 0.0
    assert got[0]["forecast"] is None
    assert (got[0]["level"], got[0]["trend"]) == (q4(l), 0.0)
    for t in range(1, len(ys)):
        f = l + b
        nl = 0.5 * ys[t] + 0.5 * f
        b = 0.5 * (nl - l) + 0.5 * b
        l = nl
        r = got[t]
        assert r["y"] == ys[t]
        assert r["forecast"] == q4(f), (t, r)
        assert r["level"] == q4(l), (t, r)
        assert r["trend"] == q4(b), (t, r)


def test_cusum_flags_persistent_drift_not_baseline_noise(spark):
    """A +4/day drift after a flat 7-day baseline must trip alarm_up
    only after the accumulation crosses threshold (no single day is a
    z-outlier), never alarm_down; baseline days stay at zero.  States
    match a straight-line integer recursion."""
    from analysisofuserbehavior_spark.operators.diagnostics import (
        cusum_drift_daily,
    )

    ys = [10] * 7 + [14] * 14  # small persistent drift, +4/day
    rows, eid = [], 0
    for d, y in enumerate(ys):
        for _ in range(y):
            rows.append((eid, MONDAY + timedelta(days=d), 1, "click", 0.0, "{}"))
            eid += 1
    got = cusum_drift_daily(spark.createDataFrame(rows, EVENTS)).collect()
    assert len(got) == len(ys)
    # straight-line reference: W=7, B=70, slack 2, threshold 20
    W, B, K, H = 7, 70, 2, 20
    up = down = 0
    for t, r in enumerate(got):
        if t < W:
            assert (r["cusum_up"], r["cusum_down"]) == (0, 0)
            assert not r["alarm_up"] and not r["alarm_down"]
            continue
        dev = W * ys[t] - B
        up = max(0, up + (dev - W * K))
        down = max(0, down - (dev + W * K))
        assert (r["cusum_up"], r["cusum_down"]) == (up, down), t
        assert r["alarm_up"] == (up > W * H) and r["alarm_down"] == (down > W * H)
    # the drift is small per-day (dev-slack = 14/day scaled) but MUST
    # eventually alarm; and it must NOT alarm on the very first day
    assert not got[W]["alarm_up"]
    assert got[-1]["alarm_up"] and not got[-1]["alarm_down"]


def test_theilsen_robust_to_outlier_day(spark):
    """A clean y = 10 + 2·i series with ONE wild outlier day: the
    Theil–Sen slope must stay exactly 2.0/day and the intercept 10.0
    (median immunity), matching a straight-line reference median;
    a least-squares fit would be dragged ~3× off."""
    from analysisofuserbehavior_spark.operators.diagnostics import (
        theilsen_trend_daily,
    )

    ys = [10 + 2 * i for i in range(1, 16)]
    ys[7] = 500  # wild bot-spike day
    rows, eid = [], 0
    for d, y in enumerate(ys):
        for _ in range(y):
            rows.append((eid, MONDAY + timedelta(days=d), 1, "click", 0.0, "{}"))
            eid += 1
    r = theilsen_trend_daily(spark.createDataFrame(rows, EVENTS)).collect()[0]
    assert r["n_days"] == 15
    # reference median of pairwise slopes over CALENDAR-day offsets
    # (x = d, the offset from the first day; contiguous here so the
    # offset equals position-1)
    n = len(ys)
    slopes = sorted(
        (ys[j] - ys[i]) / (j - i) for i in range(n) for j in range(i + 1, n)
    )
    m = len(slopes)
    want = (slopes[(m + 1) // 2 - 1] + slopes[m // 2]) / 2
    assert r["slope_per_day"] == math.floor(want * 1e6 + 0.5) / 1e6 == 2.0
    resid = sorted(ys[d] - want * d for d in range(n))
    wi = (resid[(n + 1) // 2 - 1] + resid[n // 2]) / 2
    # intercept at the FIRST day (x=0): y(0) = 10 + 2·1 = 12
    assert r["intercept"] == math.floor(wi * 1e6 + 0.5) / 1e6 == 12.0
    assert r["slope_per_week"] == 14.0


def test_theilsen_gapped_series_slope_is_per_calendar_day(spark):
    """ADVICE r08 regression: with missing calendar days the slope
    denominator must be the DATE gap, not the position gap.  Days
    d=0,1,3 with y=10,12,16 lie exactly on y = 10 + 2·d: every
    pairwise calendar-day slope is 2.0 (the position-gap form would
    report median 3.0 and mislabel it per-day)."""
    from analysisofuserbehavior_spark.operators.diagnostics import (
        theilsen_trend_daily,
    )

    rows, eid = [], 0
    for d, y in ((0, 10), (1, 12), (3, 16)):
        for _ in range(y):
            rows.append((eid, MONDAY + timedelta(days=d), 1, "click", 0.0, "{}"))
            eid += 1
    r = theilsen_trend_daily(spark.createDataFrame(rows, EVENTS)).collect()[0]
    assert r["n_days"] == 3
    assert r["slope_per_day"] == 2.0
    assert r["intercept"] == 10.0
    assert r["slope_per_week"] == 14.0


def test_theilsen_degenerate_single_day(spark):
    from analysisofuserbehavior_spark.operators.diagnostics import (
        theilsen_trend_daily,
    )

    rows = [(i, MONDAY, 1, "click", 0.0, "{}") for i in range(5)]
    assert theilsen_trend_daily(spark.createDataFrame(rows, EVENTS)).count() == 0


def test_changepoint_finds_planted_level_shift(spark):
    """10 days at ~20/day then 10 days at ~50/day: the top split must
    be the last low day, with segment means recovering both levels.
    Small per-day wiggle keeps the series non-constant inside each
    segment (the realistic case)."""
    from analysisofuserbehavior_spark.operators.diagnostics import (
        changepoint_daily,
    )

    counts = {i: 20 + (i % 3) for i in range(10)}
    counts.update({i: 50 + (i % 3) for i in range(10, 20)})
    got = changepoint_daily(_days(spark, counts)).collect()
    top = got[0]
    assert top["split_day"] == (MONDAY + timedelta(days=9)).strftime("%Y-%m-%d")
    assert top["n_days_before"] == 10 and top["n_days_after"] == 10
    assert 20 <= top["mean_before"] <= 23 and 50 <= top["mean_after"] <= 53
    # gains ordered; the planted split strictly beats its neighbors
    # (adjacent splits still capture most of the between-SSE, so the
    # margin is small but the argmax is exact)
    gains = [r["sse_gain"] for r in got]
    assert gains == sorted(gains, reverse=True)
    assert gains[0] > gains[1]


def test_changepoint_flat_series_has_near_zero_gain(spark):
    from analysisofuserbehavior_spark.operators.diagnostics import (
        changepoint_daily,
    )

    got = changepoint_daily(_days(spark, {i: 30 for i in range(12)})).collect()
    assert all(abs(r["sse_gain"]) < 1e-6 for r in got)
