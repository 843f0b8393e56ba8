"""A/B test report: assignment determinism, z-test arithmetic vs a
straight-line Python model, the se=0 degenerate guard, and the
time-bound conversion window semantics."""

from __future__ import annotations

import hashlib
import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.operators.experimentation import (
    _variant,
    ab_test_report,
)

EVENTS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, EVENTS)


def _py_variant(uid: int) -> str:
    return "A" if ord(hashlib.md5(str(uid).encode()).hexdigest()[0]) % 2 == 0 else "B"


def test_variant_assignment_matches_python_md5(spark):
    df = spark.range(0, 200).select(
        F.col("id"), _variant(F.col("id")).alias("v")
    )
    for r in df.collect():
        assert r["v"] == _py_variant(r["id"]), r["id"]
    # and the split is roughly balanced — a degenerate hash would
    # silently turn every experiment into one empty arm
    counts = {r["v"]: r["n"] for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()}
    assert min(counts.values()) > 60


def _mk_user(uid, converted, t0=datetime(2024, 1, 1, 8, 0)):
    """First event at t0; purchase 1h later iff converted, else a
    purchase far outside the 24h window."""
    rows = [(uid * 10, t0, uid, "view", 0.0, "{}")]
    if converted:
        rows.append((uid * 10 + 1, t0 + timedelta(hours=1), uid, "purchase", 1.0, "{}"))
    else:
        rows.append((uid * 10 + 1, t0 + timedelta(days=5), uid, "purchase", 1.0, "{}"))
    return rows


def test_ab_report_matches_python_model(spark):
    # build a corpus with a REAL effect: variant A users convert,
    # variant B users don't (assignment discovered via the model hash)
    a_users = [u for u in range(100) if _py_variant(u) == "A"][:20]
    b_users = [u for u in range(100) if _py_variant(u) == "B"][:20]
    rows = []
    for u in a_users:
        rows += _mk_user(u, converted=True)
    for i, u in enumerate(b_users):
        rows += _mk_user(u, converted=(i < 4))  # 20% on the B arm
    got = ab_test_report(_ev(spark, rows)).collect()[0]
    n_a, n_b, c_a, c_b = 20, 20, 20, 4
    assert (got["n_a"], got["conv_a"], got["n_b"], got["conv_b"]) == (
        n_a,
        c_a,
        n_b,
        c_b,
    )
    ra, rb = c_a / n_a, c_b / n_b
    pooled = (c_a + c_b) / (n_a + n_b)
    se = math.sqrt(pooled * (1.0 - pooled) * (1.0 / n_a + 1.0 / n_b))
    z = math.floor((ra - rb) / se * 1e4 + 0.5) / 1e4
    assert got["rate_a"] == math.floor(ra * 1e6 + 0.5) / 1e6
    assert got["rate_b"] == math.floor(rb * 1e6 + 0.5) / 1e6
    assert got["z_score"] == z
    assert got["significant"] is True  # 100% vs 20% on n=20+20 is loud


def test_ab_report_se_zero_guard(spark):
    # every user converts → pooled rate 1.0 → se = 0: the report must
    # answer z=0 / not-significant, not raise (ANSI division)
    rows = []
    for u in range(30):
        rows += _mk_user(u, converted=True)
    got = ab_test_report(_ev(spark, rows)).collect()[0]
    assert got["conv_a"] == got["n_a"] and got["conv_b"] == got["n_b"]
    assert got["z_score"] == 0.0
    assert got["significant"] is False


def test_ab_report_conversion_is_time_bound(spark):
    # a purchase outside the window must NOT count as conversion
    rows = _mk_user(1, converted=False)  # purchase at +5 days
    got = ab_test_report(_ev(spark, rows)).collect()[0]
    assert got["conv_a"] + got["conv_b"] == 0
    # widen the window and the same corpus converts
    got2 = ab_test_report(_ev(spark, rows), window_s=6 * 86400).collect()[0]
    assert got2["conv_a"] + got2["conv_b"] == 1


def test_ab_report_empty_input(spark):
    row = ab_test_report(_ev(spark, [])).collect()[0]
    assert (row["n_a"], row["n_b"]) in ((None, None), (0, 0))


def _mk_cuped_user(uid, pre_n, post_n):
    """pre purchases in early January, post purchases after the 15th."""
    rows = [(uid * 100, datetime(2024, 1, 2, 9, 0), uid, "view", 0.0, "{}")]
    for i in range(pre_n):
        rows.append(
            (uid * 100 + 1 + i, datetime(2024, 1, 3 + i % 10, 10, 0), uid, "purchase", 1.0, "{}")
        )
    for i in range(post_n):
        rows.append(
            (uid * 100 + 50 + i, datetime(2024, 1, 16 + i % 10, 10, 0), uid, "purchase", 1.0, "{}")
        )
    return rows


def test_cuped_matches_python_model(spark):
    from analysisofuserbehavior_spark.operators.experimentation import ab_test_cuped

    # correlated corpus: heavy users purchase in BOTH periods
    users = [(u, u % 5, (u % 5) + (1 if u % 2 else 0)) for u in range(40)]
    rows = []
    for u, pre, post in users:
        rows += _mk_cuped_user(u, pre, post)
    got = ab_test_cuped(spark.createDataFrame(rows, EVENTS)).collect()[0]

    xs = [pre for _, pre, _ in users]
    ys = [post for _, _, post in users]
    n = len(users)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    var_x = (n * sxx - sx * sx) / (n * n)
    var_y = (n * syy - sy * sy) / (n * n)
    cov = (n * sxy - sx * sy) / (n * n)
    theta = cov / var_x
    q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
    assert got["theta"] == q6(theta)
    assert got["var_y"] == q6(var_y)
    assert got["var_cuped"] == q6(var_y - theta * theta * var_x)
    # strong pre/post correlation → big variance reduction
    assert got["var_reduction_pct"] > 50.0
    # arm means: recompute with the model's own assignment
    a = [(x, y) for (u, x, y) in [(u, xs[i], ys[i]) for i, (u, _, _) in enumerate(users)] if _py_variant(u) == "A"]
    b = [(x, y) for (u, x, y) in [(u, xs[i], ys[i]) for i, (u, _, _) in enumerate(users)] if _py_variant(u) == "B"]
    my_a, my_b = sum(y for _, y in a) / len(a), sum(y for _, y in b) / len(b)
    mx_a, mx_b = sum(x for x, _ in a) / len(a), sum(x for x, _ in b) / len(b)
    assert got["diff_raw"] == q6(my_a - my_b)
    assert got["diff_cuped"] == q6((my_a - my_b) - theta * (mx_a - mx_b))


def test_cuped_zero_preperiod_variance(spark):
    from analysisofuserbehavior_spark.operators.experimentation import ab_test_cuped

    # identical pre-period behavior → var(X)=0 → theta=0, CUPED = raw
    rows = []
    for u in range(10):
        rows += _mk_cuped_user(u, 2, u % 3)
    got = ab_test_cuped(spark.createDataFrame(rows, EVENTS)).collect()[0]
    assert got["theta"] == 0.0
    assert got["var_cuped"] == got["var_y"]
    assert got["var_reduction_pct"] == 0.0
    assert got["diff_cuped"] == got["diff_raw"]


def test_cuped_empty_input(spark):
    from analysisofuserbehavior_spark.operators.experimentation import ab_test_cuped

    row = ab_test_cuped(_ev(spark, [])).collect()[0]
    assert row["diff_raw"] is None and row["diff_cuped"] is None


def test_mannwhitney_matches_scipy_convention(spark):
    """Histogram-computed U and tie-corrected z vs a straight-line
    implementation of the textbook formulas (scipy's mannwhitneyu
    with use_continuity=False, method='asymptotic')."""
    from analysisofuserbehavior_spark.operators.experimentation import (
        ab_test_mannwhitney,
    )

    # users with known per-user purchase counts; variant from the
    # same md5 model
    counts = {u: (u * 7) % 5 for u in range(60)}
    rows = []
    eid = 0
    for u, k in counts.items():
        rows.append((eid, datetime(2024, 1, 2, 9), u, "view", 0.0, "{}"))
        eid += 1
        for _ in range(k):
            rows.append((eid, datetime(2024, 1, 3, 9), u, "purchase", 1.0, "{}"))
            eid += 1
    got = ab_test_mannwhitney(_ev(spark, rows)).collect()[0]

    a = sorted(v for u, v in counts.items() if _py_variant(u) == "A")
    b = sorted(v for u, v in counts.items() if _py_variant(u) == "B")
    u_stat = sum(
        1.0 if x > y else 0.5 if x == y else 0.0 for x in a for y in b
    )
    n_a, n_b = len(a), len(b)
    n = n_a + n_b
    from collections import Counter

    tie = sum(t**3 - t for t in Counter(a + b).values())
    var_u = n_a * n_b * (n**3 - n - tie) / (12 * n * (n - 1))
    z = (u_stat - n_a * n_b / 2) / math.sqrt(var_u)
    assert got["n_a"] == n_a and got["n_b"] == n_b
    assert got["u_stat"] == u_stat
    assert got["z_score"] == math.floor(z * 1e4 + 0.5) / 1e4
    assert got["significant"] == (abs(got["z_score"]) > 1.96)


def test_mannwhitney_identical_distributions_z_zero(spark):
    from analysisofuserbehavior_spark.operators.experimentation import (
        ab_test_mannwhitney,
    )

    # every user has the same count → all ties → var 0 → z := 0
    rows = []
    for u in range(20):
        rows.append((u * 10, datetime(2024, 1, 2, 9), u, "purchase", 1.0, "{}"))
    got = ab_test_mannwhitney(_ev(spark, rows)).collect()[0]
    assert got["z_score"] == 0.0 and got["significant"] is False
    # U still equals the all-ties value n_a*n_b/2
    assert got["u_stat"] == got["n_a"] * got["n_b"] / 2


def test_mannwhitney_no_int64_overflow_at_large_n(spark):
    """ADVICE r07 regression: the variance product nA·nB·(n³−n−tie)
    exceeds int64 once n ≳ 8-9k users (n⁵/4 > 2⁶³), which under ANSI
    mode raised ARITHMETIC_OVERFLOW before the moments were promoted
    to double.  12k synthetic users must now produce a finite z."""
    from analysisofuserbehavior_spark.operators.experimentation import (
        ab_test_mannwhitney,
    )

    n_users = 12_000
    ev = spark.range(n_users).select(
        F.col("id").alias("event_id"),
        F.lit(datetime(2024, 1, 2, 9)).alias("ts"),
        F.col("id").alias("user_id"),
        # ~half the users convert once, with enough distinct y levels
        # (0/1) to keep the tie term non-degenerate
        F.when(F.col("id") % 2 == 0, F.lit("purchase"))
        .otherwise(F.lit("view"))
        .alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    got = ab_test_mannwhitney(ev).collect()[0]
    assert got["n_a"] + got["n_b"] == n_users
    assert math.isfinite(got["z_score"])
    # sanity: n^5/4 really is past int64 (the pre-fix failing regime)
    assert n_users**5 / 4 > 2**63


def test_mannwhitney_tie_cube_no_overflow_at_2m_tie_group(spark):
    """ADVICE r08 regression: tie_term summed t³−t as BIGINT, so one
    dominant tie group past ~2.1M rows (t³ > 2⁶³ — e.g. the y=0 user
    mass of any low-conversion experiment) overflowed under ANSI mode
    even after the variance-product promotion.  2.2M never-converting
    users (one giant tie at y=0) must now produce a finite z."""
    from analysisofuserbehavior_spark.operators.experimentation import (
        ab_test_mannwhitney,
    )

    n_users = 2_200_000
    assert n_users**3 > 2**63  # the pre-fix failing regime
    ev = spark.range(n_users).select(
        F.col("id").alias("event_id"),
        F.lit(datetime(2024, 1, 2, 9)).alias("ts"),
        F.col("id").alias("user_id"),
        F.lit("view").alias("event_type"),  # nobody converts: y=0 for all
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    got = ab_test_mannwhitney(ev).collect()[0]
    assert got["n_a"] + got["n_b"] == n_users
    assert math.isfinite(got["z_score"])
    assert got["z_score"] == 0.0  # identical (degenerate) distributions


def test_quantile_effects_exact_inverse_cdf(spark):
    from analysisofuserbehavior_spark.operators.experimentation import (
        ab_test_quantile_effects,
    )

    # known per-user counts; quantile = smallest y with cum*100 >= p*n
    counts = {u: (u % 10) for u in range(80)}
    rows = []
    eid = 0
    for u, k in counts.items():
        rows.append((eid, datetime(2024, 1, 2, 9), u, "view", 0.0, "{}"))
        eid += 1
        for _ in range(k):
            rows.append((eid, datetime(2024, 1, 3, 9), u, "purchase", 1.0, "{}"))
            eid += 1
    got = ab_test_quantile_effects(_ev(spark, rows)).collect()[0]

    def q(vals, p):
        vals = sorted(vals)
        n = len(vals)
        cum = 0
        from collections import Counter

        for v, c in sorted(Counter(vals).items()):
            cum += c
            if cum * 100 >= p * n:
                return v

    a = [v for u, v in counts.items() if _py_variant(u) == "A"]
    b = [v for u, v in counts.items() if _py_variant(u) == "B"]
    assert (got["n_a"], got["n_b"]) == (len(a), len(b))
    for p in (25, 50, 75, 90):
        assert got[f"p{p}_a"] == q(a, p), p
        assert got[f"p{p}_b"] == q(b, p), p
        assert got[f"d{p}"] == q(a, p) - q(b, p), p
