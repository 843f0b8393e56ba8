"""Distributed two-pass rank/ntile must agree with the single-window
built-ins row-for-row — including the remainder-bucket edge cases —
while never sorting the frame on one partition."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window, functions as F

from analysisofuserbehavior_spark import plans
from analysisofuserbehavior_spark.functions.ranking import (
    distributed_ntile,
    with_global_rank,
)
from analysisofuserbehavior_spark.registry import QUERIES


def _frame(spark, n, dup_every=3):
    # duplicate values every dup_every rows: exercises tie-break order
    return spark.createDataFrame(
        [Row(v=(i // dup_every) * 7, id=f"x{i:04d}") for i in range(n)]
    )


@pytest.mark.parametrize("n", [1, 9, 10, 11, 25, 100, 257])
def test_global_rank_equals_row_number(spark, n):
    df = _frame(spark, n)
    got = {
        r["id"]: r["global_rank"]
        for r in with_global_rank(df, "v", "id", n_buckets=7).collect()
    }
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,k", [(1, 10), (9, 10), (25, 10), (100, 7), (257, 10)])
def test_distributed_ntile_equals_builtin(spark, n, k):
    df = _frame(spark, n)
    got = {
        r["id"]: r["decile"]
        for r in distributed_ntile(df, "v", "id", k=k, n_buckets=5).collect()
    }
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = {
        r["id"]: r["nt"]
        for r in df.withColumn("nt", F.ntile(k).over(w)).collect()
    }
    assert got == want


def test_deciles_query_never_sorts_frame_on_one_partition(spark, sf_dir):
    """Windows touching the session frame must be partitioned by the
    range bucket; only the n_buckets-row offsets frame may run a
    single-partition window."""
    import re

    df = QUERIES["session_length_deciles"](spark, sf_dir)
    plan = plans.executed_plan(df)
    # the ranking window over the session frame is keyed by _bucket
    rank_windows = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "visit_length" in ln
    ]
    assert rank_windows and all("_bucket" in ln for ln in rank_windows)
    # an unpartitioned window spec starts with a SORT argument
    # (partitioned ones start with the partition key); every such
    # window must run on the _bn bucket-offsets frame, nothing else
    unpartitioned = [
        ln
        for ln in plan.splitlines()
        if re.search(r"windowspecdefinition\([^,)]+ (ASC|DESC)", ln)
    ]
    assert unpartitioned and all("_bn" in ln for ln in unpartitioned)


def test_heavy_hitter_sketch_exact_when_tracked_and_lossy_when_not(spark, sf_dir):
    """approx_top_k must reproduce exact counts while the vocabulary
    fits maxItemsTracked; in the under-tracked regime the top-1 item
    must still surface (frequent-items guarantee for any item with
    freq > N/maxItems)."""
    from analysisofuserbehavior_spark.registry import QUERIES
    from analysisofuserbehavior_spark.sources import load_table

    got = {
        r["token"]: r["n"]
        for r in QUERIES["vocab_heavy_hitters_sketch"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    exact = {
        r["token"]: r["cnt"]
        for r in tokens.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert all(exact[t] == n for t, n in got.items())

    # lossy regime needs a genuinely heavy hitter (freq > N/maxItems):
    # 60% of a constructed stream vs 40% spread over 20 tail tokens
    skewed = spark.createDataFrame(
        [("hot",)] * 120 + [(f"tail{i % 20}",) for i in range(80)], "token string"
    )
    lossy = spark.sql(
        "SELECT approx_top_k(token, 1, 4) AS top FROM {t}", t=skewed
    ).collect()[0]["top"]
    assert lossy and lossy[0]["item"] == "hot"


def test_heavy_hitter_sketch_never_shuffles_per_token_rows(spark, sf_dir):
    """The sketch aggregate must partial-aggregate map-side: the
    exchange carries merged sketches (ObjectHashAggregate partial),
    never a hash-partitioned per-token shuffle."""
    from analysisofuserbehavior_spark.registry import QUERIES

    df = QUERIES["vocab_heavy_hitters_sketch"](spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "partial_approx_top_k" in plan or "ObjectHashAggregate" in plan, plan[:1500]
    assert "hashpartitioning(token" not in plan, plan[:1500]


def test_hll_rollup_union_equals_rescan_and_bounds_exact(spark, sf_dir):
    """The incremental claim: unioning per-day sketches must give the
    same estimate as sketching the whole period in one pass (HLL
    merge = max, associative), and land within HLL lgk=14 error
    (<1%) of the exact distinct count."""
    from analysisofuserbehavior_spark.registry import QUERIES
    from analysisofuserbehavior_spark.sources import load_table

    rollup = {
        r["month"]: r["distinct_users_est"]
        for r in QUERIES["monthly_users_hll_rollup"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        F.substring(F.date_format("ts", "yyyy-MM-dd"), 1, 7).alias("month"),
        "user_id",
    )
    single_pass = {
        r["month"]: r["est"]
        for r in ev.groupBy("month")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").alias("est"))
        .collect()
    }
    assert rollup == single_pass
    exact = {
        r["month"]: r["n"]
        for r in ev.groupBy("month")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for m, est in rollup.items():
        assert abs(est - exact[m]) <= max(1, 0.01 * exact[m]), (m, est, exact[m])


def test_anomaly_zscore_flags_spike(spark):
    """A 10x single-day spike after a flat week must flag; the flat
    days must not (z computed from integer-sum variance)."""
    import math
    from analysisofuserbehavior_spark.registry import QUERIES
    from pyspark.sql import functions as F
    import datetime as dt

    rows = []
    eid = 0
    # 8 flat days of 5 events, then a 50-event spike on day 9
    for d in range(9):
        n = 50 if d == 8 else 5
        if d < 8:
            n = 5 + (d % 2)  # mild alternation so variance > 0
        for i in range(n):
            rows.append(
                (eid, dt.datetime(2024, 3, 1 + d, 12, 0, i % 60), 1, "click", 1.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import analysisofuserbehavior_spark.registry as reg

    # run the registry query body against this frame via monkeypatched loader
    orig = reg._events
    reg._events = lambda spark, sf_dir: ev
    try:
        out = {r["day"]: r for r in QUERIES["daily_anomaly_zscore"](spark, "ignored").collect()}
    finally:
        reg._events = orig
    spike = out["2024-03-09"]
    assert spike["is_anomaly"] and spike["zscore"] > 2
    # python model: counts 5,6,5,6,5,6,5,6 -> prev7 for day9 = 6,5,6,5,6,5,6
    prev = [6, 5, 6, 5, 6, 5, 6]
    s1, s2 = sum(prev), sum(x * x for x in prev)
    z = ((7 * 50 - s1) / 7.0) / math.sqrt((7 * s2 - s1 * s1) / 42.0)
    assert abs(spike["zscore"] - math.floor(z * 1e6 + 0.5) / 1e6) < 1e-12


def test_rank_buckets_stay_balanced_under_whale_skew(spark):
    """The round-11 review finding: equal-width value buckets let one
    whale value stretch the span so every other row lands in bucket 0
    — a one-task sort of ~|rows|.  Quantile-sampled split points must
    keep bucket counts near-equal even with a 10^9x outlier, and the
    rank itself must stay the exact (value, tiebreak) row_number."""
    from pyspark.sql import functions as F

    from analysisofuserbehavior_spark.functions.ranking import with_global_rank

    rows = [(i, i % 1000 + 1) for i in range(4000)]  # bulk in [1, 1000]
    rows.append((4000, 10**12))  # the whale
    df = spark.createDataFrame(rows, "id long, v long")
    ranked = with_global_rank(df, "v", "id", n_buckets=32)
    got = {r["id"]: r["global_rank"] for r in ranked.collect()}
    want = {
        id_: i + 1
        for i, (id_, _) in enumerate(sorted(rows, key=lambda r: (r[1], r[0])))
    }
    assert got == want
    # bucket balance: recompute the bucket assignment the operator
    # uses and assert no bucket swallowed the frame
    splits = df.agg(
        F.percentile_approx(
            "v", F.array(*[F.lit(i / 32) for i in range(1, 32)]), F.lit(10000)
        ).alias("s")
    ).collect()[0]["s"]
    from collections import Counter

    buckets = Counter(sum(1 for s in splits if s < v) for _, v in rows)
    assert max(buckets.values()) < 0.2 * len(rows), buckets.most_common(3)
