"""Unit semantics for the temporal-join operators plus plan-shape
audits: the range join must NOT fall back to a nested-loop join, the
as-of window must be keyed (never a global sort), and grouped_top_k
must agree with the single-window form it shards."""

from __future__ import annotations

from pyspark.sql import Row, functions as F
from pyspark.sql.window import Window

from analysisofuserbehavior_spark import plans
from analysisofuserbehavior_spark.functions.skew import grouped_top_k
from analysisofuserbehavior_spark.operators.temporal_join import (
    asof_join,
    range_join_buckets,
)
from analysisofuserbehavior_spark.registry import QUERIES


def _asof(spark, strict):
    left = spark.createDataFrame(
        [Row(id=1, k="a", ts=100), Row(id=2, k="a", ts=50), Row(id=3, k="b", ts=10)]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=50, rid=7),   # same instant as left id=2
            Row(k="a", ts=99, rid=8),
            Row(k="a", ts=99, rid=9),   # tie on ts: max rid must win
            Row(k="b", ts=11, rid=10),  # after left id=3: never matches
        ]
    )
    out = asof_join(
        left, right, by=["k"], left_ts="ts", right_ts="ts",
        carry=["rid"], tiebreak="rid", strict=strict,
    )
    return {r["id"]: (r["prior_rid"], r["_prior_ts"]) for r in out.collect()}


def test_asof_strict_excludes_same_instant(spark):
    got = _asof(spark, strict=True)
    assert got[1] == (9, 99)      # tie on ts=99 resolved to max rid
    assert got[2] == (None, None)  # ts=50 right row invisible under strict
    assert got[3] == (None, None)  # right row is later, left-outer null


def test_asof_inclusive_sees_same_instant(spark):
    got = _asof(spark, strict=False)
    assert got[2] == (7, 50)
    assert got[1] == (9, 99)


def test_range_join_matches_each_containment_exactly_once(spark):
    # interval spans 3 buckets (width 10); points on every boundary
    iv = spark.createDataFrame([Row(iid=1, s=5, e=25)])
    pts = spark.createDataFrame([Row(pid=p, ts=p) for p in [4, 5, 10, 20, 24, 25]])
    got = sorted(
        r["pid"]
        for r in range_join_buckets(pts, iv, "ts", "s", "e", 10).collect()
    )
    assert got == [5, 10, 20, 24]  # half-open [5, 25), each once


def test_range_join_open_end_claims_no_extra_bucket(spark):
    # end=20 aligned on a bucket edge: bucket 2 must NOT be scanned
    iv = spark.createDataFrame([Row(iid=1, s=0, e=20)])
    pts = spark.createDataFrame([Row(pid=20, ts=20)])
    assert range_join_buckets(pts, iv, "ts", "s", "e", 10).count() == 0


def test_grouped_top_k_equals_single_window(spark, sf_dir):
    from analysisofuserbehavior_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    order = [F.desc("n_chars"), F.asc("doc_id")]
    sharded = grouped_top_k(docs, ["source"], order, k=5)
    w = Window.partitionBy("source").orderBy(*order)
    plain = docs.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 5)
    assert sorted(map(tuple, sharded.collect())) == sorted(map(tuple, plain.collect()))


def test_error_burst_plan_has_no_nested_loop_join(spark, sf_dir):
    """The whole point of the bucketed rewrite: Catalyst's native plan
    for an inequality-only join is BroadcastNestedLoopJoin —
    O(points*intervals) at 100 TB."""
    df = QUERIES["error_burst_click_counts"](spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "NestedLoop" not in plan, plan[:2000]
    assert "Cartesian" not in plan


def test_asof_query_window_is_keyed(spark, sf_dir):
    """The carry-forward window must partition by user_id — an
    unkeyed window serializes the whole union onto one task."""
    df = QUERIES["click_asof_prior_view"](spark, sf_dir)
    plan = plans.executed_plan(df)
    assert "Window" in plan
    # no single-partition exchange may feed the window
    assert "SinglePartition" not in plan, plan[:2000]


def test_contamination_benchmark_side_broadcasts(spark, sf_dir):
    df = QUERIES["benchmark_contamination"](spark, sf_dir)
    assert plans.has_broadcast_join(df)


# ---- property: asof_join vs pandas merge_asof ------------------------------

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st


@st.composite
def asof_cases(draw):
    nl = draw(st.integers(min_value=1, max_value=15))
    nr = draw(st.integers(min_value=0, max_value=15))
    # small ts domain forces ties (same key, same ts) often
    left = [
        (i, draw(st.integers(1, 3)), draw(st.integers(0, 12))) for i in range(nl)
    ]
    right = [
        (100 + i, draw(st.integers(1, 3)), draw(st.integers(0, 12)))
        for i in range(nr)
    ]
    return left, right


@given(asof_cases())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_pandas_merge_asof(spark, case):
    """merge_asof(direction='backward', allow_exact_matches=False) is
    the independent reference; right-side ties on (key, ts) are
    pre-collapsed to max id — the same tie-break the window's order
    applies — since merge_asof keeps the last sorted row anyway."""
    lrows, rrows = case
    left = spark.createDataFrame(lrows, "id long, k long, ts long")
    right = spark.createDataFrame(
        [(r, k, t) for r, k, t in rrows], "rid long, k long, ts long"
    )
    got = {
        r["id"]: r["prior_rid"]
        for r in asof_join(
            left, right, by=["k"], left_ts="ts", right_ts="ts",
            carry=["rid"], tiebreak="rid", strict=True,
        ).collect()
    }

    lp = pd.DataFrame(lrows, columns=["id", "k", "ts"]).sort_values("ts", kind="stable")
    rp = (
        pd.DataFrame(rrows, columns=["rid", "k", "ts"])
        .groupby(["k", "ts"], as_index=False)["rid"].max()
        .sort_values("ts", kind="stable")
    )
    if len(rp):
        merged = pd.merge_asof(
            lp, rp, on="ts", by="k", direction="backward", allow_exact_matches=False
        )
        want = {
            int(r.id): (None if pd.isna(r.rid) else int(r.rid))
            for r in merged.itertuples()
        }
    else:
        want = {int(i): None for i, _, _ in lrows}
    assert got == want
