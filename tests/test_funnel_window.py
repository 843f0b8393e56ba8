"""funnel_within_window: the greedy max-start fold vs a brute-force
chain search, randomized (hypothesis) plus adversarial boundary
cases."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from analysisofuserbehavior_spark.operators.engagement import funnel_within_window

EVENTS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
T0 = datetime(2024, 1, 1)
WINDOW_S = 3600  # 1h window for the synthetic cases
TYPES = ["view", "click", "purchase"]


def _brute_levels(evs, window_s):
    """evs: [(offset_s, event_id, type_code 1..3)].  Exhaustive chain
    search under (ts, event_id) ordering."""
    evs = sorted(evs, key=lambda e: (e[0], e[1]))
    n = len(evs)
    r1 = any(e[2] == 1 for e in evs)
    r2 = r3 = False
    for i in range(n):
        if evs[i][2] != 1:
            continue
        for j in range(i + 1, n):
            if evs[j][2] != 2 or evs[j][0] - evs[i][0] > window_s:
                continue
            r2 = True
            for k in range(j + 1, n):
                if evs[k][2] == 3 and evs[k][0] - evs[i][0] <= window_s:
                    r3 = True
    return r1, r2, r3


def _run(spark, per_user_events, window_s=WINDOW_S):
    rows = []
    for uid, evs in per_user_events.items():
        for off, eid, tc in evs:
            rows.append(
                (
                    uid * 1000 + eid,  # globally unique, per-user order-preserving
                    T0 + timedelta(seconds=off),
                    uid,
                    TYPES[tc - 1],
                    0.0,
                    "{}",
                )
            )
    df = spark.createDataFrame(rows, EVENTS)
    got = {r["step"]: r["users"] for r in funnel_within_window(df, window_s).collect()}
    return got


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=7200),
                st.just(0),
                st.integers(min_value=1, max_value=3),
            ),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_fold_matches_bruteforce(spark, users):
    per_user = {}
    eid = 0
    for uid, evs in enumerate(users):
        # assign globally unique, order-meaningful event ids
        tagged = []
        for off, _, tc in evs:
            tagged.append((off, eid, tc))
            eid += 1
        per_user[uid] = tagged
    want = [0, 0, 0]
    for evs in per_user.values():
        r = _brute_levels(evs, WINDOW_S)
        for i in range(3):
            want[i] += int(r[i])
    got = _run(spark, per_user)
    assert [got[1], got[2], got[3]] == want


def test_later_start_dominates(spark):
    # earliest view's window expires before the purchase; a later view
    # rescues the chain — a "keep only the FIRST view" fold would miss it
    evs = [
        (0, 1, 1),      # view (chain would need purchase by 3600)
        (10, 2, 2),     # click
        (3000, 3, 1),   # later view
        (3100, 4, 2),   # click after it
        (5000, 5, 3),   # purchase: 5000-3000=2000 <= 3600 OK; 5000-0 > 3600
    ]
    got = _run(spark, {7: evs})
    assert (got[1], got[2], got[3]) == (1, 1, 1)


def test_window_boundary_inclusive(spark):
    # step exactly AT the window edge counts (<=), one past it doesn't
    on_edge = {1: [(0, 1, 1), (WINDOW_S, 2, 2)]}
    past_edge = {1: [(0, 1, 1), (WINDOW_S + 1, 2, 2)]}
    assert _run(spark, on_edge)[2] == 1
    assert _run(spark, past_edge)[2] == 0


def test_order_strictness_same_timestamp(spark):
    # same-timestamp events: later event_id counts as "after"
    after = {1: [(0, 1, 1), (0, 2, 2)]}
    before = {1: [(0, 2, 1), (0, 1, 2)]}  # click precedes view in order
    assert _run(spark, after)[2] == 1
    assert _run(spark, before)[2] == 0


def test_empty_events(spark):
    got = _run(spark, {})
    assert (got[1], got[2], got[3]) == (0, 0, 0)


def test_streaming_fold_spans_batch_boundary(spark, tmp_path):
    """A chain whose steps STRADDLE the micro-batch split must still
    complete: the (l1,l2,l3) state carries the fold across triggers.
    Also pins the window check across batches (chain expired before
    phase 2 must NOT complete)."""
    import os

    from analysisofuserbehavior_spark.streaming.ad_stream import run_to_completion
    from analysisofuserbehavior_spark.streaming.stateful import (
        final_funnel_counts,
        funnel_levels_stream,
    )

    # user 1: view+click in phase 1, purchase in phase 2 (in window)
    # user 2: view in phase 1, click+purchase in phase 2 but outside
    #         the 1h window of the view
    p1 = [
        (1, T0, 1, "view", 0.0, "{}"),
        (2, T0 + timedelta(minutes=5), 1, "click", 0.0, "{}"),
        (3, T0, 2, "view", 0.0, "{}"),
    ]
    p2 = [
        (4, T0 + timedelta(minutes=30), 1, "purchase", 0.0, "{}"),
        (5, T0 + timedelta(hours=3), 2, "click", 0.0, "{}"),
        (6, T0 + timedelta(hours=3, minutes=1), 2, "purchase", 0.0, "{}"),
    ]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, rows in enumerate([p1, p2]):
        df = spark.createDataFrame(rows, EVENTS)
        stage = str(tmp_path / f"s{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        import glob

        part = glob.glob(stage + "/part-*.parquet")[0]
        dst = os.path.join(in_dir, f"phase_{i}.parquet")
        os.replace(part, dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    stream = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    updates = run_to_completion(
        funnel_levels_stream(stream, window_s=3600), "sfunnel_t", mode="update"
    )
    assert updates.count() > updates.select("user_id").distinct().count()
    got = {r["step"]: r["users"] for r in final_funnel_counts(updates).collect()}
    # user 1 completes across the boundary; user 2's chain expired
    assert (got[1], got[2], got[3]) == (2, 1, 1)


def test_multitouch_attribution_hand_computed(spark):
    """Known journey: user 1 clicks ads 3, 5, 3 then purchases; k=3
    touches → 3333 bps each, remainder 1 to the LAST touch (ad 3).
    A click AFTER the purchase and one outside the 7-day window get
    nothing; a touchless purchase contributes no credit rows."""
    from analysisofuserbehavior_spark.operators.engagement import (
        multitouch_attribution,
    )

    def ev(eid, offset_s, uid, etype, ad):
        return (
            eid,
            T0 + timedelta(seconds=offset_s),
            uid,
            etype,
            0.0,
            '{"k": %d}' % ad,
        )

    rows = [
        ev(1, 0, 1, "click", 3),
        ev(2, 60, 1, "click", 5),
        ev(3, 120, 1, "click", 3),
        ev(4, 180, 1, "purchase", 0),
        ev(5, 240, 1, "click", 7),          # after conversion: no credit
        ev(6, 0, 2, "click", 9),
        ev(7, 8 * 86400, 2, "purchase", 0),  # outside 7d window
        ev(8, 0, 3, "purchase", 0),          # touchless conversion
    ]
    df = spark.createDataFrame(rows, EVENTS)
    got = {r["ad_id"]: (r["n_touches"], r["credit_bps"])
           for r in multitouch_attribution(df).collect()}
    # ads 3 (x2, incl. last touch +1 rem) and 5 (x1); nothing else
    assert got == {3: (2, 3333 + 3333 + 1), 5: (1, 3333)}


def test_multitouch_attribution_same_ts_tiebreak_and_exact_sum(spark):
    """Touch at the conversion's exact timestamp counts iff its
    event_id is smaller; every conversion's credit sums to exactly
    10000 bps regardless of k."""
    from analysisofuserbehavior_spark.operators.engagement import (
        multitouch_attribution,
    )

    rows = [
        (1, T0, 1, "click", 0.0, '{"k": 1}'),
        (2, T0, 1, "purchase", 0.0, '{"k": 0}'),   # eid 1 < 2: counts
        (3, T0, 1, "click", 0.0, '{"k": 2}'),      # eid 3 > 2: no credit
        # user 2: k=7 touches -> 7*1428 + 4 = 10000
        *[(10 + i, T0 + timedelta(seconds=i), 2, "click", 0.0, '{"k": %d}' % (i % 3))
          for i in range(7)],
        (20, T0 + timedelta(seconds=100), 2, "purchase", 0.0, '{"k": 0}'),
    ]
    df = spark.createDataFrame(rows, EVENTS)
    out = multitouch_attribution(df).collect()
    total = sum(r["credit_bps"] for r in out)
    assert total == 2 * 10000  # two credited conversions, exact bps each
    got = {r["ad_id"]: r["credit_bps"] for r in out}
    assert got[1] >= 10000  # user-1 single touch (ad 1) got the full credit


def test_multitouch_attribution_hot_user_linear(spark):
    """Round-10 regression: with k = size(filter(...)) embedded in the
    per-element credit lambda, every touch re-evaluated the whole
    filter over the user's array — O(T²) per conversion (a 200k-click
    bot ran >10 min).  Materialized, one 50k-click bot must finish in
    seconds and credit exact multiples of 10000 bps."""
    import time

    from pyspark.sql import functions as F

    from analysisofuserbehavior_spark.operators.engagement import (
        multitouch_attribution,
    )

    ev = spark.range(50_005).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestamp_micros(cast(1704100000000000 + id * 1000000 as long))"
        ).alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        F.when(F.col("id") % 10_001 == 0, "purchase")
        .otherwise("click")
        .alias("event_type"),
        F.lit(1.0).alias("value"),
        F.concat(
            F.lit('{"k": '), (F.col("id") % 10).cast("string"), F.lit("}")
        ).alias("props"),
    )
    t0 = time.perf_counter()
    out = multitouch_attribution(ev).collect()
    dt = time.perf_counter() - t0
    total = sum(r["credit_bps"] for r in out)
    assert total % 10000 == 0 and total > 0
    assert dt < 120, f"quadratic credit fold regressed: {dt:.0f}s"
