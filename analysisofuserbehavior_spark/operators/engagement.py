"""Engagement analytics: decayed trending items and RFM segmentation.

Both are the e-commerce follow-ons to the reference's top-10 modules
(UserVisitSessionAnalyzeSpark top categories; UserActiveDegreeAnalyze
top users): "what is hot NOW" needs recency weighting, and "who is
worth retaining" is classically RFM (recency / frequency / monetary).

Float-parity discipline (the repo rule: no libm, no order-dependent
float sums in gated outputs):

* `trending_items_decayed` uses a HALF-LIFE decay of exactly one
  day, i.e. weight = 2^-age.  Computed entirely in INTEGER space:
  score_scaled = Σ clicks_day · 2^(H-age) as bigint (H = 30-day
  horizon; older days contribute weight < 2^-30 ≈ 1e-9 and are
  excluded by the horizon — documented cutoff, mirrored in the
  oracle).  The reported score is one division of that exact integer
  by 2^H — correctly rounded identically in any IEEE engine.  No
  pow(), no float accumulation.
* `rfm_segments` buckets each dimension with exact inverse-CDF
  quartiles computed by the two-pass range-bucket global rank
  (functions/ranking.py — no unpartitioned window anywhere, because
  monetary_cents is near-unique so a value histogram would be
  |users|-sized).  Scores are 1..4 with 4 best (recency inverted:
  most recent quartile scores 4).

Scale shape: trending is two map-side-combined groupBys (item×day,
then item) + a 1-row broadcast max-day + TakeOrderedAndProject top-k;
RFM is one groupBy(user) + three two-pass bucket-parallel rank passes
+ one broadcast threshold row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TREND_HORIZON_DAYS = 30


def trending_items_decayed(
    actions: DataFrame,
    item_col: str = "product_id",
    event_type: str = "click",
    top: int = 20,
) -> DataFrame:
    """Top items by exponentially-decayed click score (1-day
    half-life, 30-day horizon).  Returns (rank, item, score,
    n_clicks_total)."""
    clicks = (
        actions.where(F.col("event_type") == event_type)
        .where(F.col(item_col).isNotNull())
        .select(F.col(item_col).alias("item"), F.to_date("ts").alias("day"))
    )
    daily = clicks.groupBy("item", "day").agg(F.count(F.lit(1)).alias("c"))
    max_day = daily.agg(F.max("day").alias("max_day"))
    aged = (
        daily.crossJoin(F.broadcast(max_day))
        .withColumn("age", F.datediff(F.col("max_day"), F.col("day")))
        .where(F.col("age") <= TREND_HORIZON_DAYS)
    )
    scaled = aged.groupBy("item").agg(
        # SQL shiftleft (the PySpark wrapper wants a literal bit
        # count; the SQL form takes an expression)
        F.sum(
            F.col("c")
            * F.expr(f"shiftleft(CAST(1 AS BIGINT), {TREND_HORIZON_DAYS} - age)")
        ).alias("score_scaled"),
        F.sum("c").cast("bigint").alias("n_clicks_total"),
    )
    # top-k FIRST (TakeOrderedAndProject: per-partition heaps, driver
    # merge of 32×top rows), THEN rank the ≤top-row survivor frame.  A
    # global row_number window here would funnel EVERY item's aggregate
    # row through one task (`Exchange SinglePartition` — confirmed by
    # the round-8 plan audit; WindowGroupLimit did not fire), a
    # single-task sort straggler at catalog scale (10⁷-10⁸ items).
    # The tiny post-limit window is bounded by |top| rows; no lint
    # whitelist entry exists (or is needed) because
    # TakeOrderedAndProject's output is already one partition — the
    # plan contains no Exchange SinglePartition for the lint to see.
    # If a future plan change materializes the limit as
    # GlobalLimit + Exchange, add the whitelist entry then.
    topk = scaled.orderBy(
        F.col("score_scaled").desc(), F.col("item").asc()
    ).limit(top)
    w = Window.orderBy(F.col("score_scaled").desc(), F.col("item").asc())
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(
            F.col("rank").cast("int").alias("rank"),
            F.col("item").cast("bigint").alias("item"),
            # exact bigint / exact power of two: correctly rounded
            # to the same double in any IEEE engine
            (
                F.col("score_scaled").cast("double")
                / F.lit(float(1 << TREND_HORIZON_DAYS))
            ).alias("score"),
            "n_clicks_total",
        )
    )


def _quartile_thresholds(
    values: DataFrame, col: str, total: DataFrame | None = None
) -> DataFrame:
    """1-row (q1, q2, q3) frame: smallest value whose CDF reaches
    k/4 — exact inverse CDF, computed via the TWO-PASS range-bucket
    rank (functions/ranking.py) rather than a cumulative window over
    the count-by-value histogram.  The histogram-CDF form is sound
    only when the value domain is bounded (the curriculum_stages
    precondition: quality_score is 2-dp quantized); here
    monetary_cents is a near-unique per-user sum, so its "histogram"
    IS the user frame and the unpartitioned cumulative window would
    sort |users| rows in ONE task (the round-8 plan audit found 13
    `Exchange SinglePartition` nodes).  Rank form: rows land in
    value-range buckets that sort in parallel, and
    q_k = min v among rows whose global rank reaches ceil(k·n/4) —
    identical thresholds, because the histogram's cum(v) equals the
    MAX rank among rows of value v, so "∃ row of v with rank·4 ≥ k·n"
    ⇔ "cum(v)·4 ≥ k·n".  `total` (1-row count frame) may be passed in
    to share one count across the three RFM dimensions."""
    from ..functions.ranking import with_global_rank

    ranked = with_global_rank(
        values.select(F.col(col).alias("v")), "v", "v", rank_col="_r"
    )
    tot = (
        total
        if total is not None
        else values.agg(F.count(F.lit(1)).cast("bigint").alias("_t"))
    )
    return ranked.crossJoin(F.broadcast(tot)).agg(
        *[
            F.min(
                F.when(F.col("_r") * 4 >= F.lit(k) * F.col("_t"), F.col("v"))
            ).alias(f"q{k}")
            for k in (1, 2, 3)
        ]
    )


def _bucket_asc(col: F.Column, q1: F.Column, q2: F.Column, q3: F.Column) -> F.Column:
    return (
        F.when(col <= q1, 1)
        .when(col <= q2, 2)
        .when(col <= q3, 3)
        .otherwise(4)
    )


def rfm_segments(
    actions: DataFrame, event_type: str = "purchase"
) -> DataFrame:
    """Per-user RFM scores: (user_id, recency_days, frequency,
    monetary_cents, r_score, f_score, m_score, segment) — scores
    1..4, 4 best; segment = 'RFM' digit string."""
    p = actions.where(F.col("event_type") == event_type).select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    max_day = p.agg(F.max("day").alias("max_day"))
    per_user = (
        p.groupBy("user_id")
        .agg(
            F.max("day").alias("last_day"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum("cents").cast("bigint").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(max_day))
        .withColumn(
            "recency_days",
            F.datediff(F.col("max_day"), F.col("last_day")).cast("bigint"),
        )
        .drop("max_day", "last_day")
    )
    n_users = per_user.agg(F.count(F.lit(1)).cast("bigint").alias("_t"))
    tr = _quartile_thresholds(per_user, "recency_days", n_users)
    tf = _quartile_thresholds(per_user, "frequency", n_users)
    tm = _quartile_thresholds(per_user, "monetary_cents", n_users)
    th = (
        tr.select(
            F.col("q1").alias("r1"), F.col("q2").alias("r2"), F.col("q3").alias("r3")
        )
        .crossJoin(
            tf.select(
                F.col("q1").alias("f1"), F.col("q2").alias("f2"), F.col("q3").alias("f3")
            )
        )
        .crossJoin(
            tm.select(
                F.col("q1").alias("m1"), F.col("q2").alias("m2"), F.col("q3").alias("m3")
            )
        )
    )
    scored = per_user.crossJoin(F.broadcast(th)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        # small recency is GOOD: invert the ascending bucket
        (
            5
            - _bucket_asc(
                F.col("recency_days"), F.col("r1"), F.col("r2"), F.col("r3")
            )
        ).cast("int").alias("r_score"),
        _bucket_asc(F.col("frequency"), F.col("f1"), F.col("f2"), F.col("f3"))
        .cast("int")
        .alias("f_score"),
        _bucket_asc(
            F.col("monetary_cents"), F.col("m1"), F.col("m2"), F.col("m3")
        )
        .cast("int")
        .alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ),
    )


def new_vs_returning_daily(actions: DataFrame) -> DataFrame:
    """Per day: distinct active users split into first-seen-today vs
    returning — the standard growth-accounting view.  Two map-side-
    combined groupBys + one keyed join (first-seen frame is one row
    per user — broadcastable for dim-sized user populations, keyed
    shuffle otherwise; AQE decides from real sizes)."""
    du = (
        actions.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    first_seen = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        du.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).cast("bigint").alias("n_new"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_active",
            "n_new",
            (F.col("n_active") - F.col("n_new")).cast("bigint").alias("n_returning"),
        )
    )


def funnel_within_window(
    events: DataFrame, window_s: int = 6 * 3600
) -> DataFrame:
    """Time-CONSTRAINED ordered funnel (ClickHouse `windowFunnel`
    semantics): a user reaches level k iff some chain
    view ≺ click ≺ purchase exists, each step strictly later in
    (ts, event_id) order, with EVERY step within `window_s` of the
    chain's FIRST event — `funnel_sequential` without the window
    answers lifetime reachability; this answers "did the journey
    happen in one sitting".

    Algorithm (per user, one row-local fold over the time-sorted
    event array): keep, per level, the LATEST chain-start timestamp
    achieving it — keeping the max start dominates every other chain
    for all future extensions (a later start leaves more window), so
    the greedy fold is exact: it reports level k iff ANY qualifying
    chain exists (pinned against the oracle's brute-force EXISTS
    triple join).

    Scale: one shuffle (groupBy user), then O(n·levels) row-local
    work on the collected per-user event structs — per-user event
    counts bound memory exactly like the sessionize rollup; no
    self-join of raw events ever materializes (the oracle's
    |views|×|clicks|×|purchases| triple join is the shape this
    operator exists to avoid)."""
    from ..sources.loaders import epoch_us

    t_us = F.lit(int(window_s) * 1_000_000)
    typed = events.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        F.struct(
            epoch_us(F.col("ts")).alias("us"),
            F.col("event_id").alias("eid"),
            F.when(F.col("event_type") == "view", 1)
            .when(F.col("event_type") == "click", 2)
            .otherwise(3)
            .alias("tc"),
        ).alias("ev"),
    )
    per_user = typed.groupBy("user_id").agg(
        F.sort_array(F.collect_list("ev")).alias("evs")
    )
    # fold accumulator: latest chain-start (epoch-us) reaching each
    # level, -1 = unreached.  An event is exactly one type, so using
    # the PRE-update l1/l2 inside one step is unambiguous.
    zero = F.struct(
        F.lit(-1).cast("bigint").alias("l1"),
        F.lit(-1).cast("bigint").alias("l2"),
        F.lit(-1).cast("bigint").alias("l3"),
    )

    def step(acc, x):
        return F.struct(
            F.when((x["tc"] == 1) & (x["us"] > acc["l1"]), x["us"])
            .otherwise(acc["l1"])
            .alias("l1"),
            F.when(
                (x["tc"] == 2)
                & (acc["l1"] >= 0)
                & (x["us"] - acc["l1"] <= t_us)
                & (acc["l1"] > acc["l2"]),
                acc["l1"],
            )
            .otherwise(acc["l2"])
            .alias("l2"),
            F.when(
                (x["tc"] == 3)
                & (acc["l2"] >= 0)
                & (x["us"] - acc["l2"] <= t_us)
                & (acc["l2"] > acc["l3"]),
                acc["l2"],
            )
            .otherwise(acc["l3"])
            .alias("l3"),
        )

    levels = per_user.select(
        F.aggregate("evs", zero, step).alias("acc")
    ).select(
        (F.col("acc.l1") >= 0).cast("int").alias("r1"),
        (F.col("acc.l2") >= 0).cast("int").alias("r2"),
        (F.col("acc.l3") >= 0).cast("int").alias("r3"),
    )
    totals = levels.agg(
        F.sum("r1").cast("bigint").alias("u1"),
        F.sum("r2").cast("bigint").alias("u2"),
        F.sum("r3").cast("bigint").alias("u3"),
    )
    # one explode of a 3-struct array — NOT a 3-branch union, which
    # would re-derive the totals aggregate once per branch (the
    # re-derived-branch lesson; plan-visible as 6 static exchanges)
    def stage(n: int, name: str, col: str):
        return F.struct(
            F.lit(n).cast("bigint").alias("step"),
            F.lit(name).alias("stage"),
            F.coalesce(F.col(col), F.lit(0)).cast("bigint").alias("users"),
        )

    return (
        totals.select(
            F.explode(
                F.array(
                    stage(1, "view", "u1"),
                    stage(2, "view>click", "u2"),
                    stage(3, "view>click>purchase", "u3"),
                )
            ).alias("s")
        )
        .select("s.step", "s.stage", "s.users")
        .orderBy("step")
    )


def multitouch_attribution(
    events: DataFrame, window_s: int = 7 * 86400
) -> DataFrame:
    """LINEAR multi-touch ad attribution via a HOT-USER-SAFE fold —
    the row-local-plan twin of `attribution_linear` (registry.py),
    which computes the same credit family through a purchases⋈clicks
    equi-join on user_id.  That join is the right plan at normal
    skew, but a bot user with T touches and C conversions
    materializes T·C join rows; here the same user costs one
    collected array and an O(T·C) ROW-LOCAL fold with no shuffle
    amplification — the funnel_within_window argument applied to
    attribution.  Semantics also differ deliberately: a 7-DAY
    journey window (vs the join twin's 30-minute burst window),
    strict (ts, event_id) precedence (the join twin's `c_ts < p_ts`
    drops same-timestamp ties), and count-based credit in exact
    BASIS POINTS (10 000 per conversion) rather than value-weighted
    micro-cents — the "participation credit" readout to the join
    twin's "revenue credit".

    EXACT-INTEGER credit split (the repo's float rule): each of the k
    touches gets 10000 div k bps and the LAST touch (max (ts,eid))
    additionally absorbs the remainder 10000 mod k, so every
    conversion's credit sums to exactly 10000 and the per-ad totals
    are bigint sums — no float shares to drift across engines.

    Scale shape (the funnel_within_window discipline): ONE shuffle
    (groupBy user) collects each user's typed event array; per
    conversion the touch list and its credit splits are row-local
    array expressions (filter + transform + flatten), so the
    |clicks|×|purchases| pair blow-up of the naive range join never
    materializes as a shuffle — per-user arrays bound memory exactly
    like the sessionize rollup.  The oracle IS that naive range join
    (conv ⋈ touch + window ranks), same answer from the opposite
    plan."""
    from ..functions import json_long
    from ..sources.loaders import epoch_us

    w_us = F.lit(int(window_s) * 1_000_000)
    typed = events.where(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id",
        F.struct(
            epoch_us(F.col("ts")).alias("us"),
            F.col("event_id").alias("eid"),
            (F.col("event_type") == "purchase").alias("is_conv"),
            (json_long("props", "$.k") % 10).alias("ad_id"),
        ).alias("ev"),
    )
    per_user = typed.groupBy("user_id").agg(
        F.sort_array(F.collect_list("ev")).alias("evs")
    )
    # one row per conversion, still carrying the user's event array
    per_conv = per_user.select(
        "evs",
        F.explode(
            F.filter(F.col("evs"), lambda x: x["is_conv"])
        ).alias("c"),
    )
    # `touches` and `k` MUST be materialized as real columns before
    # the credit transform consumes them: with k = size(filter(...))
    # embedded in the per-element lambda, every element re-evaluates
    # the whole filter over the user's array — O(T²) per conversion,
    # the round-7 inline-recompute class (a 200k-click bot user ran
    # >10 min; materialized it's O(T) and finishes in seconds).
    # CollapseProject keeps multi-consumer non-trivial aliases real.
    c = F.col("c")
    touched = per_conv.select(
        F.filter(
            F.col("evs"),
            lambda t: (~t["is_conv"])
            & (
                (t["us"] < c["us"])
                | ((t["us"] == c["us"]) & (t["eid"] < c["eid"]))
            )
            & (c["us"] - t["us"] <= w_us),
        ).alias("touches")
    ).select("touches", F.size("touches").cast("bigint").alias("k"))
    k = F.col("k")
    base = F.floor(F.lit(10000) / k).cast("bigint")
    rem = (F.lit(10000) - base * k).cast("bigint")
    credit = touched.where(k > 0).select(
        base.alias("base"),
        rem.alias("rem"),
        "k",
        F.explode(
            F.transform(
                "touches",
                lambda t, i: F.struct(
                    t["ad_id"].alias("ad_id"), i.alias("idx")
                ),
            )
        ).alias("cr"),
    )
    return (
        credit.groupBy(F.col("cr.ad_id").alias("ad_id"))
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(
                F.col("base")
                + F.when(F.col("cr.idx") == k - 1, F.col("rem")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("credit_bps"),
        )
        .orderBy("ad_id")
    )


def winsorized_user_spend(actions: DataFrame, event_type: str = "purchase") -> DataFrame:
    """Robust per-user spend summary: raw mean vs 5/95-winsorized
    mean vs 5/95-trimmed mean — the outlier-resistant readouts an
    LTV / experimentation pass wants next to `rfm_segments` (one
    whale user should not move the central-tendency estimate the
    way it moves a raw mean; CUPED-adjusted metrics are usually
    winsorized first for exactly this reason).

    Exactness contract: spend is integer cents; the p05/p95
    thresholds are exact inverse-CDF values — smallest spend whose
    global rank r satisfies r·20 ≥ n (resp. ≥ 19n), pure integer
    comparisons (no 0.05·n double whose ULP could flip a ceil) — and
    clamping/trimming happens in integer space, so every aggregate
    is an order-free BIGINT sum with ONE double division at the end.

    Scale shape: one groupBy(user) rollup; thresholds via the
    TWO-PASS range-bucket rank (functions/ranking.py — no
    unpartitioned window over the near-unique spend domain, the
    rfm_segments lesson); one broadcast 1-row threshold frame; one
    map-side-combined clamp-and-sum.  No window over |users| rows
    anywhere."""
    from ..functions import qround
    from ..functions.ranking import with_global_rank

    from ..functions.ckpt import ckpt

    # |users|-sized rollup with THREE consumers (total count, the
    # rank pass, the clamp pass): truncate once so the corpus filter
    # + groupBy runs once instead of per branch
    per_user = ckpt(
        actions.where(F.col("event_type") == event_type)
        .select(
            "user_id",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        )
        .groupBy("user_id")
        .agg(F.sum("cents").cast("bigint").alias("spend_cents"))
    )
    tot = per_user.agg(F.count(F.lit(1)).cast("bigint").alias("_t"))
    ranked = with_global_rank(
        per_user.select(F.col("spend_cents").alias("v")), "v", "v", rank_col="_r"
    )
    thresholds = ranked.crossJoin(F.broadcast(tot)).agg(
        F.min(F.when(F.col("_r") * 20 >= F.col("_t"), F.col("v"))).alias("_lo"),
        F.min(F.when(F.col("_r") * 20 >= F.lit(19) * F.col("_t"), F.col("v"))).alias(
            "_hi"
        ),
    )
    clamped = per_user.crossJoin(F.broadcast(thresholds)).select(
        "spend_cents",
        "_lo",
        "_hi",
        F.greatest(F.col("_lo"), F.least(F.col("_hi"), F.col("spend_cents"))).alias(
            "_w"
        ),
        F.col("spend_cents").between(F.col("_lo"), F.col("_hi")).alias("_in"),
    )
    return clamped.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (F.min("_lo") / F.lit(100.0)).alias("p05_spend"),
        (F.min("_hi") / F.lit(100.0)).alias("p95_spend"),
        qround(
            F.sum("spend_cents").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(100.0),
            4,
        ).alias("mean_spend"),
        qround(
            F.sum("_w").cast("double") / F.count(F.lit(1)).cast("double") / F.lit(100.0),
            4,
        ).alias("winsorized_mean_spend"),
        qround(
            F.sum(F.when(F.col("_in"), F.col("spend_cents")).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.sum(F.col("_in").cast("bigint")).cast("double")
            / F.lit(100.0),
            4,
        ).alias("trimmed_mean_spend"),
    )


def user_behavior_profile(actions: DataFrame) -> DataFrame:
    """Per-user behavior profile — the bot/abuse screen a training
    pipeline runs before trusting clickstream-derived labels:
    (user_id, n_events, n_sessions, n_pages, nav_entropy,
    max_events_min).

    * nav_entropy: Shannon entropy (bits) of the user's page-visit
      distribution — scripted traffic hammers few pages (low H) or
      sprays uniformly (H ≈ log2 pages); both tails are screenable.
      Float discipline: H = log2(n) − (Σ nₚ·log2 nₚ)/n where the Σ is
      a LEFT fold over the page-sorted struct array (aggregate over
      array_sort(collect_list(...)) — the rolling_fingerprint
      order-pinning pattern), so cross-partition float summation
      order can never flip the hash.
    * max_events_min: peak events in any single calendar minute —
      the burst-rate signal.

    Scale: three map-side-combined groupBys keyed by user (+page /
    +minute) joined on user — per-user state is ≤|pages| structs and
    one minute-max; no windows, no skew exposure beyond a hot USER,
    which is exactly what the query measures."""
    from ..functions import qround

    paged = actions.where(F.col("page_id").isNotNull())
    per_up = paged.groupBy("user_id", "page_id").agg(F.count(F.lit(1)).alias("np"))
    ent = (
        per_up.groupBy("user_id")
        .agg(
            F.sum("np").cast("bigint").alias("n_paged"),
            F.array_sort(F.collect_list(F.struct("page_id", "np"))).alias("pl"),
        )
        .select(
            "user_id",
            F.size("pl").cast("bigint").alias("n_pages"),
            (
                F.log2(F.col("n_paged").cast("double"))
                - F.aggregate(
                    "pl",
                    F.lit(0.0),
                    lambda acc, s: acc
                    + s["np"].cast("double") * F.log2(s["np"].cast("double")),
                )
                / F.col("n_paged").cast("double")
            ).alias("_h"),
        )
        .select("user_id", "n_pages", qround(F.col("_h"), 6).alias("nav_entropy"))
    )
    totals = actions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("session_id").cast("bigint").alias("n_sessions"),
    )
    bursts = (
        actions.groupBy(
            "user_id", F.date_format("ts", "yyyy-MM-dd HH:mm").alias("_minute")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").cast("bigint").alias("max_events_min"))
    )
    return (
        totals.join(ent, "user_id", "left")
        .join(bursts, "user_id")
        .select(
            "user_id",
            "n_events",
            "n_sessions",
            F.coalesce(F.col("n_pages"), F.lit(0)).cast("bigint").alias("n_pages"),
            F.coalesce(F.col("nav_entropy"), F.lit(0.0)).alias("nav_entropy"),
            "max_events_min",
        )
        .orderBy("user_id")
    )


def rolling_7d_distinct_users(actions: DataFrame) -> DataFrame:
    """Exact trailing-7-day DISTINCT active users per day — the DAU/
    WAU-family metric that approx sketches usually take over, done
    EXACTLY with a bounded-fan-out plan (the repo keeps a sketch twin
    in monthly_users_hll_rollup; this is the exact-windowed shape).

    COUNT(DISTINCT) does not decompose over a sliding window (a user
    active on 3 of the 7 days must count once), so a window-function
    sum is wrong and re-scanning per offset is 7 scans.  Instead:
    dedup to (day, user) pairs — the only corpus-sized shuffle — then
    each pair contributes to the ≤7 window-end days it can serve
    (sequence explode, fan-out bounded by the window length, NOT the
    corpus), dedup (window_day, user), count.  Window days with no
    activity of their own are not reported (they exist only as
    donors); the report is 'for each active day, distinct users over
    [day-6, day]'."""
    from ..functions.ckpt import ckpt

    # the (day,user) pair frame feeds two consumers (active-day list
    # + the donor fan-out): truncate so the corpus dedup shuffle runs
    # once, not per branch
    pairs = ckpt(
        actions.select(F.to_date("day").alias("d"), "user_id")
        .where(F.col("user_id").isNotNull())
        .dropDuplicates(["d", "user_id"])
    )
    days = pairs.select(F.col("d").alias("win_day")).distinct()
    donated = pairs.select(
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias(
            "win_day"
        ),
        "user_id",
    ).dropDuplicates(["win_day", "user_id"])
    return (
        donated.join(days, "win_day")
        .groupBy("win_day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("distinct_users_7d"))
        .select(
            F.date_format("win_day", "yyyy-MM-dd").alias("day"),
            "distinct_users_7d",
        )
        .orderBy("day")
    )


def user_spend_gini(actions: DataFrame) -> DataFrame:
    """GINI COEFFICIENT of per-user purchase spend — the inequality/
    concentration metric ("do 1% of users carry 50% of revenue?")
    every monetization dashboard keeps next to the LTV deciles.

    Formula over spends s_1 <= ... <= s_n (rank-ascending):
        G = (2·Σ i·s_i − (n+1)·Σ s) / (n·Σ s)

    Arithmetic discipline: spend quantizes to integer cents at the
    row; the ranking is the two-pass range-bucket row_number
    (functions/ranking.py::with_global_rank — never a SinglePartition
    sort over |users|), so Σ i·s_i and Σ s are exact BIGINTs and the
    Gini is ONE final double division, 6-dp quantized.  At 100 TB
    population sizes, Σ i·s_i approaches int64 range (rank ~ 1e9 ×
    cents ~ 1e6 per row) — promote the product to DECIMAL(38,0)
    there; at these SFs int64 has ~5 orders of headroom.

    Scale shape: one map-side-combined per-user aggregate, then the
    ranking machinery's two bounded shuffles over the |users|-sized
    frame; the final reduce is a 1-row aggregate."""
    from ..functions import qround
    from ..functions.ranking import with_global_rank

    spend = (
        actions.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
            .alias("cents")
        )
    )
    ranked = with_global_rank(spend, "cents", "user_id", rank_col="rk")
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("rk") * F.col("cents")).cast("bigint").alias("rank_weighted"),
    )
    gini = (
        F.lit(2.0) * F.col("rank_weighted").cast("double")
        - (F.col("n_users") + 1).cast("double") * F.col("total_cents").cast("double")
    ) / (F.col("n_users").cast("double") * F.col("total_cents").cast("double"))
    return agg.select(
        "n_users",
        "total_cents",
        qround(gini, 6).alias("gini"),
    )


def top_decile_spend_share(actions: DataFrame) -> DataFrame:
    """Share of total purchase revenue held by the TOP 10% of
    spenders — the Pareto companion to `user_spend_gini` (a Gini says
    "how unequal"; this says "who to retain").  The decile is
    ceil(n/10) users by (spend desc, user_id asc), membership decided
    on the same two-pass global rank as the Gini (ascending rank r is
    top-decile iff r > n - ceil(n/10)), so no SinglePartition sort
    over the user population.  Numerators exact BIGINT cents; the
    share is one final 6-dp-quantized division."""
    from ..functions import qround
    from ..functions.ranking import with_global_rank

    spend = (
        actions.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
            .alias("cents")
        )
    )
    ranked = with_global_rank(spend, "cents", "user_id", rank_col="rk")
    n = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    j = ranked.crossJoin(F.broadcast(n))
    top_size = F.ceil(F.col("n_users").cast("double") / 10).cast("bigint")
    agg = j.agg(
        F.max("n_users").alias("n_users"),
        F.max(top_size).alias("top_decile_users"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(
            F.when(F.col("rk") > F.col("n_users") - top_size, F.col("cents")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("top_decile_cents"),
    )
    return agg.select(
        "n_users",
        "top_decile_users",
        "total_cents",
        "top_decile_cents",
        qround(
            F.col("top_decile_cents").cast("double")
            / F.col("total_cents").cast("double"),
            6,
        ).alias("top_decile_share"),
    )


def user_entropy_profile(actions: DataFrame) -> DataFrame:
    """Behavioral-diversity profile: Shannon entropy (nats) of each
    user's event-type mix, histogrammed at 2 dp — the engagement
    analyst's single-number answer to "do users do one thing or
    everything?" (entropy 0 = single-type users; ln(|types|) = a
    perfectly mixed diet).  A shifted histogram between releases
    flags instrumentation drops or bot cohorts the volume KPIs miss.

    Arithmetic discipline: per-(user,type) counts stay exact BIGINTs;
    entropy uses the exact decomposition ln(N) - Σ n·ln(n) / N with
    the Σ as an ORDER-PINNED fold over the type-sorted list (the
    daily_drift_jsd / user_behavior_profile discipline for
    libm-carrying gated outputs), quantized to 2 dp BEFORE the
    histogram groupBy so the bucket boundary is the same expression
    on both engines.

    Scale shape: one map-side-combined groupBy(user, type) over the
    corpus, a per-user fold over ≤|types| elements, then a
    bucket-sized histogram groupBy.  Nothing wider than the corpus
    scan; no window at all."""
    from ..functions import qround

    per_ut = (
        actions.where(F.col("user_id").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct("event_type", "n"))),
        F.lit(0.0),
        lambda acc, s: acc + s["n"].cast("double") * F.log(s["n"].cast("double")),
    )
    per_u = per_ut.groupBy("user_id").agg(
        folded.alias("s"), F.sum("n").cast("bigint").alias("tot")
    )
    e = per_u.select(
        qround(
            F.log(F.col("tot").cast("double"))
            - F.col("s") / F.col("tot").cast("double"),
            2,
        ).alias("entropy_bucket")
    )
    return (
        e.groupBy("entropy_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("entropy_bucket")
    )


def _session_path(actions: DataFrame) -> DataFrame:
    """(session_id, path): the session's event-type INITIALS in exact
    event order (ts, event_id) as one compact string — 'vvcp' reads
    "view view click purchase".  Order is pinned via array_sort over
    (ts, event_id, ch) structs (collect_list alone is
    partition-order-nondeterministic)."""
    return actions.groupBy("session_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.substring("event_type", 1, 1).alias("ch"),
                        )
                    )
                ),
                lambda s: s["ch"],
            ),
        ).alias("path")
    )


# browse→click→purchase; signup-opening; error burst; repeat purchase
FUNNEL_PATH_PATTERNS: tuple[str, ...] = ("v.*c.*p", "^s", "e{2,}", "p.*p")


def funnel_regex_path(
    actions: DataFrame, patterns: tuple[str, ...] = FUNNEL_PATH_PATTERNS
) -> DataFrame:
    """Regex funnels over whole-session paths: how many sessions
    match each BEHAVIORAL PATTERN, expressed as a regex over the
    session's ordered event-initial string.  The window/sequence
    funnels (funnel_sequential, funnel_within_window) answer fixed
    step chains; the regex form answers the ad-hoc shapes analysts
    actually ask ("any error twice in a row?", "purchase twice?")
    without a new operator per question.

    Scale shape: one groupBy(session) path build (sessions-sized
    strings, bounded by session length), then |patterns| row-local
    regex evaluations folded into ONE conditional-sum aggregate and
    unpivoted — the pattern list never joins against the corpus."""
    paths = _session_path(actions)
    one = paths.agg(
        *[
            F.sum(F.col("path").rlike(p).cast("bigint")).alias(f"_p{i}")
            for i, p in enumerate(patterns)
        ]
    )
    return (
        one.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(p).alias("pattern"),
                            F.col(f"_p{i}").cast("bigint").alias("n_sessions"),
                        )
                        for i, p in enumerate(patterns)
                    ]
                )
            ).alias("r")
        )
        .select("r.pattern", "r.n_sessions")
        .orderBy("pattern")
    )


def frequent_path_trigrams(actions: DataFrame, top: int = 20) -> DataFrame:
    """Top-N consecutive event-type trigrams across all sessions —
    the length-3 sequential-pattern mine (PrefixSpan's useful core
    for clickstream triage) next to page_transition_probs' bigram
    Markov chain.  A trigram spike ('eee', 'ppp') is the shape
    incident review starts from.

    Scale shape: one per-session window (the sessionize shuffle key),
    two leads, map-side-combined trigram counts, then
    TakeOrderedAndProject for the top-N — no global sort."""
    w = Window.partitionBy("session_id").orderBy("ts", "event_id")
    ch = F.substring("event_type", 1, 1)
    tri = actions.select(
        F.concat(
            ch, F.lead(ch, 1).over(w), F.lead(ch, 2).over(w)
        ).alias("trigram")
    ).where(F.col("trigram").isNotNull() & (F.length("trigram") == 3))
    return (
        tri.groupBy("trigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("trigram"))
        .limit(top)
    )
