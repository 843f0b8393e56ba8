"""Experimentation (A/B test) analysis over the events stream.

The reference's analytics surface stops at descriptive aggregates;
any production behavior platform also READS OUT experiments —
deterministic unit assignment, per-variant conversion, and a
two-proportion z-test.  This module adds that readout as one
single-row report.

Design for 100 TB:
  * assignment is a pure row-local hash of user_id (no assignment
    table, no join) — the industry-standard "bucketing by hash"
    (Kohavi et al., "Controlled experiments on the web"), made
    cross-engine-deterministic via md5 hex (identical in Spark and
    DuckDB) instead of engine-private hash functions;
  * the whole report is groupBy(user_id) → one conditional-sum
    reduce: two shuffles, both map-side combined, the second to ONE
    row.  Nothing grows with event volume except the scan.
  * every statistic derives from four exact BIGINTs (n/conv per
    variant); float work happens once, driver-shaped identically in
    the oracle, and lands quantized (6 dp rates, 4 dp z) so ULPs
    cannot flip the hash or the significance verdict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions import qround


def _variant(user_id: Column) -> Column:
    """Deterministic 50/50 split: parity of the first md5 hex char of
    the decimal user id.  md5 is bit-identical across engines (unlike
    xxhash64/crc32-of-int whose integer byte layouts differ), so the
    oracle reproduces the assignment exactly."""
    return F.when(
        F.ascii(F.substring(F.md5(user_id.cast("string")), 1, 1)) % 2 == 0, "A"
    ).otherwise("B")


def ab_test_report(
    events: DataFrame, goal: str = "purchase", window_s: int = 86400
) -> DataFrame:
    """One-row A/B readout: exposure and conversion counts per
    variant, conversion rates, absolute lift, pooled two-proportion
    z-score, and a significance verdict at alpha=0.05.

    Conversion is TIME-BOUND — first `goal` event within `window_s`
    of the user's first activity — the standard activation-metric
    shape (a lifetime any-conversion flag saturates to 100% as
    history accumulates, which both kills the z-test and is exactly
    the mistake real experiment readouts avoid).  Both boundary
    timestamps come out of ONE groupBy as exact epoch-micros BIGINTs.

    z = (p_a - p_b) / sqrt(p(1-p)(1/n_a + 1/n_b)), p pooled.  sqrt
    and IEEE double division are correctly rounded in both engines,
    and every operand is an exact integer cast to double with the
    same association order as the oracle SQL, so the unquantized z is
    bit-identical cross-engine before the 4-dp quantize.
    `significant` compares the QUANTIZED z against 1.96 — both
    engines parse the literal to the same double, so the boolean can
    never disagree with the reported z."""
    from ..sources.loaders import epoch_us

    per_user = events.groupBy("user_id").agg(
        F.min(epoch_us(F.col("ts"))).alias("first_us"),
        F.min(F.when(F.col("event_type") == goal, epoch_us(F.col("ts")))).alias(
            "goal_us"
        ),
    )
    per_user = per_user.select(
        "user_id",
        F.when(
            F.col("goal_us") - F.col("first_us") <= window_s * 1_000_000, 1
        )
        .otherwise(0)
        .alias("converted"),
    )
    assigned = per_user.select(
        _variant(F.col("user_id")).alias("variant"), "converted"
    )
    counts = assigned.agg(
        F.sum((F.col("variant") == "A").cast("bigint")).alias("n_a"),
        F.sum(
            F.when(F.col("variant") == "A", F.col("converted"))
            .otherwise(0)
            .cast("bigint")
        ).alias("conv_a"),
        F.sum((F.col("variant") == "B").cast("bigint")).alias("n_b"),
        F.sum(
            F.when(F.col("variant") == "B", F.col("converted"))
            .otherwise(0)
            .cast("bigint")
        ).alias("conv_b"),
    )
    # an empty arm (possible on tiny filtered corpora; ANSI mode
    # raises on conv/0) leaves its rate NULL and the test undefined →
    # z := 0, not significant
    both_arms = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    rate_a = F.when(
        F.col("n_a") > 0, F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    )
    rate_b = F.when(
        F.col("n_b") > 0, F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    )
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.when(
        both_arms,
        F.sqrt(
            pooled
            * (F.lit(1.0) - pooled)
            * (
                F.lit(1.0) / F.col("n_a").cast("double")
                + F.lit(1.0) / F.col("n_b").cast("double")
            )
        ),
    )
    # se = 0 iff the pooled rate is exactly 0 or 1, in which case both
    # variant rates equal it and the effect is exactly 0 — define
    # z := 0 rather than 0/0 (ANSI mode raises on the division)
    z = qround(F.when(se > 0.0, (rate_a - rate_b) / se).otherwise(F.lit(0.0)), 4)
    return counts.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        qround(rate_a, 6).alias("rate_a"),
        qround(rate_b, 6).alias("rate_b"),
        qround(rate_a - rate_b, 6).alias("lift"),
        z.alias("z_score"),
        (F.abs(z) > F.lit(1.96)).alias("significant"),
    )


def ab_test_cuped(
    events: DataFrame,
    goal: str = "purchase",
    split_date: str = "2024-01-15",
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013,
    "Improving the sensitivity of online controlled experiments by
    utilizing pre-experiment data"): each user's experiment-period
    goal count Y is adjusted by their PRE-period count X —
    Y' = Y − θ·(X − mean X), θ = cov(X,Y)/var(X) — which removes the
    between-user variance X explains and shrinks the metric's
    variance by exactly ρ²·var(Y).

    Float discipline, stricter than ab_test_report's: per-user Y'
    values are NEVER summed distributively (a float Σ over partitions
    is order-dependent → hash-unstable).  Instead ONE conditional-sum
    reduce produces exact BIGINT moments (n, Σx, Σy, Σxy, Σx², Σy²,
    per-variant n/Σx/Σy) and every reported statistic is derived
    algebraically from them on the single-row frame:
      var(Y')      = var(Y) − θ²·var(X)
      mean(Y')_v   = mean(Y)_v − θ·(mean(X)_v − mean X)
    θ is 0 when var(X) = 0, decided by the INTEGER test
    n·Σx² − (Σx)² > 0.  Scale: one groupBy(user_id) + one 1-row
    reduce — identical shape to ab_test_report."""
    from ..sources.loaders import ntz_lit

    d = events.select(
        "user_id",
        "event_type",
        (F.col("ts") < ntz_lit(split_date)).alias("pre"),
    )
    per_user = d.groupBy("user_id").agg(
        F.sum(
            ((F.col("event_type") == goal) & F.col("pre")).cast("bigint")
        ).alias("x"),
        F.sum(
            ((F.col("event_type") == goal) & ~F.col("pre")).cast("bigint")
        ).alias("y"),
    )
    assigned = per_user.select(
        _variant(F.col("user_id")).alias("variant"), "x", "y"
    )
    m = assigned.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum((F.col("variant") == "A").cast("bigint")).alias("n_a"),
        F.sum(F.when(F.col("variant") == "A", F.col("x")).otherwise(0)).alias("sx_a"),
        F.sum(F.when(F.col("variant") == "A", F.col("y")).otherwise(0)).alias("sy_a"),
        F.sum((F.col("variant") == "B").cast("bigint")).alias("n_b"),
        F.sum(F.when(F.col("variant") == "B", F.col("x")).otherwise(0)).alias("sx_b"),
        F.sum(F.when(F.col("variant") == "B", F.col("y")).otherwise(0)).alias("sy_b"),
    )
    nd = F.col("n").cast("double")
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    ) / (nd * nd)
    var_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    ) / (nd * nd)
    cov_xy = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (nd * nd)
    # θ = 0 on zero pre-period variance, decided in integer space
    theta = F.when(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0,
        cov_xy / var_x,
    ).otherwise(F.lit(0.0))
    var_cuped = var_y - theta * theta * var_x
    both = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    mx_a = F.col("sx_a").cast("double") / F.col("n_a").cast("double")
    my_a = F.col("sy_a").cast("double") / F.col("n_a").cast("double")
    mx_b = F.col("sx_b").cast("double") / F.col("n_b").cast("double")
    my_b = F.col("sy_b").cast("double") / F.col("n_b").cast("double")
    diff_raw = F.when(both, my_a - my_b)
    diff_cuped = F.when(both, (my_a - my_b) - theta * (mx_a - mx_b))
    var_reduction_pct = F.when(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0),
        theta * theta * var_x / var_y * 100.0,
    ).otherwise(F.lit(0.0))
    return m.select(
        "n_a",
        "n_b",
        qround(theta, 6).alias("theta"),
        qround(diff_raw, 6).alias("diff_raw"),
        qround(diff_cuped, 6).alias("diff_cuped"),
        qround(var_y, 6).alias("var_y"),
        qround(var_cuped, 6).alias("var_cuped"),
        qround(var_reduction_pct, 4).alias("var_reduction_pct"),
    )


def ab_test_mannwhitney(events: DataFrame, goal: str = "purchase") -> DataFrame:
    """Exact Mann-Whitney U test between the variants on per-user
    goal counts — the NONPARAMETRIC readout for skewed metrics where
    the t/z-on-means tests mislead (a whale in one arm).

    Distributed without ranking: a global rank assignment is a global
    sort, but U depends only on the per-variant COUNT HISTOGRAMS of
    the metric —
        2U = Σ_{a,b} 2·cA(a)·cB(b)·[a > b] + cA(v)·cB(v)·[a = b]
    — so one groupBy(variant, y) reduce plus a broadcast histogram ×
    histogram join (|distinct y|², tiny) computes U EXACTLY in
    integers (2U stays integral through ties).  The tie-corrected
    normal approximation
        var U = nA·nB·(n³−n − Σ(t³−t)) / (12·n·(n−1))
    is evaluated in DOUBLES: the BIGINT product nA·nB·(n³−n−…)
    overflows int64 once n exceeds ~8-9k users (n⁵/4 > 2⁶³ ⇒ ANSI
    ARITHMETIC_OVERFLOW), so each exact integer moment (nA·nB, n,
    tie_term, 2U) is cast to double FIRST and the variance tree is
    one fixed float expression over them, mirrored node-for-node in
    the oracle (z is a float statistic anyway; at gate scale every
    intermediate is < 2⁵³ so the doubles are still exact).  The
    histogram trick is the same order-statistics discipline as
    doc_length_quantiles (count-CDF instead of sort)."""
    per_user = events.groupBy("user_id").agg(
        F.sum((F.col("event_type") == goal).cast("bigint")).alias("y")
    )
    assigned = per_user.select(
        _variant(F.col("user_id")).alias("variant"), "y"
    )
    hist = assigned.groupBy("variant", "y").agg(
        F.count(F.lit(1)).alias("c")
    )
    ha = hist.where(F.col("variant") == "A").select(
        F.col("y").alias("ya"), F.col("c").alias("ca")
    )
    hb = hist.where(F.col("variant") == "B").select(
        F.col("y").alias("yb"), F.col("c").alias("cb")
    )
    u2 = (
        ha.crossJoin(F.broadcast(hb))
        .select(
            F.when(
                F.col("ya") > F.col("yb"),
                2 * F.col("ca") * F.col("cb"),
            )
            .when(F.col("ya") == F.col("yb"), F.col("ca") * F.col("cb"))
            .otherwise(F.lit(0))
            .alias("u2_part")
        )
        .agg(F.coalesce(F.sum("u2_part"), F.lit(0)).cast("bigint").alias("u2"))
    )
    # t³ itself blows int64 once a single tie group (e.g. y=0 users)
    # exceeds ~2.1M rows.  Cubing in DOUBLE fixes the overflow but a
    # double SUM of t³ terms is order-dependent once the running sum
    # passes 2⁵³ (two ~1M-row tie groups suffice) — and Spark's
    # partial-aggregation order differs from DuckDB's, so the hash
    # gate could flip at a quantization boundary.  DECIMAL keeps the
    # whole sum exact AND associative: t ≤ 10¹² as DECIMAL(12,0),
    # t³ ≤ 10³⁶ fits DECIMAL(38,0), the sum is exact integer decimal
    # arithmetic in any order, and the single decimal→double rounding
    # at the end is deterministic.  Mirrored in the oracle.
    t_dec = F.col("t").cast("decimal(12,0)")
    ties = (
        hist.groupBy("y")
        .agg(F.sum("c").alias("t"))
        .agg(
            F.coalesce(
                F.sum(t_dec * t_dec * t_dec - t_dec).cast("double"),
                F.lit(0.0),
            ).alias("tie_term")
        )
    )
    counts = assigned.agg(
        F.sum((F.col("variant") == "A").cast("bigint")).alias("n_a"),
        F.sum((F.col("variant") == "B").cast("bigint")).alias("n_b"),
    )
    j = counts.crossJoin(F.broadcast(u2)).crossJoin(F.broadcast(ties))
    n = F.col("n_a") + F.col("n_b")
    # Overflow guard (ADVICE r07): nA·nB·(n³−n−tie) as BIGINT blows
    # int64 at ~8-9k users; promote each exact moment to double first.
    nab_d = F.col("n_a").cast("double") * F.col("n_b").cast("double")
    nd = n.cast("double")
    var_num = nab_d * (nd * nd * nd - nd - F.col("tie_term").cast("double"))
    var_den = F.lit(12.0) * nd * (nd - F.lit(1.0))
    z = F.when(
        var_num > 0,
        (F.col("u2").cast("double") - nab_d)
        / (F.lit(2.0) * F.sqrt(var_num / var_den)),
    ).otherwise(F.lit(0.0))
    zq = qround(z, 4)
    return j.select(
        "n_a",
        "n_b",
        (F.col("u2").cast("double") / F.lit(2.0)).alias("u_stat"),
        zq.alias("z_score"),
        (F.abs(zq) > F.lit(1.96)).alias("significant"),
    )


def ab_test_quantile_effects(
    events: DataFrame,
    goal: str = "purchase",
    percents: tuple[int, ...] = (25, 50, 75, 90),
) -> DataFrame:
    """Quantile treatment effects: per-variant EXACT quantiles of the
    per-user goal count at the given percentiles, plus their A−B
    differences — where a mean shift hides (heavy tail moved, median
    flat?  p90 effect without a median effect?), the readout
    distributional experiment analysis starts from.

    Exactness for free: quantiles come from the count-by-value
    histogram CDF (engagement._quartile_thresholds' inverse-CDF rule —
    smallest y whose cum·100 ≥ p·n, decided in integers), so every
    output column is a BIGINT and the hash gate is trivial.  The only
    window runs over the HISTOGRAM (|distinct y| rows per variant),
    never over users — the count-CDF discipline again."""
    per_user = events.groupBy("user_id").agg(
        F.sum((F.col("event_type") == goal).cast("bigint")).alias("y")
    )
    assigned = per_user.select(
        _variant(F.col("user_id")).alias("variant"), "y"
    )
    hist = assigned.groupBy("variant", "y").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = (
        Window.partitionBy("variant")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w))
    tot = hist.groupBy("variant").agg(F.sum("c").alias("total"))
    j = cum.join(tot, "variant")
    sel = [
        F.max(F.when(F.col("variant") == "A", F.col("total")))
        .cast("bigint")
        .alias("n_a"),
        F.max(F.when(F.col("variant") == "B", F.col("total")))
        .cast("bigint")
        .alias("n_b"),
    ]
    for p in percents:
        for v in ("A", "B"):
            sel.append(
                F.min(
                    F.when(
                        (F.col("variant") == v)
                        & (F.col("cum") * 100 >= F.lit(p) * F.col("total")),
                        F.col("y"),
                    )
                ).alias(f"p{p}_{v.lower()}")
            )
    out = j.agg(*sel)
    diffs = [
        (F.col(f"p{p}_a") - F.col(f"p{p}_b")).alias(f"d{p}") for p in percents
    ]
    return out.select(
        "n_a",
        "n_b",
        *[c for p in percents for c in (F.col(f"p{p}_a"), F.col(f"p{p}_b"))],
        *diffs,
    )


def offpolicy_ips_estimate(actions: DataFrame) -> DataFrame:
    """Off-policy evaluation of a DETERMINISTIC target ad policy from
    uniformly-logged click data — inverse propensity scoring (IPS)
    and its self-normalized variant (SNIPS), the counterfactual
    "what would the new policy have earned" estimate an ads/recsys
    team computes before an online test (Horvitz-Thompson estimator;
    Swaminathan & Joachims 2015 for SNIPS).

    Logged bandit feedback: each click row is (context=user, action=
    ad_id drawn uniformly from the 10 ads by the fixture's %10
    derivation → propensity exactly 1/10, reward=value).  Target
    policy π(user) = user_id % 10 (deterministic, so the importance
    weight is 10·1{logged action == π(user)}).

      IPS   = Σ r·w / n          (unbiased, higher variance)
      SNIPS = Σ r·w / Σ w        (biased, variance-controlled)

    Arithmetic discipline: rewards quantize to integer cents at the
    row (the repo's money rule), so both numerators and Σ w are exact
    BIGINTs; each estimate is ONE final double division, 6-dp
    quantized.  Scale shape: a single map-side-combined global
    aggregate over the click log — no shuffle beyond the 1-row
    reduce."""
    from ..functions import json_long, qround

    logged = actions.where(F.col("event_type") == "click").select(
        "user_id",
        (json_long("props", "$.k") % 10).alias("ad_id"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("r_cents"),
    )
    match = (F.col("ad_id") == F.col("user_id") % 10).cast("bigint")
    agg = logged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_logged"),
        F.sum(match).cast("bigint").alias("n_matched"),
        F.sum(match * F.col("r_cents")).cast("bigint").alias("matched_cents"),
    )
    ips = (
        F.col("matched_cents").cast("double")
        * F.lit(10.0)
        / F.col("n_logged").cast("double")
        / F.lit(100.0)
    )
    snips = F.when(
        F.col("n_matched") > 0,
        F.col("matched_cents").cast("double")
        / F.col("n_matched").cast("double")
        / F.lit(100.0),
    )
    return agg.select(
        "n_logged",
        "n_matched",
        "matched_cents",
        qround(ips, 6).alias("ips_estimate"),
        qround(snips, 6).alias("snips_estimate"),
    )


def ab_srm_check(events: DataFrame) -> DataFrame:
    """Sample-ratio-mismatch guardrail: chi-square goodness-of-fit of
    the observed variant split against the designed 50/50 — the FIRST
    check every experiment readout runs, because a biased assignment
    invalidates every downstream metric (a z-test on SRM'd buckets is
    noise).  For two cells at 50/50 the statistic reduces to the
    exact-integer form chi2 = (n_a − n_b)² / (n_a + n_b): BIGINT
    numerator, ONE double division, 4-dp quantize — the repo's
    cross-engine float contract.  `srm` compares the QUANTIZED chi2
    against the df=1 α=0.05 critical value 3.8415, so the flag can
    never disagree with the reported statistic.

    Scale shape: one distinct-user reduction, one 2-row variant
    count; output is a single row."""
    from ..functions import qround

    users = events.select("user_id").where(F.col("user_id").isNotNull()).distinct()
    counts = users.select(_variant(F.col("user_id")).alias("variant")).groupBy().agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    diff2 = (F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))
    chi2 = qround(
        diff2.cast("double") / (F.col("n_a") + F.col("n_b")).cast("double"), 4
    )
    return counts.select(
        "n_a",
        "n_b",
        chi2.alias("chi2"),
        (chi2 > F.lit(3.8415)).cast("int").alias("srm"),
    )
