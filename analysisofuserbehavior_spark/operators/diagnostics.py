"""Join/agg key-skew diagnostics — the pre-flight check every
shuffle-heavy pipeline at 100 TB should run before picking a join
strategy (broadcast / salt / AQE-skew-split).

The reference hard-codes its skew mitigations per-query (the sampled
split + prefix-salt in UserVisitSessionAnalyzeSpark.java's
aggregateBySession path); this operator is the measurement that
DECIDES those mitigations: for each candidate key it reports the
row/key counts, the heaviest key's share, and an exact p99 of
rows-per-key.

Scale shape per key: one map-side-combined `groupBy(key).count()`
(the only corpus-sized shuffle — the same one the real join would
do, minus the payload), then every statistic reduces the COUNTS
frame: max/sum are plain aggregates, and the exact p99 uses the
count-by-value histogram CDF (window bounded by |distinct per-key
counts|, not the corpus — same pattern as doc_length_quantiles).
No sampling, no approx sketch: the report itself is cheap because
rows-per-key counts live in a tiny integer domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import qround


def key_skew_profile(df: DataFrame, key_col: str, label: str) -> DataFrame:
    """One-row skew profile for `key_col` of `df` (null keys count as
    a key of their own — they hash to one reducer in a real shuffle,
    which is exactly the skew this report exists to surface)."""
    # the counts frame feeds the histogram AND the max/sum summary;
    # both branches hang off one identical groupBy exchange that AQE
    # ReusedExchange deduplicates at runtime (measured A/B at sf0.1:
    # ckpt costs ~0.7 s and saves nothing — reuse-works case, see
    # sweepline.py)
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    hist = counts.groupBy("c").agg(F.count(F.lit(1)).alias("nk"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("nk").over(w))
    tot = cum.agg(F.sum("nk").alias("total_keys"))
    p99 = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(F.col("cum") * 100 >= 99 * F.col("total_keys"), F.col("c"))
            ).alias("p99_rows_per_key")
        )
    )
    summary = counts.agg(
        # empty input: SUM is NULL but the row COUNT is genuinely 0 —
        # report 0 (max/p99/top1 stay NULL: no keys exist to rank)
        F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("c").cast("bigint").alias("max_rows_per_key"),
    )
    return (
        summary.crossJoin(F.broadcast(p99))
        .select(
            F.lit(label).alias("key"),
            "n_rows",
            "n_keys",
            "max_rows_per_key",
            F.col("p99_rows_per_key").cast("bigint").alias("p99_rows_per_key"),
            qround(
                F.col("max_rows_per_key").cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("top1_frac"),
        )
    )


def skew_key_diagnostics(frames: list[tuple[DataFrame, str, str]]) -> DataFrame:
    """Union of `key_skew_profile` rows for (df, key_col, label)
    candidates — each branch is independent, so Spark runs them as
    parallel stages under one job."""
    out = None
    for df, key_col, label in frames:
        p = key_skew_profile(df, key_col, label)
        out = p if out is None else out.unionByName(p)
    return out


def seasonal_anomaly_dow(
    events: DataFrame, k_sigma: int = 2, anchor_monday: str = "2024-01-01"
) -> DataFrame:
    """Day-of-week-SEASONAL anomaly detection over daily event-type
    volumes — `daily_anomaly_zscore`'s trailing window flags Monday
    traffic against the trailing week (which contains one of each
    weekday), so a perfectly normal weekly rhythm with quiet weekends
    z-scores every Saturday; this operator compares each (type, day)
    count against OTHER days of the same weekday (leave-one-out), the
    weekly-seasonality baseline real volume monitors use.

    Exactness: the anomaly VERDICT is decided entirely in BIGINT
    arithmetic — with n' = n-1 same-dow peers, s1'/s2' their exact
    count sums, the |z| > k test  ((c·n'-s1')² · (n'-1) > k² · n' ·
    (n'·s2'-s1'²))  is the z-formula cleared of both divisions and
    the sqrt, so the boolean can never disagree across engines.  The
    REPORTED z is the same quantity in doubles (qround 4) for humans;
    the flag does not derive from it.  Weekday comes from
    datediff-mod-7 against an anchor Monday — engine-neutral, no
    locale-dependent dayofweek().

    Overflow bound: the integer test peaks at (c·n')²·n' — safe in
    int64 up to ~10⁵ events/day/type at n'≈30; at true 100 TB volumes
    (10⁹/day) promote the four products to decimal(38,0) — same
    expressions, same semantics.

    Scale: one groupBy(type, day) map-side reduce, then the seasonal
    stats join on (type, dow) — 7·|types| rows, broadcast; no window
    over data-volume partitions at all."""
    daily = (
        events.select(
            "event_type",
            F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd").alias(
                "day"
            ),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "dow",
            F.pmod(
                F.datediff(F.to_date("day"), F.to_date(F.lit(anchor_monday))),
                F.lit(7),
            ).cast("int"),
        )
    )
    season = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("t1"),
        F.sum(F.col("c") * F.col("c")).alias("t2"),
    )
    j = daily.join(F.broadcast(season), ["event_type", "dow"])
    np_ = (F.col("n") - 1).alias("np")  # peers: leave the day itself out
    s1 = (F.col("t1") - F.col("c")).alias("s1")
    s2 = (F.col("t2") - F.col("c") * F.col("c")).alias("s2")
    j = j.select("event_type", "day", "dow", "c", np_, s1, s2).where(
        F.col("np") >= 2
    )
    # integer-exact |z| > k:  (c·n'-s1')²·(n'-1)  vs  k²·n'·(n'·s2'-s1'²)
    dev = F.col("c") * F.col("np") - F.col("s1")
    varn = F.col("np") * F.col("s2") - F.col("s1") * F.col("s1")
    flag = (dev * dev * (F.col("np") - 1)) > (
        F.lit(int(k_sigma * k_sigma)) * F.col("np") * varn
    )
    mean = F.col("s1").cast("double") / F.col("np").cast("double")
    z = F.when(
        varn > 0,
        dev.cast("double")
        / (
            F.col("np").cast("double")
            * F.sqrt(
                varn.cast("double")
                / (F.col("np").cast("double") * (F.col("np") - 1).cast("double"))
            )
        ),
    )
    return j.select(
        "event_type",
        "day",
        F.col("dow").cast("int").alias("dow"),
        F.col("c").cast("bigint").alias("n_events"),
        qround(mean, 6).alias("dow_mean"),
        qround(z, 4).alias("zscore"),
        flag.alias("is_anomaly"),
    ).orderBy("event_type", "day")


def holt_trend_daily(
    events: DataFrame, event_type: str = "click"
) -> DataFrame:
    """Holt linear-trend smoothing over the daily volume series with
    one-step-ahead forecasts — the FORECASTING readout the anomaly
    monitors (daily_anomaly_zscore, seasonal_anomaly_dow) lack: not
    "was yesterday odd" but "what does tomorrow look like", plus the
    per-day fitted level/trend a capacity planner charts.

    α = β = 1/2 (dyadic, the trending_items_decayed discipline):
        forecast_t = l_{t-1} + b_{t-1}
        l_t = ½·y_t + ½·forecast_t
        b_t = ½·(l_t − l_{t-1}) + ½·b_{t-1}
    initialized l_1 = y_1, b_1 = 0.  The recursion is a SEQUENTIAL
    left fold over the day-ordered series — deterministic float
    ORDER, so both engines produce bit-identical doubles (this is
    not a distributive sum; the repo's float rule targets
    order-FREEDOM, which a fold doesn't have).  The oracle replays
    the identical expression tree through a WITH RECURSIVE CTE
    (Spark 4.1 could too; the DataFrame fold keeps it declarative).

    Scale shape: ONE map-side-combined groupBy(day) is the only
    corpus-sized work; the fold runs on the collected calendar-
    bounded series (≤ a few thousand rows for years of days) in a
    single task — the rolling_7d/trending tiny-frame pattern.  The
    accumulator appends to an array (O(days²) copies on a frame this
    small; the per-element state is attribute-only, so the round-10
    inline-recompute trap does not apply)."""
    daily = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("ds")
    )
    row_t = (
        "array<struct<day:string,y:bigint,level:double,trend:double,"
        "forecast:double>>"
    )
    zero = F.struct(
        F.lit(None).cast(row_t).alias("rows"),
        F.lit(0.0).alias("l"),
        F.lit(0.0).alias("b"),
        F.lit(False).alias("started"),
    )

    def step(acc, d):
        fcst = acc["l"] + acc["b"]
        level = F.when(
            acc["started"], F.lit(0.5) * d["y"] + F.lit(0.5) * fcst
        ).otherwise(d["y"].cast("double"))
        trend = F.when(
            acc["started"],
            F.lit(0.5) * (level - acc["l"]) + F.lit(0.5) * acc["b"],
        ).otherwise(F.lit(0.0))
        row = F.struct(
            d["day"].alias("day"),
            d["y"].alias("y"),
            level.alias("level"),
            trend.alias("trend"),
            F.when(acc["started"], fcst).alias("forecast"),
        )
        return F.struct(
            F.concat(
                F.coalesce(acc["rows"], F.array().cast(row_t)), F.array(row)
            ).alias("rows"),
            level.alias("l"),
            trend.alias("b"),
            F.lit(True).alias("started"),
        )

    fitted = series.select(
        F.explode(F.aggregate("ds", zero, step)["rows"]).alias("r")
    )
    return fitted.select(
        F.col("r.day").alias("day"),
        F.col("r.y").alias("y"),
        qround(F.col("r.level"), 4).alias("level"),
        qround(F.col("r.trend"), 4).alias("trend"),
        qround(F.col("r.forecast"), 4).alias("forecast"),
    ).orderBy("day")


def cusum_drift_daily(
    events: DataFrame,
    event_type: str = "click",
    baseline_days: int = 7,
    slack: int = 2,
    threshold: int = 20,
) -> DataFrame:
    """Two-sided CUSUM control chart over daily volume — the
    SEQUENTIAL drift detector the pointwise monitors can't be:
    daily_anomaly_zscore / seasonal_anomaly_dow flag single outlier
    days, while CUSUM accumulates many small same-direction
    deviations, catching a persistent 10% drift long before any one
    day is individually anomalous (and a detector a 100 TB metrics
    pipeline runs on every KPI).

    EXACT INTEGER arithmetic end to end (the seasonal_anomaly_dow
    discipline): with B = Σy over the first `baseline_days` calendar
    days (the baseline) and W = baseline_days, every quantity is
    scaled by W so the baseline mean B/W never becomes a float:
        up_t   = max(0, up_{t-1}   + (W·y_t − B − W·slack))
        down_t = max(0, down_{t-1} − (W·y_t − B + W·slack))
    alarm when the side exceeds W·threshold.  `slack` (events/day
    dead-band) and `threshold` (accumulated events·days) are
    domain-tuned absolute knobs, as in ops practice.  States are
    BIGINT folds — no σ estimate, no sqrt, nothing to drift across
    engines.

    Scale shape: one map-side-combined daily reduce; the fold runs on
    the calendar-bounded series in one task (holt_trend_daily's
    pattern); the oracle replays it through WITH RECURSIVE."""
    daily = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("ds")
    )
    w = F.lit(int(baseline_days)).cast("bigint")
    row_t = (
        "array<struct<day:string,y:bigint,cusum_up:bigint,"
        "cusum_down:bigint,alarm_up:boolean,alarm_down:boolean>>"
    )
    zero = F.struct(
        F.lit(None).cast(row_t).alias("rows"),
        F.lit(0).cast("bigint").alias("up"),
        F.lit(0).cast("bigint").alias("down"),
        F.lit(0).cast("bigint").alias("b"),
        F.lit(0).cast("bigint").alias("t"),
    )
    lim = w * F.lit(int(threshold)).cast("bigint")
    wk = w * F.lit(int(slack)).cast("bigint")

    def step(acc, d):
        in_base = acc["t"] < F.lit(int(baseline_days)).cast("bigint")
        b2 = F.when(in_base, acc["b"] + d["y"]).otherwise(acc["b"])
        dev = w * d["y"] - acc["b"]
        up = F.when(in_base, F.lit(0).cast("bigint")).otherwise(
            F.greatest(
                F.lit(0).cast("bigint"), acc["up"] + (dev - wk)
            )
        )
        down = F.when(in_base, F.lit(0).cast("bigint")).otherwise(
            F.greatest(
                F.lit(0).cast("bigint"), acc["down"] - (dev + wk)
            )
        )
        row = F.struct(
            d["day"].alias("day"),
            d["y"].alias("y"),
            up.alias("cusum_up"),
            down.alias("cusum_down"),
            (up > lim).alias("alarm_up"),
            (down > lim).alias("alarm_down"),
        )
        return F.struct(
            F.concat(
                F.coalesce(acc["rows"], F.array().cast(row_t)), F.array(row)
            ).alias("rows"),
            up.alias("up"),
            down.alias("down"),
            b2.alias("b"),
            (acc["t"] + 1).alias("t"),
        )

    fitted = series.select(
        F.explode(F.aggregate("ds", zero, step)["rows"]).alias("r")
    )
    return fitted.select(
        F.col("r.day").alias("day"),
        F.col("r.y").alias("y"),
        F.col("r.cusum_up").alias("cusum_up"),
        F.col("r.cusum_down").alias("cusum_down"),
        F.col("r.alarm_up").alias("alarm_up"),
        F.col("r.alarm_down").alias("alarm_down"),
    ).orderBy("day")


def theilsen_trend_daily(
    events: DataFrame, event_type: str = "click"
) -> DataFrame:
    """Theil–Sen robust trend over the daily volume series: slope =
    MEDIAN of all pairwise slopes (y_j−y_i)/(x_j−x_i), intercept =
    median of (y_i − slope·x_i), where x_i is the CALENDAR-day offset
    of day_i from the first observed day (datediff — exact integer in
    both engines), so slope_per_day really is per calendar day even
    when the series has gaps (ADVICE r08: the earlier position-gap
    form silently reported per-OBSERVED-day units).  The
    robust-statistics complement to holt_trend_daily (smoothing) and
    cusum_drift_daily (drift alarms): up to ~29% wild outlier days
    cannot move the estimate, where a least-squares or Holt fit
    follows them.

    Cross-engine determinism without integer tricks: every pairwise
    slope is ONE IEEE division of exact small integers (correctly
    rounded ⇒ bit-identical in both engines), the median picks
    middle ELEMENTS of the sorted slope array (even count: the mean
    of the two middles — one addition, one halving), and residual
    medians reuse the raw slope.  qround(6) only at the output.

    Scale shape: one map-side-combined daily reduce; the O(days²)
    pair set (~10⁵ pairs for a YEAR of days) and both medians are
    row-local array expressions on the collected calendar-bounded
    series — the holt/cusum tiny-frame pattern, no pair join, no
    global sort."""
    daily = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "y"))).alias("ds")
    )
    n = F.size("ds")

    def med(arr):
        """Median of a sorted double array — middle element, or the
        mean of the two middles (element_at is 1-based)."""
        m = F.size(arr)
        lo = F.element_at(arr, ((m + 1) / 2).cast("int"))
        hi = F.element_at(arr, (m / 2 + 1).cast("int"))
        return (lo + hi) / F.lit(2.0)

    # x_i = calendar-day offset from the FIRST observed day (exact
    # datediff on dates — identical integers in both engines), hoisted
    # to a REAL array column before the pair lambdas consume it (the
    # HOF inline-recompute rule: element_at(ds, 1) inside the O(n²)
    # lambda would re-evaluate per pair)
    xs = F.transform(
        "ds",
        lambda d: F.datediff(
            F.to_date(d["day"]), F.to_date(F.element_at("ds", 1)["day"])
        ),
    )
    staged = series.where(n >= 2).select("ds", xs.alias("xs"))
    # pairwise slopes: for i<j, (y_j - y_i) / (x_j - x_i); days are
    # distinct (groupBy day) so xs is strictly increasing and every
    # denominator is a positive integer
    pair_slopes = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: (
                    F.element_at("ds", j.cast("int"))["y"]
                    - F.element_at("ds", i.cast("int"))["y"]
                ).cast("double")
                / (
                    F.element_at("xs", j.cast("int"))
                    - F.element_at("xs", i.cast("int"))
                ).cast("double"),
            ),
        )
    )
    with_slope = staged.select(
        "ds", "xs", n.cast("bigint").alias("n_days"),
        med(F.array_sort(pair_slopes)).alias("slope")
    )
    resid = F.transform(
        F.sequence(F.lit(1), F.size("ds")),
        lambda i: F.element_at("ds", i.cast("int"))["y"].cast("double")
        - F.col("slope") * F.element_at("xs", i.cast("int")).cast("double"),
    )
    return with_slope.select(
        "n_days",
        qround(F.col("slope"), 6).alias("slope_per_day"),
        qround(med(F.array_sort(resid)), 6).alias("intercept"),
        qround(F.col("slope") * F.lit(7.0), 6).alias("slope_per_week"),
    )


def changepoint_daily(
    events: DataFrame, event_type: str = "click", top: int = 3
) -> DataFrame:
    """Retrospective mean-shift changepoint over daily volume — the
    single-split binary-segmentation step (CUSUM's `cusum_drift_daily`
    raises the ONLINE alarm; Holt forecasts; this answers the
    post-hoc question "on which day did the level actually change?").
    For every candidate split t (mean shifts AFTER day t), the
    between-segment sum-of-squares gain of a two-mean fit over a
    one-mean fit:

        gain(t) = S_t²/t + (S_n−S_t)²/(n−t) − S_n²/n

    maximized over t — the k=1 case of binary segmentation / PELT's
    cost reduction with an L2 cost.  Emits the `top` candidate splits
    with segment means.

    Exactness: prefix sums S_t and totals are exact BIGINTs; gain is
    a fixed per-row tree of IEEE ops over them (deterministic in both
    engines), ordered by the 6-dp-quantized gain + day tie-break.
    Scale: everything after the map-side-combined daily groupBy runs
    on the |days|-row reduced frame (the calendar-bounded whitelist
    class); the final top-k is orderBy+limit."""
    daily = (
        events.where(F.col("event_type") == event_type)
        .select(
            F.date_format(F.col("ts").cast("timestamp"), "yyyy-MM-dd").alias(
                "day"
            )
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # unpartitioned windows over the |days|-row frame only
    w_pref = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pref = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.sum("c").over(w_pref).alias("s_t"),
    )
    tot = daily.agg(
        F.sum("c").cast("bigint").alias("s_n"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    j = pref.crossJoin(F.broadcast(tot)).where(F.col("t") < F.col("n"))
    st = F.col("s_t").cast("double")
    sn = F.col("s_n").cast("double")
    td = F.col("t").cast("double")
    nd = F.col("n").cast("double")
    gain = (
        st * st / td
        + (sn - st) * (sn - st) / (nd - td)
        - sn * sn / nd
    )
    scored = j.select(
        F.col("day").alias("split_day"),
        F.col("t").cast("bigint").alias("n_days_before"),
        (F.col("n") - F.col("t")).cast("bigint").alias("n_days_after"),
        qround(st / td, 4).alias("mean_before"),
        qround((sn - st) / (nd - td), 4).alias("mean_after"),
        qround(gain, 6).alias("sse_gain"),
    )
    return scored.orderBy(F.desc("sse_gain"), F.asc("split_day")).limit(top)


def daily_drift_jsd(actions: DataFrame) -> DataFrame:
    """Day-over-day DISTRIBUTION drift of the event-type mix: the
    Jensen-Shannon divergence between each day's event-type
    distribution and the previous day's — the standard bounded
    (0..ln 2), symmetric drift monitor an ML-ops pipeline alarms on
    when an upstream logger change or bot wave reshapes the traffic
    mix (MAD/CUSUM watch per-series LEVELS; this watches the SHAPE
    across types).

    Arithmetic discipline: counts and totals stay exact BIGINTs; the
    probabilities and ln() terms are the only doubles, and the final
    JSD is quantized to 6 dp — the surprisal family's established
    cross-engine contract for libm-carrying outputs.  Missing types
    contribute 0 to their own side's KL term by the 0·ln(0) = 0
    convention (guarded WHENs, never a NULL-propagating ln(0)).

    Scale shape: one map-side-combined groupBy(day, event_type) over
    the corpus; everything after reduces the |days|×|types| grid
    (completed by a crossJoin of two tiny distinct frames so both
    days of a pair see every type), which is dimension-sized at any
    corpus size.  The day-pair join is grid⋈grid on (type, day+1)."""
    from ..functions.ckpt import ckpt

    # truncate the |days×types|-sized count frame once: it feeds
    # THREE re-derived branches (days, types, the grid join) and each
    # re-ran the corpus groupBy over the (cached) actions frame —
    # profiled at sf0.1: ~10 stages each re-scanning the 4.8 MB cache
    # for 72 s total executor time on a dimension-sized query
    counts = ckpt(
        actions.groupBy("day", "event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
    )
    days = counts.select("day").distinct()
    types = counts.select("event_type").distinct()
    grid = (
        days.crossJoin(types)
        .join(counts, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        )
    )
    tot = grid.groupBy("day").agg(F.sum("n").cast("bigint").alias("total"))
    # grid⋈tot feeds both the current- and previous-day projections;
    # truncate so the pair join's two sides read one materialization
    g = ckpt(grid.join(tot, "day"))
    cur = g.select(
        F.col("day"),
        "event_type",
        F.col("n").alias("n_cur"),
        F.col("total").alias("t_cur"),
    )
    prev = g.select(
        F.date_format(
            F.date_add(F.to_date("day"), 1), "yyyy-MM-dd"
        ).alias("day"),
        "event_type",
        F.col("n").alias("n_prev"),
        F.col("total").alias("t_prev"),
    )
    j = cur.join(prev, ["day", "event_type"])
    p = F.col("n_prev").cast("double") / F.col("t_prev").cast("double")
    q = F.col("n_cur").cast("double") / F.col("t_cur").cast("double")
    m = (p + q) / F.lit(2.0)
    term_p = F.when(F.col("n_prev") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
    term_q = F.when(F.col("n_cur") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    from ..functions import qround

    # per-type JSD contribution, then an ORDER-PINNED left fold over
    # the types (collect_list order is nondeterministic; array_sort on
    # the (event_type, term) struct pins it — the repo's discipline
    # for float sums in gated outputs, same as the entropy fold in
    # engagement.user_behavior_profile)
    per_type = j.select(
        "day", "event_type", ((term_p + term_q) / F.lit(2.0)).alias("term")
    )
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct("event_type", "term"))),
        F.lit(0.0),
        lambda acc, s: acc + s["term"],
    )
    return (
        per_type.groupBy("day")
        .agg(qround(folded, 6).alias("jsd"))
        .orderBy("day")
    )


def zonemap_pruning_report(events: DataFrame) -> DataFrame:
    """Data-skipping audit: per day-partition row counts and max
    `value` statistics, plus whether a zone-map (min/max file stats —
    what parquet row groups and lakehouse table formats keep) would
    PRUNE that partition for the canonical hot-value predicate
    `value >= 90% of the global max`.  This is the operator a table
    owner runs before choosing partition/sort keys: the pruned
    fraction IS the scan cost a layout buys at 100 TB.

    Arithmetic discipline: `value` quantizes to integer CENTS
    up-front, the 90% threshold is pure integer math
    ((max*9) div 10), and the prunable flag is an integer compare —
    no float crosses the engine boundary.

    Scale shape: one map-side-combined groupBy(day) over the corpus
    + a broadcast 1-row global max; output is |days|-sized."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    per_day = events.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.max(cents).alias("max_value_cents"),
    )
    glob = per_day.agg(
        ((F.max("max_value_cents") * 9) / 10)
        .cast("bigint")
        .alias("threshold_cents")
    )
    return (
        per_day.crossJoin(F.broadcast(glob))
        .select(
            "day",
            "n_rows",
            "max_value_cents",
            "threshold_cents",
            (F.col("max_value_cents") < F.col("threshold_cents"))
            .cast("int")
            .alias("prunable"),
        )
        .orderBy("day")
    )
