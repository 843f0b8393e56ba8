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
