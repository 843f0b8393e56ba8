"""Adversarial Zipf-head stress for the text-quality family.

Synthesizes a deterministic corpus where ONE boilerplate phrase
("common boilerplate phrase") occurs in EVERY document — the Zipf
head made extreme — and A/Bs the round-5 window formulation (corpus
totals as `sum(tf) OVER (PARTITION BY shingle / first-word)`) against
the round-6 de-skewed form (checkpointed pair frame + map-side
combined groupBy + AQE-skew-eligible join-back) on
`dup_ngram_coverage` and `bigram_surprisal`.

The skew only bites in the MANY-TASK regime: a window partition runs
in one task, so the hot key costs ~n_docs rows serially while the
average task holds total_pairs/n_tasks.  Locally with 32 partitions
the hot key is smaller than a task's fair share and the straggler is
invisible; on a 1000-executor cluster (10^5 tasks, partitions at
target size and so NOT coalescible) the ratio is n_tasks /
shingles_per_doc ≈ 1000x.  To emulate that regime here the stress
runs with shuffle.partitions=256 and AQE partition COALESCING off
(skew-join splitting stays ON — that is the mechanism under test);
docs are short (7 tokens) so the hot key dominates a fair share the
same way it would at scale.

Both variants must agree on corpus aggregates (asserted) — this is a
performance A/B of two plans for the SAME result.

Usage: python tools/stress_zipf_head.py [n_docs] [shuffle_partitions]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F

from analysisofuserbehavior_spark.operators.text_analysis import (
    bigram_surprisal,
    dup_ngram_coverage,
)
from analysisofuserbehavior_spark.session import get_spark


def _tokens():
    return F.split(F.col("text"), " ")


def dup_ngram_coverage_window(docs: DataFrame, n: int = 3, min_df: int = 10) -> DataFrame:
    """Round-5 window formulation (A/B harness only, not product)."""
    toks = _tokens()
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    pairs = (
        docs.where(F.size(toks) >= n)
        .select("doc_id", F.explode(sh).alias("shingle"))
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    with_df = pairs.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    per_doc = with_df.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_ngrams"),
        F.sum(F.when(F.col("df") >= min_df, F.col("tf")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("dup_ngrams"),
    )
    return per_doc


def bigram_surprisal_window(docs: DataFrame) -> DataFrame:
    """Round-5 window formulation (A/B harness only, not product)."""
    toks = _tokens()
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    pairs = (
        docs.where(F.size(toks) >= 2)
        .select("doc_id", F.explode(grams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    with_lm = pairs.withColumn(
        "c", F.sum("tf").over(Window.partitionBy("bigram"))
    ).withColumn(
        "c_left",
        F.sum("tf").over(
            Window.partitionBy(F.split(F.col("bigram"), " ").getItem(0))
        ),
    )
    return with_lm.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_bigrams"),
        F.sum(
            F.col("tf").cast("double")
            * (
                F.log2(F.col("c_left").cast("double"))
                - F.log2(F.col("c").cast("double"))
            )
        ).alias("bits"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark(
        "zipf_head_stress",
        extra_conf={
            "spark.sql.shuffle.partitions": str(parts),
            # emulate the non-coalescible many-task regime; skew-JOIN
            # splitting stays on — it is the mechanism under test
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
            # the hot key here lz4-compresses to well under the
            # default 256 MB skew threshold sized for real executors.
            # Scale the thresholds down in proportion to the data so
            # the split fires at the ratio it would at 100 TB
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
            # totals frames exceed the 64 MB broadcast default only at
            # real scale; force the SMJ path so the skew-split
            # mechanism (not the broadcast fallback) is what's timed
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    )
    work = tempfile.mkdtemp(prefix="zipf_head_")
    # every doc carries the same 3-token boilerplate phrase: the
    # "common boilerplate phrase" shingle/bigram keys hold n_docs rows
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("u"), F.col("id")),
            F.concat(F.lit("v"), F.col("id")),
            F.concat(F.lit("w"), F.col("id")),
            F.lit("common boilerplate phrase"),
            F.concat(F.lit("t"), F.col("id") % 97),
        ).alias("text"),
    )
    docs.repartition(32).write.mode("overwrite").parquet(
        f"{work}/documents.parquet"
    )

    raw = spark.read.parquet(f"{work}/documents.parquet")
    variants = {
        "dup_ngram_coverage": {
            "dskew": lambda: dup_ngram_coverage(raw),
            "window": lambda: dup_ngram_coverage_window(raw),
        },
        "bigram_surprisal": {
            "dskew": lambda: bigram_surprisal(raw),
            "window": lambda: bigram_surprisal_window(raw),
        },
    }
    out: dict[str, dict[str, float]] = {}
    checks: dict[str, dict[str, list]] = {}
    skew_split = {}
    for qname, forms in variants.items():
        out[qname] = {}
        checks[qname] = {}
        for fname, build in forms.items():
            best = float("inf")
            for _ in range(2):
                df = build()
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out[qname][fname] = round(best, 3)
            if fname == "dskew":
                # did AQE actually split the hot join partition?  The
                # noop write runs its OWN QueryExecution, so drive
                # this df's QE JVM-side to finalize its adaptive plan
                qe = df._jdf.queryExecution()
                qe.toRdd().count()
                plan = qe.executedPlan().toString()
                skew_split[qname] = "skew=" in plan or "isSkew" in plan
            # cheap agreement check: corpus-level aggregate of the
            # per-doc counts must match between the two plans
            agg_col = (
                "dup_ngrams" if qname == "dup_ngram_coverage" else "n_bigrams"
            )
            checks[qname][fname] = [
                r[0] for r in build().agg(F.sum(agg_col)).collect()
            ]
            spark.catalog.clearCache()
    for qname, forms in checks.items():
        vals = set(tuple(v) for v in forms.values())
        assert len(vals) == 1, (qname, forms)

    # --- the quantity that actually explodes at cluster scale -------
    # A window partition executes in ONE task: whatever the cluster
    # size, the window form's wall-clock is lower-bounded by the hot
    # key's serial window time.  Measure that floor directly: the hot
    # shingle's pair rows, one partition, window-summed — at 1x and 3x
    # the doc count (linear, unparallelizable).  The de-skewed form's
    # hot-key reduce input after map-side combine is n_map_tasks rows
    # (measured below), a constant independent of n_docs.
    toks = _tokens()
    sh3 = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(3)]
        ),
    )
    floors = {}
    for mult in (1, 3):
        big = spark.range(n_docs * mult).select(
            F.col("id").alias("doc_id"),
            F.lit("common boilerplate phrase pad").alias("text"),
        )
        hot_pairs = (
            big.select("doc_id", F.explode(sh3).alias("shingle"))
            .groupBy("doc_id", "shingle")
            .agg(F.count(F.lit(1)).alias("tf"))
            .where(F.col("shingle") == "common boilerplate phrase")
        )
        hot_pairs.coalesce(1).write.mode("overwrite").parquet(f"{work}/hot.parquet")
        hot1 = spark.read.parquet(f"{work}/hot.parquet").coalesce(1)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            hot1.withColumn(
                "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        floors[f"{mult}x"] = round(best, 3)
    # map-side-combined alternative: the hot key reaches the reduce as
    # one partial row per map task — count them for the real corpus
    n_map_partials = (
        raw.select("doc_id", F.explode(sh3).alias("shingle"))
        .where(F.col("shingle") == "common boilerplate phrase")
        .rdd.getNumPartitions()
    )

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "shuffle_partitions": parts,
                "timings_sec": out,
                "aqe_skew_join_split": skew_split,
                "hot_key_serial_window_floor_sec": floors,
                "dskew_hot_key_reduce_rows": n_map_partials,
                "agreement": "aggregates identical across variants",
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
