"""Zipf-head adversarial stress for dedup_contained_docs (VERDICT r11
#1): every document OPENS with the same 8-token stop-phrase, so the
old first-gram anchor would key the candidate join on ONE gram shared
by the whole corpus — df(anchor) = n_docs, a quadratic hot key.  The
rarest-gram anchor must instead pick each doc from its unique tail
(df ≈ 2), keeping the candidate count linear in the planted pairs.

The fixture plants exact containments: every 10th doc gets a wrapper
twin whose text embeds it verbatim, so ground truth is closed-form
(doc i is contained exactly in doc n+i).  Checks, at 1× and 10×:

  * correctness — the result matches the closed-form ground truth
    exactly (ids, container ids, counts);
  * skew — the measured candidate-pair count stays ≤ a small
    multiple of the planted pairs (first-gram anchoring would give
    ~n²/2 candidates, ~5·10⁶ at n=3200 vs the planted ~320);
  * linearity — the 10× wall-clock ratio stays well under the
    quadratic regime (≲ 10× ·slack; a first-gram plan blows past
    100× because candidates grow n²).

Usage: python tools/stress_containment_skew.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.operators.dedup import dedup_contained_docs
from analysisofuserbehavior_spark.session import get_spark

STOP_PREFIX = "in the of the and a to in"  # 8 tokens, identical everywhere


def fixture(spark, n_docs: int):
    """n_docs base docs, all opening with STOP_PREFIX, unique tails;
    every 10th gets a wrapper container doc at id n_docs + i."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(STOP_PREFIX + " body"),
            F.lit(" u"), F.col("id").cast("string"),
            F.lit(" v"), (F.col("id") * 7 % 9973).cast("string"),
            F.lit(" w"), (F.col("id") * 13 % 9973).cast("string"),
            F.lit(" tail"), F.col("id").cast("string"),
        ).alias("text"),
    )
    wrappers = base.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + n_docs).alias("doc_id"),
        F.concat(
            F.lit("wrapper opens here "), F.col("text"), F.lit(" wrapper closes")
        ).alias("text"),
    )
    return base.unionByName(wrappers)


def candidate_count(docs) -> int:
    """The candidate-join fan-out the rarest-gram anchor produces —
    re-derives the operator's internal frames (kept in sync by the
    correctness check: if the operator changed shape this diagnostic
    is still a valid upper-bound probe of anchor df)."""
    toks = F.split(F.col("text"), " ")
    meta = docs.select(
        "doc_id", "text", F.size(toks).cast("bigint").alias("dl")
    ).where(F.size(toks) >= 4)
    mtoks = F.split(F.col("text"), " ")
    grams = meta.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("dl") - 4),
                lambda i: F.concat_ws(" ", F.slice(mtoks, i + 1, 4)),
            )
        ).alias("gram"),
    ).distinct()
    gram_df = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    anchors = (
        grams.join(gram_df, "gram")
        .groupBy("doc_id")
        .agg(F.min_by("gram", F.struct("df", "gram")).alias("gram"))
    )
    return (
        grams.select(F.col("doc_id").alias("b_id"), "gram")
        .join(anchors.select(F.col("doc_id").alias("a_id"), "gram"), "gram")
        .where(F.col("a_id") != F.col("b_id"))
        .count()
    )


def run(spark, n_docs: int) -> dict:
    docs = fixture(spark, n_docs).persist()
    docs.count()
    t0 = time.perf_counter()
    got = {
        r["doc_id"]: (r["n_containers"], r["container_id"])
        for r in dedup_contained_docs(docs).collect()
    }
    sec = round(time.perf_counter() - t0, 3)
    planted = {i: (1, n_docs + i) for i in range(0, n_docs, 10)}
    assert got == planted, (
        f"containment wrong at n={n_docs}: {len(got)} found vs "
        f"{len(planted)} planted; first diffs: "
        f"{dict(list({k: (got.get(k), planted.get(k)) for k in set(got) ^ set(planted) | {k for k in got if got.get(k) != planted.get(k)}}.items())[:5])}"
    )
    n_cand = candidate_count(docs)
    docs.unpersist()
    return {"n_docs": n_docs, "sec": sec, "candidates": n_cand,
            "planted_pairs": len(planted)}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3200
    spark = get_spark("stress_containment")
    small = run(spark, n // 10)
    big = run(spark, n)
    ratio = round(big["sec"] / max(small["sec"], 1e-3), 2)
    # candidates must track planted pairs, not n² (each wrapper shares
    # its contained doc's tail grams, so the rarest-anchor df ≈ 2;
    # allow generous slack for boundary grams bridging into the
    # wrapper prefix/suffix)
    for r in (small, big):
        assert r["candidates"] <= 6 * r["planted_pairs"] + 50, r
    quadratic_ratio = 100  # what first-gram anchoring would approach
    assert ratio < quadratic_ratio / 2, (small, big, ratio)
    print(json.dumps({"small": small, "big": big, "time_ratio_10x": ratio,
                      "verdict": "linear"}))
    spark.stop()


if __name__ == "__main__":
    main()
