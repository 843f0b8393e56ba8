"""Zipf-vocabulary stress for BPE merge learning (VERDICT r07 #8).

The sf testdata carries a ~31-word synthetic vocabulary, so the
round-9 "vocab-bound" claim for `bpe_learn_merges` was measured in a
regime where the vocab frame is trivially small.  This stress
synthesizes a REALISTIC word-frequency distribution — V distinct
words with Zipf(s=1) frequencies (rank r drawn as floor(V^u),
u uniform from a per-slot hash, so P(r) ∝ 1/r) — and measures:

  1. the one-time corpus scan (word-frequency groupBy) vs
  2. the 8-iteration merge loop, with `min_count` OFF and ON,

at two corpus sizes (10× apart).  The claim under test: iteration
cost tracks the (pruned) VOCAB, not the corpus — corpus size moves
only the one-time scan, and `min_count` shrinks every iteration's
working set by the Zipf-tail fraction while leaving the learned
merges for the head intact.

Everything is generated INSIDE Spark (spark.range + hash-derived
ranks; no driver-side corpus), deterministic across runs.

Usage: python tools/stress_bpe_zipf.py [n_docs] [vocab]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.operators.bpe import _word_vocab, bpe_learn_merges
from analysisofuserbehavior_spark.session import get_spark

DOC_TOKENS = 80


def zipf_docs(spark, n_docs: int, vocab: int):
    """n_docs docs of DOC_TOKENS words; word rank Zipf(s=1) via the
    inverse-CDF r = floor(V^u) with u = hash(doc,slot)/2^20 — exact
    integer/float expressions, fully distributed, deterministic."""
    u = (
        F.pmod(F.xxhash64(F.col("id"), F.col("slot")), F.lit(1 << 20)).cast(
            "double"
        )
        / F.lit(float(1 << 20))
    )
    rank = F.floor(F.pow(F.lit(float(vocab)), u)).cast("long")
    word = F.concat(F.lit("w"), rank.cast("string"))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(DOC_TOKENS - 1)),
                lambda s: F.concat(
                    F.lit("w"),
                    F.floor(
                        F.pow(
                            F.lit(float(vocab)),
                            F.pmod(
                                F.xxhash64(F.col("id"), s), F.lit(1 << 20)
                            ).cast("double")
                            / F.lit(float(1 << 20)),
                        )
                    ).cast("long")
                    .cast("string"),
                ),
            ),
        ).alias("text"),
    )


def run(spark, n_docs: int, vocab: int, min_count: int) -> dict:
    docs = zipf_docs(spark, n_docs, vocab)
    t0 = time.perf_counter()
    v = _word_vocab(docs, min_count)
    n_vocab = v.count()  # forces the one corpus scan
    t_scan = time.perf_counter() - t0
    t0 = time.perf_counter()
    merges = bpe_learn_merges(spark, docs, 8, min_count=min_count).collect()
    t_total = time.perf_counter() - t0
    return {
        "n_docs": n_docs,
        "corpus_tokens": n_docs * DOC_TOKENS,
        "vocab_target": vocab,
        "min_count": min_count,
        "vocab_rows": n_vocab,
        "scan_s": round(t_scan, 2),
        "learn8_s": round(t_total, 2),
        "merges": [(r["left_sym"], r["right_sym"]) for r in merges],
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark("stress_bpe_zipf")
    out = []
    for nd in (n_docs // 10, n_docs):
        for mc in (1, 5):
            r = run(spark, nd, vocab, mc)
            out.append(r)
            print(json.dumps(r))
    # the head merges must be unaffected by tail pruning
    by = {(r["n_docs"], r["min_count"]): r["merges"] for r in out}
    for nd in (n_docs // 10, n_docs):
        same = by[(nd, 1)] == by[(nd, 5)]
        print(
            json.dumps(
                {"n_docs": nd, "head_merges_stable_under_min_count": same}
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
