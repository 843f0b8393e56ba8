"""End-to-end training-corpus cleaning pipeline.

The composition a 100 TB pretraining-data job actually runs, as one
declarative plan over the `documents` table:

    quality gate  →  exact dedup  →  near-dup removal  →  stats out

Each stage is an existing operator (text_analysis.text_stats,
dedup.exact_dedup semantics, dedup.ngram_jaccard_pairs); this module
wires them with deterministic keep-rules so the whole pipeline is
oracle-checkable:

* quality gate: keep docs with quality_score >= min_quality AND
  n_tokens >= min_tokens (both computed on the ROUNDED score, so the
  cross-engine comparison is exact).
* exact dedup: keep the MIN doc_id of each identical-text group.
* near-dup removal: over the survivors, compute jaccard pairs
  (doc_a < doc_b) and greedily drop every doc_b — the lower id of a
  dup pair always survives.  (Greedy-by-id is deterministic and
  SQL-expressible; true transitive clustering would need iterative
  connected components — out of scope for the oracle gate and rarely
  material at high thresholds.)

The near-dup stage defaults to `minhash_lsh_pairs` — the 100 TB
path: candidates only meet inside LSH band buckets, then get
exact-verified, so precision is exact and recall at the 0.8
threshold is ≈1 (see dedup.py).  Per-doc MinHash signatures are
corpus-independent, so running it over the quality/exact survivors
finds exactly the surviving subset of the full corpus's pairs — the
oracle stays the exact-jaccard SQL.  `method="exact"` swaps in the
O(shared-shingle pairs) inverted-index join for small corpora.

Scale shape: two broadcast-light semi/anti joins around the
pair generation; everything else is projections and one hash agg
per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from .text_analysis import text_stats


def clean_corpus(
    docs: DataFrame,
    min_quality: float = 0.5,
    min_tokens: int = 10,
    jaccard_threshold: float = 0.8,
    method: str = "minhash",
) -> DataFrame:
    """Survivor docs with their stats: (doc_id, n_tokens, quality_score)."""
    stats = text_stats(docs)
    quality_ids = stats.where(
        (F.col("quality_score") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    ).select("doc_id")
    survivors = docs.join(quality_ids, "doc_id", "left_semi")

    exact_keep = (
        survivors.groupBy(F.md5(F.col("text")).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = survivors.join(exact_keep, "doc_id", "left_semi")

    pair_fn = minhash_lsh_pairs if method == "minhash" else ngram_jaccard_pairs
    near_drop = (
        pair_fn(survivors, threshold=jaccard_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    survivors = survivors.join(near_drop, "doc_id", "left_anti")

    return survivors.select("doc_id").join(stats, "doc_id").select(
        "doc_id", "n_tokens", "quality_score"
    )


def benchmark_contamination(
    docs: DataFrame,
    bench_pred,
    k: int = 3,
) -> DataFrame:
    """Benchmark-contamination scan: for every corpus doc, the number
    of k-word shingles it shares with the benchmark set
    (`bench_pred(docs) -> boolean Column` splits the frame), plus the
    contaminated fraction of its own shingles.  Docs with zero
    overlap are omitted — at 100 TB the hit set is the only frame
    small enough to materialize.

    Scale shape: the benchmark shingle set is tiny relative to the
    corpus (eval sets are thousands of docs), so it broadcasts and
    the scan is one pass over corpus shingles with no shuffle on the
    corpus side except the final per-doc count; swap the broadcast
    for a shuffled semi-join if the benchmark outgrows the driver.
    """
    from .dedup import shingles

    flag = bench_pred(docs)
    bench_sh = (
        shingles(docs.where(flag), k)
        .select(F.xxhash64("shingle").alias("sh"))
        .distinct()
    )
    corp_sh = shingles(docs.where(~flag), k).select(
        "doc_id", F.xxhash64("shingle").alias("sh")
    )
    sizes = corp_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        corp_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    from ..functions import qround

    return hits.join(sizes, "doc_id").select(
        "doc_id",
        F.col("n_shared").cast("bigint").alias("n_shared"),
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        qround(F.col("n_shared") / F.col("n_shingles"), 3).alias("contam_frac"),
    )
