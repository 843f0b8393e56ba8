"""Deduplication operators for large-scale document pipelines.

The reference has no document processing (its `distinct` usage is
dropDuplicates on id pairs, UserVisitSessionAnalyzeSpark.java:1376);
these operators extend the engine for training-data pipelines at
100 TB scale:

* `exact_dedup`       — hash-groupBy on md5(text): one shuffle keyed
                        by digest, constant memory per group.
* `ngram_jaccard_pairs` — exact near-dup pairs via the inverted-index
                        join: explode word shingles → self-join on
                        shingle → per-pair intersection vs union.
                        This IS the scalable candidate generation
                        (only docs sharing ≥1 shingle ever meet);
                        `max_df` drops ultra-frequent shingles to cap
                        the join's fan-out on web-scale corpora.
* `minhash_lsh_pairs` — MinHash signatures (k permutations of a
                        2^31-1 modular hash over xxhash64(shingle))
                        → banded LSH bucketing → candidate pairs →
                        EXACT jaccard verification of candidates
                        only.  Verification makes precision exact;
                        recall at the 0.8 default threshold for a
                        0.96-sim pair is 1-(1-0.96^4)^8 ≈ 1-3e-7,
                        so the output equals the exact operator's on
                        realistic near-dup corpora while only
                        candidate pairs are ever compared.
* `simhash_signatures` / `simhash_pairs` — 32-bit SimHash from
                        per-token xxhash64 bit votes; near-dup pairs
                        via banded hamming join (≤`max_hamming`).

All operators are pure built-in expressions (explode / xxhash64 /
bit ops / conditional aggs) — no Python in the hot path.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import qround

MERSENNE_P = 2147483647  # 2^31 - 1

_rng = random.Random(42)
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, MERSENNE_P), _rng.randrange(0, MERSENNE_P)) for _ in range(32)
]


def shingles(docs: DataFrame, k: int = 3, distinct: bool = True) -> DataFrame:
    """(doc_id, shingle) — k-word shingles, 1-based like the oracle.

    The token array is materialized as a projected column BEFORE the
    transform lambda references it: an inlined `split(text)` would be
    re-evaluated per array element (k·n splits per row — measured 2.5×
    slower on the whole operator at sf0.1)."""
    toks = F.col("toks")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(k)]
        ),
    )
    # a small parquet lands in ONE input split; the ~k·n_tokens
    # fan-out below would then run single-threaded — spread the rows
    # across the cluster before exploding (cheap: pre-explode rows)
    par = docs.sparkSession.sparkContext.defaultParallelism
    out = (
        docs.repartition(par)
        .select("doc_id", F.split(F.col("text"), " ").alias("toks"))
        .where(n >= k)
        .select(F.col("doc_id"), F.explode(sh).alias("shingle"))
    )
    return out.distinct() if distinct else out


def exact_dedup(docs: DataFrame) -> DataFrame:
    """One keeper per identical text: (keep_id = min doc_id, n_copies)."""
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def _with_sizes(dsh: DataFrame) -> DataFrame:
    """Attach per-doc shingle count as a window agg — one shuffle on
    doc_id, no separate sizes table to re-join after the pair agg."""
    w = Window.partitionBy("doc_id")
    return dsh.withColumn("n_sh", F.count(F.lit(1)).over(w))


def _jaccard_from_pairs(pairs: DataFrame, threshold: float) -> DataFrame:
    jaccard = F.col("inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("inter")
    ).cast("double")
    return (
        pairs.withColumn("jaccard", jaccard)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", qround(F.col("jaccard"), 3).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, k: int = 3, max_df: int | None = None
) -> DataFrame:
    """Exact Jaccard near-dup pairs over k-word shingles.

    Plan: sizes ride along each shingle row into the self-join, so
    the per-pair aggregation computes intersection AND picks up both
    set sizes in one pass — no join after the shuffle-heavy pair agg.
    """
    dsh = _with_sizes(shingles(docs, k))
    if max_df is not None:
        w_df = Window.partitionBy("shingle")
        dsh = dsh.withColumn("df", F.count(F.lit(1)).over(w_df)).where(
            F.col("df") <= max_df
        )
    a = dsh.select(F.col("doc_id").alias("doc_a"), "shingle", F.col("n_sh").alias("n_a"))
    b = dsh.select(F.col("doc_id").alias("doc_b"), "shingle", F.col("n_sh").alias("n_b"))
    pairs = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min("n_a").alias("n_a"),
            F.min("n_b").alias("n_b"),
        )
    )
    return _jaccard_from_pairs(pairs, threshold)


def minhash_signatures(dsh: DataFrame, num_perm: int = 32) -> DataFrame:
    """(doc_id, sig array<bigint>) — min over each permutation.

    h'(x) = (a * (xxhash64(x) mod P) + b) mod P keeps every product
    below 2^62, safe under ANSI overflow checking."""
    hp = F.pmod(F.xxhash64("shingle"), F.lit(MERSENNE_P))
    mins = [
        F.min(F.pmod(F.lit(a) * hp + F.lit(b), F.lit(MERSENNE_P))).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_COEFFS[:num_perm])
    ]
    sig = dsh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    num_perm: int = 32,
    bands: int = 8,
) -> DataFrame:
    """MinHash+LSH candidate generation, exact-verified.

    Same output contract as `ngram_jaccard_pairs` — precision is
    exact (candidates re-checked), recall governed by (bands, rows).
    """
    rows_per_band = num_perm // bands
    # the shingle table feeds three consumers (signatures + both
    # verification legs); measured locally, recomputing the (cheap,
    # codegen'd) explode beats .persist()'s materialization cost — a
    # cluster-scale run over a large corpus would checkpoint the
    # shingle table to parquet once instead
    dsh = shingles(docs, k)
    sig = minhash_signatures(dsh, num_perm)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", bi * rows_per_band + ri + 1)
                            for ri in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for bi in range(bands)
        ]
    )
    buckets = sig.select("doc_id", F.explode(band_structs).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket")
    )
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band", "bucket"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact verification restricted to candidate pairs; sizes ride
    # along both join legs so the pair agg is self-contained
    sized = _with_sizes(dsh)
    a_sh = sized.select(
        F.col("doc_id").alias("doc_a"), F.col("shingle"), F.col("n_sh").alias("n_a")
    )
    b_sh = sized.select(
        F.col("doc_id").alias("doc_b"), F.col("shingle"), F.col("n_sh").alias("n_b")
    )
    pairs = (
        cand.join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.min("n_a").alias("n_a"),
            F.min("n_b").alias("n_b"),
        )
    )
    return _jaccard_from_pairs(pairs, threshold)


SIMHASH_BITS = 32


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """32-bit SimHash: per-token xxhash64, ±1 votes per bit, sign."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"v{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    sig = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return votes.select("doc_id", sig.cast("bigint").alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming via banded
    join: 4 bands of 8 bits — any pair within distance 3 shares at
    least one exact band (pigeonhole), so the join only compares
    colliding bands, never all pairs."""
    sig = simhash_signatures(docs)
    n_bands, band_bits = 4, SIMHASH_BITS // 4
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("simhash"), bi * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("bucket"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.band").alias("band"), F.col("b.bucket").alias("bucket"))
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bucket"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("x.simhash").alias("sim_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("y.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
