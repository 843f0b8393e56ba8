"""Embedding-corpus statistics: integer-exact covariance.

Not present in the reference (no vector columns there); added for
the training-data-pipeline surface: the d×d covariance of the
embedding column is the input to whitening / PCA drift checks /
decorrelation audits a representation-quality pass runs over a
corpus.

The cross-engine trap is float summation order — a distributed
Σ xᵢxⱼ over doubles is not associative, so a naive avg/covar_samp
can never hash-gate (the same reason cents_sum exists).  Here every
coordinate is quantized ONCE to a bounded integer grid
(q = floor(x·10⁴ + 0.5), exact in IEEE for |x| ≤ ~1), and all moment
sums are int64 — order-independent, bit-identical under any
partitioning, replayed verbatim by the DuckDB oracle.  The float
division back to covariance happens exactly once, in a fixed
expression order, then HALF_UP-rounds.

Scale design: the Gram accumulation runs as `mapInPandas` partial
outer products — each Arrow batch contributes one numpy int64
`Qᵀ·Q` (d×d), accumulated per PARTITION, so the shuffle carries
d(d+1)/2 rows per partition (2,080 for d=64) no matter how many
vectors the partition holds; the final reduce is a groupBy over
those tiny partials.  That is the canonical map-side-combine shape
for moment matrices — corpus size only affects the embarrassingly
parallel map stage.  Column sums ride the same quantization through
a posexplode + groupBy (d rows out).  No window, no pair join, no
driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import qround

_SCALE = 10_000  # 4-dp grid: |q| ≤ ~10⁴ ⇒ per-pair products ≤ 10⁸,
# so int64 holds exact sums up to ~9·10¹⁰ rows per partition


def embedding_covariance(embeddings: DataFrame, dim: int = 64) -> DataFrame:
    """(i, j, cov) for 1 ≤ i ≤ j ≤ dim — the upper triangle of the
    sample covariance (n-1 denominator) of the quantized embedding
    coordinates.  cov = (S_ij − S_i·S_j/n) / (n−1) / 10⁸, 9-dp
    HALF_UP; S_* are exact int64 moment sums."""
    qscale = float(_SCALE)

    def gram_partials(iterator):
        import numpy as np
        import pandas as pd

        acc = None
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.floor(m * qscale + 0.5).astype(np.int64)
            p = q.T @ q
            acc = p if acc is None else acc + p
        if acc is not None:
            iu = np.triu_indices(acc.shape[0])
            yield pd.DataFrame(
                {"i": iu[0] + 1, "j": iu[1] + 1, "s_ij": acc[iu]}
            )

    partials = embeddings.select("embedding").mapInPandas(
        gram_partials, "i INT, j INT, s_ij LONG"
    )
    s_ij = partials.groupBy("i", "j").agg(F.sum("s_ij").alias("s_ij"))

    ux = embeddings.select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "x"
        )
    ).select(
        (F.col("pos") + 1).cast("int").alias("i"),
        F.floor(F.col("x") * qscale + F.lit(0.5)).cast("bigint").alias("q"),
    )
    sums = ux.groupBy("i").agg(F.sum("q").alias("s"))
    n_frame = embeddings.agg(F.count(F.lit(1)).cast("double").alias("_n"))

    # n <= 1 ⇒ sample covariance undefined: NULL, not a DIVIDE_BY_ZERO
    # crash under ANSI (one-row-audit finding; oracle mirrors the CASE)
    cov = F.when(
        F.col("_n") > F.lit(1.0),
        (
            F.col("s_ij").cast("double")
            - F.col("s_i").cast("double") * F.col("s_j").cast("double") / F.col("_n")
        )
        / (F.col("_n") - F.lit(1.0))
        / F.lit(qscale * qscale),
    )
    return (
        s_ij.join(sums.select(F.col("i"), F.col("s").alias("s_i")), "i")
        .join(sums.select(F.col("i").alias("j"), F.col("s").alias("s_j")), "j")
        .crossJoin(F.broadcast(n_frame))
        .select("i", "j", qround(cov, 9).alias("cov"))
        .orderBy("i", "j")
    )


def embedding_norm_profile(embeddings: DataFrame) -> DataFrame:
    """Embedding-table QA histogram: vector L2 norms bucketed at 1 dp
    with per-bucket counts — the data-quality screen an embedding
    pipeline runs before indexing (a spike at 0.0 = dead encoder
    outputs; a heavy tail = un-normalized mixtures that silently
    dominate dot-product retrieval).

    The norm is sqrt of an INDEX-ORDER fold over the squared
    components (transform + aggregate — the same accumulation order
    DuckDB's list_transform/list_sum mirror uses), quantized at 1 dp
    BEFORE the histogram groupBy so the bucket boundary is the same
    expression on both engines.

    Scale shape: one row-local map over the corpus + a bucket-sized
    groupBy; no joins, no windows."""
    from ..functions import qround

    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    ss = F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        embeddings.select(qround(F.sqrt(ss), 1).alias("norm_bucket"))
        .groupBy("norm_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
        .orderBy("norm_bucket")
    )
