"""Sparse-retrieval operators over the documents corpus.

BM25 scoring for a fixed query-term set, expressed so the per-doc
term frequencies are ROW-LOCAL array expressions (no explode, no
(doc, term) shuffle): for a handful of query terms the tf of each
term is `size(filter(tokens, t -> t = term))` fused into the scan.
Corpus statistics (N, avgdl, per-term df) reduce to ONE 1-row
aggregate that broadcast-joins back — so the whole query is two scans
of `documents`, one 1-row shuffle, and a TakeOrdered.  At 100 TB the
scoring pass is a pure map stage; nothing grows with corpus size
except the scan itself.

Reference parity: the reference has no retrieval operator — this is
part of the training-data-pipeline surface (query-relevance slicing
of a corpus before sampling), built the way Lucene/Elasticsearch
define BM25 (Robertson k1/b defaults, Lucene's idf smoothing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import qround

DEFAULT_QUERY_TERMS = ("spark", "join", "window", "stream")


def _tokens() -> Column:
    return F.split(F.col("text"), " ")


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...] = DEFAULT_QUERY_TERMS,
    k: int = 20,
    k1: float = 1.5,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for `query_terms`.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·|d|/avgdl))
    idf(t)   = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))   (Lucene smoothing)

    Scale design: per-term tf is a row-local `size(filter(...))` —
    the token array is never exploded, so no (doc, term) pair frame
    exists.  df/N/avgdl collapse into one single-row aggregate
    (map-side combined conditional counts) broadcast back onto the
    scoring scan; the final top-k is TakeOrderedAndProject, never a
    global sort.  Ordering uses the QUANTIZED score (6 dp HALF_UP,
    mirrored in the oracle) + doc_id so float ULPs cannot flip ranks
    across engines.

    Defaults k1=1.5, b=0.75 (mid Robertson range) are chosen so the
    derived constants k1+1=2.5 and 1-b=0.25 are EXACT binary doubles —
    the oracle's literals are bit-identical without mirroring Python's
    float-add rounding."""
    toks = _tokens()
    def _tf(term: str) -> Column:
        # NB: the lambda must be unary — F.filter passes the element
        # index to any 2-arg function, which would shadow a bound
        # default argument
        lit = F.lit(term)
        return F.size(F.filter(toks, lambda t: t == lit)).cast("double")

    tf_cols = [_tf(term).alias(f"tf_{i}") for i, term in enumerate(query_terms)]
    base = docs.select(
        "doc_id", F.size(toks).cast("double").alias("dl"), *tf_cols
    )
    # avgdl from EXACT integers — sum(dl) as BIGINT then ONE double
    # division: a double avg() is an order-dependent partial sum, and
    # avgdl feeds every score quantized at 6 dp, so a cross-partition
    # ULP could flip a boundary.  df counts likewise exact BIGINTs.
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum(F.col("dl").cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint"))
            .cast("double")
            .alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )

    def part(i: int) -> Column:
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        tf = F.col(f"tf_{i}")
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
        )
        return idf * tf * F.lit(k1 + 1.0) / denom

    score = part(0)
    for i in range(1, len(query_terms)):
        score = score + part(i)
    return (
        base.crossJoin(F.broadcast(stats))
        .select("doc_id", qround(score, 6).alias("bm25"))
        .where(F.col("bm25") > 0.0)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )
