"""Training-set featurization operators.

Not present in the reference (its feature engineering stops at the
session-aggregate strings of UserVisitSessionAnalyzeSpark.java:340-455);
added for the training-data-pipeline surface:

* `target_encode_category` — smoothed target (mean) encoding of a
  high-cardinality categorical against a binary outcome, the standard
  leakage-aware CTR/GBDT feature.  enc = (hits + m·prior) / (n + m)
  with an additive-smoothing pseudo-count `m`, so rare categories
  shrink toward the global prior instead of memorizing noise.
* `feature_hash_docs` — the hashing trick (Weinberger et al. 2009):
  tokens land in a fixed `dim`-bucket space via the cross-engine
  md5_prefix32 mixer, signed by the next hash bit so collisions
  cancel in expectation.  Vocabulary-free, so the feature space is
  CONSTANT-width no matter how the corpus grows — the property that
  makes it the 100 TB featurizer (no vocab build, no broadcast
  dictionary, one map-side pass).

Scale notes: target encoding is one map-side-combined groupBy over
the fact table plus a broadcast of the 1-row global prior — no
window, no skew exposure (a hot category is still one output row fed
by partial aggregates).  Feature hashing is explode→groupBy with
map-side combine; the output width is `dim`, independent of corpus
size, and per-doc feature rows are bounded by min(n_tokens, dim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import qround
from ..functions.core import md5_prefix32


def target_encode_category(
    actions: DataFrame,
    target_event: str = "purchase",
    m: float = 20.0,
) -> DataFrame:
    """Per-category smoothed purchase-rate encoding.

    One pass: n = events in category, hits = target events; the
    global prior is hits_total / n_total.  All counts are exact
    integers; the encode is a single fixed-order double expression
    mirrored verbatim by the oracle, HALF_UP-rounded to 6 dp.

    Leakage: this is the FIT step (a per-category table to be joined
    onto a training split).  For strict leave-one-out encoding
    subtract the row's own contribution at apply time:
    (hits - y + m·prior) / (n - 1 + m) — same exact-integer algebra.
    """
    hit = (F.col("event_type") == target_event).cast("bigint")
    per_cat = (
        actions.where(F.col("category_id").isNotNull())
        .groupBy("category_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(hit).alias("n_target"),
        )
    )
    totals = per_cat.agg(
        F.sum("n_events").alias("_tn"), F.sum("n_target").alias("_th")
    )
    prior = F.col("_th").cast("double") / F.col("_tn").cast("double")
    enc = (F.col("n_target").cast("double") + F.lit(m) * prior) / (
        F.col("n_events").cast("double") + F.lit(m)
    )
    return (
        per_cat.crossJoin(F.broadcast(totals))
        .select(
            "category_id",
            "n_events",
            "n_target",
            qround(prior, 6).alias("prior"),
            qround(enc, 6).alias("encoded"),
        )
        .orderBy("category_id")
    )


def feature_hash_docs(
    documents: DataFrame,
    dim: int = 64,
    sample_docs: int = 20,
) -> DataFrame:
    """Signed hashed bag-of-words features, `dim` buckets.

    bucket = md5_prefix32(token) % dim (low bits), sign = the next
    hash bit ((h / dim) % 2 → ±1), feature = Σ sign over token
    OCCURRENCES (multiset, not set — term frequency signal).  Integer
    sums are order-independent, so the result hash-gates exactly.

    Output is restricted to the `sample_docs` docs with the smallest
    md5(doc_id) — the house deterministic sample (the featurization
    itself is a stateless per-doc map; at 100 TB it runs as this same
    explode→groupBy with map-side combine, write the full frame
    instead of sampling).  Empty-token guard: split('' , ' ') yields
    [''], which hashes like any token — acceptable for the gate; a
    production filter would drop blank tokens before hashing.
    """
    sampled = (
        documents.select("doc_id", "text")
        .withColumn("_ord", F.md5(F.col("doc_id").cast("string")))
        .orderBy("_ord", "doc_id")
        .limit(sample_docs)
        .select("doc_id", "text")
    )
    tok = F.explode(F.split(F.col("text"), " ")).alias("token")
    hashed = sampled.select("doc_id", tok).select(
        "doc_id", md5_prefix32(F.col("token")).alias("h")
    )
    # integer division (`div`), NOT double-divide + cast: Spark's
    # double→bigint cast truncates while DuckDB's CAST rounds, so the
    # float form would flip signs on half-boundary hashes
    sign = F.when(F.expr(f"(h div {dim}) % 2") == 1, F.lit(1)).otherwise(F.lit(-1))
    return (
        hashed.select(
            "doc_id",
            (F.col("h") % dim).cast("int").alias("dim_id"),
            sign.alias("sign"),
        )
        .groupBy("doc_id", "dim_id")
        .agg(F.sum("sign").alias("feat"))
        .where(F.col("feat") != 0)
        .orderBy("doc_id", "dim_id")
    )


def quantile_normalize_by_type(events: DataFrame, k: int = 100) -> DataFrame:
    """Per-group quantile (rank) normalization of `value`: each event
    mapped to its ntile(k) percentile WITHIN its event_type — the
    rank-based feature scaling that makes heavy-tailed monetary
    features comparable across populations (and the per-group twin of
    the gated global deciles).  Output is the (event_type, percentile)
    summary grid: counts and exact integer-cent bounds per cell.

    Scale shape: the within-group rank is the TWO-PASS bucket rank
    generalized per group (functions/ranking.with_grouped_rank) —
    never `Window.partitionBy(event_type)`, which would sort
    |rows|/|types| per task over a handful of skewed partitions.  The
    percentile is the closed-form integer ntile from (rank, group
    total): no double division until there is none at all — the whole
    operator is integer-exact."""
    from ..functions.ranking import ntile_from_rank, with_grouped_rank

    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    base = events.select(
        "event_type", "event_id", cents.alias("cents")
    )
    ranked = with_grouped_rank(
        base, ["event_type"], "cents", "event_id", rank_col="rk"
    )
    totals = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("_gtotal")
    )
    cells = (
        ranked.join(F.broadcast(totals), "event_type")
        .withColumn("percentile", ntile_from_rank("rk", "_gtotal", k))
        .groupBy("event_type", "percentile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )
    return cells.select(
        "event_type",
        F.col("percentile").cast("int").alias("percentile"),
        "n",
        "min_cents",
        "max_cents",
    ).orderBy("event_type", "percentile")
