"""Sequence packing — mapping documents into fixed-size context
windows for LLM training.

The standard pretraining data layout concatenates documents in a
deterministic order into one virtual token stream and chunks it into
`budget`-token context windows, letting documents straddle window
boundaries.  The operator computes, per document, its token offset in
that stream and the first/last window it lands in — everything a
downstream batch assembler needs, without materializing the stream.

The whole computation is one exclusive prefix sum over doc_id order.
A naive `Window.orderBy("doc_id")` is a single-partition sort — the
classic 100 TB scale-killer — so the prefix sum is two-pass instead,
the textbook distributed scan:

1. docs land in `n_buckets` doc_id ranges (pure arithmetic on the
   key against the broadcast max id — monotone in doc_id, so bucket
   order IS stream order; no sampling, no skew surprises on a dense
   id space);
2. per-bucket token sums (tiny: `n_buckets` rows) get a running
   total on the driver-sized frame, giving each bucket its stream
   offset;
3. the per-doc prefix is the broadcast bucket offset plus an
   intra-bucket running sum — a window PARTITIONED by bucket, which
   shuffles once and sorts each bucket independently in parallel.

Token semantics are exactly `text_analysis.token_counts.ws_tokens`
(whitespace tokens, empty text → 0), so packing and token accounting
can never disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    step: int = 96,
    *,
    stride: int | None = None,
) -> DataFrame:
    """Overlapping context-window chunking of long documents — the
    complement of `pack_sequences` (which merges SHORT docs): every
    document is split into fixed-size token windows starting at
    0, step, 2·step, … < n_tokens, each window carrying up to
    `chunk_tokens` tokens (the last window may be shorter).

    `step` is the DISTANCE between window starts — consecutive
    windows overlap by `chunk_tokens - step` tokens (128/96 defaults
    → 32-token overlap).  The parameter was named `stride` through
    round 9, a porting trap because HuggingFace tokenizers use
    `stride` for the OVERLAP (their step = max_length - stride);
    renamed per VERDICT r07 #6.  `stride=` survives as a deprecated
    keyword alias with the OLD (step) meaning — an HF config ports as
    `step = max_length - hf_stride`.  chunk_idx = start / step, so
    output identity is deterministic and SQL-mirrorable; the rename
    is hash-neutral (same defaults, same arithmetic).

    Scale shape: pure row-local array expressions (sequence + slice +
    posexplode) fused into the scan — no shuffle at any corpus size;
    output row count is Σ ceil(n_tokens/step).  Exact integer
    arithmetic throughout, so the whole transform hash-gates."""
    if stride is not None:
        import warnings

        warnings.warn(
            "chunk_documents(stride=) is deprecated — it is the STEP "
            "between window starts, NOT the HuggingFace overlap; "
            "pass step= instead",
            DeprecationWarning,
            stacklevel=2,
        )
        step = stride
    toks_col = F.split(F.col("text"), " ")
    with_toks = docs.select("doc_id", toks_col.alias("toks"))
    n = F.size(F.col("toks"))
    starts = F.sequence(F.lit(0), n - 1, F.lit(step))
    exploded = with_toks.where(n > 0).select(
        "doc_id",
        "toks",
        F.explode(starts).alias("start"),
    )
    piece = F.slice(F.col("toks"), F.col("start") + 1, chunk_tokens)
    return exploded.select(
        "doc_id",
        (F.col("start") / step).cast("bigint").alias("chunk_idx"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("bigint").alias("n_tokens"),
    )


def pack_sequences(
    docs: DataFrame, budget: int = 512, n_buckets: int = 32
) -> DataFrame:
    """(doc_id, n_tokens, offset, first_bin, last_bin) per document.

    `offset` is the exclusive prefix sum of whitespace-token counts in
    doc_id order; bins are `budget`-token windows of the concatenated
    stream.  Zero-token documents sit at a single (empty) position:
    last_bin = first_bin."""
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    n_tokens = (
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
        .otherwise(ws)
        .cast("bigint")
    )
    base = docs.select("doc_id", n_tokens.alias("n_tokens"))

    # scalar max id broadcast — never a global window (cf. the
    # session_random_extract n_days pattern)
    span = base.agg((F.max("doc_id") + 1).alias("_span"))
    bucketed = base.crossJoin(F.broadcast(span)).withColumn(
        "_bucket", (F.col("doc_id") * n_buckets / F.col("_span")).cast("bigint")
    )

    # pass 1: per-bucket totals — n_buckets rows, so the running
    # total's single-partition window is driver-scale by construction
    btotals = bucketed.groupBy("_bucket").agg(F.sum("n_tokens").alias("_btokens"))
    bprefix = btotals.withColumn(
        "_boffset",
        F.coalesce(
            F.sum("_btokens").over(
                Window.orderBy("_bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_bucket", "_boffset")

    # pass 2: intra-bucket running sum — partitioned window, one
    # shuffle on _bucket, each bucket sorted independently
    w = (
        Window.partitionBy("_bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = F.col("_boffset") + F.sum("n_tokens").over(w) - F.col("n_tokens")
    # integer `div`, never floor(double /): offsets are exact bigints
    first_bin = F.expr(f"offset div {budget}")
    last_bin = F.greatest(
        F.col("first_bin"), F.expr(f"(offset + n_tokens - 1) div {budget}")
    )
    return (
        bucketed.join(F.broadcast(bprefix), "_bucket")
        .withColumn("offset", offset.cast("bigint"))
        .withColumn("first_bin", first_bin)
        .withColumn("last_bin", last_bin)
        .select("doc_id", "n_tokens", "offset", "first_bin", "last_bin")
    )


def bin_manifest(packed: DataFrame, budget: int = 512) -> DataFrame:
    """Invert the packing: per context window, which documents feed it
    and how full it is.  Documents spanning k windows explode into k
    manifest rows — sequence(first_bin, last_bin) is row-local, so
    the inversion costs one explode plus the groupBy shuffle."""
    spans = packed.select(
        "doc_id",
        "n_tokens",
        "offset",
        F.explode(F.sequence("first_bin", "last_bin")).alias("bin_id"),
    )
    tok_in_bin = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(
            F.col("offset") + F.col("n_tokens"), (F.col("bin_id") + 1) * budget
        )
        - F.greatest(F.col("offset"), F.col("bin_id") * budget),
    )
    return (
        spans.withColumn("tokens_in_bin", tok_in_bin)
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens_in_bin").alias("tokens_used"),
        )
    )
