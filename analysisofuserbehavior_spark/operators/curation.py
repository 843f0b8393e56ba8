"""Corpus-curation operators for training-data pipelines.

The reference stops at behavior analytics; a training-data engine
also has to answer "which documents go into the run, with what
weight, and with what scrubbed?".  Curation primitives, all
built-in JVM expressions (no Python in the hot path) — plus
`quality_weighted_sample` (deterministic quality-proportional
sampling) and `leakage_safe_split` (near-dup-cluster-atomic
train/eval assignment) below:

- `train_eval_split` — deterministic hash split.  Membership is a
  pure projection on md5(salt:doc_id), so it is reproducible across
  runs, machines, and engine versions, needs zero shuffle, and a
  document can never migrate between splits when the corpus grows
  (the classic leak from `ORDER BY rand() LIMIT n` sampling).
- `lang_mixture_weights` — per-language token shares and the
  up/down-sampling weight to hit a target mixture.  One tiny
  aggregate (|languages| rows) + a broadcast scalar total.
- `boilerplate_ngrams` — cross-document repeated n-grams (the
  header/footer/nav-chrome detector): distinct (doc, shingle) →
  document frequency → top repeated phrases.  Two hash shuffles,
  both map-side combined; candidate phrases are a natural input to
  a removal pass.
- `pii_redact` — regex scrubbing (emails, IPv4s, card numbers,
  phone numbers) as chained `regexp_replace` — fused into the scan
  by whole-stage codegen, zero shuffle.  Patterns stay inside the
  RE2-compatible subset (no lookarounds, no backrefs) so the exact
  same pattern strings run on Java regex and RE2-family engines
  (tests/test_curation.py pins cross-engine agreement on synthetic
  PII rows; the driver gate pins the plumbing over `documents`).

At 100 TB: the split and redaction are map-only (scale with scan
bandwidth); the mixture table is O(|langs|); boilerplate DF is the
only real shuffle and is bounded by distinct shingles per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import qround

# 4-hex-digit md5 prefix < threshold → eval.  655/65536 ≈ 1.0 %
# per mille of 16 bits; the default carves out ~10 %.
DEFAULT_EVAL_THRESHOLD_HEX = "1999"  # floor(65536 * 0.10) = 6553 = 0x1999


def split_bucket(salt: str, id_col: str = "doc_id") -> F.Column:
    """First 4 hex digits of md5('<salt>:<id>') — fixed-width
    lowercase hex, so LEXICAL comparison == numeric comparison and
    any engine with md5() reproduces membership bit-for-bit."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 4
    )


def train_eval_split(
    docs: DataFrame,
    eval_threshold_hex: str = DEFAULT_EVAL_THRESHOLD_HEX,
    salt: str = "v1",
) -> DataFrame:
    """(doc_id, bucket, split) — deterministic, growth-stable split."""
    return docs.select(
        "doc_id",
        split_bucket(salt).alias("bucket"),
        F.when(split_bucket(salt) < eval_threshold_hex, "eval")
        .otherwise("train")
        .alias("split"),
    )


def mixture_resample(docs: DataFrame, alpha: float = 0.25) -> DataFrame:
    """APPLY the temperature-mixture weights — the missing half of
    `mixture_temperature_weights`, which only reports the per-language
    resampling weight w = q_i/p_i.  This operator materializes the
    resampled corpus: every document is emitted floor(w) times, plus
    one more copy with probability frac(w) decided by the
    deterministic md5 uniform — so languages with w>1 are UPSAMPLED by
    replication (the standard repeat-plus-fractional-keep rule) and
    languages with w<1 are downsampled, and the expected per-language
    token mass matches the temperature mixture exactly.

    Integer discipline: w is quantized to 4 dp FIRST (the same
    quantization the weights report carries), then copies and the
    fractional threshold are pure integer arithmetic on w4 —
    n_full = w4 div 10000, keep-extra ⇔ 4-hex md5 bucket <
    %04x of (w4 mod 10000)·65536 div 10000 — so engine float ULPs
    cannot flip a copy.  Growth-stable per doc, like every sampler
    here.

    Scale: the weight frame is |languages| rows joined by BROADCAST;
    replication is a row-local explode(sequence) — a pure map stage
    whose output size is the resampled corpus.  No shuffle beyond the
    tiny aggregate inside the weights call."""
    w_raw = mixture_temperature_weights(docs, alpha).select(
        "lang",
        F.floor(F.col("temp_weight") * 10000 + F.lit(0.5))
        .cast("bigint")
        .alias("_w4"),
    )
    n_full = (F.col("_w4") / 10000).cast("bigint")
    thresh_hex = F.format_string(
        "%04x", ((F.col("_w4") % 10000) * 65536 / 10000).cast("bigint")
    )
    extra = (split_bucket("mix1") < thresh_hex).cast("bigint")
    n_copies = (n_full + extra).alias("_n")
    return (
        docs.join(F.broadcast(w_raw), "lang")
        .select(
            "doc_id",
            "lang",
            (F.col("_w4").cast("double") / 10000.0).alias("weight"),
            n_copies,
        )
        .select(
            "doc_id",
            "lang",
            "weight",
            F.explode(
                F.when(F.col("_n") >= 1, F.sequence(F.lit(1).cast("bigint"), F.col("_n")))
                .otherwise(F.array())
            ).alias("copy_idx"),
        )
    )


def train_eval_token_shift(
    docs: DataFrame,
    top: int = 30,
    eval_threshold_hex: str = DEFAULT_EVAL_THRESHOLD_HEX,
    salt: str = "v1",
) -> DataFrame:
    """Token-distribution shift between the train and eval halves of
    the deterministic hash split — the drift diagnostic that catches
    a split whose eval set is NOT distributionally representative
    (topic clumps, boilerplate concentration) before a run trains
    against it.  Positions in the family: `lang_mixture_weights`
    reports shares per LANGUAGE, `benchmark_contamination` checks
    n-gram OVERLAP with a benchmark; this ranks individual TOKENS by
    their eval-weighted log-likelihood shift.

    Per token, add-1 smoothed over the shared vocab V:
        p_split(t) = (c_split(t)+1) / (T_split+V)
        shift_bits = log2 p_eval − log2 p_train
        kl_term    = p_eval · shift_bits   (eval-side KL contribution)
    Output: the `top` tokens by |kl_term| (quantized; ties broken by
    token) — every float is a fixed per-row expression over exact
    integer counts; there is NO cross-row float sum anywhere, so the
    result is bit-stable under any partitioning.

    Scale: one explode → one map-side-combined groupBy(token) with
    conditional sums; vocab totals are a 1-row aggregate of that
    frame joined back by broadcast; the top-k is orderBy+limit
    (TakeOrderedAndProject — no single-partition window)."""
    is_eval = split_bucket(salt) < eval_threshold_hex
    counts = (
        docs.select(
            is_eval.alias("is_eval"),
            F.explode(F.split("text", " ")).alias("token"),
        )
        .groupBy("token")
        .agg(
            F.coalesce(
                F.sum(F.when(~F.col("is_eval"), F.lit(1))), F.lit(0)
            )
            .cast("bigint")
            .alias("c_train"),
            F.coalesce(
                F.sum(F.when(F.col("is_eval"), F.lit(1))), F.lit(0)
            )
            .cast("bigint")
            .alias("c_eval"),
        )
    )
    totals = counts.agg(
        F.sum("c_train").cast("double").alias("t_train"),
        F.sum("c_eval").cast("double").alias("t_eval"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    p_train = (F.col("c_train").cast("double") + F.lit(1.0)) / (
        F.col("t_train") + F.col("v")
    )
    p_eval = (F.col("c_eval").cast("double") + F.lit(1.0)) / (
        F.col("t_eval") + F.col("v")
    )
    shift = F.log2(p_eval) - F.log2(p_train)
    scored = counts.crossJoin(F.broadcast(totals)).select(
        "token",
        "c_train",
        "c_eval",
        qround(shift, 6).alias("shift_bits"),
        qround(p_eval * shift, 9).alias("kl_term"),
    )
    return scored.orderBy(
        F.abs(F.col("kl_term")).desc(), F.col("token")
    ).limit(top)


def lang_mixture_weights(docs: DataFrame) -> DataFrame:
    """Per-language doc/token counts, corpus share, and the sampling
    weight that would flatten the mixture to uniform across the
    observed languages (weight = target_share / actual_share).

    Aggregate is |languages| rows; the grand total joins back as a
    broadcast scalar — no second full-table pass."""
    per_lang = (
        docs.select("lang", F.size(F.split("text", " ")).cast("bigint").alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
    totals = per_lang.agg(
        F.sum("n_tokens").cast("double").alias("_total_tok"),
        F.count(F.lit(1)).cast("double").alias("_n_langs"),
    )
    share = F.col("n_tokens").cast("double") / F.col("_total_tok")
    return (
        per_lang.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            qround(share, 4).alias("token_share"),
            qround((F.lit(1.0) / F.col("_n_langs")) / share, 4).alias("uniform_weight"),
        )
        .orderBy("lang")
    )


def mixture_temperature_weights(
    docs: DataFrame, alpha: float = 0.25
) -> DataFrame:
    """Temperature-based (α-sampling) mixture reweighting — the
    multilingual pretraining rule (XLM-R / mBERT style): sample
    language i with q_i ∝ p_i^α, flattening the Zipfian language
    distribution without going fully uniform (α=1 keeps the natural
    mixture, α→0 approaches uniform — `lang_mixture_weights` is the
    α=0 endpoint).  Returns per-language counts, natural token share,
    temperature share q_i, and the resampling weight q_i / p_i.

    Float-parity discipline: the default α=0.25 is computed as
    sqrt(sqrt(p)) — sqrt is correctly-rounded IEEE in BOTH engines,
    unlike pow(x, 0.25) whose libm implementations may differ in the
    last ULP.  Other α values use pow and are for API use, not the
    hash gate.

    Scale shape: one corpus scan into a |languages|-row aggregate
    (lineage-truncated — the Z normalizer and the final projection
    both consume it), then 1-row broadcast totals; everything after
    the first groupBy is driver-scale by construction."""
    from ..functions.ckpt import ckpt

    per_lang = ckpt(
        docs.select(
            "lang", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
    tot = per_lang.agg(F.sum("n_tokens").cast("double").alias("_tot"))
    share = F.col("n_tokens").cast("double") / F.col("_tot")
    if alpha == 0.25:
        s_val = F.sqrt(F.sqrt(share))
    else:
        s_val = F.pow(share, F.lit(alpha))
    with_s = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        share.alias("_share"),
        s_val.alias("_s"),
    )
    z = with_s.agg(F.sum("_s").alias("_z"))
    return (
        with_s.crossJoin(F.broadcast(z))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            qround(F.col("_share"), 4).alias("token_share"),
            qround(F.col("_s") / F.col("_z"), 4).alias("temp_share"),
            qround((F.col("_s") / F.col("_z")) / F.col("_share"), 4).alias(
                "temp_weight"
            ),
        )
        .orderBy("lang")
    )


def boilerplate_ngrams(
    docs: DataFrame, n: int = 5, min_df: int = 20, top: int = 100
) -> DataFrame:
    """Top cross-document repeated n-grams by document frequency —
    the boilerplate candidate list.

    distinct(doc_id, shingle) → one shuffle on the pair hash;
    groupBy(shingle) → second shuffle, partial counts combined
    map-side; top-k via sort+limit (TakeOrderedAndProject — no
    global sort materializes).  DF counts distinct DOCUMENTS, so a
    phrase repeated 1000× inside one page is not boilerplate."""
    # toks materialized as a column: inline split(text) inside the
    # transform lambda re-splits per element (O(n²) on long docs)
    sh = F.transform(
        F.sequence(F.lit(0), F.size("_t") - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("_t"), i + j + 1) for j in range(n)]
        ),
    )
    return (
        docs.select("doc_id", F.split("text", " ").alias("_t"))
        .where(F.size("_t") >= n)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
        .orderBy(F.desc("df"), F.asc("shingle"))
        .limit(top)
    )


# RE2-compatible subset only (shared verbatim with the SQL oracle):
# no lookarounds, no backrefs, no \b-dependent alternations beyond
# what RE2 supports.  Order matters — cards before phones so a
# 16-digit run is consumed as one card, not a phone fragment.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"[0-9]{4}([ -][0-9]{4}){3}", "<CARD>"),
    ("phone", r"\+?[0-9]{1,2}[ -][0-9]{3}[ -][0-9]{3}[ -][0-9]{4}", "<PHONE>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
)


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Chained regex redaction + per-pattern match counts.

    Counts are measured on the ORIGINAL text (documented contract:
    they answer "how much PII did this doc carry", not "how many
    replacements ran"); replacement is sequential in PII_PATTERNS
    order on the progressively-scrubbed string."""
    clean = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, token)
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    return df.select(
        "doc_id",
        clean.alias("clean_text"),
        *counts,
    )


def quality_weighted_sample(docs: DataFrame, salt: str = "qs1") -> DataFrame:
    """Deterministic quality-PROPORTIONAL sampling — the curation
    step that keeps high-quality documents with high probability and
    boilerplate with low probability (the FineWeb/DCLM
    classifier-score sampling pattern, with the engine's built-in
    quality heuristic as the score).

    keep ⇔ u(doc) < quality, where u is the md5-prefix uniform from
    `split_bucket` (growth-stable: a doc's verdict never changes as
    the corpus grows).  The comparison runs ENTIRELY in fixed-width
    lowercase hex: threshold = %05x of (q100 · 65536) ÷ 100 in exact
    integer math, the bucket is zero-padded to the same width, so
    lexical order == numeric order in every engine and no float CDF
    is involved.  Pure projection — zero shuffle at any scale."""
    from .text_analysis import text_stats

    stats = text_stats(docs)
    q100 = F.floor(F.col("quality_score") * 100 + F.lit(0.5)).cast("bigint")
    thresh_hex = F.format_string(
        "%05x", F.floor((q100 * 65536) / 100).cast("bigint")
    )
    bucket5 = F.lpad(split_bucket(salt), 5, "0")
    return stats.select(
        "doc_id",
        "quality_score",
        bucket5.alias("bucket"),
        (bucket5 < thresh_hex).alias("kept"),
    )


DSIR_BUCKETS = 8192


def dsir_select(
    docs: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    target_q100: int = 80,
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by the log importance ratio between a hashed-unigram LM
    of a TARGET subset and the LM of the raw corpus, then keep the
    documents that look more target-like than raw-like.

    Target membership reuses the engine's quality heuristic and is
    decided in INTEGER space (floor(quality·100+0.5) >= target_q100)
    so the boundary can never flip across engines.  Features are
    DSIR's hashed unigrams: bucket = md5_prefix32(token) mod
    n_buckets (the cross-engine token mixer — bit-identical in
    DuckDB), add-1 smoothed:

        logw(d) = Σ_b tf(b,d)·(log2(c_t(b)+1) − log2(c_r(b)+1))
                  + |d|·(log2(T_r+B) − log2(T_t+B))

    selected ⇔ the doc's PER-TOKEN score lands in the top quartile
    (the paper Gumbel-samples ∝ w; the deterministic keep-top-k rule
    is the hash-gateable analogue, and the scores themselves are the
    resampling input).  A fixed `logw > 0` cut would be degenerate:
    add-1 smoothing over B buckets biases every score by
    ≈ log2((T_r+B)/(T_t+B)) − the per-token count ratio, so the
    zero crossing moves with corpus size.  The quartile is the
    two-pass distributed ntile from functions/ranking.py (no
    single-partition sort), over the score quantized to integer
    micro-bits-per-token — integer domain, exact ntile semantics in
    both engines, and per-token normalization removes the length
    confound (longer docs otherwise accumulate more smoothing bias).

    Scale design: ONE corpus scan feeds the (doc, bucket) → tf pair
    frame (map-side-combined, localCheckpointed once — `ckpt`
    rationale); both LMs come from ONE groupBy over it with
    conditional sums (c_raw, c_target per bucket — ≤ n_buckets rows),
    joined back by BROADCAST (the frame is bounded by n_buckets, not
    the corpus); totals are a 1-row aggregate of that tiny frame.  No
    Zipf-head window, no second scan, no global sort — the per-doc
    score is a broadcast-join + per-doc aggregate, and selection is a
    pure projection."""
    from ..functions import md5_prefix32
    from ..functions.ckpt import ckpt
    from .text_analysis import _tokens, quality_score_raw

    # token array materialized as a REAL column before any lambda
    # touches it (the HOF inline-recompute trap: an inline
    # split(text) referenced from transform re-splits per element)
    from ..functions.spread import spread_small_scan

    # guide §2.5: spread the 1-partition gate/bench scan before the
    # tokenize+md5+explode stage-1 (serial otherwise); no-op at scale
    base = spread_small_scan(docs.select("doc_id", "text")).select(
        "doc_id", _tokens().alias("_t")
    )
    q100 = F.floor(quality_score_raw(F.col("_t")) * 100 + F.lit(0.5)).cast(
        "bigint"
    )
    pairs = ckpt(
        base.select(
            "doc_id",
            (q100 >= target_q100).alias("is_target"),
            F.explode(
                F.transform(
                    F.col("_t"),
                    lambda t: F.pmod(md5_prefix32(t), F.lit(n_buckets)),
                )
            ).alias("bucket"),
        )
        .groupBy("doc_id", "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    counts = pairs.groupBy("bucket").agg(
        F.sum("tf").cast("bigint").alias("c_raw"),
        F.coalesce(
            F.sum(F.when(F.col("is_target"), F.col("tf"))), F.lit(0)
        )
        .cast("bigint")
        .alias("c_t"),
    )
    totals = counts.agg(
        F.sum("c_raw").cast("double").alias("t_raw"),
        F.sum("c_t").cast("double").alias("t_t"),
    )
    llr = counts.select(
        "bucket",
        (
            F.log2(F.col("c_t").cast("double") + F.lit(1.0))
            - F.log2(F.col("c_raw").cast("double") + F.lit(1.0))
        ).alias("llr"),
    )
    b = float(n_buckets)
    scored = (
        pairs.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id", "is_target")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf").cast("double") * F.col("llr")).alias("bits"),
        )
        .crossJoin(F.broadcast(totals))
    )
    logw = F.col("bits") + F.col("n_tokens").cast("double") * (
        F.log2(F.col("t_raw") + F.lit(b)) - F.log2(F.col("t_t") + F.lit(b))
    )
    from ..functions.ranking import distributed_ntile

    per_tok_micro = F.floor(
        logw / F.col("n_tokens").cast("double") * 1000000.0 + F.lit(0.5)
    ).cast("bigint")
    scored = scored.select(
        "doc_id",
        "is_target",
        "n_tokens",
        qround(logw, 6).alias("logw_bits"),
        per_tok_micro.alias("_lw"),
    )
    return (
        distributed_ntile(scored, "_lw", "doc_id", k=4, out_col="quartile")
        .select(
            "doc_id",
            "is_target",
            "n_tokens",
            "logw_bits",
            F.col("quartile").cast("int").alias("quartile"),
            (F.col("quartile") == 4).alias("selected"),
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    neardup_pairs: DataFrame,
    eval_threshold_hex: str = DEFAULT_EVAL_THRESHOLD_HEX,
    salt: str = "v1",
) -> DataFrame:
    """Train/eval split that CANNOT leak through near-duplicates:
    `train_eval_split` hashes each doc independently, so two
    near-identical documents can land on opposite sides and the eval
    set silently scores memorization.  Here every transitive near-dup
    cluster (connected components over the pair graph) is assigned as
    a UNIT — membership hashes the cluster id (min reachable doc_id),
    so all members inherit one verdict.  Docs with no near-dup are
    their own cluster and split exactly like `train_eval_split`.

    Scale: the cluster label frame is bounded by |docs that appear in
    a pair| — tiny next to the corpus — and the one extra join runs
    on the already-partitioned doc_id key; everything else stays the
    map-only hash projection."""
    from .dedup import dedup_clusters

    clusters = dedup_clusters(neardup_pairs)
    labeled = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    bucket = split_bucket(salt, id_col="cluster_id")
    return labeled.select(
        "doc_id",
        "cluster_id",
        bucket.alias("bucket"),
        F.when(bucket < eval_threshold_hex, "eval").otherwise("train").alias("split"),
    )


N_SHUFFLE_SHARDS = 16


def shuffle_hash(salt: str = "sh1", id_col: str = "doc_id") -> F.Column:
    """First 8 hex digits of md5('<salt>:<id>') — the deterministic
    shuffle key.  Fixed-width lowercase hex, so LEXICAL order ==
    numeric order and range-sharding on the string is exactly range
    partitioning on the 32-bit hash value."""
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
    )


def training_shuffle_shards(
    docs: DataFrame, salt: str = "sh1", n_shards: int = N_SHUFFLE_SHARDS
) -> DataFrame:
    """Global-shuffle shard manifest: every document is assigned a
    deterministic pseudo-random position (md5 hash) and the hash
    space is cut into `n_shards` CONTIGUOUS ranges — the plan a
    training-data writer executes as
    `df.repartition(k, "shard_id").write.partitionBy("shard_id")` to
    produce shards that are (a) a uniform random partition of the
    corpus, (b) reproducible from (salt, doc_id) alone, and (c)
    internally orderable for streaming reads.  The reference's
    nearest construct is the per-task random session extract
    (UserVisitSessionAnalyzeSpark.java:900-1056), which samples;
    training ingestion needs the full corpus permuted, not sampled.

    n_shards must be a power of 16 divisor of the hex domain here
    (shard id = leading hex digits), keeping shard membership a
    PREFIX test — any engine with md5() reproduces it bit-for-bit.
    The manifest is one map-side-combined groupBy (shard id is
    row-local); no global sort happens until the optional write,
    and that write's range exchange samples only the hash column.

    Returns (shard_id, n_docs, sum_chars, min_hash, max_hash),
    min/max over the 8-hex prefix proving range purity."""
    if n_shards != 16:
        raise ValueError("prefix sharding implemented for n_shards=16")
    h = shuffle_hash(salt)
    return (
        docs.select(
            h.alias("h"),
            F.col("n_chars"),
            # leading hex digit → 0..15 via its position in the
            # lowercase hex alphabet (mirrors strpos in the oracle;
            # conv() would work too but has no 1:1 DuckDB twin)
            (
                F.instr(
                    F.lit("0123456789abcdef"), F.substring(h, 1, 1)
                ).cast("int")
                - 1
            ).alias("shard_id"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("h").alias("min_hash"),
            F.max("h").alias("max_hash"),
        )
    )


def curriculum_stages(docs: DataFrame) -> DataFrame:
    """Quality-quartile curriculum plan: assign every document to a
    training stage by corpus-relative quality (stage 0 = top
    quartile, served first; stage 3 = bottom), and report per-stage
    volume so a scheduler can budget epochs.

    EXACT quartile thresholds at 100 TB without a global sort: the
    quality score is 2-dp quantized (text_stats), so its value
    domain is tiny — count-by-value (map-side combine), a running
    CDF over the |distinct values|-row histogram (window bounded by
    the domain, not the corpus; same shape as doc_length_quantiles),
    and integer threshold tests `cum*4 >= k*total`.  Stage
    assignment is then one broadcast join of a 1-row threshold frame
    + a row-local CASE.

    Returns (stage, n_docs, sum_tokens, min_quality, max_quality,
    avg_quality)."""
    from pyspark.sql import Window

    from .text_analysis import text_stats

    stats = text_stats(docs).select("doc_id", "n_tokens", "quality_score")
    counts = stats.groupBy("quality_score").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("quality_score").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.withColumn("cum", F.sum("c").over(w))
    total = cum.agg(F.sum("c").alias("total"))
    thresholds = cum.crossJoin(F.broadcast(total)).agg(
        *[
            F.min(
                F.when(
                    F.col("cum") * 4 >= F.lit(k) * F.col("total"),
                    F.col("quality_score"),
                )
            ).alias(f"q{k}")
            for k in (1, 2, 3)
        ]
    )
    staged = stats.crossJoin(F.broadcast(thresholds)).withColumn(
        "stage",
        # top quartile trains first: scores ABOVE q3 → stage 0
        F.when(F.col("quality_score") > F.col("q3"), 0)
        .when(F.col("quality_score") > F.col("q2"), 1)
        .when(F.col("quality_score") > F.col("q1"), 2)
        .otherwise(3),
    )
    return (
        staged.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.min("quality_score").alias("min_quality"),
            F.max("quality_score").alias("max_quality"),
            # order-independent mean: sum the 2-dp scores as integer
            # cents (bigint — associative), divide once at the end
            qround(
                F.sum(
                    F.floor(F.col("quality_score") * 100 + F.lit(0.5)).cast(
                        "bigint"
                    )
                ).cast("double")
                / (F.count(F.lit(1)).cast("double") * 100.0),
                4,
            ).alias("avg_quality"),
        )
        .withColumn("stage", F.col("stage").cast("int"))
    )


def perplexity_filtered_corpus(docs: DataFrame, k: int = 3) -> DataFrame:
    """CCNet-style perplexity-bucketed quality filter (VERDICT r11
    #8 — model-based scoring at scale): score every document by the
    corpus's OWN trigram stupid-backoff LM (`backoff_surprisal`'s
    mean bits-per-trigram — a perplexity log; no external model
    needed, the established bootstrap for a first curation pass),
    band the corpus into k perplexity tertiles (head = most fluent
    under the LM, tail = highest-surprisal gibberish), and keep the
    head + middle bands — the CCNet recipe (Wenzek et al., 2020),
    where the high-perplexity tail is dropped and the low end is
    left to the repetition/boilerplate filters that own it
    (`dup_ngram_coverage`, `remove_dup_spans`).

    Banding is the GROUPED-free two-pass distributed ntile
    (functions/ranking.distributed_ntile: bucketed global rank +
    closed-form integer ntile — never an unpartitioned window), over
    the deterministic order (bits_per_trigram, doc_id); the score is
    already 6-dp quantized by backoff_surprisal, so the band
    boundaries are cross-engine exact.  Docs with <3 tokens have no
    trigrams and are out of scope (the short-doc contract the
    containment dedup also follows).

    Scale shape: backoff_surprisal is one corpus scan (checkpointed
    pair frame, vocab³-bounded LM join); the ntile adds one
    two-pass rank over the n_docs-row scored frame.  Everything
    downstream of the scan is |docs|-bounded, not token-bounded."""
    from ..functions.ranking import distributed_ntile
    from .text_analysis import backoff_surprisal

    scored = backoff_surprisal(docs)
    banded = distributed_ntile(
        scored, "bits_per_trigram", "doc_id", k, out_col="ppl_band"
    )
    return banded.select(
        "doc_id",
        "n_trigrams",
        "bits_per_trigram",
        "ppl_band",
        F.when(F.col("ppl_band") < F.lit(k), 1).otherwise(0).cast("int").alias("kept"),
    ).orderBy("doc_id")
