"""Text-analysis column operators for document pipelines.

Pure built-in expressions over the `documents` table — token
counting, quality scoring, language-ID heuristic, bag fingerprinting.
Everything is a per-row projection (no shuffle at all): at 100 TB
these run as a single map stage fused into the parquet scan by
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import qround

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def _tokens() -> Column:
    return F.split(F.col("text"), " ")


def _spread_docs(docs: DataFrame, light: bool = False) -> DataFrame:
    """(doc_id, text) spread across the session's cores before the
    tokenize/explode/partial-aggregate stage-1 work of the LM family
    (functions/spread.py — guide §2.5 single-row-group input skew;
    no-op at real-scale partition counts).  Without it the whole
    explode + map-side combine of a query's first stage serializes on
    the one-partition gate/bench scan.

    `light=True` floors the spread (spread.LIGHT_WORK): the four
    single-aggregate tail entries (vocab_growth, collocations_pmi,
    countmin_token_freq, vocab_coverage_curve) do so little stage-1
    work that below ~32 MB of input the added exchange costs more
    than the serial stage it removes (per-entry A/B at sf0.1, VERDICT
    r12 #9: those four −0.1..−0.2 s with the floor, while the
    surprisal/dedup-span family — whose spread feeds a ckpt
    materialization — measured +0.3..+1.3 s WITH the floor, so they
    keep the unconditional spread)."""
    from ..functions.spread import LIGHT_WORK, spread_small_scan

    return spread_small_scan(
        docs.select("doc_id", "text"),
        min_bytes=LIGHT_WORK if light else None,
    )


def _ckpt_pairs(df: DataFrame) -> DataFrame:
    """Materialize a (doc, token/shingle) pair frame exactly once —
    the LM family's alias of `functions.ckpt.ckpt` (see that module
    for the full rationale: compute-once guarantee for re-derived
    branches, AQE OptimizeSkewedJoin eligibility for truncated
    aggregate outputs, exact post-materialization stats, and the
    SPARK_GRAFT_PAIR_CKPT local|reliable lifecycle knob).

    Why the LM family checkpoints BOTH its frames: the pair frame has
    multiple consumers (corpus totals groupBy + the join-back), and
    the totals frame feeds a join whose skew split AQE silently drops
    if an aggregate sits between the shuffle and the join's sort.
    The resulting checkpoint + groupBy partial agg + join-back shape
    has no single-task hot key — unlike the key-partitioned window
    sums it replaced, where a Zipf-head key ("the", a universal
    boilerplate shingle) serializes onto one WindowExec task that AQE
    cannot split."""
    from ..functions.ckpt import ckpt

    return ckpt(df)


def quality_score_raw(toks: Column) -> Column:
    """UNQUANTIZED quality heuristic — the ONE definition shared by
    `text_stats` and `corpus_pipeline.quality_gate_report` (extracted
    per round-6 ADVICE: the gate used to re-implement the formula
    inline, pinned equal only by a test — now a change here changes
    both consumers by construction):

        0.6 · min(n_tokens/100, 1) + 0.4 · min(stop_ratio/0.1, 1)

    Callers quantize with qround(·, 2)."""
    n_tokens = F.size(toks).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("bigint")
    stop_ratio = n_stop.cast("double") / n_tokens.cast("double")
    return (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.6
        + F.least(stop_ratio / F.lit(0.1), F.lit(1.0)) * 0.4
    )


def dup_kgram_frac_raw(toks_col: Column, k: int) -> Column:
    """UNQUANTIZED duplicated-k-gram fraction (Gopher repetition
    signal) shared by `repetition_stats` and
    `corpus_pipeline.quality_gate_report`.  `toks_col` MUST be a
    MATERIALIZED array column, not an inline split(text) — referenced
    from the transform lambda, an inline split re-splits the whole
    text per element (O(n²) on long docs).  Short docs short-circuit
    BEFORE the gram expression: Spark's sequence(1, n) runs
    DESCENDING when n < 1.  Callers quantize with qround(·, 6)."""
    idx = F.sequence(F.lit(1), F.size(toks_col) - (k - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks_col, i + j) for j in range(k)]
        ),
    )
    n = F.size(grams)
    frac = (n - F.size(F.array_distinct(grams))).cast("double") / n.cast("double")
    return F.when(F.size(toks_col) >= k, frac).otherwise(F.lit(0.0))


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token/char counts, stopword ratio, quality score.

    quality = `quality_score_raw` — a length/stopword heuristic in
    the spirit of C4-style quality filters, expressed as
    deterministic double arithmetic."""
    toks = _tokens()
    n_tokens = F.size(toks).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("bigint")
    stop_ratio = n_stop.cast("double") / n_tokens.cast("double")
    n_alpha = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("bigint")
    quality = quality_score_raw(toks)
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        qround(n_alpha.cast("double") / n_tokens.cast("double"), 2).alias("avg_token_len"),
        qround(stop_ratio, 2).alias("stopword_ratio"),
        qround(quality, 2).alias("quality_score"),
    )


def lang_id(docs: DataFrame, min_ratio: float = 0.02) -> DataFrame:
    """Stopword-density language ID (n-gram-free heuristic): docs
    whose English-stopword token share clears `min_ratio` → 'en'."""
    toks = _tokens()
    ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
        / F.size(toks).cast("double")
    )
    return docs.select(
        "doc_id",
        qround(ratio, 3).alias("en_ratio"),
        F.when(ratio >= min_ratio, "en").otherwise("unk").alias("lang_guess"),
    )


# BPE-ish pre-tokenizer: letter runs (with optional apostrophe
# suffix), digit runs, or single non-space symbols — the word-piece
# boundary regex BPE vocabularies are trained over.  Same dialect in
# Java regex (Spark) and RE2 (DuckDB), asserted by the oracle.
BPE_PATTERN = r"[A-Za-z]+'[A-Za-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish token counts and punctuation ratio.

    A pure projection (no shuffle): the LLM-pipeline "how many
    tokens is this document" pre-pass, kept JVM-side via the
    built-in regexp engine — no Python tokenizer in the scan path."""
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0))
    n_chars = F.length("text")
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^A-Za-z0-9\s]"), 0))
    return docs.select(
        "doc_id",
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
        .otherwise(ws)
        .cast("bigint")
        .alias("ws_tokens"),
        bpe.cast("bigint").alias("bpe_tokens"),
        qround(n_punct.cast("double") / F.nullif(n_chars, F.lit(0)).cast("double"), 3).alias(
            "punct_ratio"
        ),
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Order-insensitive bag fingerprint: md5 of the sorted distinct
    token set.  Two docs with identical vocabulary collide — a cheap
    pre-filter ahead of jaccard verification."""
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(_tokens())), " "))
    return docs.select("doc_id", fp.alias("fingerprint"))


ROLLING_BASE = 1_000_003  # prime base
ROLLING_MOD = 2_147_483_647  # 2^31 - 1; keeps acc*base + h < 2^62 (ANSI-safe)


def rolling_fingerprint(docs: DataFrame) -> DataFrame:
    """ORDER-SENSITIVE polynomial rolling hash over the token stream:
    acc = (acc * B + h(tok) mod M) mod M — Rabin-Karp style.
    Distinguishes reordered documents that the bag fingerprint
    collides.

    HASH-GATED since round 10 (VERDICT r07 #2): the token mixer is
    md5_prefix32 (cross-engine bit-identical), so the whole fold is
    exact integer arithmetic DuckDB replays via
    list_reduce(list_prepend(0, list_transform(...))) — same B, same
    M, same left-to-right order.  acc·B + h < 2³¹·2²⁰ + 2³² < 2⁵²,
    ANSI-safe in both engines.  (xxhash64 was the original mixer;
    no ANSI twin, which is why this row was rows-only.)"""
    from ..functions import md5_prefix32

    fp = F.aggregate(
        _tokens(),
        F.lit(0).cast("bigint"),
        lambda acc, t: F.pmod(
            acc * F.lit(ROLLING_BASE) + F.pmod(md5_prefix32(t), F.lit(ROLLING_MOD)),
            F.lit(ROLLING_MOD),
        ),
    )
    return docs.select("doc_id", fp.alias("rolling_fp"))


def normalize_text(docs: DataFrame) -> DataFrame:
    """Canonical text normalization ahead of dedup: lowercase, strip
    non-alphanumerics, collapse whitespace.  Pure projection; the
    md5 of the normalized form is the exact-dedup key that catches
    case/punctuation variants the raw-text hash misses."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", " "),
            r" +",
            " ",
        )
    )
    return docs.select("doc_id", norm.alias("norm_text"), F.md5(norm).alias("norm_hash"))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Within-document repetition signals — the Gopher-style quality
    filters (Rae et al. 2021 §A1.1: "repetition" rules) that catch
    boilerplate, keyword-stuffed and looping documents before they
    reach training:

    * dup_word_frac   — 1 - |distinct words| / |words|
    * dup_2gram_frac  — fraction of bigram slots occupied by a
                        repeated bigram
    * dup_3gram_frac  — same for trigrams

    All three are row-LOCAL array expressions (size/array_distinct
    over the token and shingle arrays) — a pure projection fused into
    the scan, zero shuffle at any corpus size.  Fractions are exact
    IEEE divisions of two small ints (identical in DuckDB), quantized
    to 6 dp like every other cross-engine ratio."""
    toks = _tokens()

    def dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(
            n > 0,
            (n - F.size(F.array_distinct(arr))).cast("double") / n.cast("double"),
        ).otherwise(F.lit(0.0))

    return (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.size(F.col("toks")).cast("bigint").alias("n_words"),
            qround(dup_frac(F.col("toks")), 6).alias("dup_word_frac"),
            # k-gram fractions via the shared builder (short docs
            # short-circuit inside it)
            qround(dup_kgram_frac_raw(F.col("toks"), 2), 6).alias("dup_2gram_frac"),
            qround(dup_kgram_frac_raw(F.col("toks"), 3), 6).alias("dup_3gram_frac"),
        )
    )


def unigram_surprisal(docs: DataFrame) -> DataFrame:
    """Unigram language-model quality score: per-doc mean token
    surprisal, bits_per_token(d) = Σ_t tf(t,d)·(log2 T − log2 c(t)) / |d|
    where c(t) is the corpus count of token t and T = Σ c(t).

    The cheap stand-in for a KenLM-style perplexity filter (the
    CCNet/Gopher quality signal): documents dominated by rare tokens
    score high, boilerplate scores low.  Scale design: the
    explode+aggregate pair frame is built ONCE (localCheckpoint — see
    `_ckpt_pairs` for why lineage truncation, not window sums, is the
    scale-safe way to reuse it); corpus counts c(t) are a
    map-side-combined groupBy over that frame joined back onto it
    (AQE-skew eligible — no Zipf-head single-task window partition);
    the global total T = Σ c(t) = Σ |d| is a 1-row aggregate over a
    NO-explode, no-shuffle projection of the raw scan (sum of
    size(tokens)) — the only second scan, and a cheap one.  The two
    log2 calls and the final division are mirrored verbatim in the
    oracle; quantized 6 dp before output."""
    pairs = _ckpt_pairs(
        _spread_docs(docs).select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    counts = _ckpt_pairs(pairs.groupBy("token").agg(F.sum("tf").alias("c")))
    with_c = pairs.join(counts, "token")
    total = docs.agg(
        F.sum(F.size(_tokens()).cast("bigint")).cast("double").alias("t_total")
    )
    scored = (
        with_c.crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(
                F.col("tf").cast("double")
                * (F.log2(F.col("t_total")) - F.log2(F.col("c").cast("double")))
            ).alias("bits"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        qround(F.col("bits") / F.col("n_tokens").cast("double"), 6).alias(
            "bits_per_token"
        ),
    )


def bigram_surprisal(docs: DataFrame) -> DataFrame:
    """Bigram language-model quality score: per-doc mean conditional
    surprisal, bits_per_bigram(d) =
    Σ_b tf(b,d)·(log2 c(w1·) − log2 c(w1 w2)) / n_bigrams(d), where
    c(w1 w2) is the corpus bigram count and c(w1·) its left-context
    total — P(w2|w1) under the maximum-likelihood bigram LM.

    The next step up from `unigram_surprisal` toward a KenLM-style
    perplexity filter: word-salad documents (plausible unigrams,
    improbable transitions) score high here while passing the unigram
    screen.  Scale design — ONE corpus scan: the map-side-combined
    (doc, bigram) → tf shuffle is localCheckpointed (`_ckpt_pairs`:
    why lineage truncation beats both re-derived branches and
    key-partitioned windows); the LM totals are then pure
    aggregations — c(w1 w2) is a groupBy over the pair frame, and the
    left-context total c(w1·) = Σ_w2 c(w1 w2) is derived from that
    distinct-bigram frame (vocab²-bounded, tiny next to the pair
    frame), so the worst Zipf key ("the …") is map-side-combined
    everywhere and the single join back onto the pair frame is
    AQE-skew eligible.  All counts are exact BIGINTs; the two log2
    calls and one division are the only float ops, mirrored verbatim
    in the oracle; quantized 6 dp."""
    toks = _tokens()
    # toks materialized as a column: inline split(text) inside the
    # transform lambda re-splits per element (O(n²) on long docs)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_t") - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("_t"), i + 1), F.element_at(F.col("_t"), i + 2)
        ),
    )
    pairs = _ckpt_pairs(
        _spread_docs(docs).select("doc_id", toks.alias("_t"))
        .where(F.size("_t") >= 2)
        .select("doc_id", F.explode(grams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    counts = _ckpt_pairs(
        pairs.groupBy("bigram")
        .agg(F.sum("tf").alias("c"))
        .withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
    )
    left = counts.groupBy("w1").agg(F.sum("c").alias("c_left"))
    lm = _ckpt_pairs(counts.join(left, "w1").select("bigram", "c", "c_left"))
    with_lm = pairs.join(lm, "bigram")
    scored = with_lm.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_bigrams"),
        F.sum(
            F.col("tf").cast("double")
            * (
                F.log2(F.col("c_left").cast("double"))
                - F.log2(F.col("c").cast("double"))
            )
        ).alias("bits"),
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        qround(F.col("bits") / F.col("n_bigrams").cast("double"), 6).alias(
            "bits_per_bigram"
        ),
    )


def backoff_surprisal(docs: DataFrame, min_count: int = 2) -> DataFrame:
    """Trigram stupid-backoff LM score: per-doc mean surprisal
    -log2 S(w3 | w1 w2) over trigram positions, with

        S = c3(w1 w2 w3) / ctx3(w1 w2 ·)      if c3 >= min_count
        S = 0.25 * suf2(· w2 w3) / mid1(· w2 ·)   otherwise

    where every count is over corpus TRIGRAM POSITIONS: c3 the
    trigram's own count, ctx3 the positions sharing its first two
    words, suf2 the positions sharing its last two words, mid1 the
    positions sharing its middle word — the Brants et al. "stupid
    backoff" scheme with the backoff weight fixed at 0.25 so its
    log2 is EXACTLY -2 (0.4 is conventional, but log2(0.4) is an
    irrational float whose last-ULP could flip the 6 dp quantization
    between engines; 2 bits keeps the whole score exact-integer +
    log2 arithmetic, the same cross-engine discipline as the rest of
    the LM family).  Rare trigrams (c3 < min_count, default 2 — i.e.
    singletons) back off to the bigram estimate; both branches are
    exercised on any corpus with repeated phrases.

    The KenLM-style filter `bigram_surprisal`'s docstring promises:
    word salads score high on transitions a unigram screen passes;
    backoff keeps singleton trigrams from all scoring alike.

    Scale design — ONE corpus scan, same shape as the rest of the
    de-skewed family (`_ckpt_pairs`): the (doc, trigram) → tf pair
    frame is checkpointed; ALL four LM statistics derive from the
    distinct-trigram counts frame (vocab³-bounded, tiny next to the
    pair frame) by splitting the trigram string and re-aggregating —
    never a second pass over the corpus, never a key-partitioned
    window; the per-trigram bits are precomputed on that small frame
    and the single join back onto the pair frame is AQE-skew
    eligible.  Exact BIGINT counts; log2 and one final division are
    the only float ops, mirrored verbatim in the oracle; quantized
    6 dp."""
    toks = _tokens()
    # toks materialized as a column: inline split(text) inside the
    # transform lambda re-splits per element (O(n²) on long docs)
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_t") - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("_t"), i + 1),
            F.element_at(F.col("_t"), i + 2),
            F.element_at(F.col("_t"), i + 3),
        ),
    )
    pairs = _ckpt_pairs(
        _spread_docs(docs).select("doc_id", toks.alias("_t"))
        .where(F.size("_t") >= 3)
        .select("doc_id", F.explode(grams).alias("trigram"))
        .groupBy("doc_id", "trigram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = F.split(F.col("trigram"), " ")
    c3 = _ckpt_pairs(
        pairs.groupBy("trigram")
        .agg(F.sum("tf").alias("c"))
        .select(
            "trigram",
            "c",
            w.getItem(0).alias("w1"),
            w.getItem(1).alias("w2"),
            w.getItem(2).alias("w3"),
        )
    )
    ctx = c3.groupBy("w1", "w2").agg(F.sum("c").alias("ctx3"))
    suf = c3.groupBy("w2", "w3").agg(F.sum("c").alias("suf2"))
    mid = c3.groupBy("w2").agg(F.sum("c").alias("mid1"))
    lm = _ckpt_pairs(
        c3.join(ctx, ["w1", "w2"])
        .join(suf, ["w2", "w3"])
        .join(mid, ["w2"])
        .select(
            "trigram",
            F.when(
                F.col("c") >= min_count,
                F.log2(F.col("ctx3").cast("double"))
                - F.log2(F.col("c").cast("double")),
            )
            .otherwise(
                F.lit(2.0)
                + F.log2(F.col("mid1").cast("double"))
                - F.log2(F.col("suf2").cast("double"))
            )
            .alias("bits1"),
        )
    )
    scored = (
        pairs.join(lm, "trigram")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_trigrams"),
            F.sum(F.col("tf").cast("double") * F.col("bits1")).alias("bits"),
        )
    )
    return scored.select(
        "doc_id",
        "n_trigrams",
        qround(F.col("bits") / F.col("n_trigrams").cast("double"), 6).alias(
            "bits_per_trigram"
        ),
    )


def dup_ngram_coverage(docs: DataFrame, n: int = 3, min_df: int = 10) -> DataFrame:
    """Gopher-style duplicate-n-gram coverage: per doc, the fraction
    of n-gram POSITIONS whose n-gram occurs in ≥ `min_df` distinct
    documents — the "fraction of text inside duplicated n-grams"
    repetition/boilerplate filter (companion to the cross-corpus
    `boilerplate_ngrams` candidate list, which ranks the phrases;
    this scores the documents).

    Scale design — ONE corpus scan: positional shingles keep
    multiplicity ((doc, shingle) → position count tf, one combined
    shuffle), localCheckpointed (`_ckpt_pairs`: lineage truncation is
    what lets two branches reuse one exchange — Spark does not reuse
    re-derived aggregate branches' exchanges, measured); document
    frequency is a map-side-combined groupBy(shingle) count over that
    SAME frame joined back (AQE-skew eligible — a universal
    boilerplate shingle is partial-aggregated per map task, never a
    single-task window partition); then one groupBy(doc) with a
    conditional sum.  Every count is an exact BIGINT; only the final
    coverage division is float (quantized 6 dp, mirrored in the
    oracle)."""
    toks = _tokens()
    # toks materialized as a column: inline split(text) inside the
    # transform lambda re-splits per element (O(n²) on long docs)
    sh = F.transform(
        F.sequence(F.lit(0), F.size("_t") - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("_t"), i + j + 1) for j in range(n)]
        ),
    )
    pairs = _ckpt_pairs(
        _spread_docs(docs).select("doc_id", toks.alias("_t"))
        .where(F.size("_t") >= n)
        .select("doc_id", F.explode(sh).alias("shingle"))
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = _ckpt_pairs(pairs.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")))
    with_df = pairs.join(dfs, "shingle")
    per_doc = with_df.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_ngrams"),
        F.sum(F.when(F.col("df") >= min_df, F.col("tf")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("dup_ngrams"),
    )
    return per_doc.select(
        "doc_id",
        "n_ngrams",
        "dup_ngrams",
        qround(
            F.col("dup_ngrams").cast("double") / F.col("n_ngrams").cast("double"), 6
        ).alias("dup_frac"),
    )


def remove_dup_spans(docs: DataFrame, n: int = 3, min_df: int = 10) -> DataFrame:
    """Duplicated-span REMOVAL (the transform `dup_ngram_coverage`
    only measures): rewrite each document dropping every token
    covered by at least one occurrence of a heavy n-gram (one
    appearing in ≥ `min_df` DISTINCT documents) — the
    repeated-substring scrub production pipelines run after the
    candidate analysis.

    Scale design, one corpus scan: positional n-gram starts
    ((doc, pos, shingle), multiplicity preserved) are
    localCheckpointed (`_ckpt_pairs`) so both consumers read one
    materialized frame → per-shingle distinct-doc frequency via two
    stacked map-side-combined aggregations (groupBy(shingle, doc)
    collapses occurrences, groupBy(shingle) counts docs — exact df,
    no collect_set buffering, no key-partitioned window whose
    Zipf-head shingle would serialize onto one task) → heavy shingles
    join back onto the positional frame (AQE-skew eligible) and
    explode to covered token indexes → per-doc covered set (bounded
    by doc length) joins back onto the raw text and a single indexed
    `filter` rebuilds the token array in place.  Exact integer counts
    throughout; output text is position-deterministic, so the whole
    transform hash-gates."""
    toks = _tokens()
    # project toks to a real column BEFORE the positional transform:
    # an inline split(text) referenced from element_at inside the
    # lambda re-splits the whole text per shingle element (O(n²) on
    # long docs — the _shingle_array pitfall; a 100k-token doc hangs)
    tok_base = _spread_docs(docs).select("doc_id", toks.alias("_t")).where(F.size("_t") >= n)
    starts = _ckpt_pairs(
        tok_base.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_t") - n),
                    lambda i: F.concat_ws(
                        " ",
                        *[F.element_at(F.col("_t"), i + j + 1) for j in range(n)],
                    ),
                )
            ).alias("pos", "shingle"),
        )
    )
    heavy = _ckpt_pairs(
        starts.groupBy("shingle", "doc_id")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
        .select("shingle")
    )
    covered = (
        starts.join(heavy, "shingle")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("tok_idx"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("tok_idx").alias("covered"))
    )
    # Rebuild: keep_idx = all indexes minus covered via array_except,
    # which hash-sets its RIGHT argument for atomic element types —
    # O(n + |covered|) per row.  The earlier per-token
    # array_contains(covered, i) filter was O(n·|covered|): a
    # 100k-token fully-covered doc (the boilerplate worst case this
    # operator exists for) is ~10^10 comparisons serialized on one
    # row.  array_except preserves left-operand order, and
    # sequence(0, n-1) is already distinct, so the kept tokens come
    # back in position order and the output text is byte-identical.
    # `toks` MUST be a materialized column below the join: an inlined
    # split(text) referenced from the transform lambda re-splits the
    # whole text per kept element (O(n²) — the _shingle_array
    # pitfall), turning the 100k-token stress into a hang.
    no_cover = F.array().cast("array<int>")
    keep_idx = F.array_except(
        F.sequence(F.lit(0), F.size("_toks") - 1),
        F.coalesce(F.col("covered"), no_cover),
    )
    rebuilt = (
        _spread_docs(docs).select("doc_id", toks.alias("_toks"))
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.transform(keep_idx, lambda i: F.element_at(F.col("_toks"), i + 1)),
            ).alias("text"),
            F.coalesce(F.size("covered"), F.lit(0)).cast("bigint").alias("n_removed"),
        )
    )
    return rebuilt


def vocab_growth(docs: DataFrame, n_checkpoints: int = 10) -> DataFrame:
    """Heaps-law vocabulary-growth curve: distinct-vocabulary size
    after ingesting the corpus up to each of `n_checkpoints` doc_id
    thresholds (thr_i = ⌊max_id·i/n⌋, exact integer math).

    The "is more data still adding vocabulary" curve a tokenizer /
    data-mixing pass wants.  Scale design: a naive cumulative
    COUNT(DISTINCT) over doc order is a global sort + running set —
    unbounded state.  Instead each token's FIRST occurrence doc
    (min(doc_id), one combined shuffle) makes vocabulary growth a
    pure counting problem: vocab_at(thr) = |{t : first_doc(t) ≤ thr}|.
    The n-row threshold frame broadcast-joins (nested-loop over n
    rows) against the first-occurrence frame; no global sort, no
    running state, |output| = n."""
    firsts = (
        _spread_docs(docs, light=True)
        .select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    max_id = docs.agg(F.max("doc_id").alias("max_id"))
    spark = docs.sparkSession
    thresholds = (
        spark.range(1, n_checkpoints + 1)
        .withColumnRenamed("id", "checkpoint")
        .crossJoin(F.broadcast(max_id))
        .select(
            "checkpoint",
            # exact int64 division (Spark `div` ≡ DuckDB `//`) — no
            # float quotient can truncate a threshold off by one
            F.expr(f"(max_id * checkpoint) div {n_checkpoints}")
            .cast("bigint")
            .alias("doc_id_ceiling"),
        )
    )
    vocab_at = (
        firsts.join(
            F.broadcast(thresholds),
            F.col("first_doc") <= F.col("doc_id_ceiling"),
        )
        .groupBy("checkpoint", "doc_id_ceiling")
        .agg(F.count(F.lit(1)).alias("vocab_size"))
    )
    docs_at = (
        docs.select("doc_id")
        .join(
            F.broadcast(thresholds),
            F.col("doc_id") <= F.col("doc_id_ceiling"),
        )
        .groupBy("checkpoint")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    return (
        vocab_at.join(docs_at, "checkpoint")
        .select("checkpoint", "doc_id_ceiling", "n_docs", "vocab_size")
        .orderBy("checkpoint")
    )


def doc_length_quantiles(
    docs: DataFrame, percentiles: tuple[int, ...] = (10, 50, 90, 99)
) -> DataFrame:
    """EXACT corpus length quantiles (percentile_disc semantics:
    smallest value whose CDF >= p) — the data-mixing / packing
    planner's "how long are my documents" pre-pass.

    Scale design: a naive percentile_disc sorts every row into one
    reducer — a 100 TB killer for a GLOBAL percentile.  Token counts
    live in a tiny integer domain, so count-by-value (one map-side-
    combined shuffle) + a running sum over the |distinct values|-row
    frame + one broadcast total replaces the global sort entirely;
    the unpartitioned window is bounded by the value domain, not the
    corpus.  Threshold tests run in exact integer math
    (cum * 100 >= p * total), so no float CDF can wobble the pick."""
    from pyspark.sql import Window

    counts = (
        docs.select(F.size(_tokens()).cast("bigint").alias("n_words"))
        .groupBy("n_words")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("n_words").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.withColumn("cum", F.sum("c").over(w))
    total = cum.agg(F.sum("c").alias("total"))
    picked = cum.crossJoin(F.broadcast(total)).agg(
        *[
            F.min(
                F.when(
                    F.col("cum") * 100 >= F.lit(p) * F.col("total"), F.col("n_words")
                )
            ).alias(f"p{p}_words")
            for p in percentiles
        ]
    )
    return picked


def collocations_pmi(
    docs: DataFrame, min_count: int = 3, top: int = 100
) -> DataFrame:
    """Top-`top` adjacent-bigram collocations ranked by pointwise
    mutual information: pmi = log2( p(xy) / (p(x)·p(y)) ) with
    p(xy) = c_xy/N_bigrams and p(w) = c_w/N_tokens — the standard
    collocation measure (Church & Hanks 1990).  The corpus-analysis
    complement of the surprisal LMs: surprisal scores DOCUMENTS
    against the LM, PMI scores TOKEN PAIRS against independence,
    surfacing multi-word units a tokenizer or boilerplate filter
    should treat atomically.

    `min_count` drops the low-frequency pairs whose MLE PMI is
    unboundedly noisy (the classic PMI pathology: hapax pairs
    maximize it).

    Scale — one corpus scan, no windows: bigram and unigram counts
    are map-side-combined groupBys (exact BIGINTs); unigram counts
    join onto the DISTINCT-bigram frame (vocab²-bounded, not
    per-occurrence, so Zipf heads like "the" never fan out); the two
    1-row totals broadcast; ranking is orderBy+limit →
    TakeOrderedAndProject (no single-partition window).  The only
    float ops are the fixed-order ratio chain and one log2, mirrored
    verbatim in the oracle (the bigram_surprisal log2-parity
    precedent), 6-dp HALF_UP; ties break on the token pair."""
    toks = _tokens()
    grams = F.transform(
        F.sequence(F.lit(0), F.size("_t") - 2),
        lambda i: F.struct(
            F.element_at(F.col("_t"), i + 1).alias("tok_a"),
            F.element_at(F.col("_t"), i + 2).alias("tok_b"),
        ),
    )
    pair_occ = _ckpt_pairs(
        _spread_docs(docs, light=True).select(toks.alias("_t"))
        .where(F.size("_t") >= 2)
        .select(F.explode(grams).alias("g"))
        .select("g.tok_a", "g.tok_b")
    )
    uni_occ = _ckpt_pairs(_spread_docs(docs).select(F.explode(toks).alias("tok")))
    c_xy = pair_occ.groupBy("tok_a", "tok_b").agg(F.count(F.lit(1)).alias("c_xy"))
    c_w = uni_occ.groupBy("tok").agg(F.count(F.lit(1)).alias("c_w"))
    n_tok = uni_occ.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    n_big = pair_occ.agg(F.count(F.lit(1)).cast("double").alias("_nb"))
    pmi = F.log2(
        (F.col("c_xy").cast("double") / F.col("_nb"))
        / (
            (F.col("c_a").cast("double") / F.col("_n"))
            * (F.col("c_b").cast("double") / F.col("_n"))
        )
    )
    return (
        c_xy.where(F.col("c_xy") >= min_count)
        .join(c_w.select(F.col("tok").alias("tok_a"), F.col("c_w").alias("c_a")), "tok_a")
        .join(c_w.select(F.col("tok").alias("tok_b"), F.col("c_w").alias("c_b")), "tok_b")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_big))
        .select(
            "tok_a",
            "tok_b",
            "c_xy",
            qround(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "tok_a", "tok_b")
        .limit(top)
    )


def cm_bucket(col: Column, r: int, width: int) -> Column:
    """Count-min bucket for hash row `r`: md5_prefix32('r:key') %
    width — the cross-engine mixer, shared by the batch sketch
    (countmin_token_freq) and the streaming merge twin
    (registry::streaming_countmin_merge)."""
    from ..functions.core import md5_prefix32

    return md5_prefix32(F.concat(F.lit(f"{r}:"), col)) % width


def countmin_token_freq(
    docs: DataFrame, depth: int = 4, width: int = 1024, top: int = 20
) -> DataFrame:
    """Count-min sketch over token occurrences, audited against exact
    counts: (token, true_count, cm_estimate, overestimate) for the
    `top` most frequent tokens.  cm_estimate ≥ true_count always
    (the CM guarantee: each cell only ever ADDS colliding counts),
    and the overestimate column is the collision error the sketch's
    ε = e/width bound caps at ε·N with probability 1−e^−depth.

    Unlike the HLL/quantile sketches (estimator internals are engine-
    private → rows-only checks), a count-min sketch is EXACTLY
    replayable: cells are integer sums over md5-mixed buckets
    (md5_prefix32 of 'row:token' — the cross-engine mixer), and the
    estimate is a min over `depth` cells — so the whole sketch
    hash-gates, the first sketch family member under the full gate.

    Scale: the sketch build is one map-side-combined groupBy into
    ≤ depth·width cells — CONSTANT-size state no matter the corpus
    (the reason CM sketches exist); true counts ride the same
    token-count aggregate every LM query uses; the audit join
    broadcasts the top·depth probe rows.  At 100 TB you'd keep the
    4·1024-cell frame as the mergeable per-shard sketch state."""
    occ = _ckpt_pairs(
        _spread_docs(docs, light=True).select(F.explode(_tokens()).alias("tok"))
    )
    rows = list(range(depth))
    probes = occ.select(
        "tok", *[cm_bucket(F.col("tok"), r, width).alias(f"b{r}") for r in rows]
    )
    cells = [
        probes.groupBy(F.col(f"b{r}").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit(r).alias("row"), "bucket", "c")
        for r in rows
    ]
    sketch = cells[0]
    for c in cells[1:]:
        sketch = sketch.unionAll(c)
    top_tokens = (
        occ.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), "tok")
        .limit(top)
    )
    probe_rows = top_tokens.select(
        "tok",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cm_bucket(F.col("tok"), r, width).alias("bucket"),
                    )
                    for r in rows
                ]
            )
        ).alias("p"),
    ).select("tok", "true_count", F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        sketch.join(F.broadcast(probe_rows), ["row", "bucket"])
        .groupBy("tok", "true_count")
        .agg(F.min("c").cast("bigint").alias("cm_estimate"))
        .select(
            F.col("tok").alias("token"),
            "true_count",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("true_count")).cast("bigint").alias("overestimate"),
        )
        .orderBy(F.desc("true_count"), "token")
    )


def vocab_coverage_curve(
    docs: DataFrame, sizes: tuple[int, ...] = (100, 500, 1000, 2000, 5000)
) -> DataFrame:
    """Token-coverage curve for vocabulary sizing: for each candidate
    vocab size K, the share of ALL token occurrences covered by the
    top-K tokens (count desc, token asc) — the plot a tokenizer team
    reads before fixing |vocab| (coverage vs OOV-rate trade-off;
    complements vocab_growth's Heaps-law curve, which counts types,
    not occurrence mass).

    Scale shape: one map-side-combined token count, then the global
    rank comes from the TWO-PASS bucket rank
    (functions/ranking.with_global_rank — never a SinglePartition
    sort over |vocab|), and the K cumulative sums collapse into ONE
    conditional-sum aggregate row (no |vocab|-sized cumsum window),
    unpivoted to |sizes| rows.  Exact BIGINT numerators; the one
    double division per row is quantized to 4 dp."""
    from ..functions.ranking import with_global_rank

    counts = (
        _spread_docs(docs, light=True)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    ranked = with_global_rank(
        counts.withColumn("_neg", -F.col("n")), "_neg", "token", rank_col="rk"
    )
    one = ranked.agg(
        F.sum("n").cast("bigint").alias("tot"),
        *[
            F.sum(F.when(F.col("rk") <= k, F.col("n")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias(f"_c{k}")
            for k in sizes
        ],
    )
    curve = one.select(
        "tot",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("bigint").alias("vocab_size"),
                        F.col(f"_c{k}").alias("covered_tokens"),
                    )
                    for k in sizes
                ]
            )
        ).alias("p"),
    )
    return curve.select(
        F.col("p.vocab_size").alias("vocab_size"),
        F.col("p.covered_tokens").alias("covered_tokens"),
        F.col("tot").alias("total_tokens"),
        qround(
            F.col("p.covered_tokens").cast("double")
            / F.col("tot").cast("double"),
            4,
        ).alias("coverage"),
    ).orderBy("vocab_size")
