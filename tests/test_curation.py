"""Curation operators: deterministic split, mixture weights,
boilerplate detection, PII redaction.

The PII tests run the SAME pattern strings through Spark (Java
regex) and DuckDB (RE2) on synthetic PII-bearing rows — the gated
corpus carries no PII, so cross-engine agreement here is the real
correctness evidence for the operator."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.operators.curation import (
    PII_PATTERNS,
    boilerplate_ngrams,
    lang_mixture_weights,
    pii_redact,
    train_eval_split,
)
from analysisofuserbehavior_spark.sources import load_table


PII_ROWS = [
    (1, "contact me at alice.smith+spam@example.co.uk for details"),
    (2, "server at 192.168.0.1 and 10.0.0.255 went down"),
    (3, "card 4111 1111 1111 1111 or 4111-1111-1111-1111 charged"),
    (4, "call +1 555 123 4567 or 44 020 7946 0958 now"),
    (5, "clean text with no sensitive content at all"),
    (6, "mixed: bob@test.io on 127.0.0.1 card 5500 0000 0000 0004"),
    (7, "not-an-ip 1234.5.6.7890 stays, a@b.cd goes"),
]


def test_pii_redact_matches_duckdb_on_synthetic_rows(spark):
    docs = spark.createDataFrame(PII_ROWS, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict() for r in pii_redact(docs).collect()
    }

    clean = "text"
    for _, pat, token in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{token}', 'g')"
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", PII_ROWS)
    want = con.execute(
        f"SELECT doc_id, {clean} AS clean_text, {counts} FROM t"
    ).fetchdf()

    for row in want.itertuples(index=False):
        g = got[row.doc_id]
        assert g["clean_text"] == row.clean_text, (row.doc_id, g["clean_text"])
        for name, _, _ in PII_PATTERNS:
            assert g[f"n_{name}"] == getattr(row, f"n_{name}"), (row.doc_id, name)


def test_pii_redact_scrubs_every_pattern_kind(spark):
    docs = spark.createDataFrame(PII_ROWS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert "<EMAIL>" in out[1]["clean_text"]
    assert out[2]["clean_text"].count("<IP>") == 2
    assert out[3]["clean_text"].count("<CARD>") == 2
    assert "<PHONE>" in out[4]["clean_text"]
    assert out[5]["clean_text"] == PII_ROWS[4][1]
    assert out[6]["n_email"] == 1 and out[6]["n_ipv4"] == 1 and out[6]["n_card"] == 1


def test_split_is_deterministic_and_growth_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    full = {r["doc_id"]: r["split"] for r in train_eval_split(docs).collect()}
    # same corpus, second run → identical assignment (no rand())
    again = {r["doc_id"]: r["split"] for r in train_eval_split(docs).collect()}
    assert full == again
    # a SUBSET of the corpus keeps every shared doc's assignment —
    # the growth-stability property ORDER BY rand() sampling lacks
    sub = {
        r["doc_id"]: r["split"]
        for r in train_eval_split(docs.where(F.col("doc_id") % 3 == 0)).collect()
    }
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}
    # both splits nonempty and eval share is loosely ~10 %
    n_eval = sum(1 for v in full.values() if v == "eval")
    assert 0 < n_eval < len(full) * 0.25


def test_lang_mixture_weights_flatten_to_uniform(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = lang_mixture_weights(docs).collect()
    assert len(rows) >= 2
    # share sums to ~1, and share * weight is ~uniform across langs
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 0.01
    flattened = [r["token_share"] * r["uniform_weight"] for r in rows]
    target = 1.0 / len(rows)
    assert all(abs(x - target) < 0.01 for x in flattened), flattened


def test_boilerplate_df_counts_documents_not_occurrences(spark):
    rows = [
        # "x y" appears 3 times inside doc 1 but only 2 docs carry it
        (1, "x y x y x y"),
        (2, "x y z"),
        (3, "z z z"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["shingle"]: r["df"] for r in boilerplate_ngrams(docs, n=2, min_df=1).collect()}
    assert out["x y"] == 2
    assert out["z z"] == 1


def test_boilerplate_threshold_and_order(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = boilerplate_ngrams(docs, n=2, min_df=2, top=50).collect()
    assert 0 < len(rows) <= 50
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    assert all(d >= 2 for d in dfs)


def test_rolling_range_frame_is_gap_aware(spark):
    """A missing calendar day must NOT let the frame reach back an
    extra row — RANGE semantics, not ROWS."""
    import datetime as dt

    rows = [
        # 10 clicks on Jan 1, 20 on Jan 2, gap, 40 on Jan 9
        *[(i, dt.datetime(2024, 1, 1, 1, i % 60), 1, "click", 0.0, "{}") for i in range(10)],
        *[(100 + i, dt.datetime(2024, 1, 2, 1, i % 60), 1, "click", 0.0, "{}") for i in range(20)],
        *[(200 + i, dt.datetime(2024, 1, 9, 1, i % 60), 1, "click", 0.0, "{}") for i in range(40)],
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        from analysisofuserbehavior_spark.registry import QUERIES

        out = {r["day"]: r for r in QUERIES["rolling_7d_clicks"](spark, d).collect()}
    assert out["2024-01-02"]["clicks_7d"] == 30  # Jan 1 in range
    # Jan 9's 7-day frame is Jan 3..9: the gap excludes Jan 1+2
    assert out["2024-01-09"]["clicks_7d"] == 40
    assert out["2024-01-09"]["avg_7d"] == 40.0


def test_fuzzy_pairs_deletion_join_matches_bruteforce(spark):
    """The corpus vocab has no distance-1 pairs (gate row is 0=0), so
    the real evidence is synthetic: the deletion-neighborhood join
    must find exactly the brute-force levenshtein<=1 pairs across
    substitution, insertion, deletion, and prefix/suffix edits."""
    import itertools

    words = [
        "cat", "cut", "cart", "at", "cats", "dog", "dig", "dodge",
        "spark", "spank", "sparks", "park", "a", "b", "ab",
    ]
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    docs.createOrReplaceTempView("_fz_docs")
    import os, tempfile

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (x, y) if x < y else (y, x)
        for x, y in itertools.combinations(words, 2)
        if lev(x, y) <= 1
    }
    with tempfile.TemporaryDirectory() as td:
        docs.write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))
        from analysisofuserbehavior_spark.registry import QUERIES

        got = {
            (r["tok_a"], r["tok_b"])
            for r in QUERIES["vocab_fuzzy_pairs"](spark, td).collect()
        }
    assert got == want, (sorted(got - want), sorted(want - got))
    assert ("cat", "cut") in got  # substitution met via shared deletion
    assert ("cat", "cats") in got  # insertion met via identity key


from hypothesis import HealthCheck, given, settings, strategies as st

_short_words = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=4),
    min_size=1,
    max_size=8,
    unique=True,
)


@given(_short_words)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzzy_pairs_property_vs_bruteforce(spark, words):
    """Deletion-neighborhood join ≡ brute-force levenshtein≤1 on
    arbitrary dense short vocabularies (the adversarial regime:
    2-letter alphabet maximizes near-collisions)."""
    import itertools
    import os
    import tempfile

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = {
        (x, y) if x < y else (y, x)
        for x, y in itertools.combinations(words, 2)
        if lev(x, y) <= 1
    }
    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id long, text string")
    with tempfile.TemporaryDirectory() as td:
        docs.write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))
        from analysisofuserbehavior_spark.registry import QUERIES

        got = {
            (r["tok_a"], r["tok_b"])
            for r in QUERIES["vocab_fuzzy_pairs"](spark, td).collect()
        }
    assert got == want, (sorted(got - want), sorted(want - got))


def test_decayed_attribution_weights_recent_touches_more(spark):
    """Two clicks, one 1 min and one 29 min before the purchase:
    weights 2^6 vs 2^1 → shares 64/66 and 2/66 of the value."""
    import datetime as dt
    import os, tempfile

    t = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        (1, t - dt.timedelta(minutes=1), 7, "click", 0.0, '{"k": 1}'),
        (2, t - dt.timedelta(minutes=29), 7, "click", 0.0, '{"k": 2}'),
        (3, t, 7, "purchase", 66.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        ev.write.mode("overwrite").parquet(os.path.join(td, "events.parquet"))
        from analysisofuserbehavior_spark.registry import QUERIES

        got = {
            r["ad_id"]: r["credit"]
            for r in QUERIES["attribution_decayed"](spark, td).collect()
        }
    # 6600 cents: ad1 w=64, ad2 w=2 → 6400 and 200 cents
    assert got == {1: 64.0, 2: 2.0}, got


def test_quality_weighted_sample_proportional_and_extremes(spark):
    """keep ⇔ md5-uniform < quality: quality 0 never keeps, quality
    1.0 ALWAYS keeps (the 5-hex-digit threshold 0x10000 — the edge
    the fixed-width compare exists for), and over many docs the keep
    rate tracks mean quality."""
    from pyspark.sql import functions as F

    from analysisofuserbehavior_spark.operators.curation import quality_weighted_sample

    # quality 1.0 needs >= 100 tokens AND stopword ratio >= 0.1
    perfect = ("the and of a to in is on for with " * 12).strip()
    junk = "zzz"  # 1 token, no stopwords → quality 0.6*0.01 + 0 ≈ 0.01
    docs = spark.createDataFrame(
        [(i, perfect) for i in range(50)] + [(1000 + i, junk) for i in range(50)],
        "doc_id long, text string",
    )
    got = quality_weighted_sample(docs)
    by_q = {
        r["quality_score"]: r
        for r in got.groupBy("quality_score")
        .agg(F.avg(F.col("kept").cast("int")).alias("rate"))
        .collect()
    }
    assert by_q[1.0].rate == 1.0          # every perfect doc kept
    assert by_q[0.01].rate <= 0.1         # junk kept ~1% of the time


def test_leakage_safe_split_boundary_cluster_and_straddle(spark):
    """Adversarial cases for the leak the operator exists to close:
    (1) a cluster whose members' SOLO buckets land on OPPOSITE sides
    of the threshold — the exact straddle train_eval_split produces —
    must be assigned as a unit, to the side of its cluster-id (min
    doc_id) bucket; (2) a cluster whose id bucket equals the
    threshold EXACTLY pins the strict-less boundary semantics
    (bucket < threshold → eval, so '1999' itself is train).
    doc_id 0 hashes below the default 0x1999 threshold (eval), 1
    above (train), 110422 to exactly '1999' (precomputed md5s)."""
    from analysisofuserbehavior_spark.operators.curation import (
        leakage_safe_split,
        train_eval_split,
    )

    ids = [0, 1, 110422, 110423]
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in ids], "doc_id long, text string"
    )
    solo = {r.doc_id: r.split for r in train_eval_split(docs).collect()}
    # precondition: the pair (0, 1) genuinely straddles solo
    assert solo[0] == "eval" and solo[1] == "train"
    pairs = spark.createDataFrame(
        [(0, 1), (110422, 110423)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r for r in leakage_safe_split(docs, pairs).collect()}
    # (1) straddling cluster unified to the min-id (=0) verdict: eval
    assert got[0].split == got[1].split == "eval"
    assert got[0].cluster_id == got[1].cluster_id == 0
    # (2) exact-boundary cluster id: bucket('v1:110422') == '1999'
    # is NOT < '1999' → the whole cluster is train
    assert got[110422].bucket == "1999"
    assert got[110422].split == got[110423].split == "train"


def test_leakage_safe_split_keeps_clusters_together(spark):
    """No near-dup pair may straddle the train/eval boundary — the
    leak `train_eval_split` can't rule out.  A chained cluster
    (a~b, b~c) must land on ONE side even when its members' solo
    hashes disagree; docs with no near-dup split exactly like
    train_eval_split."""
    from analysisofuserbehavior_spark.operators.curation import (
        leakage_safe_split,
        train_eval_split,
    )

    docs = spark.createDataFrame(
        [(i, f"unique text {i}") for i in range(20)],
        "doc_id long, text string",
    )
    # chain 1~2, 2~3 plus the isolated pair 10~11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    # threshold 8000 ≈ 50% so both sides are populated
    got = {r.doc_id: r for r in leakage_safe_split(docs, pairs, "8000").collect()}
    assert len(got) == 20
    assert got[1].split == got[2].split == got[3].split
    assert got[1].cluster_id == got[2].cluster_id == got[3].cluster_id == 1
    assert got[10].split == got[11].split
    solo = {r.doc_id: r.split for r in train_eval_split(docs, "8000").collect()}
    for d in set(range(20)) - {1, 2, 3, 10, 11}:
        assert got[d].split == solo[d]  # singletons: identical membership
    splits = {r.split for r in got.values()}
    assert splits == {"train", "eval"}  # both sides actually exercised


def test_mixture_temperature_weights_flatten_toward_uniform(spark):
    """α-sampling semantics: temperature shares preserve the language
    ORDER but compress the spread — the dominant language's share
    shrinks (weight < 1), rare languages are upsampled (weight > 1),
    and q sums to 1.  α=1 reproduces the natural mixture exactly."""
    from analysisofuserbehavior_spark.operators.curation import (
        mixture_temperature_weights,
    )

    rows = (
        [(i, "en", "w " * 99 + "w") for i in range(90)]
        + [(100 + i, "fr", "w " * 99 + "w") for i in range(9)]
        + [(200, "sw", "w " * 99 + "w")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["lang"]: r for r in mixture_temperature_weights(docs).collect()}
    assert got["en"]["token_share"] == 0.9 and got["sw"]["token_share"] == 0.01
    assert got["en"]["temp_weight"] < 1.0 < got["sw"]["temp_weight"]
    # order preserved, spread compressed
    assert got["en"]["temp_share"] > got["fr"]["temp_share"] > got["sw"]["temp_share"]
    assert got["en"]["temp_share"] < 0.9 and got["sw"]["temp_share"] > 0.01
    assert abs(sum(r["temp_share"] for r in got.values()) - 1.0) < 1e-3
    nat = {r["lang"]: r for r in mixture_temperature_weights(docs, alpha=1.0).collect()}
    for lang in got:
        assert nat[lang]["temp_share"] == nat[lang]["token_share"]
        assert nat[lang]["temp_weight"] == 1.0


def test_dsir_select_quartiles_and_target_enrichment(spark, sf_dir):
    """DSIR selection: ntile(4) is balanced, selected == top quartile,
    and the quality-gated target docs are ENRICHED among the selected
    (the whole point of importance resampling — raw docs that look
    target-like score high; target docs themselves must too)."""
    from analysisofuserbehavior_spark.operators.curation import dsir_select

    docs = load_table(spark, sf_dir, "documents")
    out = dsir_select(docs).collect()
    n = len(out)
    from collections import Counter

    quartiles = Counter(r["quartile"] for r in out)
    assert set(quartiles) == {1, 2, 3, 4}
    assert max(quartiles.values()) - min(quartiles.values()) <= 1
    for r in out:
        assert r["selected"] == (r["quartile"] == 4)
    t_mean = sum(r["quartile"] for r in out if r["is_target"]) / max(
        1, sum(r["is_target"] for r in out)
    )
    r_mean = sum(r["quartile"] for r in out if not r["is_target"]) / max(
        1, sum(not r["is_target"] for r in out)
    )
    assert t_mean > r_mean, (t_mean, r_mean)
    assert n == docs.count()


def test_dsir_select_planted_target_vocabulary(spark):
    """A planted corpus where target docs share a private vocabulary:
    every raw doc written in the target vocabulary must be selected,
    every raw doc in the off-vocabulary must not.  Quality gate:
    >=100 tokens with >=10% stopwords -> quality 1.0 (target); short
    off-vocab docs stay below 0.8."""
    from analysisofuserbehavior_spark.operators.curation import dsir_select

    target_text = ("zq " * 8 + "the ") * 10 + "zq"  # 91 tokens... make >=100
    target_text = ("zq " * 8 + "the ") * 12  # 108 tokens, 12 stopwords
    rows = [(i, target_text.strip()) for i in range(40)]
    # raw docs in the target vocabulary but too short to pass the gate
    rows += [(100 + i, "zq zq the zq zq") for i in range(30)]
    # raw docs in a disjoint vocabulary
    rows += [(200 + i, "xk xk xk yv yv") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dsir_select(docs).collect()}
    lookalike = [out[100 + i] for i in range(30)]
    offvocab = [out[200 + i] for i in range(30)]
    assert all(not r["is_target"] for r in lookalike + offvocab)
    # target-vocabulary raw docs outrank off-vocabulary ones
    assert min(r["logw_bits"] for r in lookalike) > max(
        r["logw_bits"] for r in offvocab
    )
    assert all(not r["selected"] for r in offvocab)


def test_train_eval_token_shift_plants_eval_only_token(spark):
    """A token that appears ONLY in eval docs must surface with a
    positive shift; one only in train with a negative shift.  Split
    membership is the md5 hash — doc ids are picked on the Python
    side with the same formula so the plant is deterministic."""
    import hashlib

    from analysisofuserbehavior_spark.operators.curation import (
        train_eval_token_shift,
    )

    def is_eval(i: int) -> bool:
        return hashlib.md5(f"v1:{i}".encode()).hexdigest()[:4] < "1999"

    eval_ids = [i for i in range(2000) if is_eval(i)][:12]
    train_ids = [i for i in range(2000) if not is_eval(i)][:48]
    base = "the quick brown fox jumps over the lazy dog"
    rows = [(i, base + " evalmarker") for i in eval_ids]
    rows += [(i, base + " trainmarker") for i in train_ids]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["token"]: r for r in train_eval_token_shift(docs, top=50).collect()}
    assert out["evalmarker"]["c_train"] == 0
    assert out["evalmarker"]["c_eval"] == len(eval_ids)
    assert out["evalmarker"]["shift_bits"] > 0
    assert out["trainmarker"]["c_eval"] == 0
    assert out["trainmarker"]["shift_bits"] < 0
    # eval-side KL contribution ranks the planted eval token first
    top = max(out.values(), key=lambda r: abs(r["kl_term"]))
    assert top["token"] == "evalmarker"


def test_mixture_resample_upsamples_rare_and_downsamples_dominant(spark):
    """On a skewed corpus (90% en / 1% sw), α=0.25 temperature weights
    give sw a weight well above 1 and en below 1 — the resample must
    replicate every sw doc floor(w) or floor(w)+1 times and drop a
    fraction of en docs, with expected counts matching the weight."""
    from analysisofuserbehavior_spark.operators.curation import (
        mixture_resample,
        mixture_temperature_weights,
    )

    rows = (
        [(i, "en", "w " * 99 + "w") for i in range(900)]
        + [(1000 + i, "fr", "w " * 99 + "w") for i in range(90)]
        + [(2000 + i, "sw", "w " * 99 + "w") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w = {r["lang"]: r["temp_weight"] for r in mixture_temperature_weights(docs).collect()}
    assert w["sw"] > 1.5 and w["en"] < 1.0
    out = mixture_resample(docs).collect()
    from collections import Counter

    per_lang = Counter(r["lang"] for r in out)
    # every emitted copy carries its language's reported weight
    assert all(abs(r["weight"] - w[r["lang"]]) < 1e-9 for r in out)
    # sw upsampled: between floor(w) and ceil(w) copies per doc
    per_doc = Counter(r["doc_id"] for r in out if r["lang"] == "sw")
    assert len(per_doc) == 10
    import math

    lo, hi = math.floor(w["sw"]), math.floor(w["sw"]) + 1
    assert all(c in (lo, hi) for c in per_doc.values())
    # en downsampled: strictly fewer copies than docs, none duplicated
    assert per_lang["en"] < 900
    assert max(Counter(r["doc_id"] for r in out if r["lang"] == "en").values()) == 1
    # expected mass within 10% of weight * n_docs for the big stratum
    assert abs(per_lang["en"] - 900 * w["en"]) < 0.1 * 900
