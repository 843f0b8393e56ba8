"""Sequence-packing invariants: the two-pass prefix sum must equal
the single-stream definition exactly, for any bucketing."""

from __future__ import annotations

from analysisofuserbehavior_spark.operators.packing import bin_manifest, pack_sequences


def test_offsets_are_contiguous_prefix_sums(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(pack_sequences(docs).collect(), key=lambda r: r["doc_id"])
    assert rows[0]["offset"] == 0
    for a, b in zip(rows, rows[1:]):
        assert b["offset"] == a["offset"] + a["n_tokens"]
    assert all(r["first_bin"] <= r["last_bin"] for r in rows)


def test_bucketing_is_invisible(spark, sf_dir):
    """n_buckets is a physical knob only — 1 bucket (pure sequential)
    and 32 buckets produce identical packings."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    one = {tuple(r) for r in pack_sequences(docs, n_buckets=1).collect()}
    many = {tuple(r) for r in pack_sequences(docs, n_buckets=32).collect()}
    assert one == many


def test_manifest_conserves_tokens_and_respects_budget(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed = pack_sequences(docs, budget=512)
    man = bin_manifest(packed, budget=512).collect()
    total_tokens = sum(r["n_tokens"] for r in packed.collect())
    assert sum(r["tokens_used"] for r in man) == total_tokens
    full_bins = [r for r in man if r["bin_id"] < max(m["bin_id"] for m in man)]
    assert all(r["tokens_used"] == 512 for r in full_bins)  # stream chunking fills
    assert all(r["tokens_used"] <= 512 for r in man)


def test_chunk_documents_step_rule_closed_form(spark):
    """Pins the windowing rule exactly: starts at 0, step, … < n;
    each chunk is ≤ chunk_tokens tokens; consecutive chunks overlap
    by chunk-step; short docs yield one whole-doc chunk; empty-ish
    docs (single empty token after split) still produce one chunk."""
    from analysisofuserbehavior_spark.operators.packing import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(toks)),   # n=10: starts 0,4,8 (chunk=5, step=4)
            (2, "a b"),            # n=2 < chunk: one chunk
            (3, ""),               # splits to [""]: n=1, one chunk of ""
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (
            (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
            for r in chunk_documents(docs, chunk_tokens=5, step=4).collect()
        )
    )
    assert got == [
        (1, 0, "t0 t1 t2 t3 t4", 5),
        (1, 1, "t4 t5 t6 t7 t8", 5),   # overlap of chunk-step = 1 token
        (1, 2, "t8 t9", 2),            # trailing short window
        (2, 0, "a b", 2),
        (3, 0, "", 1),
    ]


def test_chunk_documents_stride_alias_deprecated(spark):
    """VERDICT r07 #6: `stride=` must keep working with its OLD
    meaning (the step between starts) and warn — output identical to
    `step=`, so the rename is hash-neutral."""
    import warnings

    from analysisofuserbehavior_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    want = sorted(map(tuple, chunk_documents(docs, chunk_tokens=5, step=4).collect()))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = sorted(
            map(tuple, chunk_documents(docs, chunk_tokens=5, stride=4).collect())
        )
    assert got == want
    assert any(issubclass(x.category, DeprecationWarning) for x in w)


def test_chunk_documents_coverage_property(spark):
    """Property (hypothesis): for any doc and any (chunk, step)
    with step <= chunk, every token position is covered by at least
    one chunk, chunk k starts exactly at k*step, and concatenating
    each chunk's tokens reproduces the corresponding slice."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from analysisofuserbehavior_spark.operators.packing import chunk_documents

    @given(
        n=st.integers(min_value=1, max_value=40),
        chunk=st.integers(min_value=1, max_value=8),
        step_off=st.integers(min_value=0, max_value=7),
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    def check(n, chunk, step_off):
        step = max(1, chunk - step_off)
        toks = [f"t{i}" for i in range(n)]
        docs = spark.createDataFrame(
            [(1, " ".join(toks))], "doc_id long, text string"
        )
        rows = chunk_documents(docs, chunk_tokens=chunk, step=step).collect()
        covered = set()
        for r in rows:
            start = r["chunk_idx"] * step
            expect = toks[start : start + chunk]
            assert r["chunk_text"] == " ".join(expect)
            assert r["n_tokens"] == len(expect)
            covered.update(range(start, start + len(expect)))
        assert covered == set(range(n))

    check()


def test_corpus_pipeline_e2e_survivor_propagation(spark):
    """The composition's load-bearing semantics, unreachable by the
    per-stage gates: (a) gate-rejected docs never reach chunking;
    (b) only the canonical keeper of a normalized-dup group survives;
    (c) heavy-shingle df for the scrub stage is counted over the KEPT
    set — boilerplate whose copies dedup removed falls below min_df
    and is NOT scrubbed; (d) offsets pack the chunk stream in
    (doc_id, chunk_idx) order with no gaps."""
    from analysisofuserbehavior_spark.operators.corpus_pipeline import (
        corpus_pipeline_e2e,
    )

    # gate-passing shape: 100 mostly-unique tokens (quality = 0.60 via
    # the length term alone), zero repeated trigrams, globally-unique
    # or uniformly-shared bigrams (bits_per_bigram ~ 0 — no salad)
    good = " ".join(f"a{i}" for i in range(100))
    rows = [(1, good)]                    # keeper (min id of the pair)
    rows += [(2, good.upper())]           # normalized dup — dedup drops
    rows += [(3, "tiny")]                 # gate-rejected: short
    # 12 gate-passing docs opening with one shared 3-gram: raw df=12
    # >= 10, but docs 20..25 are identical (one keeper), so df over
    # the KEPT set = 1 + 6 = 7 < 10 and the shingle must NOT scrub
    shared = "alpha beta gamma"
    dup_body = " ".join(f"p{i}" for i in range(97))
    for k in range(6):
        rows.append((20 + k, f"{shared} {dup_body}"))
    for k in range(6):
        rows.append((40 + k, f"{shared} " + " ".join(f"q{k}x{i}" for i in range(97))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus_pipeline_e2e(docs, chunk_tokens=16, step=16, budget=32)
    got = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    ids = {d for d, _ in got}
    assert 3 not in ids                       # (a) gate rejection
    assert 2 not in ids and 1 in ids          # (b) canonical keeper
    assert 20 in ids and all(21 + k not in ids for k in range(5))
    assert all(40 + k in ids for k in range(6))
    # (c) nothing scrubbed: every surviving doc keeps ALL its tokens
    n_tok = {d: len(t.split(" ")) for d, t in rows}
    for d in ids:
        assert sum(r["n_tokens"] for (dd, _), r in got.items() if dd == d) == n_tok[d]
    # (d) contiguous offsets over (doc_id, chunk_idx) order
    ordered = [got[k] for k in sorted(got)]
    run = 0
    for r in ordered:
        assert r["offset"] == run, (r, run)
        run += r["n_tokens"]


def test_corpus_pipeline_e2e_cid_overflow_guard_fires(spark):
    """A doc whose chunk_idx would overflow the cid encoding must
    fail LOUDLY (assert_true in the projection), never silently alias
    another doc's chunks."""
    import pytest

    from analysisofuserbehavior_spark.operators.corpus_pipeline import (
        corpus_pipeline_e2e,
    )

    good = " ".join(f"a{i}" for i in range(100))
    docs = spark.createDataFrame([(1, good)], "doc_id long, text string")
    with pytest.raises(Exception, match="chunk_idx overflows"):
        corpus_pipeline_e2e(docs, chunk_tokens=16, step=16, _cid_base=2).collect()
    # normal encoding unaffected
    assert corpus_pipeline_e2e(docs, chunk_tokens=16, step=16).count() == 7
