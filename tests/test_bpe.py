"""BPE merge learning / encoding: exact parity with a straight-line
Sennrich reference implementation, greedy-overlap semantics, early
stop, and encode-vs-learn consistency."""

from __future__ import annotations

from collections import Counter

from analysisofuserbehavior_spark.operators.bpe import (
    bpe_encode_stats,
    bpe_learn_merges,
)


def _py_bpe(texts, k):
    """Reference BPE learner (Sennrich alg. 1): pair counts over the
    frequency-weighted word vocab, greedy left-to-right merge."""
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    for rank in range(1, k + 1):
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += vocab[w]
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, l + r, n))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words, vocab


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_bpe_matches_reference_on_classic_corpus(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wider wide wide low",
    ]
    want, _, _ = _py_bpe(texts, 6)
    got = [tuple(r) for r in bpe_learn_merges(spark, _docs(spark, texts), 6).collect()]
    assert got == want


def test_bpe_greedy_left_to_right_overlap(spark):
    # 'aaaa' under merge (a,a): greedy L2R yields [aa, aa] (2 pairs
    # counted pre-merge: positions 0-1, 1-2, 2-3 → count 3), and the
    # second merge (aa,aa) fuses the whole word.  A naive regex
    # replace with shared separators would miscount or misfuse.
    texts = ["aaaa aaaa aa"]
    want, words, _ = _py_bpe(texts, 2)
    got = [tuple(r) for r in bpe_learn_merges(spark, _docs(spark, texts), 2).collect()]
    assert got == want
    assert want[0][1:4] == ("a", "a", "aa")
    assert words["aaaa"] == ["aaaa"]  # reference sanity


def test_bpe_early_stop_when_pairs_exhausted(spark):
    # single-char words have no adjacent pairs → zero merges
    assert bpe_learn_merges(spark, _docs(spark, ["a b c", "b c a"]), 5).count() == 0
    # two-char vocab exhausts after at most a few merges
    got = bpe_learn_merges(spark, _docs(spark, ["ab ab ab"]), 10).collect()
    assert len(got) == 1  # (a,b) fuses everything; no pairs remain
    assert (got[0]["left_sym"], got[0]["right_sym"], got[0]["pair_count"]) == (
        "a",
        "b",
        3,
    )


def test_bpe_encode_consistent_with_learning_state(spark):
    # encoding the TRAINING corpus with the learned table must land on
    # exactly the learner's final symbol state: total tokens ==
    # Σ_w cnt(w) · |final_syms(w)| (the docstring's rank-order-apply
    # equivalence claim, verified end-to-end)
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wider wide wide low",
    ]
    _, words, vocab = _py_bpe(texts, 6)
    want_tokens = sum(vocab[w] * len(s) for w, s in words.items())
    want_words = sum(vocab.values())
    want_chars = sum(vocab[w] * len(w) for w in vocab)
    row = bpe_encode_stats(spark, _docs(spark, texts), 6).collect()[0]
    assert row["total_tokens"] == want_tokens
    assert row["total_words"] == want_words
    assert row["total_chars"] == want_chars
    assert row["n_docs"] == len(texts)
    # fertility: tokens/word shrinks below the char baseline
    assert row["tokens_per_word"] < want_chars / want_words


def test_bpe_empty_and_degenerate_inputs(spark):
    schema = "doc_id long, text string"
    empty = spark.createDataFrame([], schema)
    assert bpe_learn_merges(spark, empty, 4).count() == 0
    row = bpe_encode_stats(spark, empty, 4).collect()[0]
    assert row["n_docs"] == 0
    assert row["chars_per_token"] is None
    # all-empty texts → zero words, no crash, NULL ratios
    blank = _docs(spark, ["", " ", "  "])
    row2 = bpe_encode_stats(spark, blank, 4).collect()[0]
    assert row2["total_words"] == 0 and row2["total_tokens"] == 0
    assert row2["tokens_per_word"] is None


def test_bpe_words_with_line_terminators(spark):
    """ADVICE r07: words split on ' ' can still carry \\n/\\r; without
    DOTALL the sentinel wrap left those chars unwrapped, desyncing the
    symbol model from the reference.  Parity must hold now."""
    texts = ["ab\ncd ab\ncd ef", "ab\ncd x\ry x\ry"]
    want, words, vocab = _py_bpe(texts, 4)
    got = [tuple(r) for r in bpe_learn_merges(spark, _docs(spark, texts), 4).collect()]
    assert got == want
    want_tokens = sum(vocab[w] * len(s) for w, s in words.items())
    row = bpe_encode_stats(spark, _docs(spark, texts), 4).collect()[0]
    assert row["total_tokens"] == want_tokens
    assert row["total_chars"] == sum(vocab[w] * len(w) for w in vocab)


def test_min_count_prunes_vocab_tail(spark):
    # hapax words can't outvote the head pairs; with min_count=2 they
    # leave the working set entirely and merges match a corpus that
    # never contained them
    common = "ababab ababab ababab"
    hapax = "zq xw vk"  # unique, no pair mass that matters
    with_tail = _docs(spark, [common, hapax])
    without = _docs(spark, [common])
    a = [tuple(r) for r in bpe_learn_merges(spark, with_tail, 3, min_count=2).collect()]
    b = [tuple(r) for r in bpe_learn_merges(spark, without, 3).collect()]
    assert a == b
    # and without the guard the hapax chars DO appear in pair counts
    # (sanity that the knob changes the working set, not just output)
    full = bpe_learn_merges(spark, with_tail, 3)
    assert [tuple(r) for r in full.collect()] == b  # head still wins here
