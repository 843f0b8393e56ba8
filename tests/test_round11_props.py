"""Property-based invariants for the round-11 operators (hypothesis).

Each distributed form is checked against a brute-force Python
reference over randomized inputs — the test_sessionize_props
discipline: few, small examples (one Spark job each; input-shape
coverage, not volume).

* mixture_resample vs an exact Python replay of the integer copy rule
  (floor(w4/10000) copies + md5-decided fractional copy);
* dsir_select's quartile partition (balanced ntile, selected == q4)
  and per-token-score monotonicity of the quartile assignment;
* train_eval_token_shift's counts vs a Python split replay, and the
  zero-cross-row-float-sum claim via doc-order invariance;
* hybrid_rrf_topk vs a full brute-force Python RRF on tiny corpora.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings, strategies as st

from analysisofuserbehavior_spark.operators.curation import (
    dsir_select,
    mixture_resample,
    mixture_temperature_weights,
    train_eval_token_shift,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["the", "row", "data", "zq", "xk", "sort", "of", "query"]


@st.composite
def corpora(draw):
    """Small multi-language corpora with skewed sizes and lengths."""
    langs = draw(
        st.lists(
            st.sampled_from(["en", "fr", "sw", "de"]),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    rows = []
    did = 0
    for lang in langs:
        n_docs = draw(st.integers(min_value=1, max_value=12))
        for _ in range(n_docs):
            n_tok = draw(st.integers(min_value=1, max_value=30))
            toks = [
                _WORDS[draw(st.integers(min_value=0, max_value=len(_WORDS) - 1))]
                for _ in range(n_tok)
            ]
            rows.append((did, lang, " ".join(toks)))
            did += 1
    return rows


def _bucket(salt: str, doc_id: int) -> str:
    return hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()[:4]


@given(corpora())
@settings(**_SETTINGS)
def test_mixture_resample_matches_python_copy_rule(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w = {
        r["lang"]: r["temp_weight"]
        for r in mixture_temperature_weights(docs).collect()
    }
    out = {}
    for r in mixture_resample(docs).collect():
        out.setdefault(r["doc_id"], []).append(r)
    for doc_id, lang, _ in rows:
        w4 = math.floor(w[lang] * 10000 + 0.5)
        n = w4 // 10000
        thresh = format((w4 % 10000) * 65536 // 10000, "04x")
        if _bucket("mix1", doc_id) < thresh:
            n += 1
        got = out.get(doc_id, [])
        assert len(got) == n, (doc_id, lang, w4, n, len(got))
        assert sorted(r["copy_idx"] for r in got) == list(range(1, n + 1))
        assert all(abs(r["weight"] - w4 / 10000.0) < 1e-12 for r in got)


@given(corpora())
@settings(**_SETTINGS)
def test_dsir_quartiles_partition_and_order(spark, rows):
    docs = spark.createDataFrame(
        [(i, t) for i, _, t in rows], "doc_id long, text string"
    )
    out = sorted(dsir_select(docs).collect(), key=lambda r: r["doc_id"])
    n = len(out)
    assert n == len(rows)
    from collections import Counter

    quartiles = Counter(r["quartile"] for r in out)
    # exact ntile balance: sizes differ by at most one
    assert max(quartiles.values()) - min(quartiles.values()) <= 1
    assert all(r["selected"] == (r["quartile"] == 4) for r in out)
    # quartile respects the per-token score order (ties broken by id,
    # so compare on the quantized per-token key the operator uses)
    keyed = sorted(
        out,
        key=lambda r: (
            math.floor(r["logw_bits"] / r["n_tokens"] * 1e6 + 0.5)
            if r["n_tokens"]
            else 0,
            r["doc_id"],
        ),
    )
    qs = [r["quartile"] for r in keyed]
    assert qs == sorted(qs)


@given(corpora())
@settings(**_SETTINGS)
def test_token_shift_counts_match_python_split(spark, rows):
    docs = spark.createDataFrame(
        [(i, t) for i, _, t in rows], "doc_id long, text string"
    )
    got = {
        r["token"]: (r["c_train"], r["c_eval"])
        for r in train_eval_token_shift(docs, top=1000).collect()
    }
    from collections import Counter

    c_train, c_eval = Counter(), Counter()
    for i, _, t in rows:
        tgt = c_eval if _bucket("v1", i) < "1999" else c_train
        for tok in t.split(" "):
            tgt[tok] += 1
    for tok, (ct, ce) in got.items():
        assert ct == c_train[tok] and ce == c_eval[tok], tok
    # doc-order invariance (no cross-row float sums → bit-identical)
    shuffled = list(reversed(rows))
    docs2 = spark.createDataFrame(
        [(i, t) for i, _, t in shuffled], "doc_id long, text string"
    )
    a = sorted(map(tuple, train_eval_token_shift(docs, top=30).collect()))
    b = sorted(map(tuple, train_eval_token_shift(docs2, top=30).collect()))
    assert a == b


@st.composite
def corpora_with_embeddings(draw):
    n = draw(st.integers(min_value=6, max_value=14))
    rows, vecs = [], []
    for i in range(n):
        n_tok = draw(st.integers(min_value=1, max_value=12))
        toks = [
            _WORDS[draw(st.integers(min_value=0, max_value=len(_WORDS) - 1))]
            for _ in range(n_tok)
        ]
        rows.append((i, " ".join(toks)))
        vecs.append(
            (
                i,
                [
                    float(draw(st.integers(min_value=-3, max_value=3)))
                    for _ in range(4)
                ],
            )
        )
    # non-zero vectors only (norm division)
    vecs = [(i, v if any(v) else [1.0, 0.0, 0.0, 0.0]) for i, v in vecs]
    return rows, vecs


def _q(x: float, s: int) -> float:
    return math.floor(x * 10**s + 0.5) / 10**s


@given(corpora_with_embeddings())
@settings(**_SETTINGS)
def test_hybrid_rrf_matches_bruteforce(spark, data):
    from analysisofuserbehavior_spark.operators.retrieval import hybrid_rrf_topk

    rows, vecs = data
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    n_q, k, depth = 3, 5, 4
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["lex_rank"], r["sem_rank"])
        for r in hybrid_rrf_topk(docs, emb, n_queries=n_q, k=k, depth=depth).collect()
    }

    toksets = {i: set(t.split(" ")) for i, t in rows}
    vmap = dict(vecs)
    want = {}
    for q in range(n_q):
        lex = sorted(
            (
                (
                    -_q(
                        len(toksets[d] & toksets[q])
                        / (len(toksets[d] | toksets[q])),
                        3,
                    ),
                    d,
                )
                for d, _ in rows
                if d != q
            ),
        )[:depth]
        lexr = {d: i + 1 for i, (_, d) in enumerate(lex)}
        def cos(a, b):
            dp = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return dp / (na * nb)
        sem = sorted(
            ((-_q(cos(vmap[d], vmap[q]), 3), d) for d, _ in vecs if d != q)
        )[:depth]
        semr = {d: i + 1 for i, (_, d) in enumerate(sem)}
        fused = []
        for d in set(lexr) | set(semr):
            rrf = 0.0
            if d in lexr:
                rrf += 1.0 / (60.0 + lexr[d])
            if d in semr:
                rrf += 1.0 / (60.0 + semr[d])
            fused.append((-_q(rrf, 9), d))
        for i, (_, d) in enumerate(sorted(fused)[:k]):
            want[(q, i + 1)] = (d, lexr.get(d), semr.get(d))
    assert got == want
