"""BM25 / unigram-surprisal / vocab-growth: model-based checks
against straight-line Python reimplementations on tiny corpora, plus
plan shape (no explode in the BM25 scoring path)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.operators.retrieval import bm25_topk
from analysisofuserbehavior_spark.operators.text_analysis import (
    unigram_surprisal,
    vocab_growth,
)

DOCS = [
    (0, "spark join window stream spark"),
    (1, "the quick brown fox"),
    (2, "spark spark spark spark spark spark"),
    (3, "join the window"),
    (4, "completely unrelated words here"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _bm25_model(docs, terms, k1=1.5, b=0.75):
    toks = {d: t.split(" ") for d, t in docs}
    n = float(len(docs))
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: float(sum(1 for v in toks.values() if t in v)) for t in terms}
    out = {}
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = float(v.count(t))
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(v) / avgdl))
        out[d] = math.floor(s * 1e6 + 0.5) / 1e6
    return out


def test_bm25_matches_python_model(spark):
    terms = ("spark", "join", "window", "stream")
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(_docs_df(spark), terms, k=10).collect()
    }
    want = {d: s for d, s in _bm25_model(DOCS, terms).items() if s > 0.0}
    assert got == want
    # doc 0 hits all four terms — it must outrank the single-term docs
    assert got[0] == max(got.values())
    # doc 4 shares no query term → filtered out entirely
    assert 4 not in got


def test_bm25_term_saturation(spark):
    """tf saturation: 6 repeats of one term must NOT outrank a doc
    matching all four distinct terms (the k1 saturation property that
    distinguishes BM25 from raw tf)."""
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(_docs_df(spark), ("spark", "join", "window", "stream"), k=10).collect()
    }
    assert got[0] > got[2]


def test_bm25_plan_has_no_explode(spark):
    plan = bm25_topk(_docs_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan  # row-local tf — no explode stage


def test_unigram_surprisal_rare_tokens_score_higher(spark):
    df = unigram_surprisal(_docs_df(spark))
    got = {r["doc_id"]: r["bits_per_token"] for r in df.collect()}
    # doc 2 is six copies of the single most common token; doc 4 is
    # all hapaxes — the rare-token doc must carry more bits/token
    assert got[4] > got[2]
    # exact model: -sum(tf * log2(c/T)) / n
    toks = [t for _, s in DOCS for t in s.split(" ")]
    total = float(len(toks))
    counts = {t: toks.count(t) for t in set(toks)}
    for d, s in DOCS:
        v = s.split(" ")
        bits = sum(math.log2(total) - math.log2(counts[t]) for t in v)
        want = math.floor(bits / len(v) * 1e6 + 0.5) / 1e6
        assert abs(got[d] - want) < 1e-9, d


def test_vocab_growth_monotone_and_complete(spark):
    rows = vocab_growth(_docs_df(spark)).collect()
    assert [r["checkpoint"] for r in rows] == list(range(1, 11))
    sizes = [r["vocab_size"] for r in rows]
    assert sizes == sorted(sizes)  # vocabulary never shrinks
    all_toks = {t for _, s in DOCS for t in s.split(" ")}
    assert sizes[-1] == len(all_toks)  # final checkpoint = full vocab
    assert rows[-1]["n_docs"] == len(DOCS)
    # doc_id ceilings follow exact integer division of max_id=4
    assert [r["doc_id_ceiling"] for r in rows] == [4 * i // 10 for i in range(1, 11)]


def test_bm25_indexed_matches_scan_operator(spark, tmp_path):
    """The sharded inverted index must be a pure LAYOUT change:
    identical quantized scores, identical order, including a query
    term absent from the corpus (df=0 shard is empty — its tf/df
    coalesce to 0 exactly as the scan's size(filter)=0 does)."""
    from analysisofuserbehavior_spark.operators.retrieval import (
        bm25_topk_indexed,
        write_inverted_index,
    )

    docs = _docs_df(spark)
    path = str(tmp_path / "inv_idx")
    write_inverted_index(docs, path)
    for terms in [
        ("spark", "join", "window", "stream"),
        ("spark", "zzz_absent_term"),  # absent term → empty shard
    ]:
        scan = [tuple(r) for r in bm25_topk(docs, terms, k=10).collect()]
        idx = [
            tuple(r)
            for r in bm25_topk_indexed(spark, path, terms, k=10).collect()
        ]
        assert idx == scan, terms


def test_inverted_index_stats_are_exact_integers(spark, tmp_path):
    """_stats must carry the same exact BIGINTs the scan operator
    aggregates (n_docs, Σdl) — a drifted avgdl would shift every
    quantized score."""
    from analysisofuserbehavior_spark.operators.retrieval import (
        write_inverted_index,
    )

    docs = _docs_df(spark)
    path = str(tmp_path / "inv_idx2")
    write_inverted_index(docs, path)
    row = spark.read.parquet(path + "/_stats").collect()[0]
    assert row["n_docs"] == len(DOCS)
    assert row["sum_dl"] == sum(len(t.split(" ")) for _, t in DOCS)
    assert row["n_buckets"] == 16


def test_incremental_index_append_equals_rebuild(spark, tmp_path):
    """Admitting docs in two batches must produce an index whose
    query results are IDENTICAL to a single full build — postings
    per (token, doc) and the summed stats manifest both exact."""
    from analysisofuserbehavior_spark.operators.retrieval import (
        append_inverted_index,
        bm25_topk_indexed,
        write_inverted_index,
    )

    docs = _docs_df(spark)
    full, inc = str(tmp_path / "full"), str(tmp_path / "inc")
    write_inverted_index(docs, full)
    write_inverted_index(docs.where("doc_id % 2 = 0"), inc)
    append_inverted_index(docs.where("doc_id % 2 = 1"), inc)
    terms = ("spark", "join", "window", "stream")
    a = [tuple(r) for r in bm25_topk_indexed(spark, full, terms, k=10).collect()]
    b = [tuple(r) for r in bm25_topk_indexed(spark, inc, terms, k=10).collect()]
    assert a == b
    # the stats manifest really is two rows of exact integers
    rows = spark.read.parquet(inc + "/_stats").collect()
    assert len(rows) == 2
    assert sum(r["n_docs"] for r in rows) == len(DOCS)
    assert sum(r["sum_dl"] for r in rows) == sum(
        len(t.split(" ")) for _, t in DOCS
    )


def test_incremental_append_to_empty_batch(spark, tmp_path):
    # an empty admission batch is a no-op, not a corruption
    from analysisofuserbehavior_spark.operators.retrieval import (
        append_inverted_index,
        bm25_topk_indexed,
        write_inverted_index,
    )

    docs = _docs_df(spark)
    path = str(tmp_path / "idx")
    write_inverted_index(docs, path)
    before = [tuple(r) for r in bm25_topk_indexed(spark, path).collect()]
    append_inverted_index(docs.where("doc_id < 0"), path)
    after = [tuple(r) for r in bm25_topk_indexed(spark, path).collect()]
    assert before == after


def test_hybrid_rrf_fuses_single_modality_hits(spark, sf_dir):
    """RRF fusion semantics: ranks are contiguous per query, the
    score is exactly the two-term reciprocal sum (missing side = 0),
    and documents retrieved by only ONE modality still appear — the
    case hybrid search exists for."""
    from analysisofuserbehavior_spark.operators.retrieval import hybrid_rrf_topk
    from analysisofuserbehavior_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    out = hybrid_rrf_topk(docs, emb, n_queries=5, k=10, depth=50).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["rrf_score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        for r in rows:
            want = 0.0
            if r["lex_rank"] is not None:
                want += 1.0 / (60.0 + r["lex_rank"])
            if r["sem_rank"] is not None:
                want += 1.0 / (60.0 + r["sem_rank"])
            import math

            assert math.isclose(r["rrf_score"], want, abs_tol=5e-10)
    # both single-modality shapes occur somewhere in the fused lists
    flat = [r for rows in by_q.values() for r in rows]
    assert any(r["sem_rank"] is None for r in flat) or any(
        r["lex_rank"] is None for r in flat
    )


def test_hybrid_rrf_per_query_topk_uses_window_group_limit(spark, sf_dir):
    """The per-query rank<=depth filters must compile to
    WindowGroupLimit (per-partition top-k BEFORE the shuffle), not a
    full per-query sort of the corpus."""
    from analysisofuserbehavior_spark.operators.retrieval import hybrid_rrf_topk
    from analysisofuserbehavior_spark.sources import load_table

    df = hybrid_rrf_topk(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
