"""Idempotence contract of the incremental corpus ingest (VERDICT r09
#6): re-running a day's ingest — same inputs, same day — must leave
the store content-identical and the index byte-untouched (the ledger
skips the append), because orchestrator retries and manual backfills
ARE re-runs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.operators.corpus_pipeline import ingest_corpus_day


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "spark streaming joins windows and watermarks for late data"),
        (3, "a totally different document about parquet footers and stats"),
        (10, "the quick brown fox jumps over the lazy dog again and again"),
        (11, "fresh arrival with novel content about inverted index shards"),
        (12, "spark streaming joins windows and watermarks for late data"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _listing(root):
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out.append((os.path.relpath(p, root), os.path.getsize(p)))
    return sorted(out)


def test_day2_rerun_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "store")
    idx = str(tmp_path / "idx")
    docs = _docs(spark)
    day1 = docs.where(F.col("doc_id") < 10)
    day2 = docs.where(F.col("doc_id") >= 10)
    ingest_corpus_day(spark, day1, "2024-01-01", store, idx, first_day=True)
    ingest_corpus_day(spark, day2, "2024-01-02", store, idx)

    def store_content():
        # partition inference yields day as DATE; compare as ISO text
        return sorted(
            (r["doc_id"], r["text"], str(r["day"]))
            for r in spark.read.parquet(store).collect()
        )

    def index_content():
        post = sorted(
            map(tuple, spark.read.parquet(idx).select(
                "token", "doc_id", "tf", "dl", "bucket").collect())
        )
        stats = sorted(
            map(tuple, spark.read.parquet(idx + "/_stats").collect())
        )
        return post, stats

    store_before = store_content()
    index_files_before = _listing(idx)
    index_before = index_content()

    # exact + near duplicates of the standing corpus must have been
    # screened out; only the genuinely new doc was admitted
    admitted_day2 = [d for d, _t, day in store_before if day == "2024-01-02"]
    assert admitted_day2 == [11]

    # the re-run: same inputs, same day
    ingest_corpus_day(spark, day2, "2024-01-02", store, idx)

    assert store_content() == store_before
    # the ledger must have skipped the append — not one index file
    # touched (name or size)
    assert _listing(idx) == index_files_before
    assert index_content() == index_before
    # and day 1 survived the day-2 overwrite untouched
    assert sorted(d for d, _t, day in store_before if day == "2024-01-01") == [
        1,
        2,
        3,
    ]
