"""Round-14 hygiene contracts (round-11 ADVICE): the index compaction's
crash windows always leave a recoverable layout, and a corpus ingest
whose append committed but whose ledger marker didn't is DETECTED
instead of silently double-applied."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (i, f"spark join window stream doc number {i} filler tokens here")
        for i in range(40)
    ] + [(100 + i, f"unrelated prose about weather pattern {i}") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_compact_crash_between_renames_is_recoverable(spark, tmp_path):
    """Simulate the worst compact crash window — live renamed aside,
    staged copy not yet promoted — and assert the very next read
    self-heals to the identical result set."""
    from analysisofuserbehavior_spark.operators.retrieval import (
        bm25_topk_indexed,
        write_inverted_index,
    )

    docs = _docs(spark)
    path = str(tmp_path / "idx")
    write_inverted_index(docs, path)
    before = sorted(map(tuple, bm25_topk_indexed(spark, path).collect()))

    # crash state: <path>_compact complete, live moved to <path>_old
    shutil.copytree(path, path + "_compact")
    shutil.move(path, path + "_old")
    assert not os.path.exists(path)

    after = sorted(map(tuple, bm25_topk_indexed(spark, path).collect()))
    assert after == before
    # recovery promoted the staged copy and swept both transients
    assert os.path.exists(path)
    assert not os.path.exists(path + "_compact")
    assert not os.path.exists(path + "_old")

    # the weaker window (staged already gone, only _old left) also heals
    shutil.move(path, path + "_old")
    assert sorted(map(tuple, bm25_topk_indexed(spark, path).collect())) == before
    assert os.path.exists(path)


def test_ingest_detects_append_without_marker(spark, tmp_path):
    """A crash between append_inverted_index and the ledger marker
    leaves a surplus `_stats` manifest row; the next ingest of that
    day must refuse to double-append (df/tf inflation) and say why."""
    from analysisofuserbehavior_spark.operators.corpus_pipeline import (
        ingest_corpus_day,
    )

    store, idx = str(tmp_path / "store"), str(tmp_path / "idx")
    docs = _docs(spark)
    day1 = docs.where(F.col("doc_id") < 20)
    day2 = docs.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 40))
    day3 = docs.where(F.col("doc_id") >= 100)
    ingest_corpus_day(spark, day1, "2024-01-01", store, idx, first_day=True)
    ingest_corpus_day(spark, day2, "2024-01-02", store, idx)
    ingest_corpus_day(spark, day3, "2024-01-03", store, idx)

    # markers are one-number files carrying the post-append manifest
    # row count (1, 2, 3 for three ingests); round 12 added the
    # single `_BASELINE` file rewritten on every commit
    ledger = idx + "_ledger"
    # the local Hadoop FS adds hidden .crc sidecars next to each marker
    markers = sorted(
        n for n in os.listdir(ledger)
        if not n.startswith(".") and n.startswith("day=")
    )
    assert markers == ["day=2024-01-01", "day=2024-01-02", "day=2024-01-03"]
    with open(os.path.join(ledger, "day=2024-01-03")) as f:
        assert f.read().strip() == "3"
    with open(os.path.join(ledger, "_BASELINE")) as f:
        assert f.read().strip() == "3"

    # simulate the crash faithfully: commit order is append → marker
    # → baseline, so a crash BEFORE the marker leaves neither the
    # day-3 marker nor a baseline advanced past day 2 — roll both
    # back (just deleting the marker would leave baseline=3, a state
    # no real crash can produce)
    os.remove(os.path.join(ledger, "day=2024-01-03"))
    for crc in (".day=2024-01-03.crc", "._BASELINE.crc"):
        p = os.path.join(ledger, crc)
        if os.path.exists(p):
            os.remove(p)
    with open(os.path.join(ledger, "_BASELINE"), "w") as f:
        f.write("2")
    with pytest.raises(RuntimeError, match="crashed before its marker"):
        ingest_corpus_day(spark, day3, "2024-01-03", store, idx)
