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
