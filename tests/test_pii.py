"""Ground-truth PII injection (operators/pii.py) driving the product
redactor (curation.pii_redact): injection contract, per-pattern
disjointness, and clean-doc pass-through."""

from __future__ import annotations

from analysisofuserbehavior_spark.operators.curation import pii_redact
from analysisofuserbehavior_spark.operators.pii import synthesize_pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_synthesize_pii_injects_exactly_the_divisible_ids(spark):
    docs = _docs(spark, [(i, f"doc {i}") for i in range(12)])
    out = {r["doc_id"]: r for r in pii_redact(synthesize_pii(docs)).collect()}
    for i in range(12):
        assert out[i]["n_email"] == (1 if i % 3 == 0 else 0), i
        assert out[i]["n_phone"] == (1 if i % 5 == 0 else 0), i
        assert out[i]["n_ipv4"] == (1 if i % 7 == 0 else 0), i
        assert out[i]["n_card"] == (1 if i % 11 == 0 else 0), i
    # a doc with no injection passes through byte-identical
    assert out[1]["clean_text"] == "doc 1"
    # a fully-injected doc (id 0 divides everything) scrubs every form
    for tok in ("<EMAIL>", "<PHONE>", "<IP>", "<CARD>"):
        assert tok in out[0]["clean_text"], tok
    assert "@" not in out[0]["clean_text"]
    assert "4111" not in out[0]["clean_text"]


def test_injected_artifacts_are_pattern_disjoint(spark):
    """Each injected artifact must match EXACTLY ONE pattern — a
    card matching the phone regex (or an IP matching anything else)
    would double-count and double-scrub.  Checked over ids that
    trigger every combination (0..1154 covers lcm(3,5,7,11))."""
    docs = _docs(spark, [(i, "x") for i in range(1155)])
    out = pii_redact(synthesize_pii(docs)).collect()
    for r in out:
        i = r["doc_id"]
        want = (
            (1 if i % 3 == 0 else 0)
            + (1 if i % 5 == 0 else 0)
            + (1 if i % 7 == 0 else 0)
            + (1 if i % 11 == 0 else 0)
        )
        got = r["n_email"] + r["n_phone"] + r["n_ipv4"] + r["n_card"]
        assert got == want, (i, dict(r.asDict()))


def test_scrub_preserves_surrounding_text(spark):
    docs = _docs(spark, [(3, "tail marker")])
    r = pii_redact(synthesize_pii(docs)).collect()[0]
    assert r["clean_text"] == "tail marker contact <EMAIL>"
