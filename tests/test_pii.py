"""PII scrubbing: known-answer redaction, count/scrub agreement,
clean-text pass-through, and the deterministic injector's contract."""

from __future__ import annotations

from analysisofuserbehavior_spark.operators.pii import scrub_pii, synthesize_pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_pii_known_answers(spark):
    docs = _docs(
        spark,
        [
            (1, "mail a.b-c_9@sub.example.org and x@y.io now"),
            (2, "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.1"),
            (3, "clean text with no pii at all"),
            (4, "v1.2.3.4 is a version"),  # no \b inside 'v1' → kept
        ],
    )
    got = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert got[1]["n_emails"] == 2 and got[1]["pii_total"] == 2
    assert got[1]["clean_text"] == "mail <EMAIL> and <EMAIL> now"
    assert (got[2]["n_ssns"], got[2]["n_phones"], got[2]["n_ips"]) == (1, 1, 1)
    assert got[2]["clean_text"] == "ssn <SSN> phone <PHONE> ip <IP>"
    assert got[3]["pii_total"] == 0
    assert got[3]["clean_text"] == "clean text with no pii at all"
    # 'v1.2.3.4' has NO word boundary between 'v' and '1' (both word
    # chars), so embedded version strings are deliberately NOT
    # redacted — only standalone dotted quads are
    assert got[4]["n_ips"] == 0
    assert got[4]["clean_text"] == "v1.2.3.4 is a version"


def test_synthesize_pii_injects_exactly_the_divisible_ids(spark):
    docs = _docs(spark, [(i, f"doc {i}") for i in range(12)])
    out = {r["doc_id"]: r for r in scrub_pii(synthesize_pii(docs)).collect()}
    for i in range(12):
        assert out[i]["n_emails"] == (1 if i % 3 == 0 else 0), i
        assert out[i]["n_phones"] == (1 if i % 5 == 0 else 0), i
        assert out[i]["n_ips"] == (1 if i % 7 == 0 else 0), i
        assert out[i]["n_ssns"] == (1 if i % 11 == 0 else 0), i
    # a doc with no injection passes through byte-identical
    assert out[1]["clean_text"] == "doc 1"
    # a fully-injected doc (id 0 divides everything) scrubs every form
    assert out[0]["pii_total"] == 4
    for tok in ("<EMAIL>", "<PHONE>", "<IP>", "<SSN>"):
        assert tok in out[0]["clean_text"], tok
    assert "@" not in out[0]["clean_text"]


def test_scrub_preserves_surrounding_text(spark):
    docs = _docs(spark, [(1, "a b@c.io c 555-123-4567 d")])
    r = scrub_pii(docs).collect()[0]
    assert r["clean_text"] == "a <EMAIL> c <PHONE> d"
