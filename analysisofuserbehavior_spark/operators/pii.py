"""PII detection and scrubbing for training corpora.

Not present in the reference (its data is synthetic clickstream);
added for the training-data-pipeline surface: before text reaches a
training run, emails / phone numbers / SSNs / IP addresses must be
counted (compliance reporting) and redacted to sentinel tokens
(C4/The-Pile-style cleanup).

Scale shape: pure row-local regexp projections fused into the scan —
zero shuffle at any corpus size, no Python (JVM regexp inside
whole-stage codegen).  Patterns are written in the common
Java-regex/RE2 subset (no lookaround, ASCII \\b), counted with
leftmost-non-overlapping semantics in BOTH engines (Spark
regexp_count == len(DuckDB regexp_extract_all)), so the whole
operator hash-gates.

The driver corpus carries no PII, so the gated query first runs
`synthesize_pii` — a deterministic injector that appends
doc_id-derived PII tokens to a slice of documents (the same
closed-form construction the multimodal family uses via
synthesize_media: the oracle rebuilds the injection analytically, so
the scrubber is verified against KNOWN ground truth, not against an
accidentally-clean corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# common Java/RE2 subset — keep in exact sync with oracle.py::_PII
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# (pattern, sentinel) in scrub order — patterns are mutually
# disjoint by construction (email needs '@'; SSN/phone differ in
# middle-group width; IPv4 is dotted), so order cannot change the
# result, but both engines apply the SAME order anyway.
PII_RULES = [
    (EMAIL_RE, "<EMAIL>"),
    (SSN_RE, "<SSN>"),
    (PHONE_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
]


def synthesize_pii(docs: DataFrame) -> DataFrame:
    """Deterministically inject PII into the corpus: every doc_id
    divisible by 3 gains an email, by 5 a phone, by 7 an IPv4, by 11
    an SSN (all derived from doc_id with lpad — closed-form, so the
    oracle reproduces the exact bytes).  Docs not divisible by any
    keep their original text — the scrubber must leave them
    untouched."""
    did = F.col("doc_id")
    email = F.concat(
        F.lit(" contact user"), did.cast("string"), F.lit("@example.com")
    )
    phone = F.concat(
        F.lit(" call 555-"),
        F.lpad(F.pmod(did, F.lit(1000)).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(F.pmod(did * 7, F.lit(10000)).cast("string"), 4, "0"),
    )
    ip = F.concat(
        F.lit(" from 10.0."),
        F.pmod(did, F.lit(256)).cast("string"),
        F.lit("."),
        F.pmod(did * 3, F.lit(256)).cast("string"),
    )
    ssn = F.concat(
        F.lit(" ssn "),
        F.lpad(F.pmod(did, F.lit(1000)).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(F.pmod(did, F.lit(100)).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(F.pmod(did * 13, F.lit(10000)).cast("string"), 4, "0"),
    )
    text = F.concat(
        F.col("text"),
        F.when(did % 3 == 0, email).otherwise(F.lit("")),
        F.when(did % 5 == 0, phone).otherwise(F.lit("")),
        F.when(did % 7 == 0, ip).otherwise(F.lit("")),
        F.when(did % 11 == 0, ssn).otherwise(F.lit("")),
    )
    return docs.select("doc_id", text.alias("text"))


def scrub_pii(docs: DataFrame) -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ssns, n_phones, n_ips,
    pii_total): counts from the ORIGINAL text (leftmost
    non-overlapping), then sequential sentinel replacement.  One
    row-local projection; the count-before-scrub order means the
    report and the redaction can never disagree."""
    counts = {
        "n_emails": F.regexp_count(F.col("text"), F.lit(EMAIL_RE)),
        "n_ssns": F.regexp_count(F.col("text"), F.lit(SSN_RE)),
        "n_phones": F.regexp_count(F.col("text"), F.lit(PHONE_RE)),
        "n_ips": F.regexp_count(F.col("text"), F.lit(IPV4_RE)),
    }
    clean = F.col("text")
    for pat, repl in PII_RULES:
        clean = F.regexp_replace(clean, pat, repl)
    out = docs.select(
        "doc_id",
        clean.alias("clean_text"),
        *[c.cast("bigint").alias(n) for n, c in counts.items()],
    )
    total = (
        F.col("n_emails") + F.col("n_ssns") + F.col("n_phones") + F.col("n_ips")
    )
    return out.withColumn("pii_total", total.cast("bigint"))
