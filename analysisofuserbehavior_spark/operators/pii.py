"""Ground-truth PII injection for verifying the redaction pipeline.

`curation.pii_redact` is the product operator (chained RE2/Java-regex
redaction + per-pattern counts); the driver corpus carries no PII, so
until round 10 its hash gate proved cross-engine regex parity only on
text with ZERO matches.  `synthesize_pii` closes that hole: it
deterministically appends doc_id-derived artifacts matching each of
curation.PII_PATTERNS (email / card / phone / ipv4) to a known slice
of documents — the same closed-form construction the multimodal
family uses via synthesize_media — so the gated `pii_scrub_report`
verifies counting AND redaction against KNOWN ground truth, with the
oracle rebuilding the injected bytes analytically.

Scale shape: pure row-local string projection fused into the scan —
zero shuffle at any corpus size.

Injection/pattern disjointness (required so each artifact counts for
exactly one pattern): the email carries no digit groups; the card is
four 4-digit dash-groups (the phone pattern needs 3-3-4); the phone
is "+D DDD-DDD-DDDD"; the IP is dotted (no [ -] separators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def synthesize_pii(docs: DataFrame) -> DataFrame:
    """Deterministically inject PII: every doc_id divisible by 3
    gains an email, by 5 a phone, by 7 an IPv4, by 11 a card number
    (all closed-form over doc_id via lpad/modulo, so the oracle
    reproduces the exact bytes).  Docs divisible by none keep their
    original text byte-identical — the scrubber must pass them
    through untouched."""
    did = F.col("doc_id")

    def pad(expr, n):
        return F.lpad(expr.cast("string"), n, "0")

    email = F.concat(
        F.lit(" contact user"), did.cast("string"), F.lit("@example.com")
    )
    phone = F.concat(
        F.lit(" call +1 555-"),
        pad(F.pmod(did, F.lit(1000)), 3),
        F.lit("-"),
        pad(F.pmod(did * 7, F.lit(10000)), 4),
    )
    ip = F.concat(
        F.lit(" from 10.0."),
        F.pmod(did, F.lit(256)).cast("string"),
        F.lit("."),
        F.pmod(did * 3, F.lit(256)).cast("string"),
    )
    card = F.concat(
        F.lit(" card 4111-"),
        pad(F.pmod(did, F.lit(10000)), 4),
        F.lit("-"),
        pad(F.pmod(did * 13, F.lit(10000)), 4),
        F.lit("-"),
        pad(F.pmod(did * 17, F.lit(10000)), 4),
    )
    text = F.concat(
        F.col("text"),
        F.when(did % 3 == 0, email).otherwise(F.lit("")),
        F.when(did % 5 == 0, phone).otherwise(F.lit("")),
        F.when(did % 7 == 0, ip).otherwise(F.lit("")),
        F.when(did % 11 == 0, card).otherwise(F.lit("")),
    )
    return docs.select("doc_id", text.alias("text"))


def k_anonymity_report(users, k: int = 5):
    """k-ANONYMITY audit over the user dimension's quasi-identifier
    tuple (city, sex, age decade): every combination small enough to
    re-identify — group size < k — with its size, the governance
    check run before an analytics extract leaves the warehouse
    (complements the erasure/redaction family: those remove direct
    identifiers; this measures LINKABILITY of the rest).

    Age is bucketed to decades BEFORE grouping (the generalization
    step of k-anonymization); the report lists the still-risky
    tuples.  Scale shape: one map-side-combined groupBy over the
    dimension; the report is QI-domain-sized."""
    from pyspark.sql import functions as F

    qi = users.select(
        "city",
        "sex",
        (F.col("age") - (F.col("age") % 10)).cast("bigint").alias("age_decade"),
    )
    return (
        qi.groupBy("city", "sex", "age_decade")
        .agg(F.count(F.lit(1)).cast("bigint").alias("group_size"))
        .where(F.col("group_size") < k)
        .orderBy("city", "sex", "age_decade")
    )


def l_diversity_report(users, l_threshold: int = 2, sensitive: str = "professional"):
    """l-DIVERSITY audit — k-anonymity's necessary companion: a QI
    group can be large (k-anonymous) yet still leak the sensitive
    attribute when every member SHARES it (the homogeneity attack:
    "all 40-something men in city X are in segment Y").  For every
    (city, sex, age-decade) group this reports its size, the number
    of DISTINCT sensitive values, and whether it meets the
    l-threshold — the pair of reports (k + l) is what a governance
    review actually signs off on.

    Scale shape: one map-side-combined groupBy over the dimension
    with a per-group distinct count (two-level aggregate: exact
    distinct via the (QI, sensitive) pre-aggregation, never a
    row-set collect); output is QI-domain-sized."""
    from pyspark.sql import functions as F

    qi = users.select(
        "city",
        "sex",
        (F.col("age") - (F.col("age") % 10)).cast("bigint").alias("age_decade"),
        F.col(sensitive).alias("_sens"),
    )
    # exact distinct without countDistinct's expand: pre-aggregate on
    # (QI, sensitive) so the second groupBy counts pre-deduped rows
    pre = qi.groupBy("city", "sex", "age_decade", "_sens").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    return (
        pre.groupBy("city", "sex", "age_decade")
        .agg(
            F.sum("_n").cast("bigint").alias("group_size"),
            F.count(F.lit(1)).cast("bigint").alias("n_sensitive_values"),
        )
        .select(
            "city",
            "sex",
            "age_decade",
            "group_size",
            "n_sensitive_values",
            (F.col("n_sensitive_values") >= l_threshold)
            .cast("int")
            .alias("meets_l"),
        )
        .orderBy("city", "sex", "age_decade")
    )
