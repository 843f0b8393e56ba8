"""Partitioning invariance: a query's RESULT must not depend on
spark.sql.shuffle.partitions — the property that makes local-mode
correctness transfer to a 1000-executor cluster.  Catches hidden
order-dependence (unquantized double sums, first() without ordering,
rand without seed)."""

from __future__ import annotations

import pytest

from analysisofuserbehavior_spark.registry import QUERIES

CHECKED = [
    "session_stats",
    "session_aggr_stat",
    "session_random_extract",
    "top10_categories",
    "tpch_q1",
    "dedup_minhash_lsh",
    "session_paths",
    "clean_corpus",
    # round-4 second/third pass additions with float or iterative paths
    "bm25_topk",
    "unigram_surprisal",
    "embedding_neardup_exact",
    "page_bfs_depths",
    "daily_anomaly_zscore",
    "tpch_q9_derived",
    "user_value_locf",
    # round-5 additions: window-derived LM totals + the doc_tfidf
    # rework must stay partition-count-independent
    "bigram_surprisal",
    "dup_ngram_coverage",
    "doc_tfidf_top_terms",
    "remove_dup_spans",
    # round-10 additions: the LSH-fed closure (iterative CC over
    # banded candidates), the prefix-filtered join (df-ordered
    # prefixes must not depend on partitioning), the md5-mixer
    # rows, and the attribution credit split
    "embedding_dedup_clusters_lsh",
    "dedup_ngram_jaccard_prefix",
    "dedup_simhash",
    "doc_rolling_fingerprint",
    "multitouch_attribution",
    "holt_trend_daily",
    "cusum_drift_daily",
    "theilsen_trend_daily",
    # round-12 additions: the mapInPandas integer Gram partials, the
    # iterative LPA argmax, the LSH query-probe candidates, and the
    # log2 PMI ranking must all be partition-count-independent
    "embedding_covariance",
    "item_communities_lpa",
    "ann_lsh_topk",
    "collocations_pmi",
    "feature_hash_docs",
    "target_encode_category",
    "winsorized_user_spend",
    "countmin_token_freq",
    "page_reachability_sql",
    "user_behavior_profile",
    "daily_anomaly_mad",
    "ann_recall_report",
    "user_erasure_audit",
    "daily_pivot_unpivot_roundtrip",
    "page_dwell_stats",
    "entry_exit_pages",
    "bounce_rate_daily",
    "session_depth_curve",
    "purchase_gap_distribution",
    # round-14 additions: the order-pinned entropy fold, the
    # order-pinned session-path build (both regex funnel + trigram
    # consumers), and the two-pass vocab rank must all be
    # partition-count-independent
    "user_entropy_profile",
    "funnel_regex_path",
    "frequent_path_trigrams",
    "vocab_coverage_curve",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "quantile_normalize_by_type",
    "dedup_contained_docs",
    "retrieval_ndcg_report",
]


@pytest.mark.parametrize("name", CHECKED)
def test_result_identical_across_partition_counts(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = {tuple(r) for r in QUERIES[name](spark, sf_dir).collect()}
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = {tuple(r) for r in QUERIES[name](spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
