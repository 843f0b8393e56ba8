"""End-to-end JDBC source/sink tests against embedded Derby.

The reference reads its `city_info` dimension over JDBC
(AreaTop3ProductSpark.java:176-218) and upserts results into MySQL
(dao/impl/AdUserClickCountImpl.java:14-78).  No MySQL lives in this
container, but pyspark ships Derby (for the Hive metastore), whose
embedded driver gives a REAL JDBC engine in-process — so the read
path, the partitioned-scan path, filter pushdown, and the
staged-write + MERGE upsert sink all execute for real here, not as
option-plumbing mocks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from analysisofuserbehavior_spark.sources.jdbc import read_jdbc, write_jdbc
from analysisofuserbehavior_spark.sources.upsert import (
    _default_run_sql,
    jdbc_upsert_foreach_batch,
)

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

CITY_ROWS = [
    (0, "Beijing", "North"),
    (1, "Shanghai", "East"),
    (2, "Nanjing", "East"),
    (3, "Guangzhou", "South"),
    (4, "Sanya", "South"),
    (5, "Wuhan", "Center"),
    (6, "Changsha", "Center"),
    (7, "Xian", "West"),
    (8, "Chengdu", "West"),
    (9, "Haerbin", "North-East"),
]


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    return f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"


def _lower(df):
    return df.select([F.col(c).alias(c.lower()) for c in df.columns])


def test_jdbc_write_read_round_trip(spark, derby_url):
    """write_jdbc → read_jdbc round-trips the reference's city_info
    dimension through a real JDBC engine; Derby's default CLOB string
    mapping is overridden so the columns stay comparable."""
    df = spark.createDataFrame(
        CITY_ROWS, "city_id long, city_name string, area string"
    )
    write_jdbc(
        df,
        derby_url,
        "city_info",
        mode="overwrite",
        properties={
            **DERBY,
            "createTableColumnTypes": "city_name VARCHAR(32), area VARCHAR(32)",
        },
    )
    back = _lower(read_jdbc(spark, derby_url, "city_info", properties=DERBY))
    assert sorted(map(tuple, back.collect())) == sorted(CITY_ROWS)


def test_jdbc_partitioned_read_splits_and_pushes_filters(spark, derby_url):
    """The range-partitioned scan issues parallel per-stride queries
    (reference reads city_info on ONE cursor) and an equality filter
    reaches the remote engine as a pushed predicate, not a Spark-side
    post-filter."""
    part = read_jdbc(
        spark,
        derby_url,
        "city_info",
        partition_column="city_id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=10,
        properties=DERBY,
    )
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == len(CITY_ROWS)
    filtered = part.where(F.col("city_id") == 3)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "EqualTo(city_id,3)" in plan.split("PushedFilters")[1][:120]
    assert [r["city_name"] for r in filtered.collect()] == ["Guangzhou"]


def test_jdbc_upsert_merge_sums_across_batches(spark, derby_url):
    """Two micro-batches with overlapping keys through the staged
    MERGE sink: matched keys accumulate (AdUserClickCountImpl
    semantics), unmatched insert — one set-oriented statement per
    batch against a real JDBC engine."""
    _default_run_sql(
        spark,
        derby_url,
        'CREATE TABLE click_totals ("datekey" VARCHAR(10), "user_id" BIGINT, '
        '"ad_id" BIGINT, "click_count" BIGINT)',
    )
    sink = jdbc_upsert_foreach_batch(
        derby_url,
        "click_totals",
        ["datekey", "user_id", "ad_id"],
        ["click_count"],
        merge="sum",
        properties={**DERBY, "createTableColumnTypes": "datekey VARCHAR(10)"},
        quote='"',
    )
    schema = "datekey string, user_id long, ad_id long, click_count long"
    sink(
        spark.createDataFrame(
            [("2024-01-01", 1, 7, 3), ("2024-01-01", 2, 7, 1)], schema
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            [("2024-01-01", 1, 7, 2), ("2024-01-02", 1, 7, 5)], schema
        ),
        1,
    )
    got = {
        (r[0], r[1], r[2]): r[3]
        for r in _lower(
            read_jdbc(spark, derby_url, "click_totals", properties=DERBY)
        ).collect()
    }
    assert got == {
        ("2024-01-01", 1, 7): 5,  # 3 then +2 via MATCHED UPDATE
        ("2024-01-01", 2, 7): 1,
        ("2024-01-02", 1, 7): 5,
    }
