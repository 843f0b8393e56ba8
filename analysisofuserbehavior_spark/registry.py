"""Query registry — the engine's public query surface.

Every operator family from SURVEY.md §2 is exposed here as a named
query `(spark, sf_dir) -> DataFrame`, paired (where SQL-expressible)
with a DuckDB oracle in `oracle.py`.  `__spark_entry__.py` re-exports
this registry for the driver harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators import behavior_model as bm
from .operators import session_analysis as sa
from .params import TaskParams
from .sources import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}


def query(name: str):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        return fn

    return deco


def _actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm.actions(load_table(spark, sf_dir, "events"))


def _users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm.user_info(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


# demo param set for the predicate engine; mirrored in
# oracle.ORACLE['session_filtered_aggr_stat']
DEMO_PARAMS = TaskParams(
    start_age=10,
    end_age=49,
    professionals=("AUTOMOBILE", "BUILDING", "MACHINERY"),
    sex="male",
    keywords=("click", "purchase"),
)


@query("sessionize")
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _actions(spark, sf_dir).select("event_id", "session_id")


@query("session_stats")
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sa.session_stats(_actions(spark, sf_dir))


@query("session_aggr_stat")
def q_session_aggr_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sa.session_aggr_stat(sa.session_stats(_actions(spark, sf_dir)))


@query("session_filtered_aggr_stat")
def q_session_filtered_aggr_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = sa.session_stats(_actions(spark, sf_dir))
    filtered = sa.filter_sessions(sessions, _users(spark, sf_dir), DEMO_PARAMS)
    return sa.session_aggr_stat(filtered)


@query("session_random_extract")
def q_session_random_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sa.session_random_extract(sa.session_stats(_actions(spark, sf_dir)))


@query("session_detail")
def q_session_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    actions = _actions(spark, sf_dir)
    chosen = sa.session_random_extract(sa.session_stats(actions))
    return sa.session_detail(actions, chosen).select(
        "event_id",
        "session_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("action_time"),
        "category_id",
        "page_id",
    )


@query("top10_categories")
def q_top10_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sa.top10_categories(_actions(spark, sf_dir))


@query("top10_category_sessions")
def q_top10_category_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    actions = _actions(spark, sf_dir)
    return sa.top10_category_sessions(actions, sa.top10_categories(actions))


@query("tpch_q1")
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the scan+agg throughput headline.

    Monetary values are quantized per-row to 1e-4 with
    `floor(x*10000 + 0.5)` into BIGINT before summing: double
    summation is run-order dependent and double→decimal cast rounding
    differs between engines, but these two IEEE ops are bit-identical
    everywhere, and integer sums are exact."""
    li = load_table(spark, sf_dir, "lineitem")

    def q4(col: F.Column) -> F.Column:  # quantize to 1e-4 as bigint
        return F.floor(col * 10000 + F.lit(0.5)).cast("bigint")

    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))

    def money_sum(col: F.Column, alias: str) -> F.Column:
        return F.round(F.sum(q4(col)) / F.lit(10000.0), 2).alias(alias)

    def money_avg(col: F.Column, alias: str) -> F.Column:
        return F.round(F.sum(q4(col)) / F.lit(10000.0) / n, 2).alias(alias)

    return (
        li.where(F.col("l_shipdate") <= F.lit("2005-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity"), "sum_qty"),
            money_sum(F.col("l_extendedprice"), "sum_base_price"),
            money_sum(disc_price, "sum_disc_price"),
            money_sum(charge, "sum_charge"),
            money_avg(F.col("l_quantity"), "avg_qty"),
            money_avg(F.col("l_extendedprice"), "avg_price"),
            money_avg(F.col("l_discount"), "avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
