"""Module 3 rebuild: area top-3 hot products.

Reference: spark/product/AreaTop3ProductSpark.java:63-496 — a chain
of registerTempTable checkpoints with debugging count() actions
(each a full job, :97,103,270,327,412), two hand-written skew
rewrites (double group-by :298-322, random-prefix join :363-408) and
five UDFs.  Rebuild: ONE composed DataFrame expression, one action;
the UDFs map to built-ins (concat_ws / get_json_object / CASE WHEN,
SURVEY.md §2.8); skew handling is AQE's job.

Plan shape at 100 TB: clicks (fact) joins users (dim, broadcast) and
products (dim, broadcast) — the fact side shuffles exactly once, for
the (area, product) aggregation; the top-3 window partitions by area
(bounded cardinality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import csv_set_agg

# area → level CASE (ref :445-450 maps Chinese region names A-E;
# the testdata's region domain maps the same way)
AREA_LEVELS = {
    "AFRICA": "A",
    "AMERICA": "B",
    "ASIA": "C",
    "EUROPE": "D",
    "MIDDLE EAST": "E",
}


def area_level_col() -> F.Column:
    c = F.lit(None).cast("string")
    expr = None
    for area, level in AREA_LEVELS.items():
        cond = F.col("area") == area
        expr = F.when(cond, level) if expr is None else expr.when(cond, level)
    return expr.otherwise("other")


def area_top3_products(
    actions: DataFrame, users: DataFrame, products: DataFrame, n: int = 3
) -> DataFrame:
    """Top-N clicked products per area with city rollup + product dim.

    city_infos = sorted-distinct "city_id:city_name" CSV — the
    reference's group_concat_distinct UDAF over concat_long_string
    (GroupConcatDistinctUDAF.java:17-113, ConcatLongStringUDF.java:8-17)
    as collect_set(concat_ws(':', ...)).  product_status decodes the
    JSON-in-a-string extend_info via built-in get_json_object
    (GetJsonObjectUDF.java:12-27 parity).
    """
    clicks = actions.where(F.col("event_type") == "click").select(
        "user_id", "product_id"
    )
    # users carries (user_id, city, area); city_id = join key of the
    # city dim — here the nation key, recovered from the city name on
    # the broadcast side to keep the fact projection minimal
    enriched = clicks.join(F.broadcast(users.select("user_id", "city_id", "city", "area")), "user_id")
    counted = enriched.groupBy("area", "product_id").agg(
        F.count(F.lit(1)).alias("click_count"),
        csv_set_agg(F.concat_ws(":", F.col("city_id"), F.col("city"))).alias("city_infos"),
    )
    w = Window.partitionBy("area").orderBy(F.desc("click_count"), F.asc("product_id"))
    top = counted.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= n)
    prod = products.select(
        "product_id",
        "product_name",
        F.when(
            F.get_json_object("extend_info", "$.product_status").cast("bigint") == 0,
            "self",
        )
        .otherwise("third_party")
        .alias("product_status"),
    )
    return (
        top.join(F.broadcast(prod), "product_id", "left")
        .select(
            "area",
            area_level_col().alias("area_level"),
            "product_id",
            "click_count",
            "city_infos",
            F.coalesce("product_name", F.lit("unknown")).alias("product_name"),
            F.coalesce("product_status", F.lit("unknown")).alias("product_status"),
            F.col("rn").cast("bigint").alias("rank"),
        )
    )
