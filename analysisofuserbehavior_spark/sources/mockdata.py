"""Seeded mock-data generator — the reference's MockData rebuilt.

Reference: util/MockData.java:29-175 generates three local-mode demo
tables with UNSEEDED java.util.Random (new Random(), :37) — every
run differs, which is why the reference has no reproducible tests
(SURVEY.md §5).  This rebuild keeps the same shape and semantics but
derives every "random" value deterministically from a seeded
xxhash64 of the row id, entirely JVM-side via `spark.range` — no
driver-side row list, so a 10⁹-row mock set generates distributed.

Semantics preserved from MockData.java:
* user_visit_action: 100 users × 10 sessions × 0-99 actions
  (:39-48), one action type per row with EXACTLY ONE action column
  group non-null (search_keyword / click_category_id+product_id /
  order_* / pay_* CSV lists — :58-72), session-constant session_id
  and date, action_time inside the session's hour.
* user_info: 100 users, age 0-59, professional/city/sex pools
  (:115-128).
* product_info: 100 products, extend_info = '{"product_status": k}'
  with k ∈ {0,1} (:153-158).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SEARCH_KEYWORDS = (
    "hot pot", "cake", "chongqing spicy noodles", "new area mansion",
    "zumba", "takeout", "taiwan milk tea", "western food", "temple fair", "peking duck",
)
ACTIONS = ("search", "click", "order", "pay")
PROFESSIONALS = ("professional0", "professional1", "professional2", "professional3", "professional4")
CITIES = ("city0", "city1", "city2", "city3", "city4")


def _h(*cols: F.Column | str, mod: int) -> F.Column:
    """Deterministic uniform int in [0, mod) from a seeded hash."""
    return F.pmod(F.xxhash64(*cols, F.lit(42)), F.lit(mod))


def mock_user_visit_action(
    spark: SparkSession, users: int = 100, sessions_per_user: int = 10
) -> DataFrame:
    """One row per action; session sizes 0-99 like MockData.java:46."""
    sess = (
        spark.range(users * sessions_per_user)
        .withColumn("user_id", F.col("id") % users)
        .withColumn("session_id", F.md5(F.col("id").cast("string")))
        .withColumn("n_actions", _h("id", F.lit("n"), mod=100))
        .withColumn("day_off", _h("id", F.lit("d"), mod=28))
        .withColumn("base_hour", _h("id", F.lit("h"), mod=23))
    )
    acts = sess.select(
        "user_id", "session_id", "day_off", "base_hour",
        F.explode(F.sequence(F.lit(1), F.col("n_actions"))).alias("a"),
        F.col("id").alias("sid"),
    )
    aid = F.xxhash64("sid", "a", F.lit(42))
    action = F.element_at(F.array(*[F.lit(x) for x in ACTIONS]), (F.pmod(aid, F.lit(4)) + 1).cast("int"))
    kw = F.element_at(
        F.array(*[F.lit(x) for x in SEARCH_KEYWORDS]), (_h("sid", "a", F.lit("k"), mod=10) + 1).cast("int")
    )
    cat = _h("sid", "a", F.lit("c"), mod=100)
    csv_ids = F.concat_ws(",", cat.cast("string"), _h("sid", "a", F.lit("c2"), mod=100).cast("string"))
    ts = (
        F.lit("2024-02-01 00:00:00").cast("timestamp")
        + F.make_interval(F.lit(0), F.lit(0), F.lit(0), F.col("day_off"), F.col("base_hour"),
                          _h("sid", "a", F.lit("m"), mod=60).cast("int"),
                          _h("sid", "a", F.lit("s"), mod=60).cast("double"))
    )
    return acts.select(
        F.date_format(ts, "yyyy-MM-dd").alias("date"),
        "user_id",
        "session_id",
        _h("sid", "a", F.lit("p"), mod=10).alias("page_id"),
        F.date_format(ts, "yyyy-MM-dd HH:mm:ss").alias("action_time"),
        F.when(action == "search", kw).alias("search_keyword"),
        F.when(action == "click", cat).alias("click_category_id"),
        F.when(action == "click", _h("sid", "a", F.lit("pr"), mod=100)).alias("click_product_id"),
        F.when(action == "order", csv_ids).alias("order_category_ids"),
        F.when(action == "order", csv_ids).alias("order_product_ids"),
        F.when(action == "pay", csv_ids).alias("pay_category_ids"),
        F.when(action == "pay", csv_ids).alias("pay_product_ids"),
        _h("sid", "a", F.lit("ci"), mod=10).alias("city_id"),
    )


def mock_user_info(spark: SparkSession, users: int = 100) -> DataFrame:
    u = spark.range(users).withColumnRenamed("id", "user_id")
    return u.select(
        "user_id",
        F.concat(F.lit("user"), F.col("user_id")).alias("username"),
        F.concat(F.lit("name"), F.col("user_id")).alias("name"),
        _h("user_id", F.lit("age"), mod=60).cast("int").alias("age"),
        F.element_at(
            F.array(*[F.lit(x) for x in PROFESSIONALS]),
            (_h("user_id", F.lit("pro"), mod=5) + 1).cast("int"),
        ).alias("professional"),
        F.element_at(
            F.array(*[F.lit(x) for x in CITIES]), (_h("user_id", F.lit("city"), mod=5) + 1).cast("int")
        ).alias("city"),
        F.when(_h("user_id", F.lit("sex"), mod=2) == 0, "male").otherwise("female").alias("sex"),
    )


def mock_product_info(spark: SparkSession, products: int = 100) -> DataFrame:
    p = spark.range(products).withColumnRenamed("id", "product_id")
    return p.select(
        "product_id",
        F.concat(F.lit("product"), F.col("product_id")).alias("product_name"),
        F.concat(
            F.lit('{"product_status": '),
            _h("product_id", F.lit("st"), mod=2).cast("string"),
            F.lit("}"),
        ).alias("extend_info"),
    )


def register_mock_tables(spark: SparkSession) -> dict[str, DataFrame]:
    """MockData.mock() equivalent: build + register the three temp
    views (ref :104,139,171)."""
    dfs = {
        "user_visit_action": mock_user_visit_action(spark),
        "user_info": mock_user_info(spark),
        "product_info": mock_product_info(spark),
    }
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
