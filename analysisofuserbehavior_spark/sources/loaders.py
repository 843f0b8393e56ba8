"""Parquet table loaders for the driver testdata star schema.

Replaces the reference's three source paths — HiveContext temp-table
scan (util/SparkUtils.java:38-90), JDBC dimension read
(AreaTop3ProductSpark.java:176-218), and the in-memory mock generator
(util/MockData.java:29-175) — with one declarative parquet reader.
Predicate pushdown / column pruning happen in Catalyst, so callers
just `.where()`/`.select()` on the returned DataFrame; the date-range
SQL-string interpolation of SparkUtils.java:71-77 is unnecessary.

At 100 TB the fact tables (events, lineitem, documents) would be laid
out partitioned by date (`.write.partitionBy('dt')`) so the same
`.where(col('dt').between(...))` prunes partitions — see
plans/layout.py for the writer that produces that layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The driver's parquet stores timestamps as INT64 TIMESTAMP(NANOS),
# which Spark's parquet reader rejects; with
# spark.sql.legacy.parquet.nanosAsLong=true (set in session.get_spark)
# they surface as long nanos and are converted here.  Integer division
# by 1000 truncates toward zero — identical to DuckDB's ns→us read of
# the same column, so oracle comparisons stay exact.
# only `events.ts` is TIMESTAMP(NANOS); lineitem/orders carry native
# TIMESTAMP(MICROS) (timestamp_ntz to Spark) and push down directly —
# but ONLY against timestamp_ntz literals: a tz-aware
# cast('...' as timestamp) literal forces a cast onto the column and
# kills the scan filter.
_NANO_TS_COLUMNS = {
    "events": ("ts",),
}


def ns(iso: str) -> int:
    """Epoch-nanos literal for an ISO date/datetime string (UTC) —
    for predicates against the raw `<col>_ns` columns."""
    import datetime as dt

    s = iso if " " in iso or "T" in iso else iso + " 00:00:00"
    d = dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp()) * 1_000_000_000


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLUMNS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            # `div` = integer division: float `/` would round (nanos
            # exceed double's 2^53 mantissa) and drift ±1 µs vs DuckDB.
            # The raw nanos column stays exposed as `<col>_ns`: the
            # converted column is a COMPUTED expression, so filters on
            # it can never reach the parquet scan — date-range
            # predicates must compare `<col>_ns` against `ns(...)`
            # literals to push down (bigint row-group stats prune
            # exactly like timestamps; asserted in tests/test_plans.py).
            df = df.withColumn(f"{col}_ns", F.col(col)).withColumn(
                col, F.expr(f"timestamp_micros({col} div 1000)")
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register each table as a temp view (the SQL surface the
    reference exposes via registerTempTable, MockData.java:104)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
