"""JDBC source/sink adapters.

The reference reads its `city_info` dimension over JDBC
(AreaTop3ProductSpark.java:176-218) and writes every result table to
MySQL — worst-case row-at-a-time inserts inside executor-side loops
(UserVisitSessionAnalyzeSpark.java:1225-1252, SessionDetailDAOImpl)
or hand-batched upserts per partition (AdClickRealTimeStatSpark.java:
427-474, dao/impl/AdStatImpl.java:15-97 — whose UPDATE SQL is
actually invalid MySQL, a latent reference bug).

Rebuild: the built-in JDBC connector on both sides.  Reads get
predicate pushdown + `partitionColumn` range splitting (parallel
scans); writes go through `df.write.jdbc` with JDBC batch inserts —
never a per-row DAO call.  Upsert (the reference's select-then-
insert-or-update) maps to staging + MERGE on engines that support
it; `write_jdbc` exposes the plain append/overwrite paths.

Exercised end-to-end in tests/test_jdbc.py against embedded Derby
(the one JDBC engine pyspark ships): real write/read round trip,
range-partitioned parallel scan, filter pushdown into the remote
engine, and the staged MERGE upsert.  MySQL/Postgres in production
differ only in URL/driver/quoting options.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC scan; with `partition_column` bounds the read splits into
    `num_partitions` parallel range queries instead of one cursor."""
    reader: DataFrameReader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound if lower_bound is not None else 0)
            .option("upperBound", upper_bound if upper_bound is not None else 1)
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """Set-oriented JDBC write (batched inserts executor-side)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batch_size)
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


# The upsert (MERGE) sinks — the reference's select-then-upsert DAO
# semantics, set-oriented — live in sources/upsert.py:
# `ParquetUpsertSink` (testable in-env) and `jdbc_upsert_foreach_batch`
# (stage + one MERGE statement per micro-batch).
