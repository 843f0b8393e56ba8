"""Storage-layout writers for the 100 TB deployment shape.

The reference's only layout decision is a Hive table scanned with an
interpolated date predicate (util/SparkUtils.java:64-90).  At scale
the layout IS the index:

* `write_partitioned_by_day` — facts land partitioned by `day`, so
  the date-range predicate every module starts with
  (`WHERE date BETWEEN ...`, SURVEY.md §2.1) becomes partition
  PRUNING: untouched days are never listed, let alone read.
* `write_bucketed` — pre-shuffle a fact table into N buckets on its
  join/agg key (session_id, user_id): later joins and groupBys on
  that key elide their exchange entirely (verified in
  tests/test_layout.py by plan inspection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_partitioned_by_day(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    (
        df.withColumn("day", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .repartition("day")
        .write.mode(mode)
        .partitionBy("day")
        .parquet(path)
    )


def read_day_range(
    spark: SparkSession, path: str, start_day: str, end_day: str
) -> DataFrame:
    """Partition-pruned scan — only the matching day directories are
    listed/read (check PartitionFilters in the plan)."""
    df = spark.read.parquet(path)
    return df.where(F.col("day").between(start_day, end_day))


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed table (external when `path` given — warehouse.dir is
    a static conf and can't be pointed elsewhere at runtime)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def compact_dir(
    spark: SparkSession,
    src: str,
    dest: str,
    target_files: int,
    cluster_col: str | None = None,
) -> None:
    """Small-file compaction: rewrite a directory of many tiny
    parquet files (the classic streaming-sink / over-parallel-write
    pathology — every file costs a namenode op, a footer read, and a
    task at scan time) into `target_files` right-sized files.

    With `cluster_col` the rewrite uses repartitionByRange + a
    within-partition sort, so the output is range-clustered on that
    column and min/max row-group stats stay selective for later
    predicate pushdown — compaction that *improves* the layout
    instead of shuffling it randomly."""
    df = spark.read.parquet(src)
    if cluster_col is not None:
        df = df.repartitionByRange(target_files, F.col(cluster_col)).sortWithinPartitions(
            cluster_col
        )
    else:
        df = df.repartition(target_files)
    df.write.mode("overwrite").parquet(dest)
