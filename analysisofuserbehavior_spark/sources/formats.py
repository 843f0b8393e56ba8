"""Schema-pinned CSV / JSON-lines source and sink adapters.

The reference only ever reads Hive tables, JDBC, and Kafka; a usable
engine also has to ingest the flat-file formats training-data drops
actually arrive in.  Two rules both readers enforce:

- **A schema is mandatory.**  `inferSchema` on CSV and schema
  inference on JSON each cost a full extra pass over the data before
  the real read — at 100 TB that is a second 100 TB scan — and can
  silently mis-type columns on dirty rows.  Callers pass the schema
  (or take it from the parquet twin / a catalog).
- **Malformed rows are visible, not fatal.**  PERMISSIVE mode with a
  `_corrupt_record` column keeps a 10-billion-row ingest from dying
  on row 9,999,999,999; the caller decides whether to quarantine or
  fail on `where(_corrupt_record is not null)`.

Column pruning and (for CSV/JSON since Spark 3.x) filter pushdown
work like parquet minus row-group statistics — pruning happens at
parse time, so unselected columns are never materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with an enforced schema and quarantine column."""
    reader = (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType, **options: str
) -> DataFrame:
    """JSON-lines scan with an enforced schema and quarantine column."""
    reader = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt): route malformed rows to a dead-letter sink
    instead of failing the ingest; both frames share one scan.

    Spark refuses plans that read ONLY the corrupt column from a raw
    CSV/JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — so `count()`
    on the corrupt frame (which prunes every data column) fails;
    write it to the dead-letter sink or select a data column
    alongside instead."""
    clean = df.where(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    corrupt = df.where(df[CORRUPT_COL].isNotNull())
    return clean, corrupt


def write_csv(df: DataFrame, path: str, header: bool = True, **options: str) -> None:
    writer = df.write.mode("overwrite").option("header", str(header).lower())
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.csv(path)


def write_jsonl(df: DataFrame, path: str, **options: str) -> None:
    writer = df.write.mode("overwrite")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.json(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None, **options: str
) -> DataFrame:
    """ORC scan.  Columnar like parquet: predicate pushdown hits ORC
    stripe/row-group statistics and column pruning skips unselected
    streams, so no quarantine column applies (malformed stripes fail
    loudly — ORC is self-describing, not schema-on-read).  A schema,
    when given, is enforced as a read contract rather than inferred
    from the first footer."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, **options: str) -> None:
    """ORC sink (zlib default; pass compression='zstd'/'snappy' to
    trade write CPU vs scan bandwidth)."""
    writer = df.write.mode("overwrite")
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    row_tag: str = "row",
    **options: str,
) -> DataFrame:
    """XML scan (native in Spark 4).  Same two ingest rules as
    CSV/JSON: a schema is MANDATORY (XML inference is an extra full
    pass and element-vs-attribute typing is ambiguous on dirty feeds)
    and malformed records land in the quarantine column instead of
    failing the scan (PERMISSIVE).  `row_tag` names the repeated
    element that delimits rows; column pruning happens at parse time
    like JSON — unselected elements are never materialized."""
    reader = (
        spark.read.format("xml")
        .schema(_with_corrupt(schema))
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", **options: str
) -> None:
    """XML sink — one element per row under `row_tag`."""
    writer = df.write.mode("overwrite").format("xml").option("rowTag", row_tag)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)
