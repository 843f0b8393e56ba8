"""Scale-adaptive input-spread for CPU-heavy stage-1 work.

The gate/bench parquet tables are single files with ONE row group, so
their scans plan exactly one partition, and everything upstream of a
query's first Exchange — tokenize + explode + partial aggregation,
per-row Python codecs in mapInPandas, MinHash's 64 min-aggregates —
serializes on a single task while the other cores idle (measured:
image_features_jpeg 5.5 s wall with 5.4 s TOTAL executor time on
local[32]).  This is the optimization guide's §2.5 "input skew: one
huge unsplittable file → repartition immediately after the read"
case.

`spread_small_scan` hash-repartitions the NARROW input frame (ids +
text — never derived heavy columns; generate those after the
exchange) to the session's defaultParallelism, and is a NO-OP when
the frame already carries at least that many partitions — the 100 TB
layout (thousands of files / row groups) takes the no-op path, so no
shuffle is ever added at scale.  The knob is the session's core
count, not a constant, so the driver's lower-core bench runs spread
to their own width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Repartition `df` to defaultParallelism on `key` iff it
    currently has fewer partitions; identity otherwise.  `key` must
    be high-cardinality (row-level id) so the hash spreads evenly."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key)
