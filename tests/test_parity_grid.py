"""Cross-engine arithmetic parity: Spark qround/cents_sum vs the
DuckDB formulas the oracles embed, over a dense grid that includes
the half-boundary values where built-in round() diverges between
engines (the exact reason qround exists — functions/core.py)."""

from __future__ import annotations

import duckdb
import pandas as pd

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.functions import cents_sum, qround


def _grid() -> list[float]:
    vals = [i / 1000.0 for i in range(-3000, 3001, 7)]  # ±3 range, 0.007 step
    vals += [4.725, 4.715, 0.005, -0.005, 2.675, 1.0049999999, 0.125, -0.125]
    vals += [x + 0.0005 for x in range(0, 10)]  # exact half-of-scale-3 points
    return vals


def test_qround_matches_duckdb_formula(spark):
    vals = _grid()
    sdf = spark.createDataFrame([(v,) for v in vals], "v double").select(
        "v", qround(F.col("v"), 2).alias("r2"), qround(F.col("v"), 3).alias("r3")
    )
    got = sdf.toPandas().sort_values("v").reset_index(drop=True)
    con = duckdb.connect()
    con.register("df", pd.DataFrame({"v": vals}))
    want = con.execute(
        "SELECT v, floor(v*100.0+0.5)/100.0 AS r2, floor(v*1000.0+0.5)/1000.0 AS r3 "
        "FROM df ORDER BY v"
    ).fetchdf().reset_index(drop=True)
    assert (got["r2"] == want["r2"]).all()
    assert (got["r3"] == want["r3"]).all()


def test_cents_sum_partition_invariant(spark):
    """The integer-cents sum must not depend on partitioning/order."""
    vals = _grid()
    one = (
        spark.createDataFrame([(v,) for v in vals], "v double")
        .coalesce(1)
        .agg(cents_sum("v").alias("s"))
        .collect()[0]["s"]
    )
    many = (
        spark.createDataFrame([(v,) for v in reversed(vals)], "v double")
        .repartition(32)
        .agg(cents_sum("v").alias("s"))
        .collect()[0]["s"]
    )
    assert one == many
    con = duckdb.connect()
    con.register("df", pd.DataFrame({"v": vals}))
    want = con.execute(
        "SELECT sum(CAST(floor(v*100.0+0.5) AS BIGINT))/100.0 AS s FROM df"
    ).fetchone()[0]
    assert one == want
