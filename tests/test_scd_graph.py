"""SCD2 merge invariants, PageRank properties, small-file compaction."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.operators.graph import pagerank
from analysisofuserbehavior_spark.operators.scd import scd2_apply

DIM_SCHEMA = "k long, attr string, valid_from string, valid_to string"
UPD_SCHEMA = "k long, attr string, eff string"


def _apply(spark, cur_rows, upd_rows):
    cur = spark.createDataFrame(cur_rows, DIM_SCHEMA)
    upd = spark.createDataFrame(upd_rows, UPD_SCHEMA)
    out = scd2_apply(cur, upd, key="k", tracked=("attr",), eff_col="eff")
    return {tuple(r) for r in out.collect()}


def test_scd2_versions_changed_rows_and_keeps_history(spark):
    got = _apply(
        spark,
        [
            (1, "gold", "2024-01-01", None),       # will change
            (2, "silver", "2024-01-01", None),     # no update
            (1, "bronze", "2023-01-01", "2024-01-01"),  # closed history
        ],
        [(1, "platinum", "2024-06-01"), (9, "new", "2024-06-01")],
    )
    assert got == {
        (1, "bronze", "2023-01-01", "2024-01-01"),   # history untouched
        (1, "gold", "2024-01-01", "2024-06-01"),     # closed
        (1, "platinum", "2024-06-01", None),         # re-opened
        (2, "silver", "2024-01-01", None),           # carried
        (9, "new", "2024-06-01", None),              # inserted
    }


def test_scd2_identical_update_is_not_versioned(spark):
    got = _apply(
        spark,
        [(1, "gold", "2024-01-01", None)],
        [(1, "gold", "2024-06-01")],
    )
    assert got == {(1, "gold", "2024-01-01", None)}


def test_scd2_null_transitions_are_versioned(spark):
    got = _apply(
        spark,
        [(1, None, "2024-01-01", None), (2, "x", "2024-01-01", None)],
        [(1, "set", "2024-06-01"), (2, None, "2024-06-01")],
    )
    assert got == {
        (1, None, "2024-01-01", "2024-06-01"),
        (1, "set", "2024-06-01", None),
        (2, "x", "2024-01-01", "2024-06-01"),
        (2, None, "2024-06-01", None),
    }


def test_scd2_single_shuffle_plan(spark):
    from analysisofuserbehavior_spark import plans

    cur = spark.createDataFrame([(1, "a", "2024-01-01", None)], DIM_SCHEMA)
    upd = spark.createDataFrame([(1, "b", "2024-06-01")], UPD_SCHEMA)
    out = scd2_apply(cur, upd, key="k", tracked=("attr",), eff_col="eff")
    # one join → at most one exchange per side feeding it; the five
    # union branches must REUSE the join, not re-execute it per branch
    plan = plans.executed_plan(out)
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") <= 5


def test_pagerank_uniform_on_cycle(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)], "src string, dst string, weight long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    # symmetric cycle → exactly uniform at every iteration
    assert all(abs(v - 1 / 3) < 1e-6 for v in got.values()), got


def test_pagerank_star_center_dominates_and_mass_conserved(spark):
    edges = spark.createDataFrame(
        [("a", "hub", 1), ("b", "hub", 1), ("c", "hub", 1), ("hub", "a", 1)],
        "src string, dst string, weight long",
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    assert got["hub"] == max(got.values())
    # no dangling nodes in this graph → total rank mass conserved
    assert abs(sum(got.values()) - 1.0) < 1e-5


def test_compact_dir_reduces_files_and_keeps_rows(spark, sf_dir, tmp_path):
    from analysisofuserbehavior_spark.plans.layout import compact_dir
    from analysisofuserbehavior_spark.sources import load_table

    src = str(tmp_path / "shattered")
    dest = str(tmp_path / "compacted")
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(20).write.mode("overwrite").parquet(src)
    assert len(glob.glob(os.path.join(src, "*.parquet"))) == 20

    compact_dir(spark, src, dest, target_files=2, cluster_col="doc_id")
    assert len(glob.glob(os.path.join(dest, "*.parquet"))) == 2
    assert spark.read.parquet(dest).count() == docs.count()
