"""Slowly-changing-dimension (type 2) merge — set-oriented.

The reference updates dimensions by per-row DAO upserts (the pattern
its `dao/impl/*` classes hand-roll against MySQL); at warehouse scale
dimension history is instead maintained as an SCD2 table:
(key, attrs..., valid_from, valid_to) with `valid_to IS NULL` marking
the open version.  `scd2_apply` folds one update batch in as ONE
full-outer join on the key (single shuffle) plus unions — no per-row
writes, no driver loop:

- open rows whose tracked attrs changed  → closed (valid_to = eff)
  and a new open row with the update's attrs (valid_from = eff);
- open rows with no / identical update   → carried through untouched;
- unseen keys in the batch               → inserted as new open rows;
- already-closed history                 → never touched (union'd
  back verbatim — at 100 TB, store history partitioned by
  `valid_to IS NULL` so this union never rewrites closed partitions).

Comparisons are null-safe (`<=>`), so NULL→value and value→NULL
transitions version correctly."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: tuple[str, ...],
    eff_col: str = "eff",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    # valid_from/valid_to carry the eff column's type (string, date or
    # timestamp) — the open-version null marker must cast to the same
    # type or the unions below disagree with a typed current schema.
    null_to = F.lit(None).cast(updates.schema[eff_col].dataType)
    hist = current.where(F.col(valid_to).isNotNull())
    open_ = current.where(F.col(valid_to).isNull())

    o = open_.select(
        F.col(key).alias("_k"),
        *[F.col(c).alias(f"_o_{c}") for c in tracked],
        F.col(valid_from).alias("_o_from"),
    )
    u = updates.select(
        F.col(key).alias("_uk"),
        *[F.col(c).alias(f"_u_{c}") for c in tracked],
        F.col(eff_col).alias("_u_eff"),
    )
    # the joined frame feeds FIVE branches (closed/reopened/carried/
    # untouched/inserted); re-derived branches recompute the join —
    # uncheckpointed this plan re-ran it 5× (21 scans at sf0.01)
    from ..functions.ckpt import ckpt

    j = ckpt(o.join(u, o["_k"] == u["_uk"], "full_outer"))

    changed = reduce(
        lambda a, b: a | b,
        [~F.col(f"_o_{c}").eqNullSafe(F.col(f"_u_{c}")) for c in tracked],
    )
    both = F.col("_k").isNotNull() & F.col("_uk").isNotNull()

    def _ver(prefix: str, from_col: F.Column, to_col: F.Column) -> list[F.Column]:
        return [
            F.coalesce(F.col("_k"), F.col("_uk")).alias(key),
            *[F.col(f"_{prefix}_{c}").alias(c) for c in tracked],
            from_col.alias(valid_from),
            to_col.alias(valid_to),
        ]

    closed = j.where(both & changed).select(
        *_ver("o", F.col("_o_from"), F.col("_u_eff"))
    )
    reopened = j.where(both & changed).select(
        *_ver("u", F.col("_u_eff"), null_to)
    )
    carried = j.where(both & ~changed).select(
        *_ver("o", F.col("_o_from"), null_to)
    )
    untouched = j.where(F.col("_uk").isNull()).select(
        *_ver("o", F.col("_o_from"), null_to)
    )
    inserted = j.where(F.col("_k").isNull()).select(
        *_ver("u", F.col("_u_eff"), null_to)
    )

    out_cols = [key, *tracked, valid_from, valid_to]
    return (
        hist.select(*out_cols)
        .unionByName(closed)
        .unionByName(reopened)
        .unionByName(carried)
        .unionByName(untouched)
        .unionByName(inserted)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare: tuple[str, ...],
) -> DataFrame:
    """Keyed diff of two table snapshots: (key, change) with change ∈
    {'added','removed','changed'} — the regression gate a pipeline
    runs between yesterday's and today's build of the same table.
    ONE full-outer join on the key; unchanged rows drop out inside
    the same stage, so output size is |delta|, not |table|.
    Comparisons are null-safe (`<=>`)."""
    from functools import reduce

    o = old.select(
        F.col(key).alias("_k"), *[F.col(c).alias(f"_o_{c}") for c in compare]
    )
    n = new.select(
        F.col(key).alias("_nk"), *[F.col(c).alias(f"_n_{c}") for c in compare]
    )
    j = o.join(n, o["_k"] == n["_nk"], "full_outer")
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")) for c in compare],
    )
    return (
        j.withColumn(
            "change",
            F.when(F.col("_k").isNull(), "added")
            .when(F.col("_nk").isNull(), "removed")
            .when(~same, "changed"),
        )
        .where(F.col("change").isNotNull())
        .select(F.coalesce(F.col("_k"), F.col("_nk")).alias(key), "change")
    )


def cdc_apply(
    changelog: DataFrame,
    key_cols: tuple[str, ...],
    seq_cols: tuple[str, ...],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC changelog (Debezium/Delta-CDF shape: one row per
    change event with an op marker and a total-order sequence per
    key) down to the final snapshot: for every key the HIGHEST-seq
    event wins; keys whose winning event is a delete vanish.

    The reference's nearest construct is, again, its per-row DAO
    "insert or update" loop (dao/impl/*, one MySQL round-trip per
    record); the set-oriented form is the standard MERGE-style
    "latest change wins" reduction that Delta Lake's
    `MERGE INTO ... WHEN MATCHED [DELETE]` and Flink's upsert-kafka
    materialization execute:

      row_number() OVER (PARTITION BY key ORDER BY seq DESC) = 1
      ... THEN FILTER op != delete

    Scale shape: ONE hash shuffle on the key; per-partition window
    state is O(1) (running rank over the sort).  Partition width is
    the per-key CHANGE COUNT — bounded by update frequency, not
    corpus size — so no skew guard is needed beyond AQE (a key
    updated 10^9 times in one batch is a pipeline bug upstream).
    The window (vs `max_by(struct(seq), ...)` aggregation) keeps the
    full winning ROW without re-joining, and lets the same scan also
    emit per-key change counts for the audit columns.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    ranked = changelog.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n_changes",
        F.count(F.lit(1)).over(Window.partitionBy(*key_cols)),
    )
    return (
        ranked.where(F.col("_rn") == 1)
        .where(F.col(op_col) != delete_op)
        .drop("_rn")
        .withColumnRenamed("_n_changes", "n_changes")
    )


def mv_incremental_merge(
    base: DataFrame, delta: DataFrame, key: str, cents_col: str
) -> DataFrame:
    """Incremental MATERIALIZED-VIEW maintenance for an algebraic
    aggregate: the standing view holds per-key PARTIAL aggregates
    (count + sum) over the base data; a new delta batch computes its
    own partials; the refreshed view is the MERGE of the two partial
    frames — O(delta + |keys|) instead of the full recompute, which
    is the entire point of a lakehouse MV at 100 TB (the oracle IS
    the full recompute, so the gate proves merge(partials) ==
    recompute exactly, including the non-distributive AVG rebuilt
    from merged sum/count).

    Amounts quantize to integer cents up-front so count/sum/avg are
    exact integer algebra end-to-end; avg is an integer `div` (the
    floor of the true mean — deterministic cross-engine, no double
    division)."""
    cents = F.floor(F.col(cents_col) * 100 + F.lit(0.5)).cast("bigint")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(key).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(cents).cast("bigint").alias("cents"),
        )

    return (
        partial(base)
        .unionByName(partial(delta))
        .groupBy(key)
        .agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .select(
            key,
            "n_rows",
            "total_cents",
            F.expr("total_cents div n_rows").cast("bigint").alias("avg_cents"),
        )
        .orderBy(key)
    )
