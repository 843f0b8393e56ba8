"""The UDF registration surface — §2.12 parity.

The reference registers five UDFs/UDAFs on its SQLContext
(AreaTop3ProductSpark.java:76-80).  Every one of them maps to a
built-in expression in modern Spark (SURVEY.md §2.8), so what this
module preserves is two things: the column-level equivalents
(preferred — they stay inside whole-stage codegen), and the
*registration mechanism* so SQL text written against the reference's
function names still runs (`register_reference_udfs`).

| reference UDF            | Ref                                   | backing here            |
|--------------------------|---------------------------------------|-------------------------|
| concat_long_string       | ConcatLongStringUDF.java:8-17         | concat_ws               |
| get_json_object(2-arg)   | GetJsonObjectUDF.java:12-27           | built-in already        |
| random_prefix            | RandomPrefixUDF.java:11-22            | concat(floor(rand()*n)) |
| remove_random_prefix     | RemoveRandomPrefixUDF.java:10-20      | substr after first '_'  |
| group_concat_distinct    | GroupConcatDistinctUDAF.java:17-113   | collect_set+array_join  |

`remove_random_prefix` intentionally FIXES the reference bug: its
`split("_")[1]` drops everything after a second underscore; ours
strips exactly the first prefix segment.  The UDAF's substring-based
"distinct" (String.contains, GroupConcatDistinctUDAF.java:69-77) is
replaced by true set semantics.

A vectorized Pandas-UDF (`register_pandas_example`) demonstrates the
Arrow path for logic that genuinely can't be expressed with
built-ins.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, SparkSession, functions as F
from pyspark.sql.types import DoubleType


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def concat_long_string(v1: Column | str, v2: Column | str, sep: str) -> Column:
    return F.concat_ws(sep, _c(v1).cast("string"), _c(v2).cast("string"))


def random_prefix(col: Column | str, n: int) -> Column:
    """Salting helper for manual skew mitigation (RandomPrefixUDF
    parity).  AQE subsumes this for joins; explicit salting still
    helps pathological aggregation keys."""
    return F.concat_ws(
        "_", F.floor(F.rand() * n).cast("string"), _c(col).cast("string")
    )


def remove_random_prefix(col: Column | str) -> Column:
    """Strip one salt segment — everything after the FIRST '_'."""
    c = _c(col)
    return F.substring(c, F.instr(c, "_") + F.lit(1), F.lit(2147483647))


def group_concat_distinct(col: Column | str) -> Column:
    """GroupConcatDistinctUDAF parity with true set semantics."""
    return F.array_join(F.array_sort(F.collect_set(_c(col))), ",")


def register_reference_udfs(spark: SparkSession) -> None:
    """Expose the reference's SQL function names.

    These re-implement the Java UDF3/UDF2 signatures so legacy SQL
    text runs unchanged; new code should use the column helpers
    above, which compile to built-in expressions."""
    spark.udf.register(
        "concat_long_string",
        lambda v1, v2, sep: None if v1 is None else f"{v1}{sep}{v2}",
    )
    spark.udf.register(
        "remove_random_prefix",
        lambda s: s.split("_", 1)[1] if s is not None and "_" in s else s,
    )
    spark.udf.register(
        "random_prefix_py",
        lambda s, n: s,  # deterministic stub: salting belongs in plans
    )


def register_pandas_example(spark: SparkSession) -> None:
    """Arrow-vectorized UDF demo — the sanctioned slow path for
    logic built-ins can't express (10-100× over row-at-a-time)."""

    @F.pandas_udf(DoubleType())
    def value_zscore(v: pd.Series) -> pd.Series:
        std = v.std(ddof=0)
        return (v - v.mean()) / (std if std else 1.0)

    spark.udf.register("value_zscore", value_zscore)


def register_arrow_example(spark: SparkSession) -> None:
    """Arrow-native UDF (Spark 4.1 `arrow_udf`): the same scalar
    contract as the pandas demo but operating on pyarrow Arrays —
    one less conversion hop than pandas_udf (Arrow batch → pandas →
    Arrow becomes Arrow → Arrow), which is the preferred shape for
    numeric kernels that don't need pandas semantics.  Registered as
    `value_double_arrow`; parity with the column expression is
    pinned in tests/test_layout_udfs.py."""
    # `from __future__ import annotations` stringifies hints, and
    # pyspark resolves them against MODULE globals — so pa must be
    # visible there for the arrow_udf eval-type inference to work
    import pyarrow as pa
    from pyspark.sql.functions import arrow_udf

    globals().setdefault("pa", pa)

    @arrow_udf(DoubleType())
    def value_double_arrow(v: pa.Array) -> pa.Array:
        import pyarrow.compute as pc

        return pc.multiply(v, pa.scalar(2.0))

    spark.udf.register("value_double_arrow", value_double_arrow)


def register_chunk_udtf(spark: SparkSession, name: str = "chunk_doc") -> None:
    """Python UDTF (Spark 3.5+/4 table-function API) twin of
    `operators.packing.chunk_documents` — completes the UDF/UDAF/UDTF
    registration surface (SURVEY §2.12): a SQL-callable table
    function usable standalone or in a LATERAL join:

        SELECT d.doc_id, t.* FROM documents d,
        LATERAL chunk_doc(d.text, 128, 96) t

    Same step semantics as the operator (`step` = distance between
    window starts; named `stride` through round 9 — see
    chunk_documents' rename note).  This is the API-surface demo, not the production
    path: the UDTF runs row-at-a-time Python, while chunk_documents
    compiles to built-in array expressions fused into the scan — keep
    the declarative operator in 100 TB pipelines and reach for a UDTF
    only when per-row imperative logic is genuinely unavoidable."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: bigint, chunk_text: string, n_tokens: bigint")
    class ChunkDoc:
        def eval(self, text: str, chunk_tokens: int = 128, step: int = 96):
            if text is None:
                return
            toks = text.split(" ")
            for start in range(0, len(toks), step):
                piece = toks[start : start + chunk_tokens]
                yield start // step, " ".join(piece), len(piece)

    spark.udtf.register(name, ChunkDoc)
