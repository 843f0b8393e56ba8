"""Dump `.explain("formatted")` of named queries to files.

Usage:
    python tools/dump_round_plans.py OUTDIR SUFFIX QUERY [QUERY...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query.  Lifecycle queries
that execute work eagerly (streaming runs, index builds) still
produce the plan of their RETURNED frame; where that frame is a
collected-literal, the file records that explicitly so a reader
isn't misled.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    from analysisofuserbehavior_spark.registry import QUERIES
    from analysisofuserbehavior_spark.session import get_spark, release_query_resources

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_round_plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} ({suffix}) explain(formatted) at {sf_dir} ==\n")
            f.write(plan)
        print("wrote", path)
        release_query_resources(spark)
    spark.stop()


if __name__ == "__main__":
    main()
