"""Partition-layout invariance sweep: run every oracle-bearing
registry query under a deliberately odd layout (local[3],
spark.sql.shuffle.partitions=7 — versus the default local[32]/32)
and compare against the DuckDB oracles.  Results must be
bit-identical: parallelism and partition count are physical knobs
that may never leak into query output.

Usage:  python tools/sweep_invariance.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_oracle import compare, load_duckdb  # noqa: E402 - same dir

from analysisofuserbehavior_spark.oracle import ORACLE  # noqa: E402
from analysisofuserbehavior_spark.registry import QUERIES  # noqa: E402
from analysisofuserbehavior_spark.session import (  # noqa: E402
    get_spark,
    release_query_resources,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        "sweep_invariance",
        cpus=3,
        extra_conf={"spark.sql.shuffle.partitions": "7"},
    )
    con = load_duckdb(sf_dir)
    ok = skipped = 0
    failed = []
    for name, fn in QUERIES.items():
        if name not in ORACLE:
            skipped += 1
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            odf = con.execute(ORACLE[name]).fetchdf()
            problems = compare(name, sdf, odf)
        except Exception as e:  # noqa: BLE001
            problems = [f"error: {e}"]
        finally:
            release_query_resources(spark)
        if problems:
            failed.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            ok += 1
    print(
        f"SWEEP local[3]/7-partitions {sf_dir}: {ok} hash-match, "
        f"{skipped} rows-only skips, {len(failed)} failures"
    )
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
