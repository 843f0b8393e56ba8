"""Append entries for queries added AFTER a full oracle_report run to
its JSON artifact, using the identical comparison code — so a late-in-
round operator still lands in ORACLE_FULL_r{N}.json without re-running
the other ~230 checks.

Usage: python tools/oracle_addendum.py REPORT.json q1 [q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_oracle import compare, load_duckdb  # noqa: E402 - same dir

from analysisofuserbehavior_spark.oracle import ORACLE  # noqa: E402
from analysisofuserbehavior_spark.registry import QUERIES  # noqa: E402
from analysisofuserbehavior_spark.session import (  # noqa: E402
    get_spark,
    release_query_resources,
)


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    report = json.load(open(out_path))
    spark = get_spark("oracle_addendum", cpus=8)
    for sf_dir, entries in report["sfs"].items():
        con = load_duckdb(sf_dir)
        for name in names:
            t0 = time.perf_counter()
            try:
                sdf = QUERIES[name](spark, sf_dir).toPandas()
            except Exception as e:  # noqa: BLE001
                entries[name] = {"status": "error", "err": str(e)[:300]}
                continue
            finally:
                release_query_resources(spark)
            if name not in ORACLE:
                entries[name] = {"status": "rows_only", "rows": len(sdf)}
                continue
            problems = compare(name, sdf, con.execute(ORACLE[name]).fetchdf())
            entries[name] = {
                "status": "match" if not problems else "mismatch",
                "rows": len(sdf),
                "sec": round(time.perf_counter() - t0, 2),
            }
            if problems:
                entries[name]["problems"] = problems
            print(
                ("OK   " if not problems else "FAIL ")
                + f"{sf_dir} {name} ({len(sdf)} rows)",
                flush=True,
            )
    spark.stop()
    statuses = [r["status"] for sf in report["sfs"].values() for r in sf.values()]
    report["summary"] = {
        "total_checks": len(statuses),
        "match": statuses.count("match"),
        "rows_only": statuses.count("rows_only"),
        "mismatch": statuses.count("mismatch"),
        "error": statuses.count("error"),
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report["summary"]))
    if report["summary"]["mismatch"] or report["summary"]["error"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
