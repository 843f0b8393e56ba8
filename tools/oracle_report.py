"""Emit the committed full-oracle artifact (ORACLE_FULL_r{N}.json):
check_oracle's comparison for EVERY registry query at one or more
scale factors, as machine-readable JSON — so the long tail outside
the driver's 50-slot gate window is verifiable without re-running.

Usage:  python tools/oracle_report.py OUT.json SF_DIR [SF_DIR ...]
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


def run_sf(spark, sf_dir: str) -> dict:
    con = load_duckdb(sf_dir)
    out: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            out[name] = {"status": "error", "err": str(e)[:300]}
            continue
        finally:
            # frees the LM family's localCheckpoint RDD blocks
            release_query_resources(spark)
        if name not in ORACLE:
            out[name] = {"status": "rows_only", "rows": len(sdf)}
            continue
        try:
            odf = con.execute(ORACLE[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            out[name] = {"status": "error", "err": "oracle: " + str(e)[:300]}
            continue
        problems = compare(name, sdf, odf)
        out[name] = {
            "status": "match" if not problems else "mismatch",
            "rows": len(sdf),
            "sec": round(time.perf_counter() - t0, 2),
        }
        if problems:
            out[name]["problems"] = problems
        print(("OK   " if not problems else "FAIL ") + f"{name} ({len(sdf)} rows)", flush=True)
    return out


def main() -> None:
    out_path = sys.argv[1]
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.01"]
    spark = get_spark("oracle_report", cpus=8)
    report: dict = {"generated_unix": int(time.time()), "sfs": {}}
    for sf_dir in sf_dirs:
        print(f"=== {sf_dir}", flush=True)
        report["sfs"][sf_dir] = run_sf(spark, sf_dir)
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
