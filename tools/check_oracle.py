"""Local replica of the driver's correctness gate.

Runs each registered query on Spark and its DuckDB oracle at the
given SF, sorts columns by name and rows by value, and compares
exactly (with a float-tolerance diagnostic when exact fails).

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def load_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
        elif "int" in str(df[c].dtype).lower() or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
        elif "float" in str(df[c].dtype):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_df, oracle_df) -> list[str]:
    problems = []
    a, b = normalize(spark_df), normalize(oracle_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns: spark={list(a.columns)} oracle={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"rowcount: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if str(a[c].dtype) == "float64" or str(b[c].dtype) == "float64":
            eq = (
                np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
            )
            close = np.isclose(av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True)
            if not eq.all():
                n_exact = int((~eq).sum())
                if close.all():
                    problems.append(f"col {c}: {n_exact} float mismatches but all within 1e-9 (hash would FAIL)")
                else:
                    i = int(np.argmax(~close))
                    problems.append(f"col {c}: {n_exact} mismatches, e.g. row {i}: {av[i]!r} vs {bv[i]!r}")
        else:
            eq = av == bv
            if not eq.all():
                i = int(np.argmax(~eq))
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, e.g. row {i}: {av[i]!r} vs {bv[i]!r}"
                )
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from analysisofuserbehavior_spark.oracle import ORACLE
    from analysisofuserbehavior_spark.registry import QUERIES
    from analysisofuserbehavior_spark.session import (
        get_spark,
        release_query_resources,
    )

    only = set(sys.argv[2:])
    spark = get_spark("check_oracle", cpus=8)
    con = load_duckdb(sf_dir)
    failed = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        finally:
            # frees the LM family's localCheckpoint RDD blocks
            release_query_resources(spark)
        if name not in ORACLE:
            print(f"SKIP {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            odf = con.execute(ORACLE[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"OK   {name} ({len(sdf)} rows)")
    spark.stop()
    if failed:
        print("FAILED:", ", ".join(failed))
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
