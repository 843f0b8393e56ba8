"""One-off data-term stress: replicate the sf0.1 documents table 10x
(doc_id shifted per replica — fully deterministic, no RNG) into a
temp sf dir and time the two largest-data-term queries
(boilerplate_ngrams 5.3x, repetition_stats 3.5x in SCALING.md) the
same way bench.py does (noop sink, best of two runs).  Confirms the
data term stays ~linear past sf0.1.

Usage: python tools/stress_docs10x.py [src_sf_dir] [replicas]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.registry import QUERIES
from analysisofuserbehavior_spark.session import get_spark


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("stress10x")
    work = tempfile.mkdtemp(prefix="docs10x_")
    docs = spark.read.parquet(f"{src}/documents.parquet")
    n = docs.count()
    big = docs.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "_rep")
    ).withColumn("doc_id", F.col("doc_id") + F.col("_rep") * (n + 1)).drop("_rep")
    big.repartition(32).write.mode("overwrite").parquet(f"{work}/documents.parquet")
    timings = {}
    for name in ("boilerplate_ngrams", "repetition_stats"):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, work).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        spark.catalog.clearCache()
    print(json.dumps({"replicas": replicas, "docs": n * replicas, "queries": timings}))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
