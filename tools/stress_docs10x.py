"""One-off data-term stress: replicate the sf0.1 documents AND
embeddings tables N× (ids shifted per replica — fully deterministic,
no RNG) into a temp sf dir and time the given queries the same way
bench.py does (noop sink, best of two runs).  Confirms the data term
stays ~linear past sf0.1.  Note the replicas duplicate VALUES
(text/vectors repeat with new ids), which is itself adversarial for
the dedup family: every replica is an exact duplicate.

Usage: python tools/stress_docs10x.py [src_sf_dir] [replicas] [q1,q2,...]
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
from analysisofuserbehavior_spark.session import get_spark, release_query_resources


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    names = (
        sys.argv[3].split(",")
        if len(sys.argv) > 3
        else ["boilerplate_ngrams", "repetition_stats"]
    )
    spark = get_spark("stress10x")
    work = tempfile.mkdtemp(prefix="docs10x_")
    counts = {}
    for table, id_col in (("documents", "doc_id"), ("embeddings", "vec_id")):
        df = spark.read.parquet(f"{src}/{table}.parquet")
        n = df.count()
        counts[table] = n * replicas
        big = (
            df.crossJoin(spark.range(replicas).withColumnRenamed("id", "_rep"))
            .withColumn(id_col, F.col(id_col) + F.col("_rep") * (n + 1))
            .drop("_rep")
        )
        big.repartition(32).write.mode("overwrite").parquet(
            f"{work}/{table}.parquet"
        )
    # events too (round 8): event_id AND user_id shift per replica, so
    # the key population grows with the data — stressing the keyed
    # shuffles (sessionize, CDC, sweep-line) instead of deepening the
    # per-key partitions; ts stays, so the time-bucketed frames
    # (sweep-line deltas) densify 10x inside the same calendar span —
    # the adversarial direction for the in-bucket sorts.
    ev = spark.read.parquet(f"{src}/events.parquet")
    n_ev = ev.count()
    n_users = ev.agg(F.max("user_id")).collect()[0][0]
    counts["events"] = n_ev * replicas
    big_ev = (
        ev.crossJoin(spark.range(replicas).withColumnRenamed("id", "_rep"))
        .withColumn("event_id", F.col("event_id") + F.col("_rep") * (n_ev + 1))
        .withColumn("user_id", F.col("user_id") + F.col("_rep") * (n_users + 1))
        .drop("_rep")
    )
    big_ev.repartition(32).write.mode("overwrite").parquet(
        f"{work}/events.parquet"
    )
    # orders + lineitem (round 12, VERDICT r11 #5): o_orderkey and
    # l_orderkey shift per replica IN LOCKSTEP so the orders⋈lineitem
    # join stays referentially intact; dimension keys (cust/part/supp)
    # pass through unshifted — the realistic "same catalog, 10× order
    # volume" direction, which DEEPENS per-dimension-key work the way
    # a bigger sales year actually would.  Gives orders_mv_incremental
    # and the TPC-H-derived entries their data-term ratios.
    od = spark.read.parquet(f"{src}/orders.parquet")
    max_ok = od.agg(F.max("o_orderkey")).collect()[0][0]
    counts["orders"] = od.count() * replicas
    big_od = (
        od.crossJoin(spark.range(replicas).withColumnRenamed("id", "_rep"))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("_rep") * (max_ok + 1))
        .drop("_rep")
    )
    big_od.repartition(32).write.mode("overwrite").parquet(
        f"{work}/orders.parquet"
    )
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    counts["lineitem"] = li.count() * replicas
    big_li = (
        li.crossJoin(spark.range(replicas).withColumnRenamed("id", "_rep"))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_rep") * (max_ok + 1))
        .drop("_rep")
    )
    big_li.repartition(32).write.mode("overwrite").parquet(
        f"{work}/lineitem.parquet"
    )
    # remaining tables pass through so any registry query resolves
    import glob as _glob

    for p in _glob.glob(f"{src}/*.parquet"):
        name = os.path.basename(p)
        if name not in (
            "documents.parquet", "embeddings.parquet", "events.parquet",
            "orders.parquet", "lineitem.parquet",
        ):
            dest = os.path.join(work, name)
            if not os.path.exists(dest):
                if os.path.isdir(p):
                    shutil.copytree(p, dest)
                else:
                    shutil.copy(p, dest)
    timings = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, work).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        release_query_resources(spark)
    print(json.dumps({"replicas": replicas, "rows": counts, "queries": timings}))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
