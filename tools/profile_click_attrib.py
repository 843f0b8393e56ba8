"""Stage table for streaming_click_attribution (VERDICT r10 #2).

Runs the stream-stream interval join solo at the given SF and prints,
per micro-batch, the engine's own duration breakdown (triggerExecution
/ addBatch / getBatch / walCommit / commitOffsets / latestOffset) plus
the state-store commit times — the `ad_blacklist_feedback` treatment:
reconcile the bench number against where the time actually goes.

Usage: python tools/profile_click_attrib.py [sf_dir] [inner|outer] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.session import get_spark


def run_once(spark, sf_dir: str, variant: str, tag: str) -> dict:
    from analysisofuserbehavior_spark.streaming.ad_stream import read_event_stream
    from analysisofuserbehavior_spark.streaming.joins import (
        click_view_attribution,
        click_view_attribution_outer,
    )

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    clicks = stream.where(F.col("event_type") == "click")
    views = stream.where(F.col("event_type") == "view")
    fn = click_view_attribution if variant == "inner" else click_view_attribution_outer
    agg = fn(clicks, views, attribution="24 hours")
    t0 = time.perf_counter()
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(f"prof_{tag}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    rows = spark.table(f"prof_{tag}").count()
    progress = [json.loads(p if isinstance(p, str) else p.json) for p in q.recentProgress]
    return {"wall": wall, "rows": rows, "progress": progress}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    variant = sys.argv[2] if len(sys.argv) > 2 else "inner"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("profile_click_attrib")
    spark.conf.set("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print("checkpoint base conf:", spark.conf.get("spark.sql.streaming.checkpointLocation", "<unset>"))
    print("java.io.tmpdir:", spark.sparkContext._jvm.java.lang.System.getProperty("java.io.tmpdir"))
    for i in range(runs):
        r = run_once(spark, sf_dir, variant, f"{variant}_{i}")
        print(f"\n=== run {i}: wall={r['wall']:.2f}s rows={r['rows']} batches={len(r['progress'])} ===")
        for p in r["progress"]:
            dur = p.get("durationMs", {})
            state = p.get("stateOperators", [])
            commit_ms = sum(s.get("commitTimeMs", 0) for s in state)
            state_rows = sum(s.get("numRowsTotal", 0) for s in state)
            ckpt = p.get("sink", {}).get("description", "")[:40]
            print(
                f"  batch {p.get('batchId')}: rows_in={p.get('numInputRows')} "
                f"trigger={dur.get('triggerExecution')}ms addBatch={dur.get('addBatch')}ms "
                f"getBatch={dur.get('getBatch')}ms latestOffset={dur.get('latestOffset')}ms "
                f"walCommit={dur.get('walCommit')}ms commitOffsets={dur.get('commitOffsets')}ms "
                f"stateCommit={commit_ms}ms stateRows={state_rows} sink={ckpt}"
            )
        ckloc = r["progress"][0].get("runId") if r["progress"] else None
        _ = ckloc
    spark.stop()


if __name__ == "__main__":
    main()
