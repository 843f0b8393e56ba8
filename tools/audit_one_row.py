"""One-row-table audit: run the given queries (default: the current
round's touched set) against a temp SF dir where EVERY table holds
exactly one row, and compare with the DuckDB oracle on the same dir.

Degenerate inputs are where operators crash at scale (empty
post-filter frames, single-partition layouts); the audit pins that
each query either oracle-agrees on the one-row corpus or fails
LEGIBLY (the two-phase replay fixtures refuse zero-partition phases
with an explicit ValueError by design — those queries report
`legible-error` here, not a crash).

Usage: python tools/audit_one_row.py [src_sf_dir] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_oracle import compare, load_duckdb  # noqa: E402 - same dir

from analysisofuserbehavior_spark.oracle import ORACLE  # noqa: E402
from analysisofuserbehavior_spark.registry import QUERIES  # noqa: E402
from analysisofuserbehavior_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

ROUND_TOUCHED = [
    # round 9
    "bm25_topk_indexed",
    "ab_test_report",
    "bpe_learn_merges",
    "bpe_encode_stats",
    "hard_negative_mining",
    "funnel_within_window",
    "seasonal_anomaly_dow",
    "bm25_topk_incremental",
    "ab_test_cuped",
    "ab_test_mannwhitney",
    "ab_test_quantile_effects",
    "streaming_funnel_within_window",
    # round-6 carryovers (LM family + streaming replays)
    "unigram_surprisal",
    "backoff_surprisal",
    "remove_dup_spans",
    "streaming_scd2_crash_recovery",
    "pack_sequences",
    # round 10
    "embedding_dedup_clusters_lsh",
    "embedding_neardup",
    "dedup_simhash",
    "doc_rolling_fingerprint",
    "dedup_ngram_jaccard_prefix",
    "multitouch_attribution",
    "pii_scrub_report",
    "holt_trend_daily",
    "cusum_drift_daily",
    "theilsen_trend_daily",
    # round 11
    "run_task_area_top3",
    "run_task_page_convert",
    "run_task_ad_province_top3",
    "dsir_select",
    "train_eval_token_shift",
    "hybrid_rrf_topk",
    "mixture_resample",
    "trending_items_decayed",
    "rfm_segments",
    "changepoint_daily",
    # round 12
    "target_encode_category",
    "feature_hash_docs",
    "ann_lsh_topk",
    "item_communities_lpa",
    "embedding_covariance",
    "collocations_pmi",
    "winsorized_user_spend",
    "countmin_token_freq",
    "page_reachability_sql",
    "streaming_countmin_merge",
    "user_behavior_profile",
    "daily_anomaly_mad",
    "streaming_click_attribution_outer",
    "ann_recall_report",
    "user_erasure_audit",
    "daily_pivot_unpivot_roundtrip",
    "page_dwell_stats",
    "entry_exit_pages",
    "bounce_rate_daily",
    "session_depth_curve",
    "purchase_gap_distribution",
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or ROUND_TOUCHED
    spark = get_spark("audit_one_row", cpus=8)
    work = tempfile.mkdtemp(prefix="one_row_sf_")
    import glob as _glob

    for t in TABLES:
        stage = os.path.join(work, f"_stage_{t}")
        spark.read.parquet(f"{src}/{t}.parquet").limit(1).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        # DuckDB's views (and the driver's fixtures) expect a single
        # FILE per table, not a Spark part-file directory
        (part,) = _glob.glob(os.path.join(stage, "part-*.parquet"))
        os.replace(part, os.path.join(work, f"{t}.parquet"))
        shutil.rmtree(stage, ignore_errors=True)
    con = load_duckdb(work)
    agree = legible = 0
    failed = []
    for name in names:
        try:
            sdf = QUERIES[name](spark, work).toPandas()
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "no parquet part file" in msg or "injected crash did not fire" in msg:
                # the replay fixture's designed refusal on degenerate
                # phases — legible, not a crash
                print(f"LEGIBLE {name}: {msg.splitlines()[0][:100]}")
                legible += 1
                continue
            print(f"FAIL {name}: spark error: {msg.splitlines()[0][:200]}")
            failed.append(name)
            continue
        if name not in ORACLE:
            print(f"ROWS {name}: rows-only query, rows={len(sdf)}")
            agree += 1
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
            agree += 1
    print(
        f"AUDIT one-row: {agree} agree, {legible} legible-error, "
        f"{len(failed)} failures"
    )
    shutil.rmtree(work, ignore_errors=True)
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
