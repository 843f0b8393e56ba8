"""End-to-end module runners driven by the reference's task_param
wire format (modules.run_task) — the migration path for a reference
user: same JSON in, same output tables out."""

from __future__ import annotations

import json

from analysisofuserbehavior_spark.modules import run_task

TASK_JSON = json.dumps(
    {
        "startDate": ["2024-01-03"],
        "endDate": ["2024-01-28"],
        "startAge": ["10"],
        "endAge": ["55"],
        "sex": ["male"],
        "keywords": ["click,view"],
        "targetPageFlow": ["view,click,purchase"],
    }
)


def test_run_task_produces_reference_output_tables(spark, sf_dir):
    out = run_task(spark, TASK_JSON, sf_dir)
    assert set(out) == {
        "session_aggr_stat",
        "session_random_extract",
        "session_detail",
        "top10_category",
        "top10_session",
        "page_split_convert_rate",
        "area_top3_product",
    }
    stat = out["session_aggr_stat"].collect()[0]
    assert stat["session_count"] > 0
    # all sessions fall inside the task's date range
    days = [r["day"] for r in out["session_detail"].select("day").distinct().collect()]
    assert all("2024-01-03" <= d <= "2024-01-28" for d in days)
    # funnel follows targetPageFlow (2 splits for a 3-page flow)
    steps = out["page_split_convert_rate"].collect()
    assert [r["split"] for r in sorted(steps, key=lambda r: r["step"])] == [
        "view_click",
        "click_purchase",
    ]
    assert out["area_top3_product"].count() > 0


def test_run_task_date_filter_pushes_to_scan(spark, sf_dir):
    from analysisofuserbehavior_spark import plans

    out = run_task(spark, TASK_JSON, sf_dir, modules=("session",))
    pushed = " ".join(plans.pushed_filters(out["session_aggr_stat"]))
    assert "GreaterThanOrEqual(ts," in pushed, pushed


def test_run_active_module(spark, sf_dir):
    from analysisofuserbehavior_spark.modules import run_task

    out = run_task(spark, TASK_JSON, sf_dir, modules=("active",))
    assert len(out) == 5
    for name, df in out.items():
        assert df.count() <= 10 * 2, name  # ≤10 winners (joined dims 1:1)


def test_run_ad_module_batch_twin(spark, sf_dir):
    """Module 4's batch twin returns the five ad output tables
    (AdClickRealTimeStatSpark.java:100-590), all restricted to the
    task's date range."""
    out = run_task(spark, TASK_JSON, sf_dir, modules=("ad",))
    assert set(out) == {
        "ad_user_click_count",
        "ad_blacklist",
        "ad_stat",
        "ad_province_top3",
        "ad_click_trend",
    }
    days = [
        r["day"]
        for r in out["ad_user_click_count"].select("day").distinct().collect()
    ]
    assert days and all("2024-01-03" <= d <= "2024-01-28" for d in days)
    assert out["ad_province_top3"].count() > 0
    # every province emits at most 3 ranked rows per day
    from pyspark.sql import functions as F

    over = (
        out["ad_province_top3"]
        .groupBy("day", "province")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") > 3)
        .count()
    )
    assert over == 0


def test_run_page_module_range_pushes_to_scan(spark, sf_dir):
    """Module 2 now mirrors the reference's getActionRDDByDateRange
    (PageOneStepConvertRateSpark.java:97): the task's ts range must
    reach the parquet scan as pushed-down predicates."""
    from analysisofuserbehavior_spark import plans

    out = run_task(spark, TASK_JSON, sf_dir, modules=("page",))
    pushed = " ".join(plans.pushed_filters(out["page_split_convert_rate"]))
    assert "GreaterThanOrEqual(ts," in pushed, pushed


def test_run_task_cache_shared_is_result_invariant(spark, sf_dir):
    """cache_shared only changes WHERE the shared session frame
    lives (persisted vs recomputed per output) — never the results."""
    cold = run_task(spark, TASK_JSON, sf_dir, modules=("session",))
    hot = run_task(spark, TASK_JSON, sf_dir, modules=("session",), cache_shared=True)
    try:
        for name in cold:
            a = sorted(map(tuple, cold[name].collect()))
            b = sorted(map(tuple, hot[name].collect()))
            assert a == b, name
    finally:
        spark.catalog.clearCache()


def test_shared_scan_results_identical(spark, sf_dir):
    """enable_shared_scan only changes physical reuse (one cached
    scan+sessionize for every registry._actions consumer) — results
    must be bit-identical to the uncached path, and the cached plan
    must actually reuse the in-memory frame."""
    from analysisofuserbehavior_spark import registry

    cold_stats = {tuple(r) for r in registry.QUERIES["session_stats"](spark, sf_dir).collect()}
    cold_top10 = [tuple(r) for r in registry.QUERIES["top10_categories"](spark, sf_dir).collect()]
    try:
        registry.enable_shared_scan(spark, sf_dir)
        hot_df = registry.QUERIES["session_stats"](spark, sf_dir)
        assert "InMemoryTableScan" in hot_df._sc._jvm.PythonSQLUtils.explainString(
            hot_df._jdf.queryExecution(), "simple"
        ) or "InMemoryRelation" in hot_df._jdf.queryExecution().toString()
        hot_stats = {tuple(r) for r in hot_df.collect()}
        hot_top10 = [tuple(r) for r in registry.QUERIES["top10_categories"](spark, sf_dir).collect()]
    finally:
        registry.disable_shared_scan(spark)
    assert hot_stats == cold_stats
    assert hot_top10 == cold_top10
    # cache is gone: the next plan is back to the parquet scan
    cold_again = registry.QUERIES["session_stats"](spark, sf_dir)
    assert "InMemoryTableScan" not in cold_again._jdf.queryExecution().toString()
