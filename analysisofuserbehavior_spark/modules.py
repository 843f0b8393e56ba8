"""Module runners — the reference's job lifecycle as pure functions.

Reference lifecycle (SURVEY.md §3): a MySQL `task` row's `task_param`
JSON drives spark-submit main()s that write MySQL tables.  Here each
module is `(spark, sf_dir, params) -> dict[str, DataFrame]` keyed by
the reference's output table names (§1.3); `run_task` parses the
reference's exact task_param wire format (ParamUtils.java:44-50 via
params.TaskParams.from_task_json) and runs the requested modules.
Sinks are the returned DataFrames — the caller writes them wherever
(parquet, JDBC via sources/jdbc.py); no DAO layer, no per-row writes.

A reference user migrates by submitting the SAME task_param JSON:

    out = run_task(spark, task_json, sf_dir)
    out["session_aggr_stat"].write.parquet(...)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators import behavior_model as bm
from .operators import session_analysis as sa
from .operators.area_products import area_top3_products
from .operators.page_flow import page_convert_rate
from .params import TaskParams
from .sources import load_table, ntz_lit


def _events_in_range(
    spark: SparkSession, sf_dir: str, params: TaskParams
) -> DataFrame:
    """Raw events restricted to the task's date range — the
    reference's interpolated-SQL scan (util/SparkUtils.java:64-90) as
    pushed-down predicates (the ntz-literal range on `ts` reaches the
    parquet row-group stats; a predicate on the derived `day` column
    can't)."""
    events = load_table(spark, sf_dir, "events")
    if params.start_date is not None:
        events = events.where(F.col("ts") >= ntz_lit(params.start_date))
    if params.end_date is not None:
        import datetime as dt

        end_next = (
            dt.date.fromisoformat(params.end_date) + dt.timedelta(days=1)
        ).isoformat()
        events = events.where(F.col("ts") < ntz_lit(end_next))
    return events


def _actions_in_range(spark: SparkSession, sf_dir: str, params: TaskParams) -> DataFrame:
    """The shared scan: sessionized actions over the ranged events."""
    return bm.actions(_events_in_range(spark, sf_dir, params))


def _users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm.user_info(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def run_session_module(
    spark: SparkSession, sf_dir: str, params: TaskParams,
    cache_shared: bool = False,
) -> dict[str, DataFrame]:
    """Module 1 (UserVisitSessionAnalyzeSpark.main:57-238) — all five
    output tables from one shared filtered-session frame.

    `cache_shared=True` persists the sessionized frame
    (MEMORY_AND_DISK) so the five outputs pay the events scan + the
    user-window shuffle ONCE instead of five times — the reference
    does the same with `sessionid2detailRDD.persist`
    (UserVisitSessionAnalyzeSpark.java:186).  Leave it off when the
    outputs are run far apart or the frame outsizes cluster memory;
    the caller owns unpersist."""
    actions = _actions_in_range(spark, sf_dir, params)
    if cache_shared:
        from pyspark import StorageLevel

        actions = actions.persist(StorageLevel.MEMORY_AND_DISK)
    sessions = sa.session_stats(actions)
    filtered = sa.filter_sessions(sessions, _users(spark, sf_dir), params)
    chosen = sa.session_random_extract(filtered, total=params.extract_count)
    top_cats = sa.top10_categories(actions)
    return {
        "session_aggr_stat": sa.session_aggr_stat(filtered),
        "session_random_extract": chosen,
        "session_detail": sa.session_detail(actions, chosen),
        "top10_category": top_cats,
        "top10_session": sa.top10_category_sessions(actions, top_cats),
    }


def run_page_module(
    spark: SparkSession, sf_dir: str, params: TaskParams
) -> dict[str, DataFrame]:
    """Module 2 (PageOneStepConvertRateSpark.main:47-115).  The
    reference restricts the scan to the task's date range
    (getActionRDDByDateRange, :97) before the session walk — mirrored
    here with the same pushed-down ts predicates as module 1/3."""
    flow = params.target_page_flow or ("view", "click", "purchase", "signup")
    events = _events_in_range(spark, sf_dir, params)
    return {
        "page_split_convert_rate": page_convert_rate(spark, events, tuple(flow))
    }


def run_area_module(
    spark: SparkSession, sf_dir: str, params: TaskParams
) -> dict[str, DataFrame]:
    """Module 3 (AreaTop3ProductSpark.main:63-130)."""
    actions = _actions_in_range(spark, sf_dir, params)
    products = bm.product_info(load_table(spark, sf_dir, "part"))
    return {
        "area_top3_product": area_top3_products(
            actions, _users(spark, sf_dir), products
        )
    }


def run_ad_module(
    spark: SparkSession, sf_dir: str, params: TaskParams
) -> dict[str, DataFrame]:
    """Module 4's BATCH twin (AdClickRealTimeStatSpark.main:100-590):
    the five ad output tables — per-user daily click counts, the
    100-click blacklist, the per-day/province/city running stat, the
    per-day province top-3, and the per-minute trend — computed over
    the ranged scan instead of the 5 s DStream cadence.  The live
    paths (stateful running totals, feedback blacklist loop, sliding
    trend) stay in streaming/ad_stream.py; this runner is the
    task_param-driven backfill/replay shape of the same tables."""
    from .operators import ad_stats as ads

    actions = _actions_in_range(spark, sf_dir, params)
    users = _users(spark, sf_dir)
    return {
        "ad_user_click_count": ads.ad_user_click_count(actions),
        "ad_blacklist": ads.ad_blacklist(actions),
        "ad_stat": ads.ad_stat(actions, users),
        "ad_province_top3": ads.ad_province_top3(actions, users),
        "ad_click_trend": ads.ad_click_trend(actions),
    }


MODULES = {
    "session": run_session_module,
    "page": run_page_module,
    "area": run_area_module,
    "ad": run_ad_module,
}


def run_task(
    spark: SparkSession,
    task_json: str,
    sf_dir: str,
    modules: tuple[str, ...] = ("session", "page", "area"),
    cache_shared: bool = False,
) -> dict[str, DataFrame]:
    """The spark-submit entry: reference-format task_param JSON in,
    every requested module's output tables out.  `cache_shared`
    persists module 1's shared session frame across its five
    outputs (see run_session_module)."""
    params = TaskParams.from_task_json(task_json)
    out: dict[str, DataFrame] = {}
    for name in modules:
        fn = MODULES[name]
        if name == "session":
            out.update(fn(spark, sf_dir, params, cache_shared=cache_shared))
        else:
            out.update(fn(spark, sf_dir, params))
    return out


def run_active_module(
    spark: SparkSession, sf_dir: str, params: TaskParams
) -> dict[str, DataFrame]:
    """Module 5 (UserActiveDegreeAnalyze.scala) — the five
    active-degree top-10s; period = the task's date range when given."""
    from .operators import user_active as ua

    events = load_table(spark, sf_dir, "events")
    users = _users(spark, sf_dir)
    kw: dict = {}
    if params.start_date and params.end_date:
        kw = {"start": params.start_date, "end": params.end_date}
    return {
        "top10_active_users": ua.top10_active_users(events, users, **kw),
        "top10_purchase_users": ua.top10_purchase_users(events, users, **kw),
        "top10_visit_growth": ua.top10_visit_growth(events, users),
        "top10_purchase_growth": ua.top10_purchase_growth(events, users),
        "top10_first_week_active": ua.top10_first_week_active(events, users),
    }


MODULES["active"] = run_active_module
