"""DuckDB oracle SQL — the independent re-statement of every query.

Each entry mirrors, expression for expression, the DataFrame plan
registered in `registry.py`; the driver runs both at sf0.01 and
hash-compares.  Shared derivations (sessionization, the behavior
model of operators/behavior_model.py) live in CTE fragments here so
all oracle queries consume identical inputs.

Parity rules baked in (see sources/loaders.py and functions/core.py):
floor-epoch seconds for timestamp diffs, sorted-distinct CSV aggs
with '' for empty, HALF_UP 2-dp ratios, md5-ordered deterministic
"random" sampling, explicit tie-breaks on every top-N.
"""

from __future__ import annotations

# ---- shared CTE fragments -------------------------------------------------

SESSIONIZE_CTES = """
_pre AS (
  SELECT e.*, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events e
),
_sess AS (
  SELECT *,
         sum(CASE WHEN prev_ts IS NULL
                    OR CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM _pre
),
actions AS (
  SELECT event_id, ts, user_id, event_type, value, props,
         user_id || '_' || session_seq AS session_id,
         strftime(ts, '%Y-%m-%d') AS day,
         CAST(hour(ts) AS BIGINT) AS hour,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS category_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS product_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 20 AS page_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS ad_id
  FROM _sess
)
"""

SESSION_STATS_CTE = """
session_stats AS (
  SELECT session_id,
         min(user_id) AS user_id,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_time,
         CAST(floor(epoch(max(ts))) AS BIGINT)
           - CAST(floor(epoch(min(ts))) AS BIGINT) AS visit_length,
         count(*) AS step_length,
         coalesce(string_agg(DISTINCT event_type, ',' ORDER BY event_type), '') AS event_types,
         coalesce(string_agg(DISTINCT category_id, ',' ORDER BY category_id)
                  FILTER (WHERE event_type = 'click'), '') AS click_category_ids,
         round(sum(value), 2) AS total_value,
         min(strftime(ts, '%Y-%m-%d')) AS day,
         min(CAST(hour(ts) AS BIGINT)) AS start_hour
  FROM actions
  GROUP BY session_id
)
"""

USERS_CTE = """
users AS (
  SELECT c_custkey AS user_id,
         c_custkey % 60 AS age,
         c_mktsegment AS professional,
         n_nationkey AS city_id,
         n_name AS city,
         r_name AS area,
         CASE WHEN c_custkey % 2 = 0 THEN 'male' ELSE 'female' END AS sex
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
)
"""

_VISIT_CONDS = [
    ("visit_1s_3s", "visit_length >= 1 AND visit_length <= 3"),
    ("visit_4s_6s", "visit_length >= 4 AND visit_length <= 6"),
    ("visit_7s_9s", "visit_length >= 7 AND visit_length <= 9"),
    ("visit_10s_30s", "visit_length >= 10 AND visit_length <= 30"),
    ("visit_30s_60s", "visit_length > 30 AND visit_length <= 60"),
    ("visit_1m_3m", "visit_length > 60 AND visit_length <= 180"),
    ("visit_3m_10m", "visit_length > 180 AND visit_length <= 600"),
    ("visit_10m_30m", "visit_length > 600 AND visit_length <= 1800"),
    ("visit_30m", "visit_length > 1800"),
]
_STEP_CONDS = [
    ("step_1_3", "step_length >= 1 AND step_length <= 3"),
    ("step_4_6", "step_length >= 4 AND step_length <= 6"),
    ("step_7_9", "step_length >= 7 AND step_length <= 9"),
    ("step_10_30", "step_length >= 10 AND step_length <= 30"),
    ("step_30_60", "step_length > 30 AND step_length <= 60"),
    ("step_60", "step_length > 60"),
]


def _aggr_stat_select(source: str) -> str:
    buckets = ",\n         ".join(
        f"round(CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS DOUBLE)"
        f" / CAST(count(*) AS DOUBLE), 2) AS {name}_ratio"
        for name, cond in _VISIT_CONDS + _STEP_CONDS
    )
    return f"SELECT count(*) AS session_count,\n         {buckets}\n  FROM {source}"


# ---- per-query oracle SQL -------------------------------------------------

ORACLE: dict[str, str] = {}

ORACLE["sessionize"] = f"""
WITH {SESSIONIZE_CTES}
SELECT event_id, session_id FROM actions
"""

ORACLE["session_stats"] = f"""
WITH {SESSIONIZE_CTES}, {SESSION_STATS_CTE}
SELECT * FROM session_stats
"""

ORACLE["session_aggr_stat"] = f"""
WITH {SESSIONIZE_CTES}, {SESSION_STATS_CTE}
{_aggr_stat_select("session_stats")}
"""

# fixed demo param set for the predicate engine (TaskParams in
# registry.demo_params): age 10-49, two segments, sex male,
# keywords overlap (click,purchase), no city/category/date bounds.
ORACLE["session_filtered_aggr_stat"] = f"""
WITH {SESSIONIZE_CTES}, {SESSION_STATS_CTE}, {USERS_CTE},
filtered AS (
  SELECT s.* FROM session_stats s JOIN users u USING (user_id)
  WHERE u.age >= 10 AND u.age <= 49
    AND u.professional IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
    AND u.sex = 'male'
    AND list_has_any(string_split(s.event_types, ','), ['click', 'purchase'])
)
{_aggr_stat_select("filtered")}
"""

ORACLE["session_random_extract"] = f"""
WITH {SESSIONIZE_CTES}, {SESSION_STATS_CTE},
quotas AS (
  SELECT *,
         count(*) OVER (PARTITION BY day) AS day_cnt,
         count(*) OVER (PARTITION BY day, start_hour) AS hour_cnt,
         floor(1000 / (SELECT count(DISTINCT day) FROM session_stats)) AS per_day,
         row_number() OVER (PARTITION BY day, start_hour
                            ORDER BY md5(session_id)) AS rn
  FROM session_stats
)
SELECT session_id, start_time, event_types, click_category_ids
FROM quotas
WHERE rn <= least(floor(CAST(hour_cnt AS DOUBLE) / CAST(day_cnt AS DOUBLE) * per_day),
                  hour_cnt)
"""

ORACLE["session_detail"] = f"""
WITH {SESSIONIZE_CTES}, {SESSION_STATS_CTE},
quotas AS (
  SELECT *,
         count(*) OVER (PARTITION BY day) AS day_cnt,
         count(*) OVER (PARTITION BY day, start_hour) AS hour_cnt,
         floor(1000 / (SELECT count(DISTINCT day) FROM session_stats)) AS per_day,
         row_number() OVER (PARTITION BY day, start_hour
                            ORDER BY md5(session_id)) AS rn
  FROM session_stats
),
chosen AS (
  SELECT session_id FROM quotas
  WHERE rn <= least(floor(CAST(hour_cnt AS DOUBLE) / CAST(day_cnt AS DOUBLE) * per_day),
                    hour_cnt)
)
SELECT a.event_id, a.session_id, a.user_id, a.event_type,
       strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS action_time,
       a.category_id, a.page_id
FROM actions a SEMI JOIN chosen c ON a.session_id = c.session_id
"""

ORACLE["top10_categories"] = f"""
WITH {SESSIONIZE_CTES}
SELECT category_id,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click_count,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS order_count,
       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS pay_count
FROM actions
WHERE category_id IS NOT NULL
GROUP BY category_id
ORDER BY click_count DESC, order_count DESC, pay_count DESC, category_id ASC
LIMIT 10
"""

ORACLE["top10_category_sessions"] = f"""
WITH {SESSIONIZE_CTES},
top10 AS (
  SELECT category_id,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click_count,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS order_count,
         sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS pay_count
  FROM actions
  WHERE category_id IS NOT NULL
  GROUP BY category_id
  ORDER BY click_count DESC, order_count DESC, pay_count DESC, category_id ASC
  LIMIT 10
),
per_session AS (
  SELECT a.category_id, a.session_id, count(*) AS click_count
  FROM actions a SEMI JOIN top10 t ON a.category_id = t.category_id
  WHERE a.event_type = 'click'
  GROUP BY a.category_id, a.session_id
)
SELECT category_id, session_id, click_count
FROM (
  SELECT *, row_number() OVER (PARTITION BY category_id
                               ORDER BY click_count DESC, session_id ASC) AS rn
  FROM per_session
)
WHERE rn <= 10
"""

# monetary values quantized per-row to 1e-4 via floor(x*10000+0.5)
# into BIGINT: these IEEE double ops are bit-identical across
# engines, and integer sums are exact / order-independent.
ORACLE["tpch_q1"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) / 10000.0, 2) AS sum_qty,
       round(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) / 10000.0, 2) AS sum_base_price,
       round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0, 2) AS sum_disc_price,
       round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000 + 0.5) AS BIGINT)) / 10000.0, 2) AS sum_charge,
       round(sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) / 10000.0 / count(*), 2) AS avg_qty,
       round(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) / 10000.0 / count(*), 2) AS avg_price,
       round(sum(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) / 10000.0 / count(*), 2) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2005-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLE["page_convert_rate"] = f"""
WITH {SESSIONIZE_CTES},
splits AS (
  SELECT session_id, event_type,
         lag(event_type) OVER (PARTITION BY session_id ORDER BY ts, event_id) AS prev_et
  FROM actions
),
pair_counts AS (
  SELECT prev_et || '_' || event_type AS split, count(*) AS pv
  FROM splits
  WHERE prev_et IS NOT NULL
    AND prev_et || '_' || event_type IN ('view_click', 'click_purchase', 'purchase_signup')
  GROUP BY 1
),
target(step, split) AS (VALUES (1, 'view_click'), (2, 'click_purchase'), (3, 'purchase_signup')),
start_cnt AS (SELECT count(*) AS start_pv FROM actions WHERE event_type = 'view'),
filled AS (
  SELECT step, split, coalesce(pv, 0) AS pv FROM target LEFT JOIN pair_counts USING (split)
)
SELECT step, split, CAST(pv AS BIGINT) AS pv,
       round(CAST(pv AS DOUBLE)
             / CAST(nullif(coalesce(lag(pv) OVER (ORDER BY step),
                                    (SELECT start_pv FROM start_cnt)), 0) AS DOUBLE),
             2) AS convert_rate
FROM filled
"""

ORACLE["area_top3_products"] = f"""
WITH {SESSIONIZE_CTES}, {USERS_CTE},
clicks AS (
  SELECT a.product_id, u.city_id, u.city, u.area
  FROM actions a JOIN users u USING (user_id)
  WHERE a.event_type = 'click'
),
counted AS (
  SELECT area, product_id, count(*) AS click_count,
         coalesce(string_agg(DISTINCT city_id || ':' || city, ','
                             ORDER BY city_id || ':' || city), '') AS city_infos
  FROM clicks GROUP BY area, product_id
),
top AS (
  SELECT *, row_number() OVER (PARTITION BY area
                               ORDER BY click_count DESC, product_id ASC) AS rn
  FROM counted
),
prod AS (
  SELECT p_partkey AS product_id, p_name AS product_name,
         CASE WHEN CAST(json_extract_string('{{"product_status": ' || (p_size % 2) || '}}',
                                            '$.product_status') AS BIGINT) = 0
              THEN 'self' ELSE 'third_party' END AS product_status
  FROM part
)
SELECT area,
       CASE area WHEN 'AFRICA' THEN 'A' WHEN 'AMERICA' THEN 'B' WHEN 'ASIA' THEN 'C'
                 WHEN 'EUROPE' THEN 'D' WHEN 'MIDDLE EAST' THEN 'E'
                 ELSE 'other' END AS area_level,
       product_id, click_count, city_infos,
       coalesce(product_name, 'unknown') AS product_name,
       coalesce(product_status, 'unknown') AS product_status,
       CAST(rn AS BIGINT) AS "rank"
FROM top LEFT JOIN prod USING (product_id)
WHERE rn <= 3
"""

ORACLE["ad_user_click_count"] = f"""
WITH {SESSIONIZE_CTES}
SELECT day, user_id, ad_id, count(*) AS click_count
FROM actions WHERE event_type = 'click'
GROUP BY day, user_id, ad_id
"""

ORACLE["ad_blacklist"] = f"""
WITH {SESSIONIZE_CTES}
SELECT DISTINCT user_id FROM (
  SELECT day, user_id, ad_id, count(*) AS click_count
  FROM actions WHERE event_type = 'click'
  GROUP BY day, user_id, ad_id
) WHERE click_count >= 2
"""

ORACLE["ad_stat"] = f"""
WITH {SESSIONIZE_CTES}, {USERS_CTE},
daily AS (
  SELECT a.day, u.area, u.city, a.ad_id, count(*) AS daily_count
  FROM actions a JOIN users u USING (user_id)
  WHERE a.event_type = 'click'
  GROUP BY a.day, u.area, u.city, a.ad_id
)
SELECT day, area AS province, city, ad_id,
       sum(daily_count) OVER (PARTITION BY area, city, ad_id ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS click_count
FROM daily
"""

ORACLE["ad_province_top3"] = f"""
WITH {SESSIONIZE_CTES}, {USERS_CTE},
daily AS (
  SELECT a.day, u.area AS province, a.ad_id, count(*) AS click_count
  FROM actions a JOIN users u USING (user_id)
  WHERE a.event_type = 'click'
  GROUP BY a.day, u.area, a.ad_id
)
SELECT day, province, ad_id, click_count
FROM (
  SELECT *, row_number() OVER (PARTITION BY day, province
                               ORDER BY click_count DESC, ad_id ASC) AS rn
  FROM daily
)
WHERE rn <= 3
"""

ORACLE["ad_click_trend"] = f"""
WITH {SESSIONIZE_CTES}
SELECT strftime(ts, '%Y-%m-%d %H:%M') AS minute, ad_id, count(*) AS click_count
FROM actions WHERE event_type = 'click'
GROUP BY 1, 2
"""

ORACLE["tpch_q3"] = """
SELECT l_orderkey,
       round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0, 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, order_date ASC, l_orderkey ASC
LIMIT 10
"""

ORACLE["tpch_q5"] = """
SELECT n_name,
       round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0, 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""
