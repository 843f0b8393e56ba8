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
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS total_value,
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
        f"floor(CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS DOUBLE)"
        f" / CAST(count(*) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS {name}_ratio"
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
SELECT CAST(1 AS BIGINT) AS task_id, a.user_id, a.session_id, a.page_id,
       strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS action_time,
       coalesce(CASE WHEN a.event_type = 'view'
                     THEN 'kw_' || a.category_id END, '') AS search_keyword,
       coalesce(CASE WHEN a.event_type = 'click'
                     THEN a.category_id END, 0) AS click_category_id,
       coalesce(CASE WHEN a.event_type = 'click'
                     THEN a.product_id END, 0) AS click_product_id,
       coalesce(CASE WHEN a.event_type = 'purchase'
                     THEN CAST(a.category_id AS VARCHAR) END, '') AS order_category_ids,
       coalesce(CASE WHEN a.event_type = 'purchase'
                     THEN CAST(a.product_id AS VARCHAR) END, '') AS order_product_ids,
       coalesce(CASE WHEN a.event_type = 'signup'
                     THEN CAST(a.category_id AS VARCHAR) END, '') AS pay_category_ids,
       coalesce(CASE WHEN a.event_type = 'signup'
                     THEN CAST(a.product_id AS VARCHAR) END, '') AS pay_product_ids
FROM actions a SEMI JOIN chosen c ON a.session_id = c.session_id
"""

ORACLE["top10_categories"] = f"""
WITH {SESSIONIZE_CTES}
SELECT category_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_count,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS order_count,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS pay_count
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
       floor(sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) / 10000.0 * 100.0 + 0.5) / 100.0 AS sum_qty,
       floor(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) / 10000.0 * 100.0 + 0.5) / 100.0 AS sum_base_price,
       floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 * 100.0 + 0.5) / 100.0 AS sum_disc_price,
       floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000 + 0.5) AS BIGINT)) / 10000.0 * 100.0 + 0.5) / 100.0 AS sum_charge,
       floor(sum(CAST(floor(l_quantity * 10000 + 0.5) AS BIGINT)) / 10000.0 / count(*) * 100.0 + 0.5) / 100.0 AS avg_qty,
       floor(sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) / 10000.0 / count(*) * 100.0 + 0.5) / 100.0 AS avg_price,
       floor(sum(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) / 10000.0 / count(*) * 100.0 + 0.5) / 100.0 AS avg_disc,
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
       floor(CAST(pv AS DOUBLE)
             / CAST(nullif(coalesce(lag(pv) OVER (ORDER BY step),
                                    (SELECT start_pv FROM start_cnt)), 0) AS DOUBLE)
             * 100.0 + 0.5) / 100.0 AS convert_rate
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
       CAST(sum(daily_count) OVER (PARTITION BY area, city, ad_id ORDER BY day
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS click_count
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
       floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 * 100.0 + 0.5) / 100.0 AS revenue,
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
       floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 * 100.0 + 0.5) / 100.0 AS revenue
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

# ---- LLM-data-pipeline operators ------------------------------------------

SHINGLES_CTE = """
_docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
dsh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 2),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
  FROM _docs WHERE len(toks) >= 3
)
"""

_JACCARD_BODY = f"""
WITH {SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM dsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM dsh a JOIN dsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       floor(CAST(inter AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.8
"""

ORACLE["dedup_exact"] = """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""

# mirrors the engine's default max_df=1000 stop-shingle cap: shingles
# shared by more than 1000 docs leave the similarity universe entirely
# (both intersection counts and per-doc sizes), like stopword removal.
ORACLE["dedup_ngram_jaccard"] = f"""
WITH {SHINGLES_CTE},
heavy AS (SELECT shingle FROM dsh GROUP BY shingle HAVING count(*) > 1000),
fsh AS (SELECT * FROM dsh WHERE shingle NOT IN (SELECT shingle FROM heavy)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM fsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM fsh a JOIN fsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       floor(CAST(inter AS DOUBLE)
             / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) * 1000.0 + 0.5) / 1000.0 AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.8
"""

# the prefix-filtered All-Pairs variant is output-identical to the
# capped exact join BY THEOREM (completeness proof in
# operators/dedup.py::ngram_jaccard_pairs_prefix), so its oracle IS
# dedup_ngram_jaccard's — the aliasing used for ann_ivf_topk_indexed
ORACLE["dedup_ngram_jaccard_prefix"] = ORACLE["dedup_ngram_jaccard"]

# minhash+LSH verifies candidates exactly; at >=0.8 threshold its
# recall on this corpus is 1 - (1 - s^4)^8 with s >= 0.96 → misses
# with p < 3e-7, so the exact-jaccard oracle is the correct target.
ORACLE["dedup_minhash_lsh"] = _JACCARD_BODY

# connected components as SQL: DuckDB's recursive CTE computes the
# transitive closure over the (symmetric, self-looped) >=0.8-jaccard
# pair graph — cluster_id = min reachable doc_id, exactly the
# fixpoint the Spark pointer-jumping loop converges to.  Closure size
# is Σ|component|², fine for the near-dup cliques in this corpus;
# the engine-side loop stays the scale path.  This upgrades the
# "iterative ⇒ rows-only" claim from rounds 3-5: the fixpoint IS
# ANSI-SQL-expressible, so the driver can hash-gate it.
_CLUSTERS_CTES = f"""
{SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM dsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM dsh a JOIN dsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
p AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.8
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM p
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM p
),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
cl AS (
  SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
  FROM reach GROUP BY a
)
"""

ORACLE["dedup_clusters"] = f"""
WITH RECURSIVE {_CLUSTERS_CTES}
SELECT doc_id, cluster_id FROM cl
"""

# leakage-safe split = the same closure, every doc labeled by its
# cluster (singletons label themselves), bucket = first 4 hex of
# md5('v1:' || cluster_id), eval iff bucket < '1999'
ORACLE["leakage_safe_split"] = f"""
WITH RECURSIVE {_CLUSTERS_CTES},
lab AS (
  SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN cl USING (doc_id)
),
b AS (
  SELECT doc_id, cluster_id,
         substring(md5('v1:' || CAST(cluster_id AS VARCHAR)), 1, 4) AS bucket
  FROM lab
)
SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id, bucket,
       CASE WHEN bucket < '1999' THEN 'eval' ELSE 'train' END AS split
FROM b
"""

# mirror of registry::embedding_dedup_clusters — transitive closure
# (min reachable id) over exact cosine >= 0.4 embedding pairs; same
# recursive-CTE class as dedup_clusters
ORACLE["embedding_dedup_clusters"] = """
WITH RECURSIVE e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
p AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.4
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM p
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM p
),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
  UNION
  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a
),
cl AS (
  SELECT a AS vec_id, CAST(min(b) AS BIGINT) AS cluster_id
  FROM reach GROUP BY a
)
SELECT vec_id, cluster_id FROM cl
"""

# ranks order by the QUANTIZED similarity (3 dp, mirroring qround in
# the engine) so cross-engine last-ULP differences can't flip ranks
ORACLE["ann_cosine_topk"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.v, c.v) AS sim,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY floor(list_cosine_similarity(q.v, c.v) * 1000.0 + 0.5) / 1000.0 DESC,
                                     c.vec_id ASC) AS rn
  FROM e q JOIN e c ON c.vec_id != q.vec_id
  WHERE q.vec_id < 10
)
SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id, floor(sim * 1000.0 + 0.5) / 1000.0 AS sim
FROM sims WHERE rn <= 5
"""

ORACLE["seasonal_anomaly_dow"] = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS c
  FROM events GROUP BY 1, 2
),
dowd AS (
  SELECT *,
         CAST(((date_diff('day', DATE '2024-01-01', CAST(day AS DATE)) % 7) + 7) % 7
              AS INTEGER) AS dow
  FROM daily
),
season AS (
  SELECT event_type, dow, count(*) AS n, sum(c) AS t1, sum(c * c) AS t2
  FROM dowd GROUP BY 1, 2
),
j AS (
  SELECT d.event_type, d.day, d.dow, d.c,
         CAST(s.n - 1 AS BIGINT) AS np,
         CAST(s.t1 - d.c AS BIGINT) AS s1,
         CAST(s.t2 - d.c * d.c AS BIGINT) AS s2
  FROM dowd d JOIN season s USING (event_type, dow)
  WHERE s.n - 1 >= 2
)
SELECT event_type, day, dow, CAST(c AS BIGINT) AS n_events,
       floor(CAST(s1 AS DOUBLE) / CAST(np AS DOUBLE) * 1000000.0 + 0.5)
         / 1000000.0 AS dow_mean,
       floor(CASE WHEN np * s2 - s1 * s1 > 0 THEN
               CAST(c * np - s1 AS DOUBLE)
               / (CAST(np AS DOUBLE)
                  * sqrt(CAST(np * s2 - s1 * s1 AS DOUBLE)
                         / (CAST(np AS DOUBLE) * CAST(np - 1 AS DOUBLE))))
             END * 10000.0 + 0.5) / 10000.0 AS zscore,
       (c * np - s1) * (c * np - s1) * (np - 1) > 4 * np * (np * s2 - s1 * s1)
         AS is_anomaly
FROM j ORDER BY event_type, day
"""

# windowFunnel: brute-force EXISTS restatement — the operator's fold
# is the thing under test, so the oracle deliberately takes the
# naive |v|x|c|x|p| join shape the operator avoids.  6h window in us.
# The streaming twin must land on the same batch answer, so it shares
# the oracle (assigned below the definition).
ORACLE["funnel_within_window"] = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
u1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
u2 AS (SELECT DISTINCT v.user_id FROM e v JOIN e c ON c.user_id = v.user_id
       WHERE v.event_type = 'view' AND c.event_type = 'click'
         AND (c.us > v.us OR (c.us = v.us AND c.event_id > v.event_id))
         AND c.us - v.us <= 21600000000),
u3 AS (SELECT DISTINCT v.user_id
       FROM e v JOIN e c ON c.user_id = v.user_id
                JOIN e p ON p.user_id = v.user_id
       WHERE v.event_type = 'view' AND c.event_type = 'click'
         AND p.event_type = 'purchase'
         AND (c.us > v.us OR (c.us = v.us AND c.event_id > v.event_id))
         AND (p.us > c.us OR (p.us = c.us AND p.event_id > c.event_id))
         AND c.us - v.us <= 21600000000
         AND p.us - v.us <= 21600000000)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step, 'view' AS stage,
         CAST((SELECT count(*) FROM u1) AS BIGINT) AS users
  UNION ALL
  SELECT CAST(2 AS BIGINT), 'view>click',
         CAST((SELECT count(*) FROM u2) AS BIGINT)
  UNION ALL
  SELECT CAST(3 AS BIGINT), 'view>click>purchase',
         CAST((SELECT count(*) FROM u3) AS BIGINT)
) ORDER BY step
"""

ORACLE["streaming_funnel_within_window"] = ORACLE["funnel_within_window"]

ORACLE["hard_negative_mining"] = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sims AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
         list_cosine_similarity(q.v, c.v) AS sim,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY floor(list_cosine_similarity(q.v, c.v) * 1000.0 + 0.5) / 1000.0 DESC,
                                     c.vec_id ASC) AS rn
  FROM e q JOIN e c ON c.label != q.label
  WHERE q.vec_id < 10
    AND floor(list_cosine_similarity(q.v, c.v) * 1000.0 + 0.5) / 1000.0 < 0.95
)
SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id,
       CAST(neighbor_label AS INTEGER) AS neighbor_label,
       floor(sim * 1000.0 + 0.5) / 1000.0 AS sim
FROM sims WHERE rn <= 5
"""

_STOPLIST = "['the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'with']"

# run_task migration path: the task_param drives a DATE-RESTRICTED
# scan (ts in [startDate, endDate+1d), pushed down BEFORE
# sessionization, util/SparkUtils.java:64-90) and the session
# predicate engine; sessions are recomputed within the range exactly
# like the reference's interpolated-SQL scan.
_RANGED_SESSIONIZE = SESSIONIZE_CTES.replace(
    "FROM events e",
    "FROM (SELECT * FROM events "
    "WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' "
    "AND ts < TIMESTAMP '2024-01-29 00:00:00') e",
)
ORACLE["run_task_session_aggr"] = f"""
WITH {_RANGED_SESSIONIZE}, {SESSION_STATS_CTE}, {USERS_CTE},
filtered AS (
  SELECT s.* FROM session_stats s JOIN users u USING (user_id)
  WHERE u.age >= 10 AND u.age <= 55
    AND u.sex = 'male'
    AND list_has_any(string_split(s.event_types, ','), ['click', 'view'])
    AND s.day >= '2024-01-03' AND s.day <= '2024-01-28'
)
{_aggr_stat_select("filtered")}
"""

# module-3 lifecycle twin (VERDICT r08 #5): the area top-3 pipeline
# over the SAME task_param-restricted scan — identical SQL to
# area_top3_products with the ranged sessionize CTE swapped in
# (string replace is exact because the f-string interpolated
# SESSIONIZE_CTES verbatim)
ORACLE["run_task_area_top3"] = ORACLE["area_top3_products"].replace(
    SESSIONIZE_CTES, _RANGED_SESSIONIZE
)

# module-2 and module-4 lifecycle twins: same ranged-scan swap over
# the page funnel and the ad province top-3 (the batch replay of the
# streaming module's transform+SQL stage)
ORACLE["run_task_page_convert"] = ORACLE["page_convert_rate"].replace(
    SESSIONIZE_CTES, _RANGED_SESSIONIZE
)
ORACLE["run_task_ad_province_top3"] = ORACLE["ad_province_top3"].replace(
    SESSIONIZE_CTES, _RANGED_SESSIONIZE
)

# temperature-mixture resample: per-language α=0.25 weight (the
# mixture_temperature_weights pipeline, quantized 4 dp exactly as the
# report emits it), then integer copy counts — n_full = w4 div 10000,
# one extra copy iff the 4-hex md5 bucket clears the fractional
# threshold (w4 mod 10000)·65536 div 10000 — and generate_series
# replication
ORACLE["mixture_resample"] = """
WITH per_lang AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS t FROM per_lang),
s AS (
  SELECT lang,
         CAST(n_tokens AS DOUBLE) / t AS share,
         sqrt(sqrt(CAST(n_tokens AS DOUBLE) / t)) AS sv
  FROM per_lang, tot
),
z AS (SELECT sum(sv) AS z FROM s),
w AS (
  SELECT lang,
         CAST(floor(floor((sv / z) / share * 10000.0 + 0.5) / 10000.0
                    * 10000.0 + 0.5) AS BIGINT) AS w4
  FROM s, z
),
j AS (
  SELECT d.doc_id, d.lang,
         CAST(w.w4 AS DOUBLE) / 10000.0 AS weight,
         w.w4 // 10000 AS n_full,
         printf('%04x', (w.w4 % 10000) * 65536 // 10000) AS thresh,
         substring(md5('mix1:' || CAST(d.doc_id AS VARCHAR)), 1, 4) AS bucket
  FROM documents d JOIN w USING (lang)
),
n AS (
  SELECT doc_id, lang, weight,
         n_full + CASE WHEN bucket < thresh THEN 1 ELSE 0 END AS n
  FROM j
)
SELECT doc_id, lang, weight,
       CAST(unnest(generate_series(1, n)) AS BIGINT) AS copy_idx
FROM n WHERE n >= 1
"""

# hybrid retrieval RRF fusion: lexical distinct-token Jaccard rank +
# embedding cosine rank per pivot query, ranks ordered by the
# 3-dp-quantized sim + id (the _sim_order discipline), full-outer
# fused with rrf = 1/(60+lex_rank) + 1/(60+sem_rank) (missing side
# contributes 0), top-10 per query on the 9-dp-quantized score
ORACLE["hybrid_rrf_topk"] = """
WITH toks AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS dt FROM documents
),
lexq AS (SELECT doc_id AS query_id, dt AS qt FROM toks WHERE doc_id < 5),
lexsims AS (
  SELECT q.query_id, t.doc_id,
         CAST(len(list_intersect(t.dt, q.qt)) AS DOUBLE)
         / (CAST(len(t.dt) + len(q.qt) AS DOUBLE)
            - CAST(len(list_intersect(t.dt, q.qt)) AS DOUBLE)) AS sim
  FROM toks t JOIN lexq q ON t.doc_id != q.query_id
),
lexr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY floor(sim * 1000.0 + 0.5) / 1000.0 DESC,
                                     doc_id ASC) AS lex_rank
  FROM lexsims
),
lexd AS (SELECT query_id, doc_id, CAST(lex_rank AS BIGINT) AS lex_rank
         FROM lexr WHERE lex_rank <= 50),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
semq AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < 5),
semsims AS (
  SELECT q.query_id, c.vec_id AS doc_id, list_cosine_similarity(q.v, c.v) AS sim
  FROM e c JOIN semq q ON c.vec_id != q.query_id
),
semr AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY floor(sim * 1000.0 + 0.5) / 1000.0 DESC,
                                     doc_id ASC) AS sem_rank
  FROM semsims
),
semd AS (SELECT query_id, doc_id, CAST(sem_rank AS BIGINT) AS sem_rank
         FROM semr WHERE sem_rank <= 50),
fused AS (
  SELECT coalesce(l.query_id, s.query_id) AS query_id,
         coalesce(l.doc_id, s.doc_id) AS doc_id,
         l.lex_rank, s.sem_rank,
         floor((coalesce(1.0 / (60.0 + CAST(l.lex_rank AS DOUBLE)), 0.0)
                + coalesce(1.0 / (60.0 + CAST(s.sem_rank AS DOUBLE)), 0.0))
               * 1000000000.0 + 0.5) / 1000000000.0 AS rrf_score
  FROM lexd l
  FULL OUTER JOIN semd s
    ON l.query_id = s.query_id AND l.doc_id = s.doc_id
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf_score DESC, doc_id ASC) AS rank
  FROM fused
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, lex_rank, sem_rank, rrf_score
FROM ranked WHERE rank <= 10
"""

# DSIR importance-resampling selection: hashed-unigram add-1 LMs of
# the quality-gated target subset vs the raw corpus (bucket =
# md5_prefix32 mod 8192 — the cross-engine mixer), target membership
# decided in integer space (floor(q*100+0.5) >= 80), per-doc log2
# importance ratio mirrored expression-for-expression; selected =
# top quartile of the integer micro-bits-per-token key (ntile(4)
# over (lw, doc_id) — exact ntile semantics in both engines)
ORACLE["dsir_select"] = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
q AS (
  SELECT doc_id, toks,
         CAST(floor((least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.6
               + least((CAST(len(list_filter(toks, x -> list_contains({_STOPLIST}, x))) AS DOUBLE)
                        / CAST(len(toks) AS DOUBLE)) / 0.1, 1.0) * 0.4)
               * 100.0 + 0.5) AS BIGINT) >= 80 AS is_target
  FROM t
),
pairs AS (
  SELECT doc_id, is_target,
         CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 8192 AS bucket,
         count(*) AS tf
  FROM (SELECT doc_id, is_target, unnest(toks) AS tok FROM q)
  GROUP BY doc_id, is_target, bucket
),
counts AS (
  SELECT bucket,
         CAST(sum(tf) AS BIGINT) AS c_raw,
         CAST(coalesce(sum(CASE WHEN is_target THEN tf END), 0) AS BIGINT) AS c_t
  FROM pairs GROUP BY bucket
),
totals AS (
  SELECT CAST(sum(c_raw) AS DOUBLE) AS t_raw,
         CAST(sum(c_t) AS DOUBLE) AS t_t
  FROM counts
),
llr AS (
  SELECT bucket,
         log2(CAST(c_t AS DOUBLE) + 1.0) - log2(CAST(c_raw AS DOUBLE) + 1.0) AS llr
  FROM counts
),
scored AS (
  SELECT p.doc_id, p.is_target,
         CAST(sum(p.tf) AS BIGINT) AS n_tokens,
         sum(CAST(p.tf AS DOUBLE) * l.llr) AS bits
  FROM pairs p JOIN llr l USING (bucket)
  GROUP BY p.doc_id, p.is_target
),
fin AS (
  SELECT doc_id, is_target, n_tokens,
         floor((bits + CAST(n_tokens AS DOUBLE)
                       * (log2(t_raw + 8192.0) - log2(t_t + 8192.0)))
               * 1000000.0 + 0.5) / 1000000.0 AS logw_bits,
         CAST(floor((bits + CAST(n_tokens AS DOUBLE)
                       * (log2(t_raw + 8192.0) - log2(t_t + 8192.0)))
               / CAST(n_tokens AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS lw
  FROM scored CROSS JOIN totals
),
cut AS (
  SELECT doc_id, is_target, n_tokens, logw_bits,
         ntile(4) OVER (ORDER BY lw, doc_id) AS quartile
  FROM fin
)
SELECT doc_id, is_target, n_tokens, logw_bits,
       CAST(quartile AS INTEGER) AS quartile,
       quartile = 4 AS selected
FROM cut
"""

# train/eval token-distribution shift: same md5 hash split as
# train_eval_split, exact conditional counts per token, add-1
# smoothed log2 shift + eval-side KL term as fixed per-row float
# expressions (no cross-row float sum), top-30 by |kl_term| with
# token tiebreak
ORACLE["train_eval_token_shift"] = """
WITH d AS (
  SELECT substring(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 4) < '1999' AS is_eval,
         text
  FROM documents
),
counts AS (
  SELECT tok AS token,
         CAST(coalesce(sum(CASE WHEN NOT is_eval THEN 1 END), 0) AS BIGINT) AS c_train,
         CAST(coalesce(sum(CASE WHEN is_eval THEN 1 END), 0) AS BIGINT) AS c_eval
  FROM (SELECT is_eval, unnest(string_split(text, ' ')) AS tok FROM d)
  GROUP BY tok
),
totals AS (
  SELECT CAST(sum(c_train) AS DOUBLE) AS t_train,
         CAST(sum(c_eval) AS DOUBLE) AS t_eval,
         CAST(count(*) AS DOUBLE) AS v
  FROM counts
),
scored AS (
  SELECT token, c_train, c_eval,
         floor((log2((CAST(c_eval AS DOUBLE) + 1.0) / (t_eval + v))
                - log2((CAST(c_train AS DOUBLE) + 1.0) / (t_train + v)))
               * 1000000.0 + 0.5) / 1000000.0 AS shift_bits,
         floor(((CAST(c_eval AS DOUBLE) + 1.0) / (t_eval + v)
                * (log2((CAST(c_eval AS DOUBLE) + 1.0) / (t_eval + v))
                   - log2((CAST(c_train AS DOUBLE) + 1.0) / (t_train + v))))
               * 1000000000.0 + 0.5) / 1000000000.0 AS kl_term
  FROM counts CROSS JOIN totals
)
SELECT token, c_train, c_eval, shift_bits, kl_term
FROM scored
ORDER BY abs(kl_term) DESC, token
LIMIT 30
"""

# quality-proportional sampling: identical quality formula as
# text_stats, then keep <=> lpad(md5-prefix,5) < %05x of the exact
# integer threshold (q100*65536 div 100) — lexical == numeric in
# fixed-width lowercase hex
ORACLE["quality_weighted_sample"] = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, x -> list_contains({_STOPLIST}, x))) AS BIGINT) AS n_stop
  FROM t
),
q AS (
  SELECT doc_id,
         floor((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.6
               + least((CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 0.1, 1.0) * 0.4)
               * 100.0 + 0.5) / 100.0 AS quality_score
  FROM m
),
h AS (
  SELECT doc_id, quality_score,
         lpad(substring(md5('qs1:' || CAST(doc_id AS VARCHAR)), 1, 4), 5, '0') AS bucket,
         printf('%05x', CAST(floor((CAST(floor(quality_score * 100 + 0.5) AS BIGINT) * 65536) / 100) AS BIGINT)) AS thresh
  FROM q
)
SELECT doc_id, quality_score, bucket, bucket < thresh AS kept FROM h
"""

# quantile_disc = percentile_disc semantics (smallest value with
# CDF >= p) — the engine computes the same pick via count-by-value +
# integer threshold math instead of a global sort
ORACLE["doc_length_quantiles"] = """
WITH n AS (SELECT len(string_split(text, ' ')) AS n_words FROM documents)
SELECT CAST(quantile_disc(n_words, 0.10) AS BIGINT) AS p10_words,
       CAST(quantile_disc(n_words, 0.50) AS BIGINT) AS p50_words,
       CAST(quantile_disc(n_words, 0.90) AS BIGINT) AS p90_words,
       CAST(quantile_disc(n_words, 0.99) AS BIGINT) AS p99_words
FROM n
"""

# dup fractions are exact IEEE divisions of two small ints in both
# engines; 6-dp quantization mirrors the engine's qround
ORACLE["repetition_stats"] = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id, toks,
         list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1]) AS g2,
         list_transform(generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g3
  FROM t
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_words,
       floor((CASE WHEN len(toks) > 0
                   THEN CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks)
                   ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS dup_word_frac,
       floor((CASE WHEN len(g2) > 0
                   THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
                   ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS dup_2gram_frac,
       floor((CASE WHEN len(g3) > 0
                   THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
                   ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS dup_3gram_frac
FROM g
"""

ORACLE["text_stats"] = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
),
m AS (
  SELECT doc_id, text,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, x -> list_contains({_STOPLIST}, x))) AS BIGINT) AS n_stop,
         CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       floor(CAST(n_alpha AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 100.0 + 0.5) / 100.0 AS avg_token_len,
       floor(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 100.0 + 0.5) / 100.0 AS stopword_ratio,
       floor((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.6
             + least((CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 0.1, 1.0) * 0.4)
             * 100.0 + 0.5) / 100.0 AS quality_score
FROM m
"""

ORACLE["lang_id"] = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(list_filter(toks, x -> list_contains({_STOPLIST}, x))) AS DOUBLE)
           / CAST(len(toks) AS DOUBLE) AS ratio
  FROM t
)
SELECT doc_id, floor(ratio * 1000.0 + 0.5) / 1000.0 AS en_ratio,
       CASE WHEN ratio >= 0.02 THEN 'en' ELSE 'unk' END AS lang_guess
FROM m
"""

ORACLE["doc_fingerprint"] = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
FROM documents
"""

# order-sensitive Rabin-Karp fingerprint — hash-gated since round 10:
# md5_prefix32 token mixer (cross-engine bit-identical), same B/M and
# the same left-to-right fold as Spark's F.aggregate
ORACLE["doc_rolling_fingerprint"] = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ' '),
             t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 2147483647)),
         (acc, h) -> (acc * 1000003 + h) % 2147483647) AS rolling_fp
FROM documents
"""


def _simhash_sql() -> str:
    """Mirror of dedup.py::simhash_signatures/simhash_pairs — 32-bit
    md5_prefix32 token hash, ±1 bit votes, sign signature, 4×8-bit
    banded candidate join (pigeonhole for hamming ≤ 3), exact
    bit_count(xor) verification.  Pure integer algebra end to end,
    generated from the same SIMHASH_BITS/band constants."""
    bits, n_bands = 32, 4
    band_bits = bits // n_bands
    votes = ",\n         ".join(
        f"sum(((h >> {i}) & 1) * 2 - 1) AS v{i}" for i in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(bits)
    )
    bands = "\n  UNION ALL ".join(
        f"SELECT doc_id, simhash, {bi} AS band, "
        f"(simhash >> {bi * band_bits}) & {(1 << band_bits) - 1} AS bucket FROM sig"
        for bi in range(n_bands)
    )
    return f"""WITH toks AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM toks GROUP BY doc_id
),
sig AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes),
banded AS (
  {bands}
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, x.simhash AS sim_a,
                  y.doc_id AS doc_b, y.simhash AS sim_b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3"""


ORACLE["dedup_simhash"] = _simhash_sql()

# session_window semantics: a gap of EXACTLY 30 min starts a new
# session (exclusive window end) — hence >= on an exact INTERVAL
# comparison, unlike the lag-based sessionize's floor-epoch `>`.
ORACLE["session_window_rollup"] = """
WITH _pre AS (
  SELECT e.*, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events e
),
_sess AS (
  SELECT *,
         sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM _pre
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events
FROM _sess
GROUP BY user_id, session_seq
"""

ORACLE["streaming_hourly_clicks"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS ad_id,
       count(*) AS click_count
FROM events
WHERE event_type = 'click'
GROUP BY 1, 2
"""

# SQL-surface variant computes the identical result
ORACLE["area_top3_products_sql"] = ORACLE["area_top3_products"]


# ---- module 5: user-active-degree (UserActiveDegreeAnalyze.scala) ---------

_EV_DAY = "ev AS (SELECT *, strftime(ts, '%Y-%m-%d') AS day FROM events)"
_P1 = ("2024-01-01", "2024-01-15")
_P2 = ("2024-01-16", "2024-01-30")

_TOP10_TAIL = """
top AS (SELECT * FROM agg ORDER BY {metric} DESC, user_id LIMIT 10)
SELECT t.user_id, t.{metric}, u.city, u.area
FROM top t JOIN users u USING (user_id)
"""

ORACLE["top10_active_users"] = f"""
WITH {_EV_DAY}, {USERS_CTE},
agg AS (
  SELECT user_id, count(*) AS action_count FROM ev
  WHERE event_type = 'click' AND day BETWEEN '{_P2[0]}' AND '{_P2[1]}'
  GROUP BY user_id
),
{_TOP10_TAIL.format(metric="action_count")}
"""

ORACLE["top10_purchase_users"] = f"""
WITH {_EV_DAY}, {USERS_CTE},
agg AS (
  SELECT user_id,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS purchase_money
  FROM ev
  WHERE event_type = 'purchase' AND day BETWEEN '{_P2[0]}' AND '{_P2[1]}'
  GROUP BY user_id
),
{_TOP10_TAIL.format(metric="purchase_money")}
"""

ORACLE["top10_visit_growth"] = f"""
WITH {_EV_DAY}, {USERS_CTE},
agg AS (
  SELECT user_id,
         CAST(sum(CASE WHEN day BETWEEN '{_P2[0]}' AND '{_P2[1]}' THEN 1
                       WHEN day BETWEEN '{_P1[0]}' AND '{_P1[1]}' THEN -1
                       ELSE 0 END) AS BIGINT) AS action_incr
  FROM ev WHERE event_type = 'click'
  GROUP BY user_id
),
{_TOP10_TAIL.format(metric="action_incr")}
"""

ORACLE["top10_purchase_growth"] = f"""
WITH {_EV_DAY}, {USERS_CTE},
agg AS (
  SELECT user_id,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
             * (CASE WHEN day BETWEEN '{_P2[0]}' AND '{_P2[1]}' THEN 1
                     WHEN day BETWEEN '{_P1[0]}' AND '{_P1[1]}' THEN -1
                     ELSE 0 END)) / 100.0 AS money_incr
  FROM ev WHERE event_type = 'purchase'
  GROUP BY user_id
),
{_TOP10_TAIL.format(metric="money_incr")}
"""

ORACLE["top10_first_week_active"] = f"""
WITH {_EV_DAY}, {USERS_CTE},
firsts AS (SELECT user_id, min(day) AS first_day FROM ev GROUP BY user_id),
cohort AS (
  SELECT * FROM firsts WHERE first_day BETWEEN '2024-01-01' AND '2024-01-10'
),
agg AS (
  SELECT e.user_id, count(*) AS action_count
  FROM ev e JOIN cohort c USING (user_id)
  WHERE e.event_type = 'click'
    AND e.day <= strftime(CAST(c.first_day AS DATE) + 7, '%Y-%m-%d')
  GROUP BY e.user_id
),
{_TOP10_TAIL.format(metric="action_count")}
"""


ORACLE["streaming_ad_running_totals"] = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS ad_id,
       count(*) AS click_count
FROM events
WHERE event_type = 'click'
GROUP BY 1, 2
"""


ORACLE["token_counts"] = r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_extract_all(trim(text), '\S+')) END AS ws_tokens,
       len(regexp_extract_all(text,
           '[A-Za-z]+''[A-Za-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens,
       floor(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
             / nullif(length(text), 0) * 1000.0 + 0.5) / 1000.0 AS punct_ratio
FROM documents
"""


ORACLE["tpch_q6"] = """
SELECT floor(sum(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5) AS BIGINT))
             / 10000.0 * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# Spark's window(ts, '60 minutes', '10 minutes') assigns each event to
# the 6 epoch-aligned slide starts in (ts-60min, ts]; expand with a
# 6-row range join and count.
ORACLE["streaming_sliding_trend"] = """
SELECT strftime(to_timestamp(floor(epoch(ts) / 600) * 600 - k.k * 600),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS ad_id,
       count(*) AS click_count
FROM events, range(6) k(k)
WHERE event_type = 'click'
GROUP BY 1, 2
"""


ORACLE["session_filtered_aggr_stat2"] = f"""
WITH {SESSIONIZE_CTES}, {SESSION_STATS_CTE}, {USERS_CTE},
filtered AS (
  SELECT s.* FROM session_stats s JOIN users u USING (user_id)
  WHERE u.city IN ('CHINA','JAPAN','INDIA','FRANCE','GERMANY')
    AND s.day >= '2024-01-05' AND s.day <= '2024-01-25'
    AND len(list_intersect(string_split(s.click_category_ids, ','),
            [CAST(x AS VARCHAR) FOR x IN range(0, 50)])) > 0
)
{_aggr_stat_select("filtered")}
"""


ORACLE["tpch_q10"] = """
SELECT c_custkey, c_name, n_name,
       floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
             / 10000.0 * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# streaming twin computes the identical rollup
ORACLE["streaming_session_rollup"] = ORACLE["session_window_rollup"]


ORACLE["clean_corpus"] = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
),
m AS (
  SELECT doc_id, text,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, x -> list_contains({_STOPLIST}, x))) AS BIGINT) AS n_stop
  FROM t
),
stats AS (
  SELECT doc_id, text, n_tokens,
         floor((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.6
               + least((CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 0.1, 1.0) * 0.4)
               * 100.0 + 0.5) / 100.0 AS quality_score
  FROM m
),
quality AS (
  SELECT * FROM stats WHERE quality_score >= 0.5 AND n_tokens >= 10
),
exact_keep AS (
  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)
),
surv AS (
  SELECT q.* FROM quality q JOIN exact_keep USING (doc_id)
),
_sdocs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM surv
),
sdsh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 2),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
  FROM _sdocs WHERE len(toks) >= 3
),
ssizes AS (SELECT doc_id, count(*) AS n_sh FROM sdsh GROUP BY doc_id),
sinter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sdsh a JOIN sdsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
near_drop AS (
  SELECT DISTINCT doc_b AS doc_id FROM sinter
  JOIN ssizes sa ON doc_a = sa.doc_id
  JOIN ssizes sb ON doc_b = sb.doc_id
  WHERE CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE) >= 0.8
)
SELECT doc_id, n_tokens, quality_score
FROM surv
WHERE doc_id NOT IN (SELECT doc_id FROM near_drop)
"""


ORACLE["session_paths"] = f"""
WITH {SESSIONIZE_CTES},
paths AS (
  SELECT string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM actions GROUP BY session_id
),
counted AS (
  SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
)
SELECT path, n_sessions FROM counted
ORDER BY n_sessions DESC, path ASC LIMIT 20
"""

ORACLE["cohort_retention"] = """
WITH ev AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events
),
firsts AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
SELECT cohort_day,
       CAST(date_diff('day', CAST(cohort_day AS DATE), CAST(day AS DATE)) AS INTEGER) AS day_offset,
       CAST(count(DISTINCT ev.user_id) AS BIGINT) AS active_users
FROM ev JOIN firsts USING (user_id)
GROUP BY 1, 2
"""


ORACLE["tpch_q18"] = """
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 30000
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       floor(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 * 100.0 + 0.5) / 100.0 AS total_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT 20
"""


ORACLE["normalize_text"] = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm_text
  FROM documents
)
SELECT doc_id, norm_text, md5(norm_text) AS norm_hash FROM n
"""

# mirror of diagnostics.py::holt_trend_daily — the identical Holt
# recursion (α=β=½, l₁=y₁, b₁=0) replayed through WITH RECURSIVE over
# the day-indexed series; the level expression inside trend is the
# SAME tree Spark evaluates, so doubles are bit-identical (sequential
# fold: deterministic order, not a distributive sum)
ORACLE["holt_trend_daily"] = """
WITH RECURSIVE daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS y
  FROM events WHERE event_type = 'click' GROUP BY 1
),
seq AS (
  SELECT day, y, row_number() OVER (ORDER BY day) AS i FROM daily
),
r(i, day, y, level, trend, forecast) AS (
  -- every numeric is an explicit DOUBLE: a bare 0.0 anchor types the
  -- whole recursion DECIMAL(1,1) in DuckDB and quantizes each step
  SELECT i, day, y, CAST(y AS DOUBLE), CAST(0.0 AS DOUBLE),
         CAST(NULL AS DOUBLE)
  FROM seq WHERE i = 1
  UNION ALL
  SELECT s.i, s.day, s.y,
         0.5 * CAST(s.y AS DOUBLE) + 0.5 * (r.level + r.trend),
         0.5 * ((0.5 * CAST(s.y AS DOUBLE) + 0.5 * (r.level + r.trend))
                - r.level)
           + 0.5 * r.trend,
         r.level + r.trend
  FROM r JOIN seq s ON s.i = r.i + 1
)
SELECT day, y,
       floor(level * 10000.0 + 0.5) / 10000.0 AS level,
       floor(trend * 10000.0 + 0.5) / 10000.0 AS trend,
       floor(forecast * 10000.0 + 0.5) / 10000.0 AS forecast
FROM r ORDER BY day
"""

# mirror of diagnostics.py::theilsen_trend_daily — same pairwise
# slopes (one exact-int IEEE division each), same middle-element
# median (DuckDB CAST rounds half-away, so floor() before the cast to
# match Spark's truncating cast), same residual-median intercept
ORACLE["theilsen_trend_daily"] = """
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS y
  FROM events WHERE event_type = 'click' GROUP BY 1
),
first AS (SELECT min(CAST(day AS DATE)) AS d0 FROM daily),
-- x = CALENDAR-day offset from the first observed day (exact
-- integer datediff, mirroring Spark's datediff on dates), so the
-- slope really is per calendar day across series gaps
seq AS (
  SELECT day, y, row_number() OVER (ORDER BY day) AS i,
         date_diff('day', first.d0, CAST(day AS DATE)) AS x
  FROM daily, first
),
slopes AS (
  SELECT CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s
  FROM seq a JOIN seq b ON b.i > a.i
),
sarr AS (SELECT list_sort(list(s)) AS arr FROM slopes),
sl AS (
  SELECT (arr[CAST(floor((len(arr) + 1) / 2) AS INT)]
          + arr[CAST(floor(len(arr) / 2 + 1) AS INT)]) / 2.0 AS slope
  FROM sarr WHERE len(arr) >= 1
),
rarr AS (
  SELECT list_sort(list(s.y - sl.slope * CAST(s.x AS DOUBLE))) AS arr,
         any_value(sl.slope) AS slope,
         CAST(count(*) AS BIGINT) AS n_days
  FROM seq s CROSS JOIN sl
)
SELECT n_days,
       floor(slope * 1000000.0 + 0.5) / 1000000.0 AS slope_per_day,
       floor((arr[CAST(floor((len(arr) + 1) / 2) AS INT)]
              + arr[CAST(floor(len(arr) / 2 + 1) AS INT)]) / 2.0
             * 1000000.0 + 0.5) / 1000000.0 AS intercept,
       floor(slope * 7.0 * 1000000.0 + 0.5) / 1000000.0 AS slope_per_week
FROM rarr
WHERE n_days >= 2
"""

# mirror of diagnostics.py::cusum_drift_daily — the identical
# integer CUSUM fold (W=7, slack=2, threshold=20; baseline days pin
# both sides to 0) replayed via WITH RECURSIVE; BIGINT end to end
ORACLE["cusum_drift_daily"] = """
WITH RECURSIVE daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS y
  FROM events WHERE event_type = 'click' GROUP BY 1
),
seq AS (
  SELECT day, y, row_number() OVER (ORDER BY day) AS i FROM daily
),
base AS (
  SELECT CAST(coalesce(sum(y), 0) AS BIGINT) AS b FROM seq WHERE i <= 7
),
r(i, day, y, up, down) AS (
  SELECT i, day, y, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM seq WHERE i = 1
  UNION ALL
  SELECT s.i, s.day, s.y,
         CASE WHEN s.i <= 7 THEN CAST(0 AS BIGINT)
              ELSE greatest(CAST(0 AS BIGINT),
                            r.up + (7 * s.y - base.b - 7 * 2)) END,
         CASE WHEN s.i <= 7 THEN CAST(0 AS BIGINT)
              ELSE greatest(CAST(0 AS BIGINT),
                            r.down - (7 * s.y - base.b + 7 * 2)) END
  FROM r JOIN seq s ON s.i = r.i + 1 CROSS JOIN base
)
SELECT day, y, up AS cusum_up, down AS cusum_down,
       up > 7 * 20 AS alarm_up, down > 7 * 20 AS alarm_down
FROM r ORDER BY day
"""

# mirror of engagement.py::multitouch_attribution — the NAIVE range
# join the operator's row-local fold avoids: conversions ⋈ touches on
# (user, window, (us,eid) strict order), per-conversion rank/count
# windows, integer bps split (10000 // k, remainder to the last
# touch), per-ad bigint totals
ORACLE["multitouch_attribution"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id AS eid, event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS ad_id
  FROM events WHERE event_type IN ('click', 'purchase')
),
conv AS (SELECT user_id, us, eid FROM ev WHERE event_type = 'purchase'),
touch AS (SELECT user_id, us, eid, ad_id FROM ev WHERE event_type = 'click'),
j AS (
  SELECT c.eid AS ceid, t.ad_id,
         row_number() OVER (PARTITION BY c.eid ORDER BY t.us, t.eid) AS rn,
         count(*) OVER (PARTITION BY c.eid) AS k
  FROM conv c
  JOIN touch t ON c.user_id = t.user_id
   AND (t.us < c.us OR (t.us = c.us AND t.eid < c.eid))
   AND c.us - t.us <= CAST(7 AS BIGINT) * 86400 * 1000000
),
cr AS (
  SELECT ad_id,
         CAST(10000 // k + CASE WHEN rn = k THEN 10000 - k * (10000 // k)
                           ELSE 0 END AS BIGINT) AS bps
  FROM j
)
SELECT ad_id, CAST(count(*) AS BIGINT) AS n_touches,
       CAST(sum(bps) AS BIGINT) AS credit_bps
FROM cr GROUP BY ad_id ORDER BY ad_id
"""



ORACLE["session_length_percentiles"] = f"""
WITH {SESSIONIZE_CTES}, {SESSION_STATS_CTE}
SELECT floor(quantile_cont(visit_length, 0.5) * 100.0 + 0.5) / 100.0 AS visit_p50,
       floor(quantile_cont(visit_length, 0.9) * 100.0 + 0.5) / 100.0 AS visit_p90,
       floor(quantile_cont(visit_length, 0.99) * 100.0 + 0.5) / 100.0 AS visit_p99,
       floor(quantile_cont(step_length, 0.5) * 100.0 + 0.5) / 100.0 AS step_p50,
       floor(quantile_cont(step_length, 0.9) * 100.0 + 0.5) / 100.0 AS step_p90,
       floor(quantile_cont(step_length, 0.99) * 100.0 + 0.5) / 100.0 AS step_p99
FROM session_stats
"""

ORACLE["daily_event_type_pivot"] = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events GROUP BY 1
"""

ORACLE["events_profile"] = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_users,
       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types
FROM events
"""


ORACLE["daily_type_rollup"] = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY ROLLUP (1, event_type)
"""

ORACLE["daily_cumulative_clicks"] = """
WITH daily AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS ad_id,
         strftime(ts, '%Y-%m-%d') AS day,
         count(*) AS clicks
  FROM events WHERE event_type = 'click'
  GROUP BY 1, 2
)
SELECT ad_id, day, clicks,
       CAST(sum(clicks) OVER (PARTITION BY ad_id ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_clicks
FROM daily
"""


# IVF-flat mirror: centroids = first 8 vectors; every corpus vector
# assigned to its nearest centroid (rn=1); queries probe their 2
# nearest cells; exact cosine within probed cells only.
ORACLE["ann_ivf_topk"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id AS cluster_id, v AS c_vec FROM e WHERE vec_id < 8),
assigned AS (
  SELECT vec_id AS neighbor_id, v AS n_vec, cluster_id FROM (
    SELECT e.vec_id, e.v, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY floor(list_cosine_similarity(e.v, c.c_vec) * 1000.0 + 0.5) / 1000.0 DESC,
                                       c.cluster_id ASC) AS rn
    FROM e CROSS JOIN cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, v AS q_vec, cluster_id FROM (
    SELECT e.vec_id, e.v, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY floor(list_cosine_similarity(e.v, c.c_vec) * 1000.0 + 0.5) / 1000.0 DESC,
                                       c.cluster_id ASC) AS rn
    FROM e CROSS JOIN cents c
    WHERE e.vec_id < 10
  ) WHERE rn <= 2
),
cand AS (
  SELECT p.query_id, a.neighbor_id,
         list_cosine_similarity(p.q_vec, a.n_vec) AS sim
  FROM probes p JOIN assigned a USING (cluster_id)
  WHERE a.neighbor_id != p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY floor(sim * 1000.0 + 0.5) / 1000.0 DESC,
                                     neighbor_id ASC) AS rn
  FROM cand
)
SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id,
       floor(sim * 1000.0 + 0.5) / 1000.0 AS sim
FROM ranked WHERE rn <= 5
"""


# oracle-calibration baseline for the LSH recall-floor test (the
# canonical `embedding_neardup` now carries its OWN hash oracle below)
ORACLE["embedding_neardup_exact"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
       floor(list_cosine_similarity(a.v, b.v) * 1000.0 + 0.5) / 1000.0 AS sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.4
"""


def _lsh_bits_ctes(
    n_bits: int = 16,
    band_bits: int = 2,
    dim: int = 64,
    seed: int = 7,
) -> str:
    """The shared e/bits/banded head of every hyperplane-LSH oracle —
    SAME seeded ±1 planes as the Spark side (imported, single source
    of truth), sign bits as an explicit left-assoc ±v[i] sum
    (bit-identical to Spark's zip_with/aggregate fold because ±1
    products are lossless), `band_bits` bits packed per band.
    Consumed by `_lsh_pair_ctes` (near-dup pairs / closure) and
    ORACLE['ann_lsh_topk'] (query-probe candidates)."""
    from .operators.similarity import lsh_planes

    planes = lsh_planes(n_bits, dim, seed)
    n_bands = n_bits // band_bits
    bit_cols = []
    for j, p in enumerate(planes):
        terms = " ".join(
            ("+" if c > 0 else "-") + f" v[{i + 1}]" for i, c in enumerate(p)
        )
        bit_cols.append(f"(CASE WHEN (0.0 {terms}) >= 0 THEN 1 ELSE 0 END) AS b{j}")
    band_rows = []
    for b in range(n_bands):
        bucket = " + ".join(
            f"{1 << r} * b{b * band_bits + r}" for r in range(band_bits)
        )
        band_rows.append(f"SELECT vec_id, {b} AS band, {bucket} AS bucket FROM bits")
    return f"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
bits AS MATERIALIZED (
  SELECT vec_id, {", ".join(bit_cols)} FROM e
),
banded AS (
  {" UNION ALL ".join(band_rows)}
)"""


def _lsh_pair_ctes(
    threshold: float = 0.4,
    n_bits: int = 16,
    band_bits: int = 2,
    dim: int = 64,
    seed: int = 7,
) -> str:
    """DuckDB mirror of similarity.py::embedding_neardup_lsh — the
    SAME seeded ±1 hyperplanes (imported from the operator, single
    source of truth), sign bits as an explicit left-assoc ±v[i] sum
    (bit-identical to Spark's zip_with/aggregate fold because ±1
    products are lossless), banded buckets, distinct candidate pairs,
    exact cosine verification.  Determinism argument: both engines
    compute every dot in the identical IEEE order, so the SIGNS —
    hence the candidate set — agree exactly; the verify threshold
    reuses the raw-cosine comparison the hash-gated
    `embedding_neardup_exact` already proved cross-engine stable."""
    return f"""{_lsh_bits_ctes(n_bits, band_bits, dim, seed)},
cand AS (
  SELECT DISTINCT x.vec_id AS doc_a, y.vec_id AS doc_b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id
),
lshp AS (
  SELECT doc_a, doc_b, list_cosine_similarity(ea.v, eb.v) AS sim
  FROM cand
  JOIN e ea ON ea.vec_id = cand.doc_a
  JOIN e eb ON eb.vec_id = cand.doc_b
  WHERE list_cosine_similarity(ea.v, eb.v) >= {threshold}
)"""


# the canonical LSH near-dup — HASH-GATED: the banded candidate set is
# deterministic (seeded planes, bit-exact signs), so the full pipeline
# mirrors, not just the exact twin
ORACLE["embedding_neardup"] = f"""
WITH {_lsh_pair_ctes()}
SELECT doc_a, doc_b, floor(sim * 1000.0 + 0.5) / 1000.0 AS sim FROM lshp
"""

# LSH-fed transitive closure — the 100 TB design under the hash gate
# (banded candidates + exact verify + min-reachable-id fixpoint); the
# O(n²)-fed `embedding_dedup_clusters` twin is calibration-only
ORACLE["embedding_dedup_clusters_lsh"] = f"""
WITH RECURSIVE {_lsh_pair_ctes()},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM lshp
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM lshp
),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
  UNION
  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a
),
cl AS (
  SELECT a AS vec_id, CAST(min(b) AS BIGINT) AS cluster_id
  FROM reach GROUP BY a
)
SELECT vec_id, cluster_id FROM cl
"""

# the indexed (cluster-partition-pruned) IVF path runs the identical
# deterministic construction over the materialized layout, so its
# oracle IS ann_ivf_topk's
ORACLE["ann_ivf_topk_indexed"] = ORACLE["ann_ivf_topk"]
# index lifecycle twin: frozen-centroid append == full rebuild (the base
# slice contains the centroid rule's picks), so the same oracle binds
ORACLE["ann_ivf_topk_appended"] = ORACLE["ann_ivf_topk"]

# mirror of operators/similarity.py::semantic_dedup (n_clusters=8,
# threshold=0.85): first-8 centroids, quantized (3 dp) assignment and
# pair similarities, drop rule = a same-cluster neighbor >= threshold
# precedes in (c_sim ASC, vec_id ASC)
ORACLE["semantic_dedup"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id AS cluster_id, v AS c_vec FROM e WHERE vec_id < 8),
assigned AS (
  SELECT vec_id, v, cluster_id, c_sim FROM (
    SELECT e.vec_id, e.v, c.cluster_id,
           floor(list_cosine_similarity(e.v, c.c_vec) * 1000.0 + 0.5) / 1000.0 AS c_sim,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY floor(list_cosine_similarity(e.v, c.c_vec) * 1000.0 + 0.5) / 1000.0 DESC,
                                       c.cluster_id ASC) AS rn
    FROM e CROSS JOIN cents c
  ) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b USING (cluster_id)
  WHERE a.vec_id <> b.vec_id
    AND (a.c_sim < b.c_sim OR (a.c_sim = b.c_sim AND a.vec_id < b.vec_id))
    AND floor(list_cosine_similarity(a.v, b.v) * 1000.0 + 0.5) / 1000.0 >= 0.85
)
SELECT a.vec_id, a.cluster_id, a.c_sim,
       d.vec_id IS NULL AS kept
FROM assigned a LEFT JOIN dropped d USING (vec_id)
"""


# --- multimodal plumbing (synthetic wire format; see operators/multimodal.py) ---
# width/height/type are closed-form over doc_id; payload = 8-byte
# header + utf-8 text, so n_bytes = 8 + strlen(text).
_MEDIA_W = "CASE WHEN doc_id % 5 = 0 THEN 30 + doc_id % 240 ELSE 64 + doc_id % 1024 END"
_MEDIA_H = "64 + (doc_id * 7) % 768"

ORACLE["media_metadata"] = f"""
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN 'video' ELSE 'image' END AS media_type,
       CAST({_MEDIA_W} AS INT) AS width,
       CAST({_MEDIA_H} AS INT) AS height,
       CAST(8 + strlen(text) AS BIGINT) AS n_bytes
FROM documents
"""

ORACLE["media_frame_offsets"] = """
SELECT d.doc_id,
       CAST(t.f AS INT) AS frame_index,
       (t.f * 1000 // 30) / 1000.0 AS timestamp_sec
FROM documents d, UNNEST(range(0, 30 + (d.doc_id % 240), 10)) AS t(f)
WHERE d.doc_id % 5 = 0
"""

# resize(256x256) truncates the payload by the area ratio:
# n_bytes' = 8 + floor(strlen(text) * least(65536/(w*h), 1.0))
ORACLE["media_resize_audit"] = f"""
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN 'video' ELSE 'image' END AS media_type,
       CAST(256 AS INT) AS width,
       CAST(256 AS INT) AS height,
       CAST(8 + floor(strlen(text) *
                      least(65536.0 / (({_MEDIA_W}) * ({_MEDIA_H})), 1.0))
            AS BIGINT) AS n_bytes
FROM documents
"""

# real-codec gates: the generators emit genuine BMP/WAV bytes whose
# decoded fields are closed-form over doc_id (solid color → channel
# mean == channel value; constant amplitude → RMS == amplitude; all
# divisions are IEEE-exact for these magnitudes)
ORACLE["image_features_bmp"] = """
SELECT doc_id,
       CAST(2 + doc_id % 5 AS INT) AS width,
       CAST(1 + doc_id % 4 AS INT) AS height,
       CAST(doc_id % 256 AS DOUBLE) AS mean_r,
       CAST((doc_id * 3) % 256 AS DOUBLE) AS mean_g,
       CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_b
FROM documents
"""

ORACLE["audio_features_wav"] = """
SELECT doc_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(1 AS INT) AS channels,
       CAST(4 + doc_id % 50 AS BIGINT) AS n_samples,
       CAST(4 + doc_id % 50 AS DOUBLE) / 8000.0 AS duration_sec,
       CAST((doc_id % 100) * 10 AS DOUBLE) AS rms
FROM documents
"""

# the upsert sink accumulates exactly the batch per-key counts
ORACLE["streaming_user_click_upsert"] = ORACLE["ad_user_click_count"]
# the crash-then-recover replay must land on the SAME totals as the
# uninterrupted batch aggregation — recovery correctness IS the diff
ORACLE["streaming_upsert_crash_recovery"] = ORACLE["ad_user_click_count"]

# the SCD2 crash-then-recover CDC replay lands on a closed-form
# history: phase 1 opens one version per customer at 2024-01-01;
# phase 2 (custkey % 3 == 0, segment prefixed 'X-') closes that
# version at 2024-02-01 and opens the new one — recovery correctness
# IS the diff vs this batch truth
ORACLE["streaming_scd2_crash_recovery"] = """
SELECT c_custkey AS custkey, c_mktsegment AS segment,
       '2024-01-01' AS valid_from,
       CASE WHEN c_custkey % 3 = 0 THEN '2024-02-01' ELSE NULL END AS valid_to
FROM customer
UNION ALL
SELECT c_custkey AS custkey, 'X-' || c_mktsegment AS segment,
       '2024-02-01' AS valid_from, NULL AS valid_to
FROM customer WHERE c_custkey % 3 = 0
"""

# the watermark late-drop replay: append mode emits exactly the hour
# windows whose END the final watermark (max ts - 1 h) passed, and
# the phase-2 replay of the corpus's OLDEST event is dropped before
# aggregation — so counting the events table itself (late duplicate
# excluded by construction) over the closed windows is the full
# contract; a wrongly-merged late row would append a duplicate
# hour_start row and break the hash
ORACLE["streaming_late_event_drop"] = """
WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
agg AS (
  SELECT date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
)
SELECT strftime(h, '%Y-%m-%d %H:%M') AS hour_start, n
FROM agg, wm
WHERE h + INTERVAL 1 HOUR <= wm.w
"""

# the blacklist FEEDBACK replay: two micro-batches split at
# min(ts)+14d; phase-1 offenders (any (day,user,ad) count >= 2) are
# blacklisted before phase 2, so their phase-2 clicks never reach the
# totals — the SQL unrolls the same two phases the stream executes
ORACLE["ad_blacklist_feedback"] = """
WITH src AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS ad_id
  FROM events WHERE event_type = 'click'
),
split AS (SELECT strftime(min(ts) + INTERVAL 14 DAY, '%Y-%m-%d') AS d FROM events),
p1 AS (
  SELECT day, user_id, ad_id, count(*) AS c FROM src
  WHERE day <= (SELECT d FROM split) GROUP BY 1, 2, 3
),
bl1 AS (SELECT DISTINCT user_id FROM p1 WHERE c >= 2),
p2 AS (
  SELECT day, user_id, ad_id, count(*) AS c FROM src
  WHERE day > (SELECT d FROM split)
    AND user_id NOT IN (SELECT user_id FROM bl1)
  GROUP BY 1, 2, 3
)
SELECT day, user_id, ad_id, CAST(sum(c) AS BIGINT) AS click_count
FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
GROUP BY day, user_id, ad_id
"""

ORACLE["tpch_q4"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLE["tpch_q7"] = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       strftime(l_shipdate, '%Y') AS l_year,
       floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

ORACLE["tpch_q12"] = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLE["tpch_q14"] = """
SELECT floor((100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                    ELSE 0 END) AS BIGINT))
             / CAST(sum(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)) AS BIGINT)
             * 100.0 + 0.5) / 100.0 AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""

ORACLE["tpch_q19"] = """
SELECT floor(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0 * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""

_PACK_CTE = r"""
_ptoks AS (
  SELECT doc_id,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_extract_all(trim(text), '\S+')) END AS BIGINT) AS n_tokens
  FROM documents
),
_packed AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - n_tokens AS "offset"
  FROM _ptoks
)
"""

ORACLE["pack_sequences"] = f"""
WITH {_PACK_CTE}
SELECT doc_id, n_tokens, "offset",
       "offset" // 512 AS first_bin,
       greatest("offset" // 512, ("offset" + n_tokens - 1) // 512) AS last_bin
FROM _packed
"""

ORACLE["pack_bin_manifest"] = f"""
WITH {_PACK_CTE},
_spans AS (
  SELECT doc_id, n_tokens, "offset",
         unnest(range("offset" // 512,
                      greatest("offset" // 512,
                               ("offset" + n_tokens - 1) // 512) + 1)) AS bin_id
  FROM _packed
)
SELECT bin_id,
       count(*) AS n_docs,
       CAST(sum(greatest(0, least("offset" + n_tokens, (bin_id + 1) * 512)
                            - greatest("offset", bin_id * 512))) AS BIGINT) AS tokens_used
FROM _spans
GROUP BY bin_id
"""

# batch-vs-corpus admission CTEs (exact md5 screen + exact-jaccard
# 3-shingle near screen at 0.8) — shared by the solo incremental_admit
# gate and the composed corpus_pipeline_incremental gate
_ADMISSION_CTES = """newd AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
cord AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
exact_rej AS (
  SELECT DISTINCT n.doc_id FROM newd n JOIN cord c ON md5(n.text) = md5(c.text)
),
ntoks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM newd),
ndsh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 2),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
  FROM ntoks WHERE len(toks) >= 3
),
ctoks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM cord),
cdsh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 2),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
  FROM ctoks WHERE len(toks) >= 3
),
nsz AS (SELECT doc_id, count(*) AS n_sh FROM ndsh GROUP BY doc_id),
csz AS (SELECT doc_id, count(*) AS n_sh FROM cdsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS new_id, b.doc_id AS cor_id, count(*) AS inter
  FROM ndsh a JOIN cdsh b ON a.shingle = b.shingle
  GROUP BY 1, 2
),
near_rej AS (
  SELECT DISTINCT new_id AS doc_id
  FROM inter
  JOIN nsz ON inter.new_id = nsz.doc_id
  JOIN csz ON inter.cor_id = csz.doc_id
  WHERE CAST(inter AS DOUBLE) / (nsz.n_sh + csz.n_sh - inter) >= 0.8
),
admitted AS (
  SELECT doc_id, text FROM newd
  WHERE doc_id NOT IN (SELECT doc_id FROM exact_rej)
    AND doc_id NOT IN (SELECT doc_id FROM near_rej)
)"""

ORACLE["incremental_admit"] = f"""
WITH {_ADMISSION_CTES}
SELECT doc_id, text FROM admitted
"""

# replays the int8 pipeline: per-vector scale, floor(x/s + 0.5)
# quantize, dequantized candidate cut at refine*k=20, exact re-rank
ORACLE["ann_quantized_topk"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM e
),
dq AS (
  SELECT vec_id,
         CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
              ELSE list_transform(v, x -> floor(x / scale + 0.5) * scale)
         END AS dqv
  FROM qz
),
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY floor(list_cosine_similarity(q.v, c.dqv) * 1000.0 + 0.5) / 1000.0 DESC,
                                     c.vec_id ASC) AS rn
  FROM (SELECT vec_id, v FROM e WHERE vec_id < 10) q
  JOIN dq c ON c.vec_id != q.vec_id
),
exact AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_cosine_similarity(qe.v, ne.v) AS sim,
         row_number() OVER (PARTITION BY cand.query_id
                            ORDER BY floor(list_cosine_similarity(qe.v, ne.v) * 1000.0 + 0.5) / 1000.0 DESC,
                                     cand.neighbor_id ASC) AS rn
  FROM cand
  JOIN e qe ON cand.query_id = qe.vec_id
  JOIN e ne ON cand.neighbor_id = ne.vec_id
  WHERE cand.rn <= 20
)
SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id,
       floor(sim * 1000.0 + 0.5) / 1000.0 AS sim
FROM exact WHERE rn <= 5
"""

ORACLE["corpus_profile"] = f"""
WITH b AS (
  SELECT source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(floor((least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0) * 0.6
                     + least((CAST(len(list_filter(string_split(text, ' '),
                                x -> list_contains({_STOPLIST}, x))) AS DOUBLE)
                              / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 0.1, 1.0) * 0.4)
                    * 10000 + 0.5) AS BIGINT) AS q4
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       floor(quantile_cont(n_tokens, 0.5) * 100.0 + 0.5) / 100.0 AS tokens_p50,
       floor(quantile_cont(n_tokens, 0.9) * 100.0 + 0.5) / 100.0 AS tokens_p90,
       floor(CAST(sum(q4) AS BIGINT) / 10000.0 / count(*) * 1000.0 + 0.5) / 1000.0 AS avg_quality
FROM b GROUP BY source
"""

ORACLE["vocab_top_tokens"] = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 50
"""

ORACLE["tpch_q13"] = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

ORACLE["skewed_event_counts"] = """
SELECT event_type, count(*) AS count FROM events GROUP BY event_type
"""

ORACLE["tpch_q8"] = """
SELECT strftime(o_orderdate, '%Y') AS o_year,
       floor(CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                  THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
                  ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE)
             * 10000.0 + 0.5) / 10000.0 AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'STANDARD'
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
ORDER BY 1
"""

ORACLE["tpch_q15"] = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS rev_q4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       floor(rev_q4 / 10000.0 * 100.0 + 0.5) / 100.0 AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_q4 = (SELECT max(rev_q4) FROM revenue)
ORDER BY s_suppkey
"""

ORACLE["tpch_q17"] = """
WITH sliver AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#11' AND p_size <= 10
),
per_part AS (
  SELECT l_partkey AS a_partkey,
         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty,
         count(*) AS cnt_qty
  FROM sliver GROUP BY l_partkey
)
SELECT floor(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0 / 7.0 * 100.0 + 0.5) / 100.0 AS avg_yearly
FROM sliver JOIN per_part ON l_partkey = a_partkey
WHERE CAST(floor(l_quantity + 0.5) AS BIGINT) * 5 * cnt_qty < sum_qty
"""

ORACLE["tpch_q21"] = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

ORACLE["tpch_q22"] = """
WITH cust AS (
  SELECT c_custkey, c_acctbal,
         CAST(c_nationkey % 10 AS VARCHAR) AS cntrycode,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
  FROM customer
  WHERE CAST(c_nationkey % 10 AS VARCHAR) IN ('1', '3', '5', '7', '9')
),
avg_frame AS (
  SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c, count(*) AS cnt_c
  FROM cust WHERE c_acctbal > 0.0
)
SELECT cntrycode,
       count(*) AS numcust,
       floor(CAST(sum(bal_c) AS BIGINT) / 100.0 * 100.0 + 0.5) / 100.0 AS totacctbal
FROM cust, avg_frame
WHERE bal_c * cnt_c > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY cntrycode
ORDER BY cntrycode
"""

# DuckDB has a native ASOF JOIN — the oracle validates the engine's
# union+carry-forward window against the real operator semantics.
# Views are pre-deduped to max(event_id) per (user, ts) to pin the
# same tie-break the engine's window order applies.
ORACLE["click_asof_prior_view"] = """
WITH views AS (
  SELECT user_id, epoch_us(ts) AS vts, max(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
),
clicks AS (
  SELECT event_id, user_id, epoch_us(ts) AS cts
  FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id,
       c.cts AS ts_us,
       v.view_id AS prior_view_id,
       v.vts AS prior_view_ts_us,
       c.cts - v.vts AS gap_us
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND c.cts > v.vts
"""

ORACLE["error_burst_click_counts"] = """
WITH errors AS (
  SELECT event_id AS error_id, epoch_us(ts) AS ws
  FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT epoch_us(ts) AS cts FROM events WHERE event_type = 'click'
)
SELECT error_id, CAST(count(cts) AS BIGINT) AS window_clicks
FROM errors LEFT JOIN clicks
  ON cts >= ws AND cts < ws + 600000000
GROUP BY error_id
"""

ORACLE["corpus_quota_sample"] = """
SELECT doc_id, source, n_chars, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
) WHERE rk <= 10
"""

ORACLE["benchmark_contamination"] = f"""
WITH {SHINGLES_CTE},
bench AS (SELECT DISTINCT shingle FROM dsh WHERE doc_id % 50 = 0),
corp AS (SELECT doc_id, shingle FROM dsh WHERE doc_id % 50 <> 0),
hits AS (
  SELECT doc_id, count(*) AS n_shared FROM corp
  WHERE shingle IN (SELECT shingle FROM bench)
  GROUP BY doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corp GROUP BY doc_id)
SELECT h.doc_id,
       CAST(n_shared AS BIGINT) AS n_shared,
       CAST(n_shingles AS BIGINT) AS n_shingles,
       floor(CAST(n_shared AS DOUBLE) / CAST(n_shingles AS DOUBLE) * 1000.0 + 0.5)
         / 1000.0 AS contam_frac
FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
"""

ORACLE["streaming_click_attribution"] = """
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
),
v AS (
  SELECT event_id AS view_id, user_id, epoch_us(ts) AS v_us
  FROM events WHERE event_type = 'view'
)
SELECT click_id, view_id, c.user_id,
       (c_us - v_us) // 1000000 AS gap_s
FROM c JOIN v ON c.user_id = v.user_id
  AND v_us <= c_us
  AND v_us > c_us - 86400000000
"""

ORACLE["session_length_deciles"] = f"""
WITH {SESSIONIZE_CTES}, {SESSION_STATS_CTE},
cut AS (
  SELECT visit_length,
         ntile(10) OVER (ORDER BY visit_length, session_id) AS decile
  FROM session_stats
)
SELECT CAST(decile AS INTEGER) AS decile,
       count(*) AS n_sessions,
       min(visit_length) AS min_len,
       max(visit_length) AS max_len
FROM cut GROUP BY decile ORDER BY decile
"""

ORACLE["user_type_grouping_sets"] = """
SELECT user_id, event_type, count(*) AS n,
       CAST(grouping(user_id) * 2 + grouping(event_type) AS BIGINT) AS gid
FROM events
GROUP BY GROUPING SETS ((user_id), (event_type), ())
"""

# exact because the corpus vocabulary < maxItemsTracked (see registry
# docstring); if a dataset's vocab ever exceeds the sketch budget and
# ties straddle the k boundary, demote this to rows-only.
ORACLE["vocab_heavy_hitters_sketch"] = ORACLE["vocab_top_tokens"]


# --- curation operators (operators/curation.py) ---------------------------

ORACLE["train_eval_split"] = """
SELECT doc_id,
       substring(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 4) AS bucket,
       CASE WHEN substring(md5('v1:' || CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
            THEN 'eval' ELSE 'train' END AS split
FROM documents
"""

ORACLE["lang_mixture_weights"] = """
WITH per_lang AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total_tok,
               CAST(count(*) AS DOUBLE) AS n_langs FROM per_lang)
SELECT lang, n_docs, n_tokens,
       floor(n_tokens / total_tok * 10000.0 + 0.5) / 10000.0 AS token_share,
       floor((1.0 / n_langs) / (n_tokens / total_tok) * 10000.0 + 0.5) / 10000.0
         AS uniform_weight
FROM per_lang, tot
ORDER BY lang
"""

# mirror of operators/curation.py::mixture_temperature_weights
# (alpha=0.25): p^0.25 spelled sqrt(sqrt(p)) in BOTH engines —
# correctly-rounded IEEE, unlike libm pow
ORACLE["mixture_temperature_weights"] = """
WITH per_lang AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS t FROM per_lang),
s AS (
  SELECT lang, n_docs, n_tokens,
         CAST(n_tokens AS DOUBLE) / t AS share,
         sqrt(sqrt(CAST(n_tokens AS DOUBLE) / t)) AS sv
  FROM per_lang, tot
),
z AS (SELECT sum(sv) AS z FROM s)
SELECT lang, n_docs, n_tokens,
       floor(share * 10000.0 + 0.5) / 10000.0 AS token_share,
       floor(sv / z * 10000.0 + 0.5) / 10000.0 AS temp_share,
       floor((sv / z) / share * 10000.0 + 0.5) / 10000.0 AS temp_weight
FROM s, z
ORDER BY lang
"""

ORACLE["boilerplate_ngrams"] = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
dsh AS (
  SELECT DISTINCT doc_id, list_aggr(toks[i:i+1], 'string_agg', ' ') AS shingle
  FROM d, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
  WHERE len(toks) >= 2
)
SELECT shingle, df FROM (
  SELECT shingle, count(*) AS df FROM dsh GROUP BY shingle
) WHERE df >= 25
ORDER BY df DESC, shingle ASC
LIMIT 100
"""


def _pii_oracle(source: str = "documents") -> str:
    # the exact pattern strings the engine uses — imported, not
    # re-typed, so the two sides can never drift
    from .operators.curation import PII_PATTERNS

    clean = "text"
    for _, pat, token in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{token}', 'g')"
    counts = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    return f"""
SELECT doc_id,
       {clean} AS clean_text,
       {counts}
FROM {source}
"""


ORACLE["pii_redact"] = _pii_oracle()

# mirror of operators/pii.py::synthesize_pii + curation.pii_redact:
# the injected bytes are rebuilt analytically (lpad/modulo closed
# forms), then the SAME generated redaction body runs FROM the
# injected CTE — ground truth for counts and scrubbing
ORACLE["pii_scrub_report"] = f"""
WITH injected AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call +1 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                      || '-' || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST(doc_id * 3 % 256 AS VARCHAR)
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' card 4111-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      || '-' || lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0')
                      || '-' || lpad(CAST(doc_id * 17 % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS text
  FROM documents
)
{_pii_oracle("injected")}
"""


ORACLE["rolling_7d_clicks"] = """
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1
),
d2 AS (
  SELECT day, n_clicks,
         CAST(floor(epoch(CAST(day AS DATE)) / 86400) AS BIGINT) AS dnum
  FROM daily
)
SELECT day, n_clicks,
       CAST(sum(n_clicks) OVER w AS BIGINT) AS clicks_7d,
       floor(avg(n_clicks) OVER w * 100.0 + 0.5) / 100.0 AS avg_7d
FROM d2
WINDOW w AS (ORDER BY dnum RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY day
"""


# --- iterative + SCD operators -------------------------------------------

_PR_ITER = """
r{i} AS (
  SELECT n.node,
         (1.0 - 0.85) / (SELECT n FROM nn)
         + 0.85 * coalesce(c.contrib, 0.0) AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT tr.t AS node, sum(r.rank * tr.p) AS contrib
    FROM trans tr JOIN r{prev} r ON tr.s = r.node
    GROUP BY tr.t
  ) c USING (node)
)"""

# triangle count: the oracle uses the naive canonical 3-way join
# (fine at oracle scale); the engine's degree-ordered orientation
# must produce the identical count — each triangle once
ORACLE["page_graph_triangles"] = f"""
WITH {SESSIONIZE_CTES},
splits AS (
  SELECT session_id, event_type,
         lag(event_type) OVER (PARTITION BY session_id ORDER BY ts, event_id) AS prev_et
  FROM actions
),
edges AS (
  SELECT prev_et AS src, event_type AS dst FROM splits WHERE prev_et IS NOT NULL
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE src <> dst
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM und x
JOIN und y ON y.a = x.b
JOIN und z ON z.a = x.a AND z.b = y.b
"""

ORACLE["page_rank"] = (
    f"""
WITH {SESSIONIZE_CTES},
splits AS (
  SELECT session_id, event_type,
         lag(event_type) OVER (PARTITION BY session_id ORDER BY ts, event_id) AS prev_et
  FROM actions
),
edges AS (
  SELECT prev_et AS src, event_type AS dst, count(*) AS weight
  FROM splits WHERE prev_et IS NOT NULL GROUP BY 1, 2
),
outw AS (SELECT src, sum(weight) AS w_out FROM edges GROUP BY src),
trans AS (
  SELECT e.src AS s, e.dst AS t, CAST(e.weight AS DOUBLE) / o.w_out AS p
  FROM edges e JOIN outw o USING (src)
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
"""
    + ",\n".join(_PR_ITER.format(i=i, prev=i - 1) for i in range(1, 6))
    + """
SELECT node, floor(rank * 1000000.0 + 0.5) / 1000000.0 AS rank
FROM r5 ORDER BY node
"""
)

ORACLE["scd2_customer_segment"] = """
WITH open_ AS (
  SELECT c_custkey AS custkey, c_mktsegment AS segment,
         '2024-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
  FROM customer
),
hist AS (
  SELECT c_custkey AS custkey, 'LEGACY' AS segment,
         '2023-01-01' AS valid_from, '2024-01-01' AS valid_to
  FROM customer WHERE c_custkey % 10 = 0
),
upd AS (
  SELECT c_custkey AS custkey, c_mktsegment || '_V2' AS segment, '2024-06-01' AS eff
  FROM customer WHERE c_custkey % 4 = 0
  UNION ALL
  SELECT c_custkey, c_mktsegment, '2024-06-01' FROM customer WHERE c_custkey % 4 = 1
  UNION ALL
  SELECT c_custkey + 1000000, 'FRESH', '2024-06-01' FROM customer WHERE c_custkey % 10 = 3
),
j AS (
  SELECT o.custkey AS ok, o.segment AS oseg, o.valid_from AS ofrom,
         u.custkey AS uk, u.segment AS useg, u.eff AS ueff
  FROM open_ o FULL OUTER JOIN upd u ON o.custkey = u.custkey
)
SELECT custkey, segment, valid_from, valid_to FROM hist
UNION ALL  -- closed versions
SELECT ok, oseg, ofrom, ueff FROM j
WHERE ok IS NOT NULL AND uk IS NOT NULL AND oseg IS DISTINCT FROM useg
UNION ALL  -- re-opened versions with the new attrs
SELECT uk, useg, ueff, NULL FROM j
WHERE ok IS NOT NULL AND uk IS NOT NULL AND oseg IS DISTINCT FROM useg
UNION ALL  -- identical update → carried through, NOT versioned
SELECT ok, oseg, ofrom, NULL FROM j
WHERE ok IS NOT NULL AND uk IS NOT NULL AND oseg IS NOT DISTINCT FROM useg
UNION ALL  -- no update at all
SELECT ok, oseg, ofrom, NULL FROM j WHERE uk IS NULL
UNION ALL  -- brand-new keys
SELECT uk, useg, ueff, NULL FROM j WHERE ok IS NULL
"""


ORACLE["doc_tfidf_top_terms"] = """
WITH pairs AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM documents, UNNEST(string_split(text, ' ')) AS t(term)
  GROUP BY doc_id, t.term
),
dfs AS (SELECT term, count(*) AS df FROM pairs GROUP BY term),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
scored AS (
  SELECT p.doc_id, p.term,
         floor(p.tf * (ln(((SELECT n FROM nn) + 1.0) / (d.df + 1.0)) + 1.0)
               * 1000000.0 + 0.5) / 1000000.0 AS score
  FROM pairs p JOIN dfs d USING (term)
),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, score
FROM ranked WHERE rank <= 3
"""


ORACLE["dq_report"] = """
SELECT 'events.user_id_complete' AS constraint,
       CAST(coalesce(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations,
       coalesce(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END), 0) = 0 AS passed
FROM events
UNION ALL
SELECT 'events.event_type_accepted',
       CAST(coalesce(sum(CASE WHEN event_type NOT IN ('click','view','purchase','signup','error') THEN 1 ELSE 0 END), 0) AS BIGINT),
       coalesce(sum(CASE WHEN event_type NOT IN ('click','view','purchase','signup','error') THEN 1 ELSE 0 END), 0) = 0
FROM events
UNION ALL
SELECT 'events.value_non_negative',
       CAST(coalesce(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END), 0) AS BIGINT),
       coalesce(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END), 0) = 0
FROM events
UNION ALL
SELECT 'orders.o_totalprice_positive',
       CAST(coalesce(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT),
       coalesce(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END), 0) = 0
FROM orders
UNION ALL
SELECT 'lineitem.l_quantity_range',
       CAST(coalesce(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END), 0) AS BIGINT),
       coalesce(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END), 0) = 0
FROM lineitem
UNION ALL
SELECT 'events.event_id_unique',
       CAST(coalesce(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END), 0) AS BIGINT),
       coalesce(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END), 0) = 0
FROM (SELECT event_id, count(*) AS n FROM events GROUP BY event_id)
UNION ALL
SELECT 'orders.o_custkey_in_customer',
       CAST(count(*) AS BIGINT),
       count(*) = 0
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


ORACLE["attribution_linear"] = """
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, epoch_us(ts) AS c_ts,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS ad_id
  FROM events WHERE event_type = 'click'
),
touched AS (
  SELECT p.purchase_id, p.cents, c.ad_id
  FROM purchases p JOIN clicks c
    ON p.user_id = c.user_id
   AND c.c_ts >= p.p_ts - 1800000000
   AND c.c_ts < p.p_ts
),
credited AS (
  SELECT ad_id,
         cents * 1000000 // count(*) OVER (PARTITION BY purchase_id) AS credit_u
  FROM touched
)
SELECT ad_id, count(*) AS n_touches,
       floor(CAST(sum(credit_u) AS DOUBLE) / 100000000.0 * 100.0 + 0.5) / 100.0 AS credit
FROM credited GROUP BY ad_id ORDER BY ad_id
"""


ORACLE["funnel_sequential"] = """
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS stage, count(*) AS users FROM v
UNION ALL
SELECT 2, 'view>click', count(*) FROM c
UNION ALL
SELECT 3, 'view>click>purchase', count(*) FROM p
ORDER BY step
"""


# media payload = header(width,height) + utf8(text), all closed-form
# over (doc_id, text) — so exact-payload equality ≡ equality of the
# synthesis tuple; the oracle groups on that instead of re-hashing
# the blob (the engine hashes so only 16-byte digests ride the
# shuffle — same contract, independent restatement)
ORACLE["media_dedup"] = """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN 30 + doc_id % 240
              ELSE 64 + doc_id % 1024 END AS w,
         64 + (doc_id * 7) % 768 AS h,
         text
  FROM documents
)
GROUP BY w, h, text
"""


ORACLE["page_transition_probs"] = f"""
WITH {SESSIONIZE_CTES},
splits AS (
  SELECT session_id, event_type,
         lag(event_type) OVER (PARTITION BY session_id ORDER BY ts, event_id) AS prev_et
  FROM actions
),
edges AS (
  SELECT prev_et AS src, event_type AS dst, count(*) AS weight
  FROM splits WHERE prev_et IS NOT NULL GROUP BY 1, 2
),
outw AS (SELECT src, sum(weight) AS w_out FROM edges GROUP BY src)
SELECT e.src, e.dst, CAST(e.weight AS BIGINT) AS weight,
       floor(CAST(e.weight AS DOUBLE) / o.w_out * 10000.0 + 0.5) / 10000.0 AS prob
FROM edges e JOIN outw o USING (src)
ORDER BY e.src, e.dst
"""

ORACLE["snapshot_diff_customer"] = """
WITH old AS (
  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
),
new AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 7 = 0 THEN round(c_acctbal + 100.0, 2)
              ELSE c_acctbal END AS c_acctbal
  FROM customer WHERE c_custkey % 13 != 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEWSEG', 0.0
  FROM customer WHERE c_custkey % 11 = 0
),
j AS (
  SELECT o.c_custkey AS ok, o.c_mktsegment AS oseg, o.c_acctbal AS obal,
         n.c_custkey AS nk, n.c_mktsegment AS nseg, n.c_acctbal AS nbal
  FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
)
SELECT coalesce(ok, nk) AS c_custkey,
       CASE WHEN ok IS NULL THEN 'added'
            WHEN nk IS NULL THEN 'removed'
            WHEN oseg IS DISTINCT FROM nseg OR obal IS DISTINCT FROM nbal
            THEN 'changed' END AS change
FROM j
WHERE ok IS NULL OR nk IS NULL
   OR oseg IS DISTINCT FROM nseg OR obal IS DISTINCT FROM nbal
ORDER BY c_custkey
"""


ORACLE["open_orders_daily"] = """
WITH deltas AS (
  SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM (
    SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM orders
    UNION ALL
    SELECT CAST(o_orderdate AS DATE) + 30, -1 FROM orders
  ) GROUP BY day
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(sum(net) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS open_orders
FROM deltas ORDER BY day
"""

ORACLE["user_ltv_deciles"] = """
WITH ltv AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS ltv_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
cut AS (
  SELECT ltv_cents, ntile(10) OVER (ORDER BY ltv_cents, user_id) AS decile FROM ltv
)
SELECT CAST(decile AS INTEGER) AS decile,
       count(*) AS n_users,
       min(ltv_cents) AS min_cents,
       max(ltv_cents) AS max_cents
FROM cut GROUP BY decile ORDER BY decile
"""


ORACLE["daily_clicks_gapfilled"] = """
WITH daily AS (
  SELECT CAST(strftime(ts, '%Y-%m-%d') AS DATE) AS day, count(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1
),
spine AS (
  SELECT unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))::DATE AS day
  FROM daily
)
SELECT strftime(s.day, '%Y-%m-%d') AS day,
       CAST(coalesce(d.n_clicks, 0) AS BIGINT) AS n_clicks
FROM spine s LEFT JOIN daily d ON s.day = d.day
ORDER BY day
"""

# brute force — all token pairs with exact levenshtein; the engine
# runs the deletion-neighborhood equi-join instead (same output,
# opposite physical plan)
ORACLE["vocab_fuzzy_pairs"] = """
WITH vocab AS (
  SELECT DISTINCT t.tok
  FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
  WHERE len(t.tok) > 0
)
SELECT a.tok AS tok_a, b.tok AS tok_b
FROM vocab a JOIN vocab b ON a.tok < b.tok
WHERE levenshtein(a.tok, b.tok) <= 1
ORDER BY tok_a, tok_b
"""


ORACLE["attribution_decayed"] = """
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, epoch_us(ts) AS c_ts,
         CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS ad_id
  FROM events WHERE event_type = 'click'
),
touched AS (
  SELECT p.purchase_id, p.cents, c.ad_id,
         CAST(1 AS BIGINT) << (6 - CAST((p.p_ts - c.c_ts) // 300000000 AS INT)) AS w
  FROM purchases p JOIN clicks c
    ON p.user_id = c.user_id
   AND c.c_ts >= p.p_ts - 1800000000
   AND c.c_ts < p.p_ts
),
credited AS (
  SELECT ad_id,
         cents * 1000000 * w // sum(w) OVER (PARTITION BY purchase_id) AS credit_u
  FROM touched
)
SELECT ad_id, count(*) AS n_touches,
       floor(CAST(sum(credit_u) AS DOUBLE) / 100000000.0 * 100.0 + 0.5) / 100.0 AS credit
FROM credited GROUP BY ad_id ORDER BY ad_id
"""


def _bm25_oracle(
    terms=("spark", "join", "window", "stream"),
    k=20,
    k1=1.5,
    b=0.75,
    source="documents",
    prelude="",
    final_select=None,
):
    """Mirror of operators/retrieval.py::bm25_topk.  k1+1 and 1-b are
    exact binary doubles by parameter choice, so the literals below
    are bit-identical to the Spark side's Python floats.

    `source` names the corpus relation (a table or a CTE defined in
    `prelude`, which is injected verbatim at the head of the WITH);
    `final_select` overrides the top-k projection for composed
    oracles that decorate the scored rows."""
    tfs = ",\n         ".join(
        f"CAST(len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    dfs = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
        for i in range(len(terms))
    )
    parts = "\n       + ".join(
        f"ln(1.0 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * tf_{i} * {k1 + 1.0} / (tf_{i} + {k1} * ({1.0 - b} + {b} * dl / avgdl))"
        for i in range(len(terms))
    )
    final = final_select or f"""SELECT doc_id, bm25 FROM scored
WHERE bm25 > 0.0
ORDER BY bm25 DESC, doc_id ASC
LIMIT {k}"""
    return f"""
WITH {prelude}base AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
         {tfs}
  FROM {source}
),
stats AS (
  -- avgdl from exact integers (mirrors the Spark side): BIGINT sum,
  -- one final double division — order-independent across engines
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
         {dfs}
  FROM base
),
scored AS (
  SELECT doc_id,
         floor(({parts}) * 1000000.0 + 0.5) / 1000000.0 AS bm25
  FROM base CROSS JOIN stats
)
{final}
"""


ORACLE["bm25_topk"] = _bm25_oracle()

# the indexed variant is score-expression-identical by construction
# (sharded posting lists change IO, not arithmetic), so it shares the
# scan operator's oracle verbatim; the incremental build must land on
# the same index contents, so it shares it too — the gate row IS the
# proof that append == rebuild
ORACLE["bm25_topk_indexed"] = _bm25_oracle()
ORACLE["bm25_topk_incremental"] = _bm25_oracle()

# the composed two-day lifecycle: day 1 = the standing corpus, day 2 =
# the admitted arrivals (shared _ADMISSION_CTES), BM25 over their
# union, each hit decorated with its store day and the store's per-day
# counts — a double index append OR a store truncation/duplication on
# the day-2 re-run breaks this hash
ORACLE["corpus_pipeline_incremental"] = _bm25_oracle(
    source="corpus_inc",
    prelude=_ADMISSION_CTES
    + """,
corpus_inc AS (
  SELECT doc_id, text, '2024-01-01' AS day FROM cord
  UNION ALL
  SELECT doc_id, text, '2024-01-02' AS day FROM admitted
),
day_counts AS (
  SELECT CAST(sum(CASE WHEN day = '2024-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_day1,
         CAST(sum(CASE WHEN day = '2024-01-02' THEN 1 ELSE 0 END) AS BIGINT) AS n_day2
  FROM corpus_inc
),
""",
    final_select="""SELECT s.doc_id, s.bm25, c.day, d.n_day1, d.n_day2
FROM scored s JOIN corpus_inc c USING (doc_id) CROSS JOIN day_counts d
WHERE s.bm25 > 0.0
ORDER BY s.bm25 DESC, s.doc_id ASC
LIMIT 20""",
)

ORACLE["unigram_surprisal"] = """
WITH pairs AS (
  SELECT doc_id, tok AS token, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
),
vocab AS (
  SELECT token, sum(tf) AS c FROM pairs GROUP BY token
),
total AS (
  SELECT CAST(sum(c) AS DOUBLE) AS t_total FROM vocab
),
scored AS (
  SELECT p.doc_id,
         CAST(sum(p.tf) AS BIGINT) AS n_tokens,
         sum(CAST(p.tf AS DOUBLE) * (log2(t.t_total) - log2(CAST(v.c AS DOUBLE)))) AS bits
  FROM pairs p JOIN vocab v USING (token) CROSS JOIN total t
  GROUP BY p.doc_id
)
SELECT doc_id, n_tokens,
       floor(bits / CAST(n_tokens AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS bits_per_token
FROM scored
"""

def _vocab_growth_oracle(n_checkpoints: int = 10) -> str:
    """Mirror of operators/text_analysis.py::vocab_growth — generated
    from the same n_checkpoints parameter so a non-default call (or a
    default change) cannot silently diverge from the oracle."""
    return f"""
WITH firsts AS (
  SELECT tok AS token, min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
),
thresholds AS (
  SELECT CAST(i AS BIGINT) AS checkpoint,
         CAST((SELECT max(doc_id) FROM documents) * i // {n_checkpoints} AS BIGINT) AS doc_id_ceiling
  FROM range(1, {n_checkpoints + 1}) t(i)
),
vocab_at AS (
  SELECT th.checkpoint, th.doc_id_ceiling, count(*) AS vocab_size
  FROM firsts f JOIN thresholds th ON f.first_doc <= th.doc_id_ceiling
  GROUP BY th.checkpoint, th.doc_id_ceiling
),
docs_at AS (
  SELECT th.checkpoint, count(*) AS n_docs
  FROM documents d JOIN thresholds th ON d.doc_id <= th.doc_id_ceiling
  GROUP BY th.checkpoint
)
SELECT v.checkpoint, v.doc_id_ceiling, a.n_docs, v.vocab_size
FROM vocab_at v JOIN docs_at a USING (checkpoint)
ORDER BY v.checkpoint
"""


ORACLE["vocab_growth"] = _vocab_growth_oracle()

# mirror of operators/text_analysis.py::bigram_surprisal — exact
# BIGINT counts; only the two log2 calls and one division are float
ORACLE["bigram_surprisal"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
pairs AS (
  SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
    FROM toks WHERE len(t) >= 2
  )
  GROUP BY doc_id, bigram
),
vocab AS (
  SELECT bigram, CAST(sum(tf) AS BIGINT) AS c FROM pairs GROUP BY bigram
),
lefts AS (
  SELECT string_split(bigram, ' ')[1] AS w1, CAST(sum(c) AS BIGINT) AS c_left
  FROM vocab GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         CAST(sum(p.tf) AS BIGINT) AS n_bigrams,
         sum(CAST(p.tf AS DOUBLE)
             * (log2(CAST(l.c_left AS DOUBLE)) - log2(CAST(v.c AS DOUBLE)))) AS bits
  FROM pairs p
  JOIN vocab v USING (bigram)
  JOIN lefts l ON string_split(p.bigram, ' ')[1] = l.w1
  GROUP BY p.doc_id
)
SELECT doc_id, n_bigrams,
       floor(bits / CAST(n_bigrams AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
         AS bits_per_bigram
FROM scored
"""

# mirror of operators/packing.py::chunk_documents (chunk=128,
# step=96): starts at range(0, n, 96) (exclusive stop == Spark's
# sequence(0, n-1, 96)); chunk_idx = start/step exactly;
# list_slice end is INCLUSIVE in DuckDB, so end = start + 128
ORACLE["chunk_documents"] = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
e AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), 96)) AS start
  FROM t WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(start / 96 AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(toks, start + 1, start + 128), ' ') AS chunk_text,
       CAST(len(list_slice(toks, start + 1, start + 128)) AS BIGINT) AS n_tokens
FROM e
"""

# mirror of operators/dedup.py::exact_dedup_canonical — group by md5
# of NORMALIZED text (lower, explicit whitespace class collapsed,
# trimmed); keeper = highest 2-dp RAW-text quality then min doc_id
# per group.  The class [ \\t\\n\\r\\f\\x0B]+ is spelled out because
# RE2's \\s omits \\x0B while Java's includes it — both engines now
# run the identical class.
ORACLE["dedup_exact_canonical"] = """
WITH t AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))) AS h,
         string_split(text, ' ') AS toks
  FROM documents
),
s AS (
  SELECT doc_id, h,
         floor((least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.6
               + least((CAST(len(list_filter(toks, x -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'with'], x))) AS DOUBLE)
                        / CAST(len(toks) AS DOUBLE)) / 0.1, 1.0) * 0.4)
               * 100.0 + 0.5) / 100.0 AS quality_score
  FROM t
),
g AS (
  SELECT doc_id, quality_score,
         row_number() OVER (PARTITION BY h ORDER BY quality_score DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY h) AS n_copies
  FROM s
)
SELECT doc_id AS keep_id, CAST(n_copies AS BIGINT) AS n_copies, quality_score
FROM g WHERE rn = 1
"""

# mirror of operators/corpus_pipeline.py::quality_gate_report
# (min_tokens=10, min_quality=0.5, max_dup3=0.2, max_bits=6.0):
# row-local signal formulas verbatim from the text_stats /
# repetition_stats oracles; the LM term is the bigram_surprisal
# oracle left-joined (docs with <2 tokens score 0); reasons are
# concat_ws in fixed order, CASE-null-skipped exactly like Spark
ORACLE["quality_gate_report"] = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
),
sig AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         floor((least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.6
               + least((CAST(len(list_filter(toks, x -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'with'], x))) AS DOUBLE)
                        / CAST(len(toks) AS DOUBLE)) / 0.1, 1.0) * 0.4)
               * 100.0 + 0.5) / 100.0 AS quality_score,
         floor((CASE WHEN len(toks) >= 3
                     THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
                     ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS dup_3gram_frac
  FROM (
    SELECT doc_id, text, toks,
           list_transform(generate_series(1, len(toks) - 2),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g3
    FROM t
  )
),
pairs AS (
  SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram
    FROM t WHERE len(toks) >= 2
  )
  GROUP BY doc_id, bigram
),
vocab AS (
  SELECT bigram, CAST(sum(tf) AS BIGINT) AS c FROM pairs GROUP BY bigram
),
lefts AS (
  SELECT string_split(bigram, ' ')[1] AS w1, CAST(sum(c) AS BIGINT) AS c_left
  FROM vocab GROUP BY 1
),
lm AS (
  SELECT p.doc_id,
         floor(sum(CAST(p.tf AS DOUBLE)
                   * (log2(CAST(l.c_left AS DOUBLE)) - log2(CAST(v.c AS DOUBLE))))
               / CAST(sum(p.tf) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS bits_per_bigram
  FROM pairs p
  JOIN vocab v USING (bigram)
  JOIN lefts l ON string_split(p.bigram, ' ')[1] = l.w1
  GROUP BY p.doc_id
),
labeled AS (
  SELECT s.doc_id, s.n_tokens, s.quality_score, s.dup_3gram_frac,
         coalesce(lm.bits_per_bigram, 0.0) AS bits_per_bigram,
         concat_ws(',',
           CASE WHEN s.n_tokens < 10 THEN 'short' END,
           CASE WHEN s.quality_score < 0.5 THEN 'low_quality' END,
           CASE WHEN s.dup_3gram_frac > 0.2 THEN 'repetitive' END,
           CASE WHEN coalesce(lm.bits_per_bigram, 0.0) > 6.0 THEN 'salad' END
         ) AS reject_reasons
  FROM sig s LEFT JOIN lm USING (doc_id)
)
SELECT doc_id, n_tokens, quality_score, dup_3gram_frac, bits_per_bigram,
       reject_reasons = '' AS accepted, reject_reasons
FROM labeled
"""

# mirror of operators/corpus_pipeline.py::corpus_pipeline_e2e — the
# five per-stage oracles CHAINED as CTEs with survivor propagation:
# quality gate (defaults) → canonical dedup keepers → span scrub
# (heavy df counted over the KEPT set, not the raw corpus) → drop
# empties → 128/96 chunking → 512-budget packing over
# cid = doc_id*1e6 + chunk_idx stream order
ORACLE["corpus_pipeline_e2e"] = r"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
),
sig AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         floor((least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.6
               + least((CAST(len(list_filter(toks, x -> list_contains(['the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'with'], x))) AS DOUBLE)
                        / CAST(len(toks) AS DOUBLE)) / 0.1, 1.0) * 0.4)
               * 100.0 + 0.5) / 100.0 AS quality_score,
         floor((CASE WHEN len(toks) >= 3
                     THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
                     ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS dup_3gram_frac
  FROM (
    SELECT doc_id, toks,
           list_transform(generate_series(1, len(toks) - 2),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS g3
    FROM t
  )
),
bg_pairs AS (
  SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram
    FROM t WHERE len(toks) >= 2
  )
  GROUP BY doc_id, bigram
),
bg_vocab AS (
  SELECT bigram, CAST(sum(tf) AS BIGINT) AS c FROM bg_pairs GROUP BY bigram
),
bg_lefts AS (
  SELECT string_split(bigram, ' ')[1] AS w1, CAST(sum(c) AS BIGINT) AS c_left
  FROM bg_vocab GROUP BY 1
),
lm AS (
  SELECT p.doc_id,
         floor(sum(CAST(p.tf AS DOUBLE)
                   * (log2(CAST(l.c_left AS DOUBLE)) - log2(CAST(v.c AS DOUBLE))))
               / CAST(sum(p.tf) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS bits_per_bigram
  FROM bg_pairs p
  JOIN bg_vocab v USING (bigram)
  JOIN bg_lefts l ON string_split(p.bigram, ' ')[1] = l.w1
  GROUP BY p.doc_id
),
acc AS (
  SELECT t.doc_id, t.text, t.toks, s.quality_score
  FROM t JOIN sig s USING (doc_id) LEFT JOIN lm USING (doc_id)
  WHERE concat_ws(',',
          CASE WHEN s.n_tokens < 10 THEN 'short' END,
          CASE WHEN s.quality_score < 0.5 THEN 'low_quality' END,
          CASE WHEN s.dup_3gram_frac > 0.2 THEN 'repetitive' END,
          CASE WHEN coalesce(lm.bits_per_bigram, 0.0) > 6.0 THEN 'salad' END
        ) = ''
),
dg AS (
  SELECT doc_id,
         row_number() OVER (
           PARTITION BY md5(trim(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g')))
           ORDER BY quality_score DESC, doc_id) AS rn
  FROM acc
),
kept AS (
  SELECT a.doc_id, a.toks FROM acc a JOIN dg USING (doc_id) WHERE dg.rn = 1
),
starts AS (
  SELECT doc_id, pos, toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS shingle
  FROM (
    SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS pos
    FROM kept WHERE len(toks) >= 3
  )
),
heavy AS (
  SELECT shingle FROM starts GROUP BY shingle
  HAVING count(DISTINCT doc_id) >= 10
),
covered AS (
  SELECT DISTINCT doc_id, tok_i
  FROM (
    SELECT s.doc_id, unnest(range(s.pos, s.pos + 3)) AS tok_i
    FROM starts s JOIN heavy h USING (shingle)
  )
),
cov_lists AS (
  SELECT doc_id, array_agg(tok_i) AS cov FROM covered GROUP BY doc_id
),
scrub AS (
  SELECT k.doc_id,
         coalesce(array_to_string(
           list_filter(
             list_transform(range(1, len(k.toks) + 1),
               i -> CASE WHEN list_contains(coalesce(c.cov, []), i)
                         THEN NULL ELSE k.toks[i] END),
             x -> x IS NOT NULL),
           ' '), '') AS text
  FROM kept k LEFT JOIN cov_lists c USING (doc_id)
),
ne AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM scrub WHERE length(text) > 0
),
ch AS (
  SELECT doc_id,
         CAST(start / 96 AS BIGINT) AS chunk_idx,
         array_to_string(list_slice(toks, start + 1, start + 128), ' ') AS chunk_text
  FROM (
    SELECT doc_id, toks, unnest(range(0, len(toks), 96)) AS start
    FROM ne WHERE len(toks) > 0
  )
),
units AS (
  SELECT doc_id * 1000000 + chunk_idx AS cid, doc_id, chunk_idx,
         CAST(CASE WHEN length(trim(chunk_text)) = 0 THEN 0
              ELSE len(regexp_extract_all(trim(chunk_text), '\S+')) END AS BIGINT) AS n_tokens
  FROM ch
),
packed AS (
  SELECT doc_id, chunk_idx, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY cid
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - n_tokens AS "offset"
  FROM units
)
SELECT doc_id, chunk_idx, n_tokens, "offset",
       "offset" // 512 AS first_bin,
       greatest("offset" // 512, ("offset" + n_tokens - 1) // 512) AS last_bin
FROM packed
"""

# mirror of operators/text_analysis.py::backoff_surprisal
# (min_count=2, backoff weight 0.25 => +2 bits): every count is an
# exact BIGINT over corpus trigram positions; log2 + one division are
# the only float ops
ORACLE["backoff_surprisal"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
pairs AS (
  SELECT doc_id, trigram, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS trigram
    FROM toks WHERE len(t) >= 3
  )
  GROUP BY doc_id, trigram
),
c3 AS (
  SELECT trigram, CAST(sum(tf) AS BIGINT) AS c,
         string_split(trigram, ' ') AS w
  FROM pairs GROUP BY trigram
),
ctx AS (
  SELECT w[1] AS w1, w[2] AS w2, CAST(sum(c) AS BIGINT) AS ctx3
  FROM c3 GROUP BY 1, 2
),
suf AS (
  SELECT w[2] AS w2, w[3] AS w3, CAST(sum(c) AS BIGINT) AS suf2
  FROM c3 GROUP BY 1, 2
),
mid AS (
  SELECT w[2] AS w2, CAST(sum(c) AS BIGINT) AS mid1
  FROM c3 GROUP BY 1
),
lm AS (
  SELECT p.trigram,
         CASE WHEN p.c >= 2
              THEN log2(CAST(x.ctx3 AS DOUBLE)) - log2(CAST(p.c AS DOUBLE))
              ELSE 2.0 + log2(CAST(m.mid1 AS DOUBLE)) - log2(CAST(s.suf2 AS DOUBLE))
         END AS bits1
  FROM c3 p
  JOIN ctx x ON p.w[1] = x.w1 AND p.w[2] = x.w2
  JOIN suf s ON p.w[2] = s.w2 AND p.w[3] = s.w3
  JOIN mid m ON p.w[2] = m.w2
),
scored AS (
  SELECT pr.doc_id,
         CAST(sum(pr.tf) AS BIGINT) AS n_trigrams,
         sum(CAST(pr.tf AS DOUBLE) * lm.bits1) AS bits
  FROM pairs pr JOIN lm USING (trigram)
  GROUP BY pr.doc_id
)
SELECT doc_id, n_trigrams,
       floor(bits / CAST(n_trigrams AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
         AS bits_per_trigram
FROM scored
"""

# mirror of operators/text_analysis.py::remove_dup_spans (n=3,
# min_df=10): heavy = n-grams in >= 10 distinct docs; every token
# position covered by a heavy occurrence is dropped from the text
ORACLE["remove_dup_spans"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
starts AS (
  SELECT doc_id, pos, t[pos] || ' ' || t[pos+1] || ' ' || t[pos+2] AS shingle
  FROM (
    SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS pos
    FROM toks WHERE len(t) >= 3
  )
),
heavy AS (
  SELECT shingle FROM starts GROUP BY shingle
  HAVING count(DISTINCT doc_id) >= 10
),
covered AS (
  SELECT DISTINCT doc_id, tok_i
  FROM (
    SELECT s.doc_id, unnest(range(s.pos, s.pos + 3)) AS tok_i
    FROM starts s JOIN heavy h USING (shingle)
  )
),
cov_lists AS (
  SELECT doc_id, array_agg(tok_i) AS cov FROM covered GROUP BY doc_id
)
SELECT k.doc_id,
       -- coalesce: DuckDB array_to_string([]) is NULL, but a fully
       -- scrubbed doc has EMPTY text (matches Spark concat_ws)
       coalesce(array_to_string(
         list_filter(
           list_transform(range(1, len(k.t) + 1),
             i -> CASE WHEN list_contains(coalesce(c.cov, []), i)
                       THEN NULL ELSE k.t[i] END),
           x -> x IS NOT NULL),
         ' '), '') AS text,
       CAST(coalesce(len(c.cov), 0) AS BIGINT) AS n_removed
FROM toks k LEFT JOIN cov_lists c USING (doc_id)
"""

# mirror of operators/text_analysis.py::dup_ngram_coverage (n=3,
# min_df=10) — positional 3-gram counts, df over distinct docs,
# exact integers; one final float division
ORACLE["dup_ngram_coverage"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
pairs AS (
  SELECT doc_id, shingle, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
    FROM toks WHERE len(t) >= 3
  )
  GROUP BY doc_id, shingle
),
heavy AS (
  SELECT shingle FROM pairs GROUP BY shingle HAVING count(*) >= 10
),
dup AS (
  SELECT p.doc_id, CAST(sum(p.tf) AS BIGINT) AS dup_ngrams
  FROM pairs p JOIN heavy h USING (shingle)
  GROUP BY p.doc_id
),
totals AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_ngrams FROM pairs GROUP BY doc_id
)
SELECT t.doc_id, t.n_ngrams,
       CAST(coalesce(d.dup_ngrams, 0) AS BIGINT) AS dup_ngrams,
       floor(CAST(coalesce(d.dup_ngrams, 0) AS DOUBLE) / CAST(t.n_ngrams AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS dup_frac
FROM totals t LEFT JOIN dup d USING (doc_id)
"""

ORACLE["streaming_dedup_keys"] = """
SELECT DISTINCT user_id, event_type FROM events
"""

ORACLE["page_bfs_depths"] = f"""
WITH RECURSIVE {SESSIONIZE_CTES},
splits AS (
  SELECT session_id, page_id,
         lag(page_id) OVER (PARTITION BY session_id ORDER BY ts, event_id) AS prev_pg
  FROM actions
),
edges AS (
  SELECT DISTINCT prev_pg AS src, page_id AS dst
  FROM splits WHERE prev_pg IS NOT NULL
),
src0 AS (SELECT min(src) AS s FROM edges),
bfs(node, depth) AS (
  SELECT s, CAST(0 AS BIGINT) FROM src0
  UNION
  SELECT e.dst, b.depth + 1 FROM bfs b JOIN edges e ON e.src = b.node
  WHERE b.depth < 6
)
SELECT node, min(depth) AS depth FROM bfs GROUP BY node ORDER BY node
"""

ORACLE["event_type_pivot"] = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
FROM events GROUP BY 1 ORDER BY day
"""

ORACLE["events_cube"] = """
SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
FROM events
GROUP BY CUBE (event_type, CAST(dayofweek(ts) + 1 AS BIGINT))
ORDER BY event_type NULLS FIRST, dow NULLS FIRST
"""

ORACLE["user_halves_setops"] = """
WITH bounds AS (SELECT min(ts) + INTERVAL 14 DAY AS split_ts FROM events),
first_half AS (
  SELECT user_id FROM events, bounds WHERE ts <= split_ts
),
second_half AS (
  SELECT user_id FROM events, bounds WHERE ts > split_ts
)
SELECT 'churned' AS segment,
       CAST((SELECT count(*) FROM (SELECT user_id FROM first_half EXCEPT SELECT user_id FROM second_half)) AS BIGINT) AS n_users
UNION ALL
SELECT 'new',
       CAST((SELECT count(*) FROM (SELECT user_id FROM second_half EXCEPT SELECT user_id FROM first_half)) AS BIGINT)
UNION ALL
SELECT 'retained',
       CAST((SELECT count(*) FROM (SELECT user_id FROM first_half INTERSECT SELECT user_id FROM second_half)) AS BIGINT)
ORDER BY segment
"""

ORACLE["embedding_cluster_profile"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id AS cluster_id, v FROM e WHERE vec_id < 8),
assigned AS (
  SELECT m.vec_id AS member_id, c.cluster_id,
         list_cosine_similarity(m.v, c.v) AS c_sim,
         row_number() OVER (
           PARTITION BY m.vec_id
           ORDER BY floor(list_cosine_similarity(m.v, c.v) * 1000.0 + 0.5) / 1000.0 DESC,
                    c.cluster_id ASC) AS rn
  FROM e m CROSS JOIN cents c
)
SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       floor(min(c_sim) * 1000.0 + 0.5) / 1000.0 AS min_sim,
       floor(max(c_sim) * 1000.0 + 0.5) / 1000.0 AS max_sim
FROM assigned WHERE rn = 1
GROUP BY cluster_id ORDER BY cluster_id
"""

ORACLE["clicks_rollup_calendar"] = """
SELECT strftime(ts, '%Y-%m') AS month, strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_clicks,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
FROM events WHERE event_type = 'click'
GROUP BY ROLLUP (strftime(ts, '%Y-%m'), strftime(ts, '%Y-%m-%d'))
ORDER BY month NULLS FIRST, day NULLS FIRST
"""

# retrospective mean-shift changepoint: exact BIGINT prefix sums over
# the day-ordered click series, between-segment SSE gain
# S_t^2/t + (S_n-S_t)^2/(n-t) - S_n^2/n as a fixed per-row float tree,
# top-3 by the 6-dp-quantized gain with day tie-break
ORACLE["changepoint_daily"] = """
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS c
  FROM events WHERE event_type = 'click' GROUP BY 1
),
pref AS (
  SELECT day,
         row_number() OVER (ORDER BY day) AS t,
         sum(c) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS s_t
  FROM daily
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS s_n, CAST(count(*) AS BIGINT) AS n
  FROM daily
),
scored AS (
  SELECT day AS split_day,
         CAST(t AS BIGINT) AS n_days_before,
         CAST(n - t AS BIGINT) AS n_days_after,
         floor(CAST(s_t AS DOUBLE) / CAST(t AS DOUBLE) * 10000.0 + 0.5)
           / 10000.0 AS mean_before,
         floor((CAST(s_n AS DOUBLE) - CAST(s_t AS DOUBLE))
               / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE)) * 10000.0 + 0.5)
           / 10000.0 AS mean_after,
         floor((CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) / CAST(t AS DOUBLE)
                + (CAST(s_n AS DOUBLE) - CAST(s_t AS DOUBLE))
                  * (CAST(s_n AS DOUBLE) - CAST(s_t AS DOUBLE))
                  / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE))
                - CAST(s_n AS DOUBLE) * CAST(s_n AS DOUBLE) / CAST(n AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 AS sse_gain
  FROM pref CROSS JOIN tot
  WHERE t < n
)
SELECT split_day, n_days_before, n_days_after, mean_before, mean_after, sse_gain
FROM scored
ORDER BY sse_gain DESC, split_day ASC
LIMIT 3
"""

ORACLE["daily_anomaly_zscore"] = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS c
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, day, c,
         sum(c) OVER w AS s1,
         sum(c * c) OVER w AS s2,
         count(c) OVER w AS n_prev
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, CAST(c AS BIGINT) AS n_events,
       floor((CAST(7 * c - s1 AS DOUBLE) / 7.0)
             / sqrt(CAST(7 * s2 - s1 * s1 AS DOUBLE) / 42.0)
             * 1000000.0 + 0.5) / 1000000.0 AS zscore,
       abs((CAST(7 * c - s1 AS DOUBLE) / 7.0)
           / sqrt(CAST(7 * s2 - s1 * s1 AS DOUBLE) / 42.0)) > 2.0 AS is_anomaly
FROM stats
WHERE n_prev = 7 AND s2 * 7 > s1 * s1
ORDER BY event_type, day
"""

# DERIVED partsupp (testdata lacks the table): identical derivation to
# registry._partsupp — dbgen-style 4-suppliers-per-part assignment and
# deterministic availqty / integer-cent cost formulas.  Exact integer
# arithmetic end-to-end, so both engines build the same rows.
PARTSUPP_CTE = """
_s_n AS (SELECT count(*) AS s_n FROM supplier),
partsupp AS (
  SELECT p.p_partkey AS ps_partkey,
         (p.p_partkey + i.i * (s.s_n // 4 + p.p_partkey // s.s_n)) % s.s_n AS ps_suppkey,
         (p.p_partkey * 7 + i.i * 11) % 9999 + 1 AS ps_availqty,
         (p.p_partkey + i.i * 31) % 99900 + 100 AS ps_supplycost_cents
  FROM part p CROSS JOIN (SELECT unnest(range(4)) AS i) i CROSS JOIN _s_n s
)
"""

ORACLE["tpch_q16_derived"] = f"""
WITH {PARTSUPP_CTE}
SELECT p_brand, p_type, CAST(p_size AS INT) AS p_size,
       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 7, 10, 15, 20, 25, 30)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

ORACLE["tpch_q11_derived"] = f"""
WITH {PARTSUPP_CTE},
in_nation AS (
  SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS v_cents
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
),
per_part AS (
  SELECT ps_partkey, sum(v_cents) AS value_cents FROM in_nation GROUP BY ps_partkey
),
total AS (SELECT sum(v_cents) AS total_cents FROM in_nation)
SELECT ps_partkey,
       floor(CAST(value_cents AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS value
FROM per_part CROSS JOIN total
WHERE value_cents * 1000 > total_cents
ORDER BY value DESC, ps_partkey
"""

ORACLE["tpch_q2_derived"] = f"""
WITH {PARTSUPP_CTE},
eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
offers AS (
  SELECT ps_partkey, ps_supplycost_cents, s_suppkey, s_name, s_acctbal, n_name
  FROM partsupp JOIN eu_supp ON ps_suppkey = s_suppkey
),
min_cost AS (
  SELECT ps_partkey, min(ps_supplycost_cents) AS min_cents
  FROM offers GROUP BY ps_partkey
)
SELECT floor(s_acctbal * 100.0 + 0.5) / 100.0 AS s_acctbal,
       s_name, n_name AS nation, p_partkey, p_type,
       floor(CAST(ps_supplycost_cents AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS ps_supplycost
FROM offers
JOIN min_cost USING (ps_partkey)
JOIN part ON ps_partkey = p_partkey
WHERE ps_supplycost_cents = min_cents AND p_size = 15
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100
"""

ORACLE["tpch_q9_derived"] = f"""
WITH {PARTSUPP_CTE},
profit AS (
  SELECT n_name AS nation,
         CAST(year(o_orderdate) AS BIGINT) AS o_year,
         -- exact integer 1e-4-dollar units (mirrors the Spark side):
         -- order-independent BIGINT accumulation, one division at output
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
           - ps_supplycost_cents * CAST(l_quantity AS BIGINT) * 100 AS amount_1e4
  FROM lineitem
  JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_name LIKE '%ol%'
)
SELECT nation, o_year,
       floor(CAST(sum(amount_1e4) AS DOUBLE) / 100.0 + 0.5) / 100.0 AS sum_profit
FROM profit GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

ORACLE["tpch_q20_derived"] = f"""
WITH {PARTSUPP_CTE},
shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty_shipped
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
qualified AS (
  SELECT DISTINCT ps_suppkey
  FROM partsupp JOIN shipped
    ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  WHERE CAST(ps_availqty AS DOUBLE) * 2.0 > qty_shipped
)
SELECT s_name, n_name AS nation
FROM qualified JOIN supplier ON ps_suppkey = s_suppkey
               JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
ORDER BY s_name
"""

ORACLE["image_features_ppm"] = """
SELECT doc_id,
       CAST(2 + doc_id % 6 AS INT) AS width,
       CAST(1 + doc_id % 3 AS INT) AS height,
       CAST((doc_id * 5) % 256 AS DOUBLE) AS mean_r,
       CAST((doc_id * 11) % 256 AS DOUBLE) AS mean_g,
       CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_b
FROM documents
"""

# mirror of registry::image_features_jpeg — the decoded solid color
# after a baseline JPEG round trip, computed in closed form: YCbCr
# (shared literals with jpegcodec.py), DC quantization
# floor(8(v-128)/Q00 + 0.5) with Q00 = 16 (luma) / 17 (chroma),
# dequantized uniform reconstruction Q00·q/8 + 128, RGB conversion,
# half-up rounding, clamp.  Solid color → per-channel mean == the
# reconstructed channel value.
ORACLE["image_features_jpeg"] = """
WITH c AS (
  SELECT doc_id,
         CAST((doc_id * 7) % 256 AS DOUBLE) AS r,
         CAST((doc_id * 29) % 256 AS DOUBLE) AS g,
         CAST((doc_id * 47) % 256 AS DOUBLE) AS b
  FROM documents
),
ycc AS (
  SELECT doc_id, r, g, b,
         0.299 * r + 0.587 * g + 0.114 * b AS y,
         128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b AS cb,
         128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b AS cr
  FROM c
),
q AS (
  SELECT doc_id,
         floor(8.0 * (y - 128.0) / 16.0 + 0.5) * 16.0 / 8.0 + 128.0 AS yv,
         floor(8.0 * (cb - 128.0) / 17.0 + 0.5) * 17.0 / 8.0 + 128.0 AS bv,
         floor(8.0 * (cr - 128.0) / 17.0 + 0.5) * 17.0 / 8.0 + 128.0 AS rv
  FROM ycc
)
SELECT doc_id,
       CAST(9 + doc_id % 8 AS INT) AS width,
       CAST(8 + doc_id % 5 AS INT) AS height,
       greatest(0.0, least(255.0, floor(yv + 1.402 * (rv - 128.0) + 0.5))) AS mean_r,
       greatest(0.0, least(255.0, floor(yv - 0.344136 * (bv - 128.0) - 0.714136 * (rv - 128.0) + 0.5))) AS mean_g,
       greatest(0.0, least(255.0, floor(yv + 1.772 * (bv - 128.0) + 0.5))) AS mean_b
FROM q
"""

# mirror of registry::image_features_png — PNG is LOSSLESS, so the
# decoded solid-color means equal the synthesized colors exactly
ORACLE["image_features_png"] = """
SELECT doc_id,
       CAST(3 + doc_id % 7 AS INT) AS width,
       CAST(2 + doc_id % 4 AS INT) AS height,
       CAST((doc_id * 19) % 256 AS DOUBLE) AS mean_r,
       CAST((doc_id * 23) % 256 AS DOUBLE) AS mean_g,
       CAST((doc_id * 31) % 256 AS DOUBLE) AS mean_b
FROM documents
"""

ORACLE["props_variant_extract"] = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       json_extract_string(props, '$.missing') AS missing_field
FROM events WHERE event_id < 500 ORDER BY event_id
"""

ORACLE["user_value_locf"] = """
SELECT event_id, user_id, event_type,
       floor(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * 100.0 + 0.5) / 100.0 AS last_purchase_value
FROM events ORDER BY event_id
"""

ORACLE["tokenizer_fertility_by_lang"] = r"""
WITH tc AS (
  SELECT doc_id, lang,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_extract_all(trim(text), '\S+')) END AS ws_tokens,
         len(regexp_extract_all(text,
             '[A-Za-z]+''[A-Za-z]+|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ws_tokens) AS BIGINT) AS ws_total,
       CAST(sum(bpe_tokens) AS BIGINT) AS bpe_total,
       floor(CAST(sum(bpe_tokens) AS DOUBLE)
             / nullif(CAST(sum(ws_tokens) AS BIGINT), 0) * 1000000.0 + 0.5) / 1000000.0 AS fertility
FROM tc GROUP BY lang ORDER BY lang
"""

# ---- round 8: sweep-line / CDC / shuffle-shard / curriculum / skew / LSH --

# The ENGINE computes this as a two-level prefix sum (per-hour window
# + carry-in offsets); the oracle is the textbook serial sweep — one
# global ordered window — so the gate proves the decomposition exact.
ORACLE["session_concurrency_hourly"] = f"""
WITH {SESSIONIZE_CTES},
iv AS (
  SELECT session_id, min(epoch_us(ts)) AS start_us,
         max(epoch_us(ts)) + 1 AS end_us
  FROM actions GROUP BY session_id
),
deltas AS (
  SELECT ts_us, sum(d) AS net FROM (
    SELECT start_us AS ts_us, 1 AS d FROM iv
    UNION ALL
    SELECT end_us AS ts_us, -1 AS d FROM iv
  ) GROUP BY ts_us
),
run AS (
  SELECT ts_us,
         ts_us - ts_us % 3600000000 AS hour_us,
         sum(net) OVER (ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS concurrent
  FROM deltas
),
best AS (
  SELECT hour_us, max(concurrent) AS max_concurrent FROM run GROUP BY hour_us
)
SELECT CAST(r.hour_us AS BIGINT) AS hour_start_us,
       CAST(b.max_concurrent AS BIGINT) AS max_concurrent,
       CAST(min(r.ts_us) AS BIGINT) AS at_ts_us
FROM run r
JOIN best b ON r.hour_us = b.hour_us AND r.concurrent = b.max_concurrent
GROUP BY 1, 2
"""

ORACLE["cdc_apply_changelog"] = """
WITH log AS (
  SELECT user_id, event_id, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_changes
  FROM events
)
SELECT user_id,
       event_id AS last_event_id,
       floor(value * 100.0 + 0.5) / 100.0 AS last_value,
       CAST(n_changes AS BIGINT) AS n_changes
FROM log WHERE rn = 1 AND op <> 'D'
"""

ORACLE["training_shuffle_shards"] = """
WITH h AS (
  SELECT substring(md5('sh1:' || CAST(doc_id AS VARCHAR)), 1, 8) AS h,
         n_chars
  FROM documents
)
SELECT CAST(strpos('0123456789abcdef', substring(h, 1, 1)) - 1 AS INTEGER)
         AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(h) AS min_hash,
       max(h) AS max_hash
FROM h GROUP BY 1
"""

ORACLE["curriculum_stages"] = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, x -> list_contains({_STOPLIST}, x))) AS BIGINT) AS n_stop
  FROM t
),
q AS (
  SELECT doc_id, n_tokens,
         floor((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.6
               + least((CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 0.1, 1.0) * 0.4)
               * 100.0 + 0.5) / 100.0 AS quality_score
  FROM m
),
hist AS (SELECT quality_score AS s, count(*) AS c FROM q GROUP BY 1),
cum AS (
  SELECT s, sum(c) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cum,
         (SELECT sum(c) FROM hist) AS total
  FROM hist
),
th AS (
  SELECT min(CASE WHEN cum * 4 >= 1 * total THEN s END) AS q1,
         min(CASE WHEN cum * 4 >= 2 * total THEN s END) AS q2,
         min(CASE WHEN cum * 4 >= 3 * total THEN s END) AS q3
  FROM cum
),
staged AS (
  SELECT q.*, CASE WHEN quality_score > q3 THEN 0
                   WHEN quality_score > q2 THEN 1
                   WHEN quality_score > q1 THEN 2
                   ELSE 3 END AS stage
  FROM q, th
)
SELECT CAST(stage AS INTEGER) AS stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       min(quality_score) AS min_quality,
       max(quality_score) AS max_quality,
       floor(CAST(sum(CAST(floor(quality_score * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * 100.0) * 10000.0 + 0.5) / 10000.0
         AS avg_quality
FROM staged GROUP BY stage
"""


def _skew_block(table: str, col: str, label: str) -> str:
    return f"""
SELECT * FROM (
  WITH counts AS (SELECT {col} AS k, count(*) AS c FROM {table} GROUP BY 1),
  hist AS (SELECT c, count(*) AS nk FROM counts GROUP BY c),
  cum AS (
    SELECT c, sum(nk) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum,
           (SELECT sum(nk) FROM hist) AS total
    FROM hist
  ),
  s AS (
    SELECT CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(c) AS BIGINT) AS max_rows_per_key
    FROM counts
  ),
  p AS (
    SELECT CAST(min(CASE WHEN cum * 100 >= 99 * total THEN c END) AS BIGINT)
             AS p99_rows_per_key
    FROM cum
  )
  SELECT '{label}' AS key, n_rows, n_keys, max_rows_per_key, p99_rows_per_key,
         floor(CAST(max_rows_per_key AS DOUBLE) / CAST(n_rows AS DOUBLE)
               * 1000000.0 + 0.5) / 1000000.0 AS top1_frac
  FROM s, p
)
"""


ORACLE["skew_key_diagnostics"] = " UNION ALL ".join(
    _skew_block(t, c, lb)
    for t, c, lb in (
        ("events", "user_id", "events.user_id"),
        ("events", "event_type", "events.event_type"),
        ("lineitem", "l_orderkey", "lineitem.l_orderkey"),
        ("orders", "o_custkey", "orders.o_custkey"),
    )
)

# pair frame = dedup_ngram_jaccard's universe at threshold 0 (max_df
# stop-shingle cap identical); per-config collision probability uses
# explicit multiplication chains, never pow() — see
# operators/dedup.py lsh_tuning_report.
_LSH_PAIRS = """
heavy AS (SELECT shingle FROM dsh GROUP BY shingle HAVING count(*) > 1000),
fsh AS (SELECT * FROM dsh WHERE shingle NOT IN (SELECT shingle FROM heavy)),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM fsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM fsh a JOIN fsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT floor(CAST(inter AS DOUBLE)
               / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE)
               * 1000.0 + 0.5) / 1000.0 AS j
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
)
"""


def _lsh_config_select(b: int, r: int, threshold: float = 0.7) -> str:
    jr = " * ".join(["j"] * r)
    inner = f"(1.0 - ({jr}))"
    qb = " * ".join([inner] * b)
    p_u = f"CAST(floor((1.0 - {qb}) * 1000000.0 + 0.5) AS BIGINT)"
    n_true = f"sum(CASE WHEN j >= {threshold} THEN 1 ELSE 0 END)"
    s_mid = repr(round((1.0 / b) ** (1.0 / r), 6))
    return f"""
SELECT {b} AS bands, {r} AS rows_per_band, {s_mid} AS s_mid,
       floor(CAST(sum({p_u}) AS DOUBLE) / 1000000.0 * 1000.0 + 0.5) / 1000.0
         AS exp_candidates,
       CAST({n_true} AS BIGINT) AS n_true,
       CASE WHEN {n_true} = 0 THEN 0.0
            ELSE floor(CAST(sum(CASE WHEN j >= {threshold} THEN {p_u} ELSE 0 END) AS DOUBLE)
                       / (CAST({n_true} AS DOUBLE) * 1000000.0)
                       * 10000.0 + 0.5) / 10000.0
       END AS exp_recall
FROM pairs
"""


ORACLE["lsh_tuning_report"] = (
    f"WITH {SHINGLES_CTE},{_LSH_PAIRS}"
    + " UNION ALL ".join(
        _lsh_config_select(b, r) for b, r in ((16, 1), (8, 2), (4, 4), (2, 8))
    )
)

# engine generates pairs row-locally over the capped sorted item
# array; the oracle is the naive relational self-join — equality
# proves the bounded-fan-out form exact.
ORACLE["item_covisitation"] = f"""
WITH {SESSIONIZE_CTES},
baskets AS (
  SELECT session_id,
         (list_sort(list_distinct(list(product_id))))[1:32] AS items
  FROM actions
  WHERE event_type = 'click' AND product_id IS NOT NULL
  GROUP BY session_id
),
ex AS (SELECT session_id, unnest(items) AS item FROM baskets),
co AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_co
  FROM ex a JOIN ex b ON a.session_id = b.session_id AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= 1
),
n AS (SELECT item, count(*) AS n FROM ex GROUP BY item),
tot AS (SELECT count(*) AS n_sessions FROM baskets)
SELECT CAST(item_a AS BIGINT) AS item_a,
       CAST(item_b AS BIGINT) AS item_b,
       CAST(n_co AS BIGINT) AS n_co,
       CAST(na.n AS BIGINT) AS n_a,
       CAST(nb.n AS BIGINT) AS n_b,
       floor(CAST(n_co * n_sessions AS DOUBLE)
             / CAST(na.n * nb.n AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS lift,
       floor(CAST(n_co AS DOUBLE)
             / sqrt(CAST(na.n * nb.n AS DOUBLE)) * 10000.0 + 0.5) / 10000.0 AS cosine
FROM co
JOIN n na ON item_a = na.item
JOIN n nb ON item_b = nb.item, tot
"""

# GIF is lossless for palette frames: the oracle predicts decoded
# cross-frame means in closed form from the synthesis rule (h*w
# cancels exactly in IEEE division — see q_image_features_gif).
ORACLE["image_features_gif"] = """
WITH p AS (
  SELECT doc_id,
         CAST(3 + doc_id % 7 AS INTEGER) AS width,
         CAST(2 + doc_id % 4 AS INTEGER) AS height,
         CAST(1 + doc_id % 3 AS INTEGER) AS n_frames
  FROM documents
),
f AS (
  SELECT doc_id, width, height, n_frames,
         unnest(generate_series(0, n_frames - 1)) AS fr
  FROM p
),
m AS (
  SELECT doc_id, width, height, n_frames,
         sum((doc_id * 19 + fr * 41) % 256) AS sr,
         sum((doc_id * 23 + fr * 43) % 256) AS sg,
         sum((doc_id * 31 + fr * 47) % 256) AS sb
  FROM f GROUP BY 1, 2, 3, 4
)
SELECT doc_id, width, height, n_frames,
       floor(CAST(sr AS DOUBLE) / n_frames * 10000.0 + 0.5) / 10000.0 AS mean_r,
       floor(CAST(sg AS DOUBLE) / n_frames * 10000.0 + 0.5) / 10000.0 AS mean_g,
       floor(CAST(sb AS DOUBLE) / n_frames * 10000.0 + 0.5) / 10000.0 AS mean_b
FROM m
"""

# IMA ADPCM round-trips constant tones bit-exactly (nibble 0 at step
# index 0 adds step>>3 == 0), so the compressed-audio gate reduces to
# closed-form arithmetic over the synthesis rule.
ORACLE["audio_features_adpcm"] = """
SELECT doc_id,
       CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS sample_rate,
       CAST(65 + (doc_id % 37) * 2 AS BIGINT) AS n_samples,
       floor(CAST(65 + (doc_id % 37) * 2 AS DOUBLE)
             / (8000 + (doc_id % 8) * 1000) * 1000000.0 + 0.5) / 1000000.0
         AS duration_sec,
       floor(abs(CAST((doc_id * 131) % 20000 - 10000 AS DOUBLE))
             * 10000.0 + 0.5) / 10000.0 AS rms
FROM documents
"""

# decay weight = 2^-age accumulated as Σ c·2^(30-age) in integer
# space; the single final division by 2^30 is exact-over-exact —
# identical in any IEEE engine (see operators/engagement.py).
ORACLE["trending_items_decayed"] = """
WITH clicks AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         CAST(ts AS DATE) AS day
  FROM events
  WHERE event_type = 'click'
    AND json_extract_string(props, '$.k') IS NOT NULL
),
daily AS (SELECT item, day, count(*) AS c FROM clicks GROUP BY 1, 2),
m AS (SELECT max(day) AS max_day FROM daily),
aged AS (
  SELECT item, c, date_diff('day', day, max_day) AS age
  FROM daily, m
  WHERE date_diff('day', day, max_day) <= 30
),
s AS (
  SELECT item,
         sum(c * (CAST(1 AS BIGINT) << (30 - age))) AS score_scaled,
         sum(c) AS n
  FROM aged GROUP BY item
),
r AS (
  SELECT *, row_number() OVER (ORDER BY score_scaled DESC, item ASC) AS rank
  FROM s
)
SELECT CAST(rank AS INTEGER) AS rank,
       CAST(item AS BIGINT) AS item,
       CAST(score_scaled AS DOUBLE) / 1073741824.0 AS score,
       CAST(n AS BIGINT) AS n_clicks_total
FROM r WHERE rank <= 20
"""


def _rfm_dim_thresholds(dim: str, alias: str) -> str:
    return f"""
t{alias} AS (
  SELECT min(CASE WHEN cum * 4 >= 1 * total THEN v END) AS {alias}1,
         min(CASE WHEN cum * 4 >= 2 * total THEN v END) AS {alias}2,
         min(CASE WHEN cum * 4 >= 3 * total THEN v END) AS {alias}3
  FROM (
    SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
           (SELECT count(*) FROM u) AS total
    FROM (SELECT {dim} AS v, count(*) AS c FROM u GROUP BY 1)
  )
)"""


ORACLE["rfm_segments"] = f"""
WITH p AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
u AS (
  SELECT user_id,
         CAST(date_diff('day', max(day), (SELECT max(day) FROM p)) AS BIGINT)
           AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(cents) AS BIGINT) AS monetary_cents
  FROM p GROUP BY user_id
),{_rfm_dim_thresholds("recency_days", "r")},{_rfm_dim_thresholds("frequency", "f")},{_rfm_dim_thresholds("monetary_cents", "m")},
scored AS (
  SELECT user_id, recency_days, frequency, monetary_cents,
         CAST(5 - (CASE WHEN recency_days <= r1 THEN 1
                        WHEN recency_days <= r2 THEN 2
                        WHEN recency_days <= r3 THEN 3 ELSE 4 END) AS INTEGER) AS r_score,
         CAST(CASE WHEN frequency <= f1 THEN 1
                   WHEN frequency <= f2 THEN 2
                   WHEN frequency <= f3 THEN 3 ELSE 4 END AS INTEGER) AS f_score,
         CAST(CASE WHEN monetary_cents <= m1 THEN 1
                   WHEN monetary_cents <= m2 THEN 2
                   WHEN monetary_cents <= m3 THEN 3 ELSE 4 END AS INTEGER) AS m_score
  FROM u, tr, tf, tm
)
SELECT *, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS segment
FROM scored
"""

def _bpe_ctes(num_merges: int = 8) -> str:
    """Shared CTE chain for the BPE family: the merge loop UNROLLED
    as one (best, words) MATERIALIZED CTE pair per iteration (DuckDB
    would otherwise inline each CTE into its ~5 consumers and
    re-derive the whole prefix per level — exponential).  The
    sentinel-wrapped `replace` is the same greedy left-to-right
    non-overlapping merge as the Spark side; chr(30) is a
    never-matching fallback so an exhausted pair space leaves later
    iterations as no-ops instead of NULLing the corpus."""
    ctes = [
        """words0 AS MATERIALIZED (
  SELECT regexp_replace(word, '(?s)(.)', chr(31) || '\\1' || chr(31), 'g') AS ws,
         count(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE length(word) > 0 AND word NOT LIKE '%' || chr(31) || '%'
  GROUP BY 1
)"""
    ]
    for i in range(1, num_merges + 1):
        p = i - 1
        ctes.append(
            f"""best{i} AS MATERIALIZED (
  SELECT z[1] AS l, z[2] AS r, CAST(sum(cnt) AS BIGINT) AS pair_count
  FROM (
    SELECT cnt, unnest(list_zip(syms, syms[2:])) AS z
    FROM (SELECT cnt,
                 string_split(substring(ws, 2, length(ws)-2), chr(31)||chr(31)) AS syms
          FROM words{p})
  )
  WHERE z[2] IS NOT NULL
  GROUP BY 1, 2
  ORDER BY pair_count DESC, l ASC, r ASC LIMIT 1
),
words{i} AS MATERIALIZED (
  SELECT replace(ws,
           chr(31) || coalesce((SELECT l FROM best{i}), chr(30)) || chr(31)
             || chr(31) || coalesce((SELECT r FROM best{i}), chr(30)) || chr(31),
           chr(31) || coalesce((SELECT l FROM best{i}), chr(30))
             || coalesce((SELECT r FROM best{i}), chr(30)) || chr(31)) AS ws,
         cnt
  FROM words{p}
)"""
        )
    return ",\n".join(ctes)


def _bpe_oracle(num_merges: int = 8) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, pair_count FROM best{i}"
        for i in range(1, num_merges + 1)
    )
    return (
        "WITH "
        + _bpe_ctes(num_merges)
        + "\nSELECT CAST(rank AS BIGINT) AS rank, left_sym, right_sym, merged, pair_count"
        + "\nFROM (" + union + ") ORDER BY rank"
    )


def _bpe_encode_oracle(num_merges: int = 8) -> str:
    """Mirror of bpe_encode_stats: re-learn the merges via _bpe_ctes,
    then apply them to each DOCUMENT as the same rank-ordered chain of
    sentinel replaces (scalar subqueries inject the learned pairs)."""
    encoded = "ws"
    for i in range(1, num_merges + 1):
        li = f"coalesce((SELECT l FROM best{i}), chr(30))"
        ri = f"coalesce((SELECT r FROM best{i}), chr(30))"
        encoded = (
            f"replace({encoded},\n"
            f"  chr(31) || {li} || chr(31) || chr(31) || {ri} || chr(31),\n"
            f"  chr(31) || {li} || {ri} || chr(31))"
        )
    return f"""
WITH {_bpe_ctes(num_merges)},
doc_words AS (
  SELECT list_filter(string_split(text, ' '),
                     w -> length(w) > 0 AND NOT contains(w, chr(31))) AS wlist
  FROM documents
),
staged AS (
  SELECT CAST(len(wlist) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(wlist, w -> length(w))), 0) AS BIGINT) AS n_chars,
         array_to_string(list_transform(wlist,
             w -> regexp_replace(w, '(?s)(.)', chr(31) || '\\1' || chr(31), 'g')), ' ') AS ws
  FROM doc_words
),
per_doc AS (
  SELECT n_words, n_chars,
         CAST((length({encoded})
               - length(replace({encoded}, chr(31), ''))) / 2 AS BIGINT) AS n_tokens
  FROM staged
),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_words) AS BIGINT) AS total_words,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens
  FROM per_doc
)
SELECT n_docs, total_words, total_chars, total_tokens,
       floor(CASE WHEN total_tokens > 0
                  THEN CAST(total_chars AS DOUBLE) / CAST(total_tokens AS DOUBLE) END
             * 1000000.0 + 0.5) / 1000000.0 AS chars_per_token,
       floor(CASE WHEN total_words > 0
                  THEN CAST(total_tokens AS DOUBLE) / CAST(total_words AS DOUBLE) END
             * 1000000.0 + 0.5) / 1000000.0 AS tokens_per_word
FROM totals
"""


ORACLE["bpe_learn_merges"] = _bpe_oracle()
ORACLE["bpe_encode_stats"] = _bpe_encode_oracle()

ORACLE["ab_test_report"] = """
WITH bounds AS (
  SELECT user_id,
         min(epoch_us(ts)) AS first_us,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS goal_us
  FROM events GROUP BY user_id
),
per_user AS (
  -- time-bound activation: first purchase within 24h of first activity
  SELECT user_id,
         CASE WHEN goal_us - first_us <= 86400000000 THEN 1 ELSE 0 END AS converted
  FROM bounds
),
assigned AS (
  SELECT CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant,
         converted
  FROM per_user
),
counts AS (
  SELECT CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN variant = 'A' THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN variant = 'B' THEN converted ELSE 0 END) AS BIGINT) AS conv_b
  FROM assigned
),
calc AS (
  -- empty arm → NULL rate + undefined test (mirrors the Spark guard)
  SELECT *,
         CASE WHEN n_a > 0 THEN CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) END AS rate_a_raw,
         CASE WHEN n_b > 0 THEN CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS rate_b_raw,
         CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pooled
  FROM counts
),
sec AS (
  SELECT *,
         CASE WHEN n_a > 0 AND n_b > 0
              THEN sqrt(pooled * (1.0 - pooled)
                        * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
         END AS se
  FROM calc
),
zc AS (
  -- se = 0 iff pooled rate is exactly 0 or 1 → effect is exactly 0;
  -- define z := 0 instead of 0/0 (mirrors the Spark-side ANSI guard)
  SELECT *,
         floor(CASE WHEN se > 0.0
                    THEN (rate_a_raw - rate_b_raw) / se
                    ELSE 0.0 END
               * 10000.0 + 0.5) / 10000.0 AS z_score
  FROM sec
)
SELECT n_a, conv_a, n_b, conv_b,
       floor(rate_a_raw * 1000000.0 + 0.5) / 1000000.0 AS rate_a,
       floor(rate_b_raw * 1000000.0 + 0.5) / 1000000.0 AS rate_b,
       floor((rate_a_raw - rate_b_raw) * 1000000.0 + 0.5) / 1000000.0 AS lift,
       z_score,
       abs(z_score) > 1.96 AS significant
FROM zc
"""

ORACLE["ab_test_cuped"] = """
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase'
                        AND ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase'
                        AND ts >= TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
assigned AS (
  SELECT CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant, x, y
  FROM per_user
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN variant = 'A' THEN x ELSE 0 END) AS BIGINT) AS sx_a,
         CAST(sum(CASE WHEN variant = 'A' THEN y ELSE 0 END) AS BIGINT) AS sy_a,
         CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN variant = 'B' THEN x ELSE 0 END) AS BIGINT) AS sx_b,
         CAST(sum(CASE WHEN variant = 'B' THEN y ELSE 0 END) AS BIGINT) AS sy_b
  FROM assigned
),
c AS (
  SELECT *,
         CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_x,
         CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_y,
         CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cov_xy
  FROM m
),
t AS (
  SELECT *,
         CASE WHEN n * sxx - sx * sx > 0 THEN cov_xy / var_x ELSE 0.0 END AS theta
  FROM c
),
d AS (
  SELECT *,
         CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS my_a,
         CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS my_b,
         CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mx_a,
         CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mx_b
  FROM t
)
SELECT n_a, n_b,
       floor(theta * 1000000.0 + 0.5) / 1000000.0 AS theta,
       floor(CASE WHEN n_a > 0 AND n_b > 0 THEN my_a - my_b END
             * 1000000.0 + 0.5) / 1000000.0 AS diff_raw,
       floor(CASE WHEN n_a > 0 AND n_b > 0
                  THEN (my_a - my_b) - theta * (mx_a - mx_b) END
             * 1000000.0 + 0.5) / 1000000.0 AS diff_cuped,
       floor(var_y * 1000000.0 + 0.5) / 1000000.0 AS var_y,
       floor((var_y - theta * theta * var_x) * 1000000.0 + 0.5) / 1000000.0 AS var_cuped,
       floor(CASE WHEN n * syy - sy * sy > 0
                  THEN theta * theta * var_x / var_y * 100.0 ELSE 0.0 END
             * 10000.0 + 0.5) / 10000.0 AS var_reduction_pct
FROM d
"""

ORACLE["ab_test_mannwhitney"] = """
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
assigned AS (
  SELECT CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant, y
  FROM per_user
),
hist AS (
  SELECT variant, y, CAST(count(*) AS BIGINT) AS c FROM assigned GROUP BY 1, 2
),
u AS (
  SELECT CAST(coalesce(sum(CASE WHEN a.ya > b.yb THEN 2 * a.ca * b.cb
                                WHEN a.ya = b.yb THEN a.ca * b.cb
                                ELSE 0 END), 0) AS BIGINT) AS u2
  FROM (SELECT y AS ya, c AS ca FROM hist WHERE variant = 'A') a
  CROSS JOIN (SELECT y AS yb, c AS cb FROM hist WHERE variant = 'B') b
),
ties AS (
  -- DECIMAL, not DOUBLE: t*t*t as BIGINT overflows past ~2.1M-row
  -- tie groups, and a DOUBLE sum of t^3 terms is order-dependent
  -- once the running sum passes 2^53; t <= 10^12 as DECIMAL(12,0)
  -- cubes into DECIMAL(38,0) exactly, the sum is associative, and
  -- the one decimal->double rounding at the end is deterministic
  SELECT coalesce(CAST(sum(CAST(t AS DECIMAL(12,0)) * CAST(t AS DECIMAL(12,0))
                           * CAST(t AS DECIMAL(12,0))
                      - CAST(t AS DECIMAL(12,0))) AS DOUBLE), 0.0) AS tie_term
  FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM hist GROUP BY y)
),
counts AS (
  SELECT CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM assigned
),
j AS (SELECT *, n_a + n_b AS n FROM counts, u, ties),
-- overflow guard mirror: each exact BIGINT moment promoted to DOUBLE
-- BEFORE the variance product (int64 blows at ~8-9k users otherwise)
d AS (
  SELECT n_a, n_b, u2,
         CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) AS nab_d,
         CAST(n AS DOUBLE) AS nd,
         CAST(tie_term AS DOUBLE) AS tie_d
  FROM j
),
zc AS (
  SELECT n_a, n_b, u2,
         floor(CASE WHEN nab_d * (nd * nd * nd - nd - tie_d) > 0
                    THEN (CAST(u2 AS DOUBLE) - nab_d)
                         / (2.0 * sqrt(nab_d * (nd * nd * nd - nd - tie_d)
                                       / (12.0 * nd * (nd - 1.0))))
                    ELSE 0.0 END * 10000.0 + 0.5) / 10000.0 AS z_score
  FROM d
)
SELECT n_a, n_b,
       CAST(u2 AS DOUBLE) / 2.0 AS u_stat,
       z_score,
       abs(z_score) > 1.96 AS significant
FROM zc
"""

ORACLE["ab_test_quantile_effects"] = """
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
assigned AS (
  SELECT CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant, y
  FROM per_user
),
hist AS (
  SELECT variant, y, CAST(count(*) AS BIGINT) AS c FROM assigned GROUP BY 1, 2
),
cum AS (
  SELECT *,
         sum(c) OVER (PARTITION BY variant ORDER BY y
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY variant) AS total
  FROM hist
)
SELECT
  CAST(max(CASE WHEN variant = 'A' THEN total END) AS BIGINT) AS n_a,
  CAST(max(CASE WHEN variant = 'B' THEN total END) AS BIGINT) AS n_b,
  min(CASE WHEN variant = 'A' AND cum * 100 >= 25 * total THEN y END) AS p25_a,
  min(CASE WHEN variant = 'B' AND cum * 100 >= 25 * total THEN y END) AS p25_b,
  min(CASE WHEN variant = 'A' AND cum * 100 >= 50 * total THEN y END) AS p50_a,
  min(CASE WHEN variant = 'B' AND cum * 100 >= 50 * total THEN y END) AS p50_b,
  min(CASE WHEN variant = 'A' AND cum * 100 >= 75 * total THEN y END) AS p75_a,
  min(CASE WHEN variant = 'B' AND cum * 100 >= 75 * total THEN y END) AS p75_b,
  min(CASE WHEN variant = 'A' AND cum * 100 >= 90 * total THEN y END) AS p90_a,
  min(CASE WHEN variant = 'B' AND cum * 100 >= 90 * total THEN y END) AS p90_b,
  min(CASE WHEN variant = 'A' AND cum * 100 >= 25 * total THEN y END)
    - min(CASE WHEN variant = 'B' AND cum * 100 >= 25 * total THEN y END) AS d25,
  min(CASE WHEN variant = 'A' AND cum * 100 >= 50 * total THEN y END)
    - min(CASE WHEN variant = 'B' AND cum * 100 >= 50 * total THEN y END) AS d50,
  min(CASE WHEN variant = 'A' AND cum * 100 >= 75 * total THEN y END)
    - min(CASE WHEN variant = 'B' AND cum * 100 >= 75 * total THEN y END) AS d75,
  min(CASE WHEN variant = 'A' AND cum * 100 >= 90 * total THEN y END)
    - min(CASE WHEN variant = 'B' AND cum * 100 >= 90 * total THEN y END) AS d90
FROM cum
"""

ORACLE["new_vs_returning_daily"] = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
fs AS (SELECT user_id, min(day) AS first_day FROM du GROUP BY user_id)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(count(*) - sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returning
FROM du JOIN fs USING (user_id)
GROUP BY day
"""

# both directions of every unordered co-click pair; the covisitation
# CTE chain is the item_covisitation oracle's, verbatim
ORACLE["basket_affinity_rules"] = f"""
WITH {SESSIONIZE_CTES},
baskets AS (
  SELECT session_id,
         (list_sort(list_distinct(list(product_id))))[1:32] AS items
  FROM actions
  WHERE event_type = 'click' AND product_id IS NOT NULL
  GROUP BY session_id
),
ex AS (SELECT session_id, unnest(items) AS item FROM baskets),
co AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_co
  FROM ex a JOIN ex b ON a.session_id = b.session_id AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= 1
),
n AS (SELECT item, count(*) AS n FROM ex GROUP BY item),
tot AS (SELECT count(*) AS n_sessions FROM baskets),
pairs AS (
  SELECT item_a, item_b, n_co, na.n AS n_a, nb.n AS n_b,
         floor(CAST(n_co * n_sessions AS DOUBLE)
               / CAST(na.n * nb.n AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS lift
  FROM co
  JOIN n na ON item_a = na.item
  JOIN n nb ON item_b = nb.item, tot
)
SELECT CAST(item_a AS BIGINT) AS antecedent,
       CAST(item_b AS BIGINT) AS consequent,
       CAST(n_co AS BIGINT) AS n_co,
       CAST(n_a AS BIGINT) AS n_antecedent,
       floor(CAST(n_co AS DOUBLE) / CAST(n_a AS DOUBLE) * 10000.0 + 0.5) / 10000.0
         AS confidence,
       lift
FROM pairs
UNION ALL
SELECT CAST(item_b AS BIGINT), CAST(item_a AS BIGINT), CAST(n_co AS BIGINT),
       CAST(n_b AS BIGINT),
       floor(CAST(n_co AS DOUBLE) / CAST(n_b AS DOUBLE) * 10000.0 + 0.5) / 10000.0,
       lift
FROM pairs
"""


# ---- round 12: featurization / LSH-ANN / communities / moments ----------

ORACLE["target_encode_category"] = f"""
WITH {SESSIONIZE_CTES},
per_cat AS (
  SELECT category_id, count(*) AS n_events,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_target
  FROM actions WHERE category_id IS NOT NULL GROUP BY 1
),
tot AS (SELECT sum(n_events) AS tn, sum(n_target) AS th FROM per_cat)
SELECT category_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_target AS BIGINT) AS n_target,
       floor((CAST(th AS DOUBLE) / CAST(tn AS DOUBLE)) * 1000000.0 + 0.5)
         / 1000000.0 AS prior,
       floor(((CAST(n_target AS DOUBLE)
               + 20.0 * (CAST(th AS DOUBLE) / CAST(tn AS DOUBLE)))
              / (CAST(n_events AS DOUBLE) + 20.0)) * 1000000.0 + 0.5)
         / 1000000.0 AS encoded
FROM per_cat, tot
ORDER BY category_id
"""

# hashing-trick features: md5_prefix32 buckets, sign = next hash bit
# via INTEGER division (h // 64 — Spark's `div`; a double divide +
# cast would round in DuckDB and truncate in Spark)
ORACLE["feature_hash_docs"] = """
WITH sampled AS (
  SELECT doc_id, text FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 20
),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM sampled),
hashed AS (
  SELECT doc_id, CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h
  FROM toks
),
feats AS (
  SELECT doc_id, CAST(h % 64 AS INTEGER) AS dim_id,
         sum(CASE WHEN (h // 64) % 2 = 1 THEN 1 ELSE -1 END) AS feat
  FROM hashed GROUP BY 1, 2
)
SELECT doc_id, dim_id, CAST(feat AS BIGINT) AS feat
FROM feats WHERE feat <> 0
ORDER BY doc_id, dim_id
"""

# LSH-bucketed ANN: the shared banded head (seeded planes, exact sign
# bits ⇒ deterministic candidates), then exact cosine ranking over
# candidates only — quantized-sim ordering + id tie-break, the same
# cross-engine rank discipline as ORACLE['ann_cosine_topk']
ORACLE["ann_lsh_topk"] = f"""
WITH {_lsh_bits_ctes()},
qb AS (SELECT vec_id AS query_id, band, bucket FROM banded WHERE vec_id < 10),
cand AS (
  SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
  FROM banded b JOIN qb ON b.band = qb.band AND b.bucket = qb.bucket
  WHERE b.vec_id <> qb.query_id
),
sims AS (
  SELECT query_id, neighbor_id,
         list_cosine_similarity(eq.v, en.v) AS sim,
         row_number() OVER (PARTITION BY query_id
             ORDER BY floor(list_cosine_similarity(eq.v, en.v) * 1000.0 + 0.5)
                        / 1000.0 DESC,
                      neighbor_id ASC) AS rn
  FROM cand
  JOIN e eq ON eq.vec_id = cand.query_id
  JOIN e en ON en.vec_id = cand.neighbor_id
)
SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id,
       floor(sim * 1000.0 + 0.5) / 1000.0 AS sim
FROM sims WHERE rn <= 5
"""


def _lpa_round(i: int) -> str:
    return f"""c{i} AS (
  SELECT bi.u AS node, l.label, sum(bi.w) AS lw
  FROM bi JOIN l{i - 1} l ON l.node = bi.v
  GROUP BY 1, 2
),
l{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY lw DESC, label ASC) AS rn
    FROM c{i})
  WHERE rn = 1
)"""


# synchronous weighted LPA, 3 unrolled rounds (the pagerank pattern
# with exact-integer argmax instead of rounded doubles); edges are the
# item_covisitation pairs expanded to both directions
ORACLE["item_communities_lpa"] = (
    f"""
WITH {SESSIONIZE_CTES},
baskets AS (
  SELECT session_id,
         (list_sort(list_distinct(list(product_id))))[1:32] AS items
  FROM actions
  WHERE event_type = 'click' AND product_id IS NOT NULL
  GROUP BY session_id
),
ex AS (SELECT session_id, unnest(items) AS item FROM baskets),
co AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_co
  FROM ex a JOIN ex b ON a.session_id = b.session_id AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= 1
),
bi AS (
  SELECT item_a AS u, item_b AS v, n_co AS w FROM co
  UNION ALL
  SELECT item_b AS u, item_a AS v, n_co AS w FROM co
),
l0 AS (SELECT DISTINCT u AS node, u AS label FROM bi),
"""
    + ",\n".join(_lpa_round(i) for i in range(1, 4))
    + """
SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS community
FROM l3 ORDER BY node
"""
)

# integer-exact covariance: every coordinate quantized ONCE to the
# 4-dp grid, all moment sums int64 (order-free), one fixed-order
# double expression at the end — mirrors embedstats.py verbatim
ORACLE["embedding_covariance"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qv AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(floor(x * 10000.0 + 0.5) AS BIGINT)) AS q
  FROM e
),
ux AS (
  SELECT vec_id, CAST(t.i AS INTEGER) AS i, q[CAST(t.i AS INTEGER)] AS qi
  FROM qv, range(1, 65) t(i)
),
pairs AS (
  SELECT a.i AS i, b.i AS j, sum(a.qi * b.qi) AS s_ij
  FROM ux a JOIN ux b ON a.vec_id = b.vec_id AND b.i >= a.i
  GROUP BY 1, 2
),
sums AS (SELECT i, sum(qi) AS s FROM ux GROUP BY 1),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e)
SELECT p.i AS i, p.j AS j,
       CASE WHEN n > 1.0 THEN
         floor(((CAST(s_ij AS DOUBLE) - CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE) / n)
                / (n - 1.0) / 100000000.0) * 1000000000.0 + 0.5)
           / 1000000000.0
       END AS cov
FROM pairs p
JOIN sums sa ON sa.i = p.i
JOIN sums sb ON sb.i = p.j, nn
ORDER BY i, j
"""

# PMI collocations: exact-integer counts, one fixed-order ratio chain
# + log2 (the bigram_surprisal log2-parity precedent), 6-dp HALF_UP,
# token-pair tie-break inside equal quantized PMI
ORACLE["collocations_pmi"] = """
WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
uni AS (SELECT unnest(toks) AS tok FROM t),
big AS (
  SELECT toks[CAST(i AS INTEGER)] AS tok_a,
         toks[CAST(i AS INTEGER) + 1] AS tok_b
  FROM (
    SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
    FROM t WHERE len(toks) >= 2
  )
),
cxy AS (
  SELECT tok_a, tok_b, count(*) AS c_xy
  FROM big GROUP BY 1, 2 HAVING count(*) >= 3
),
cw AS (SELECT tok, count(*) AS c_w FROM uni GROUP BY 1),
nt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM uni),
nb AS (SELECT CAST(count(*) AS DOUBLE) AS nbig FROM big)
SELECT tok_a, tok_b, CAST(c_xy AS BIGINT) AS c_xy,
       floor(log2((CAST(c_xy AS DOUBLE) / nbig)
                  / ((CAST(ca.c_w AS DOUBLE) / n)
                     * (CAST(cb.c_w AS DOUBLE) / n))) * 1000000.0 + 0.5)
         / 1000000.0 AS pmi
FROM cxy
JOIN cw ca ON ca.tok = tok_a
JOIN cw cb ON cb.tok = tok_b, nt, nb
ORDER BY pmi DESC, tok_a, tok_b
LIMIT 100
"""

# robust spend stats: exact integer inverse-CDF thresholds (smallest
# value whose rank*20 reaches n / 19n — monotone integer predicate,
# no 0.05*n double), integer clamp/trim sums, one double division
ORACLE["winsorized_user_spend"] = """
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS spend_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS t FROM per_user),
ranked AS (
  SELECT spend_cents AS v, row_number() OVER (ORDER BY spend_cents) AS r
  FROM per_user
),
th AS (
  SELECT min(CASE WHEN r * 20 >= t THEN v END) AS lo,
         min(CASE WHEN r * 20 >= 19 * t THEN v END) AS hi
  FROM ranked, n
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       min(lo) / 100.0 AS p05_spend,
       min(hi) / 100.0 AS p95_spend,
       floor(CAST(sum(spend_cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             / 100.0 * 10000.0 + 0.5) / 10000.0 AS mean_spend,
       floor(CAST(sum(greatest(lo, least(hi, spend_cents))) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 100.0 * 10000.0 + 0.5) / 10000.0
         AS winsorized_mean_spend,
       floor(CAST(sum(CASE WHEN spend_cents BETWEEN lo AND hi
                           THEN spend_cents ELSE 0 END) AS DOUBLE)
             / CAST(sum(CASE WHEN spend_cents BETWEEN lo AND hi
                             THEN 1 ELSE 0 END) AS DOUBLE)
             / 100.0 * 10000.0 + 0.5) / 10000.0 AS trimmed_mean_spend
FROM per_user, th
"""

# count-min sketch: md5-mixed buckets, integer cell sums, min-over-
# depth estimate -- exactly replayable, so the sketch family gains a
# fully hash-gated member (HLL/KLL stay rows-only by nature)
ORACLE["countmin_token_freq"] = """
WITH occ AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
probes AS (
  SELECT tok,
         CAST(('0x' || substr(md5('0:' || tok), 1, 8)) AS BIGINT) % 1024 AS b0,
         CAST(('0x' || substr(md5('1:' || tok), 1, 8)) AS BIGINT) % 1024 AS b1,
         CAST(('0x' || substr(md5('2:' || tok), 1, 8)) AS BIGINT) % 1024 AS b2,
         CAST(('0x' || substr(md5('3:' || tok), 1, 8)) AS BIGINT) % 1024 AS b3
  FROM occ
),
sketch AS (
  SELECT 0 AS row, b0 AS bucket, count(*) AS c FROM probes GROUP BY 2
  UNION ALL
  SELECT 1 AS row, b1 AS bucket, count(*) AS c FROM probes GROUP BY 2
  UNION ALL
  SELECT 2 AS row, b2 AS bucket, count(*) AS c FROM probes GROUP BY 2
  UNION ALL
  SELECT 3 AS row, b3 AS bucket, count(*) AS c FROM probes GROUP BY 2
),
topt AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS true_count FROM occ GROUP BY 1
  ORDER BY true_count DESC, tok LIMIT 20
),
probe_rows AS (
  SELECT tok, true_count, r.row AS row,
         CAST(('0x' || substr(md5(r.row || ':' || tok), 1, 8)) AS BIGINT) % 1024 AS bucket
  FROM topt, (VALUES (0), (1), (2), (3)) r(row)
)
SELECT tok AS token, true_count,
       CAST(min(c) AS BIGINT) AS cm_estimate,
       CAST(min(c) - true_count AS BIGINT) AS overestimate
FROM sketch JOIN probe_rows USING (row, bucket)
GROUP BY tok, true_count
ORDER BY true_count DESC, token
"""

# Spark-executed recursive CTE twin of page_bfs_depths: SAME edge
# derivation, UNION ALL + 3-hop bound in both engines, min-depth
# group at the end
ORACLE["page_reachability_sql"] = f"""
WITH RECURSIVE {SESSIONIZE_CTES},
splits AS (
  SELECT session_id, page_id,
         lag(page_id) OVER (PARTITION BY session_id ORDER BY ts, event_id) AS prev_pg
  FROM actions
),
edges AS (
  SELECT DISTINCT prev_pg AS src, page_id AS dst
  FROM splits WHERE prev_pg IS NOT NULL
),
reach(node, depth) AS (
  SELECT min(src), CAST(0 AS BIGINT) FROM edges
  UNION ALL
  SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.depth < 3
)
SELECT node, CAST(min(depth) AS BIGINT) AS depth
FROM reach GROUP BY node ORDER BY node
"""

# streaming CM merge: the batch single-pass sketch IS the oracle —
# a green hash proves per-micro-batch partial sketches merged by
# cell addition equal it (the monoid law)
ORACLE["streaming_countmin_merge"] = """
WITH keys AS (SELECT CAST(user_id AS VARCHAR) AS k, user_id FROM events),
probes AS (
  SELECT user_id,
         CAST(('0x' || substr(md5('0:' || k), 1, 8)) AS BIGINT) % 256 AS b0,
         CAST(('0x' || substr(md5('1:' || k), 1, 8)) AS BIGINT) % 256 AS b1,
         CAST(('0x' || substr(md5('2:' || k), 1, 8)) AS BIGINT) % 256 AS b2,
         CAST(('0x' || substr(md5('3:' || k), 1, 8)) AS BIGINT) % 256 AS b3
  FROM keys
),
sketch AS (
  SELECT 0 AS row, b0 AS bucket, count(*) AS c FROM probes GROUP BY 2
  UNION ALL
  SELECT 1 AS row, b1 AS bucket, count(*) AS c FROM probes GROUP BY 2
  UNION ALL
  SELECT 2 AS row, b2 AS bucket, count(*) AS c FROM probes GROUP BY 2
  UNION ALL
  SELECT 3 AS row, b3 AS bucket, count(*) AS c FROM probes GROUP BY 2
),
targets AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS true_count
  FROM events WHERE user_id < 20 GROUP BY 1
),
probe_rows AS (
  SELECT user_id, true_count, r.row AS row,
         CAST(('0x' || substr(md5(r.row || ':' || CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 256 AS bucket
  FROM targets, (VALUES (0), (1), (2), (3)) r(row)
)
SELECT user_id, true_count,
       CAST(min(c) AS BIGINT) AS cm_estimate,
       CAST(min(c) - true_count AS BIGINT) AS overestimate
FROM sketch JOIN probe_rows USING (row, bucket)
GROUP BY user_id, true_count
ORDER BY user_id
"""

# per-user behavior profile: entropy as log2(n) - (left-fold sum of
# np*log2(np))/n over the page-sorted list — the order-pinning
# pattern (rolling_fingerprint), so no float-sum order exposure
ORACLE["user_behavior_profile"] = f"""
WITH {SESSIONIZE_CTES},
pu AS (
  SELECT user_id, page_id, count(*) AS np
  FROM actions WHERE page_id IS NOT NULL GROUP BY 1, 2
),
ent AS (
  SELECT user_id,
         CAST(sum(np) AS BIGINT) AS n_paged,
         CAST(count(*) AS BIGINT) AS n_pages,
         list(np ORDER BY page_id) AS pl
  FROM pu GROUP BY 1
),
ent2 AS (
  SELECT user_id, n_pages,
         floor((log2(CAST(n_paged AS DOUBLE))
                - list_reduce(
                    list_prepend(CAST(0 AS DOUBLE),
                      list_transform(pl,
                        x -> CAST(x AS DOUBLE) * log2(CAST(x AS DOUBLE)))),
                    (acc, v) -> acc + v)
                  / CAST(n_paged AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
           AS nav_entropy
  FROM ent
),
tot AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions
  FROM actions GROUP BY 1
),
bursts AS (
  SELECT user_id, CAST(max(c) AS BIGINT) AS max_events_min FROM (
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M') AS m, count(*) AS c
    FROM actions GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT t.user_id, n_events, n_sessions,
       CAST(coalesce(n_pages, 0) AS BIGINT) AS n_pages,
       coalesce(nav_entropy, 0.0) AS nav_entropy,
       max_events_min
FROM tot t
LEFT JOIN ent2 USING (user_id)
JOIN bursts USING (user_id)
ORDER BY user_id
"""

# robust median/MAD anomaly twin — all-integer: lower median = min c
# with rank*2 >= n, MAD over |c - med|, integer flag comparison
ORACLE["daily_anomaly_mad"] = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS c
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, day, c,
         row_number() OVER (PARTITION BY event_type ORDER BY c, day) AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily
),
med AS (
  SELECT event_type, min(CASE WHEN r * 2 >= n THEN c END) AS med
  FROM ranked GROUP BY 1
),
dev AS (
  SELECT d.event_type, d.day, d.c, m.med, abs(d.c - m.med) AS dd
  FROM daily d JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, min(CASE WHEN r * 2 >= n THEN dd END) AS mad FROM (
    SELECT event_type, dd,
           row_number() OVER (PARTITION BY event_type ORDER BY dd, day) AS r,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM dev
  ) GROUP BY 1
)
SELECT d.event_type, d.day, CAST(d.c AS BIGINT) AS c,
       CAST(d.med AS BIGINT) AS med,
       CAST(m.mad AS BIGINT) AS mad,
       d.dd > 3 * m.mad AS is_anomaly
FROM dev d JOIN mad m USING (event_type)
ORDER BY event_type, day
"""

# LEFT OUTER stream-stream attribution: matched pairs plus a NULL row
# for every unmatched click the final watermark has PROVEN
# unmatchable — wm = min(max click ts, max view ts) - 1h (each
# watermarked input contributes max_event_time - delay; the query
# watermark is their min), and a click is evictable once wm passes
# c_ts (matches need v_ts <= c_ts).  Trailing unmatched clicks inside
# the delay are NOT emitted, in both engine and oracle.
ORACLE["streaming_click_attribution_outer"] = """
WITH c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
),
v AS (
  SELECT event_id AS view_id, user_id, epoch_us(ts) AS v_us
  FROM events WHERE event_type = 'view'
),
wm AS (
  -- Spark tracks event-time watermarks at MILLISECOND granularity
  -- (the max event time is floored to ms before the delay subtract);
  -- truncate the micro-precision maxima the same way or a click in
  -- the sub-ms residue of the boundary could be emitted here but
  -- withheld by Spark
  SELECT (least((SELECT max(c_us) FROM c), (SELECT max(v_us) FROM v))
          // 1000) * 1000 - 3600000000 AS w
)
SELECT click_id, view_id, c.user_id,
       (c_us - v_us) // 1000000 AS gap_s
FROM c JOIN v ON c.user_id = v.user_id
  AND v_us <= c_us
  AND v_us > c_us - 86400000000
UNION ALL
SELECT click_id, CAST(NULL AS BIGINT) AS view_id, user_id,
       CAST(NULL AS BIGINT) AS gap_s
FROM c, wm
WHERE c_us < w
  AND NOT EXISTS (
    SELECT 1 FROM v
    WHERE v.user_id = c.user_id
      AND v_us <= c_us AND v_us > c_us - 86400000000
  )
"""

# ANN evaluation harness: both systems under test are deterministic
# (seeded LSH candidates, quantized-rank brute force), so hit sets,
# first-hit ranks, and the recall/MRR rationals all hash-gate
ORACLE["ann_recall_report"] = f"""
WITH {_lsh_bits_ctes()},
qb AS (SELECT vec_id AS query_id, band, bucket FROM banded WHERE vec_id < 10),
lcand AS (
  SELECT DISTINCT qb.query_id, b.vec_id AS neighbor_id
  FROM banded b JOIN qb ON b.band = qb.band AND b.bucket = qb.bucket
  WHERE b.vec_id <> qb.query_id
),
lsh AS (
  SELECT query_id, neighbor_id, rn AS lsh_rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
               ORDER BY floor(list_cosine_similarity(eq.v, en.v) * 1000.0 + 0.5)
                          / 1000.0 DESC,
                        neighbor_id ASC) AS rn
    FROM lcand
    JOIN e eq ON eq.vec_id = lcand.query_id
    JOIN e en ON en.vec_id = lcand.neighbor_id)
  WHERE rn <= 5
),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
               ORDER BY floor(list_cosine_similarity(q.v, c.v) * 1000.0 + 0.5)
                          / 1000.0 DESC,
                        c.vec_id ASC) AS rn
    FROM e q JOIN e c ON c.vec_id != q.vec_id
    WHERE q.vec_id < 10)
  WHERE rn <= 5
),
hits AS (
  SELECT bf.query_id, count(*) AS n_hits, min(lsh.lsh_rank) AS first_rank
  FROM bf JOIN lsh USING (query_id, neighbor_id)
  GROUP BY 1
),
qs AS (SELECT DISTINCT query_id FROM bf)
SELECT qs.query_id,
       CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
       floor(CAST(coalesce(n_hits, 0) AS DOUBLE) / 5.0 * 10000.0 + 0.5)
         / 10000.0 AS recall_at_k,
       floor(coalesce(1.0 / CAST(first_rank AS DOUBLE), 0.0) * 10000.0 + 0.5)
         / 10000.0 AS mrr
FROM qs LEFT JOIN hits USING (query_id)
ORDER BY query_id
"""

# right-to-erasure blast-radius audit: conditional aggregates per
# table; lineitem erased transitively through its order's customer
ORACLE["user_erasure_audit"] = """
WITH li AS (
  SELECT (o.o_orderkey IS NOT NULL) AS erase
  FROM lineitem l
  LEFT JOIN (SELECT o_orderkey FROM orders WHERE o_custkey % 97 = 0) o
    ON l.l_orderkey = o.o_orderkey
),
rows_ AS (
  SELECT 'events' AS table_name, count(*) AS n_rows,
         sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END) AS n_erased
  FROM events
  UNION ALL
  SELECT 'customer', count(*),
         sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END)
  FROM customer
  UNION ALL
  SELECT 'orders', count(*),
         sum(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0 END)
  FROM orders
  UNION ALL
  SELECT 'lineitem', count(*),
         sum(CASE WHEN erase THEN 1 ELSE 0 END)
  FROM li
)
SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_erased AS BIGINT) AS n_erased,
       CAST(n_rows - n_erased AS BIGINT) AS n_kept
FROM rows_ ORDER BY table_name
"""

# PIVOT->UNPIVOT roundtrip lands back at the long form; UNPIVOT drops
# NULL cells, so absent (day, type) pairs leave the frame exactly as
# in the plain GROUP BY
ORACLE["daily_pivot_unpivot_roundtrip"] = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2 ORDER BY day, event_type
"""

# per-page dwell: gap to the next in-session page event (floor-epoch
# seconds); last events contribute no dwell
ORACLE["page_dwell_stats"] = f"""
WITH {SESSIONIZE_CTES},
pg AS (
  SELECT session_id, page_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS cur_s,
         lead(ts) OVER (PARTITION BY session_id ORDER BY ts, event_id) AS next_ts
  FROM actions WHERE page_id IS NOT NULL
),
d AS (
  SELECT page_id,
         CASE WHEN next_ts IS NULL THEN NULL
              ELSE CAST(floor(epoch(next_ts)) AS BIGINT) - cur_s END AS dwell_s
  FROM pg
)
SELECT page_id,
       CAST(count(*) AS BIGINT) AS n_views,
       CAST(count(dwell_s) AS BIGINT) AS n_dwells,
       CAST(coalesce(sum(dwell_s), 0) AS BIGINT) AS total_dwell_s,
       floor(CAST(sum(dwell_s) AS DOUBLE) / CAST(count(dwell_s) AS DOUBLE)
             * 100.0 + 0.5) / 100.0 AS avg_dwell_s
FROM d GROUP BY 1 ORDER BY page_id
"""

ORACLE["entry_exit_pages"] = f"""
WITH {SESSIONIZE_CTES},
pg AS (
  SELECT session_id, page_id,
         row_number() OVER (PARTITION BY session_id
                            ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY session_id
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM actions WHERE page_id IS NOT NULL
)
SELECT page_id,
       CAST(count(*) AS BIGINT) AS n_views,
       CAST(sum(CASE WHEN ra = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_entries,
       CAST(sum(CASE WHEN rd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exits,
       floor(CAST(sum(CASE WHEN ra = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS entry_rate,
       floor(CAST(sum(CASE WHEN rd = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS exit_rate
FROM pg GROUP BY 1 ORDER BY page_id
"""

ORACLE["bounce_rate_daily"] = f"""
WITH {SESSIONIZE_CTES}, {SESSION_STATS_CTE}
SELECT day,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN step_length = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       floor(CAST(sum(CASE WHEN step_length = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
         AS bounce_rate
FROM session_stats GROUP BY 1 ORDER BY day
"""

# engagement survival curve: sessions reaching >= k events, k = 1..10
ORACLE["session_depth_curve"] = f"""
WITH {SESSIONIZE_CTES}, {SESSION_STATS_CTE},
t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM session_stats),
ks AS (SELECT unnest(generate_series(1, 10)) AS k)
SELECT CAST(k AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_sessions,
       floor(CAST(count(*) AS DOUBLE) / CAST(tot AS DOUBLE) * 10000.0 + 0.5)
         / 10000.0 AS share
FROM session_stats, ks, t
WHERE step_length >= k
GROUP BY k, tot ORDER BY k
"""

# repeat-purchase cadence: whole-day gaps between consecutive
# purchases per user (epoch-day grid on each side before differencing)
ORACLE["purchase_gap_distribution"] = """
WITH p AS (
  SELECT user_id, (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS d, ts, event_id
  FROM events WHERE event_type = 'purchase'
),
g AS (
  SELECT d - lag(d) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_days
  FROM p
)
SELECT CAST(gap_days AS BIGINT) AS gap_days,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM g WHERE gap_days IS NOT NULL
GROUP BY 1 ORDER BY gap_days
"""

# point-in-time SCD2 enrichment: the two-version history (LEGACY
# before min(ts)+14d, current segment from that day on) collapses to a
# CASE against the split day — the as-of carry-forward on the Spark
# side must pick exactly this version per event day
ORACLE["events_segment_pit"] = f"""
WITH {SESSIONIZE_CTES},
sp AS (
  SELECT coalesce(strftime(min(ts) + INTERVAL 14 DAY, '%Y-%m-%d'),
                  '1970-01-15') AS split_day
  FROM events
),
seg AS (
  SELECT a.event_type,
         CASE WHEN c.c_custkey IS NULL THEN 'UNKNOWN'
              WHEN a.day >= sp.split_day THEN c.c_mktsegment
              ELSE 'LEGACY' END AS segment
  FROM actions a CROSS JOIN sp
  LEFT JOIN customer c ON a.user_id = c.c_custkey
  WHERE a.day IS NOT NULL
)
SELECT segment, event_type, CAST(count(*) AS BIGINT) AS n
FROM seg GROUP BY 1, 2 ORDER BY 1, 2
"""

# day-over-day Jensen-Shannon drift; the per-day float fold is
# order-pinned on event_type in BOTH engines (Spark: array_sort +
# aggregate left fold; here: list(... ORDER BY event_type) summed in
# list order)
ORACLE["daily_drift_jsd"] = f"""
WITH {SESSIONIZE_CTES},
counts AS (
  SELECT day, event_type, CAST(count(*) AS BIGINT) AS n
  FROM actions GROUP BY 1, 2
),
days AS (SELECT DISTINCT day FROM counts),
types AS (SELECT DISTINCT event_type FROM counts),
grid AS (
  SELECT d.day, t.event_type, coalesce(c.n, 0) AS n
  FROM days d CROSS JOIN types t
  LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
),
tot AS (SELECT day, sum(n) AS total FROM grid GROUP BY 1),
g AS (SELECT grid.day, event_type, n, total FROM grid JOIN tot USING (day)),
j AS (
  SELECT cur.day, cur.event_type,
         prev.n AS n_prev, prev.total AS t_prev,
         cur.n AS n_cur, cur.total AS t_cur
  FROM g cur JOIN g prev
    ON cur.event_type = prev.event_type
   AND CAST(cur.day AS DATE) = CAST(prev.day AS DATE) + INTERVAL 1 DAY
),
terms AS (
  SELECT day, event_type,
    (CASE WHEN n_prev > 0
          THEN (CAST(n_prev AS DOUBLE) / t_prev)
               * ln((CAST(n_prev AS DOUBLE) / t_prev)
                    / ((CAST(n_prev AS DOUBLE) / t_prev
                        + CAST(n_cur AS DOUBLE) / t_cur) / 2.0))
          ELSE 0.0 END
   + CASE WHEN n_cur > 0
          THEN (CAST(n_cur AS DOUBLE) / t_cur)
               * ln((CAST(n_cur AS DOUBLE) / t_cur)
                    / ((CAST(n_prev AS DOUBLE) / t_prev
                        + CAST(n_cur AS DOUBLE) / t_cur) / 2.0))
          ELSE 0.0 END) / 2.0 AS term
  FROM j
)
SELECT day,
       floor(list_sum(list(term ORDER BY event_type)) * 1000000.0 + 0.5)
         / 1000000.0 AS jsd
FROM terms GROUP BY day ORDER BY day
"""

# exact sliding COUNT(DISTINCT): window days take every pair within
# [day-6, day]; only days with their own activity are reported
ORACLE["rolling_7d_distinct_users"] = f"""
WITH {SESSIONIZE_CTES},
pairs AS (
  SELECT DISTINCT CAST(day AS DATE) AS d, user_id
  FROM actions WHERE user_id IS NOT NULL
),
days AS (SELECT DISTINCT d AS win_day FROM pairs)
SELECT strftime(w.win_day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT p.user_id) AS BIGINT) AS distinct_users_7d
FROM days w
JOIN pairs p ON p.d BETWEEN w.win_day - INTERVAL 6 DAY AND w.win_day
GROUP BY 1 ORDER BY 1
"""

ORACLE["k_anonymity_report"] = f"""
WITH {USERS_CTE}
SELECT city, sex,
       CAST(age - (age % 10) AS BIGINT) AS age_decade,
       CAST(count(*) AS BIGINT) AS group_size
FROM users
GROUP BY 1, 2, 3
HAVING count(*) < 5
ORDER BY 1, 2, 3
"""

# matryoshka truncation: full-dim top-10 vs first-32-dims top-10,
# both ranked by 3-dp quantized cosine with id tie-break
ORACLE["ann_matryoshka_overlap"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ep AS (SELECT vec_id, CAST(embedding[1:32] AS DOUBLE[]) AS v FROM embeddings),
fullk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY floor(list_cosine_similarity(q.v, c.v) * 1000.0 + 0.5)
                        / 1000.0 DESC, c.vec_id ASC) AS rn
    FROM e q JOIN e c ON c.vec_id != q.vec_id
    WHERE q.vec_id < 10
  ) WHERE rn <= 10
),
prek AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY floor(list_cosine_similarity(q.v, c.v) * 1000.0 + 0.5)
                        / 1000.0 DESC, c.vec_id ASC) AS rn
    FROM ep q JOIN ep c ON c.vec_id != q.vec_id
    WHERE q.vec_id < 10
  ) WHERE rn <= 10
),
hits AS (
  SELECT query_id, count(*) AS n
  FROM fullk JOIN prek USING (query_id, neighbor_id)
  GROUP BY 1
)
SELECT q.query_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_overlap,
       CAST(coalesce(h.n, 0) AS DOUBLE) / 10.0 AS recall_at_k
FROM (SELECT DISTINCT query_id FROM fullk) q
LEFT JOIN hits h USING (query_id)
ORDER BY q.query_id
"""

# two-round pseudo-relevance feedback: round 1 = the literal-term BM25
# (shared generator, k=5) nested as a subquery; expansion = top-2
# total-tf tokens of the feedback docs minus seeds/stopwords; round 2
# = postings-based BM25 with the per-doc score folded in token order
# (mirrors bm25_score_dynamic's array_sort + aggregate left fold)
_PRF_SEEDS = ("spark", "join", "window", "stream")
_PRF_EXCLUDED = ", ".join(
    f"'{t}'"
    for t in sorted(
        set(_PRF_SEEDS)
        | {"a", "and", "for", "in", "is", "of", "on", "the", "to", "with"}
    )
)
ORACLE["bm25_prf_topk"] = f"""
WITH fb AS (
  SELECT doc_id FROM ({_bm25_oracle(k=5)})
),
expterms AS (
  SELECT token FROM (
    SELECT token, count(*) AS cnt
    FROM (
      SELECT unnest(string_split(d.text, ' ')) AS token
      FROM documents d JOIN fb USING (doc_id)
    )
    WHERE token <> '' AND token NOT IN ({_PRF_EXCLUDED})
    GROUP BY token
    ORDER BY cnt DESC, token ASC
    LIMIT 2
  )
),
qterms AS (
  SELECT 'spark' AS token UNION ALL SELECT 'join' UNION ALL
  SELECT 'window' UNION ALL SELECT 'stream' UNION ALL
  SELECT token FROM expterms
),
allstats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avgdl
  FROM documents
),
postings AS (
  SELECT token, doc_id, dl, CAST(count(*) AS DOUBLE) AS tf
  FROM (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
           unnest(string_split(text, ' ')) AS token
    FROM documents
  )
  JOIN qterms USING (token)
  GROUP BY 1, 2, 3
),
dfs AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM postings GROUP BY 1),
parts AS (
  SELECT doc_id, token,
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.5
           / (tf + 1.5 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)) AS part
  FROM postings JOIN dfs USING (token) CROSS JOIN allstats
),
scored2 AS (
  SELECT doc_id,
         floor(list_sum(list(part ORDER BY token)) * 1000000.0 + 0.5)
           / 1000000.0 AS bm25
  FROM parts GROUP BY doc_id
)
SELECT doc_id, bm25 FROM scored2
WHERE bm25 > 0.0
ORDER BY bm25 DESC, doc_id ASC
LIMIT 20
"""

# lifecycle trilogy: compaction must not change query results
ORACLE["bm25_topk_compacted"] = _bm25_oracle()

ORACLE["purged_time_split"] = """
WITH sp AS (
  SELECT coalesce(strftime(min(ts) + INTERVAL 14 DAY, '%Y-%m-%d'),
                  '1970-01-15') AS t_cut,
         coalesce(strftime(min(ts) + INTERVAL 16 DAY, '%Y-%m-%d'),
                  '1970-01-17') AS t_emb
  FROM events
),
tagged AS (
  SELECT CASE WHEN strftime(ts, '%Y-%m-%d') <= t_cut THEN 'train'
              WHEN strftime(ts, '%Y-%m-%d') <= t_emb THEN 'embargo'
              ELSE 'test' END AS split,
         strftime(ts, '%Y-%m-%d') AS day,
         user_id
  FROM events CROSS JOIN sp
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       min(day) AS min_day,
       max(day) AS max_day
FROM tagged
WHERE split <> 'embargo'
GROUP BY split
ORDER BY split
"""

ORACLE["lang_id_confusion"] = """
WITH pred AS (
  SELECT doc_id, lang AS true_lang,
         CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('a','and','for','in','is','of','on','the','to','with'))) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) >= 0.02
              THEN 'en' ELSE 'unk' END AS lang_guess
  FROM documents
),
conf AS (
  SELECT true_lang, lang_guess, CAST(count(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
),
acc AS (
  SELECT floor(CAST(sum(CASE WHEN (true_lang = 'en') = (lang_guess = 'en')
                             THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) * 1000000.0 + 0.5) / 1000000.0 AS accuracy
  FROM pred
)
SELECT true_lang, lang_guess, n, accuracy
FROM conf CROSS JOIN acc
ORDER BY true_lang, lang_guess
"""

ORACLE["offpolicy_ips_estimate"] = f"""
WITH {SESSIONIZE_CTES},
logged AS (
  SELECT user_id, ad_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS r_cents,
         CASE WHEN ad_id = user_id % 10 THEN 1 ELSE 0 END AS m
  FROM actions WHERE event_type = 'click'
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_logged,
         CAST(sum(m) AS BIGINT) AS n_matched,
         CAST(sum(m * r_cents) AS BIGINT) AS matched_cents
  FROM logged
)
SELECT n_logged, n_matched, matched_cents,
       floor(CAST(matched_cents AS DOUBLE) * 10.0 / n_logged / 100.0
             * 1000000.0 + 0.5) / 1000000.0 AS ips_estimate,
       CASE WHEN n_matched > 0
            THEN floor(CAST(matched_cents AS DOUBLE) / n_matched / 100.0
                       * 1000000.0 + 0.5) / 1000000.0 END AS snips_estimate
FROM agg
"""

ORACLE["covisit_next_item_hitrate"] = f"""
WITH {SESSIONIZE_CTES},
clicks AS (
  SELECT user_id, ts, event_id, category_id AS item
  FROM actions WHERE event_type = 'click'
),
ranked AS (
  SELECT user_id, item,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS cnt
  FROM clicks
),
r2 AS (SELECT * FROM ranked WHERE cnt >= 2),
trans AS (
  SELECT user_id, rn, cnt, item AS src,
         lead(item) OVER (PARTITION BY user_id ORDER BY rn) AS dst
  FROM r2
),
tx AS (SELECT * FROM trans WHERE dst IS NOT NULL),
train AS (SELECT src, dst, count(*) AS n FROM tx WHERE rn < cnt - 1 GROUP BY 1, 2),
recs AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY n DESC, dst ASC) AS rk
    FROM train
  ) WHERE rk <= 5
),
test AS (SELECT user_id, src, dst AS truth FROM tx WHERE rn = cnt - 1),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_eval_users,
         CAST(sum(CASE WHEN EXISTS (
             SELECT 1 FROM recs r WHERE r.src = test.src AND r.dst = test.truth
         ) THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
  FROM test
)
SELECT CAST(5 AS BIGINT) AS k, n_eval_users, n_hits,
       floor(CAST(n_hits AS DOUBLE) / n_eval_users * 1000000.0 + 0.5)
         / 1000000.0 AS hit_rate
FROM stats
"""

# additive schema evolution: days before the midpoint never had the
# revenue column — the merged read must surface them with NULL revenue
ORACLE["schema_evolution_union"] = f"""
WITH {SESSIONIZE_CTES},
daily AS (
  SELECT day, user_id,
         CAST(count(*) AS BIGINT) AS clicks,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM actions WHERE event_type = 'click'
  GROUP BY 1, 2
),
days AS (SELECT day, row_number() OVER (ORDER BY day) - 1 AS i FROM (SELECT DISTINCT day FROM daily)),
mid AS (SELECT day AS m FROM days WHERE i = (SELECT count(*) // 2 FROM days)),
merged AS (
  SELECT day, user_id, clicks,
         CASE WHEN day >= (SELECT m FROM mid) THEN rev_cents END AS rev_cents
  FROM daily
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(clicks) AS BIGINT) AS total_clicks,
       CAST(sum(rev_cents) AS BIGINT) AS total_rev_cents
FROM merged GROUP BY day ORDER BY day
"""

# Gini over per-user purchase cents: rank ascending (cents, user_id),
# G = (2*sum(i*s_i) - (n+1)*sum(s)) / (n*sum(s)) — exact BIGINT
# numerators, one final division, 6-dp quantized
ORACLE["user_spend_gini"] = f"""
WITH {SESSIONIZE_CTES},
spend AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM actions WHERE event_type = 'purchase'
  GROUP BY 1
),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents ASC, user_id ASC) AS rk
  FROM spend
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         CAST(sum(rk * cents) AS BIGINT) AS rank_weighted
  FROM ranked
)
SELECT n_users, total_cents,
       floor((2.0 * CAST(rank_weighted AS DOUBLE)
              - CAST(n_users + 1 AS DOUBLE) * CAST(total_cents AS DOUBLE))
             / (CAST(n_users AS DOUBLE) * CAST(total_cents AS DOUBLE))
             * 1000000.0 + 0.5) / 1000000.0 AS gini
FROM agg
"""

ORACLE["top_decile_spend_share"] = f"""
WITH {SESSIONIZE_CTES},
spend AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM actions WHERE event_type = 'purchase'
  GROUP BY 1
),
ranked AS (
  SELECT cents,
         row_number() OVER (ORDER BY cents ASC, user_id ASC) AS rk,
         count(*) OVER () AS n
  FROM spend
),
agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n_users,
         CAST(max(CAST(ceil(CAST(n AS DOUBLE) / 10) AS BIGINT)) AS BIGINT)
           AS top_decile_users,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         CAST(sum(CASE WHEN rk > n - CAST(ceil(CAST(n AS DOUBLE) / 10) AS BIGINT)
                       THEN cents ELSE 0 END) AS BIGINT) AS top_decile_cents
  FROM ranked
)
SELECT n_users, top_decile_users, total_cents, top_decile_cents,
       floor(CAST(top_decile_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
             * 1000000.0 + 0.5) / 1000000.0 AS top_decile_share
FROM agg
"""

ORACLE["cart_abandonment_daily"] = f"""
WITH {SESSIONIZE_CTES},
per_session AS (
  SELECT session_id,
         min(day) AS day,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased
  FROM actions GROUP BY 1
)
SELECT day,
       CAST(count(*) AS BIGINT) AS click_sessions,
       CAST(sum(purchased) AS BIGINT) AS purchase_sessions,
       floor((1.0 - CAST(sum(purchased) AS DOUBLE) / count(*))
             * 1000000.0 + 0.5) / 1000000.0 AS abandonment_rate
FROM per_session WHERE clicked = 1
GROUP BY day ORDER BY day
"""

ORACLE["time_to_convert_percentiles"] = f"""
WITH {SESSIONIZE_CTES},
per_session AS (
  SELECT session_id,
         min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM actions GROUP BY 1
),
conv AS (
  SELECT CAST(floor(epoch(first_purchase)) AS BIGINT)
           - CAST(floor(epoch(first_click)) AS BIGINT) AS secs
  FROM per_session
  WHERE first_click IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase >= first_click
)
SELECT CAST(count(*) AS BIGINT) AS converting_sessions,
       floor(quantile_cont(secs, 0.5) * 100.0 + 0.5) / 100.0 AS p50_s,
       floor(quantile_cont(secs, 0.9) * 100.0 + 0.5) / 100.0 AS p90_s,
       floor(quantile_cont(secs, 0.99) * 100.0 + 0.5) / 100.0 AS p99_s
FROM conv
"""

ORACLE["funnel_by_segment"] = f"""
WITH {SESSIONIZE_CTES}, {USERS_CTE},
flags AS (
  SELECT session_id, min(user_id) AS user_id,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM actions GROUP BY 1
),
agg AS (
  SELECT u.professional AS segment,
         CAST(sum(v) AS BIGINT) AS view_sessions,
         CAST(sum(v * c) AS BIGINT) AS click_sessions,
         CAST(sum(v * c * p) AS BIGINT) AS purchase_sessions
  FROM flags f JOIN users u USING (user_id)
  GROUP BY 1
)
SELECT segment, view_sessions, click_sessions, purchase_sessions,
       CASE WHEN view_sessions > 0
            THEN floor(CAST(click_sessions AS DOUBLE) / view_sessions
                       * 1000000.0 + 0.5) / 1000000.0 END AS click_rate,
       CASE WHEN click_sessions > 0
            THEN floor(CAST(purchase_sessions AS DOUBLE) / click_sessions
                       * 1000000.0 + 0.5) / 1000000.0 END AS purchase_rate
FROM agg ORDER BY segment
"""

ORACLE["arpu_daily"] = f"""
WITH {SESSIONIZE_CTES},
per_day AS (
  SELECT day,
         CAST(count(DISTINCT user_id) AS BIGINT) AS active_users,
         CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                                  THEN user_id END) AS BIGINT) AS paying_users,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS revenue_cents
  FROM actions GROUP BY 1
)
SELECT day, active_users, paying_users, revenue_cents,
       floor(CAST(revenue_cents AS DOUBLE) / active_users / 100.0
             * 1000000.0 + 0.5) / 1000000.0 AS arpu,
       CASE WHEN paying_users > 0
            THEN floor(CAST(revenue_cents AS DOUBLE) / paying_users / 100.0
                       * 1000000.0 + 0.5) / 1000000.0 END AS arppu
FROM per_day ORDER BY day
"""

# ---- round 14: coverage curve / entropy / regex funnels / trigrams /
# zone-map audit / incremental MV ----

# token-coverage share at candidate vocab sizes; rank = count desc,
# token asc (the Spark side's two-pass bucket rank realizes the same
# total order)
ORACLE["vocab_coverage_curve"] = """
WITH c AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token ASC) AS rk FROM c),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c),
ks AS (SELECT unnest([100, 500, 1000, 2000, 5000]) AS vocab_size)
SELECT CAST(k.vocab_size AS BIGINT) AS vocab_size,
       CAST(coalesce(sum(CASE WHEN r.rk <= k.vocab_size THEN r.n END), 0)
            AS BIGINT) AS covered_tokens,
       t.tot AS total_tokens,
       floor(CAST(coalesce(sum(CASE WHEN r.rk <= k.vocab_size THEN r.n END), 0)
                  AS DOUBLE)
             / CAST(t.tot AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS coverage
FROM ks k CROSS JOIN r CROSS JOIN t
GROUP BY k.vocab_size, t.tot
ORDER BY vocab_size
"""

# per-user Shannon entropy of the event-type mix, 2-dp histogram;
# the Σ n·ln(n) fold is order-pinned on event_type in BOTH engines
# (Spark: array_sort + aggregate left fold; here: list(... ORDER BY
# event_type) summed in list order — the daily_drift_jsd discipline)
ORACLE["user_entropy_profile"] = f"""
WITH {SESSIONIZE_CTES},
ut AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM actions WHERE user_id IS NOT NULL GROUP BY 1, 2
),
u AS (
  SELECT user_id,
         list_sum(list(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))
                       ORDER BY event_type)) AS s,
         CAST(sum(n) AS BIGINT) AS tot
  FROM ut GROUP BY 1
),
e AS (
  SELECT floor((ln(CAST(tot AS DOUBLE)) - s / CAST(tot AS DOUBLE)) * 100.0
               + 0.5) / 100.0 AS entropy_bucket
  FROM u
)
SELECT entropy_bucket, CAST(count(*) AS BIGINT) AS n_users
FROM e GROUP BY 1 ORDER BY 1
"""

# regex funnels over order-pinned session event-initial paths
ORACLE["funnel_regex_path"] = f"""
WITH {SESSIONIZE_CTES},
p AS (
  SELECT session_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS path
  FROM actions GROUP BY session_id
),
pats AS (SELECT unnest(['^s', 'e{{2,}}', 'p.*p', 'v.*c.*p']) AS pattern)
SELECT pattern,
       CAST(coalesce(sum(CASE WHEN regexp_matches(path, pattern) THEN 1 END), 0)
            AS BIGINT) AS n_sessions
FROM pats CROSS JOIN p
GROUP BY pattern ORDER BY pattern
"""

# top-20 consecutive event-type trigrams across sessions
ORACLE["frequent_path_trigrams"] = f"""
WITH {SESSIONIZE_CTES},
ch AS (
  SELECT session_id, ts, event_id, substr(event_type, 1, 1) AS c FROM actions
),
tri AS (
  SELECT c || lead(c, 1) OVER w || lead(c, 2) OVER w AS trigram
  FROM ch WINDOW w AS (PARTITION BY session_id ORDER BY ts, event_id)
)
SELECT trigram, CAST(count(*) AS BIGINT) AS n
FROM tri WHERE trigram IS NOT NULL
GROUP BY trigram ORDER BY n DESC, trigram ASC LIMIT 20
"""

# zone-map pruning audit: per-day max-value stats vs the 90%-of-max
# hot predicate, pure integer cents
ORACLE["zonemap_pruning_report"] = f"""
WITH {SESSIONIZE_CTES},
d AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS max_value_cents
  FROM actions GROUP BY day
),
g AS (SELECT (max(max_value_cents) * 9) // 10 AS threshold_cents FROM d)
SELECT day, n_rows, max_value_cents,
       CAST(threshold_cents AS BIGINT) AS threshold_cents,
       CAST(CASE WHEN max_value_cents < threshold_cents THEN 1 ELSE 0 END
            AS INT) AS prunable
FROM d CROSS JOIN g ORDER BY day
"""

# incremental MV maintenance: the oracle is the FULL recompute — a
# green hash proves merge(partials) == recompute, avg included
ORACLE["orders_mv_incremental"] = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) // count(*)
            AS BIGINT) AS avg_cents
FROM orders GROUP BY 1 ORDER BY 1
"""

# PQ/ADC: codebook = first-16 sub-slices per subspace; every argmin /
# rank orders on the 6-dp-quantized distance with an id tie-break;
# the per-pair ADC sum is order-pinned on the subspace index
ORACLE["ann_pq_topk"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
d AS (SELECT CAST(len(v) // 4 AS INT) AS w FROM e LIMIT 1),
ms AS (SELECT unnest([0, 1, 2, 3]) AS m),
sl AS (
  SELECT e.vec_id, ms.m,
         list_slice(e.v, ms.m * d.w + 1, (ms.m + 1) * d.w) AS sv
  FROM e, ms, d
),
cb AS (SELECT vec_id AS j, m, sv AS cv FROM sl WHERE vec_id < 16),
enc AS (
  SELECT vec_id AS neighbor_id, m, j, cv FROM (
    SELECT sl.vec_id, sl.m, cb.j, cb.cv,
           row_number() OVER (
             PARTITION BY sl.vec_id, sl.m
             ORDER BY floor(list_distance(sl.sv, cb.cv) * 1000000.0 + 0.5)
                      / 1000000.0 ASC, cb.j ASC) AS rn
    FROM sl JOIN cb USING (m)
  ) WHERE rn = 1
),
terms AS (
  SELECT q.vec_id AS query_id, enc.neighbor_id, enc.m,
         floor(list_distance(q.sv, enc.cv) * 1000000.0 + 0.5)
           / 1000000.0 AS term
  FROM sl q JOIN enc ON q.m = enc.m
  WHERE q.vec_id < 10 AND enc.neighbor_id != q.vec_id
),
adc AS (
  SELECT query_id, neighbor_id, list_sum(list(term ORDER BY m)) AS dist
  FROM terms GROUP BY 1, 2
),
r AS (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id
           ORDER BY floor(dist * 1000000.0 + 0.5) / 1000000.0 ASC,
                    neighbor_id ASC) AS rn
  FROM adc
)
SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id,
       floor(dist * 1000000.0 + 0.5) / 1000000.0 AS adc_dist
FROM r WHERE rn <= 5 ORDER BY query_id, rank
"""

# IVFPQ: ann_ivf_topk's coarse CTEs (cosine cells, first-8 centroids,
# 2-cell probes) composed with ann_pq_topk's fine CTEs (4x16 L2
# codebooks, order-pinned ADC)
ORACLE["ann_ivfpq_topk"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id AS cluster_id, v AS c_vec FROM e WHERE vec_id < 8),
assigned AS (
  SELECT vec_id AS neighbor_id, cluster_id FROM (
    SELECT e.vec_id, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY floor(list_cosine_similarity(e.v, c.c_vec) * 1000.0 + 0.5)
                      / 1000.0 DESC, c.cluster_id ASC) AS rn
    FROM e CROSS JOIN cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, cluster_id FROM (
    SELECT e.vec_id, c.cluster_id,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY floor(list_cosine_similarity(e.v, c.c_vec) * 1000.0 + 0.5)
                      / 1000.0 DESC, c.cluster_id ASC) AS rn
    FROM e CROSS JOIN cents c
    WHERE e.vec_id < 10
  ) WHERE rn <= 2
),
d AS (SELECT CAST(len(v) // 4 AS INT) AS w FROM e LIMIT 1),
ms AS (SELECT unnest([0, 1, 2, 3]) AS m),
sl AS (
  SELECT e.vec_id, ms.m,
         list_slice(e.v, ms.m * d.w + 1, (ms.m + 1) * d.w) AS sv
  FROM e, ms, d
),
cb AS (SELECT vec_id AS j, m, sv AS cv FROM sl WHERE vec_id < 16),
enc AS (
  SELECT vec_id AS neighbor_id, m, j, cv FROM (
    SELECT sl.vec_id, sl.m, cb.j, cb.cv,
           row_number() OVER (
             PARTITION BY sl.vec_id, sl.m
             ORDER BY floor(list_distance(sl.sv, cb.cv) * 1000000.0 + 0.5)
                      / 1000000.0 ASC, cb.j ASC) AS rn
    FROM sl JOIN cb USING (m)
  ) WHERE rn = 1
),
encc AS (
  SELECT enc.neighbor_id, enc.m, enc.cv, a.cluster_id
  FROM enc JOIN assigned a USING (neighbor_id)
),
terms AS (
  SELECT p.query_id, encc.neighbor_id, encc.m,
         floor(list_distance(q.sv, encc.cv) * 1000000.0 + 0.5)
           / 1000000.0 AS term
  FROM probes p
  JOIN encc ON encc.cluster_id = p.cluster_id
  JOIN sl q ON q.vec_id = p.query_id AND q.m = encc.m
  WHERE encc.neighbor_id != p.query_id
),
adc AS (
  SELECT query_id, neighbor_id, list_sum(list(term ORDER BY m)) AS dist
  FROM terms GROUP BY 1, 2
),
r AS (
  SELECT query_id, neighbor_id, dist,
         row_number() OVER (PARTITION BY query_id
           ORDER BY floor(dist * 1000000.0 + 0.5) / 1000000.0 ASC,
                    neighbor_id ASC) AS rn
  FROM adc
)
SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id,
       floor(dist * 1000000.0 + 0.5) / 1000000.0 AS adc_dist
FROM r WHERE rn <= 5 ORDER BY query_id, rank
"""

# SRM guardrail: md5-parity assignment (ab_test_report's), exact
# integer chi-square numerator, one division, quantized flag
ORACLE["ab_srm_check"] = """
WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
a AS (
  SELECT CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant
  FROM u
),
c AS (
  SELECT CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM a
)
SELECT n_a, n_b,
       floor(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS chi2,
       CAST(CASE WHEN floor(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                            / CAST(n_a + n_b AS DOUBLE) * 10000.0 + 0.5)
                      / 10000.0 > 3.8415
                 THEN 1 ELSE 0 END AS INT) AS srm
FROM c
"""

# embedding L2-norm histogram at 1 dp; index-order squared fold
ORACLE["embedding_norm_profile"] = """
WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (
  SELECT floor(sqrt(list_sum(list_transform(v, x -> x * x))) * 10.0 + 0.5)
           / 10.0 AS norm_bucket
  FROM e
)
SELECT norm_bucket, CAST(count(*) AS BIGINT) AS n_vectors
FROM n GROUP BY 1 ORDER BY 1
"""

# per-group rank normalization: DuckDB's native ntile over the same
# total order (cents, event_id) within each type — the Spark side's
# grouped two-pass rank + closed-form ntile must agree exactly
ORACLE["quantile_normalize_by_type"] = """
WITH b AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT event_type, cents,
         ntile(100) OVER (PARTITION BY event_type
                          ORDER BY cents ASC, event_id ASC) AS percentile
  FROM b
)
SELECT event_type, CAST(percentile AS INT) AS percentile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents
FROM r GROUP BY 1, 2 ORDER BY 1, 2
"""

# NDCG@20 over the BM25 ranking vs the conjunctive-containment
# judgment; DCG/IDCG are order-pinned folds (rank ascending)
ORACLE["retrieval_ndcg_report"] = _bm25_oracle(
    final_select="""SELECT * FROM (
  WITH top AS (
    SELECT doc_id, bm25,
           row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rk
    FROM scored WHERE bm25 > 0.0
  ),
  rel AS (
    SELECT doc_id FROM documents
    WHERE list_contains(string_split(text, ' '), 'spark')
      AND list_contains(string_split(text, ' '), 'join')
      AND list_contains(string_split(text, ' '), 'window')
      AND list_contains(string_split(text, ' '), 'stream')
  ),
  tr AS (
    SELECT t.rk, CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS rel
    FROM top t LEFT JOIN rel r USING (doc_id)
    WHERE t.rk <= 20
  ),
  n AS (SELECT CAST(count(*) AS BIGINT) AS n_relevant_corpus FROM rel),
  d AS (
    SELECT coalesce(list_sum(list(CAST(rel AS DOUBLE)
                                  / log2(CAST(rk + 1 AS DOUBLE))
                                  ORDER BY rk)), 0.0) AS dcg_raw,
           CAST(coalesce(sum(rel), 0) AS BIGINT) AS n_relevant_topk
    FROM tr
  ),
  i AS (
    SELECT CASE WHEN n_relevant_corpus > 0
                THEN list_sum(list_transform(
                       range(1, CAST(least(n_relevant_corpus, 20) AS INT) + 1),
                       x -> 1.0 / log2(CAST(x + 1 AS DOUBLE))))
                ELSE 0.0 END AS idcg_raw,
           n_relevant_corpus
    FROM n
  )
  SELECT i.n_relevant_corpus, d.n_relevant_topk,
         floor(d.dcg_raw * 1000000.0 + 0.5) / 1000000.0 AS dcg,
         CASE WHEN i.n_relevant_corpus > 0
              THEN floor(i.idcg_raw * 1000000.0 + 0.5) / 1000000.0
              ELSE 0.0 END AS idcg,
         CASE WHEN i.n_relevant_corpus > 0
              THEN floor(d.dcg_raw / i.idcg_raw * 1000000.0 + 0.5) / 1000000.0
              ELSE 0.0 END AS ndcg
  FROM d CROSS JOIN i
)"""
)

# containment ground truth: exhaustive all-pairs substring check over
# space-delimited texts (fine at oracle SFs) — the Spark side's
# anchor-join candidates must lose NOTHING against this.  The a.dl >= 4
# restriction mirrors the Spark side's anchor_len floor (round-12
# ADVICE): docs too short to carry a 4-gram anchor are exact-dedup's
# job on BOTH engines, not silently included in one and not the other
ORACLE["dedup_contained_docs"] = """
WITH d AS (
  SELECT doc_id, text,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM d a JOIN d b ON a.doc_id != b.doc_id
  WHERE a.dl >= 4
    AND (a.dl < b.dl OR (a.dl = b.dl AND a.doc_id > b.doc_id))
    AND position(' ' || a.text || ' ' IN ' ' || b.text || ' ') > 0
)
SELECT a_id AS doc_id,
       CAST(count(DISTINCT b_id) AS BIGINT) AS n_containers,
       CAST(min(b_id) AS BIGINT) AS container_id
FROM pairs GROUP BY a_id ORDER BY doc_id
"""

# gap-threshold sensitivity: session starts at gap g = lag-gap > g
# (or first event), each threshold one conditional sum over the same
# per-user ordering
ORACLE["sessionize_gap_sensitivity"] = """
WITH p AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT)
         - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id))) AS BIGINT)
           AS gap
  FROM events
),
ks AS (SELECT unnest([5, 15, 30, 60]) AS gap_minutes)
SELECT CAST(k.gap_minutes AS BIGINT) AS gap_minutes,
       CAST(sum(CASE WHEN p.gap IS NULL OR p.gap > k.gap_minutes * 60
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM ks k CROSS JOIN p
GROUP BY k.gap_minutes ORDER BY gap_minutes
"""

# l-diversity: per QI group, size + distinct sensitive (segment)
# values + the l>=2 flag — k-anonymity's homogeneity-attack companion
ORACLE["l_diversity_report"] = f"""
WITH {USERS_CTE}
SELECT city, sex,
       CAST(age - (age % 10) AS BIGINT) AS age_decade,
       CAST(count(*) AS BIGINT) AS group_size,
       CAST(count(DISTINCT professional) AS BIGINT) AS n_sensitive_values,
       CAST(CASE WHEN count(DISTINCT professional) >= 2 THEN 1 ELSE 0 END
            AS INT) AS meets_l
FROM users
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

# mirror of operators/curation.py::perplexity_filtered_corpus (k=3):
# the backoff_surprisal CTEs verbatim, then ntile(3) over the
# 6-dp-quantized score + doc_id (DuckDB's ntile matches the engine's
# closed-form integer ntile exactly — functions/ranking.py docstring);
# kept = not in the highest-perplexity band (the CCNet tail drop)
ORACLE["perplexity_filtered_corpus"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
pairs AS (
  SELECT doc_id, trigram, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS trigram
    FROM toks WHERE len(t) >= 3
  )
  GROUP BY doc_id, trigram
),
c3 AS (
  SELECT trigram, CAST(sum(tf) AS BIGINT) AS c,
         string_split(trigram, ' ') AS w
  FROM pairs GROUP BY trigram
),
ctx AS (
  SELECT w[1] AS w1, w[2] AS w2, CAST(sum(c) AS BIGINT) AS ctx3
  FROM c3 GROUP BY 1, 2
),
suf AS (
  SELECT w[2] AS w2, w[3] AS w3, CAST(sum(c) AS BIGINT) AS suf2
  FROM c3 GROUP BY 1, 2
),
mid AS (
  SELECT w[2] AS w2, CAST(sum(c) AS BIGINT) AS mid1
  FROM c3 GROUP BY 1
),
lm AS (
  SELECT p.trigram,
         CASE WHEN p.c >= 2
              THEN log2(CAST(x.ctx3 AS DOUBLE)) - log2(CAST(p.c AS DOUBLE))
              ELSE 2.0 + log2(CAST(m.mid1 AS DOUBLE)) - log2(CAST(s.suf2 AS DOUBLE))
         END AS bits1
  FROM c3 p
  JOIN ctx x ON p.w[1] = x.w1 AND p.w[2] = x.w2
  JOIN suf s ON p.w[2] = s.w2 AND p.w[3] = s.w3
  JOIN mid m ON p.w[2] = m.w2
),
scored AS (
  SELECT pr.doc_id,
         CAST(sum(pr.tf) AS BIGINT) AS n_trigrams,
         floor(sum(CAST(pr.tf AS DOUBLE) * lm.bits1)
               / CAST(sum(pr.tf) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
           AS bits_per_trigram
  FROM pairs pr JOIN lm USING (trigram)
  GROUP BY pr.doc_id
),
banded AS (
  SELECT doc_id, n_trigrams, bits_per_trigram,
         CAST(ntile(3) OVER (ORDER BY bits_per_trigram, doc_id) AS INT)
           AS ppl_band
  FROM scored
)
SELECT doc_id, n_trigrams, bits_per_trigram, ppl_band,
       CAST(CASE WHEN ppl_band < 3 THEN 1 ELSE 0 END AS INT) AS kept
FROM banded ORDER BY doc_id
"""
