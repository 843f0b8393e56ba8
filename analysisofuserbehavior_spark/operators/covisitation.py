"""Item co-visitation (market-basket) statistics — the recommender
building block the reference's e-commerce domain implies but never
ships: which products are clicked together within a session, scored
by lift and cosine.

Reference context: module 1 computes per-session clicked-category
lists (UserVisitSessionAnalyzeSpark.java:340-455 collects
click_category_ids per session) and module 3 ranks products per
area; the co-click MATRIX is the natural next artifact, and the one
that actually powers "customers also viewed".

Scale design — the three standard guards, all applied:

1. **Distinct before fan-out**: the unit is (session, item) PRESENCE
   (array_distinct on the per-session collected items), not click
   events — a user hammering one product 500 times in a session
   contributes one row.
2. **Bounded per-session fan-out**: sessions keep at most
   `max_items` distinct items (deterministic: lowest item ids —
   mirrored exactly in the oracle).  Pair generation is a row-LOCAL
   double loop over the capped array (≤ C(max_items,2) pairs per
   session, zero self-join) — the explode-then-self-join form would
   shuffle the (session,item) table twice and let one 10^4-item bot
   session emit 10^8 pairs.
3. **Aggregate once**: exploded pairs go through ONE
   map-side-combined groupBy; per-item session counts reduce the
   same capped frame, and the two tiny result frames broadcast back
   onto the pair aggregate.

Metrics (cross-engine discipline): support counts are integers;
lift = cnt·N / (n_a·n_b) and cosine = cnt / sqrt(n_a·n_b) are one
IEEE division (+ one correctly-rounded sqrt) from integers, then
2-dp/4-dp HALF_UP quantized — both engines agree bit-for-bit (the
same sqrt argument is an exact integer product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import qround

MAX_ITEMS_PER_SESSION = 32


def item_covisitation(
    actions: DataFrame,
    item_col: str = "product_id",
    event_type: str = "click",
    max_items: int = MAX_ITEMS_PER_SESSION,
    min_support: int = 1,
) -> DataFrame:
    """(item_a, item_b, n_co, n_a, n_b, lift, cosine) for item pairs
    co-clicked in ≥ min_support sessions.  The default keeps support
    1: the driver testdata's click stream is sparse over ~100
    products (max co-click support is 1 at sf0.01), and raising the
    floor is a one-arg change for dense real corpora."""
    # baskets feeds THREE branches (pairs, per-item counts, total);
    # the branches share one identical groupBy subtree, which AQE
    # ReusedExchange deduplicates at runtime (measured A/B at sf0.1:
    # ckpt neutral) — see sweepline.py for the reuse-works rationale
    baskets = (
        actions.where(F.col("event_type") == event_type)
        .where(F.col(item_col).isNotNull())
        .groupBy("session_id")
        .agg(
            F.slice(
                F.array_sort(F.collect_set(F.col(item_col))), 1, max_items
            ).alias("items")
        )
    )
    # row-local pair generation over the capped sorted array:
    # items[i] < items[j] for i < j, so pairs come out canonically
    # ordered with no post-hoc min/max shuffle
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda x, i: F.transform(
                        F.slice(F.col("items"), i + 2, max_items),
                        lambda y: F.struct(
                            x.alias("item_a"), y.alias("item_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.item_a", "p.item_b")
    co = pairs.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).alias("n_co")
    ).where(F.col("n_co") >= min_support)
    item_n = baskets.select(F.explode("items").alias("item")).groupBy(
        "item"
    ).agg(F.count(F.lit(1)).alias("n"))
    total = baskets.agg(F.count(F.lit(1)).alias("n_sessions"))
    return (
        co.join(
            F.broadcast(
                item_n.select(
                    F.col("item").alias("item_a"), F.col("n").alias("n_a")
                )
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                item_n.select(
                    F.col("item").alias("item_b"), F.col("n").alias("n_b")
                )
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.col("item_a").cast("bigint").alias("item_a"),
            F.col("item_b").cast("bigint").alias("item_b"),
            F.col("n_co").cast("bigint").alias("n_co"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            qround(
                (F.col("n_co") * F.col("n_sessions")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                4,
            ).alias("lift"),
            qround(
                F.col("n_co").cast("double")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double")),
                4,
            ).alias("cosine"),
        )
    )


def basket_affinity_rules(
    actions: DataFrame, min_confidence: float = 0.0, **covis_kwargs
) -> DataFrame:
    """Directional association rules from the co-visitation matrix:
    each unordered co-click pair yields BOTH a→b and b→a with
    confidence = n_co / n(antecedent) — the classic
    support/confidence/lift triple, minus the itemset lattice (pairs
    only; the capped fan-out already bounds candidate generation).
    confidence is one IEEE division of two integers, 4-dp quantized.
    """
    from ..functions.ckpt import ckpt

    # the co-visitation matrix feeds BOTH direction branches of the
    # union below; plan-level exchange reuse does not deduplicate
    # re-derived branches (functions/ckpt.py), so without truncation
    # the whole basket→pair→join pipeline executes twice — once per
    # direction.  The matrix is pair-cardinality (tiny), so the
    # materialization is free next to the recompute it removes.
    co = ckpt(item_covisitation(actions, **covis_kwargs))
    conf = lambda n_ant: qround(
        F.col("n_co").cast("double") / F.col(n_ant).cast("double"), 4
    )
    a2b = co.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "n_co",
        F.col("n_a").alias("n_antecedent"),
        conf("n_a").alias("confidence"),
        "lift",
    )
    b2a = co.select(
        F.col("item_b").alias("antecedent"),
        F.col("item_a").alias("consequent"),
        "n_co",
        F.col("n_b").alias("n_antecedent"),
        conf("n_b").alias("confidence"),
        "lift",
    )
    return a2b.unionByName(b2a).where(
        F.col("confidence") >= F.lit(min_confidence)
    )


def covisit_next_item_hitrate(actions: DataFrame, k: int = 5) -> DataFrame:
    """OFFLINE EVALUATION of a sequential co-visitation recommender:
    leave-one-out next-item hit-rate@k — the metric that decides
    whether a "customers also viewed" transition model ships.

    Protocol (all deterministic, mirrored in the oracle):
      * per user, clicks ordered by (ts, event_id); users with >= 2
        clicks are the evaluation set, their LAST click is held out;
      * the transition model trains on every consecutive click pair
        EXCEPT each user's final transition (no test leakage);
      * rec(source) = top-k target items by transition count
        (count desc, item asc tie-break);
      * a user scores a hit when the held-out item appears in
        rec(penultimate item).

    Output is the one-row summary (k, n_eval_users, n_hits,
    hit_rate) — counts exact BIGINTs, the rate one final division.

    Scale shape: one user-keyed window (the same sessionize shuffle
    class) derives ranks; transitions reduce via a map-side-combined
    groupBy; the rec lists are a |distinct source items| × k frame
    that BROADCASTS onto the per-user evaluation rows.  Nothing
    retains per-user state beyond the two boundary ranks."""
    from pyspark.sql import Window

    from ..functions import qround

    clicks = actions.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("category_id").alias("item")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = clicks.select(
        "user_id",
        "item",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("cnt"),
    ).where(F.col("cnt") >= 2)
    from ..functions.ckpt import ckpt

    # the transition frame feeds THREE consumers (training counts,
    # the held-out test rows, the eval-user count); truncate so the
    # two user-keyed windows upstream execute once, not per branch
    trans = ckpt(
        ranked.select(
            "user_id",
            "rn",
            "cnt",
            F.col("item").alias("src"),
            F.lead("item").over(w.orderBy("rn")).alias("dst"),
        ).where(F.col("dst").isNotNull())
    )
    train = trans.where(F.col("rn") < F.col("cnt") - 1)
    counts = train.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n")
    )
    wr = Window.partitionBy("src").orderBy(F.desc("n"), F.asc("dst"))
    recs = (
        counts.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= k)
        .select("src", "dst")
    )
    test = trans.where(F.col("rn") == F.col("cnt") - 1).select(
        "user_id", "src", F.col("dst").alias("truth")
    )
    hits = test.join(
        F.broadcast(recs),
        (test["src"] == recs["src"]) & (test["truth"] == recs["dst"]),
        "left_semi",
    )
    n_users = test.select(F.count(F.lit(1)).cast("bigint").alias("n_eval_users"))
    n_hits = hits.select(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    return (
        n_users.crossJoin(n_hits)
        .select(
            F.lit(k).cast("bigint").alias("k"),
            "n_eval_users",
            "n_hits",
            qround(
                F.col("n_hits").cast("double") / F.col("n_eval_users").cast("double"),
                6,
            ).alias("hit_rate"),
        )
    )
