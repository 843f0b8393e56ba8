"""Round-8 operators: sweep-line concurrency, CDC apply, shuffle
shards, curriculum stages, skew diagnostics, LSH tuning.

Each gets (a) hand-computed semantics on a tiny frame and (b) the
scale-shape assertion its docstring promises (keyed windows, prefix
sharding purity, no corpus-sized unpartitioned window)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from analysisofuserbehavior_spark.operators.curation import (
    curriculum_stages,
    shuffle_hash,
    training_shuffle_shards,
)
from analysisofuserbehavior_spark.operators.dedup import (
    LSH_TUNING_GRID,
    lsh_tuning_report,
)
from analysisofuserbehavior_spark.operators.diagnostics import (
    skew_key_diagnostics,
)
from analysisofuserbehavior_spark.operators.scd import cdc_apply
from analysisofuserbehavior_spark.operators.sweepline import (
    concurrency_by_hour,
    session_intervals,
)

US_H = 3_600_000_000


# ---- sweep-line ----------------------------------------------------------


def _iv(spark, rows):
    return spark.createDataFrame(
        [Row(session_id=str(i), start_us=a, end_us=b) for i, (a, b) in enumerate(rows)]
    )


def test_concurrency_basic_overlap(spark):
    # three intervals inside hour 0: [0,100), [50,150), [140,200)
    out = concurrency_by_hour(
        _iv(spark, [(0, 100), (50, 150), (140, 200)])
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.hour_start_us == 0
    assert r.max_concurrent == 2  # [50,100) and [140,150) both reach 2
    assert r.at_ts_us == 50  # earliest instant attaining the max


def test_concurrency_carry_across_hours(spark):
    # one interval spans hours 0-2 entirely; a second joins in hour 1.
    # hour 2 must still see the carried concurrency via the offset.
    iv = _iv(
        spark,
        [
            (0, 3 * US_H - 5),  # open through hours 0,1,2
            (US_H + 10, US_H + 20),  # blip in hour 1
        ],
    )
    got = {r.hour_start_us: r for r in concurrency_by_hour(iv).collect()}
    assert got[0].max_concurrent == 1
    assert got[US_H].max_concurrent == 2
    assert got[US_H].at_ts_us == US_H + 10
    # hour 2 contains only the -1 boundary: after it applies the
    # concurrency is 0, but the instant BEFORE it carried 1; max over
    # observed post-delta states in hour 2 is 0
    assert got[2 * US_H].max_concurrent == 0


def test_concurrency_zero_length_session_never_negative(spark):
    # [t, t+1) one-microsecond interval: +1 at t, -1 at t+1 — net per
    # distinct instant keeps every observed concurrency >= 0
    out = concurrency_by_hour(_iv(spark, [(10, 11)])).collect()
    assert out[0].max_concurrent == 1
    conc = concurrency_by_hour(_iv(spark, [(10, 11), (10, 11)])).collect()
    assert conc[0].max_concurrent == 2


def test_session_intervals_end_exclusive(spark):
    acts = spark.createDataFrame(
        [
            Row(session_id="s", ts=__import__("datetime").datetime(2024, 1, 1, 0, 0, 0)),
            Row(session_id="s", ts=__import__("datetime").datetime(2024, 1, 1, 0, 0, 9)),
        ]
    )
    r = session_intervals(acts).collect()[0]
    assert r.end_us - r.start_us == 9_000_000 + 1


def test_concurrency_window_is_hour_partitioned(spark):
    # the corpus-sized window must be keyed by hour; the only
    # unpartitioned window allowed is over the tiny hour-net frame
    iv = _iv(spark, [(0, 100), (US_H, US_H + 5)])
    plan = concurrency_by_hour(iv)._jdf.queryExecution().toString()
    assert "hour_us" in plan


# ---- CDC apply -----------------------------------------------------------


def _changelog(spark):
    return spark.createDataFrame(
        [
            # key 1: U(seq1) -> U(seq2): survives with seq2's value
            Row(k=1, seq=1, op="U", v=10.0),
            Row(k=1, seq=2, op="U", v=20.0),
            # key 2: U -> D: deleted
            Row(k=2, seq=1, op="U", v=30.0),
            Row(k=2, seq=2, op="D", v=0.0),
            # key 3: D -> U: delete is NOT final, survives
            Row(k=3, seq=1, op="D", v=0.0),
            Row(k=3, seq=2, op="U", v=40.0),
        ]
    )


def test_cdc_apply_latest_wins_and_deletes_drop(spark):
    out = cdc_apply(
        _changelog(spark), key_cols=("k",), seq_cols=("seq",)
    ).collect()
    got = {r.k: (r.v, r.n_changes) for r in out}
    assert got == {1: (20.0, 2), 3: (40.0, 2)}
    assert 2 not in got


def test_cdc_apply_single_event_key(spark):
    one = spark.createDataFrame([Row(k=9, seq=1, op="U", v=1.5)])
    r = cdc_apply(one, key_cols=("k",), seq_cols=("seq",)).collect()
    assert len(r) == 1 and r[0].n_changes == 1


def test_cdc_apply_window_is_key_partitioned(spark):
    plan = (
        cdc_apply(_changelog(spark), key_cols=("k",), seq_cols=("seq",))
        ._jdf.queryExecution()
        .toString()
    )
    # both windows (row_number + count) ride the SAME key partition —
    # no "No Partition Defined" global window anywhere in this plan
    assert "row_number" in plan and "count(1)" in plan
    assert "Window" in plan


# ---- shuffle shards ------------------------------------------------------


def test_shuffle_shards_cover_corpus_and_ranges_are_pure(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    man = training_shuffle_shards(docs).collect()
    assert sum(r.n_docs for r in man) == docs.count()
    # prefix sharding ⇒ [min_hash, max_hash] of shard i lies entirely
    # inside the hex range of its leading digit, and ranges of
    # ascending shard ids never interleave
    rows = sorted(man, key=lambda r: r.shard_id)
    hexd = "0123456789abcdef"
    for r in rows:
        assert r.min_hash[0] == hexd[r.shard_id]
        assert r.max_hash[0] == hexd[r.shard_id]
    for a, b in zip(rows, rows[1:]):
        assert a.max_hash < b.min_hash


def test_shuffle_shards_deterministic_and_salt_sensitive(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r.shard_id: r.n_docs for r in training_shuffle_shards(docs).collect()}
    b = {r.shard_id: r.n_docs for r in training_shuffle_shards(docs).collect()}
    assert a == b
    c = {
        r.shard_id: r.n_docs
        for r in training_shuffle_shards(docs, salt="other").collect()
    }
    assert a != c  # a different salt is a different permutation


def test_shuffle_shards_physical_write_matches_manifest(spark, sf_dir, tmp_path):
    # the manifest describes the REAL write: partitionBy(shard_id)
    # directories must reproduce the manifest's per-shard doc counts
    # exactly, and within each directory rows cover only that shard's
    # hex range.  (repartitionByRange on the hash also yields
    # non-interleaved files, but its sampled boundaries don't align
    # to hex prefixes — partitionBy is the shard contract.)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    manifest = {r.shard_id: r.n_docs for r in training_shuffle_shards(docs).collect()}
    out = str(tmp_path / "shards")
    h = shuffle_hash()
    docs.select(
        "doc_id",
        h.alias("h"),
        (F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1).alias(
            "shard_id"
        ),
    ).repartition(4, "shard_id").write.partitionBy("shard_id").parquet(out)
    back = (
        spark.read.parquet(out)
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("h").alias("lo"), F.max("h").alias("hi"))
        .collect()
    )
    assert {r.shard_id: r.n for r in back} == manifest
    hexd = "0123456789abcdef"
    for r in back:
        assert r.lo[0] == hexd[r.shard_id] and r.hi[0] == hexd[r.shard_id]


def test_shuffle_shards_rejects_unsupported_width(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError):
        training_shuffle_shards(docs, n_shards=32)


# ---- curriculum ----------------------------------------------------------


def test_curriculum_stages_partition_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = curriculum_stages(docs).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    assert {r.stage for r in rows} <= {0, 1, 2, 3}
    # stages ordered by quality: every doc in stage i has quality >=
    # every doc in stage i+1 (boundaries strict by construction)
    by_stage = sorted(rows, key=lambda r: r.stage)
    for a, b in zip(by_stage, by_stage[1:]):
        assert a.min_quality > b.max_quality


def test_curriculum_quartiles_are_exact_inverse_cdf(spark):
    # 8 docs with scores forcing known quartiles: stage sizes must
    # match the integer-CDF thresholds, not approximate buckets
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, text=" ".join(["the"] * n))
            for i, n in enumerate([1, 1, 2, 2, 3, 3, 4, 4])
        ]
    )
    # all-stopword docs: quality(n<=2)=0.41, quality(3<=n<=4)=0.42 →
    # histogram {0.41:4, 0.42:4}; integer CDF puts q1=q2=0.41, q3=0.42
    # → stage1 = the 0.42 docs, stage3 = the 0.41 docs, 0/2 empty
    rows = {r.stage: r.n_docs for r in curriculum_stages(docs).collect()}
    assert rows == {1: 4, 3: 4}


# ---- skew diagnostics ----------------------------------------------------


def test_skew_profile_exact_counts(spark):
    df = spark.createDataFrame(
        [Row(k="a")] * 98 + [Row(k="b")] + [Row(k="c")]
    )
    from analysisofuserbehavior_spark.operators.diagnostics import (
        key_skew_profile,
    )

    r = key_skew_profile(df, "k", "t.k").collect()[0]
    assert (r.n_rows, r.n_keys, r.max_rows_per_key) == (100, 3, 98)
    assert r.top1_frac == 0.98
    # p99 of rows-per-key over keys {98,1,1}: smallest c with
    # cum-keys*100 >= 99*3 → 98
    assert r.p99_rows_per_key == 98


def test_skew_diagnostics_counts_null_keys_as_a_key(spark):
    df = spark.createDataFrame(
        [Row(k="a"), Row(k=None), Row(k=None), Row(k=None)]
    )
    from analysisofuserbehavior_spark.operators.diagnostics import (
        key_skew_profile,
    )

    r = key_skew_profile(df, "k", "t.k").collect()[0]
    assert (r.n_rows, r.n_keys, r.max_rows_per_key) == (4, 2, 3)


def test_skew_diagnostics_union_shape(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = skew_key_diagnostics([(ev, "user_id", "a"), (ev, "event_type", "b")])
    rows = {r.key: r for r in out.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"].n_rows == rows["b"].n_rows == ev.count()


# ---- LSH tuning ----------------------------------------------------------


def test_lsh_tuning_monotonicity(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = {(r.bands, r.rows_per_band): r for r in lsh_tuning_report(docs).collect()}
    assert set(rows) == set(LSH_TUNING_GRID)
    # more bands at fixed budget ⇒ more permissive ⇒ candidates and
    # recall both non-decreasing as (b, r) goes (2,8) → (16,1)
    order = [(2, 8), (4, 4), (8, 2), (16, 1)]
    cands = [rows[c].exp_candidates for c in order]
    recalls = [rows[c].exp_recall for c in order]
    assert cands == sorted(cands)
    assert recalls == sorted(recalls)
    # s-curve midpoint moves DOWN as bands grow
    mids = [rows[c].s_mid for c in order]
    assert mids == sorted(mids, reverse=True)
    for c in order:
        assert 0 <= rows[c].exp_recall <= 1


def test_lsh_tuning_single_band_single_row_is_identity(spark):
    # b=1, r=1 ⇒ p = J exactly: expected candidates equals sum of
    # jaccards (6-dp quantized) — pin the probability algebra
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e"),
            Row(doc_id=2, text="a b c d f"),
        ]
    )
    from analysisofuserbehavior_spark.operators.dedup import (
        _int_pow,
        ngram_jaccard_pairs,
    )

    j = ngram_jaccard_pairs(docs, threshold=0.0).collect()[0].jaccard
    p = docs.sparkSession.range(1).select(
        (F.lit(1.0) - _int_pow(F.lit(1.0) - _int_pow(F.lit(j), 1), 1)).alias("p")
    ).collect()[0].p
    assert p == pytest.approx(j, abs=1e-12)


def test_concurrency_bucket_width_equivalence(spark, sf_dir):
    # hour / minute / second inner buckets must produce IDENTICAL
    # hourly output on the same corpus — the dense-burst fallback is
    # a pure decomposition choice, never a semantics change
    from analysisofuserbehavior_spark.operators.sessionize import sessionize

    acts = sessionize(spark.read.parquet(f"{sf_dir}/events.parquet"))
    iv = session_intervals(acts)
    base = sorted(
        concurrency_by_hour(iv).collect(), key=lambda r: r.hour_start_us
    )
    for width in (60_000_000, 1_000_000):  # minute, second
        alt = sorted(
            concurrency_by_hour(iv, bucket_us=width).collect(),
            key=lambda r: r.hour_start_us,
        )
        assert alt == base


def test_concurrency_rejects_non_nesting_bucket(spark):
    with pytest.raises(ValueError):
        concurrency_by_hour(_iv(spark, [(0, 1)]), bucket_us=7_000_000)


def test_concurrency_exchange_budget(spark):
    # decomposition floor: groupBy(ts_us) + in-bucket window +
    # bucket-net branch + tiny offsets window = 4 exchanges on the
    # hour path; the per-hour max/argmax REUSES the hour partitioning
    # (window + groupBy, no self-join) and must not add any
    from analysisofuserbehavior_spark.plans.audit import count_exchanges

    iv = _iv(spark, [(0, 100)])
    assert count_exchanges(concurrency_by_hour(iv)) <= 4
    # sub-hour buckets re-key the output regroup once: exactly +1
    assert count_exchanges(concurrency_by_hour(iv, bucket_us=60_000_000)) <= 5


# ---- covisitation ---------------------------------------------------------


def test_covisitation_counts_presence_not_clicks(spark):
    from analysisofuserbehavior_spark.operators.covisitation import (
        item_covisitation,
    )

    rows = []
    # session s1: items 1,2 (item 1 clicked 3 times — still one row)
    rows += [("s1", "click", 1)] * 3 + [("s1", "click", 2)]
    # session s2: items 1,2 again -> support 2
    rows += [("s2", "click", 1), ("s2", "click", 2)]
    # session s3: item 1 with a VIEW of 2 — views don't count
    rows += [("s3", "click", 1), ("s3", "view", 2)]
    df = spark.createDataFrame(rows, "session_id string, event_type string, product_id long")
    out = item_covisitation(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.n_co, r.n_a, r.n_b) == (1, 2, 2, 3, 2)
    # lift = 2*3/(3*2) = 1.0; cosine = 2/sqrt(6)
    assert r.lift == 1.0
    assert abs(r.cosine - 2 / 6**0.5) < 1e-3


def test_covisitation_caps_bot_sessions(spark):
    from analysisofuserbehavior_spark.operators.covisitation import (
        item_covisitation,
    )

    # one session clicking 100 distinct items: cap 32 keeps the 32
    # smallest ids -> C(32,2) pairs, not C(100,2)
    rows = [("bot", "click", i) for i in range(100)]
    df = spark.createDataFrame(rows, "session_id string, event_type string, product_id long")
    out = item_covisitation(df).collect()
    assert len(out) == 32 * 31 // 2
    assert max(max(r.item_a, r.item_b) for r in out) == 31


def test_covisitation_pair_generation_is_row_local(spark):
    # the plan must contain NO self-join: one exchange for the basket
    # rollup, one for the pair groupBy, one per tiny stat frame —
    # and zero SortMergeJoin on session_id
    from analysisofuserbehavior_spark.operators.covisitation import (
        item_covisitation,
    )

    df = spark.createDataFrame(
        [("s", "click", 1), ("s", "click", 2)],
        "session_id string, event_type string, product_id long",
    )
    plan = item_covisitation(df)._jdf.queryExecution().toString()
    assert plan.count("SortMergeJoin") == 0


def test_concurrency_computes_intervals_once(spark, sf_dir):
    # round 12: the operator lineage-truncates its multi-consumer
    # frames (the round-8 "AQE reuse suffices" assumption stopped
    # holding — the profile showed four identical interval-aggregate
    # map stages).  Pin compute-once: the executed plan reads the
    # truncated frames as LogicalRDD scans and contains NO duplicated
    # interval aggregate (at most one exchange upstream of the
    # running-sum window).
    from analysisofuserbehavior_spark.operators.sessionize import sessionize
    from analysisofuserbehavior_spark.operators.sweepline import (
        session_concurrency_hourly,
    )

    acts = sessionize(spark.read.parquet(f"{sf_dir}/events.parquet"))
    df = session_concurrency_hourly(acts)
    df.collect()  # materialize THIS DataFrame so AQE finalizes its plan
    final = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "isFinalPlan=true" in final, final[:500]
    # the deltas frame arrives pre-materialized: no session_id
    # aggregate may appear in this plan at all
    assert "session_id" not in final, final[:3000]
    assert "Scan ExistingRDD" in final, final[:3000]


# ---- engagement (trending + RFM) ------------------------------------------


def test_trending_decay_is_exact_powers_of_two(spark):
    from datetime import datetime

    from analysisofuserbehavior_spark.operators.engagement import (
        trending_items_decayed,
    )

    # item 1: 4 clicks today; item 2: 8 clicks yesterday (weight 1/2)
    # -> identical score 4.0; tiebreak favors the smaller item id
    rows = []
    rows += [(1, datetime(2024, 1, 10, 12))] * 4
    rows += [(2, datetime(2024, 1, 9, 12))] * 8
    df = spark.createDataFrame(
        [("click", i, t) for i, t in rows],
        "event_type string, product_id long, ts timestamp",
    )
    out = sorted(
        trending_items_decayed(df).collect(), key=lambda r: r.rank
    )
    assert [(r.rank, r.item, r.score) for r in out] == [
        (1, 1, 4.0),
        (2, 2, 4.0),
    ]


def test_trending_horizon_excludes_old_clicks(spark):
    from datetime import datetime

    from analysisofuserbehavior_spark.operators.engagement import (
        trending_items_decayed,
    )

    df = spark.createDataFrame(
        [
            ("click", 1, datetime(2024, 3, 1)),
            ("click", 2, datetime(2023, 1, 1)),  # 425 days old: outside horizon
        ],
        "event_type string, product_id long, ts timestamp",
    )
    out = trending_items_decayed(df).collect()
    assert [r.item for r in out] == [1]


def test_rfm_scores_partition_users_and_invert_recency(spark, sf_dir):
    from analysisofuserbehavior_spark.operators.engagement import rfm_segments

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = rfm_segments(ev).collect()
    n_users = ev.where("event_type = 'purchase'").select("user_id").distinct().count()
    assert len(rows) == n_users
    for r in rows:
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4
        assert r.segment == f"{r.r_score}{r.f_score}{r.m_score}"
    # monotonicity: the user with the SMALLEST recency never scores
    # below any user with a larger recency
    by_rec = sorted(rows, key=lambda r: r.recency_days)
    assert by_rec[0].r_score >= by_rec[-1].r_score
    big_m = max(rows, key=lambda r: r.monetary_cents)
    small_m = min(rows, key=lambda r: r.monetary_cents)
    assert big_m.m_score >= small_m.m_score


def test_new_vs_returning_accounting_identity(spark, sf_dir):
    from analysisofuserbehavior_spark.operators.engagement import (
        new_vs_returning_daily,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = new_vs_returning_daily(ev).collect()
    # identity: sum of n_new across days == total distinct users
    assert sum(r.n_new for r in rows) == ev.select("user_id").distinct().count()
    for r in rows:
        assert r.n_active == r.n_new + r.n_returning
    # the earliest day has zero returning users by definition
    first = min(rows, key=lambda r: r.day)
    assert first.n_returning == 0


def test_affinity_rules_both_directions_and_confidence(spark):
    from analysisofuserbehavior_spark.operators.covisitation import (
        basket_affinity_rules,
    )

    rows = []
    rows += [("s1", "click", 1), ("s1", "click", 2)]
    rows += [("s2", "click", 1), ("s2", "click", 2)]
    rows += [("s3", "click", 1)]  # 1 appears alone once: conf(1->2)=2/3
    df = spark.createDataFrame(
        rows, "session_id string, event_type string, product_id long"
    )
    out = {(r.antecedent, r.consequent): r for r in basket_affinity_rules(df).collect()}
    assert set(out) == {(1, 2), (2, 1)}
    assert out[(1, 2)].confidence == 0.6667
    assert out[(2, 1)].confidence == 1.0
    assert out[(1, 2)].lift == out[(2, 1)].lift
