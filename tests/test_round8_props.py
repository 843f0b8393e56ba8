"""Property-based invariants for the round-8 operators (hypothesis).

Each distributed form is checked against a brute-force Python
reference over randomized inputs — the same discipline as
test_sessionize_props: few, small examples (one Spark job each;
input-shape coverage, not volume).

* sweep-line concurrency vs an O(intervals × instants) scan;
* cdc_apply vs a dict replay of the changelog;
* curriculum stage assignment vs a sorted-quartile reference on the
  doc-count level (stages partition the corpus, quality-ordered).
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from analysisofuserbehavior_spark.operators.scd import cdc_apply
from analysisofuserbehavior_spark.operators.sweepline import (
    US_PER_HOUR,
    concurrency_by_hour,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def interval_sets(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    out = []
    for _ in range(n):
        # starts cluster inside ~3 hours; lengths cross hour edges
        s = draw(st.integers(min_value=0, max_value=3 * US_PER_HOUR))
        ln = draw(
            st.one_of(
                st.integers(min_value=1, max_value=100),
                st.integers(min_value=US_PER_HOUR - 2, max_value=US_PER_HOUR + 2),
                st.integers(min_value=1, max_value=2 * US_PER_HOUR),
            )
        )
        out.append((s, s + ln))
    return out


def _brute_hourly_max(ivs):
    """Serial reference: apply all deltas per distinct instant in
    order; record per-hour max of the post-instant concurrency."""
    deltas = defaultdict(int)
    for s, e in ivs:
        deltas[s] += 1
        deltas[e] -= 1
    cur = 0
    best = {}
    for ts in sorted(deltas):
        cur += deltas[ts]
        h = ts - ts % US_PER_HOUR
        if h not in best or cur > best[h][0] :
            best[h] = (cur, ts)
        # min-ts tie: first time the max is reached wins (scan order)
    return {h: v for h, v in best.items()}


@given(interval_sets())
@settings(**_SETTINGS)
def test_concurrency_matches_brute_force(spark, ivs):
    df = spark.createDataFrame(
        [Row(session_id=str(i), start_us=s, end_us=e) for i, (s, e) in enumerate(ivs)]
    )
    got = {
        r.hour_start_us: (r.max_concurrent, r.at_ts_us)
        for r in concurrency_by_hour(df).collect()
    }
    assert got == _brute_hourly_max(ivs)


@st.composite
def changelogs(draw):
    n = draw(st.integers(min_value=1, max_value=20))
    rows = []
    for i in range(n):
        rows.append(
            (
                draw(st.integers(min_value=1, max_value=4)),  # key
                i,  # seq strictly increasing == arrival order
                draw(st.sampled_from(["U", "D"])),
                float(draw(st.integers(min_value=0, max_value=99))),
            )
        )
    return rows


def _brute_cdc(rows):
    state: dict[int, float] = {}
    counts: dict[int, int] = defaultdict(int)
    for k, _seq, op, v in rows:  # already in seq order
        counts[k] += 1
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    return {k: (v, counts[k]) for k, v in state.items()}


@given(changelogs())
@settings(**_SETTINGS)
def test_cdc_apply_matches_dict_replay(spark, rows):
    df = spark.createDataFrame(
        [Row(k=k, seq=s, op=op, v=v) for k, s, op, v in rows]
    )
    out = cdc_apply(df, key_cols=("k",), seq_cols=("seq",)).collect()
    got = {r.k: (r.v, r.n_changes) for r in out}
    assert got == _brute_cdc(rows)


@st.composite
def quality_corpora(draw):
    n = draw(st.integers(min_value=4, max_value=24))
    # token counts drive quality deterministically (all stopwords)
    return [draw(st.integers(min_value=1, max_value=120)) for _ in range(n)]


@given(quality_corpora())
@settings(**_SETTINGS)
def test_curriculum_stages_partition_and_order(spark, lengths):
    from analysisofuserbehavior_spark.operators.curation import (
        curriculum_stages,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["the"] * n)) for i, n in enumerate(lengths)]
    )
    rows = curriculum_stages(docs).collect()
    assert sum(r.n_docs for r in rows) == len(lengths)
    by_stage = sorted(rows, key=lambda r: r.stage)
    for a, b in zip(by_stage, by_stage[1:]):
        assert a.min_quality > b.max_quality
    # stage 3 (the <= q1 band) always holds at least a quarter of docs
    s3 = next((r for r in rows if r.stage == 3), None)
    assert s3 is not None and 4 * s3.n_docs >= len(lengths)
