"""Property-based invariants for the round-12 operators (hypothesis).

Each distributed form is checked against a brute-force Python
reference over randomized inputs — the test_round11_props discipline:
few, small examples (one Spark job each; input-shape coverage, not
volume).

* countmin_token_freq vs an exact Python replay of the md5-bucketed
  cells and min-over-rows estimate;
* feature_hash_docs vs a Python hash/sign/sum replay;
* label_propagation (1 round) vs a Python weighted-argmax replay
  with the smallest-label tie rule;
* winsorized_user_spend vs Python rank thresholds + clamp/trim.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings, strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["the", "row", "data", "zq", "xk", "sort", "of", "query"]


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@st.composite
def token_docs(draw):
    n_docs = draw(st.integers(min_value=1, max_value=8))
    rows = []
    for i in range(n_docs):
        n_tok = draw(st.integers(min_value=1, max_value=20))
        toks = [
            _WORDS[draw(st.integers(min_value=0, max_value=len(_WORDS) - 1))]
            for _ in range(n_tok)
        ]
        rows.append((i, " ".join(toks)))
    return rows


@given(token_docs())
@settings(**_SETTINGS)
def test_countmin_matches_python_replay(spark, rows):
    from analysisofuserbehavior_spark.operators.text_analysis import (
        countmin_token_freq,
    )

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.token: (r.true_count, r.cm_estimate) for r in countmin_token_freq(
        docs, depth=4, width=32, top=50
    ).collect()}

    toks: list[str] = []
    for _, t in rows:
        toks.extend(t.split(" "))
    true = {}
    for t in toks:
        true[t] = true.get(t, 0) + 1
    cells: dict[tuple[int, int], int] = {}
    for t in toks:
        for r in range(4):
            b = _h32(f"{r}:{t}") % 32
            cells[(r, b)] = cells.get((r, b), 0) + 1
    for t, n in true.items():
        est = min(cells[(r, _h32(f"{r}:{t}") % 32)] for r in range(4))
        assert got[t] == (n, est), t


@given(token_docs())
@settings(**_SETTINGS)
def test_feature_hash_matches_python_replay(spark, rows):
    from analysisofuserbehavior_spark.operators.featurization import (
        feature_hash_docs,
    )

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.dim_id): r.feat
        for r in feature_hash_docs(docs, dim=16, sample_docs=len(rows)).collect()
    }
    want: dict[tuple[int, int], int] = {}
    for i, t in rows:
        for tok in t.split(" "):
            h = _h32(tok)
            sign = 1 if (h // 16) % 2 == 1 else -1
            k = (i, h % 16)
            want[k] = want.get(k, 0) + sign
    want = {k: v for k, v in want.items() if v != 0}
    assert got == want


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=2, max_value=8))
    m = draw(st.integers(min_value=1, max_value=12))
    edges = set()
    for _ in range(m):
        a = draw(st.integers(min_value=0, max_value=n - 1))
        b = draw(st.integers(min_value=0, max_value=n - 1))
        if a != b:
            edges.add((min(a, b), max(a, b)))
    if not edges:
        edges.add((0, 1))
    return [
        (a, b, draw(st.integers(min_value=1, max_value=9))) for a, b in sorted(edges)
    ]


@given(graphs())
@settings(**_SETTINGS)
def test_label_propagation_one_round_matches_argmax_replay(spark, edges):
    from analysisofuserbehavior_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {r.node: r.community for r in label_propagation(df, rounds=1).collect()}
    adj: dict[int, dict[int, int]] = {}
    for a, b, w in edges:
        adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0) + w
        adj.setdefault(b, {})[a] = adj.setdefault(b, {}).get(a, 0) + w
    for node, nbrs in adj.items():
        # labels init to node ids; one sync round: heaviest neighbor
        # label, ties to the smallest label
        best = sorted(nbrs.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert got[node] == best, (node, nbrs)


@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40
    )
)
@settings(**_SETTINGS)
def test_winsorized_matches_python_rank_replay(spark, cents):
    from pyspark.sql import Row

    from analysisofuserbehavior_spark.operators.engagement import (
        winsorized_user_spend,
    )

    rows = [
        Row(event_type="purchase", user_id=i, value=c / 100.0)
        for i, c in enumerate(cents)
    ]
    r = winsorized_user_spend(spark.createDataFrame(rows)).collect()[0]
    n = len(cents)
    s = sorted(cents)
    lo = s[math.ceil(n / 20) - 1]
    hi = s[math.ceil(19 * n / 20) - 1]
    assert r.n_users == n
    assert r.p05_spend == lo / 100.0
    assert r.p95_spend == hi / 100.0
    wmean = sum(max(lo, min(hi, c)) for c in cents) / n / 100.0
    assert abs(r.winsorized_mean_spend - math.floor(wmean * 1e4 + 0.5) / 1e4) < 1e-9
    in_rng = [c for c in cents if lo <= c <= hi]
    tmean = sum(in_rng) / len(in_rng) / 100.0
    assert abs(r.trimmed_mean_spend - math.floor(tmean * 1e4 + 0.5) / 1e4) < 1e-9
