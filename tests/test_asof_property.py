"""Property-based as-of join correctness: both distributed strategies must
agree with pandas ``merge_asof`` (the reference's semantics source,
reference src/pipelines/etl.py:27-42) on arbitrary inputs — not just the
hand-picked edge fixtures in test_asof.py."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_warehouse_product_mix_clustering_spark.operators.asof_join import asof_join

_BASE = dt.datetime(2024, 1, 1)

# Timestamps on a coarse grid so ties and exact-boundary hits are COMMON
# (the interesting cases), not vanishingly rare.
_ts = st.integers(min_value=0, max_value=40).map(
    lambda h: _BASE + dt.timedelta(hours=h)
)
_left_rows = st.lists(_ts, min_size=1, max_size=12)
# Right side: unique event times (merge_asof's behavior on duplicate right
# keys is positional, which no distributed engine can honor; our tie rule
# for that case is pinned separately in test_asof.py).
_right_rows = st.lists(
    st.tuples(_ts, st.floats(min_value=0, max_value=100, allow_nan=False)),
    min_size=1,
    max_size=8,
    unique_by=lambda r: r[0],
)


@pytest.mark.parametrize("strategy", ["broadcast", "union"])
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_ts=_left_rows, right_rows=_right_rows)
def test_asof_matches_pandas_merge_asof(spark, strategy, left_ts, right_rows):
    left_pd = pd.DataFrame(
        {"id": range(len(left_ts)), "ts": pd.to_datetime(left_ts)}
    ).sort_values("ts", kind="stable")
    right_pd = pd.DataFrame(
        {
            "start": pd.to_datetime([r[0] for r in right_rows]),
            "price": [r[1] for r in right_rows],
        }
    ).sort_values("start", kind="stable")
    want = pd.merge_asof(left_pd, right_pd, left_on="ts", right_on="start")
    want_map = {
        int(r.id): (None if pd.isna(r.price) else float(r.price))
        for r in want.itertuples()
    }

    left = spark.createDataFrame(left_pd, "id long, ts timestamp")
    right = spark.createDataFrame(right_pd, "start timestamp, price double")
    got = {
        r.id: r.price
        for r in asof_join(
            left, right, left_on="ts", right_on="start", strategy=strategy
        ).collect()
    }
    assert got == want_map


# ---------------------------------------------------------------------------
# BM25 property: the distributed scorer must match a pure-python reference
# on arbitrary corpora — not just the fixed documents fixture.
# ---------------------------------------------------------------------------

_BM25_VOCAB = ["merge", "join", "dup", "scan", "sort", "key"]
_bm25_doc = st.lists(st.sampled_from(_BM25_VOCAB), min_size=1, max_size=12)
_bm25_corpus = st.lists(_bm25_doc, min_size=1, max_size=8)


def _bm25_py(corpus, terms=("merge", "join", "dup"), k1=1.2, b=0.75):
    import math

    n = len(corpus)
    avgdl = sum(len(d) for d in corpus) / n
    df = {
        t: sum(1 for d in corpus if t in d) for t in terms
    }
    out = {}
    for doc_id, d in enumerate(corpus):
        score = 0.0
        hit = False
        for t in terms:
            tf = d.count(t)
            if tf == 0:
                continue
            hit = True
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(d) / avgdl)
            )
        if hit:
            out[doc_id] = round(score + 1e-9, 6)
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_bm25_corpus)
def test_bm25_matches_python_reference(spark, corpus):
    from data_warehouse_product_mix_clustering_spark.plans.text import bm25_scores_df

    docs = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(corpus)], "doc_id long, text string"
    )
    got = {r.doc_id: r.bm25 for r in bm25_scores_df(docs).collect()}
    want = _bm25_py(corpus)
    assert set(got) == set(want), f"doc sets differ: {got} vs {want}"
    for doc_id, w in want.items():
        assert abs(got[doc_id] - w) <= 1e-6, (doc_id, got[doc_id], w)
