"""Property-based text-operator correctness: the distributed BM25 scorer
must match a pure-python reference on arbitrary corpora — not just the
fixed documents fixture."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

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
