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


def test_weighted_sample_draw_is_engine_identical(spark):
    """The hash-fraction draw and sample key must match DuckDB bit-for-bit
    across a weight range that includes tiny weights (which amplify any
    arithmetic-mode divergence — the DECIMAL-vs-DOUBLE trap this pins)."""
    import duckdb

    import pyspark.sql.functions as F

    from data_warehouse_product_mix_clustering_spark.plans.sql_api import _WEIGHTED_SAMPLE_SQL

    sql = _WEIGHTED_SAMPLE_SQL.replace("LIMIT 50", "")
    n = 20000
    spark.range(0, n).select(
        F.col("id").alias("doc_id"), (F.col("id") % 997 + 1).alias("n_chars")
    ).createOrReplaceTempView("documents")
    got = spark.sql(sql).toPandas().sort_values("doc_id", ignore_index=True)
    spark.catalog.dropTempView("documents")

    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE documents AS SELECT range AS doc_id, "
        f"range % 997 + 1 AS n_chars FROM range({n})"
    )
    want = con.sql(sql).df().sort_values("doc_id", ignore_index=True)
    mism = (
        got["sample_key"].astype(float).values
        != want["sample_key"].astype(float).values
    ).sum()
    assert mism == 0, f"{mism} of {n} sample keys diverge between engines"
