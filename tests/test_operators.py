"""Operator-level unit tests: properties the oracle can't express —
LSH recall vs the exact baseline, hash determinism, edge-case inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.operators.dedup import simhash64
from data_warehouse_product_mix_clustering_spark.operators.similarity import brute_force_topk, lsh_topk
from data_warehouse_product_mix_clustering_spark.functions.text import tokens, word_ngrams

from conftest import SF_SMOKE


def test_lsh_recall_vs_brute_force(spark):
    """LSH top-k must find ≥80% of the true top-5 neighbors on the fixture."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in lsh_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall:.2f} < 0.8"


def test_simhash_deterministic(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    a = {(r.doc_id, r.simhash) for r in simhash64(docs, "doc_id", "text").collect()}
    b = {(r.doc_id, r.simhash) for r in simhash64(docs, "doc_id", "text").collect()}
    assert a == b and len(a) == 50


def test_word_ngrams_short_docs(spark):
    """Docs shorter than n must yield an empty shingle array, not garbage."""
    df = spark.createDataFrame(
        [("one",), ("one two",), ("one two three",), ("  ",)], ["text"]
    ).select(tokens(F.col("text")).alias("t"))
    got = df.select(word_ngrams("t", 2).alias("g")).collect()
    assert [r.g for r in got] == [[], ["one two"], ["one two", "two three"], []]


def test_media_frame_features_deterministic(spark):
    """The fake decoder must be pure: same payload -> same frames/features."""
    from data_warehouse_product_mix_clustering_spark.operators.media import frame_features

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(40)
    a = frame_features(docs, "doc_id", "text").collect()
    b = frame_features(docs, "doc_id", "text").collect()
    key = lambda r: (r.doc_id, r.frame_index)
    assert sorted(map(repr, a)) == sorted(map(repr, b))
    pngs = [r for r in a if r.media_format == "png"]
    assert pngs and all(r.frame_index == 0 for r in pngs)  # png = single frame
    assert all(len(r.features) == 8 for r in a)


def test_approx_stats_error_bounds(spark):
    """HLL++/percentile_approx must land within tight bounds of exact."""
    from data_warehouse_product_mix_clustering_spark.plans.events import events_approx_stats
    from pyspark.sql import functions as F

    from data_warehouse_product_mix_clustering_spark.sources.registry import table

    ev = table(spark, "events", SF_SMOKE)
    exact = {
        r.event_type: (r.users, r.med)
        for r in ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.median("value").alias("med"),
        )
        .collect()
    }
    approx = {
        r.event_type: (r.approx_users, r.approx_median_value)
        for r in events_approx_stats(spark, SF_SMOKE).collect()
    }
    for et, (users, med) in exact.items():
        au, amed = approx[et]
        assert abs(au - users) / users < 0.05, f"{et}: HLL err {au} vs {users}"
        assert abs(amed - med) / max(abs(med), 1) < 0.05, f"{et}: median err"


def test_salted_aggregate_matches_unsalted(spark):
    """Salted two-stage agg must equal the plain groupBy exactly."""
    from data_warehouse_product_mix_clustering_spark.operators.skew import salted_aggregate
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    plain = {
        r.l_returnflag: (r.n, round(r.s, 2), r.mn, round(r.av, 6))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("l_quantity").alias("n"),
            F.sum("l_quantity").alias("s"),
            F.min("l_quantity").alias("mn"),
            F.avg("l_quantity").alias("av"),
        )
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, round(r.s, 2), r.mn, round(r.av, 6))
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            {
                "n": ("l_quantity", "count"),
                "s": ("l_quantity", "sum"),
                "mn": ("l_quantity", "min"),
                "av": ("l_quantity", "avg"),
            },
        ).collect()
    }
    assert plain == salted
