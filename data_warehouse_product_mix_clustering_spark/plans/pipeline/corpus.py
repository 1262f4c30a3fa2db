"""Corpus-shaping queries: shard packing to a token budget, quality
curriculum ordering, per-source sampling caps, per-language size
profiling, sharded publish, and the raw per-source mixture weights.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.functions.numeric import (
    ratio_round,
    sql_ratio_round,
)
from data_warehouse_product_mix_clustering_spark.functions.text import (
    sql_bpe_tokens,
    sql_fingerprint,
    sql_quality_score,
    sql_tokens,
    sql_word_ngrams,
    quality_score,
    tokens,
)
from data_warehouse_product_mix_clustering_spark.operators.dedup import (
    shingle_sets,
)
from data_warehouse_product_mix_clustering_spark.operators.packing import (
    pack_shards,
)
from data_warehouse_product_mix_clustering_spark.plans.registry import register
from data_warehouse_product_mix_clustering_spark.sources.registry import table
from data_warehouse_product_mix_clustering_spark.plans.pipeline.contamination import (
    CONTAM_THRESHOLD,
    EVAL_MOD,
)


SHARD_BUDGET = 4096  # tokens per shard


@register(
    "shard_packing",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, CAST(len({sql_tokens("text")}) AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    // {SHARD_BUDGET} AS BIGINT) AS shard_id
        FROM toks
    """,
)
def shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack docs into ~4096-token shards in doc_id order.

    The oracle states the semantics as one global window cumsum; the Spark
    plan computes the SAME prefix sum distributed (operators/packing.py:
    range partition → partition-local running totals → driver exclusive
    scan of ≤P partition totals). No single-partition sort at any scale.
    """
    docs = table(spark, "documents", sf_dir).select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    return pack_shards(
        docs, order_col="doc_id", weight_col="n_tokens", budget=SHARD_BUDGET
    ).select("doc_id", "n_tokens", "shard_id")


_QUALITY_CTE = f"""
    WITH toks AS (
        SELECT doc_id, {sql_tokens("text")} AS t FROM documents
    ),
    scored AS (
        SELECT doc_id,
               {sql_quality_score('t')} AS quality_score
        FROM toks WHERE len(t) > 0
    )
""".strip()


@register(
    "curriculum_stages",
    oracle=f"""
        {_QUALITY_CTE}
        SELECT doc_id, quality_score,
               CAST(ntile(4) OVER (ORDER BY quality_score DESC, doc_id)
                    AS BIGINT) AS stage
        FROM scored
    """,
)
def curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: quality quartiles, best-first (stage 1..4).

    Quality = the doc_quality score (stopword ratio + length saturation),
    rounded BEFORE ranking so the order is cross-engine deterministic
    (ties broken by doc_id — a total order).

    Scale note: ntile over a global order is a single-partition sort; at
    corpus scale the same staging comes from bucketing on approx quantile
    thresholds of the score (two scans, fully parallel). The exact-ntile
    formulation is kept here because it is oracle-checkable; the threshold
    variant trades exact quartile boundaries for scale.
    """
    docs = table(spark, "documents", sf_dir)
    t = docs.select("doc_id", tokens(F.col("text")).alias("t")).filter(
        F.size("t") > 0
    )
    scored = t.select(
        "doc_id",
        quality_score(F.col("t")).alias("quality_score"),
    )
    w = Window.orderBy(F.col("quality_score").desc(), F.col("doc_id"))
    return scored.withColumn("stage", F.ntile(4).over(w).cast("long"))


SOURCE_CAP = 5


@register(
    "per_source_sample",
    oracle=f"""
        WITH ranked AS (
            SELECT doc_id, source,
                   CAST(row_number() OVER (
                        PARTITION BY source
                        ORDER BY md5(text), doc_id) AS BIGINT) AS rk
            FROM documents
        )
        SELECT doc_id, source, rk FROM ranked WHERE rk <= {SOURCE_CAP}
    """,
)
def per_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source sampling cap (<=5 docs/source).

    Source-mix rebalancing without an RNG: rank docs within each source by
    md5(text) — a stable, uniform, engine-agnostic shuffle key — and keep
    the first 5. Same sample on every run and every engine; one
    shuffle on source, the window's sort is per-source (no global order).
    """
    docs = table(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("text").cast("binary")), F.col("doc_id")
    )
    return (
        docs.select(
            "doc_id", "source", F.row_number().over(w).cast("long").alias("rk")
        )
        .filter(F.col("rk") <= SOURCE_CAP)
    )


@register(
    "lang_token_percentiles",
    oracle=f"""
        WITH toks AS (
            SELECT lang, CAST(len({sql_tokens("text")}) AS DOUBLE) AS nt
            FROM documents
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               {sql_ratio_round("quantile_cont(nt, 0.5)")} AS median_tokens,
               {sql_ratio_round("quantile_cont(nt, 0.9)")} AS p90_tokens
        FROM toks
        GROUP BY lang
    """,
)
def lang_token_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-count distribution: exact median and p90.

    Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``); at 100 TB swap to ``percentile_approx`` (KLL-style
    mergeable sketch) — the exact form is kept because it oracle-checks.
    """
    docs = table(spark, "documents", sf_dir)
    t = docs.select(
        "lang", F.size(tokens(F.col("text"))).cast("double").alias("nt")
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        ratio_round(F.expr("percentile(nt, 0.5)")).alias("median_tokens"),
        ratio_round(F.expr("percentile(nt, 0.9)")).alias("p90_tokens"),
    )


PUBLISH_BUDGET = 2048


@register(
    "training_corpus_sharded",
    oracle=f"""
        WITH keep AS (
            SELECT doc_id, lang, text,
                   row_number() OVER (PARTITION BY {sql_fingerprint("text")}
                                      ORDER BY doc_id) AS rn
            FROM documents
        ), tk AS (
            SELECT doc_id, lang, {sql_tokens("text")} AS t,
                   {sql_bpe_tokens("text")} AS bt
            FROM keep WHERE rn = 1
        ), scored AS (
            SELECT doc_id, lang,
                   CAST(len(bt) AS BIGINT) AS n_tokens,
                   {sql_quality_score('t')} AS quality_score
            FROM tk WHERE len(t) > 0
        ), corpus AS (
            SELECT doc_id, n_tokens FROM scored
            WHERE lang = 'en' AND quality_score >= 0.45
              AND n_tokens BETWEEN 10 AND 5000
              AND doc_id % {EVAL_MOD} <> 0
        ), ash AS (
            SELECT doc_id,
                   unnest(list_distinct({sql_word_ngrams(sql_tokens("text"), 3)})) AS shingle
            FROM documents
        ), ev AS (
            SELECT DISTINCT shingle FROM ash WHERE doc_id % {EVAL_MOD} = 0
        ), contam AS (
            SELECT doc_id
            FROM (
                SELECT doc_id,
                       count(*) AS n,
                       count(*) FILTER (shingle IN (SELECT shingle FROM ev)) AS ns
                FROM ash WHERE doc_id % {EVAL_MOD} <> 0
                GROUP BY doc_id
            )
            WHERE {sql_ratio_round("ns * 1.0 / n")} >= {CONTAM_THRESHOLD}
        ), survivors AS (
            SELECT doc_id, n_tokens FROM corpus
            WHERE doc_id NOT IN (SELECT doc_id FROM contam)
        )
        SELECT doc_id, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                        ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    // {PUBLISH_BUDGET} AS BIGINT) AS shard_id
        FROM survivors
    """,
)
def training_corpus_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE corpus publish pipeline, one composed plan:

    exact dedup → language filter → quality gate → token budget →
    benchmark-contamination screen (eval docs held out, overlapping train
    docs dropped) → token-budget shard packing of the survivors. Every
    stage is an operator proven individually in this registry; this query
    holds the composition to a single end-to-end oracle — the shape a
    training-data job actually ships.
    """
    from data_warehouse_product_mix_clustering_spark.plans.text import training_corpus

    tc = training_corpus(spark, sf_dir).filter(F.col("doc_id") % EVAL_MOD != 0)
    sh = shingle_sets(table(spark, "documents", sf_dir), "doc_id", "text", n=3)
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    ev = sh.filter(is_eval).select("shingle").distinct()
    tr = sh.filter(~is_eval)
    sizes = tr.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__n"))
    shared = (
        tr.join(F.broadcast(ev), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__ns"))
    )
    contaminated = (
        sizes.join(shared, "doc_id", "inner")
        .filter(ratio_round(F.col("__ns") / F.col("__n")) >= CONTAM_THRESHOLD)
        .select("doc_id")
    )
    survivors = tc.join(contaminated, "doc_id", "left_anti").select(
        "doc_id", "n_tokens"
    )
    return pack_shards(
        survivors, order_col="doc_id", weight_col="n_tokens", budget=PUBLISH_BUDGET
    ).select("doc_id", "n_tokens", "shard_id")


# Per-source token accounting shared by BOTH mixture queries — one
# Spark helper + one SQL CTE (review r12 #5: the block had been
# copy-pasted, so a change to the token accounting could silently
# desynchronize the two mixtures' observed_share).
_PER_SRC_CTE = f"""
    WITH toks AS (
        SELECT source, CAST(len({sql_tokens("text")}) AS BIGINT) AS n_tokens
        FROM documents
    ), per_src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        FROM toks GROUP BY source
    )
""".strip()


def _per_source_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, total_tokens) — the mixture queries' shared base."""
    docs = table(spark, "documents", sf_dir)
    return (
        docs.select("source", F.size(tokens(F.col("text"))).alias("__nt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__nt").cast("long").alias("total_tokens"),
        )
    )


@register(
    "source_mixture_weights",
    oracle=f"""
        {_PER_SRC_CTE}
        SELECT source, n_docs, total_tokens,
               {sql_ratio_round("CAST(total_tokens AS DOUBLE) / sum(total_tokens) OVER ()")}
                   AS observed_share,
               {sql_ratio_round(
                   "(1.0 / count(*) OVER ()) /"
                   " (CAST(total_tokens AS DOUBLE) / sum(total_tokens) OVER ())"
               )} AS uniform_weight
        FROM per_src
    """,
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture accounting: per-source token share + resampling weight.

    The mixture-balancing step of a pretraining data recipe: measure each
    source's observed token share, then emit the multiplicative sampling
    weight that would equalize the mixture (target share / observed share;
    generalizing to any target vector is a broadcast join away). One scan +
    one tiny groupBy; the share/weight window runs over |sources| rows on a
    single partition — dimension-sized by definition, not a scale concern.
    """
    per_src = _per_source_tokens(spark, sf_dir)
    w = Window.partitionBy()
    obs = F.col("total_tokens").cast("double") / F.sum("total_tokens").over(w)
    return per_src.select(
        "source",
        "n_docs",
        "total_tokens",
        ratio_round(obs).alias("observed_share"),
        ratio_round((F.lit(1.0) / F.count(F.lit(1)).over(w)) / obs).alias(
            "uniform_weight"
        ),
    )


