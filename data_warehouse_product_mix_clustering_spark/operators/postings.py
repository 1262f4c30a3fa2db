"""Materialized inverted index for BM25 retrieval: a term-bucketed
postings table on parquet, plus the seek-shaped search over it.

The ad-hoc scorer (plans/text.py::bm25_scores_df) pushes the query-term
filter inside one corpus pass — right when the corpus is scanned anyway.
A search SERVICE runs many queries against the same corpus, and there the
100 TB plan is the classic one: tokenize once, persist the postings list
(term, doc_id, tf, dl) partitioned by a hash bucket of the term, and
answer each query by reading ONLY the query terms' buckets — partition
pruning turns retrieval into a seek of O(query postings) bytes instead of
a corpus scan. Spark-first mapping:

- the index is plain parquet ``partitionBy(bucket)`` — no custom storage;
  Catalyst's partition pruning (visible as ``PartitionFilters`` in the
  scan node) is the seek;
- the bucket function is ``int(md5(term)[:8], 16) % n_buckets`` so the
  DRIVER can compute a query's buckets in Python without touching the
  cluster, and any engine (DuckDB included) can recompute it identically;
- per-term document frequencies are a second, tiny bucketed table and the
  corpus-level (n_docs, avgdl) scalars a 1-row sidecar, so scoring needs
  no full-index aggregate at query time;
- scoring itself reuses the exact BM25 expression shape of the ad-hoc
  plan, so indexed and ad-hoc retrieval are value-identical and share one
  oracle.

Reference anchor: the reference app has no search service; this is part
of the beyond-reference training-data/retrieval surface (SURVEY §6), kept
Spark-idiomatic (DataFrame + layout, zero UDFs).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64


def term_bucket_py(term: str, n_buckets: int = DEFAULT_BUCKETS) -> int:
    """Driver-side twin of the Spark bucket expression (md5-based so both
    sides — and any oracle engine — agree byte-for-byte)."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def _term_bucket_col(term_col, n_buckets: int):
    return (
        F.conv(F.substring(F.md5(term_col), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).cast("int")


def build_postings_index(
    docs: DataFrame,
    index_dir: str,
    tokens_expr,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Tokenize ``docs`` (doc_id, text) once and persist the three index
    relations under ``index_dir``:

    - ``postings/`` — (term, doc_id, tf, dl) partitioned by ``bucket``;
      repartitioned BY the bucket column before the write so each shuffle
      task emits only its own partition directories (≈1 file per bucket,
      not tasks×buckets small files — the small-file problem is the
      classic index-build failure at scale);
    - ``terms/`` — (term, df) per term, same bucketing;
    - ``stats/`` — the 1-row (n_docs, avgdl) corpus scalars.

    One corpus scan feeds all three (the tokenized projection is reused;
    postings aggregate (term, doc) once, df folds the postings, stats
    fold the docs). Incremental maintenance at scale composes with
    sources/versioned.py: re-index changed docs' buckets from a CDC diff.
    """
    toks = docs.select("doc_id", tokens_expr.alias("__t"))
    postings = (
        toks.select(
            "doc_id", F.size("__t").alias("dl"), F.explode("__t").alias("term")
        )
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn("bucket", _term_bucket_col(F.col("term"), n_buckets))
    )
    postings.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(os.path.join(index_dir, "postings"))
    # df folds the just-written postings (re-read beats recompute: the
    # scan is columnar and already bucket-partitioned)
    written = read_postings(docs.sparkSession, index_dir)
    (
        written.groupBy("bucket", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(index_dir, "terms"))
    )
    toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg(F.size("__t")).alias("avgdl"),
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "stats"))


def read_postings(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, "postings"))


def search_postings_index(
    spark: SparkSession,
    index_dir: str,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """BM25 top-k over the materialized index, touching ONLY the query
    terms' buckets.

    The bucket list is computed driver-side (``term_bucket_py``) and
    lands as a literal IN-filter on the partition column — Catalyst
    prunes every other bucket directory before a single row is read
    (pinned by a PartitionFilters plan test). The tiny per-term df rows
    and the 1-row stats broadcast into the scoring join; the final top-k
    is a partial TakeOrderedAndProject. Identical scoring expression to
    ``bm25_scores_df`` ⇒ identical values, same oracle.
    """
    buckets = sorted({term_bucket_py(t, n_buckets) for t in terms})
    post = read_postings(spark, index_dir).filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(*terms)
    )
    tdf = (
        spark.read.parquet(os.path.join(index_dir, "terms"))
        .filter(F.col("bucket").isin(buckets) & F.col("term").isin(*terms))
        .select("term", "df")
    )
    stats = spark.read.parquet(os.path.join(index_dir, "stats"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    term_score = (
        idf
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        post.join(F.broadcast(tdf), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score) + F.lit(1e-9), 6).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(top_k)
