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

# Completion-marker discipline (ADVICE r8): shared with every persisted
# index family since r10 — the canonical definitions live in
# operators/ivm.py; these aliases keep this module's historical internal
# names and public re-exports working.
from data_warehouse_product_mix_clustering_spark.operators.ivm import (  # noqa: F401
    COMMIT_MARKER,
    index_is_committed,
    mark_committed as _mark_committed,
    mark_dirty as _mark_dirty,
)


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
    # Persisted so the postings write and the stats sidecar share ONE
    # tokenize pass (the regex tokenizer over full text is the dominant
    # build cost; without the persist the stats agg re-tokenized the
    # whole corpus — review r8). MEMORY_AND_DISK: token arrays for a big
    # corpus spill rather than OOM.
    from pyspark import StorageLevel

    os.makedirs(index_dir, exist_ok=True)
    _mark_dirty(index_dir)
    # schema sidecar: the doc_id type, so a relation whose every bucket
    # was cleared by maintenance reads back typed-EMPTY instead of
    # failing schema inference (ivm.read_index_relation — review r10)
    from data_warehouse_product_mix_clustering_spark.operators.ivm import write_id_schema

    write_id_schema(
        index_dir, "doc_id", docs.schema["doc_id"].dataType.simpleString()
    )
    toks = docs.select("doc_id", tokens_expr.alias("__t")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        _build_postings_relations(toks, index_dir, n_buckets)
    finally:
        toks.unpersist()
    _mark_committed(index_dir)


def _build_postings_relations(toks, index_dir: str, n_buckets: int) -> None:
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
    written = read_postings(toks.sparkSession, index_dir)
    (
        written.groupBy("bucket", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(index_dir, "terms"))
    )
    # total_dl is stored alongside so the stats row is incrementally
    # maintainable (update_postings_index adds/subtracts per-doc lengths);
    # avgdl is derived but persisted for the read path's convenience.
    toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("__t")).cast("long").alias("total_dl"),
        F.avg(F.size("__t")).alias("avgdl"),
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "stats"))


def _doc_id_type(index_dir: str) -> str:
    from data_warehouse_product_mix_clustering_spark.operators.ivm import read_id_schema

    return read_id_schema(index_dir, "doc_id", "bigint")[1]


def read_postings(spark: SparkSession, index_dir: str) -> DataFrame:
    from data_warehouse_product_mix_clustering_spark.operators.ivm import read_index_relation

    return read_index_relation(
        spark,
        os.path.join(index_dir, "postings"),
        f"term string, doc_id {_doc_id_type(index_dir)}, dl int, tf long, bucket int",
    )


def read_terms(spark: SparkSession, index_dir: str) -> DataFrame:
    from data_warehouse_product_mix_clustering_spark.operators.ivm import read_index_relation

    return read_index_relation(
        spark,
        os.path.join(index_dir, "terms"),
        "bucket int, term string, df long",
    )


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
    if not terms:
        # F.col("term").isin() with zero args raises an opaque py4j error;
        # fail with the actual contract instead (ADVICE r8).
        raise ValueError("search_postings_index requires at least one query term")
    if not index_is_committed(index_dir):
        raise RuntimeError(
            f"postings index at {index_dir!r} has no {COMMIT_MARKER} marker "
            "(torn build/update) — rebuild it before serving searches"
        )
    buckets = sorted({term_bucket_py(t, n_buckets) for t in terms})
    post = read_postings(spark, index_dir).filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(*terms)
    )
    tdf = (
        read_terms(spark, index_dir)
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


def update_postings_index(
    spark: SparkSession,
    index_dir: str,
    diff: DataFrame,
    tokens_expr_of,
    id_col: str = "doc_id",
    text_field: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> dict[str, int]:
    """Maintain the index from a CDC change set (``sources/versioned.py::
    version_diff`` shape) instead of rebuilding it — cost O(changed docs'
    buckets), never O(corpus).

    The incremental-view-maintenance decomposition per changed document:
    its OLD tokens' postings leave, its NEW tokens' postings arrive; an
    index bucket is touched iff some old-or-new token hashes into it.
    Concretely:

    1. tokenize only the diff's old/new texts (|changes| docs, not the
       corpus) and derive the affected bucket set (≤ n_buckets — bounded,
       so collecting it is O(64), not O(data));
    2. rewrite ONLY those bucket partitions of ``postings/`` and
       ``terms/``: surviving rows (anti-join on the changed doc ids) plus
       the new postings, via dynamic partition overwrite — untouched
       buckets' files are never read or written;
    3. maintain the 1-row stats sidecar algebraically
       (n_docs ± adds/removes, total_dl ± per-doc lengths).

    An affected bucket that ends up EMPTY still has its stale partition
    directory cleared (dynamic overwrite only replaces partitions present
    in the written data); on a transactional table format that is
    ``replaceWhere``'s job — here the driver removes the orphan dirs, the
    documented local-parquet stand-in.

    ``tokens_expr_of``: column-expression factory (text column → array
    column), the SAME one the index was built with. Returns
    {'added': n, 'removed': n, 'changed': n, 'buckets_touched': n}.
    """
    import shutil

    d = diff.select(
        id_col,
        "change_type",
        F.col(f"__old.{text_field}").alias("__old_text"),
        F.col(f"__new.{text_field}").alias("__new_text"),
    ).localCheckpoint(eager=True)  # diff plans are 2 scans + a join; run once
    counts = {
        r["change_type"]: r["n"]
        for r in d.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    new_toks = d.filter(F.col("change_type").isin("added", "changed")).select(
        id_col, tokens_expr_of(F.col("__new_text")).alias("__t")
    )
    old_toks = d.filter(F.col("change_type").isin("removed", "changed")).select(
        id_col, tokens_expr_of(F.col("__old_text")).alias("__t")
    )
    new_postings = (
        new_toks.select(
            id_col, F.size("__t").alias("dl"), F.explode("__t").alias("term")
        )
        .groupBy("term", id_col, "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .withColumn("bucket", _term_bucket_col(F.col("term"), n_buckets))
    )
    touched = sorted(
        r.bucket
        for r in new_postings.select("bucket")
        .unionByName(
            old_toks.select(F.explode("__t").alias("term")).select(
                _term_bucket_col(F.col("term"), n_buckets).alias("bucket")
            )
        )
        .distinct()
        .collect()
    )
    # Everything above is read-only; from here the index is in-flux, so
    # drop the commit marker first and restore it only after the stats
    # write — a crash in between leaves a detectable torn index.
    _mark_dirty(index_dir)
    if touched:
        changed_ids = d.select(id_col)
        survivors = (
            read_postings(spark, index_dir)
            .filter(F.col("bucket").isin(touched))
            .join(changed_ids, id_col, "left_anti")
        )
        updated = survivors.select("term", id_col, "dl", "tf", "bucket").unionByName(
            new_postings.select("term", id_col, "dl", "tf", "bucket")
        )
        updated = updated.localCheckpoint(eager=True)  # feeds 2 writes + dir diff
        (
            updated.repartition("bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(os.path.join(index_dir, "postings"))
        )
        (
            updated.groupBy("bucket", "term")
            .agg(F.count(F.lit(1)).cast("long").alias("df"))
            .repartition("bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(os.path.join(index_dir, "terms"))
        )
        nonempty = {r.bucket for r in updated.select("bucket").distinct().collect()}
        for b in set(touched) - nonempty:
            for rel in ("postings", "terms"):
                shutil.rmtree(
                    os.path.join(index_dir, rel, f"bucket={b}"), ignore_errors=True
                )
    # stats: old row ⊕ the per-doc length delta
    old_stats = spark.read.parquet(os.path.join(index_dir, "stats")).first()
    delta = (
        new_toks.select(F.size("__t").alias("__dl"), F.lit(1).alias("__dn"))
        .unionByName(old_toks.select((-F.size("__t")).alias("__dl"), F.lit(-1).alias("__dn")))
        .agg(F.sum("__dl").alias("ddl"), F.sum("__dn").alias("dn"))
        .first()
    )
    n_docs = old_stats["n_docs"] + counts.get("added", 0) - counts.get("removed", 0)
    total_dl = old_stats["total_dl"] + (delta["ddl"] or 0)
    spark.createDataFrame(
        [(n_docs, total_dl, (total_dl / n_docs) if n_docs else None)],
        "n_docs long, total_dl long, avgdl double",
    ).write.mode("overwrite").parquet(os.path.join(index_dir, "stats"))
    # No explicit unpersist: Dataset.unpersist does NOT release
    # localCheckpoint blocks (review r11); d releases via ContextCleaner
    # once unreferenced.
    _mark_committed(index_dir)
    return {
        "added": counts.get("added", 0),
        "removed": counts.get("removed", 0),
        "changed": counts.get("changed", 0),
        "buckets_touched": len(touched),
    }
