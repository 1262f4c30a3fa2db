"""Streaming semantic-dedup corpus ingestion.

The continuous-ingestion loop an embedding corpus actually runs: a
file-source stream over a landing directory of embedding batches, each
micro-batch semantically deduped against the CORPUS-SO-FAR (the seed
corpus plus every earlier batch's survivors) with
``operators/similarity.py::semantic_dedup_incremental``, survivors
appended. The coarse codebook is fit ONCE on the seed corpus and frozen
for every batch — refitting per batch would cost a full corpus k-means
per micro-batch and reshuffle cell identities under already-ingested
rows (the same frozen-centers invariant the persisted IVF index's CDC
maintenance holds).

Idempotence discipline (the quarantine sink's, review r8): foreachBatch
is at-least-once, so survivors land partitioned by ``__batch_id`` with
dynamic partition overwrite — an uncommitted batch's replay sees the
same corpus-so-far prefix (later batches cannot have committed before
it under availableNow's sequential batches) and overwrites its own
partition with the same rows. The checkpoint makes committed batches
never replay, so a rerun with no new files appends nothing.

Scale: each micro-batch pays one batch-assign (broadcast centers), one
broadcast semi-join pruning the corpus to touched cells, and one
batch-bounded pair join — never a corpus self-join, never a refit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EMBEDDING_SCHEMA = "vec_id bigint, embedding array<float>"


def seed_corpus(spark: SparkSession, corpus_dir: str, seed_df: DataFrame) -> None:
    """Write the initial corpus relation (vec_id, embedding) the ingest
    loop grows. Overwrite: seeding is a one-time bootstrap."""
    seed_df.select("vec_id", "embedding").write.mode("overwrite").parquet(
        os.path.join(corpus_dir, "seed")
    )


def read_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """Corpus-so-far: the seed plus every ingested batch's survivors."""
    parts = [os.path.join(corpus_dir, "seed")]
    survivors = os.path.join(corpus_dir, "survivors")
    if os.path.exists(survivors):
        parts.append(survivors)
    out = None
    for p in parts:
        df = spark.read.schema(EMBEDDING_SCHEMA).parquet(p).select(
            "vec_id", "embedding"
        )
        out = df if out is None else out.unionByName(df)
    return out


def streaming_semantic_ingest(
    spark: SparkSession,
    landing_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    nlist: int = 8,
    threshold: float = 0.95,
    seed: int = 42,
    timeout_sec: int = 300,
) -> int:
    """One availableNow ingest run: every unseen landing file's rows are
    semantically deduped against the corpus-so-far and the survivors
    appended under ``corpus_dir/survivors/__batch_id=N``. Returns the
    number of micro-batches executed (0 = checkpoint says nothing new).

    The codebook is fit on the SEED corpus only (frozen thereafter);
    batches and the grown corpus both assign through the same frozen
    ``assign_to_centers`` expression, so a row's cell never changes
    after ingestion."""
    from data_warehouse_product_mix_clustering_spark.operators.similarity import (
        fit_ivf_codebook,
        semantic_dedup_incremental,
    )
    from data_warehouse_product_mix_clustering_spark.streaming.quarantine import BATCH_COL
    from data_warehouse_product_mix_clustering_spark.streaming.runner import run_available_now

    model, _ = fit_ivf_codebook(
        spark.read.schema(EMBEDDING_SCHEMA).parquet(
            os.path.join(corpus_dir, "seed")
        ),
        "vec_id",
        "embedding",
        nlist,
        seed,
    )
    centers = [
        (i, [float(x) for x in ctr])
        for i, ctr in enumerate(model.clusterCenters())
    ]
    survivors_dir = os.path.join(corpus_dir, "survivors")

    stream = (
        spark.readStream.schema(EMBEDDING_SCHEMA)
        # one landing file per micro-batch: each file dedups against a
        # corpus that includes every EARLIER file's survivors, which is
        # the sequential-ingest semantics the python twin tests pin
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        corpus = read_corpus(spark, corpus_dir)
        survivors = semantic_dedup_incremental(
            batch_df,
            corpus,
            nlist=nlist,
            threshold=threshold,
            seed=seed,
            centers=centers,
        )
        enriched = (
            batch_df.join(survivors.select("vec_id"), "vec_id", "left_semi")
            .withColumn(BATCH_COL, F.lit(batch_id))
        )
        (
            enriched.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BATCH_COL)
            .parquet(survivors_dir)
        )

    return run_available_now(stream, sink, checkpoint_dir, timeout_sec)
