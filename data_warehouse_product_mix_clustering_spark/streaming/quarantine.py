"""Streaming quarantine ETL: a checkpointed file-source stream over a
dirty CSV landing directory, routed into TWO sinks — typed clean rows and
raw quarantined lines.

The operational composition of two existing pieces: the quarantine split
(sources/io.py::split_csv_quarantine — a pure projection, so the SAME
code serves batch and streaming) and the incremental foreachBatch pattern
(streaming/incremental.py). The checkpoint makes ingestion exactly-once
across reruns: a rerun with no new files appends nothing to either sink,
and a newly landed file is ingested alone. At 100 TB this is the
always-on feed shape — malformed producers cannot stall the pipeline, and
their evidence accumulates in the quarantine for replay after a fix.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from data_warehouse_product_mix_clustering_spark.sources.io import split_csv_quarantine


def streaming_csv_quarantine_etl(
    spark: SparkSession,
    in_dir: str,
    schema: T.StructType,
    clean_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    header: bool = True,
    sep: str = ",",
    timeout_sec: int = 300,
) -> int:
    """One availableNow run: ingest unseen CSV files, split, append both
    sinks. Returns the number of micro-batches executed (0 when the
    checkpoint says everything was already ingested).

    The split runs once per micro-batch on a persisted raw batch (two
    sinks consume it), so each input file is read exactly once per
    lifetime ingestion.
    """
    raw = spark.readStream.text(os.path.abspath(in_dir))
    n_batches = 0

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        batch_df.persist()
        try:
            clean, quarantined = split_csv_quarantine(batch_df, schema, header, sep)
            clean.write.mode("append").parquet(clean_dir)
            quarantined.write.mode("append").parquet(quarantine_dir)
        finally:
            batch_df.unpersist()

    q = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
    return n_batches


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read a sink directory back; empty DataFrame-shaped error surfaces
    as an AnalysisException (caller decides whether absence is ok)."""
    return spark.read.parquet(path)
