"""Streaming quarantine ETL: a checkpointed file-source stream over a
dirty CSV landing directory, routed into TWO sinks — typed clean rows and
raw quarantined lines.

The operational composition of two existing pieces: the quarantine split
(sources/io.py::split_csv_quarantine — a pure projection, so the SAME
code serves batch and streaming) and the shared availableNow runner
(streaming/runner.py). Effectively-exactly-once across failures:
foreachBatch is at-least-once, so both sinks partition by ``__batch_id``
and each batch OVERWRITES its own partition (dynamic partition
overwrite) — a re-executed batch replaces its previous partial output
instead of appending duplicates. A rerun with no new files touches
nothing; a newly landed file is ingested alone. At 100 TB this is the
always-on feed shape — malformed producers cannot stall the pipeline,
and their evidence accumulates in the quarantine for replay after a fix.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_warehouse_product_mix_clustering_spark.sources.io import split_csv_quarantine
from data_warehouse_product_mix_clustering_spark.streaming.runner import run_available_now

BATCH_COL = "__batch_id"


# Every quarantine sink row is the offending raw line — the schema the
# empty-sink read path needs (read_sink(schema=...)).
QUARANTINE_SCHEMA = T.StructType([T.StructField("raw_line", T.StringType())])


def write_quarantine_batch(
    batch_df: DataFrame,
    batch_id: int,
    schema: T.StructType,
    clean_dir: str,
    quarantine_dir: str,
    header: bool = True,
    sep: str = ",",
) -> None:
    """Split one raw-text micro-batch and write both sinks idempotently.

    Module-level (not a closure) so the idempotence contract is unit-
    testable: running the same (batch_df, batch_id) twice leaves the
    sinks exactly as one run does, because each write replaces only its
    own ``__batch_id`` partition.
    """
    from data_warehouse_product_mix_clustering_spark.sources.io import FILE_COL

    # Stamp file identity BEFORE persisting: the header dedup is per-file,
    # and input_file_name() over a cached scan returns '' (file info is
    # gone once rows come from the InMemory relation). Only when the
    # splitter will consume it — for header=False feeds (the recommended
    # 100 TB shape) the per-row file-URI string would just inflate the
    # persisted batch (review r8).
    if header:
        batch_df = batch_df.withColumn(FILE_COL, F.input_file_name())
    batch_df.persist()
    try:
        clean, quarantined = split_csv_quarantine(batch_df, schema, header, sep)
        for df, path in ((clean, clean_dir), (quarantined, quarantine_dir)):
            (
                df.withColumn(BATCH_COL, F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(BATCH_COL)
                .parquet(path)
            )
    finally:
        batch_df.unpersist()


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
    """One availableNow run: ingest unseen CSV files, split, write both
    sinks. Returns the number of micro-batches executed (0 when the
    checkpoint says everything was already ingested); raises
    ``TimeoutError`` on an unfinished run (the uncommitted batch re-runs
    next time and overwrites its own partition — no duplicates).
    """
    raw = spark.readStream.text(os.path.abspath(in_dir))

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        write_quarantine_batch(
            batch_df, batch_id, schema, clean_dir, quarantine_dir, header, sep
        )

    return run_available_now(raw, sink, checkpoint_dir, timeout_sec)


def read_sink(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a sink directory back, without the internal batch column.

    A run whose every batch was empty on one side (fully clean feed →
    empty quarantine; fully dirty → empty clean sink) leaves a directory
    with no part files, which ``spark.read.parquet`` cannot infer a
    schema from. With ``schema`` (the sink's row schema, sans batch
    column) the common monitoring call returns an EMPTY DataFrame
    instead of crashing (review r9); without it the original
    AnalysisException propagates.
    """
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path).drop(BATCH_COL)
    except AnalysisException as e:
        from data_warehouse_product_mix_clustering_spark.sources.versioned import analysis_condition

        if schema is not None and analysis_condition(e) in (
            "PATH_NOT_FOUND",
            "UNABLE_TO_INFER_SCHEMA",
        ):
            return spark.createDataFrame([], schema)
        raise
