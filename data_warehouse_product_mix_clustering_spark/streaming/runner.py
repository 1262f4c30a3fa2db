"""Shared availableNow foreachBatch runner.

One harness for every incremental pipeline (streaming/incremental.py,
streaming/quarantine.py): checkpointed, drains everything available, then
stops. A run that exceeds ``timeout_sec`` raises instead of silently
stopping mid-ingestion and reporting success — ``awaitTermination``'s
boolean is the only signal Spark gives, and ignoring it turns a stall
into phantom "completed" runs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def run_available_now(
    stream: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    timeout_sec: int = 300,
) -> int:
    """Run ``sink`` per micro-batch until the source is drained.

    Returns the number of micro-batches executed (0 = checkpoint says
    nothing new). Raises ``TimeoutError`` when the run does not finish
    within ``timeout_sec`` — the in-flight batch is uncommitted and will
    re-run next invocation, so sinks must be batch-idempotent (see
    streaming/quarantine.py for the batch_id-keyed pattern).
    """
    from data_warehouse_product_mix_clustering_spark.sources.registry import _ensure_worker_imports

    # foreachBatch sinks may run Arrow kernels (semantic ingest, model
    # scoring) whose module references executor workers must resolve
    # regardless of the driver's cwd — same contract as
    # streaming/events.py::run_available_now.
    _ensure_worker_imports(stream.sparkSession)
    n_batches = 0

    def counting_sink(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        sink(batch_df, batch_id)

    q = (
        stream.writeStream.foreachBatch(counting_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    from data_warehouse_product_mix_clustering_spark.streaming.events import await_available_now

    await_available_now(
        q,
        timeout_sec,
        f"availableNow run exceeded {timeout_sec}s; checkpoint holds "
        "the uncommitted batch — rerun after raising timeout_sec",
    )
    return n_batches
