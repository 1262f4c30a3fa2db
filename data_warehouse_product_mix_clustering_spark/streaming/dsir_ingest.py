"""Streaming DSIR model maintenance: the importance-resampling models
kept fresh by the always-on feed, never by a corpus re-read.

The fifth leg of the landing-feed story (CSV quarantine →
streaming/quarantine.py; semantic dedup → streaming/ingest.py; document
gates → streaming/corpus_ingest.py; frozen-model scoring →
streaming/model_scoring.py; this: MODEL MAINTENANCE). A file-source
stream over a landing directory of document batches folds each
micro-batch into the incremental DSIR model store
(operators/dsir.py::ingest_dsir_batch) — O(batch) work, one ≤4096-row
delta partition per batch — and optionally compacts the delta log in
the loop every ``compact_every`` batches, so a store that ingests for
months keeps an O(buckets) footprint without ever pausing the feed.

This is a pure COMPOSITION of three audited pieces — the landing-feed
drain (run_available_now), the exact-integer incremental store, and the
generation-marker compaction — and its contract is that the seams add
nothing: the streamed-maintained models equal the batch-built models
over the union of all batches EXACTLY, with or without a mid-stream
compaction (pinned by plans/pipeline/dsir.py::stream_dsir_ingest_audit).

Idempotence across all three failure windows (the at-least-once
discipline the family shares):
- replay of an UN-compacted batch → dynamic partition overwrite
  rewrites exactly its own delta with identical integers;
- replay of a FOLDED batch → the generation marker's
  ``compacted_through`` turns the ingest into a no-op (its counts live
  inside the folded partition);
- a compaction interrupted at any point → the marker flips last, so
  readers see the old log or the new, and the next sink invocation's
  compact call sweeps any orphan generation.
Structured Streaming guarantees a replayed micro-batch reuses its
original batch_id and new batches get strictly larger ids — exactly
the monotone-id contract the store requires.

The TARGET slice per batch is the engine's rule-based corpus gate
(plans/pipeline/dsir.py::_dsir_target) evaluated on the batch alone —
membership is per-doc pure, so batching cannot move it.

Scale: per micro-batch one (id, bucket) shuffle of the BATCH plus two
≤4096-row aggregates; a compaction is one read of the ≤4096 × n_batches
log. The corpus is never re-read; no state store grows with history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_product_mix_clustering_spark.streaming.corpus_ingest import DOC_SCHEMA
from data_warehouse_product_mix_clustering_spark.streaming.runner import run_available_now


def dsir_ingest_sink(
    spark: SparkSession,
    store_dir: str,
    batch_id: int,
    batch_docs: DataFrame,
    compact_every: int | None = None,
) -> None:
    """Fold one micro-batch into the store; compact in the loop every
    ``compact_every`` batches. Idempotent under replay in every window
    (module docstring) — a re-delivered batch either rewrites its own
    delta identically or no-ops against the marker, and the trailing
    compact degenerates to a no-op fold of a single partition.

    This in-loop shape IS the store's single-writer deployment
    contract (ADVICE r17 #1): ingest and compaction run sequentially
    in one sink, so they never overlap. Readers of a store compacted
    on this cadence must materialize within one compaction interval of
    planning (``compact_dsir_store`` retention docstring) — size
    ``compact_every`` to the slowest concurrent reader, or leave it
    None and compact out-of-band during a feed pause."""
    from data_warehouse_product_mix_clustering_spark.operators.dsir import (
        compact_dsir_store,
        ingest_dsir_batch,
    )
    from data_warehouse_product_mix_clustering_spark.plans.pipeline.dsir import _dsir_target

    ingest_dsir_batch(store_dir, batch_id, batch_docs, _dsir_target(batch_docs))
    if compact_every and (batch_id + 1) % compact_every == 0:
        compact_dsir_store(spark, store_dir)


def streaming_dsir_ingest(
    spark: SparkSession,
    landing_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    compact_every: int | None = None,
) -> int:
    """Drain the landing directory through the model-maintenance sink;
    returns the number of micro-batches executed (0 = checkpoint says
    nothing new)."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        # one landing file per micro-batch — the family's sequential-
        # slice contract; a replayed batch_id re-reads exactly one file
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        dsir_ingest_sink(spark, store_dir, batch_id, batch_df, compact_every)

    return run_available_now(stream, sink, checkpoint_dir)
