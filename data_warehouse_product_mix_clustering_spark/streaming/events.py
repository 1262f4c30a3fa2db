"""Structured Streaming over the ``events`` table.

The reference has no streaming surface (SURVEY §2.10 — its only recurrence
is a monthly batch cron, reference Dockerfile:37); this module is the
new-capability path: file-source streams, event-time tumbling windows with
watermarks, and an availableNow batch-replay runner whose result equals the
batch plan — so the streaming operator shares the batch query's SQL oracle.
"""

from __future__ import annotations

import os
import hashlib
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from data_warehouse_product_mix_clustering_spark.sources.registry import (
    normalize_events_ts,
)


def _events_file_schema(spark: SparkSession, sf_dir: str) -> StructType:
    """Schema for the events stream, derived from the actual parquet file.

    readStream requires a declared schema; hardcoding one (round 1-3) broke
    when the testdata's ``ts`` encoding changed from TIMESTAMP(NANOS) to
    timestamp[us]. Deriving it from a batch read of the same file keeps the
    stream schema in lockstep with the data; normalize_events_ts then
    type-gates the ts fixup for either encoding.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(
        os.path.join(os.path.abspath(sf_dir), "events.parquet")
    ).schema


def hourly_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1 h event-time window × event_type: count + value stats.

    Works on both batch and streaming DataFrames (the plan is identical;
    streaming adds watermark-gated state cleanup).
    """
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-9), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_events(
    spark: SparkSession, sf_dir: str, watermark: str | None = "2 hours"
) -> DataFrame:
    """File-source stream of the events table with an event-time watermark.

    FileStreamSource watches a *directory*; the testdata table is a single
    read-only file, so we stage a symlink dir under /tmp (one per sf_dir) —
    at production scale the source would be the landing directory itself.
    ``watermark=None`` skips the watermark for callers that rename the
    event-time column first (re-defining a watermark is disallowed).
    """
    from data_warehouse_product_mix_clustering_spark.sources.registry import _ensure_worker_imports

    # Streaming micro-batch tasks unpickle worker kernels by module
    # reference; ship the package before the first batch regardless of
    # which reader path the caller came through (table() also does this,
    # but a stream can start without any batch table read).
    _ensure_worker_imports(spark)
    schema = _events_file_schema(spark, sf_dir)
    stage = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_stream_"
        f"{hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]}",
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    _relink(link, os.path.join(os.path.abspath(sf_dir), "events.parquet"))
    out = normalize_events_ts(spark.readStream.schema(schema).parquet(stage))
    return out.withWatermark("ts", watermark) if watermark else out


def _relink(link: str, target: str) -> None:
    """(Re)point a staging symlink ATOMICALLY. ``os.path.exists`` FOLLOWS
    links, so a dangling link from a prior run reads as absent and a bare
    ``os.symlink`` raises FileExistsError; a remove+create pair opens a
    window where a concurrent driver (or an active FileStreamSource
    listing) sees no link at all (review r9). So: no-op when the link
    already points at the target, else create under a unique temp name
    and ``os.replace`` over — the link is always either old or new."""
    try:
        if os.readlink(link) == target:
            return
    except OSError:
        pass  # absent, dangling name, or not a symlink — (re)create below
    tmp = f"{link}.tmp.{os.getpid()}"
    try:
        os.remove(tmp)
    except FileNotFoundError:
        pass
    os.symlink(target, tmp)
    os.replace(tmp, link)


def await_available_now(q, timeout_sec: int, timeout_msg: str) -> None:
    """Shared await/raise/stop contract for every availableNow run (the
    memory-sink variant here and the foreachBatch variant in runner.py —
    one definition so the timeout semantics cannot drift; review r9)."""
    try:
        finished = q.awaitTermination(timeout_sec)
        if not finished:
            raise TimeoutError(timeout_msg)
    finally:
        q.stop()


def run_available_now(
    spark: SparkSession,
    stream_df: DataFrame,
    name: str,
    timeout_sec: int = 300,
    output_mode: str = "complete",
) -> DataFrame:
    """Replay the whole stream (Trigger.AvailableNow) into a memory sink.

    Complete output mode: every window is emitted once the replay drains,
    so the result set equals the equivalent batch query — which makes
    streaming plans oracle-checkable. Append mode is for row-emitting
    stateful operators (dedup) that cannot run in complete mode.
    """
    from data_warehouse_product_mix_clustering_spark.sources.registry import _ensure_worker_imports

    _ensure_worker_imports(spark)  # see stream_events — same contract
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    await_available_now(
        q,
        timeout_sec,
        f"availableNow replay '{name}' still running after "
        f"{timeout_sec}s — refusing to return a partial memory table",
    )
    return spark.table(name)


def stream_attribution(
    spark: SparkSession,
    sf_dir: str,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream time-bounded join: views attributed to purchases.

    The remaining core streaming operator beside windows/sessions/dedup:
    two event-time streams joined on user with a range condition
    (``view_ts ∈ [purchase_ts − window, purchase_ts]``). Watermarks on
    BOTH sides + the time bound let Spark expire join state — without
    them a stream-stream join buffers forever. Emits one row per
    qualifying (view, purchase) pair in append mode; the result equals
    the batch range join, so the plan is oracle-checkable.
    """
    views = (
        stream_events(spark, sf_dir, watermark=None)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_event"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        stream_events(spark, sf_dir, watermark=None)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_event"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = views.join(
        purchases,
        F.expr(
            f"""v_user = p_user
                AND view_ts <= purchase_ts
                AND view_ts >= purchase_ts - INTERVAL {attribution_window}"""
        ),
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_event",
        "purchase_event",
        F.expr(
            "(unix_micros(purchase_ts) - unix_micros(view_ts)) div 1000000"
        ).alias("gap_sec"),
    )


def stream_events_duplicated(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """The events stream under AT-LEAST-ONCE delivery: every file twice.

    Stages a landing dir with two links to the same source file — the
    redelivery/replay case a real ingestion pipeline must absorb — then
    applies watermarked streaming dedup on the event key:
    ``dropDuplicates("event_id", "ts")``. Including the event-time column
    in the key lets the watermark expire state, so memory is bounded by
    the watermark horizon, not the stream's lifetime key cardinality.
    """
    schema = _events_file_schema(spark, sf_dir)
    stage = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_stream_dup_{hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]}",
    )
    os.makedirs(stage, exist_ok=True)
    src = os.path.join(os.path.abspath(sf_dir), "events.parquet")
    for link_name in ("events_copy1.parquet", "events_copy2.parquet"):
        link = os.path.join(stage, link_name)
        _relink(link, src)
    return (
        normalize_events_ts(spark.readStream.schema(schema).parquet(stage))
        .withWatermark("ts", watermark)
        .dropDuplicates(["event_id", "ts"])
    )


def stream_static_enrich(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-static join: the live event stream enriched with a STATIC
    user-tier dimension computed by a batch query over the warehouse.

    The static side is stateless for the join — Spark re-resolves it per
    micro-batch and (dimension-sized) broadcasts it, so no join state
    accumulates; only the downstream windowed agg carries watermarked
    state. This is the standard "enrich events with a profile table"
    deployment shape, complementing the stream-stream attribution join.

    Tier = 'heavy' if the user's lifetime event count exceeds the global
    average events-per-user, else 'light' — scale-free thresholds, so the
    same definition holds at every SF.
    """
    from data_warehouse_product_mix_clustering_spark.sources.registry import table as _table

    per_user = _table(spark, "events", sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    avg_n = per_user.agg(F.avg("__n").alias("__avg_n"))
    tiers = (
        per_user.crossJoin(F.broadcast(avg_n))
        .select(
            "user_id",
            F.when(F.col("__n") > F.col("__avg_n"), F.lit("heavy"))
            .otherwise(F.lit("light"))
            .alias("tier"),
        )
    )
    ev = stream_events(spark, sf_dir, watermark=watermark)
    enriched = ev.join(F.broadcast(tiers), "user_id")
    return (
        enriched.groupBy(F.window("ts", "1 hour").alias("w"), "tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-9), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "tier", "n_events", "sum_value")
    )
