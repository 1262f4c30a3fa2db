"""Streaming-operator tests: the custom stateful sessionizer must agree
with the batch window-function sessionization on a full replay."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.plans.events import events_sessions
from data_warehouse_product_mix_clustering_spark.sources.registry import table
from data_warehouse_product_mix_clustering_spark.streaming.sessions import GAP_SECONDS, run_streaming_sessions

from conftest import SF_SMOKE


def test_streaming_sessions_match_batch(spark):
    # Key on (user, start, n_events); sums compare with a tolerance below —
    # keying on a rounded float would false-mismatch on half-cent values
    # (batch is HALF_UP+nudge rounded, a raw Python round is banker's).
    batch_rows = events_sessions(spark, SF_SMOKE).collect()
    batch = {(r.user_id, r.session_start, r.n_events): r for r in batch_rows}
    stream_rows = run_streaming_sessions(spark, SF_SMOKE).collect()
    stream = {(r.user_id, r.session_start, r.n_events): r for r in stream_rows}
    extra = set(stream) - set(batch)
    assert not extra, f"streaming emitted sessions batch never saw: {list(extra)[:3]}"
    for key in set(stream) & set(batch):
        assert abs(stream[key].sum_value - batch[key].sum_value) < 0.005 + 1e-9, (
            f"session value sum diverged for {key}"
        )

    # Sessions still OPEN at end-of-stream legitimately never emit: the
    # watermark stops at max(ts), before their last_event + gap timeout.
    max_ts = table(spark, "events", SF_SMOKE).agg(F.max("ts")).first()[0]
    cutoff = max_ts - datetime.timedelta(seconds=GAP_SECONDS)
    missing = set(batch) - set(stream)
    for key in missing:
        r = batch[key]
        last_event = r.session_start + datetime.timedelta(seconds=r.duration_sec)
        assert last_event >= cutoff, (
            f"closed session missing from streaming output: {key} "
            f"(last_event={last_event}, cutoff={cutoff})"
        )
    # and the overwhelming majority must have closed + matched
    assert len(missing) <= max(1, len(batch) // 100)


def test_incremental_etl_is_idempotent(spark, tmp_path):
    """Second availableNow run with an intact checkpoint ingests nothing."""
    from data_warehouse_product_mix_clustering_spark.streaming.incremental import (
        incremental_events_etl,
        read_warehouse_events,
    )
    from data_warehouse_product_mix_clustering_spark.sources.registry import table

    out = str(tmp_path / "wh_events")
    ckpt = str(tmp_path / "ckpt")
    n1 = incremental_events_etl(spark, SF_SMOKE, out, ckpt)
    assert n1 >= 1
    count1 = read_warehouse_events(spark, out).count()
    assert count1 == table(spark, "events", SF_SMOKE).count()

    n2 = incremental_events_etl(spark, SF_SMOKE, out, ckpt)
    count2 = read_warehouse_events(spark, out).count()
    assert count2 == count1, "re-run duplicated rows despite checkpoint"


def test_streaming_quarantine_etl_splits_and_is_idempotent(spark, tmp_path):
    """Dirty CSV landing dir → clean + quarantine sinks, exactly-once:
    a rerun ingests nothing, a newly landed file is ingested alone, and
    every non-header line ever landed sits in exactly one sink."""
    from pyspark.sql import types as T

    from data_warehouse_product_mix_clustering_spark.streaming.quarantine import (
        read_sink,
        streaming_csv_quarantine_etl,
    )

    in_dir = tmp_path / "landing"
    in_dir.mkdir()
    (in_dir / "a.csv").write_text("id,qty\n1,10\n2,bad\n3,30\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("qty", T.LongType())]
    )
    clean_dir = str(tmp_path / "clean")
    quar_dir = str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "ckpt")

    n1 = streaming_csv_quarantine_etl(spark, str(in_dir), schema, clean_dir, quar_dir, ckpt)
    assert n1 >= 1
    assert {(r.id, r.qty) for r in read_sink(spark, clean_dir).collect()} == {(1, 10), (3, 30)}
    assert [r.raw_line for r in read_sink(spark, quar_dir).collect()] == ["2,bad"]

    # rerun: checkpoint says nothing new -> sinks unchanged
    streaming_csv_quarantine_etl(spark, str(in_dir), schema, clean_dir, quar_dir, ckpt)
    assert read_sink(spark, clean_dir).count() == 2
    assert read_sink(spark, quar_dir).count() == 1

    # a newly landed file is ingested alone
    (in_dir / "b.csv").write_text("id,qty\n4,40\nnoise,row,extra\n")
    streaming_csv_quarantine_etl(spark, str(in_dir), schema, clean_dir, quar_dir, ckpt)
    assert {(r.id, r.qty) for r in read_sink(spark, clean_dir).collect()} == {
        (1, 10), (3, 30), (4, 40)
    }
    assert {r.raw_line for r in read_sink(spark, quar_dir).collect()} == {
        "2,bad", "noise,row,extra"
    }


def test_quarantine_batch_write_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-executing the SAME micro-batch
    must leave both sinks exactly as a single execution does (each batch
    overwrites its own __batch_id partition, never appends twice)."""
    from pyspark.sql import types as T

    from data_warehouse_product_mix_clustering_spark.streaming.quarantine import (
        read_sink,
        write_quarantine_batch,
    )

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("qty", T.LongType())]
    )
    batch = spark.createDataFrame([("1,10",), ("2,bad",), ("3,30",)], ["value"])
    clean_dir = str(tmp_path / "clean")
    quar_dir = str(tmp_path / "quar")

    for _ in range(2):  # the retry: same batch_df, same batch_id
        write_quarantine_batch(batch, 7, schema, clean_dir, quar_dir, header=False)
    assert {(r.id, r.qty) for r in read_sink(spark, clean_dir).collect()} == {
        (1, 10), (3, 30)
    }
    assert [r.raw_line for r in read_sink(spark, quar_dir).collect()] == ["2,bad"]

    # a different batch id appends alongside, untouched by batch 7's retry
    batch2 = spark.createDataFrame([("4,40",)], ["value"])
    write_quarantine_batch(batch2, 8, schema, clean_dir, quar_dir, header=False)
    write_quarantine_batch(batch, 7, schema, clean_dir, quar_dir, header=False)
    assert read_sink(spark, clean_dir).count() == 3
    assert read_sink(spark, quar_dir).count() == 1


def test_streaming_quarantine_per_file_headers(spark, tmp_path):
    """header=True through the STREAMING path drops exactly one header
    per landing file (file identity is stamped before the batch persist —
    a cached scan loses input_file_name); a mid-file header-equal line
    quarantines instead of vanishing."""
    from pyspark.sql import types as T

    from data_warehouse_product_mix_clustering_spark.streaming.quarantine import (
        read_sink,
        streaming_csv_quarantine_etl,
    )

    land = tmp_path / "land"
    land.mkdir()
    (land / "a.csv").write_text("id,qty\n1,10\nid,qty\n2,20\n")
    (land / "b.csv").write_text("id,qty\n3,30\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("qty", T.LongType())]
    )
    streaming_csv_quarantine_etl(
        spark, str(land), schema, str(tmp_path / "clean"),
        str(tmp_path / "quar"), str(tmp_path / "ckpt"), header=True,
    )
    clean = sorted(
        (r.id, r.qty) for r in read_sink(spark, str(tmp_path / "clean")).collect()
    )
    assert clean == [(1, 10), (2, 20), (3, 30)]
    quar = [r.raw_line for r in read_sink(spark, str(tmp_path / "quar")).collect()]
    assert quar == ["id,qty"]  # ONE imposter; both real headers dropped
