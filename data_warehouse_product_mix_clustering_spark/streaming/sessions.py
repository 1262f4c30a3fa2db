"""Custom stateful streaming operator: gap-based session windows.

The batch twin lives in plans/events.py (``events_sessions``, pure window
functions). This module is the Structured Streaming version the reference
never had (SURVEY §2.10 — new capability): per-user session state kept in
``applyInPandasWithState`` with an event-time timeout, so sessions close
when the watermark passes ``last_event + gap``.

An availableNow replay of the whole table emits every session exactly once
(the final watermark closes all state), which lets unit tests compare the
streaming operator's output against the batch sessionization — the same
oracle-by-equivalence trick as events_stream_hourly.

Semantics notes:
- Gap comparisons use EXACT MICROSECONDS, matching the batch twin AND
  the DuckDB oracle's ``<= INTERVAL 30 MINUTE`` (plans/events.py
  differenced unix_micros; review r8 — the earlier floored-seconds
  convention silently disagreed with the oracle for gaps inside
  (1800 s, 1801 s), a latent boundary divergence on both engines'
  otherwise-identical green data).
- Late (within-watermark) cross-batch events merge into the open session
  when within the gap of its bounds (extending session_start to the min).
  Events more than the gap BEFORE the open session belong to an
  already-emitted past: they mini-sessionize among themselves within the
  batch (so two late events of one past session emit as ONE session), and
  a late chain that climbs to within the gap of a live event folds into
  the open session; only a genuinely isolated late chain emits standalone
  — the best a single-open-session state can do without unbounded
  buffering (a previously-emitted session is never retracted/extended).
- Event-time arithmetic round-trips through tz-naive pandas values and is
  only correct because the engine pins spark.sql.session.timeZone=UTC
  (session.py); a DST session timezone would shift ambiguous local times.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

GAP_SECONDS = 30 * 60
GAP_US = GAP_SECONDS * 1_000_000


def _session_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events into per-user session state.

    Emits a session row whenever a gap > GAP_SECONDS closes one, or when
    the state times out (watermark passed last_event + gap).
    """
    (user_id,) = key
    out_rows: list[tuple] = []

    def emit(s):
        out_rows.append(
            (
                user_id,
                pd.Timestamp(s[0], unit="us"),
                pd.Timestamp(s[1], unit="us"),
                int(s[2]),
                float(s[3]),
            )
        )

    if state.hasTimedOut:
        if state.exists:
            emit(state.get)
            state.remove()
    else:
        cur = list(state.get) if state.exists else None
        ts_all = []
        for pdf in batches:
            if len(pdf):
                us = pd.to_datetime(pdf["ts"]).astype("int64") // 1000
                ts_all.extend(zip(us.tolist(), pdf["value"].astype(float).tolist()))
        ts_all.sort()
        # Late arrivals (more than the gap BEFORE the open session's
        # reach) mini-sessionize among THEMSELVES — two late events of
        # one past session merge like the batch twin would (review r9) —
        # and a chain that climbs to within the gap of a live event
        # folds into the open session instead of emitting standalone.
        late = None
        for ts_us, value in ts_all:
            if cur is not None and cur[0] - ts_us > GAP_US:
                if late is None:
                    late = [ts_us, ts_us, 1, value]
                elif ts_us - late[1] > GAP_US:
                    emit(late)
                    late = [ts_us, ts_us, 1, value]
                else:
                    late[1] = ts_us
                    late[2] += 1
                    late[3] += value
                continue
            if late is not None:
                if ts_us - late[1] <= GAP_US:
                    # the chain bridges to this event: one session
                    cur[0] = min(cur[0], late[0])
                    cur[2] += late[2]
                    cur[3] += late[3]
                else:
                    emit(late)
                late = None
            if cur is None:
                cur = [ts_us, ts_us, 0, 0.0]
            elif ts_us - cur[1] > GAP_US:
                emit(cur)
                cur = [ts_us, ts_us, 0, 0.0]
            cur[0] = min(cur[0], ts_us)
            cur[1] = max(cur[1], ts_us)
            cur[2] += 1
            cur[3] += value
        if late is not None:
            emit(late)
        if cur is not None:
            state.update(tuple(cur))
            # Clamp to just past the current watermark: a session whose
            # last_event + gap already fell behind it must still set a
            # VALID timeout (setTimeoutTimestamp raises on a timestamp
            # below the watermark, killing the query — review r9); it
            # then times out on the next batch, which is exactly "the
            # watermark passed last_event + gap".
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(cur[1] // 1000 + GAP_SECONDS * 1000, wm + 1)
            )

    if out_rows:
        yield pd.DataFrame(
            out_rows,
            columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
        )


def streaming_sessions(events_stream: DataFrame) -> DataFrame:
    """Gap-sessionize a watermarked event stream (custom stateful operator).

    State partitions by user (one shuffle); each user's state is a single
    open session tuple — constant memory per key, watermark-driven cleanup.
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_streaming_sessions(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 300
) -> DataFrame:
    """availableNow replay of the events table through the sessionizer."""
    from data_warehouse_product_mix_clustering_spark.streaming.events import (
        run_available_now,
        stream_events,
    )

    return run_available_now(
        spark,
        streaming_sessions(stream_events(spark, sf_dir, watermark="0 seconds")),
        "events_stream_sessions_sink",
        timeout_sec=timeout_sec,
        output_mode="append",
    )
