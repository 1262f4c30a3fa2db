"""Event-analytics queries over ``events`` (new-capability surface).

Tumbling/sliding event-time windows, gap-based sessionization, funnel
conversion, and JSON-props extraction — each a pure DataFrame plan with a
DuckDB oracle. ``events_stream_hourly`` runs the tumbling agg through
Structured Streaming (availableNow replay) and shares the batch oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.functions.numeric import ratio_round, sql_ratio_round
from data_warehouse_product_mix_clustering_spark.plans.registry import register
from data_warehouse_product_mix_clustering_spark.sources.registry import table
from data_warehouse_product_mix_clustering_spark.streaming.events import (
    hourly_agg,
    run_available_now,
    stream_events,
)

_HOURLY_SQL = """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value) + 1e-9, 2) AS sum_value
    FROM events GROUP BY 1, 2
"""


@register("events_tumbling_hourly", oracle=_HOURLY_SQL, headline=True)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1 h window × event_type: count + sum(value).

    ``F.window`` epoch-aligns hour buckets exactly like date_trunc; partial
    aggregation makes this one small shuffle at any scale.
    """
    return hourly_agg(table(spark, "events", sf_dir))


@register("events_stream_hourly", oracle=_HOURLY_SQL)
def events_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same tumbling agg through Structured Streaming.

    availableNow replay + complete output = batch-equivalent results, so
    the streaming plan is held to the same SQL oracle (SURVEY §2.10 — new
    capability; the reference has no streaming).
    """
    out = run_available_now(
        spark, hourly_agg(stream_events(spark, sf_dir)), "events_stream_hourly_sink"
    )
    return out.select("window_start", "event_type", "n_events", "sum_value")


@register(
    "events_stream_attribution",
    oracle="""
        SELECT v.user_id,
               v.event_id AS view_event,
               p.event_id AS purchase_event,
               CAST(date_sub('second', v.ts, p.ts) AS BIGINT) AS gap_sec
        FROM events v
        JOIN events p
          ON v.user_id = p.user_id
         AND v.event_type = 'view' AND p.event_type = 'purchase'
         AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def events_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream time-bounded join (view→purchase attribution ≤ 1 h).

    Two watermarked event-time streams joined on user with a range bound —
    the join state expires at the watermark horizon, so memory is bounded
    at any stream length. availableNow replay in append mode must emit
    exactly the batch range join's pairs, which the SQL oracle enforces.
    """
    from data_warehouse_product_mix_clustering_spark.streaming.events import stream_attribution

    return run_available_now(
        spark,
        stream_attribution(spark, sf_dir),
        "events_stream_attribution_sink",
        output_mode="append",
    )


@register(
    "events_stream_dedup",
    oracle="""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value) + 1e-9, 2) AS sum_value
        FROM events GROUP BY event_type
    """,
)
def events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup under at-least-once delivery, held to the batch oracle.

    The stream replays every file TWICE (staged duplicate links — the
    redelivery case); watermarked ``dropDuplicates`` on (event_id, ts)
    must collapse the copies so the downstream per-type rollup equals the
    batch query over the single-copy table. Dedup emits rows (append
    mode), so the rollup runs as a batch agg over the drained sink.
    """
    from data_warehouse_product_mix_clustering_spark.streaming.events import stream_events_duplicated

    deduped = run_available_now(
        spark,
        stream_events_duplicated(spark, sf_dir),
        "events_stream_dedup_sink",
        output_mode="append",
    )
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value") + F.lit(1e-9), 2).alias("sum_value"),
    )


@register(
    "events_sliding_qtr_hour",
    oracle="""
        WITH slid AS (
            SELECT time_bucket(INTERVAL 15 MINUTE, ts)
                       - k * INTERVAL 15 MINUTE AS window_start,
                   value
            FROM events CROSS JOIN (SELECT unnest(range(4)) AS k)
        )
        SELECT window_start,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value) + 1e-9, 2) AS sum_value
        FROM slid GROUP BY 1
    """,
)
def events_sliding_qtr_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1 h window, 15 min slide: each event lands in 4 windows.

    Spark's window(ts, 1h, 15m) materializes the 4 assignments map-side;
    the oracle mirrors it with an explicit 0..3 offset cross join.
    """
    ev = table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-9), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@register(
    "events_sessions",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
            FROM events
        ), numbered AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM flagged
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               min(ts) AS session_start,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(date_sub('second', min(ts), max(ts)) AS BIGINT) AS duration_sec,
               round(sum(value) + 1e-9, 2) AS sum_value
        FROM numbered GROUP BY user_id, session_seq
    """,
)
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min idle → new session), pure windows.

    lag → new-session flag → running sum = session id; one shuffle on
    user_id covers both windows and the final per-session rollup (the agg
    reuses the partitioning). The batch twin of streaming session windows.
    """
    ev = table(spark, "events", sf_dir)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(wo))
            <= 1800 * 1_000_000,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    # Same total order as the lag window: with ties on ts alone, session
    # numbering would be nondeterministic and could diverge from the oracle.
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    numbered = flagged.withColumn(
        "session_seq", F.sum("new_session").over(run).cast("long")
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        # duration = floor of the µs difference: DuckDB's date_sub counts
        # COMPLETE seconds between the endpoints; casting each endpoint to
        # long would floor them independently and disagree on sub-second gaps.
        F.expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000").alias(
            "duration_sec"
        ),
        F.round(F.sum("value") + F.lit(1e-9), 2).alias("sum_value"),
    )


@register(
    "events_funnel",
    oracle="""
        WITH stages AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
            FROM events GROUP BY user_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(count(t_view) AS BIGINT) AS viewed,
               CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
                   AS clicked_after_view,
               CAST(sum(CASE WHEN t_purchase > t_click AND t_click > t_view
                             THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
        FROM stages
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion by first-occurrence ordering.

    Conditional min per stage in ONE pass over events (no per-stage joins),
    then a global rollup — the scale-correct funnel shape.
    """
    ev = table(spark, "events", sf_dir)
    stages = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("viewed"),
        F.sum(
            F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0)
        ).alias("clicked_after_view"),
        F.sum(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            ).otherwise(0)
        ).alias("full_funnel"),
    )


@register(
    "events_props_stats",
    oracle=f"""
        SELECT event_type,
               {sql_ratio_round("avg(CAST(json_extract_string(props, '$.k') AS BIGINT))")}
                   AS avg_k,
               CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
                   AS max_k
        FROM events GROUP BY event_type
    """,
)
def events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-props extraction (semi-structured column → typed stats).

    get_json_object is JVM-side; no Python parses any row.
    """
    ev = table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        ratio_round(F.avg(k)).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "events_props_variant",
    oracle=f"""
        SELECT event_type,
               CAST(count(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k,
               CAST(median(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS DOUBLE) AS median_k,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k
        FROM events GROUP BY event_type
    """,
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT path: ``parse_json``
    encodes each document ONCE into the binary variant format, then
    ``variant_get`` extracts typed fields without re-parsing text — the
    engine-native semi-structured encoding (`events_props_stats` is the
    per-access ``get_json_object`` twin; at 100 TB, parse-once-read-many
    beats re-tokenizing the JSON string per extraction, and a variant
    column persisted in parquet shreds into typed subcolumns).

    DuckDB has no variant type, so the oracle states the same semantics
    over its JSON accessors — which is the point: the encoding changes,
    the answer must not.
    """
    ev = table(spark, "events", sf_dir)
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.median("k").cast("double").alias("median_k"),
        F.sum("k").alias("sum_k"),
    )


@register(
    "events_stream_enriched",
    oracle="""
        WITH per_user AS (
            SELECT user_id, count(*) AS n FROM events GROUP BY 1
        ), tiers AS (
            SELECT user_id,
                   CASE WHEN n > (SELECT avg(n) FROM per_user)
                        THEN 'heavy' ELSE 'light' END AS tier
            FROM per_user
        )
        SELECT date_trunc('hour', ts) AS window_start, tier,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value) + 1e-9, 2) AS sum_value
        FROM events e JOIN tiers t ON e.user_id = t.user_id
        GROUP BY 1, 2
    """,
)
def events_stream_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream broadcast-enriched with a
    batch-computed user-tier dimension, then windowed per tier.

    availableNow replay + complete output ⇒ batch-equivalent results, so
    the stream-static join is held to a full SQL hash oracle (the
    remaining core streaming join family beside the stream-stream
    attribution join). Watermarked agg state only — the static side is
    stateless and re-broadcast per micro-batch.
    """
    from data_warehouse_product_mix_clustering_spark.streaming.events import stream_static_enrich

    out = run_available_now(
        spark,
        stream_static_enrich(spark, sf_dir),
        "events_stream_enriched_sink",
    )
    return out.select("window_start", "tier", "n_events", "sum_value")


@register("events_stream_sessions")
def events_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming sessionization (applyInPandasWithState).

    Per-user session state with an event-time timeout; sessions emit when
    the watermark passes last_event + 30 min. Output is watermark-dependent
    (the final still-open session per user stays in state) ⇒ rows-only
    check; equivalence with the batch sessionization is unit-tested
    (tests/test_streaming.py).
    """
    from data_warehouse_product_mix_clustering_spark.streaming.sessions import run_streaming_sessions

    return run_streaming_sessions(spark, sf_dir)


@register(
    "stream_sessions_audit",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
            FROM events
        ), numbered AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM flagged
        ), sessions AS (
            SELECT user_id, session_seq, min(ts) AS session_start,
                   max(ts) AS session_end, count(*) AS n_events
            FROM numbered GROUP BY user_id, session_seq
        ), mx AS (SELECT max(ts) AS max_ts FROM events),
        open_s AS (
            SELECT count(*) AS n_open FROM sessions, mx
            WHERE epoch_us(max_ts) // 1000 <= epoch_us(session_end) // 1000 + 1800000
        )
        SELECT CAST((SELECT count(*) FROM sessions) AS BIGINT) AS n_batch,
               CAST((SELECT count(*) FROM sessions) - n_open AS BIGINT) AS n_stream,
               CAST(n_open AS BIGINT) AS n_open_final,
               CAST(0 AS BIGINT) AS n_unexplained,
               TRUE AS contract_pass
    FROM open_s
    """,
)
def stream_sessions_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciles streaming sessionization against the batch twin as a
    driver-attestable CONTRACT (the ``ann_recall_audit`` pattern).

    The streaming operator (``events_stream_sessions``) legitimately emits
    fewer sessions than the batch plan: a session whose last event lies
    within the 30 min gap of the stream's final watermark never times out,
    so its state is still open when the availableNow replay drains. This
    query runs BOTH plans and proves the delta is EXACTLY that set:

    - every streaming session matches a batch session on
      (user_id, session_start, n_events);
    - every batch session missing from the stream is still-open at the
      final watermark (``watermark_ms <= session_end_ms + gap_ms`` — the
      state-timeout fires only when the watermark passes last_event + gap,
      both held at Spark's millisecond watermark precision);
    - counts reconcile: n_batch − n_stream == n_open_final.

    The oracle derives the EXPECTED n_stream from batch data plus this
    watermark contract, so a streaming regression (dropped, duplicated, or
    mis-bucketed sessions) flips n_stream / n_unexplained / contract_pass
    and hash-mismatches the driver row.
    """
    from data_warehouse_product_mix_clustering_spark.streaming.sessions import run_streaming_sessions

    ev = table(spark, "events", sf_dir)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(wo))
            <= 1800 * 1_000_000,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = flagged.withColumn("session_seq", F.sum("new_session").over(run))
    sessions = numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    stream = run_streaming_sessions(spark, sf_dir)

    mx = ev.agg(F.max("ts").alias("max_ts"))
    classified = (
        sessions.crossJoin(F.broadcast(mx))
        .withColumn(
            "is_open",
            F.expr("unix_micros(max_ts) div 1000")
            <= F.expr("unix_micros(session_end) div 1000") + F.lit(1800000),
        )
        .join(
            stream.select(
                "user_id", "session_start", F.col("n_events").alias("s_n_events")
            ),
            ["user_id", "session_start"],
            "left",
        )
    )
    batch_side = classified.agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.sum(F.when(F.col("is_open"), 1).otherwise(0)).alias("n_open_final"),
        F.sum(
            F.when(
                # a batch session is unexplained if it's absent from the
                # stream without being open, or present with a different
                # event count
                (F.col("s_n_events").isNull() & ~F.col("is_open"))
                | (F.col("s_n_events").isNotNull()
                   & (F.col("s_n_events") != F.col("n_events"))),
                1,
            ).otherwise(0)
        ).alias("n_unexpl_batch"),
    )
    stream_count = stream.agg(F.count(F.lit(1)).alias("n_stream"))
    stream_only = stream.join(
        sessions.select("user_id", "session_start"),
        ["user_id", "session_start"],
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("n_stream_only"))

    unexplained = F.col("n_unexpl_batch") + F.col("n_stream_only")
    return (
        batch_side.crossJoin(stream_count)
        .crossJoin(stream_only)
        .select(
            F.col("n_batch").cast("long").alias("n_batch"),
            F.col("n_stream").cast("long").alias("n_stream"),
            F.col("n_open_final").cast("long").alias("n_open_final"),
            unexplained.cast("long").alias("n_unexplained"),
            (
                (unexplained == 0)
                & (F.col("n_batch") - F.col("n_stream") == F.col("n_open_final"))
            ).alias("contract_pass"),
        )
    )


@register("events_approx_stats")
def events_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates: the opt-in scale path for exact count-distinct.

    HyperLogLog++ cardinality (bounded relative error, mergeable partial
    state — no Expand blow-up) and t-digest-style quantiles. SURVEY A2/A7
    note: exact by default, approx as the explicit 100 TB escape hatch.
    Sketch outputs are engine-specific ⇒ rows-only; error bounds vs exact
    are unit-tested (tests/test_operators.py).
    """
    ev = table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_median_value"),
        F.percentile_approx("value", 0.95, 10000).alias("approx_p95_value"),
    )


@register(
    "events_approx_stats_audit",
    oracle="""
        SELECT DISTINCT event_type,
               TRUE AS hll_within_envelope,
               TRUE AS median_within_envelope,
               TRUE AS p95_within_envelope
        FROM events
    """,
)
def events_approx_stats_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-attested sketch-error gate for ``events_approx_stats`` (the
    ``value_segments_audit`` pattern): the oracle pins the CONTRACT — every
    per-type sketch lands inside its error envelope — while Spark measures
    the actual approx-vs-exact deltas. A sketch regression (changed rsd,
    broken HLL merge, percentile accuracy drift) flips the row red.

    Envelopes (generous multiples of the configured bounds, measured ~0
    error at sf0.001-0.01 so a breach is a real regression, not noise):
    - HLL++ (rsd=0.02): |approx − exact| / exact ≤ 0.06 (3×rsd);
    - percentile_approx (accuracy 10000 ⇒ rank error 1e-4): the exact
      rank bracket [rank<, rank≤] of the approx value must straddle the
      target quantile within ±0.01.
    """
    ev = table(spark, "events", sf_dir)
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("__approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("__amed"),
        F.percentile_approx("value", 0.95, 10000).alias("__ap95"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("__exact_users"),
        F.count(F.lit(1)).alias("__n"),
    )
    # One pass over events computes the rank brackets of both approx
    # quantile values: broadcast the 5-row approx relation back onto the
    # stream and count values strictly-below / at-or-below each cut.
    # Joins are null-SAFE (ADVICE r6): a NULL event_type group survives
    # groupBy on both engines, so a null-unsafe equi-join here would drop
    # it from the Spark side while the oracle's SELECT DISTINCT keeps it —
    # an opaque hash mismatch instead of a red contract value.
    ranked = (
        ev.join(
            F.broadcast(approx.withColumnRenamed("event_type", "__et")),
            F.col("event_type").eqNullSafe(F.col("__et")),
        )
        .groupBy("event_type")
        .agg(
            F.sum((F.col("value") < F.col("__amed")).cast("long")).alias("__lt_med"),
            F.sum((F.col("value") <= F.col("__amed")).cast("long")).alias("__le_med"),
            F.sum((F.col("value") < F.col("__ap95")).cast("long")).alias("__lt_p95"),
            F.sum((F.col("value") <= F.col("__ap95")).cast("long")).alias("__le_p95"),
        )
    )
    eps = 0.01
    joined = approx.join(
        exact.withColumnRenamed("event_type", "__et1"),
        F.col("event_type").eqNullSafe(F.col("__et1")),
    ).join(
        ranked.withColumnRenamed("event_type", "__et2"),
        F.col("event_type").eqNullSafe(F.col("__et2")),
    )
    # Degenerate groups (zero non-null user_ids → division by NULL/0, or
    # all-NULL values → NULL rank ratios) must fail LOUDLY as FALSE, not
    # propagate NULL into the contract booleans.
    return joined.select(
        "event_type",
        F.coalesce(
            F.abs(F.col("__approx_users") - F.col("__exact_users"))
            / F.col("__exact_users")
            <= 0.06,
            F.lit(False),
        ).alias("hll_within_envelope"),
        F.coalesce(
            (F.col("__lt_med") / F.col("__n") <= 0.5 + eps)
            & (F.col("__le_med") / F.col("__n") >= 0.5 - eps),
            F.lit(False),
        ).alias("median_within_envelope"),
        F.coalesce(
            (F.col("__lt_p95") / F.col("__n") <= 0.95 + eps)
            & (F.col("__le_p95") / F.col("__n") >= 0.95 - eps),
            F.lit(False),
        ).alias("p95_within_envelope"),
    )


@register(
    "events_session_window",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
            FROM events
        ), numbered AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM flagged
        )
        SELECT user_id, min(ts) AS session_start,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value) + 1e-9, 2) AS sum_value
        FROM numbered GROUP BY user_id, session_seq
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessions via the NATIVE ``session_window`` operator.

    The built-in twin of ``events_sessions``' manual window formulation —
    one operator, merge-on-overlap semantics. Session windows are
    half-open ([start, last+gap)), so an event exactly 30 min after its
    predecessor starts a NEW session (strict <) — the oracle mirrors that
    boundary, where the manual plan's rule is inclusive (<=); both rules
    are pinned so the distinction is explicit, not accidental.
    """
    ev = table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-9), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_stream_topk",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        )
        SELECT window_start, event_type, n_events, CAST(rk AS BIGINT) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY window_start
                ORDER BY n_events DESC, event_type) AS rk
            FROM hourly
        )
        WHERE rk <= 2
    """,
)
def events_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-window top-k: the 2 busiest event types per hour.

    Rank-over-stream is the standard two-stage pattern: the stateful
    windowed count runs IN the stream (watermarked, incremental), the
    top-k rank runs over the drained aggregate — per-window rows are
    dimension-sized, so the rank window never touches raw events. Complete
    replay ⇒ results equal the batch window query, enforced by the oracle.
    """
    out = run_available_now(
        spark,
        hourly_agg(stream_events(spark, sf_dir)),
        "events_stream_topk_sink",
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        out.select("window_start", "event_type", "n_events")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 2)
    )


@register(
    "events_freq_items_audit",
    oracle="""
        SELECT TRUE AS candidates_complete,
               TRUE AS candidate_bound_ok,
               TRUE AS heavy_set_nonempty
    """,
)
def events_freq_items_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-attested frequent-items (heavy hitters) gate — completes the
    sketch family next to the HLL/percentile (`events_approx_stats_audit`)
    and runtime-bloom guards.

    ``df.stat.freqItems`` implements Karp-Shenker-Papadimitriou: ONE pass,
    O(1/support) state per partition, merged associatively — the 100 TB
    way to find hot keys without a full groupBy. Its guarantee is
    one-sided: every item with frequency > support·n IS returned (false
    positives allowed, bounded by ~1/support candidates). The audit pins
    exactly that contract on ``event_type`` (5 values at ~20% share each,
    scale-free across SFs, so the heavy set is never empty and the check
    never goes vacuous):

    - candidates_complete: the exact heavy set (count > support·n,
      computed distributed) ⊆ the sketch's candidates;
    - candidate_bound_ok: ≤ 1/support candidates returned;
    - heavy_set_nonempty: the gate is actually exercising the guarantee.
    """
    support = 0.1
    ev = table(spark, "events", sf_dir)
    cands = (
        ev.select("event_type").stat.freqItems(["event_type"], support)
        .collect()[0][0]
    )
    total = ev.select(F.count(F.lit(1)).alias("__n"))
    heavy = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("__c"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("__c") > support * F.col("__n"))
    )
    in_cands = F.coalesce(F.col("event_type").isin(list(cands)), F.lit(False))
    return heavy.agg(
        # Empty heavy set ⊆ anything — vacuously TRUE, so the min over
        # zero rows coalesces to True and only heavy_set_nonempty goes
        # red, correctly naming the actual failure (vacuousness).
        F.coalesce(F.min(in_cands), F.lit(True)).alias("candidates_complete"),
        F.lit(len(cands) <= int(1 / support)).alias("candidate_bound_ok"),
        (F.count(F.lit(1)) > 0).alias("heavy_set_nonempty"),
    )


@register(
    "events_daily_anomalies",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        robust AS (
            SELECT event_type,
                   CAST(median(n) AS DOUBLE) AS med,
                   CAST(mad(n) AS DOUBLE) AS mad
            FROM daily GROUP BY 1
        )
        SELECT d.event_type, CAST(d.day AS TIMESTAMP) AS day, d.n,
               round(med + 1e-9, 6) AS med_daily,
               round(mad + 1e-9, 6) AS mad_daily
        FROM daily d JOIN robust USING (event_type)
        WHERE abs(d.n - med) > 3 * mad AND mad > 0
    """,
)
def events_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: days whose event count deviates from the
    per-type median by more than 3×MAD — the monitoring rollup that pages
    someone, as a distributed plan.

    Median/MAD (not mean/stddev) so a single spike cannot drag its own
    baseline. The fact aggregates to (type, day) ONCE — tiny relative to
    events — and the 5-row robust stats broadcast back onto it; both
    medians are exact (`F.median`). The 3×MAD threshold compares exact
    integers against a median-derived double computed identically on both
    engines (medians of integers are .0 or .5 exactly), so the flag set
    cannot flip; `mad > 0` guards the degenerate all-identical-days type.
    """
    ev = table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = daily.groupBy(F.col("event_type").alias("__et")).agg(
        F.median("n").alias("__med")
    )
    dev = daily.join(F.broadcast(med), daily.event_type == F.col("__et")).withColumn(
        "__adev", F.abs(F.col("n") - F.col("__med"))
    )
    robust = dev.groupBy(F.col("event_type").alias("__et2")).agg(
        F.first("__med").alias("med"), F.median("__adev").alias("mad")
    )
    return (
        daily.join(F.broadcast(robust), daily.event_type == F.col("__et2"))
        .filter((F.abs(F.col("n") - F.col("med")) > 3 * F.col("mad")) & (F.col("mad") > 0))
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            "n",
            F.round(F.col("med") + F.lit(1e-9), 6).alias("med_daily"),
            F.round(F.col("mad") + F.lit(1e-9), 6).alias("mad_daily"),
        )
    )


@register(
    "events_rolling_dau",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
            FROM events WHERE user_id IS NOT NULL
        ),
        spine AS (
            SELECT DISTINCT event_type, day FROM pairs
        )
        SELECT s.event_type, CAST(s.day AS TIMESTAMP) AS day,
               CAST(count(DISTINCT p.user_id) AS BIGINT) AS trailing_7d_users
        FROM spine s
        JOIN pairs p
          ON p.event_type = s.event_type
         AND p.day BETWEEN s.day - INTERVAL 6 DAY AND s.day
        GROUP BY 1, 2
    """,
)
def events_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type over a trailing 7-day window, one
    row per (type, active day) — the rolling-DAU product metric.

    DISTINCT-over-a-sliding-window has no native window function (frames
    count rows, not distinct values), so the shape is: collapse the fact
    to distinct (type, day, user) triples ONCE (the only fact-sized
    shuffle), then a broadcast range join of the tiny (type, day) spine
    back onto the triples — each triple lands in ≤ 7 windows — and an
    exact count-distinct per window. Cost: ~7×|daily-active pairs|,
    independent of raw event volume. At 100 TB the exact distinct of the
    last step is the first thing to trade away: per-day HLL sketches
    merged across the 7 window days give the same plan with mergeable
    state (`events_approx_stats_audit` pins that sketch family's error).
    """
    ev = table(spark, "events", sf_dir).filter(F.col("user_id").isNotNull())
    pairs = ev.select(
        "event_type", F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    # distinct aliases break the self-derived lineage ambiguity
    spine = pairs.select(
        F.col("event_type").alias("__stype"), F.col("day").alias("__sday")
    ).distinct()
    return (
        pairs.join(
            F.broadcast(spine),
            (F.col("event_type") == F.col("__stype"))
            & (F.col("day") >= F.col("__sday") - F.expr("INTERVAL 6 DAYS"))
            & (F.col("day") <= F.col("__sday")),
        )
        .groupBy("event_type", F.col("__sday").cast("timestamp").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("trailing_7d_users"))
    )


@register("events_rolling_dau_approx")
def events_rolling_dau_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day DAU via per-day HyperLogLog sketches — the 100 TB
    swap `events_rolling_dau`'s docstring promises.

    The exact plan re-counts distinct users per window, so each (type,
    day, user) triple is shuffled into ≤7 windows and the count-distinct
    state is the full user set per window. Here the fact collapses to ONE
    DataSketches HLL sketch per (type, day) — fixed 2^lgK bytes, built
    with map-side partial merge, never a user list — and each window then
    merges ≤7 sketches (`hll_union_agg`, associative + re-mergeable).
    Cost at scale: |days × types| sketch rows against |active pairs| for
    the exact plan; the sketch relation is small enough to DRIVE the range
    join broadcast the other way around. lgConfigK=12 ⇒ ~1.6% relative
    standard error; sketch bytes are engine-specific ⇒ rows-only, gated by
    `events_rolling_dau_approx_audit` (the `events_approx_stats_audit`
    error-envelope pattern).
    """
    ev = table(spark, "events", sf_dir).filter(F.col("user_id").isNotNull())
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("__sk"))
    spine = daily.select(
        F.col("event_type").alias("__stype"), F.col("day").alias("__sday")
    )
    return (
        daily.join(
            F.broadcast(spine),
            F.col("event_type").eqNullSafe(F.col("__stype"))
            & (F.col("day") >= F.col("__sday") - F.expr("INTERVAL 6 DAYS"))
            & (F.col("day") <= F.col("__sday")),
        )
        .groupBy("event_type", F.col("__sday").cast("timestamp").alias("day"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("__sk"))
            .cast("long")
            .alias("approx_trailing_7d_users")
        )
    )


@register(
    "events_rolling_dau_approx_audit",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT event_type, CAST(ts AS DATE) AS day
            FROM events WHERE user_id IS NOT NULL
        )
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
               TRUE AS hll_within_envelope
        FROM pairs GROUP BY 1
    """,
)
def events_rolling_dau_approx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-attested error gate for the sketch-based rolling DAU: every
    (type, day) window's HLL estimate must land within 6% of the exact
    count (3× the lgK=12 standard error ≈ 1.6%; measured error at
    sf0.001-0.01 is ~0 because the sketches stay in DataSketches' exact
    mode at these cardinalities — a breach is a regression, not noise).

    The oracle independently derives the per-type WINDOW COUNT from the
    raw events (so a dropped or duplicated window flips n_days, not just
    the boolean) and pins the envelope contract TRUE. Joins are null-safe
    and the booleans coalesce to FALSE so a null group or a lost join
    fails loudly (the r6 audit conventions).
    """
    exact = events_rolling_dau(spark, sf_dir)
    approx = events_rolling_dau_approx(spark, sf_dir).select(
        F.col("event_type").alias("__at"),
        F.col("day").alias("__ad"),
        "approx_trailing_7d_users",
    )
    joined = exact.join(
        approx,
        F.col("event_type").eqNullSafe(F.col("__at"))
        & F.col("day").eqNullSafe(F.col("__ad")),
        "full_outer",
    )
    within = (
        F.abs(F.col("approx_trailing_7d_users") - F.col("trailing_7d_users"))
        / F.col("trailing_7d_users")
        <= 0.06
    )
    return (
        joined.groupBy(F.coalesce(F.col("event_type"), F.col("__at")).alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.min(F.coalesce(within, F.lit(False))).alias("hll_within_envelope"),
        )
    )


@register(
    "events_user_streaks",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events WHERE user_id IS NOT NULL
        ),
        islands AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY day) AS INTEGER)
                       AS island
            FROM days
        ),
        streaks AS (
            SELECT user_id, island, CAST(count(*) AS BIGINT) AS streak_len
            FROM islands GROUP BY 1, 2
        )
        SELECT user_id,
               max(streak_len) AS longest_streak,
               CAST(sum(streak_len) AS BIGINT) AS n_active_days,
               CAST(count(*) AS BIGINT) AS n_streaks
        FROM streaks GROUP BY 1
    """,
)
def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's longest run of consecutive active
    days — the classic streak analytic (login streaks, SLA runs).

    The island trick: subtract the per-user day RANK from the day itself;
    consecutive days share the constant difference, a gap shifts it — so
    streaks fall out of two grouped aggregations with no self-join and no
    iteration. One shuffle on user_id serves the distinct, the rank
    window, and both rollups (the partitioning is reused end to end).
    """
    ev = table(spark, "events", sf_dir).filter(F.col("user_id").isNotNull())
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.sum("streak_len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@register(
    "events_multitouch_attribution",
    oracle="""
        WITH pairs AS (
            SELECT v.user_id, v.event_id AS view_event,
                   p.event_id AS purchase_event, p.value AS purchase_value
            FROM events v
            JOIN events p
              ON v.user_id = p.user_id
             AND v.event_type = 'view' AND p.event_type = 'purchase'
             AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
        ),
        weighted AS (
            SELECT user_id, view_event,
                   purchase_value / count(*) OVER (PARTITION BY purchase_event)
                       AS credited
            FROM pairs
        )
        SELECT user_id, view_event,
               CAST(count(*) AS BIGINT) AS n_purchases_touched,
               round(sum(credited) + 1e-9, 6) AS attributed_value
        FROM weighted GROUP BY 1, 2
    """,
)
def events_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase's value splits
    equally across the views that preceded it within 1 hour, then rolls
    up per view — the marketing report behind "which impressions earn
    credit".

    Shape: the time-bounded view⋈purchase range join (the same pair
    relation the streaming attribution query emits), a per-purchase
    count window to compute the 1/n split — partitioned on the purchase
    id, which the pair join's user_id shuffle does NOT provide, so this
    is the query family's one extra exchange, over pairs not events —
    and a final per-view rollup. The division happens BEFORE the sum on
    both engines (identical association), and the nudged rounding +
    integer counts keep the rollup hash-exact.
    """
    ev = table(spark, "events", sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_event"), F.col("ts").alias("__vts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("__puser"),
        F.col("event_id").alias("purchase_event"),
        F.col("ts").alias("__pts"),
        F.col("value").alias("purchase_value"),
    )
    pairs = views.join(
        purchases,
        (views.user_id == F.col("__puser"))
        & (F.col("__vts") <= F.col("__pts"))
        & (F.col("__vts") >= F.col("__pts") - F.expr("INTERVAL 1 HOUR")),
    )
    w = Window.partitionBy("purchase_event")
    weighted = pairs.select(
        "user_id",
        "view_event",
        (F.col("purchase_value") / F.count(F.lit(1)).over(w)).alias("credited"),
    )
    return weighted.groupBy("user_id", "view_event").agg(
        F.count(F.lit(1)).alias("n_purchases_touched"),
        F.round(F.sum("credited") + F.lit(1e-9), 6).alias("attributed_value"),
    )


@register(
    "events_markov_transitions",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ),
        counts AS (
            SELECT event_type AS from_type, next_type AS to_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM ordered WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               round(CAST(n AS DOUBLE)
                     / sum(n) OVER (PARTITION BY from_type) + 1e-9, 6) AS p
        FROM counts
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: P(next event type | current type) — the sequential-pattern
    summary behind next-action prediction and funnel diagnosis.

    One user_id shuffle serves the lead() window (ordered by (ts,
    event_id) — the repo's deterministic total order for event ties);
    the transition counts are a 25-cell relation at any scale, so the
    row-normalizing share window is free. Integer counts divided by
    integer sums make p identical on both engines before the nudge.
    """
    ev = table(spark, "events", sf_dir)
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type", F.lead("event_type").over(wo).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = ordered.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    share = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        ratio_round(
            F.col("n").cast("double") / F.sum("n").over(share)
        ).alias("p"),
    )


@register(
    "events_daily_paths",
    oracle="""
        WITH paths AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   string_agg(event_type, '>' ORDER BY ts, event_id) AS path
            FROM events WHERE user_id IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT path, CAST(count(*) AS BIGINT) AS n_user_days
        FROM paths
        GROUP BY path
        ORDER BY n_user_days DESC, path
        LIMIT 10
    """,
)
def events_daily_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10 most common within-day event-type paths (e.g.
    'view>click>purchase') across all user-days — sequence-pattern
    mining's path rollup, the step behind journey dashboards.

    Ordered string aggregation is the cross-engine trap here: Spark's
    collect_list gives NO intra-group order, so the path builds as
    array_sort over (ts, event_id, type) structs — the struct sort key
    IS the repo's deterministic event total order — then a transform +
    array_join; DuckDB's string_agg(... ORDER BY ts, event_id) states
    the same order declaratively. One (user, day) shuffle; paths are
    day-bounded so no group outgrows a basket-sized array.
    """
    ev = table(spark, "events", sf_dir).filter(F.col("user_id").isNotNull())
    paths = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_user_days"))
        .orderBy(F.col("n_user_days").desc(), "path")
        .limit(10)
    )


def _audience_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (day, event_type, user_id) — the one fact-sized shuffle
    both audience-overlap plans start from."""
    return (
        table(spark, "events", sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select(F.col("ts").cast("date").alias("day"), "event_type", "user_id")
        .distinct()
    )


@register(
    "events_audience_overlap",
    headline=True,
    oracle=f"""
        WITH tu AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, event_type, user_id
            FROM events WHERE user_id IS NOT NULL
        ),
        sizes AS (
            SELECT day, event_type, count(*) AS n FROM tu GROUP BY 1, 2
        ),
        ov AS (
            SELECT a.day AS day, a.event_type AS type_a,
                   b.event_type AS type_b, count(*) AS o
            FROM tu a JOIN tu b ON a.user_id = b.user_id AND a.day = b.day
            WHERE a.event_type < b.event_type
            GROUP BY 1, 2, 3
        )
        SELECT CAST(ov.day AS TIMESTAMP) AS day, type_a, type_b,
               CAST(sa.n AS BIGINT) AS users_a, CAST(sb.n AS BIGINT) AS users_b,
               CAST(o AS BIGINT) AS overlap,
               {sql_ratio_round("o / (sa.n + sb.n - o)")} AS jaccard
        FROM ov
        JOIN sizes sa ON ov.day = sa.day AND ov.type_a = sa.event_type
        JOIN sizes sb ON ov.day = sb.day AND ov.type_b = sb.event_type
    """,
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap: per day, for every event-type pair, how many
    users did BOTH — the segment-intersection metric behind campaign
    reach and feature co-usage dashboards.

    Exact plan, no self-join: the distinct (day, user, type) triples
    collapse to one sorted type-set per (day, user), each set explodes
    into its C(t, 2) pairs (bounded by the type VOCABULARY, not the data),
    and one aggregation counts each pair's co-audience. Per-audience
    sizes broadcast back in for the Jaccard. Cost: the triple-distinct
    shuffle + one pair aggregation — at 100 TB the same shape holds, and
    `events_audience_overlap_sketch_audit` pins the HLL swap for when
    even the triple relation is too wide.
    """
    pairs_expr = F.expr(
        "flatten(transform(__ts, (x, i) -> "
        "transform(slice(__ts, i + 2, greatest(size(__ts) - i - 1, 0)), "
        "y -> struct(x AS type_a, y AS type_b))))"
    )
    per_user = (
        _audience_triples(spark, sf_dir)
        .groupBy("day", "user_id")
        .agg(F.array_sort(F.collect_set("event_type")).alias("__ts"))
    )
    ov = (
        per_user.select("day", F.explode(pairs_expr).alias("__p"))
        .groupBy("day", F.col("__p.type_a").alias("type_a"), F.col("__p.type_b").alias("type_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("overlap"))
    )
    # Per-audience sizes from the SAME per-user type sets (optimization
    # r18, guide §2.4): exploding each (day, user)'s deduplicated set and
    # counting per (day, type) is exactly count(DISTINCT user) per
    # audience — the former second `_audience_triples` pass re-scanned
    # and re-distinct-shuffled the events fact once per join side (the
    # two branches alias differently, so no exchange reuse fired: three
    # fact scans + three fact-sized exchanges per run). Now ONE fact scan
    # and ONE fact-sized exchange feed everything downstream.
    # NULL-group note (ADVICE r18): collect_set drops NULL event_types,
    # so `sizes` has no NULL audience row where the old `_audience_triples`
    # pass kept one. Output is unchanged ONLY because the inner joins
    # below match on type EQUALITY (a NULL type can never match) — if a
    # future change makes these joins null-safe (<=>) or outer, the NULL
    # audience must be re-derived explicitly.
    sizes = (
        per_user.select("day", F.explode("__ts").alias("event_type"))
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    sa = sizes.select(
        F.col("day").alias("__da"), F.col("event_type").alias("__ta"),
        F.col("n").alias("users_a"),
    )
    sb = sizes.select(
        F.col("day").alias("__db"), F.col("event_type").alias("__tb"),
        F.col("n").alias("users_b"),
    )
    return (
        ov.join(
            F.broadcast(sa),
            (F.col("day") == F.col("__da")) & (F.col("type_a") == F.col("__ta")),
        )
        .join(
            F.broadcast(sb),
            (F.col("day") == F.col("__db")) & (F.col("type_b") == F.col("__tb")),
        )
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "type_a",
            "type_b",
            "users_a",
            "users_b",
            "overlap",
            ratio_round(
                F.col("overlap")
                / (F.col("users_a") + F.col("users_b") - F.col("overlap"))
            ).alias("jaccard"),
        )
    )


@register(
    "events_audience_overlap_sketch_audit",
    oracle="""
        WITH tu AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, event_type, user_id
            FROM events WHERE user_id IS NOT NULL
        ),
        active AS (
            SELECT DISTINCT day, event_type FROM tu
        )
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               TRUE AS audiences_within_envelope,
               TRUE AS overlap_within_envelope
        FROM active a
        JOIN active b ON a.day = b.day AND a.event_type < b.event_type
    """,
)
def events_audience_overlap_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-attested error gate for the SKETCH form of audience
    overlap — the 100 TB path where per-audience user sets become one
    fixed-size HLL each and the intersection derives by
    inclusion-exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B)
    (`hll_union` of the two sketches; no user list ever shuffles).

    Inclusion-exclusion COMPOUNDS sketch error (three estimates, each
    ~1.6% rsd at lgK=12), so the pinned envelope is additive, not
    relative: |est − exact| ≤ 3·rsd·(est_A + est_B + est_A∪B) + 1. The
    audit recomputes the exact overlaps in-plan, checks every (day,
    type-pair), and the oracle independently derives the PAIR COUNT from
    raw events so dropped pairs flip ``n_pairs``, not just a boolean.
    At driver SFs the sketches sit in DataSketches' exact mode (measured
    error 0) — a breach is a regression, not noise.
    """
    rsd = 1.04 / (2.0 ** 6)  # lgK=12: 1.04/sqrt(4096) ≈ 1.625%
    daily = (
        table(spark, "events", sf_dir)
        .filter(F.col("user_id").isNotNull())
        .groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("__sk"))
    )
    a = daily.select(
        F.col("day").alias("__da"), F.col("event_type").alias("type_a"),
        F.col("__sk").alias("__ska"),
    )
    b = daily.select(
        F.col("day").alias("__db"), F.col("event_type").alias("type_b"),
        F.col("__sk").alias("__skb"),
    )
    est = (
        a.join(
            b,
            (F.col("__da") == F.col("__db")) & (F.col("type_a") < F.col("type_b")),
        )
        .select(
            F.col("__da").alias("day"),
            "type_a",
            "type_b",
            F.hll_sketch_estimate("__ska").alias("__ea"),
            F.hll_sketch_estimate("__skb").alias("__eb"),
            F.hll_sketch_estimate(F.hll_union("__ska", "__skb")).alias("__eu"),
        )
        .withColumn("__est", F.col("__ea") + F.col("__eb") - F.col("__eu"))
    )
    # The audit universe is every (day, type-pair) with BOTH audiences
    # active that day — the sketch side's join already defines it. Exact
    # sizes attach per side; a pair with no co-audience has exact overlap
    # 0 (LEFT join + coalesce), and its estimate must land within the
    # envelope of zero — excluding those pairs would hide an estimator
    # that hallucinates overlap.
    sizes = (
        _audience_triples(spark, sf_dir)
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    exact_ov = (
        events_audience_overlap(spark, sf_dir)
        .select(
            F.col("day").cast("date").alias("__xd"),
            F.col("type_a").alias("__xa"),
            F.col("type_b").alias("__xb"),
            "overlap",
        )
    )
    joined = (
        est.join(
            sizes.select(
                F.col("day").alias("__sa_d"), F.col("event_type").alias("__sa_t"),
                F.col("n").alias("users_a"),
            ),
            (F.col("day") == F.col("__sa_d")) & (F.col("type_a") == F.col("__sa_t")),
        )
        .join(
            sizes.select(
                F.col("day").alias("__sb_d"), F.col("event_type").alias("__sb_t"),
                F.col("n").alias("users_b"),
            ),
            (F.col("day") == F.col("__sb_d")) & (F.col("type_b") == F.col("__sb_t")),
        )
        .join(
            exact_ov,
            F.col("day").eqNullSafe(F.col("__xd"))
            & F.col("type_a").eqNullSafe(F.col("__xa"))
            & F.col("type_b").eqNullSafe(F.col("__xb")),
            "left",
        )
        .withColumn("overlap", F.coalesce(F.col("overlap"), F.lit(0)))
    )
    tol = 3 * rsd * (F.col("__ea") + F.col("__eb") + F.col("__eu")) + 1
    overlap_ok = F.abs(F.col("__est") - F.col("overlap")) <= tol
    audience_ok = (
        (F.abs(F.col("__ea") - F.col("users_a")) <= 3 * rsd * F.col("users_a") + 1)
        & (F.abs(F.col("__eb") - F.col("users_b")) <= 3 * rsd * F.col("users_b") + 1)
    )
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.coalesce(F.min(F.coalesce(audience_ok, F.lit(False))), F.lit(False)).alias(
            "audiences_within_envelope"
        ),
        F.coalesce(F.min(F.coalesce(overlap_ok, F.lit(False))), F.lit(False)).alias(
            "overlap_within_envelope"
        ),
    )
