"""As-of and interval joins (SURVEY.md §2.3 J4/J5 — the one custom operator).

The reference implements a backward as-of join with pandas ``merge_asof``
(reference src/pipelines/etl.py:27-42): each fact row is matched to the
latest validity interval with ``StartDate <= OrderDate``, then post-filtered
to ``OrderDate <= EndDate`` where a NULL EndDate means an open interval.
It separately implements a per-product interval join
(reference notebooks/etl_transform.ipynb cell 28) and a hand-rolled
driver-dict "broadcast join" probed per row
(reference src/pipelines/clustering.py:24-54, O(rows x intervals)).

Vanilla PySpark has no native as-of join, so this module provides two
distributed strategies behind one API:

1. ``strategy="broadcast"`` — broadcast range join. Right side (the interval
   dimension) is broadcast; the join condition is the pure range predicate.
   For backward-asof semantics a window keeps only the latest matching
   StartDate per left row. Correct + fast when the right side is dimension-
   sized (reference DimDate is dozens of rows; anything < ~100 MB).

2. ``strategy="union"`` — sort-merge as-of for large-large joins: union the
   two inputs tagged by origin, window over (by-keys) ordered by event time,
   ``last(right_cols, ignorenulls=True)`` carries the most recent right row
   forward onto each left row. One shuffle on the by-keys, no cartesian
   blow-up, scales to 100 TB fact x 100 GB dim.

Both honor the reference's semantics: inclusive bounds, NULL end = open
interval, and rows matching no interval come out with NULL right columns
(caller drops them, as reference etl.py:88 does). With OVERLAPPING
intervals that means "latest START, then end post-filter" — an expired
latest interval masks an older covering one (pandas merge_asof +
post-filter, pinned in test_asof.py). The one documented deviation: the
BUCKETED path with end_col and disjoint=False implements "latest
COVERING interval" instead — its bucket expansion is bounded by each
interval's end, so expired intervals structurally cannot reach later
buckets to act as masks; for overlapping calendars where the reference
masking behavior matters, use the plain broadcast or union strategy
(or disjoint=True when intervals cannot overlap, where all strategies
coincide).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _right_cols(right: DataFrame, on_right: str, by: list[str]) -> list[str]:
    return [c for c in right.columns if c != on_right and c not in by]


# Calendar bucket → the INTERVAL step that advances one bucket.
_BUCKET_STEP = {
    "year": "1 year",
    "quarter": "3 months",
    "month": "1 month",
    "week": "1 week",
    "day": "1 day",
    "hour": "1 hour",
}


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str] | None = None,
    end_col: str | None = None,
    how: str = "left",
    strategy: str = "broadcast",
    tolerance: str | None = None,
    disjoint: bool = False,
    bucket: str | None = None,
    horizon: DataFrame | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join. Backward (default): latest right row with
    ``right_on <= left_on``. Forward: earliest right row with
    ``right_on >= left_on`` (pandas merge_asof ``direction='forward'``) —
    implemented by running the backward machinery on a NEGATED epoch-micros
    axis, so every strategy/tolerance path is shared, not re-derived.

    Parameters
    ----------
    left_on / right_on : event-time column on each side.
    by : optional equi-keys (the notebook variant joins per ProductID;
         the production variant passes none — date-only intervals).
    end_col : optional right-side end column; when given, matches where
         ``left_on > coalesce(end_col, +inf)`` are discarded (interval
         semantics, NULL = open-ended).
    how : 'left' keeps unmatched left rows with NULL right columns;
         'inner' drops them.
    tolerance : optional INTERVAL string (e.g. ``'30 days'``), pandas
         merge_asof semantics: matches older than ``left_on − tolerance``
         are discarded. Applied as a post-condition in both strategies.
    disjoint : caller asserts right intervals cannot overlap (requires
         ``end_col``). Each left row then matches ≤ 1 interval by
         construction, so the per-row latest-match dedup window — a full
         re-shuffle of the joined fact — is skipped entirely.
    bucket : calendar unit (year/quarter/month/week/day/hour). When given,
         the broadcast strategy derives an equi key — ``date_trunc(bucket,
         time)`` — and intervals are exploded over the buckets they span,
         turning the BroadcastNestedLoopJoin (row-at-a-time, no codegen)
         into a broadcast HASH join with the range predicate as an in-join
         post-filter. Semantics are unchanged for any input (the exploded
         coverage is exhaustive: open intervals span to max(left_on));
         pick a unit near the typical interval length so the explosion
         stays ~1-2 rows per interval.
    horizon : optional 1-row, 1-column DataFrame whose value is an upper
         bound on ``max(left_on)`` (bucketed strategy only). Open intervals
         are exploded up to this bound instead of a ``max`` aggregate over
         the left — which, when the left is itself a join, would re-execute
         that whole plan just for one scalar. Callers that know the time
         column's provenance (e.g. a fact whose date comes from one base
         table) pass a max over the narrow base column instead; a few extra
         buckets from a loose bound only pad the broadcast dim by rows.
         CONTRACT: the bound must be ≥ max(left_on), else rows past it
         silently lose their open-interval matches.
    """
    by = by or []
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")
    if direction != "backward":
        # Interval semantics are inherently backward (an interval CONTAINS
        # the event time); forward/nearest are plain as-of joins. Nearest
        # additionally supports bucket= (reduced to a disjoint interval
        # join over midpoint covers — see _nearest_bucketed).
        if end_col is not None or disjoint:
            raise ValueError(
                f"direction='{direction}' supports plain as-of only "
                "(no end_col/disjoint)"
            )
        if direction == "forward":
            if bucket is not None:
                raise ValueError("bucket= is not supported for direction='forward'")
            return _asof_forward(
                left, right, left_on, right_on, by, how, strategy, tolerance
            )
        return _asof_nearest(
            left, right, left_on, right_on, by, how, strategy, tolerance,
            bucket, horizon,
        )
    if disjoint and end_col is None:
        raise ValueError("disjoint=True requires end_col (interval semantics)")
    if strategy == "broadcast":
        if bucket is not None:
            out = _asof_bucketed(
                left, right, left_on, right_on, by, end_col, how, bucket, disjoint,
                horizon,
            )
        else:
            out = _asof_broadcast(
                left, right, left_on, right_on, by, end_col, how, disjoint
            )
    elif strategy == "union":
        out = _asof_union(left, right, left_on, right_on, by, end_col, how)
    else:
        raise ValueError(f"unknown asof strategy: {strategy}")
    if tolerance is not None:
        rcols = _right_cols(right, right_on, by) + [right_on]
        fresh = F.col(right_on) >= F.col(left_on) - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(fresh, F.col(c)).otherwise(F.lit(None)).alias(c)
                for c in rcols
            ],
        )
        if how == "inner":
            out = out.filter(F.col(right_on).isNotNull())
    return out


def _asof_forward(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str],
    how: str,
    strategy: str,
    tolerance: str | None,
) -> DataFrame:
    """Forward as-of via time negation: the EARLIEST right row at/after
    left_on is the LATEST row on the ``-epoch_micros`` axis, so the whole
    backward implementation (broadcast + union strategies, dedup
    tie-breaks, null handling) is reused verbatim. The original event-time
    columns ride through untouched — only the synthetic negated columns
    join — and tolerance is re-applied on the originals with the flipped
    bound (``right_on <= left_on + tolerance``).
    """
    def _negate(df: DataFrame, col: str) -> Column:
        dt = dict(df.dtypes)[col]
        if dt in ("timestamp", "timestamp_ntz", "date"):
            return -F.unix_micros(F.col(col).cast("timestamp"))
        return -F.col(col)  # numeric event times negate directly

    negl, negr = "__asof_fwd_l", "__asof_fwd_r"
    l2 = left.withColumn(negl, _negate(left, left_on))
    r2 = right.withColumn(negr, _negate(right, right_on))
    out = asof_join(
        l2,
        r2,
        left_on=negl,
        right_on=negr,
        by=by,
        how="left",  # tolerance nulls are applied here, on the originals
        strategy=strategy,
    )
    rcols = [c for c in right.columns if c not in by]
    if tolerance is not None:
        fresh = F.col(right_on) <= F.col(left_on) + F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *[c for c in left.columns],
            F.col(negr),
            *[
                F.when(fresh, F.col(c)).otherwise(F.lit(None)).alias(c)
                for c in rcols
            ],
        )
        if how == "inner":
            out = out.filter(F.col(right_on).isNotNull())
    elif how == "inner":
        out = out.filter(F.col(negr).isNotNull())
    return out.select(*left.columns, *rcols)


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str],
    how: str,
    strategy: str,
    tolerance: str | None,
    bucket: str | None = None,
    horizon: DataFrame | None = None,
) -> DataFrame:
    """Nearest as-of (pandas merge_asof ``direction='nearest'``): the right
    row with the smallest |right_on − left_on|, ties won by the earlier
    (backward) row.

    - broadcast: by-key equi join (cross for date-only) against the
      broadcast right, then a per-left-row window ordered by absolute gap.
    - broadcast + bucket: the hash-join variant (mirrors backward's
      strategy matrix) — nearest reduced to a DISJOINT interval join over
      midpoint covers, executed by the bucketed backward machinery as a
      codegen'd BroadcastHashJoin (see _nearest_bucketed).
    - union: ONE shuffle + ONE Window operator holding BOTH carries — the
      preceding-frame ``last`` (backward candidate) and the following-frame
      ``first`` (forward candidate); the smaller gap wins per row. Same
      scale shape as the backward union walk.

    ``tolerance`` is symmetric (pandas semantics): matches farther than
    the interval in either direction are nulled.
    """
    if strategy == "broadcast":
        if bucket is not None:
            out = _nearest_bucketed(
                left, right, left_on, right_on, by, bucket, horizon
            )
        else:
            out = _nearest_broadcast(left, right, left_on, right_on, by)
    elif strategy == "union":
        if bucket is not None:
            raise ValueError("bucket= applies to the broadcast strategy only")
        out = _nearest_union(left, right, left_on, right_on, by)
    else:
        raise ValueError(f"unknown asof strategy: {strategy}")
    rcols = _right_cols(right, right_on, by) + [right_on]
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        fresh = (F.col(right_on) >= F.col(left_on) - tol) & (
            F.col(right_on) <= F.col(left_on) + tol
        )
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(fresh, F.col(c)).otherwise(F.lit(None)).alias(c)
                for c in rcols
            ],
        )
    if how == "inner":
        out = out.filter(F.col(right_on).isNotNull())
    return out


def _axis_num(col: Column, dtype: str) -> Column:
    """Event-time column → an exactly-comparable numeric axis.

    Temporal types go through cast('timestamp') → unix_micros, yielding
    LONG microseconds: DATE is not directly castable to double (Spark
    raises DATATYPE_MISMATCH), and double epoch seconds round away
    exact-microsecond gaps, which can flip a nearest tie against the
    documented backward tie rule. Numerics pass through unchanged.
    """
    if dtype in ("timestamp", "timestamp_ntz", "date"):
        return F.unix_micros(col.cast("timestamp"))
    return col


def _abs_gap(a: Column, b: Column, dtype_a: str, dtype_b: str) -> Column:
    return F.abs(_axis_num(a, dtype_a) - _axis_num(b, dtype_b))


def _nearest_broadcast(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str],
) -> DataFrame:
    # Null-rejecting on BOTH event times, mirroring the backward range
    # predicate's semantics: a NULL left_on row has no defined gap (pandas
    # merge_asof refuses unsortable keys outright) so it must surface with
    # NULL right columns, and a NULL right_on row can never be a match —
    # without the pre-filter it would half-match (non-null payload, NULL
    # right_on), which the union strategy can never produce.
    cond = F.col(f"l.{left_on}").isNotNull()
    for k in by:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    lid = "__asof_lid"
    l = left.withColumn(lid, F.monotonically_increasing_id()).alias("l")
    r = F.broadcast(right.filter(F.col(right_on).isNotNull())).alias("r")
    joined = l.join(r, cond, "left")
    gap = _abs_gap(
        F.col(f"l.{left_on}"),
        F.col(f"r.{right_on}"),
        dict(left.dtypes)[left_on],
        dict(right.dtypes)[right_on],
    )
    # smallest gap first; ties -> earlier right_on (the backward row)
    w = Window.partitionBy(f"l.{lid}").orderBy(
        gap.asc_nulls_last(), F.col(f"r.{right_on}").asc()
    )
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in _right_cols(right, right_on, by)
    ] + [F.col(f"r.{right_on}")]
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*out_cols)
    )


def _nearest_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str],
    bucket: str,
    horizon: DataFrame | None,
) -> DataFrame:
    """Nearest as-of as a DISJOINT interval join — the hash-join strategy.

    Reduction: per (by-key) the right rows split the time axis at the
    MIDPOINTS between consecutive event times; each right row's cover
    interval is exactly the set of left times for which it is the nearest
    candidate, with the tie-at-midpoint landing on the EARLIER row (the
    documented backward tie rule: prev wins iff left − prev ≤ next − left,
    i.e. left ≤ floor((prev + next) / 2) in long microseconds — the same
    exact axis the other nearest strategies compare on). The covers are
    disjoint and exhaustive by construction, so the whole bucketed
    backward machinery (_asof_bucketed, disjoint fast path, codegen'd
    BroadcastHashJoin) runs unchanged over them.

    One window over the dimension-sized right derives the covers; right
    rows sharing (by, right_on) are merged first (max payload struct —
    deterministic, where pandas' pick is input-order-dependent).

    ``horizon``: optional 1-row, 2-column DataFrame (lower, upper bounds
    on left_on) closing the first/last covers — same contract and
    motivation as backward's 1-column horizon; defaults to one
    column-pruned (min, max) aggregate over the left.
    """
    rcols = _right_cols(right, right_on, by)
    rtype = dict(right.dtypes)[right_on]
    base = right.filter(F.col(right_on).isNotNull())
    if rcols:
        merged = (
            base.groupBy(*by, right_on)
            .agg(F.max(F.struct(*[F.col(c) for c in rcols])).alias("__p"))
            .select(
                *by, right_on, *[F.col(f"__p.{c}").alias(c) for c in rcols]
            )
        )
    else:
        merged = base.select(*by, right_on).distinct()

    if horizon is not None:
        bounds = horizon.select(
            F.col(horizon.columns[0]).alias("__asof_lo"),
            F.col(horizon.columns[1]).alias("__asof_hi"),
        )
    else:
        bounds = left.select(
            F.min(F.col(left_on)).alias("__asof_lo"),
            F.max(F.col(left_on)).alias("__asof_hi"),
        )
    bounds = bounds.localCheckpoint(eager=False)  # 1 row, consumed twice

    t = _axis_num(F.col(right_on), rtype)
    w = Window.partitionBy(*by).orderBy(t.asc())
    cur, prev, nxt = t, F.lag(t).over(w), F.lead(t).over(w)
    # floor() keeps the midpoint exact: |epoch µs| sums stay < 2^53.
    start = F.when(
        prev.isNull(), F.col("__asof_lo").cast("timestamp")
    ).otherwise(F.timestamp_micros((F.floor((prev + cur) / 2) + 1).cast("long")))
    end = F.when(
        nxt.isNull(), F.lit(None).cast("timestamp")
    ).otherwise(F.timestamp_micros(F.floor((cur + nxt) / 2).cast("long")))

    covered = merged.crossJoin(F.broadcast(bounds.select("__asof_lo"))).select(
        *by,
        start.alias("__cover_start"),
        end.alias("__cover_end"),
        F.col(right_on),
        *rcols,
    )
    out = _asof_bucketed(
        left,
        covered,
        left_on,
        "__cover_start",
        by,
        "__cover_end",
        "left",
        bucket,
        disjoint=True,
        horizon=bounds.select("__asof_hi"),
    )
    # Canonical column order (matches the other nearest strategies).
    return out.select(*left.columns, *rcols, right_on)


def _nearest_union(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str],
) -> DataFrame:
    ts = "__asof_ts"
    side = "__asof_side"  # right rows sort before left on ties (inclusive)
    rstruct = "__asof_r"
    lstruct = "__asof_l"
    rcols = _right_cols(right, right_on, by)
    lcols = [c for c in left.columns if c not in by and c != left_on]
    rfields = [F.col(c) for c in rcols] or [F.lit(True).alias("__asof_m")]
    lfields = [F.col(c) for c in lcols] or [F.lit(True).alias("__asof_m")]

    rpart = right.filter(F.col(right_on).isNotNull()).select(
        *[F.col(k) for k in by],
        F.col(right_on).alias(ts),
        F.lit(0).alias(side),
        F.struct(*rfields).alias(rstruct),
    )
    rtype = rpart.schema[rstruct].dataType
    lpart = left.select(
        *[F.col(k) for k in by],
        F.col(left_on).alias(ts),
        F.lit(1).alias(side),
        F.lit(None).cast(rtype).alias(rstruct),
        F.struct(*lfields).alias(lstruct),
    )
    ltype = lpart.schema[lstruct].dataType
    rpart = rpart.withColumn(lstruct, F.lit(None).cast(ltype))
    unioned = lpart.unionByName(rpart.select(*lpart.columns))

    order = [F.col(ts).asc(), F.col(side).asc()]
    wb = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    r_ts = F.when(F.col(side) == 0, F.col(ts))
    # Four carries, one Window operator (same partitioning+sort, two
    # frames). The equal-ts right row sorts BEFORE the left row, so it is
    # captured by the backward frame with gap 0 — which wins every nearest
    # tie anyway (pandas resolves nearest ties backward).
    carried = (
        unioned.select(
            *[F.col(k) for k in by],
            F.col(ts),
            F.col(side),
            F.col(lstruct),
            F.last(rstruct, ignorenulls=True).over(wb).alias("__b"),
            F.last(r_ts, ignorenulls=True).over(wb).alias("__bts"),
            F.first(rstruct, ignorenulls=True).over(wf).alias("__f"),
            F.first(r_ts, ignorenulls=True).over(wf).alias("__fts"),
        )
        .filter(F.col(side) == 1)
        .drop(side)
    )

    ts_dt = dict(carried.dtypes)[ts]  # post-union widened axis type
    gap_b = _abs_gap(F.col(ts), F.col("__bts"), ts_dt, ts_dt)
    gap_f = _abs_gap(F.col(ts), F.col("__fts"), ts_dt, ts_dt)
    # A NULL left event time has no defined gap — it must NOT match (the
    # backward/forward paths are null-rejecting; pandas merge_asof refuses
    # unsortable keys). Without the guard the NULL ts sorts first, so the
    # following-frame first() would fabricate a match on the earliest right
    # row. when/when with no otherwise yields NULL on a NULL ts.
    valid = F.col(ts).isNotNull()
    pick_b = valid & F.col("__b").isNotNull() & (
        F.col("__f").isNull() | (gap_b <= gap_f)
    )
    chosen = F.when(pick_b, F.col("__b")).when(valid, F.col("__f"))
    chosen_ts = F.when(pick_b, F.col("__bts")).when(valid, F.col("__fts"))

    # The union coerces __asof_ts to the wider of the two event-time types;
    # cast back so left_on keeps its input type (DATE stays DATE) and the
    # output schema matches the broadcast/bucket strategies on same inputs.
    left_on_type = dict(left.dtypes)[left_on]

    def _left_out(c: str) -> Column:
        if c in by:
            return F.col(c)
        if c == left_on:
            return F.col(ts).cast(left_on_type).alias(c)
        return F.col(f"{lstruct}.{c}").alias(c)

    return carried.select(
        *[_left_out(c) for c in left.columns],
        *[chosen.getField(c).alias(c) for c in rcols],
        chosen_ts.alias(right_on),
    )


def _asof_union_keys_only(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str],
    how: str,
) -> DataFrame:
    """Union as-of for a PAYLOAD-FREE right side (by-keys + event time
    only): one shuffle, one Window, ONE carry expression.

    ``end_col`` can never route here (an end column is right payload, so
    ``rcols`` is non-empty and the struct path runs instead). The carried
    right event time doubles as the match indicator — NULL means no right
    row at or before the left row.
    """
    ts = "__asof_ts"
    side = "__asof_side"  # 0 = right (sorts before left on ties → inclusive)
    lstruct = "__asof_l"
    lcols = [c for c in left.columns if c not in by and c != left_on]
    lfields = [F.col(c) for c in lcols] or [F.lit(True).alias("__asof_m")]

    rpart = right.filter(F.col(right_on).isNotNull()).select(
        *[F.col(k) for k in by],
        F.col(right_on).alias(ts),
        F.lit(0).alias(side),
    )
    lpart = left.select(
        *[F.col(k) for k in by],
        F.col(left_on).alias(ts),
        F.lit(1).alias(side),
        F.struct(*lfields).alias(lstruct),
    )
    ltype = lpart.schema[lstruct].dataType
    rpart = rpart.withColumn(lstruct, F.lit(None).cast(ltype))
    unioned = lpart.unionByName(rpart.select(*lpart.columns))

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts).asc(), F.col(side).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rts = "__asof_rts"
    carried = (
        unioned.select(
            *[F.col(k) for k in by],
            F.col(ts),
            F.col(side),
            F.col(lstruct),
            F.last(F.when(F.col(side) == 0, F.col(ts)), ignorenulls=True)
            .over(w)
            .alias(rts),
        )
        .filter(F.col(side) == 1)
        .drop(side)
    )

    # Same type-restore as the struct path: the union widens __asof_ts, so
    # cast the reconstructed left_on back to the left input's type.
    left_on_type = dict(left.dtypes)[left_on]

    def _left_out(c: str) -> Column:
        if c in by:
            return F.col(c)
        if c == left_on:
            return F.col(ts).cast(left_on_type).alias(c)
        return F.col(f"{lstruct}.{c}").alias(c)

    out = carried.select(
        *[_left_out(c) for c in left.columns], F.col(rts).alias(right_on)
    )
    if how == "inner":
        out = out.filter(F.col(right_on).isNotNull())
    return out


def _range_cond(
    left_on: str, right_on: str, by: list[str], end_col: str | None
) -> Column:
    cond: Column = F.col(f"l.{left_on}") >= F.col(f"r.{right_on}")
    for k in by:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    if end_col is not None:
        cond = cond & (
            F.col(f"r.{end_col}").isNull()
            | (F.col(f"l.{left_on}") <= F.col(f"r.{end_col}"))
        )
    return cond


def _dedup_latest(
    joined: DataFrame,
    left: DataFrame,
    right: DataFrame,
    right_on: str,
    by: list[str],
    end_col: str | None,
    lid: str,
) -> DataFrame:
    """Keep only the latest matching right row per left row.

    Tie-break beyond right_on: an open-ended interval (NULL end) outranks a
    closed one starting the same instant — deterministic across runs and
    strategies (pandas merge_asof keeps the last row in sort order, which
    for the reference's dim builder is the open interval).
    """
    order = [F.col(f"r.{right_on}").desc_nulls_last()]
    if end_col is not None:
        order.append(F.col(f"r.{end_col}").desc_nulls_first())
    w = Window.partitionBy(lid).orderBy(*order)
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in _right_cols(right, right_on, by)
    ] + [F.col(f"r.{right_on}")]
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*out_cols)
    )


def _asof_broadcast(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str],
    end_col: str | None,
    how: str,
    disjoint: bool = False,
) -> DataFrame:
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in _right_cols(right, right_on, by)
    ] + [F.col(f"r.{right_on}")]

    if disjoint:
        # ≤ 1 match per left row by construction: no row-tag, no window,
        # no second shuffle of the joined fact. With non-overlapping
        # intervals "latest start then end-filter" ≡ "covering interval",
        # so keeping end_col inside the join is both correct and the
        # cheapest plan.
        cond = _range_cond(left_on, right_on, by, end_col)
        l = left.alias("l")
        r = F.broadcast(right).alias("r")
        return l.join(r, cond, "left" if how == "left" else "inner").select(*out_cols)

    # Tag left rows so we can window per original row after the range join.
    lid = "__asof_lid"
    l = left.withColumn(lid, F.monotonically_increasing_id()).alias("l")
    r = F.broadcast(right).alias("r")
    if end_col is None:
        cond = _range_cond(left_on, right_on, by, None)
        joined = l.join(r, cond, "left" if how == "left" else "inner")
        return _dedup_latest(joined, left, right, right_on, by, end_col, f"l.{lid}")

    # Reference semantics with OVERLAPPING intervals (review r8): pandas
    # merge_asof picks the LATEST START, then the end condition post-
    # filters — an expired latest interval masks an older covering one.
    # The end predicate therefore must NOT sit inside the join (that
    # yields "latest covering interval" — a different answer whenever a
    # closed interval overlaps an older open one). Join on start only,
    # dedup to the latest start, THEN null out expired matches. Cost:
    # expired intervals re-enter the candidate set — fine for the
    # dimension-sized right side this strategy targets; pass
    # disjoint=True for non-overlapping calendars to keep the
    # end-in-join fast path.
    cond = _range_cond(left_on, right_on, by, None)
    joined = l.join(r, cond, "left" if how == "left" else "inner")
    dedup = _dedup_latest(joined, left, right, right_on, by, end_col, f"l.{lid}")
    expired = (
        F.col(right_on).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(left_on) > F.col(end_col))
    )
    rout = _right_cols(right, right_on, by) + [right_on]
    out = dedup.select(
        *[F.col(c) for c in left.columns],
        *[F.when(~expired, F.col(c)).alias(c) for c in rout],
    )
    if how == "inner":
        out = out.filter(F.col(right_on).isNotNull())
    return out


def _asof_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str],
    end_col: str | None,
    how: str,
    bucket: str,
    disjoint: bool,
    horizon: DataFrame | None = None,
) -> DataFrame:
    """Broadcast HASH as-of join via a derived calendar-bucket equi key.

    Each right interval is exploded over every ``date_trunc(bucket, ·)``
    value it covers — from its start bucket to its end bucket (open
    intervals and plain as-of rows cover through ``max(left_on)``, one
    column-pruned aggregate over the left). The join is then a plain equi
    join on the bucket key (+ by-keys) with the exact range predicate kept
    as an in-join filter, so Catalyst plans BroadcastHashJoin with
    whole-stage codegen instead of a BroadcastNestedLoopJoin (~4× on the
    row-at-a-time predicate, measured in this repo's bench).
    """
    if bucket not in _BUCKET_STEP:
        raise ValueError(f"bucket must be one of {sorted(_BUCKET_STEP)}: {bucket}")
    step = _BUCKET_STEP[bucket]
    bk = "__asof_bk"

    # Upper coverage bound: open/endless intervals must reach the newest
    # left row. One tiny broadcast row; computed from the caller's cheap
    # ``horizon`` plan when given (see asof_join docstring), else a
    # left_on-pruned aggregate over the left.
    if horizon is not None:
        upper = horizon.select(F.col(horizon.columns[0]).alias("__asof_max"))
    else:
        upper = left.select(F.max(F.col(left_on)).alias("__asof_max"))
    stop_ts = F.date_trunc(
        bucket,
        F.greatest(
            F.coalesce(
                (F.col(end_col) if end_col else F.lit(None)).cast("timestamp"),
                F.col("__asof_max").cast("timestamp"),
            ),
            F.col(right_on).cast("timestamp"),
        ),
    )
    rexp = (
        right.crossJoin(F.broadcast(upper))
        .withColumn(
            bk,
            F.explode(
                F.sequence(
                    F.date_trunc(bucket, F.col(right_on).cast("timestamp")),
                    stop_ts,
                    F.expr(f"interval {step}"),
                )
            ),
        )
        .drop("__asof_max")
    )

    cond = (F.col(f"l.{bk}") == F.col(f"r.{bk}")) & _range_cond(
        left_on, right_on, by, end_col
    )
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in _right_cols(right, right_on, by)
    ] + [F.col(f"r.{right_on}")]

    ltag = left.withColumn(bk, F.date_trunc(bucket, F.col(left_on).cast("timestamp")))
    if disjoint:
        l = ltag.alias("l")
        r = F.broadcast(rexp).alias("r")
        return l.join(r, cond, "left" if how == "left" else "inner").select(*out_cols)

    lid = "__asof_lid"
    l = ltag.withColumn(lid, F.monotonically_increasing_id()).alias("l")
    r = F.broadcast(rexp).alias("r")
    joined = l.join(r, cond, "left" if how == "left" else "inner")
    return _dedup_latest(joined, left, right, right_on, by, end_col, f"l.{lid}")


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str],
    end_col: str | None,
    how: str,
) -> DataFrame:
    """Union + window last(ignorenulls): the large-large as-of strategy.

    One shuffle on (by, event_time); each partition is sorted once and the
    most recent right-side ROW is carried forward — the distributed
    equivalent of pandas merge_asof's merge walk. The right row travels as
    ONE struct: per-column ``last(ignorenulls)`` would skip a genuinely
    NULL field (e.g. an open interval's end date) and resurrect the
    previous row's value; a struct is non-null as a whole, so its internal
    NULLs survive the carry.

    Each side's payload is packed into a struct BEFORE the union: a NULL
    struct costs only a null bit in the shuffled UnsafeRow, whereas flat
    null-padded fixed-width columns (the obvious layout) still occupy
    their 8-byte slots on every row of the OTHER side — on a right side
    bigger than the left that's pure wasted shuffle volume.
    """
    ts = "__asof_ts"
    side = "__asof_side"  # 0 = right (sorts before left on ties → inclusive)
    rstruct = "__asof_r"
    lstruct = "__asof_l"
    rcols = _right_cols(right, right_on, by)
    if not rcols:
        # Payload-free right side (the caller deferred every derivable
        # column past the join): the carried right event time IS the whole
        # match, so the marker struct — and with it the second window
        # aggregate buffer — is dropped entirely. One carry per row
        # instead of two through the same sorted walk.
        return _asof_union_keys_only(left, right, left_on, right_on, by, how)
    # The event-time columns do NOT ride inside the payload structs — ts
    # already holds left_on (side 1) / right_on (side 0), and duplicating
    # them (the obvious layout) adds 8 bytes × every shuffled row. They are
    # reconstructed after the window: left_on from ts, right_on from a
    # second carry expression over the SAME window frame (one sort pass,
    # two aggregate buffers).
    lcols = [c for c in left.columns if c not in by and c != left_on]
    rfields = [F.col(c) for c in rcols]
    lfields = [F.col(c) for c in lcols] or [F.lit(True).alias("__asof_m")]

    # A NULL right_on row can never be an as-of match (the range predicate
    # is null-rejecting in the broadcast strategy); dropping it here keeps
    # the two carry expressions (rstruct, rts) row-consistent.
    rpart = right.filter(F.col(right_on).isNotNull()).select(
        *[F.col(k) for k in by],
        F.col(right_on).alias(ts),
        F.lit(0).alias(side),
        F.struct(*rfields).alias(rstruct),
    )
    rtype = rpart.schema[rstruct].dataType
    lpart = left.select(
        *[F.col(k) for k in by],
        F.col(left_on).alias(ts),
        F.lit(1).alias(side),
        F.lit(None).cast(rtype).alias(rstruct),
        F.struct(*lfields).alias(lstruct),
    )
    ltype = lpart.schema[lstruct].dataType
    rpart = rpart.withColumn(lstruct, F.lit(None).cast(ltype))
    unioned = lpart.unionByName(rpart.select(*lpart.columns))

    # Tie-break among right rows sharing the same start: the open interval
    # (NULL end) — or failing that the longest one — is carried, matching
    # the broadcast strategy's dedup order and pandas merge_asof's
    # last-in-sort-order behavior on the reference's dim builder.
    order = [F.col(ts).asc(), F.col(side).asc()]
    if end_col is not None:
        order.append(F.col(f"{rstruct}.{end_col}").asc_nulls_last())
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Both carries in ONE select so Catalyst plans a single Window operator
    # (chained withColumns put a Project between two same-spec Windows,
    # which blocks CollapseWindow → two walks per partition).
    rts = "__asof_rts"
    rcarry = "__asof_rc"
    carried = (
        unioned.select(
            *[F.col(k) for k in by],
            F.col(ts),
            F.col(side),
            F.col(lstruct),
            F.last(rstruct, ignorenulls=True).over(w).alias(rcarry),
            F.last(F.when(F.col(side) == 0, F.col(ts)), ignorenulls=True)
            .over(w)
            .alias(rts),
        )
        .filter(F.col(side) == 1)
        .drop(side)
    )
    rstruct = rcarry

    matched = F.col(rstruct).isNotNull()
    if end_col is not None:
        # Discard stale matches: the carried interval already ended. The
        # retained __asof_ts column holds left_on's value on side-1 rows —
        # reading left_on through lstruct would break when left_on is also
        # a by-key (by-keys are excluded from the packed struct).
        matched = matched & (
            F.col(f"{rstruct}.{end_col}").isNull()
            | (F.col(ts) <= F.col(f"{rstruct}.{end_col}"))
        )
    # The union widens __asof_ts to the common event-time type; restore
    # left_on's input type so this strategy's schema matches broadcast's.
    left_on_type = dict(left.dtypes)[left_on]

    def _left_out(c: str) -> Column:
        if c in by:
            return F.col(c)
        if c == left_on:
            return F.col(ts).cast(left_on_type).alias(c)
        return F.col(f"{lstruct}.{c}").alias(c)

    out = carried.select(
        *[_left_out(c) for c in left.columns],
        *[
            F.when(matched, F.col(f"{rstruct}.{c}")).otherwise(F.lit(None)).alias(c)
            for c in rcols
        ],
        F.when(matched, F.col(rts)).otherwise(F.lit(None)).alias(right_on),
    )
    if how == "inner":
        out = out.filter(F.col(right_on).isNotNull())
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """Interval-containment join (J5): ``start <= t AND (end IS NULL OR t <= end)``.

    With by-keys, Catalyst executes a hash join on the equi part with the
    range predicate as a post-condition; without them, the right side must
    be broadcast-able (dimension-sized) to avoid a cartesian.
    """
    by = by or []
    cond: Column = (F.col(f"l.{left_time}") >= F.col(f"r.{start_col}")) & (
        F.col(f"r.{end_col}").isNull()
        | (F.col(f"l.{left_time}") <= F.col(f"r.{end_col}"))
    )
    for k in by:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    r = F.broadcast(right) if broadcast_right else right
    joined = left.alias("l").join(r.alias("r"), cond, how)
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}").alias(c) for c in right.columns if c not in by
    ]
    return joined.select(*out_cols)
