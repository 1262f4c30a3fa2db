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
(caller drops them, as reference etl.py:88 does).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _right_cols(right: DataFrame, on_right: str, by: list[str]) -> list[str]:
    return [c for c in right.columns if c != on_right and c not in by]


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
) -> DataFrame:
    """Backward as-of join: latest right row with ``right_on <= left_on``.

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
    """
    by = by or []
    if strategy == "broadcast":
        out = _asof_broadcast(left, right, left_on, right_on, by, end_col, how)
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


def _asof_broadcast(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str],
    end_col: str | None,
    how: str,
) -> DataFrame:
    # Tag left rows so we can window per original row after the range join.
    lid = "__asof_lid"
    tagged = left.withColumn(lid, F.monotonically_increasing_id())

    cond: Column = F.col(f"l.{left_on}") >= F.col(f"r.{right_on}")
    for k in by:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    if end_col is not None:
        cond = cond & (
            F.col(f"r.{end_col}").isNull()
            | (F.col(f"l.{left_on}") <= F.col(f"r.{end_col}"))
        )

    l = tagged.alias("l")
    r = F.broadcast(right).alias("r")
    joined = l.join(r, cond, "left" if how == "left" else "inner")

    # Backward asof: keep only the latest matching right_on per left row.
    w = Window.partitionBy(lid).orderBy(F.col(f"r.{right_on}").desc_nulls_last())
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in _right_cols(right, right_on, by)
    ] + [F.col(f"r.{right_on}")]
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*out_cols)
    )


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
    """
    ts = "__asof_ts"
    side = "__asof_side"  # 0 = right (sorts before left on ties → inclusive)
    rstruct = "__asof_r"
    rcols = _right_cols(right, right_on, by)

    rpart = right.select(
        *[F.col(k) for k in by],
        F.col(right_on).alias(ts),
        F.lit(0).alias(side),
        F.struct(
            *[F.col(c) for c in rcols], F.col(right_on).alias("__r_on")
        ).alias(rstruct),
    )
    struct_type = rpart.schema[rstruct].dataType
    lpart = left.select(
        "*",
        F.col(left_on).alias(ts),
        F.lit(1).alias(side),
        F.lit(None).cast(struct_type).alias(rstruct),
    )
    for c in left.columns:
        if c not in by:
            rpart = rpart.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    cols = by + [c for c in left.columns if c not in by] + [rstruct, ts, side]
    unioned = lpart.select(*cols).unionByName(rpart.select(*cols))

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts).asc(), F.col(side).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        unioned.withColumn(rstruct, F.last(rstruct, ignorenulls=True).over(w))
        .filter(F.col(side) == 1)
        .drop(side, ts)
    )

    matched = F.col(rstruct).isNotNull()
    if end_col is not None:
        # discard stale matches: the carried interval already ended.
        matched = matched & (
            F.col(f"{rstruct}.{end_col}").isNull()
            | (F.col(left_on) <= F.col(f"{rstruct}.{end_col}"))
        )
    out = carried.select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(matched, F.col(f"{rstruct}.{c}")).otherwise(F.lit(None)).alias(c)
            for c in rcols
        ],
        F.when(matched, F.col(f"{rstruct}.__r_on")).otherwise(F.lit(None)).alias(
            right_on
        ),
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
