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
    """
    by = by or []
    if strategy == "broadcast":
        return _asof_broadcast(left, right, left_on, right_on, by, end_col, how)
    if strategy == "union":
        return _asof_union(left, right, left_on, right_on, by, end_col, how)
    raise ValueError(f"unknown asof strategy: {strategy}")


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
    most recent right-side values are carried forward — the distributed
    equivalent of pandas merge_asof's merge walk.
    """
    ts = "__asof_ts"
    side = "__asof_side"  # 0 = right (sorts before left on ties → inclusive)
    rcols = _right_cols(right, right_on, by)

    lpart = left.withColumn(ts, F.col(left_on)).withColumn(side, F.lit(1))
    for c in rcols:
        lpart = lpart.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    lpart = lpart.withColumn("__r_on", F.lit(None).cast(right.schema[right_on].dataType))

    rpart = right.withColumn(ts, F.col(right_on)).withColumn(side, F.lit(0))
    rpart = rpart.withColumnRenamed(right_on, "__r_on")
    for c in left.columns:
        if c not in by and c not in rpart.columns:
            rpart = rpart.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    cols = by + [c for c in left.columns if c not in by] + rcols + ["__r_on", ts, side]
    unioned = lpart.select(*cols).unionByName(rpart.select(*cols))

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts).asc(), F.col(side).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in by],
        *[F.col(c) for c in left.columns if c not in by],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in rcols],
        F.last("__r_on", ignorenulls=True).over(w).alias("__r_on"),
        F.col(side).alias(side),
    )
    out = carried.filter(F.col(side) == 1).drop(side)

    if end_col is not None:
        # end_col was carried with the matched interval; discard stale matches.
        keep = F.col(end_col).isNull() | (F.col(left_on) <= F.col(end_col))
        null_cols = [F.when(keep, F.col(c)).otherwise(F.lit(None)).alias(c) for c in rcols]
        null_on = F.when(keep, F.col("__r_on")).otherwise(F.lit(None)).alias("__r_on")
        out = out.select(
            *[F.col(c) for c in by],
            *[F.col(c) for c in left.columns if c not in by],
            *null_cols,
            null_on,
        )
    out = out.withColumnRenamed("__r_on", right_on)
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
