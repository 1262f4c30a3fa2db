"""Slowly-changing-dimension type-2 merge, pure DataFrame (no lake format).

The reference's ETL replaces dimensions wholesale every run
(``to_sql(if_exists='replace')``, reference src/pipelines/etl.py:102-107),
which loses history. A warehouse at scale keeps attribute history as SCD2
validity intervals — the same (StartDate, EndDate-NULL-open) shape the
as-of join (operators/asof_join.py) consumes.

Without a transactional table format, the merge is expressed as a full
rewrite plan: one shuffle on the business key, then a union of the four
row fates (historical rows untouched, open rows closed by a change,
changed/new rows opened, unchanged open rows carried). Output is written
atomically by the caller (``write_parquet_table`` overwrite). Re-applying
the same update batch is a no-op (idempotent), which tests pin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _any_attr_differs(attrs: list[str], left_prefix: str, right_prefix: str) -> Column:
    """Null-safe inequality across the tracked attributes."""
    cond = F.lit(False)
    for a in attrs:
        cond = cond | ~F.col(f"{left_prefix}.{a}").eqNullSafe(F.col(f"{right_prefix}.{a}"))
    return cond


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str,
    start_col: str = "StartDate",
    end_col: str = "EndDate",
    on_stale: str = "error",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension; returns the new dimension.

    Parameters
    ----------
    dim : current dimension — (key, attrs..., start_col, end_col) with
        ``end_col IS NULL`` marking each key's open (current) row.
    updates : update batch — (key, attrs..., ts_col); at most one row per
        key (pre-aggregate upstream: latest per key wins).
    on_stale : what to do with a CHANGED update whose ``ts_col`` is <= the
        open row's ``start_col``. Applying it would close the open row at
        or before its own start — an inverted/overlapping validity interval
        that corrupts every downstream as-of join (especially the
        ``disjoint=True`` fast path, whose contract is well-formed
        intervals). ``"error"`` (default) raises ValueError (one extra
        dimension-sized job); ``"drop"`` discards those updates.
    Semantics: a key whose attrs differ from its open row closes that row
    JUST BEFORE the update timestamp (``ts − 1 day`` for dates, ``ts − 1
    microsecond`` for timestamps — the star schema's non-overlapping
    convention) and opens a new row AT it; an unseen key opens its first
    row; an identical update is ignored (idempotence). Closing at ts
    itself would make consecutive intervals overlap at exactly ts under
    the engine's INCLUSIVE-end interval joins, double-matching every
    fact dated on a change day through the trusted ``disjoint=True``
    as-of fast path (review r9). NULL business keys are first-class: the
    merge joins null-safe, so an 'unknown member' row updates instead of
    silently vanishing from the output.
    """
    if on_stale not in ("error", "drop"):
        raise ValueError(f"on_stale must be 'error' or 'drop': {on_stale}")
    dcols = [key, *attrs, start_col, end_col]
    closed = dim.filter(F.col(end_col).isNotNull()).select(*dcols)
    open_rows = dim.filter(F.col(end_col).isNull()).select(*dcols).alias("o")
    up = updates.select(key, *attrs, ts_col).alias("u")

    # Guard inverted intervals before they can be produced: a stale update
    # only matters when it would actually close the open row (attrs differ).
    stale_cond = (
        _any_attr_differs(attrs, "o", "u")
        & (F.col(f"u.{ts_col}") <= F.col(f"o.{start_col}"))
    )
    stale_join = open_rows.join(
        up, F.col(f"o.{key}").eqNullSafe(F.col(f"u.{key}")), "inner"
    )
    if on_stale == "error":
        bad = stale_join.filter(stale_cond).select(F.col(f"u.{key}")).limit(1).collect()
        if bad:
            raise ValueError(
                f"scd2_merge: update batch has {ts_col} <= the open row's "
                f"{start_col} for key={bad[0][0]!r} (would produce an "
                "inverted validity interval); fix the batch or pass "
                "on_stale='drop'"
            )
    else:
        stale_keys = stale_join.filter(stale_cond).select(
            F.col(f"u.{key}").alias("__stale_key")
        )
        up = (
            up.join(
                stale_keys,
                F.col(f"u.{key}").eqNullSafe(F.col("__stale_key")),
                "left_anti",
            ).alias("u")
        )

    # Null-safe key join + synthetic presence flags (merge_into's
    # pattern): key-isNotNull presence misreads a NULL-keyed row as
    # absent from BOTH sides, dropping it from every fate bucket.
    open_rows = open_rows.withColumn("__op", F.lit(1)).alias("o")
    up = up.withColumn("__up", F.lit(1)).alias("u")
    j = open_rows.join(
        up, F.col(f"o.{key}").eqNullSafe(F.col(f"u.{key}")), "full_outer"
    )
    changed = _any_attr_differs(attrs, "o", "u")
    has_open = F.col("o.__op").isNotNull()
    has_upd = F.col("u.__up").isNotNull()

    # Non-overlapping close boundary, typed to the interval columns.
    if isinstance(dim.schema[start_col].dataType, T.DateType):
        close_at = F.date_sub(F.col(f"u.{ts_col}"), 1)
    else:
        close_at = F.col(f"u.{ts_col}") - F.expr("INTERVAL 1 MICROSECOND")

    # Open rows that survive untouched: no update, or an identical one.
    carried = j.filter(has_open & (~has_upd | ~changed)).select(
        *[F.col(f"o.{c}").alias(c) for c in dcols]
    )
    # Open rows closed by a genuine change.
    closed_now = j.filter(has_open & has_upd & changed).select(
        F.col(f"o.{key}").alias(key),
        *[F.col(f"o.{a}").alias(a) for a in attrs],
        F.col(f"o.{start_col}").alias(start_col),
        close_at.cast(dim.schema[end_col].dataType).alias(end_col),
    )
    # New open rows: changed keys and brand-new keys.
    opened = j.filter(has_upd & (~has_open | changed)).select(
        F.col(f"u.{key}").alias(key),
        *[F.col(f"u.{a}").alias(a) for a in attrs],
        F.col(f"u.{ts_col}").alias(start_col),
        F.lit(None).cast(dim.schema[end_col].dataType).alias(end_col),
    )
    return closed.unionByName(carried).unionByName(closed_now).unionByName(opened)
