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
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension; returns the new dimension.

    Parameters
    ----------
    dim : current dimension — (key, attrs..., start_col, end_col) with
        ``end_col IS NULL`` marking each key's open (current) row.
    updates : update batch — (key, attrs..., ts_col); at most one row per
        key (pre-aggregate upstream: latest per key wins).
    Semantics: a key whose attrs differ from its open row closes that row
    at the update timestamp and opens a new row from it; an unseen key
    opens its first row; an identical update is ignored (idempotence).
    """
    dcols = [key, *attrs, start_col, end_col]
    closed = dim.filter(F.col(end_col).isNotNull()).select(*dcols)
    open_rows = dim.filter(F.col(end_col).isNull()).select(*dcols).alias("o")
    up = updates.select(key, *attrs, ts_col).alias("u")

    j = open_rows.join(up, F.col(f"o.{key}") == F.col(f"u.{key}"), "full_outer")
    changed = _any_attr_differs(attrs, "o", "u")
    has_open = F.col(f"o.{key}").isNotNull()
    has_upd = F.col(f"u.{key}").isNotNull()

    # Open rows that survive untouched: no update, or an identical one.
    carried = j.filter(has_open & (~has_upd | ~changed)).select(
        *[F.col(f"o.{c}").alias(c) for c in dcols]
    )
    # Open rows closed by a genuine change.
    closed_now = j.filter(has_open & has_upd & changed).select(
        F.col(f"o.{key}").alias(key),
        *[F.col(f"o.{a}").alias(a) for a in attrs],
        F.col(f"o.{start_col}").alias(start_col),
        F.col(f"u.{ts_col}").alias(end_col),
    )
    # New open rows: changed keys and brand-new keys.
    opened = j.filter(has_upd & (~has_open | changed)).select(
        F.col(f"u.{key}").alias(key),
        *[F.col(f"u.{a}").alias(a) for a in attrs],
        F.col(f"u.{ts_col}").alias(start_col),
        F.lit(None).cast(dim.schema[end_col].dataType).alias(end_col),
    )
    return closed.unionByName(carried).unionByName(closed_now).unionByName(opened)
