"""Deterministic surrogate keys (SURVEY.md §2.6 F13).

The reference generates surrogate keys from the pandas index
(``Id = index + 1``, reference src/pipelines/etl.py:80) — an implicit,
single-process ordering. Distributed equivalent: ``row_number()`` over an
explicit, total ordering. ``monotonically_increasing_id`` is deliberately
NOT used: its values depend on partition layout (non-deterministic across
runs/cluster sizes) and are non-contiguous.

Scale note: row_number over a global window funnels through one partition.
That's fine for dimension tables (the only place surrogate keys are needed
here); for billion-row keys use ``zipWithIndex``-style two-pass offsets —
exposed as ``with_surrogate_key(..., strategy="distributed")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_surrogate_key(
    df: DataFrame,
    key_col: str,
    order_by: list[str],
    start: int = 1,
    strategy: str = "window",
) -> DataFrame:
    if not order_by:
        raise ValueError("surrogate keys need an explicit total ordering")
    if strategy == "window":
        w = Window.orderBy(*[F.col(c).asc_nulls_last() for c in order_by])
        return df.withColumn(key_col, (F.row_number().over(w) + start - 1).cast("int"))
    if strategy == "distributed":
        # Two-pass: per-partition row_number + exclusive prefix-sum of
        # partition sizes. No single-partition funnel; keys are dense and
        # deterministic given the sort.
        sorted_df = df.repartitionByRange(df.sparkSession.sparkContext.defaultParallelism, *order_by).sortWithinPartitions(*order_by)
        spid = F.spark_partition_id()
        with_pid = sorted_df.withColumn("__pid", spid)
        sizes = with_pid.groupBy("__pid").count().orderBy("__pid").collect()
        offsets = {}
        acc = 0
        for row in sizes:
            offsets[row["__pid"]] = acc
            acc += row["count"]
        offmap = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        w = Window.partitionBy("__pid").orderBy(*[F.col(c).asc_nulls_last() for c in order_by])
        return (
            with_pid.withColumn(
                key_col,
                (F.row_number().over(w) + offmap[F.col("__pid")] + start - 1).cast("long"),
            )
            .drop("__pid")
        )
    raise ValueError(f"unknown strategy: {strategy}")
