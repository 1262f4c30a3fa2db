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


def materialized_range_partitions(
    df: DataFrame, num_partitions: int, order_cols: list
) -> DataFrame:
    """Range-partition + sort + MATERIALIZE (localCheckpoint) — the safe
    base for two-pass prefix-sum algorithms.

    ``repartitionByRange`` samples its boundaries with a seed derived
    from the per-execution RDD id, so two executions of the same plan
    can split rows across partitions differently. Any algorithm that
    collects per-partition statistics in one job and applies them in a
    second MUST pin one materialized partitioning first, or the offsets
    describe a layout the second job no longer has (duplicate/shifted
    keys, mis-packed shards — review r8). The checkpoint's storage cost
    is the price of that consistency; both consumers (keys, packing)
    read it exactly twice.

    LAZY checkpoint (optimization r18): every caller's immediately-next
    action is its per-partition stats collect, which computes EVERY
    partition (a groupBy reads them all), so the checkpoint completes
    inside that job — one driver round-trip per call instead of two,
    with the identical pinned layout (localCheckpoint blocks are
    immutable once materialized, and Spark back-fills any partition a
    first job skipped before truncating lineage).

    CALLER CONTRACT (ADVICE r18): the lazy checkpoint only delivers the
    pinned-layout guarantee if the caller's FIRST action over the result
    computes every partition (the stats-collect-first pattern all three
    current callers follow). A new consumer whose first action reads a
    subset (a limit, a single-partition probe) would leave the remaining
    partitions un-pinned until some later job computes them — pass the
    result through ``.localCheckpoint(eager=True)`` at such a call site
    instead of weakening the shared operator.
    """
    return df.repartitionByRange(num_partitions, *order_cols).sortWithinPartitions(
        *order_cols
    ).localCheckpoint(eager=False)


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
        sorted_df = materialized_range_partitions(
            df, df.sparkSession.sparkContext.defaultParallelism, list(order_by)
        )
        with_pid = sorted_df.withColumn("__pid", F.spark_partition_id())
        sizes = with_pid.groupBy("__pid").count().orderBy("__pid").collect()
        offsets = {}
        acc = 0
        for row in sizes:
            offsets[row["__pid"]] = acc
            acc += row["count"]
        if offsets:
            # the checkpoint guarantees every pass-2 pid was counted in
            # pass 1; the coalesce is a loud-zero guard, never expected
            offmap = F.coalesce(
                F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])[
                    F.col("__pid")
                ],
                F.lit(0),
            )
        else:  # empty input
            offmap = F.lit(0)
        w = Window.partitionBy("__pid").orderBy(*[F.col(c).asc_nulls_last() for c in order_by])
        return (
            with_pid.withColumn(
                key_col,
                (F.row_number().over(w) + offmap + start - 1).cast("long"),
            )
            .drop("__pid")
        )
    raise ValueError(f"unknown strategy: {strategy}")
