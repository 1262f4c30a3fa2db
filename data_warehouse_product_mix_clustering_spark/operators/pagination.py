"""Sort / top-k / pagination operators (SURVEY.md §2.5 O1-O3).

The reference paginates with ``iloc[start:end]`` over a sorted pandas frame
(reference pages/2_Product_Details.py:192-231) and does top-1 via
``ORDER BY ... LIMIT 1`` (Clustering_Analysis.py:29-34).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def paginate(
    df: DataFrame, order_by: list[Column | str], page: int, page_size: int = 20
) -> DataFrame:
    """Deterministic offset/limit pagination (page is 1-based).

    Uses offset()+limit() (Spark 3.4+): Spark plans a global TopK
    (offset+limit rows) without materializing a full sort — far cheaper
    than row_number over an unpartitioned window for small pages.
    """
    start = (page - 1) * page_size
    return df.orderBy(*order_by).offset(start).limit(page_size)


def top_k(
    df: DataFrame,
    order_by: list[Column | str],
    k: int,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Global or per-group top-k.

    Global: orderBy+limit → TakeOrderedAndProject (no full sort/shuffle).
    Per-group: row_number window ≤ k (one shuffle on the group keys).
    """
    if not partition_by:
        return df.orderBy(*order_by).limit(k)
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
