"""The reference's exact ETL, Spark-first (pipeline-parity surface).

Takes AdventureWorks-shaped source tables (FIXTURES.md §A1) and produces
the reference's warehouse tables (§A2) with the reference's exact
semantics, step for step (reference src/pipelines/etl.py:44-123):

1. finished-goods filter + flag drop              (etl.py:52)
2. salable-products semi-join filters             (etl.py:53,65,73)
3. cost ⋈ price history on (Product, Start, End)  (etl.py:64)
4. DimDate: distinct intervals + surrogate id     (etl.py:78-80)
5. interval id attach on price/cost history       (etl.py:83-84)
6. detail ⋈ header left join                      (etl.py:70)
7. backward as-of interval join, date-only        (etl.py:27-42)
8. dropna of unmatched rows                       (etl.py:88)

Each collected-IN-list / merge_asof / driver-dict idiom becomes a
distributed join; no step materializes on the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.operators.asof_join import asof_join


@dataclass
class ReferenceWarehouse:
    dim_product: DataFrame
    dim_product_subcategory: DataFrame
    dim_product_category: DataFrame
    dim_date: DataFrame
    dim_price_cost_history: DataFrame
    fact_product_sales: DataFrame


def build_reference_warehouse(
    product: DataFrame,
    product_subcategory: DataFrame,
    product_category: DataFrame,
    product_cost_history: DataFrame,
    product_list_price_history: DataFrame,
    sales_order_header: DataFrame,
    sales_order_detail: DataFrame,
) -> ReferenceWarehouse:
    """Reference ETL transform phase as one lazy Spark DAG."""
    # (1) finished goods only (etl.py:52), flag dropped
    dim_product = product.filter(F.col("FinishedGoodsFlag") == 1).drop(
        "FinishedGoodsFlag"
    )
    # (2) salable set — semi-join instead of the reference's collected IN-list
    salable = dim_product.select("ProductID").distinct()

    # (3) cost ⋈ price on the composite interval key (etl.py:64), salable only.
    # NULL EndDate (open interval) must match NULL: pandas merge treats NaN
    # keys as equal, so the Spark join needs null-safe equality (<=>), not
    # plain `=` (which would silently drop every open-interval row).
    c = product_cost_history.alias("c")
    p = product_list_price_history.alias("p")
    price_cost = (
        c.join(
            p,
            (F.col("c.ProductID") == F.col("p.ProductID"))
            & (F.col("c.StartDate") == F.col("p.StartDate"))
            & F.col("c.EndDate").eqNullSafe(F.col("p.EndDate")),
            "inner",
        )
        .select(
            F.col("c.ProductID").alias("ProductID"),
            F.col("c.StartDate").alias("StartDate"),
            F.col("c.EndDate").alias("EndDate"),
            "StandardCost",
            "ListPrice",
        )
        .join(salable, "ProductID", "left_semi")
    )

    # (4) DimDate: distinct validity intervals, surrogate id = row order
    # (etl.py:78-80 — pandas index+1; explicit orderBy makes it deterministic)
    w = Window.orderBy(F.col("StartDate").asc_nulls_last(), F.col("EndDate").asc_nulls_last())
    dim_date = (
        price_cost.select("StartDate", "EndDate")
        .distinct()
        .withColumn("Id", F.row_number().over(w))
    )

    # (5) attach interval ids (etl.py:83-84) — null-safe on the open EndDate
    dim_price_cost_history = (
        price_cost.alias("pc")
        .join(
            dim_date.alias("d"),
            (F.col("pc.StartDate") == F.col("d.StartDate"))
            & F.col("pc.EndDate").eqNullSafe(F.col("d.EndDate")),
        )
        .select(
            "ProductID",
            "StandardCost",
            "ListPrice",
            F.col("Id").alias("Interval"),
        )
    )

    # (6) order detail ⋈ header (etl.py:70), salable only (etl.py:73)
    detail = sales_order_detail.join(salable, "ProductID", "left_semi")
    fact = detail.join(
        sales_order_header.select("SalesOrderID", "OrderDate", "CustomerID"),
        "SalesOrderID",
        "left",
    )

    # (7) backward as-of against date-only intervals (etl.py:27-42: merge_asof
    # sorted by StartDate, direction backward, then interval post-filter with
    # NULL EndDate = open) + (8) dropna of unmatched (etl.py:88)
    dates = dim_date.withColumnRenamed("Id", "Interval")
    fact_priced = asof_join(
        fact,
        dates,
        left_on="OrderDate",
        right_on="StartDate",
        end_col="EndDate",
        how="inner",  # inner == left + dropna(etl.py:88)
    ).select(
        "ProductID",
        "OrderQty",
        "LineTotal",
        "SalesOrderID",
        "OrderDate",
        "CustomerID",
        "Interval",
    )

    return ReferenceWarehouse(
        dim_product=dim_product,
        dim_product_subcategory=product_subcategory,
        dim_product_category=product_category,
        dim_date=dim_date,
        dim_price_cost_history=dim_price_cost_history,
        fact_product_sales=fact_priced,
    )
