"""Pipeline-parity golden test (SURVEY §5.2, FIXTURES.md §A):
the reference-shaped ETL run end-to-end on a fixture containing every
documented edge case, compared against hand-computed golden outputs."""

from __future__ import annotations

import datetime as dt

import pytest

from data_warehouse_product_mix_clustering_spark.etl.reference_pipeline import build_reference_warehouse

D = lambda s: dt.datetime.fromisoformat(s)

A_START, A_END = D("2024-01-01"), D("2024-06-30")
B_START = D("2024-07-01")


@pytest.fixture(scope="module")
def warehouse(spark):
    product = spark.createDataFrame(
        [
            (1, "P1 bike", 10, 1),
            (2, "P2 helmet", 11, 1),
            (3, "P3 frame-part", 10, 0),  # NOT finished goods → filtered
            (4, "P4 no-history", 11, 1),
        ],
        ["ProductID", "Name", "ProductSubcategoryID", "FinishedGoodsFlag"],
    )
    subcat = spark.createDataFrame(
        [(10, "Bikes-sub", 100), (11, "Gear-sub", 101)],
        ["ProductSubcategoryID", "Name", "ProductCategoryID"],
    )
    cat = spark.createDataFrame(
        [(100, "Bikes"), (101, "Gear")], ["ProductCategoryID", "Name"]
    )
    cost_hist = spark.createDataFrame(
        [
            (1, A_START, A_END, 10.0),
            (1, B_START, None, 12.0),  # open interval (NULL EndDate)
            (2, A_START, A_END, 5.0),  # duplicate (Start, End) pair → DimDate dedup
            (2, B_START, None, 6.0),  # cost-only row (no price twin) → dropped
            (3, A_START, A_END, 1.0),  # non-salable product → semi-join drop
        ],
        ["ProductID", "StartDate", "EndDate", "StandardCost"],
    )
    price_hist = spark.createDataFrame(
        [
            (1, A_START, A_END, 20.0),
            (1, B_START, None, 22.0),
            (2, A_START, A_END, 9.0),
            (3, A_START, A_END, 2.0),
        ],
        ["ProductID", "StartDate", "EndDate", "ListPrice"],
    )
    header = spark.createDataFrame(
        [
            (1, D("2023-12-01"), 500),  # before every interval → dropped
            (2, D("2024-01-01"), 501),  # exactly StartDate (inclusive)
            (3, D("2024-06-30"), 502),  # exactly EndDate (inclusive)
            (4, D("2024-08-15"), 501),  # inside the open interval
            (5, D("2024-03-01"), 503),  # P3's order → product filtered
            (6, D("2024-02-10"), 504),  # P4: salable, NO history → date-matched
        ],
        ["SalesOrderID", "OrderDate", "CustomerID"],
    )
    detail = spark.createDataFrame(
        [
            (1, 1, 2, 40.0),
            (2, 1, 1, 20.0),
            (3, 2, 3, 27.0),
            (4, 1, 1, 22.0),
            (5, 3, 1, 2.0),
            (6, 4, 5, 50.0),
            (999, 1, 1, 20.0),  # orphan detail (no header) → NULL date → dropped
        ],
        ["SalesOrderID", "ProductID", "OrderQty", "LineTotal"],
    )
    return build_reference_warehouse(
        product, subcat, cat, cost_hist, price_hist, header, detail
    )


def test_dim_product_filters_finished_goods(warehouse):
    assert {r.ProductID for r in warehouse.dim_product.collect()} == {1, 2, 4}


def test_dim_date_dedups_intervals_with_stable_ids(warehouse):
    rows = {(r.StartDate, r.EndDate): r.Id for r in warehouse.dim_date.collect()}
    assert rows == {(A_START, A_END): 1, (B_START, None): 2}


def test_price_cost_history_inner_join_and_salable_filter(warehouse):
    rows = {
        (r.ProductID, r.Interval): (r.StandardCost, r.ListPrice)
        for r in warehouse.dim_price_cost_history.collect()
    }
    # P2's cost-only open-interval row and P3's rows must be gone
    assert rows == {
        (1, 1): (10.0, 20.0),
        (1, 2): (12.0, 22.0),
        (2, 1): (5.0, 9.0),
    }


def test_fact_asof_golden(warehouse):
    rows = {
        r.SalesOrderID: (r.ProductID, r.Interval, r.CustomerID)
        for r in warehouse.fact_product_sales.collect()
    }
    assert rows == {
        2: (1, 1, 501),  # StartDate boundary inclusive
        3: (2, 1, 502),  # EndDate boundary inclusive
        4: (1, 2, 501),  # open interval
        6: (4, 1, 504),  # salable without history still date-matches (ref semantics)
    }


def test_feature_math_golden(spark, warehouse):
    """The 8-feature math on the fixture warehouse, vs hand-derived values.

    Reference src/pipelines/clustering.py:79-121 semantics: FINAL_DATE =
    max(OrderDate)+1d = 2024-08-16; active window = FINAL_DATE - 365d =
    2023-08-17 -> all 4 surviving fact rows are active.
    """
    from pyspark.sql import functions as F

    fact = warehouse.fact_product_sales
    pch = warehouse.dim_price_cost_history
    priced = fact.join(pch, ["ProductID", "Interval"], "left").withColumn(
        "profit", F.col("LineTotal") - F.col("StandardCost") * F.col("OrderQty")
    )
    rows = {
        r.ProductID: r
        for r in priced.groupBy("ProductID")
        .agg(
            F.sum("profit").alias("profit"),
            F.sum("LineTotal").alias("rev"),
            F.sum("OrderQty").alias("qty"),
            F.count_distinct("SalesOrderID").alias("orders"),
            F.count_distinct("CustomerID").alias("cust"),
        )
        .collect()
    }
    # P1: orders 2 & 4 -> rev 42, qty 2, profit (20-10*1) + (22-12*1) = 20
    assert rows[1].rev == 42.0 and rows[1].qty == 2 and rows[1].profit == 20.0
    assert rows[1].orders == 2 and rows[1].cust == 1  # same customer twice
    # P2: order 3 -> rev 27, qty 3, profit 27 - 5*3 = 12
    assert rows[2].rev == 27.0 and rows[2].profit == 12.0
    # P4: no history -> NULL cost -> NULL profit (reference drops these in
    # clustering.py:80 dropna(subset=[StandardCost]))
    assert rows[4].profit is None and rows[4].rev == 50.0
