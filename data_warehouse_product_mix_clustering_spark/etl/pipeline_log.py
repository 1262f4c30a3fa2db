"""Warehouse build runner + pipeline run log (S6-S9 + O2).

The reference's load phase replaces six warehouse tables and appends a
(PipelineName, LastUpdate) row to ``PipelineLog`` (reference
src/pipelines/etl.py:93-121). Spark-first: namespace DDL via the session
catalog, atomic parquet overwrites per table, and an append-mode 1-row
write for the log — no raw-SQL INSERT strings.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from data_warehouse_product_mix_clustering_spark.etl.star_schema import build_star_schema
from data_warehouse_product_mix_clustering_spark.sources.io import write_parquet_table

LOG_SCHEMA = StructType(
    [
        StructField("PipelineName", StringType(), False),
        StructField("LastUpdate", TimestampType(), False),
    ]
)


def log_run(
    spark: SparkSession,
    warehouse_dir: str,
    pipeline_name: str,
    at: datetime | None = None,
) -> None:
    """Append one run row (S9). The log table is created on first append."""
    at = at or datetime.now(timezone.utc)
    row = spark.createDataFrame([(pipeline_name, at)], LOG_SCHEMA)
    row.write.mode("append").parquet(os.path.join(warehouse_dir, "PipelineLog"))


def latest_run(spark: SparkSession, warehouse_dir: str) -> DataFrame:
    """The dashboard's freshness probe: ORDER BY LastUpdate DESC LIMIT 1 (O2).

    Reference Clustering_Analysis.py:29-34.
    """
    log = spark.read.parquet(os.path.join(warehouse_dir, "PipelineLog"))
    return log.orderBy(F.col("LastUpdate").desc()).limit(1)


def run_warehouse_build(
    spark: SparkSession, sf_dir: str, warehouse_dir: str
) -> dict[str, str]:
    """The ETL load phase (S6): star-schema tables → atomic parquet overwrite.

    Returns {table: path}. Each table is fully replaced, like the
    reference's ``to_sql(if_exists='replace')`` (etl.py:102-107) — at
    production scale the fact table would move to partition-overwrite on
    the date axis instead (partitionBy is plumbed through).
    """
    star = build_star_schema(spark, sf_dir)
    out: dict[str, str] = {}
    for name, df in [
        ("DimProduct", star.dim_product),
        ("DimDate", star.dim_date),
        ("DimProductPriceCostHistory", star.price_history),
        ("FactProductSales", star.fact_sales),
    ]:
        path = os.path.join(warehouse_dir, name)
        write_parquet_table(df, path, mode="overwrite")
        out[name] = path
    log_run(spark, warehouse_dir, "etl")
    return out
