"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``data_warehouse_product_mix_clustering_spark.plans.registry`` — every implemented
operator from SURVEY.md §2 is a named query there with (where SQL-expressible)
a DuckDB oracle. The driver runs ``entry(spark)`` as a smoke check and each
``queries()[name]`` vs ``oracle_sql()[name]`` at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_product_mix_clustering_spark.plans.registry import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (dashboard cluster-summary shape) on sf0.001."""
    qs = all_queries()
    return qs["cluster_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
