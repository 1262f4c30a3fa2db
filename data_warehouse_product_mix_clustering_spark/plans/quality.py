"""Data-quality queries: table profiling + contract checks over lineitem.

The pre-publish guardrail surface of the ingestion pipeline
(operators/quality.py), exercised on the biggest testdata table with full
DuckDB oracles — profiling and constraint math must agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_product_mix_clustering_spark.operators.quality import check_constraints, profile_table
from data_warehouse_product_mix_clustering_spark.plans.registry import register
from data_warehouse_product_mix_clustering_spark.sources.registry import table

_PROFILE_COLS = ["l_orderkey", "l_quantity", "l_discount", "l_shipdate", "l_returnflag"]


@register(
    "lineitem_profile",
    oracle=f"""
        SELECT *
        FROM (
            {" UNION ALL ".join(
                f'''SELECT '{c}' AS column_name,
                       CAST(count(*) AS BIGINT) AS n_rows,
                       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
                       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
                       CAST(min({c}) AS VARCHAR) AS min_value,
                       CAST(max({c}) AS VARCHAR) AS max_value
                FROM lineitem'''
                for c in _PROFILE_COLS
            )}
        )
    """,
)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the fact table in ONE scan (stack-pivoted)."""
    return profile_table(table(spark, "lineitem", sf_dir), _PROFILE_COLS)


@register(
    "lineitem_quality",
    oracle="""
        SELECT 'not_null(l_orderkey)' AS constraint,
               CAST(count(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) AS violations
        FROM lineitem
        UNION ALL
        SELECT 'range(l_quantity,[1.0,50.0])',
               CAST(count(*) FILTER (WHERE l_quantity IS NOT NULL
                                       AND (l_quantity < 1 OR l_quantity > 50)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'range(l_discount,[0.0,0.1])',
               CAST(count(*) FILTER (WHERE l_discount IS NOT NULL
                                       AND (l_discount < 0 OR l_discount > 0.1)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'unique(l_orderkey,l_linenumber)',
               CAST(coalesce(sum(n - 1), 0) AS BIGINT)
        FROM (SELECT count(*) AS n FROM lineitem
              GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
    """,
)
def lineitem_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract check: key not-null + uniqueness, business-range bounds.

    not-null and ranges share one scan; the composite-key uniqueness check
    is one grouped pass. All-zero violations = contract honored.
    """
    return check_constraints(
        table(spark, "lineitem", sf_dir),
        not_null=["l_orderkey"],
        unique=[["l_orderkey", "l_linenumber"]],
        ranges={"l_quantity": (1.0, 50.0), "l_discount": (0.0, 0.1)},
    )
