"""Testdata registry: load the driver's parquet tables as DataFrames/views.

Scans are plain ``spark.read.parquet`` so Catalyst gets full predicate
pushdown + column pruning; no schema is forced on read (parquet carries it),
but the expected schemas live in ``schemas.py`` for validation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_product_mix_clustering_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one testdata table. Lazy; nothing is scanned until an action.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as epoch-nanos long (legacy conf, runtime
    settable) and truncate to a µs timestamp — the same truncation DuckDB
    applies, so oracle comparisons stay exact.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_testdata(
    spark: SparkSession,
    sf_dir: str | None = None,
    register_views: bool = False,
) -> dict[str, DataFrame]:
    """Load every testdata table; optionally register temp views for SQL."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = table(spark, name, sf_dir)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
