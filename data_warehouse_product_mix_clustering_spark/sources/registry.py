"""Testdata registry: load the driver's parquet tables as DataFrames/views.

Scans are plain ``spark.read.parquet`` so Catalyst gets full predicate
pushdown + column pruning; no schema is forced on read (parquet carries it),
but the expected schemas live in ``schemas.py`` for validation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_warehouse_product_mix_clustering_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` across testdata vintages, type-gated.

    Two on-disk encodings have been observed across driver rounds:

    - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so it
      arrives as epoch-nanos LongType via the ``nanosAsLong`` legacy conf →
      truncate to a µs timestamp (the same truncation DuckDB applies).
    - parquet timestamp[us] (current): arrives as TIMESTAMP_NTZ → cast to the
      session-tz TIMESTAMP, value-preserving because the session tz is UTC
      (session.py pins ``spark.sql.session.timeZone=UTC``).

    Applying the nanos division unconditionally is what crashed round 3
    (AnalysisException on TIMESTAMP_NTZ) and, on the streaming path, silently
    collapsed µs values to ~1970 — hence the explicit type gate.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# (applicationId, path) → resolved scan DataFrame. ``spark.read.parquet``
# lists the path and reads footers for schema on EVERY call — driver-side
# metadata work a real engine caches in its catalog. DataFrames are
# immutable plans, so reusing one is safe; keying on applicationId drops
# entries from stopped sessions naturally (a new session gets a new id).
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


def table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one testdata table. Lazy; nothing is scanned until an action.

    ``events`` gets its ``ts`` column normalized to a µs session-tz
    timestamp regardless of the file's encoding (see normalize_events_ts).
    The resolved scan is cached per (session, path) — repeated plan
    construction over the same table skips the file-listing/footer read.
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (spark.sparkContext.applicationId, path)
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    if name == "events":
        # Harmless for µs files; required in case ts is TIMESTAMP(NANOS).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = normalize_events_ts(spark.read.parquet(path))
    else:
        df = spark.read.parquet(path)
    _TABLE_CACHE[key] = df
    return df


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
