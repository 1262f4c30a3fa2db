"""MLlib clustering pipelines (reference §2.8).

Mirrors the reference's sklearn stage — StandardScaler → KMeans(k=4,
seed=42) over the 8-feature product matrix (reference
src/pipelines/clustering.py:125-133) — as a distributed MLlib Pipeline:
VectorAssembler → StandardScaler(withMean, withStd) → KMeans.

Parity caveat (SURVEY §4.3.3): sklearn's k-means++ init ≠ MLlib's
k-means‖, so label-for-label equality with the reference is undefined even
at the same seed. Correctness is partition quality (silhouette, stable
same-seed partitions), which the unit tests assert.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import ClusteringEvaluator
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 4  # reference src/pipelines/clustering.py:14
DEFAULT_SEED = 42  # reference src/pipelines/clustering.py:14


def kmeans_assign(
    df: DataFrame,
    feature_cols: list[str],
    k: int = DEFAULT_K,
    seed: int = DEFAULT_SEED,
    cluster_col: str = "cluster",
) -> DataFrame:
    """Standardize ``feature_cols`` and append a KMeans cluster id.

    The upstream plan (often a multi-join feature matrix) would otherwise
    re-execute once per fit pass (scaler fit + each KMeans step + the final
    transform), so the input is cached here and materialized once; the
    cluster output is tiny (id + features + label), so it is materialized
    off the cache and the cache released before returning.
    """
    df = df.cache()
    try:
        pipe = Pipeline(
            stages=[
                VectorAssembler(inputCols=feature_cols, outputCol="__feat"),
                StandardScaler(
                    inputCol="__feat", outputCol="__scaled", withMean=True, withStd=True
                ),
                KMeans(
                    featuresCol="__scaled", predictionCol=cluster_col, k=k, seed=seed
                ),
            ]
        )
        model = pipe.fit(df)
        # localCheckpoint materializes the (small) assignment output on the
        # executors and truncates lineage, so the cached input can be freed
        # without the returned plan recomputing the feature matrix.
        out = model.transform(df).drop("__feat", "__scaled").localCheckpoint(eager=True)
    finally:
        df.unpersist()
    return out


def assign_vectors(
    df: DataFrame,
    vec_col: str,
    k: int,
    seed: int = DEFAULT_SEED,
    cluster_col: str = "cluster",
) -> DataFrame:
    """KMeans over an ``array<float>`` embedding column (M6 shape).

    array_to_vector is a JVM expression — no Python per row.
    """
    from pyspark.ml.functions import array_to_vector

    withv = df.withColumn("__vec", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(featuresCol="__vec", predictionCol=cluster_col, k=k, seed=seed)
    model = km.fit(withv)
    return model.transform(withv).drop("__vec")


def silhouette(
    df: DataFrame, feature_cols: list[str], cluster_col: str = "cluster"
) -> float:
    """Mean silhouette (squared euclidean) of an assigned clustering (M8)."""
    withv = VectorAssembler(inputCols=feature_cols, outputCol="__feat").transform(df)
    ev = ClusteringEvaluator(
        featuresCol="__feat", predictionCol=cluster_col, metricName="silhouette"
    )
    return float(ev.evaluate(withv))
