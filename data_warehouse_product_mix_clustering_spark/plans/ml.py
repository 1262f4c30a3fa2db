"""ML-stage queries (reference §2.8: scale → cluster → profile).

``features_zscore`` is the StandardScaler math as pure SQL (oracle-checked,
population std like sklearn's default). The KMeans stages are MLlib
pipelines — algorithmically different init than the reference's sklearn
(SURVEY §4.3.3), so they are rows-only checks here with partition-quality
assertions in unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.functions.numeric import ratio_round, sql_ratio_round
from data_warehouse_product_mix_clustering_spark.ml.pipelines import (
    assign_vectors,
    kmeans_assign,
    silhouette,
)
from data_warehouse_product_mix_clustering_spark.plans.registry import register
from data_warehouse_product_mix_clustering_spark.plans.warehouse import _FEATURES_SQL, product_features
from data_warehouse_product_mix_clustering_spark.sources.registry import table

MATRIX_FEATURES = [
    "profit",
    "profit_margin",
    "average_unit_price",
    "avg_quantity_sold",
    "nunique_customer",
    "customer_loyalty",
    "revenue_growth",
    "selling_duration",
]

def _z_expr(c: str) -> str:
    raw = (
        f"(CAST({c} AS DOUBLE) - avg(CAST({c} AS DOUBLE)) OVER ())"
        f" / stddev_pop(CAST({c} AS DOUBLE)) OVER ()"
    )
    return f"{sql_ratio_round(raw)} AS z_{c}"


_Z_COLS = ",\n               ".join(_z_expr(c) for c in MATRIX_FEATURES)


@register(
    "features_zscore",
    oracle=f"""
        WITH feats AS ({_FEATURES_SQL})
        SELECT product_id,
               {_Z_COLS}
        FROM feats
    """,
)
def features_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardScaler semantics as a relational plan: z = (x − μ) / σ_pop.

    Exactly the reference's sklearn StandardScaler math (ddof=0,
    src/pipelines/clustering.py:127-128), expressed as one global agg
    broadcast back over the feature matrix — so it IS oracle-checkable,
    unlike the iterative KMeans stage.
    """
    feats = product_features(spark, sf_dir)
    stats = feats.agg(
        *[
            F.avg(F.col(c).cast("double")).alias(f"__mu_{c}")
            for c in MATRIX_FEATURES
        ],
        *[
            F.stddev_pop(F.col(c).cast("double")).alias(f"__sd_{c}")
            for c in MATRIX_FEATURES
        ],
    )
    return feats.crossJoin(F.broadcast(stats)).select(
        "product_id",
        *[
            ratio_round(
                (F.col(c).cast("double") - F.col(f"__mu_{c}")) / F.col(f"__sd_{c}")
            ).alias(f"z_{c}")
            for c in MATRIX_FEATURES
        ],
    )


@register("product_clusters", headline=True)
def product_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's production clustering: 8 features → scale → KMeans.

    Reference src/pipelines/clustering.py:125-136 (k=4, seed=42). MLlib
    k-means‖ init ⇒ partitions, not labels, are the contract; rows-only
    driver check + silhouette/determinism unit tests.
    """
    feats = product_features(spark, sf_dir)
    return kmeans_assign(feats, MATRIX_FEATURES, order_col="product_id").select(
        "product_id", F.col("cluster").cast("int").alias("cluster"), *MATRIX_FEATURES
    )


@register("cluster_profile")
def cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster stats incl. median profit (A7 shape, dashboard parity).

    Reference Clustering_Analysis.py:221-230: count, mean/median/sum of
    profit, mean margin, mean loyalty per learned cluster.
    """
    pc = product_clusters(spark, sf_dir)
    return pc.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_products"),
        ratio_round(F.avg("profit"), 2).alias("avg_profit"),
        ratio_round(F.median("profit"), 2).alias("median_profit"),
        ratio_round(F.sum("profit"), 2).alias("total_profit"),
        ratio_round(F.avg("profit_margin")).alias("avg_margin"),
        ratio_round(F.avg("customer_loyalty")).alias("avg_loyalty"),
    )


@register("cluster_trajectories")
def cluster_trajectories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean quarterly revenue trajectory per learned cluster.

    Reference notebooks/LSTM_features_learning.ipynb cell 24: the
    time-series view of each cluster's behavior. Labels come from the
    KMeans fit (⇒ rows-only check; the category-axis twin
    ``trajectory_stats`` carries the oracle for the same math), the
    quarterly grid from ``quarter_rollup``; one broadcast of the tiny
    (product, cluster) map onto the rollup.
    """
    from data_warehouse_product_mix_clustering_spark.plans.warehouse import quarter_rollup

    pc = product_clusters(spark, sf_dir).select("product_id", "cluster")
    q = quarter_rollup(spark, sf_dir)
    return (
        q.join(F.broadcast(pc), "product_id")
        .groupBy("cluster", "quarter_key")
        .agg(
            F.count(F.lit(1)).alias("n_products"),
            ratio_round(F.avg("revenue"), 2).alias("avg_revenue"),
            ratio_round(F.sum("revenue"), 2).alias("total_revenue"),
        )
    )


@register("embedding_clusters")
def embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans k=10 over the raw embedding vectors (M6 shape).

    array_to_vector keeps the whole path JVM-side; the driver's rows-only
    check covers schema/rows, unit tests cover determinism.
    """
    emb = table(spark, "embeddings", sf_dir)
    return assign_vectors(emb, "embedding", k=10, order_col="vec_id").select(
        "vec_id", "label", F.col("cluster").cast("int").alias("cluster")
    )


@register("clustering_quality")
def clustering_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silhouette of the product clustering — the M8 evaluation surface."""
    pc = kmeans_assign(product_features(spark, sf_dir), MATRIX_FEATURES, order_col="product_id")
    s = silhouette(pc, MATRIX_FEATURES)
    sizes = pc.groupBy("cluster").count()
    return sizes.agg(
        F.lit(round(s, 6)).alias("silhouette"),
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.min("count").cast("long").alias("min_cluster_size"),
        F.max("count").cast("long").alias("max_cluster_size"),
    )


@register(
    "cluster_quality_audit",
    oracle="""
        SELECT CAST(4 AS BIGINT) AS n_clusters,
               TRUE AS all_assigned,
               TRUE AS silhouette_pass,
               TRUE AS same_seed_identical
    """,
)
def cluster_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-attested clustering quality gate (the ``ann_recall_audit``
    pattern): the oracle pins the CONTRACT, Spark computes the measured
    truth, and any regression flips the hash row red.

    Four invariants of the reference's production clustering (reference
    src/pipelines/clustering.py:125-136, k=4 seed=42):
    - ``n_clusters``: the fit actually uses all 4 clusters (an empty
      cluster means a degenerate init survived);
    - ``all_assigned``: every product in the feature matrix received a
      label in both fits, none NULL;
    - ``silhouette_pass``: scaled-space silhouette ≥ 0.1, the same floor
      the unit suite pins (test_product_clustering_partition_quality);
    - ``same_seed_identical``: a second same-seed fit yields the IDENTICAL
      partition — checked relationally: the (label_a, label_b) mapping is
      a bijection, i.e. distinct pairs == distinct labels on each side.

    This converts the rows-only clustering family's semantics
    (``product_clusters``, ``clustering_quality``, ``cluster_profile``)
    into a driver-checkable row.
    """
    feats = product_features(spark, sf_dir).localCheckpoint(eager=True)
    n_products = feats.count()
    a = kmeans_assign(feats, MATRIX_FEATURES, order_col="product_id")
    b = kmeans_assign(feats, MATRIX_FEATURES, order_col="product_id")
    s = silhouette(a, MATRIX_FEATURES)
    pairs = a.select("product_id", F.col("cluster").alias("c1")).join(
        b.select("product_id", F.col("cluster").alias("c2")), "product_id"
    )
    agg = pairs.agg(
        F.countDistinct("c1").alias("k1"),
        F.countDistinct("c2").alias("k2"),
        F.countDistinct("c1", "c2").alias("kp"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.count(F.when(F.col("c1").isNull() | F.col("c2").isNull(), 1)).alias(
            "n_null"
        ),
    )
    return agg.select(
        F.col("k1").cast("long").alias("n_clusters"),
        (
            (F.col("n_pairs") == F.lit(n_products)) & (F.col("n_null") == 0)
        ).alias("all_assigned"),
        F.lit(bool(s >= 0.1)).alias("silhouette_pass"),
        ((F.col("kp") == F.col("k1")) & (F.col("kp") == F.col("k2"))).alias(
            "same_seed_identical"
        ),
    )


@register("features_pca")
def features_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA(k=4) over the standardized feature matrix (M3).

    Reference src/utils/pca.py:3-9 defines this but never wires it into a
    pipeline; exposed here as a first-class query. Model output (SVD basis
    signs are data-dependent) ⇒ rows-only check; the variance ordering is
    unit-tested.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import PCA, StandardScaler, VectorAssembler
    from pyspark.ml.functions import vector_to_array

    feats = product_features(spark, sf_dir)
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=MATRIX_FEATURES, outputCol="__feat"),
            StandardScaler(
                inputCol="__feat", outputCol="__scaled", withMean=True, withStd=True
            ),
            PCA(k=4, inputCol="__scaled", outputCol="__pc"),
        ]
    )
    feats = feats.cache()
    try:
        model = pipe.fit(feats)
        out = (
            model.transform(feats)
            .select(
                "product_id",
                *[
                    F.round(vector_to_array("__pc")[i], 6).alias(f"pc{i}")
                    for i in range(4)
                ],
            )
            .localCheckpoint(eager=True)
        )
    finally:
        feats.unpersist()
    return out
