"""ML-stage tests (SURVEY §5.3): partition quality and same-seed stability,
never label equality — sklearn k-means++ vs MLlib k-means‖ differ by design."""

from __future__ import annotations

from data_warehouse_product_mix_clustering_spark.ml.pipelines import kmeans_assign, silhouette
from data_warehouse_product_mix_clustering_spark.plans.ml import MATRIX_FEATURES
from data_warehouse_product_mix_clustering_spark.plans.warehouse import product_features

from conftest import SF_SMOKE


def _assignments(spark):
    feats = product_features(spark, SF_SMOKE).cache()
    pc = kmeans_assign(feats, MATRIX_FEATURES)
    return feats, pc


def test_product_clustering_partition_quality(spark):
    feats, pc = _assignments(spark)
    rows = pc.select("product_id", "cluster").collect()
    clusters = {r.cluster for r in rows}
    assert clusters == {0, 1, 2, 3}, f"expected 4 non-empty clusters, got {clusters}"
    s = silhouette(pc, MATRIX_FEATURES)
    assert s > 0.2, f"silhouette {s:.3f} suspiciously low for 4-means on 8 features"


def test_product_clustering_same_seed_stable(spark):
    feats, pc1 = _assignments(spark)
    _, pc2 = _assignments(spark)
    a = {(r.product_id, r.cluster) for r in pc1.collect()}
    b = {(r.product_id, r.cluster) for r in pc2.collect()}
    assert a == b, "same seed + same data must give identical partitions"
