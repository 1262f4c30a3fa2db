"""ML-stage tests (SURVEY §5.3): partition quality and cross-run partition
similarity — never exact label equality. Two sources of legitimate
divergence: sklearn k-means++ vs MLlib k-means‖ init, and MLlib's
tree-aggregated centroid sums whose FP combine order follows task
completion order (borderline points may flip between same-seed runs)."""

from __future__ import annotations

from collections import Counter

from data_warehouse_product_mix_clustering_spark.ml.pipelines import kmeans_assign, silhouette
from data_warehouse_product_mix_clustering_spark.plans.ml import MATRIX_FEATURES
from data_warehouse_product_mix_clustering_spark.plans.warehouse import product_features

from conftest import SF_SMOKE


def adjusted_rand_index(a: dict[int, int], b: dict[int, int]) -> float:
    """ARI between two labelings of the same key set (no sklearn here)."""
    keys = sorted(a)
    assert sorted(b) == keys
    cont: Counter[tuple[int, int]] = Counter((a[k], b[k]) for k in keys)
    ai = Counter(a[k] for k in keys)
    bi = Counter(b[k] for k in keys)
    comb2 = lambda n: n * (n - 1) // 2
    sum_ij = sum(comb2(n) for n in cont.values())
    sum_a = sum(comb2(n) for n in ai.values())
    sum_b = sum(comb2(n) for n in bi.values())
    n2 = comb2(len(keys))
    expected = sum_a * sum_b / n2
    max_idx = (sum_a + sum_b) / 2
    if max_idx == expected:
        return 1.0
    return (sum_ij - expected) / (max_idx - expected)


def _assign(spark) -> dict[int, int]:
    feats = product_features(spark, SF_SMOKE)
    pc = kmeans_assign(feats, MATRIX_FEATURES, order_col="product_id")
    return {r.product_id: r.cluster for r in pc.select("product_id", "cluster").collect()}


def test_product_clustering_partition_quality(spark):
    feats = product_features(spark, SF_SMOKE)
    pc = kmeans_assign(feats, MATRIX_FEATURES, order_col="product_id")
    clusters = {r.cluster for r in pc.select("cluster").distinct().collect()}
    assert clusters == {0, 1, 2, 3}, f"expected 4 non-empty clusters, got {clusters}"
    s = silhouette(pc, MATRIX_FEATURES)
    assert s > 0.1, f"silhouette {s:.3f} suspiciously low for 4-means on 8 features"


def test_product_clustering_same_seed_similar(spark):
    """Same seed + same data ⇒ near-identical partitions (ARI ≥ 0.9)."""
    a, b = _assign(spark), _assign(spark)
    ari = adjusted_rand_index(a, b)
    assert ari >= 0.9, f"same-seed partitions diverged: ARI={ari:.3f}"
