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


def test_lstm_autoencoder_learns_beyond_pooled_baseline(spark):
    """The trained autoencoder must reconstruct (scaled) sequences better
    than the pooled embedder's best possible reconstruction — a constant
    per-sequence value, whose optimal MSE is the per-sequence variance.
    Beating it proves the model learned temporal structure, which is the
    capability the pooled stand-in lacks."""
    import numpy as np

    from data_warehouse_product_mix_clustering_spark.ml.autoencoder import SEQ_FEATURES
    from data_warehouse_product_mix_clustering_spark.ml.lstm_np import LSTMAutoencoderNP
    from data_warehouse_product_mix_clustering_spark.plans.warehouse import quarter_rollup

    q = quarter_rollup(spark, SF_SMOKE)
    rows = (
        q.orderBy("product_id", "quarter_key")
        .select("product_id", *SEQ_FEATURES)
        .collect()
    )
    by_pid: dict = {}
    for r in rows:
        by_pid.setdefault(r.product_id, []).append([float(r[f]) for f in SEQ_FEATURES])
    seqs = [np.array(v) for v in by_pid.values()]
    allv = np.vstack(seqs)
    mu, sd = allv.mean(0), allv.std(0)
    sd[sd == 0] = 1.0
    seqs = [(s - mu) / sd for s in seqs]

    num = sum(float(((s - s.mean(0)) ** 2).sum()) for s in seqs)
    den = sum(s.size for s in seqs)
    baseline = num / den  # optimal constant-per-sequence reconstruction

    model = LSTMAutoencoderNP(len(SEQ_FEATURES), 12, seed=2)
    model.fit(seqs, epochs=60)
    mse = model.reconstruction_mse(seqs)
    assert mse < baseline, f"LSTM mse {mse:.4f} ≥ pooled-baseline {baseline:.4f}"

    # determinism: same seed + data ⇒ identical embeddings
    again = LSTMAutoencoderNP(len(SEQ_FEATURES), 12, seed=2)
    again.fit(seqs, epochs=60)
    assert np.array_equal(model.encode(seqs), again.encode(seqs))


def test_lstm_embedding_pipeline_end_to_end(spark):
    """The distributed path: sample-train, mapInPandas-score, KMeans on the
    learned vectors. Embeddings must be 12-d, non-degenerate, and cluster."""
    from data_warehouse_product_mix_clustering_spark.ml.autoencoder import lstm_autoencoder_embeddings
    from data_warehouse_product_mix_clustering_spark.ml.pipelines import assign_vectors
    from data_warehouse_product_mix_clustering_spark.plans.warehouse import quarter_rollup

    q = quarter_rollup(spark, SF_SMOKE)
    emb = lstm_autoencoder_embeddings(q, epochs=15)
    rows = emb.collect()
    assert len(rows) == q.select("product_id").distinct().count()
    assert all(len(r.embedding) == 12 for r in rows)
    dims = {tuple(round(x, 6) for x in r.embedding) for r in rows}
    assert len(dims) > len(rows) // 2  # embeddings differ across products

    clustered = assign_vectors(emb, "embedding", k=4, order_col="product_id")
    labels = {r.cluster for r in clustered.select("cluster").distinct().collect()}
    assert labels == {0, 1, 2, 3}


def test_lstm_backward_matches_finite_differences():
    """Central-difference gradient check of the hand-derived BPTT: for
    sampled elements of EVERY parameter tensor, the analytic gradient must
    match (f(p+h) - f(p-h)) / 2h to tight relative error. This is the
    'finite-difference-checked' guarantee the README claims."""
    import numpy as np

    from data_warehouse_product_mix_clustering_spark.ml.lstm_np import LSTMAutoencoderNP, pad_batch

    rng = np.random.default_rng(3)
    seqs = [rng.normal(size=(t, 5)) for t in (4, 2, 6)]  # ragged → mask path
    X, lengths = pad_batch(seqs)
    T = X.shape[1]
    model = LSTMAutoencoderNP(input_size=5, hidden_size=7, seed=9)

    def loss_of() -> float:
        emb, _ = model._encode_forward(X, lengths)
        Y, _ = model._decode_forward(emb, T)
        mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float64)
        diff = (Y - X) * mask[:, :, None]
        return float((diff * diff).sum() / (mask.sum() * X.shape[2]))

    emb, enc_cache = model._encode_forward(X, lengths)
    Y, dec_cache = model._decode_forward(emb, T)
    loss, grads = model._backward(X, lengths, Y, enc_cache, dec_cache)
    assert abs(loss - loss_of()) < 1e-12

    # h balances truncation (O(h^2)) against roundoff amplification
    # (~1e-16/h on tiny-magnitude gradients); 1e-5 keeps both below tol.
    h = 1e-5
    for name, p in model.params.items():
        flat = p.reshape(-1)
        gflat = grads[name].reshape(-1)
        idxs = rng.choice(flat.size, size=min(6, flat.size), replace=False)
        for i in idxs:
            orig = flat[i]
            flat[i] = orig + h
            up = loss_of()
            flat[i] = orig - h
            down = loss_of()
            flat[i] = orig
            numeric = (up - down) / (2 * h)
            denom = max(abs(numeric), abs(gflat[i]), 1e-8)
            rel = abs(numeric - gflat[i]) / denom
            assert rel < 5e-5, f"{name}[{i}]: analytic {gflat[i]:.3e} vs numeric {numeric:.3e} (rel {rel:.2e})"


def test_lstm_reference_config_keeps_descending():
    """The reference trains 1000 epochs (notebooks/LSTM_features_learning.ipynb);
    this repo defaults to 150 because the loss is already past the pooled
    baseline by then. This test proves the reference config is REACHABLE:
    on a small synthetic corpus the full 1000-epoch run keeps improving —
    the loss at 1000 epochs is strictly below the loss at the 150-epoch
    default, and the tail of the curve is non-increasing overall."""
    import numpy as np

    from data_warehouse_product_mix_clustering_spark.ml.lstm_np import LSTMAutoencoderNP

    rng = np.random.default_rng(7)
    # 12 sequences with real temporal structure (sines + trend + noise):
    # something a longer fit can keep extracting signal from.
    seqs = []
    for i in range(12):
        t = np.arange(5 + (i % 4))[:, None]
        base = np.sin(0.7 * t + i) + 0.1 * t + 0.05 * rng.normal(size=(len(t), 3))
        seqs.append(np.concatenate([base, np.cos(0.3 * t + i)], axis=1))
    allv = np.vstack(seqs)
    mu, sd = allv.mean(0), allv.std(0)
    sd[sd == 0] = 1.0
    seqs = [(s - mu) / sd for s in seqs]

    model = LSTMAutoencoderNP(input_size=4, hidden_size=6, seed=2)
    losses = model.fit(seqs, epochs=1000, batch_size=16)
    assert len(losses) == 1000
    assert losses[999] < losses[149], (
        f"1000-epoch loss {losses[999]:.5f} not below 150-epoch {losses[149]:.5f}"
    )
    # The tail should still be trending down, not diverging: compare mean
    # loss over the last 100 epochs vs epochs 150-250.
    early = float(np.mean(losses[150:250]))
    late = float(np.mean(losses[-100:]))
    assert late < early, f"late mean {late:.5f} not below early mean {early:.5f}"


def test_product_clusters_fit_cached_per_session(spark):
    """product_clusters serves the SAME fitted plan on repeat calls (the
    engine-side @st.cache_data of reference Clustering_Analysis.py:24),
    keyed per (session, sf_dir); dead-session keys are evicted on insert,
    and the audit path never reads the cache (it fits via kmeans_assign
    directly, keeping the double-fit determinism contract real)."""
    from data_warehouse_product_mix_clustering_spark.plans import ml as ml_plans

    ml_plans._CLUSTER_CACHE.clear()
    a = ml_plans.product_clusters(spark, "/root/testdata/sf0.001")
    b = ml_plans.product_clusters(spark, "/root/testdata/sf0.001")
    assert a is b, "same (session, sf_dir) must reuse the fitted assignment"
    ml_plans._CLUSTER_CACHE[("dead-app-id", "/x")] = a
    ml_plans._CLUSTER_CACHE.pop(
        (spark.sparkContext.applicationId, "/root/testdata/sf0.001")
    )
    c = ml_plans.product_clusters(spark, "/root/testdata/sf0.001")
    assert ("dead-app-id", "/x") not in ml_plans._CLUSTER_CACHE, (
        "stale-session entries must be evicted on insert"
    )
    assert c is not a


def test_star_invalidation_clears_cluster_cache(spark):
    """invalidate_star_cache must also drop fitted clusterings built on
    that data (the downstream-invalidator chain), so the documented
    testdata-rewrite protocol leaves no stale fit behind."""
    from data_warehouse_product_mix_clustering_spark.etl.star_schema import invalidate_star_cache
    from data_warehouse_product_mix_clustering_spark.plans import ml as ml_plans

    ml_plans._CLUSTER_CACHE.clear()
    a = ml_plans.product_clusters(spark, "/root/testdata/sf0.001")
    assert len(ml_plans._CLUSTER_CACHE) == 1
    invalidate_star_cache("/root/testdata/sf0.001")
    assert len(ml_plans._CLUSTER_CACHE) == 0
    b = ml_plans.product_clusters(spark, "/root/testdata/sf0.001")
    assert b is not a, "post-invalidate call must refit, not reuse"


def test_kmeans_np_empty_cluster_repair_no_nan():
    """Empty-cluster repair must not steal a cluster's sole member (the
    NaN-center cascade — review r9): duplicate-heavy data with k close
    to the distinct-point count forces empties; every fit must return
    finite centers and k non-empty clusters when n >= k, and n < k must
    not divide by zero."""
    import numpy as np

    from data_warehouse_product_mix_clustering_spark.ml.kmeans_np import kmeans_fit

    # 3 distinct locations, many duplicates, k=3: k-means++ can seed two
    # centers on one location -> empty-cluster repair engages
    X = np.array([[0.0, 0.0]] * 5 + [[10.0, 0.0]] * 5 + [[0.0, 10.0]] * 1)
    for seed in range(6):
        labels, centers = kmeans_fit(X, k=3, seed=seed, n_init=1)
        assert np.isfinite(centers).all(), f"seed={seed}: NaN centers"
        assert len(set(labels.tolist())) == 3, f"seed={seed}: empty cluster"

    # n < k: unfillable clusters keep a finite center, no crash
    Y = np.array([[0.0, 0.0], [1.0, 1.0]])
    labels, centers = kmeans_fit(Y, k=4, seed=0, n_init=1)
    assert np.isfinite(centers).all()
    assert len(set(labels.tolist())) == 2


def test_lstm_fit_empty_corpus_raises():
    import numpy as np
    import pytest

    from data_warehouse_product_mix_clustering_spark.ml.lstm_np import LSTMAutoencoderNP

    m = LSTMAutoencoderNP(input_size=4, hidden_size=8, seed=0)
    with pytest.raises(ValueError, match="at least one training sequence"):
        m.fit([])
