"""Property tests for the snapped-arithmetic logistic trainer
(ml/logreg.py) — the determinism guarantees the audit relies on,
exercised over generated inputs rather than one corpus."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from data_warehouse_product_mix_clustering_spark.ml.logreg import (
    BIAS_KEY,
    _snap,
    train_logreg_py,
)

_feat_val = st.floats(
    min_value=0.0, max_value=1.0, allow_nan=False, allow_infinity=False
).map(_snap)

_dataset = st.dictionaries(
    keys=st.integers(min_value=0, max_value=200),
    values=st.dictionaries(
        keys=st.sampled_from(["aaa", "bbb", "ccc", "ddd", "__len", "__sw"]),
        values=_feat_val,
        max_size=6,
    ),
    min_size=2,
    max_size=30,
)


@settings(max_examples=25, deadline=None)
@given(feats=_dataset, seed=st.integers(0, 2**16))
def test_twin_is_permutation_invariant(feats, seed):
    """The twin's result cannot depend on dict insertion order — the
    property that lets it stand in for ANY distributed partitioning.
    Rebuild feats/labels with shuffled key order; weights and losses
    must be identical."""
    rng = random.Random(seed)
    labels = {i: float(rng.randint(0, 1)) for i in feats}
    w1, l1 = train_logreg_py(feats, labels, n_iter=5, lr=2.0, track_loss=True)

    ids = list(feats)
    rng.shuffle(ids)
    feats2 = {
        i: dict(sorted(feats[i].items(), key=lambda kv: rng.random()))
        for i in ids
    }
    labels2 = {i: labels[i] for i in ids}
    w2, l2 = train_logreg_py(feats2, labels2, n_iter=5, lr=2.0, track_loss=True)
    assert w1 == w2
    assert l1 == l2


@settings(max_examples=25, deadline=None)
@given(feats=_dataset, seed=st.integers(0, 2**16))
def test_twin_weights_are_snapped_and_bias_present(feats, seed):
    """Every emitted weight sits on the 6-dp snap lattice (the contract
    that makes cross-engine equality checkable with ==), and the
    injected bias always trains."""
    rng = random.Random(seed)
    labels = {i: float(rng.randint(0, 1)) for i in feats}
    w, _ = train_logreg_py(feats, labels, n_iter=4, lr=2.0)
    assert BIAS_KEY in w
    for v in w.values():
        assert v == _snap(v)
        assert abs(v) < 1e6


@settings(max_examples=15, deadline=None)
@given(feats=_dataset, seed=st.integers(0, 2**16))
def test_softmax_twin_is_permutation_invariant(feats, seed):
    """The multiclass twin inherits the binary twin's guarantee: dict
    insertion order cannot move the nested weight dicts or losses."""
    from data_warehouse_product_mix_clustering_spark.ml.logreg import train_softmax_py

    rng = random.Random(seed)
    labels = {i: rng.choice(["en", "und", "xx"]) for i in feats}
    w1, l1 = train_softmax_py(feats, labels, n_iter=4, lr=2.0, track_loss=True)

    ids = list(feats)
    rng.shuffle(ids)
    feats2 = {
        i: dict(sorted(feats[i].items(), key=lambda kv: rng.random()))
        for i in ids
    }
    labels2 = {i: labels[i] for i in ids}
    w2, l2 = train_softmax_py(
        feats2, labels2, n_iter=4, lr=2.0, track_loss=True
    )
    assert w1 == w2
    assert l1 == l2


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=5000),
    k=st.integers(min_value=1, max_value=64),
    seed=st.integers(0, 2**16),
)
def test_ntile_from_rank_py_matches_sql_definition(n, k, seed):
    """operators/packing.py::ntile_from_rank_py ≡ the SQL ntile(k)
    definition over random sizes: buckets are contiguous, 1..min(n,k),
    sizes within one of each other with the larger buckets first —
    checked by reconstructing bucket sizes from the formula over every
    rank."""
    from data_warehouse_product_mix_clustering_spark.operators.packing import ntile_from_rank_py

    buckets = [ntile_from_rank_py(r, n, k) for r in range(1, n + 1)]
    assert buckets == sorted(buckets)
    assert buckets[0] == 1 and buckets[-1] == min(n, k) if n else True
    sizes: dict[int, int] = {}
    for b in buckets:
        sizes[b] = sizes.get(b, 0) + 1
    counts = [sizes[b] for b in sorted(sizes)]
    assert sum(counts) == n
    assert max(counts) - min(counts) <= 1
    assert counts == sorted(counts, reverse=True)  # big buckets first
