"""Property tests for round-9 operators whose correctness rests on a
filter-theory argument rather than a direct formula: the edit-distance
join's prefix/count/short-arm completeness and the degree-oriented
triangle census. Each property drives Spark, so example counts are
deliberately small — the point is adversarial structure (repeats, empty
strings, shared prefixes; hubs, isolated cliques), not volume."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("strategy", ["prefix", "broadcast"])
def test_edit_distance_join_matches_bruteforce_random(spark, seed, strategy):
    """Both strategies equal a pure-Python brute force on adversarial
    random corpora: tiny alphabet (dense near-matches), lengths straddling
    the short-string boundary (0..8 for q=2, k<=2), heavy repeats."""
    from data_warehouse_product_mix_clustering_spark.operators.strings import edit_distance_join

    rng = random.Random(seed)
    alphabet = "abc"
    k = rng.choice([1, 2])

    def word() -> str:
        return "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 8))
        )

    probe = [(i, word()) for i in range(12)]
    corpus = [(i, word()) for i in range(25)]
    want = {
        (pi, ci, _levenshtein(pw, cw))
        for (pi, pw), (ci, cw) in itertools.product(probe, corpus)
        if _levenshtein(pw, cw) <= k
    }
    got = {
        (r.pid, r.cid, r.distance)
        for r in edit_distance_join(
            spark.createDataFrame(probe, "pid long, pname string"),
            spark.createDataFrame(corpus, "cid long, cname string"),
            "pid", "cid", "pname", "cname",
            max_dist=k, strategy=strategy,
        ).collect()
    }
    assert got == want, f"seed={seed} k={k}: {len(got)} vs {len(want)} pairs"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_triangle_stats_matches_bruteforce_random(spark, seed):
    """The degree-oriented census equals a pure-Python enumeration on
    random graphs with a planted hub (the skew case the orientation
    exists for) plus a disjoint clique."""
    from data_warehouse_product_mix_clustering_spark.operators.graph import triangle_stats

    rng = random.Random(seed)
    n = 14
    edges = {(a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.25}
    edges |= {(0, b) for b in range(1, n) if rng.random() < 0.8}  # hub 0
    edges |= {(a, b) for a in (20, 21, 22) for b in (20, 21, 22) if a < b}  # K3

    adj = {v: set() for e in edges for v in e}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want_tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if c > b
    )
    want_wedges = sum(len(nb) * (len(nb) - 1) // 2 for nb in adj.values())

    got = triangle_stats(
        spark.createDataFrame(sorted(edges), "src long, dst long")
    ).first()
    assert (got.n_nodes, got.n_edges) == (len(adj), len(edges))
    assert (got.n_triangles, got.n_wedges) == (want_tri, want_wedges), f"seed={seed}"


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_apply_agg_delta_matches_recompute_random(spark, seed):
    """The incremental-view-maintenance algebra on random CDC batches:
    random adds/removes/attr-changes INCLUDING group moves and NULL
    group keys / NULL measures, maintained rollup ≡ full recompute
    (groups die and are born correctly, NULL keys maintain null-safe)."""
    from data_warehouse_product_mix_clustering_spark.operators.incremental_agg import apply_agg_delta
    from data_warehouse_product_mix_clustering_spark.sources.versioned import version_diff, write_version

    rng = random.Random(seed)
    groups = ["a", "b", "c", None]

    def row(i):
        return (
            i,
            rng.choice(groups),
            None if rng.random() < 0.15 else round(rng.uniform(-50, 50), 2),
        )

    v0 = [row(i) for i in range(40)]
    v1 = []
    for r in v0:
        p = rng.random()
        if p < 0.25:
            continue  # removed
        if p < 0.55:
            v1.append(row(r[0]))  # changed (possibly group move / NULL flip)
        else:
            v1.append(r)  # untouched
    v1 += [row(i) for i in range(100, 100 + rng.randint(0, 8))]  # added

    import tempfile, shutil

    root = tempfile.mkdtemp()
    try:
        tdir = root + "/t"
        schema = "id long, g string, x double"
        write_version(spark.createDataFrame(v0, schema), tdir)
        write_version(spark.createDataFrame(v1, schema), tdir)

        old_agg = (
            spark.createDataFrame(v0, schema)
            .groupBy("g")
            .agg(F.sum(F.coalesce("x", F.lit(0.0))).alias("sx"), F.count(F.lit(1)).alias("n"))
        )
        maintained = apply_agg_delta(
            old_agg,
            version_diff(spark, tdir, 0, 1, key=["id"]),
            ["g"],
            {"sx": "x"},
            count_col="n",
        )
        recomputed = (
            spark.createDataFrame(v1, schema)
            .groupBy("g")
            .agg(F.sum(F.coalesce("x", F.lit(0.0))).alias("sx"), F.count(F.lit(1)).alias("n"))
        )
        got = {r["g"]: (round(r["sx"], 6), r["n"]) for r in maintained.collect()}
        want = {r["g"]: (round(r["sx"], 6), r["n"]) for r in recomputed.collect()}
        assert got == want, f"seed={seed}: {got} vs {want}"
    finally:
        shutil.rmtree(root, ignore_errors=True)
