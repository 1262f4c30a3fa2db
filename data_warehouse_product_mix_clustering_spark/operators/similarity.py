"""Vector-similarity operators over an embedding column (``array<float>``).

Training-data-pipeline surface (the reference's nearest analogue is the
KMeans feature matrix, reference src/pipelines/clustering.py:125-131; ANN
search itself is new capability):

- **Brute-force cosine top-k**: the exact baseline. Queries are a (small)
  DataFrame side that gets broadcast; the corpus side streams — one scan,
  no shuffle until the per-query top-k window. Linear in |corpus|×|queries|.
- **Random-hyperplane LSH top-k**: the scale path. Sign-bit signatures from
  seeded hyperplanes, banded bucket join for candidates, exact cosine
  re-rank of candidates only. Near-linear; recall < 1 by construction
  (tested against the brute-force baseline, not an SQL oracle).

All arithmetic is JVM-side (``zip_with``/``aggregate`` over double arrays);
no Python in the hot path. Hyperplanes are seeded at plan-build time so
results are deterministic across runs.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.functions.numeric import ratio_round


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — sequential fold, same order as DuckDB's list fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: for each query row, the k nearest corpus rows.

    ``queries`` must carry (id_col, vec_col); self-matches are excluded.
    Plan: broadcast(queries) × corpus → cosine → per-query top-k window.
    The window partitions by query id, so the shuffle is |corpus|·|queries|
    rows wide but each partition's top-k heap is tiny; at cluster scale
    prefer more queries per batch, not bigger k.

    Output: (query_id, vec_id, cosine, rank) — cosine rounded (6dp) before
    ranking so the order is cross-engine deterministic.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("__qv")
        )
    )
    c = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            id_col,
            ratio_round(cosine(F.col("__qv"), F.col("__cv"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_sign_bits(vec: Column, planes: list[list[float]]) -> list[Column]:
    """Sign bits: bit p = 1 iff vec · plane_p > 0."""
    return [
        F.when(dot(vec, F.array(*[F.lit(w) for w in plane])) > 0, 1).otherwise(0)
        for plane in planes
    ]


def lsh_band_keys(vec: Column, planes: list[list[float]], bands: int) -> list[Column]:
    """Integer bucket key per band (rows_per_band sign bits, little-endian).

    Keys are built per band (≤ rows_per_band bits each) so any plane count
    works — no 64-bit signature packing, no sign-bit overflow."""
    rows = len(planes) // bands
    bits = lsh_sign_bits(vec, planes)
    out = []
    for b in range(bands):
        key = F.lit(0)
        for r in range(rows):
            key = key + bits[b * rows + r] * F.lit(1 << r)
        out.append(key)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_planes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Candidates = corpus rows sharing at least one signature band with the
    query (one shuffle on (band, key)); exact cosine re-ranks candidates.
    64 planes × 16 bands of 4 bits: for a cos=0.9 neighbor
    P(candidate) = 1−(1−(1−θ/π)⁴)¹⁶ ≈ 1−3e-5; even for the weak cos≈0.35
    neighbors of the near-uniform synthetic corpus it is ≈ 0.9. Output
    schema matches ``brute_force_topk``; rank may hold fewer than k rows
    per query when buckets are sparse.
    """
    assert n_planes % bands == 0
    planes = _hyperplanes(dim, n_planes, seed)

    def with_buckets(df: DataFrame, prefix: str) -> DataFrame:
        sig = df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            as_double(F.col(vec_col)).alias(f"{prefix}_vec"),
        )
        keys = lsh_band_keys(F.col(f"{prefix}_vec"), planes, bands)
        bandkeys = F.array(
            *[
                F.struct(F.lit(b).alias("band"), key.alias("key"))
                for b, key in enumerate(keys)
            ]
        )
        return sig.select(
            f"{prefix}_id", f"{prefix}_vec", F.explode(bandkeys).alias("bk")
        ).select(
            f"{prefix}_id",
            f"{prefix}_vec",
            F.col("bk.band").alias("band"),
            F.col("bk.key").alias("key"),
        )

    qb = F.broadcast(with_buckets(queries, "query"))
    cb = with_buckets(corpus, "cand")
    cands = (
        qb.join(cb, ["band", "key"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "query_vec", "cand_id", "cand_vec")
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = cands.select(
        "query_id",
        F.col("cand_id").alias(id_col),
        ratio_round(cosine(F.col("query_vec"), F.col("cand_vec"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )
