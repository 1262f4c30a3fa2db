"""Diversity-based data selection: greedy max-min (k-center) coreset.

The data-selection step between dedup and mixture: pick k examples that
COVER embedding space (every corpus vector is close to some pick) rather
than k random ones — the classic 2-approximation greedy for the k-center
objective, the shape coreset/active-learning selection pipelines run.
SemDeDup removes redundancy by dropping near-duplicates; this is its
constructive complement — keep a budgeted, maximally-spread subset.

Algorithm (k iterations, each one distributed pass over the corpus):
start from a deterministic seed (lowest id), maintain each vector's
running min squared-L2 distance to the selected set, and each round
broadcast ONLY the newest pick's vector, update the running min with one
JVM expression, and take the argmax by ``TakeOrderedAndProject`` (ties
broken by lowest id — deterministic across runs and partitionings).
O(n·k) distance work total, k broadcast scalars, k top-1 reductions;
driver state is the k picks. Lineage is truncated every iteration with
a localCheckpoint of the (id, running-min) relation — the per-iteration
checkpoint lifecycle the BPE trainer and PageRank use (rebinding drops
the previous round's blocks for the ContextCleaner).

Determinism contract (pinned by the python twin test/audit): distances
fold SEQUENTIALLY over vector components in declaration order with IEEE
doubles — ``F.aggregate`` on the JVM and a pure-python float fold in the
twin perform the identical operation sequence, so equality needs no
tolerance; argmax ties break on the lowest id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist_to(vec_col, center: list[float]):
    """Sequential-fold squared L2 distance from ``vec_col`` (array) to a
    broadcast python vector — F.aggregate folds components left-to-right,
    matching the twin's python-float loop exactly."""
    arr = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(
            vec_col.cast("array<double>"), arr, lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def maxmin_coreset(
    emb: DataFrame, id_col: str, vec_col: str, k: int
) -> list[tuple[int, float]]:
    """Greedy k-center picks over ``emb``: returns ``[(id, min_dist²_at_
    pick), ...]`` in pick order (the first pick is the lowest id with
    distance 0.0 by convention). Driver state is exactly this list —
    the corpus never leaves the executors."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    seed_row = emb.select(id_col, vec_col).orderBy(id_col).limit(1).collect()
    if not seed_row:
        return []
    picks: list[tuple[int, float]] = [(seed_row[0][0], 0.0)]
    center = [float(x) for x in seed_row[0][1]]

    cur = emb.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.lit(float("inf")).alias("__mind"),
    )
    for _ in range(1, k):
        cur = cur.select(
            "__id",
            "__v",
            F.least(F.col("__mind"), _sq_dist_to(F.col("__v"), center)).alias(
                "__mind"
            ),
        ).localCheckpoint(eager=True)  # truncate per-iteration lineage
        far = (
            cur.orderBy(F.col("__mind").desc(), F.col("__id"))
            .limit(1)
            .collect()
        )
        fid, fdist = far[0]["__id"], float(far[0]["__mind"])
        if fdist == 0.0:
            break  # every remaining vector duplicates a pick — k exhausted
        picks.append((fid, fdist))
        # the top-1 row already carries the pick's vector — no second scan
        # (one distributed job per pick, not two)
        center = [float(x) for x in far[0]["__v"]]
    return picks


def maxmin_coreset_py(
    vecs: dict[int, list[float]], k: int
) -> list[tuple[int, float]]:
    """Pure-python twin of ``maxmin_coreset`` — the SAME sequential
    IEEE-double fold and lowest-id tie-break, so pick sequences match
    exactly (no tolerance). Audit/test ground truth on bounded inputs."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    if not vecs:
        return []
    seed = min(vecs)
    picks = [(seed, 0.0)]
    center = [float(x) for x in vecs[seed]]
    mind = {i: float("inf") for i in vecs}
    for _ in range(1, k):
        for i, v in vecs.items():
            acc = 0.0
            for a, b in zip([float(x) for x in v], center):
                acc = acc + (a - b) * (a - b)
            if acc < mind[i]:
                mind[i] = acc
        fid = min(mind, key=lambda i: (-mind[i], i))
        if mind[fid] == 0.0:
            break
        picks.append((fid, mind[fid]))
        center = [float(x) for x in vecs[fid]]
    return picks
