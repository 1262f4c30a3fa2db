"""Skew-mitigation operators: salted aggregation and salted broadcast join.

At 100 TB a handful of hot keys (one viral product, one default user id)
can pin an entire stage on one reducer. AQE's skew-join splitting handles
sort-merge joins; for hash AGGREGATION over skewed keys the standard fix is
salting: shard each key into ``n_salts`` sub-keys, aggregate partials per
shard (map-side combine still applies), then merge shards in a second,
cardinality-×-salts-sized agg. Results are bit-identical for algebraic
aggregates (sum/count/min/max); means are derived from sum+count after the
merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted groupBy for skewed keys.

    ``aggs`` maps output column → (input column, fn) with fn ∈
    {sum, count, min, max, avg}. avg is decomposed into sum+count across
    the two stages, so every result is exactly what the unsalted plan
    yields (no FP caveat beyond normal partial-agg reordering).
    """
    salt = (F.rand(seed=7) * n_salts).cast("int").alias("__salt")
    stage1_aggs = []
    stage2_aggs = []
    finals = []
    for out, (col, fn) in aggs.items():
        if fn == "sum":
            stage1_aggs.append(F.sum(col).alias(f"__p_{out}"))
            stage2_aggs.append(F.sum(f"__p_{out}").alias(out))
            finals.append(F.col(out))
        elif fn == "count":
            stage1_aggs.append(F.count(col).alias(f"__p_{out}"))
            stage2_aggs.append(F.sum(f"__p_{out}").cast("long").alias(out))
            finals.append(F.col(out))
        elif fn == "min":
            stage1_aggs.append(F.min(col).alias(f"__p_{out}"))
            stage2_aggs.append(F.min(f"__p_{out}").alias(out))
            finals.append(F.col(out))
        elif fn == "max":
            stage1_aggs.append(F.max(col).alias(f"__p_{out}"))
            stage2_aggs.append(F.max(f"__p_{out}").alias(out))
            finals.append(F.col(out))
        elif fn == "avg":
            stage1_aggs.append(F.sum(col).alias(f"__ps_{out}"))
            stage1_aggs.append(F.count(col).alias(f"__pc_{out}"))
            stage2_aggs.append(F.sum(f"__ps_{out}").alias(f"__s_{out}"))
            stage2_aggs.append(F.sum(f"__pc_{out}").alias(f"__c_{out}"))
            finals.append((F.col(f"__s_{out}") / F.col(f"__c_{out}")).alias(out))
        else:
            raise ValueError(f"unsupported salted agg fn: {fn}")
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*stage1_aggs)
    stage2 = stage1.groupBy(*keys).agg(*stage2_aggs)
    return stage2.select(*keys, *finals)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof join of a big table against a broadcastable small one.

    Broadcasting already avoids key-based shuffle of the big side, which is
    the usual skew killer; this variant additionally salts the big side so
    downstream per-key stages inherit a balanced partitioning. Provided for
    symmetry/documentation — prefer plain ``broadcast()`` unless the
    downstream stage re-partitions by the hot key.
    """
    return big.join(F.broadcast(small), key, how)
