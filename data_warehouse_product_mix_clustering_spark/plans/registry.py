"""Query registry: the engine's public query surface.

Every operator family from SURVEY.md §2 is exposed as a named query:
``fn(spark, sf_dir) -> DataFrame`` (the Spark plan) plus, where the
semantics are SQL-expressible, a DuckDB ``oracle`` string over the same
parquet tables. The driver's correctness gate runs both sides at sf0.01
and hash-compares; ``__spark_entry__.py`` is a thin adapter over this
registry.

Cross-engine determinism rules (enforced by convention in every query):
- Alias every computed column identically in Spark and SQL.
- Cast counts/row_numbers to long/BIGINT on both sides (DuckDB COUNT is
  BIGINT, Spark row_number is int, DuckDB SUM(int) is HUGEINT — explicit
  casts keep schemas identical).
- Round floating aggregates: coarse (integer cents/dollars) for sums over
  many rows, 4-6 decimals for ratios — double summation order differs
  across engines, so low bits are not comparable.
- Never output raw nanosecond timestamps (Spark truncates parquet ns to µs).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    headline: bool = False  # included in bench.py's headline set
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, headline: bool = False
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, headline, (fn.__doc__ or "").strip())
        return fn

    return deco


# Names surfaced FIRST by all_queries(). The driver's correctness gate runs
# (at most) the first 50 entries per round, so queries that have not yet
# received a driver CORRECTNESS row are listed here to steer coverage; the
# remaining (already driver-attested in r1/r2) queries follow in registration
# order. Ordering affects only iteration order — every query stays reachable
# by name regardless.
_DRIVER_PRIORITY: list[str] = [
    # Oracle-backed, never driver-checked through round 2.
    "events_stream_attribution",
    "events_stream_dedup",
    "events_session_window",
    "media_metadata",
    "quarterly_sequences",
    "trajectory_stats",
    "sequence_embeddings",
    "nation_revenue_sql",
    "order_priority_sql",
    "lineitem_profile",
    "lineitem_quality",
    # New in round 3 (oracle-backed) — needs its first driver row.
    "asof_union_monthly_quotes",
    "shard_packing",
    "curriculum_stages",
    "contamination_check",
    "per_source_sample",
    "lang_token_percentiles",
    "revenue_grouping_sets",
    "top_supplier_period",
    "untapped_customer_balance",
    "referential_integrity",
    "trailing_30d_revenue",
    "customer_revenue_distribution",
    "asof_tolerance_quotes",
    "events_stream_topk",
    "training_corpus_sharded",
    "doc_pii_redacted",
    "doc_repetition",
    "corpus_shuffle",
    "dedup_best_of_group",
    "source_mixture_weights",
    # Rows-only (no SQL oracle), never driver-checked through round 2.
    "ann_ivf_topk",
    "ann_pq_topk",
    "cluster_trajectories",
    "features_pca",
    "media_frame_features",
    "media_resized",
    "sequence_arrays",
    "sequence_clusters",
    "sequence_embeddings_lstm",
    "sequence_clusters_lstm",
]


def all_queries() -> dict[str, Query]:
    """Import every query module (side effect: registration) and return all.

    The returned dict is ordered: ``_DRIVER_PRIORITY`` names first, then the
    rest in registration order (see the priority list's comment for why).
    """
    import data_warehouse_product_mix_clustering_spark.plans.warehouse  # noqa: F401
    import data_warehouse_product_mix_clustering_spark.plans.text  # noqa: F401
    import data_warehouse_product_mix_clustering_spark.plans.dedup  # noqa: F401
    import data_warehouse_product_mix_clustering_spark.plans.similarity  # noqa: F401
    import data_warehouse_product_mix_clustering_spark.plans.events  # noqa: F401
    import data_warehouse_product_mix_clustering_spark.plans.ml  # noqa: F401
    import data_warehouse_product_mix_clustering_spark.plans.media  # noqa: F401
    import data_warehouse_product_mix_clustering_spark.plans.sequences  # noqa: F401
    import data_warehouse_product_mix_clustering_spark.plans.sql_api  # noqa: F401
    import data_warehouse_product_mix_clustering_spark.plans.quality  # noqa: F401
    import data_warehouse_product_mix_clustering_spark.plans.pipeline  # noqa: F401

    prioritized = {n: _REGISTRY[n] for n in _DRIVER_PRIORITY if n in _REGISTRY}
    prioritized.update(_REGISTRY)
    return prioritized
