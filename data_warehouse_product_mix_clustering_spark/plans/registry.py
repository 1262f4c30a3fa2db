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
    # Red/ERR in round 3, fixed this round (events ts loader type-gate,
    # array-output serialization) — re-earn green rows first.
    "events_stream_attribution",
    "events_stream_topk",
    "events_session_window",
    "nation_revenue_sql",
    "order_priority_sql",
    "media_frame_features",
    "sequence_arrays",
    "sequence_embeddings_lstm",
    # Plan changed in r3 (agg-below-join) without a fresh driver row.
    "nation_revenue",
    # New this round: driver-attested ANN recall gate.
    "ann_recall_audit",
    # Events family attested in r1 only — the loader they all share changed
    # this round, so their attestation predates the code.
    "events_tumbling_hourly",
    "events_stream_hourly",
    "events_sliding_qtr_hour",
    "events_sessions",
    "events_funnel",
    "events_props_stats",
    "events_stream_sessions",
    "events_approx_stats",
    # Star-schema consumers attested r2, before the r3 fact-join re-plan.
    "returnflag_stats",
    "category_pct_of_total",
    "product_search",
    "product_pagination",
    "top3_per_category",
    "category_values",
    "recent_activity",
    "quarter_rollup",
    "global_metrics",
    # r1-only attestations (oldest on record).
    "ann_cosine_topk",
    "ann_lsh_topk",
    "embedding_centroids",
    "features_zscore",
    "product_clusters",
    "cluster_profile",
    "embedding_clusters",
    "clustering_quality",
    # Dedup family re-planned in r3 (LSH bucket cache, edge-list
    # materialization) after its r2 attestation.
    "dedup_minhash_lsh",
    "dedup_groups",
    "documents_dedup",
    "dedup_exact",
    "dedup_embedding_lsh",
    # Remaining r2 attestations, oldest-first refresh.
    "doc_profile",
    "pricing_summary",
    "shipping_priority",
    "latest_order_top1",
    "semi_join_large_parts",
    "customer_order_setops",
    "anti_join_inactive_customers",
    "promo_revenue_pct",
    "customer_value_quartiles",
    "orders_above_customer_avg",
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
