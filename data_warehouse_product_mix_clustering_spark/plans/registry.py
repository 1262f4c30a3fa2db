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
    # New in round 5 — no driver row yet.
    "value_segments_audit",
    "stream_sessions_audit",
    "media_wav_metadata",
    "asof_forward_next_quote",
    "asof_nearest_quote",
    # Code changed in round 5 — existing rows predate the change.
    "media_frame_features",  # upgraded rows-only → full hash oracle
    "sequence_arrays",  # oracle cast semantics aligned (trunc)
    "ann_recall_audit",  # n_probes counted from the probe set
    "customer_value_quartiles",  # routed through quantile_segment
    "asof_price_intervals",  # union/operator rewrite + NULL-distinct fix
    "asof_union_monthly_quotes",  # _asof_union narrowed + single Window
    "asof_tolerance_quotes",
    # Round-4's end-of-round re-plan (SHUFFLE_HASH fact join, star_schema
    # 107-117) landed AFTER these queries' r3 attestations and the r4
    # window didn't cover them — the judge's #1 ask for r5.
    "cluster_summary",
    "product_features",
    "interval_join_per_product",
    "category_rollup",
    "dim_date_intervals",
    "quarterly_sequences",
    "trajectory_stats",
    # Remaining star-schema consumers still carrying r3 rows.
    "quarterly_running_revenue",
    "pivot_category_priority",
    "cube_category_priority",
    "sequence_embeddings",
    "features_pca",
    "sequence_clusters",
    "sequence_clusters_lstm",
    "cluster_trajectories",
    # Oldest attestations on record (r2), oldest-first refresh.
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "doc_bpe_tokens",
    "doc_fingerprints",
    "doc_lang_id",
    "doc_quality",
    "doc_split",
    "doc_stratified_sample",
    "doc_tfidf_top_terms",
    "doc_token_stats",
    "doc_top_terms",
    "order_priority_check",
    "order_value_histogram",
    "returnflag_priority_split",
    "training_corpus",
    # r3 refresh, fills the 50-query window.
    "ann_ivf_topk",
    "ann_pq_topk",
    "media_metadata",
    "media_resized",
    "events_stream_dedup",
    "dedup_best_of_group",
    "contamination_check",
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
