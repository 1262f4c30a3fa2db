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
    # ---- Round-9 window (positions 0-49) ----
    # New in round 9 — no driver row yet. (Queries registered this round are
    # inserted HERE, above the late-r8 block, so they attest in-window.)
    "mv_maintenance_audit",  # navigator ⊕ CDC maintenance composed loop
    "customer_fuzzy_matches",  # prefix-filtered edit-distance similarity join
    "events_audience_overlap",  # per-day type-pair co-audience, no self-join
    "events_audience_overlap_sketch_audit",  # HLL inclusion-exclusion envelope
    "snapshot_consistency_audit",  # atomic multi-table publish contract
    "ann_ivfpq_indexed_audit",  # composed IVF-PQ persisted index quality gate
    "revenue_forecast_backtest",  # walk-forward baseline-forecast MAE/bias
    "basket_triangle_stats",  # degree-oriented exact triangle census
    "lineitem_nested_roundtrip_audit",  # relational→nested→flat lossless proof
    "revenue_sample_estimate",  # Bernoulli-by-hash HT estimator with 95% CI
    # Registered late in round 8 — r8's 50-slot window was already full, so
    # none of these has ever received a driver CORRECTNESS row (VERDICT r8
    # Next #1). They lead round 9's attestation window.
    "events_rolling_dau_approx",  # rows-only; its audit attested green r8
    "dedup_duplicated_ngrams",  # cross-doc repeated-substring mining
    "zorder_pruning_audit",  # interleaved-bit layout: real footer-stats pruning
    "python_datasource_scan",  # from-scratch Spark 4 Python DataSource
    "ann_ivf_indexed_audit",  # persisted IVF index, cell-partition pruning
    "mv_rewrite_audit",  # MV navigator: plan choice + rewrite equivalence
    "checked_write_audit",  # constraint-guarded publish (abort/quarantine)
    "basket_pagerank_audit",  # distributed PageRank convergence contract
    "lineitem_replica_checksum",  # order-independent replica checksum
    # Stalest attestations next: the 7 rows-only r4 stragglers (their gating
    # audits are green r6-r8; the driver re-observes the row counts here).
    "product_clusters",
    "ann_lsh_topk",
    "cluster_profile",
    "clustering_quality",
    "dedup_embedding_lsh",
    "embedding_clusters",
    "sequence_embeddings_lstm",
    # r5 cohort, alphabetical — fills the window. (Entries displaced past
    # position 49 by new-r9 insertions simply lead round 10; see below.)
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_recall_audit",
    "category_rollup",
    "cluster_trajectories",
    "contamination_check",
    "cube_category_priority",
    "customer_value_quartiles",
    "dedup_best_of_group",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dim_date_intervals",
    "doc_bpe_tokens",
    "doc_fingerprints",
    "doc_lang_id",
    "doc_quality",
    "doc_split",
    "doc_stratified_sample",
    "doc_tfidf_top_terms",
    "doc_token_stats",
    "doc_top_terms",
    "events_stream_dedup",
    "features_pca",
    # ---- window boundary (the driver attests ~50 per round; the 10
    # new-r9 queries above displaced the boundary here) ----
    # Round-10 rotation order (pre-staged): the remainder of the r5
    # cohort, then the r6 cohort alphabetically. At round-10 start, any
    # NEW r10 queries insert at the very top of the list.
    "interval_join_per_product",
    "media_metadata",
    "order_priority_check",
    "order_value_histogram",
    "pivot_category_priority",
    "quarterly_running_revenue",
    "quarterly_sequences",
    "returnflag_priority_split",
    "sequence_arrays",
    "sequence_clusters",
    "sequence_clusters_lstm",
    "sequence_embeddings",
    "stream_sessions_audit",
    "training_corpus",
    "trajectory_stats",
    "value_segments_audit",
    # r6 cohort.
    "anti_join_inactive_customers",
    "category_pct_of_total",
    "category_values",
    "cluster_quality_audit",
    "customer_order_setops",
    "customer_revenue_distribution",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_audit",
    "embedding_cluster_audit",
    "events_approx_stats",
    "events_funnel",
    "events_props_stats",
    "events_session_window",
    "events_sessions",
    "events_sliding_qtr_hour",
    "events_stream_attribution",
    "events_stream_hourly",
    "events_stream_sessions",
    "events_stream_topk",
    "events_tumbling_hourly",
    "global_metrics",
    "latest_order_top1",
    "lstm_quality_audit",
    "nation_revenue",
    "orders_above_customer_avg",
    "pca_variance_audit",
    "pricing_summary",
    "product_pagination",
    "product_search",
    "promo_revenue_pct",
    "quarter_rollup",
    "recent_activity",
    "returnflag_stats",
    "revenue_grouping_sets",
    "semi_join_large_parts",
    "shipping_priority",
    "top3_per_category",
    "top_supplier_period",
    "trailing_30d_revenue",
    "untapped_customer_balance",
    # r7 cohort and everything else follow in registration order.
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
    import data_warehouse_product_mix_clustering_spark.plans.analytics  # noqa: F401
    import data_warehouse_product_mix_clustering_spark.plans.relational  # noqa: F401
    import data_warehouse_product_mix_clustering_spark.plans.mv  # noqa: F401

    prioritized = {n: _REGISTRY[n] for n in _DRIVER_PRIORITY if n in _REGISTRY}
    prioritized.update(_REGISTRY)
    return prioritized
