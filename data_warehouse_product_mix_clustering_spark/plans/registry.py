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
    # ---- Round-8 window (positions 0-49) ----
    # New in round 8 — no driver row yet.
    "refresh_rollup_audit",  # versioned sink + CDC-maintained rollup contract
    "stream_quarantine_audit",  # availableNow replay conservation + idempotence
    "events_rolling_dau_approx_audit",  # exact-vs-sketch error envelope
    "refresh_tombstone_audit",  # soft-delete path: diff 'removed', groups die
    "doc_bm25_indexed_search",  # materialized postings index, bucket-pruned seek
    "postings_incremental_audit",  # CDC-maintained index ≡ full rebuild
    "merge_upsert_audit",  # three-clause ANSI MERGE INTO operator
    "time_travel_audit",  # versioned-sink lifecycle (travel/rollback/vacuum)
    "jdbc_roundtrip_audit",  # S1 through a real embedded RDBMS
    # Registered late in round 7 — r7's 50-slot window was already full, so
    # none of these has ever received a driver CORRECTNESS row (VERDICT r7
    # Next #1). They lead round 8's attestation window.
    "min_cost_supplier",  # Q2 — struct-min decorrelated correlated MIN
    "returned_item_customers",  # Q10 — top-20 partial top-k rollup
    "important_supply_value",  # Q11 — scalar-subquery threshold
    "late_shipment_priority",  # Q12 — conditional two-way counts
    "customer_order_distribution",  # Q13 — ON-clause filter + histogram
    "supplier_variety",  # Q16 — NOT-IN anti join + count distinct
    "disjunctive_bracket_revenue",  # Q19 — OR-of-ANDs pushdown
    "dominant_suppliers",  # Q20 — stacked semi-joins + share threshold
    "dedup_incremental_exact",  # new-batch-vs-corpus exact dedup
    "dedup_incremental_ngram",  # one-sided batch-vs-corpus Jaccard
    "lateral_top_suppliers",  # correlated LATERAL → window decorrelation
    "doc_bm25_search",  # BM25 lexical retrieval top-20
    "doc_hybrid_rrf",  # BM25 ⊕ cosine reciprocal-rank fusion
    "events_freq_items_audit",  # Karp heavy-hitters sketch contract
    "events_daily_anomalies",  # 3×MAD robust outlier days
    "events_rolling_dau",  # trailing-7d distinct users (range join)
    "doc_bm25_snippets",  # search-result highlighting windows
    "events_user_streaks",  # gaps-and-islands consecutive-day runs
    "events_multitouch_attribution",  # linear credit split per purchase
    "doc_weighted_sample",  # A-Res weighted sampling, hash-deterministic
    "product_pagination_keyset",  # seek pagination, O(page) at any depth
    "dedup_overlap_coefficient",  # asymmetric containment near-dups
    "events_markov_transitions",  # P(next type | type) transition matrix
    "revenue_pareto_share",  # 80/20 concentration frontier
    "order_amount_benford",  # first-digit fraud/data-quality profile
    "customer_rfm_segments",  # R/F/M quartile scores + segment label
    "basket_part_pairs",  # bought-together pairwise frequent itemsets
    "events_daily_paths",  # ordered within-day event-type path rollup
    "nation_supplier_hhi",  # Herfindahl concentration per nation
    "urgent_revenue_sql",  # FILTER-clause conditional aggregates
    "discount_quantity_correlation",  # corr/covar bivariate aggregates
    "customer_revenue_gini",  # rank-weighted Gini inequality index
    "lineitem_drift_check",  # two-sample feed-drift monitoring contract
    # Oldest surviving attestations — the r4 cohort rotates in (after this
    # round no query's latest driver row predates r5).
    "ann_cosine_topk",
    "dedup_groups",
    "doc_profile",
    "documents_dedup",
    "embedding_centroids",
    "features_zscore",
    "nation_revenue_sql",
    "order_priority_sql",
    # Remaining window slots: the r5 cohort begins rotating (alphabetical;
    # the rest continues below the window boundary for round 9).
    # ---- window boundary (the driver attests ~50 per round) ----
    # Round-9 rotation order: round-8 queries that missed the window first,
    # then the rest of the r5 cohort, then r6, then r7.
    "events_rolling_dau_approx",  # rows-only; its audit sits in-window
    "dedup_duplicated_ngrams",
    "zorder_pruning_audit",
    "python_datasource_scan",
    "ann_ivf_indexed_audit",
    "mv_rewrite_audit",
    "checked_write_audit",
    "basket_pagerank_audit",
    "lineitem_replica_checksum",
    "ann_recall_audit",
    "category_rollup",
    "contamination_check",
    "cube_category_priority",
    "customer_value_quartiles",
    "dedup_best_of_group",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
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
    "interval_join_per_product",
    "media_metadata",
    "order_priority_check",
    "order_value_histogram",
    "pivot_category_priority",
    "quarterly_running_revenue",
    "quarterly_sequences",
    "returnflag_priority_split",
    "sequence_arrays",
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
    "events_funnel",
    "events_props_stats",
    "events_session_window",
    "events_sessions",
    "events_sliding_qtr_hour",
    "events_stream_attribution",
    "events_stream_hourly",
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
