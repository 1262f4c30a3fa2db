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
    # ---- Round-17 window (positions 0-49) ----
    # Rotation hygiene (VERDICT r13 "What's wrong" #2, standing): rows-only
    # names are EXCLUDED from driver windows — they can only produce
    # `err: no_oracle` rows; their contracts ride the adjacent green
    # oracle-bearing audits. All registered rows-only queries stay
    # reachable by name and in the full sweep.
    #
    # New in round 17 — the LAST seven oracle-bearing names of the
    # pre-staged backlog (the observability tail), in the order the r16
    # registry comment fixed; the three rows-only companions
    # (doc_quality_classifier, doc_lang_classifier, topic_balanced_corpus)
    # are registered this round too but sit OUTSIDE the window per the
    # hygiene rule. The pre-staged backlog is now ZERO.
    "vocab_growth",
    "source_vocab_overlap",
    "doc_length_equidepth_batches",
    "equidepth_padding_efficiency",
    "lang_classifier_audit",
    "stream_model_scoring_audit",
    "topic_balanced_corpus_audit",
    # r12-cohort tail (first 43 of the 46 remaining names whose newest
    # driver attestation is r12, in r12-window order) — 7 + 43 fill the
    # 50 slots exactly; after this round the oracle-bearing attestation
    # floor shrinks to the three r12 stragglers below.
    "monthly_revenue_gapfill",
    "nation_profit_by_year",
    "nation_revenue_trend",
    "per_source_sample",
    "product_features",
    "product_fuzzy_search",
    "product_monthly_ffill",
    "referential_integrity",
    "returnflag_metrics_unpivot",
    "returnflag_robust_stats",
    "revenue_mom_growth",
    "sequence_cluster_audit",
    "shard_packing",
    "small_quantity_part_revenue",
    "source_mixture_weights",
    "training_corpus_sharded",
    "volume_shipping_nations",
    "waiting_orders_by_supplier",
    "refresh_rollup_audit",
    "stream_quarantine_audit",
    "events_rolling_dau_approx_audit",
    "refresh_tombstone_audit",
    "doc_bm25_indexed_search",
    "postings_incremental_audit",
    "merge_upsert_audit",
    "time_travel_audit",
    "jdbc_roundtrip_audit",
    "min_cost_supplier",
    "returned_item_customers",
    "important_supply_value",
    "late_shipment_priority",
    "customer_order_distribution",
    "supplier_variety",
    "disjunctive_bracket_revenue",
    "dominant_suppliers",
    "dedup_incremental_exact",
    "dedup_incremental_ngram",
    "lateral_top_suppliers",
    "doc_bm25_search",
    "doc_hybrid_rrf",
    "events_freq_items_audit",
    "events_daily_anomalies",
    "events_rolling_dau",
    # ---- window boundary ----
    # Round-18 rotation order (pre-decided): the three r12 stragglers
    # lead, then the first 47 of the 49 r13-cohort names in r13-window
    # order (through ann_ivf_indexed_audit) — 3 + 47 fill the 50 slots
    # exactly; (mv_rewrite_audit, checked_write_audit) lead r19's window.
    "doc_bm25_snippets",
    "events_user_streaks",
    "events_multitouch_attribution",
    "semantic_dedup_sweep_audit",
    "doc_lang_logprob",
    "training_corpus_lm_by_lang",
    "doc_crosscorpus_logprob",
    "semantic_dedup_incremental_audit",
    "doc_context_windows",
    "source_mixture_temperature",
    "corpus_filter_waterfall",
    "source_token_kl",
    "revenue_pareto_share_distributed",
    "stream_semantic_ingest_audit",
    "doc_weighted_sample",
    "product_pagination_keyset",
    "dedup_overlap_coefficient",
    "events_markov_transitions",
    "revenue_pareto_share",
    "order_amount_benford",
    "customer_rfm_segments",
    "basket_part_pairs",
    "events_daily_paths",
    "nation_supplier_hhi",
    "urgent_revenue_sql",
    "discount_quantity_correlation",
    "customer_revenue_gini",
    "lineitem_drift_check",
    "ann_cosine_topk",
    "dedup_groups",
    "doc_profile",
    "documents_dedup",
    "embedding_centroids",
    "features_zscore",
    "nation_revenue_sql",
    "order_priority_sql",
    "mv_maintenance_audit",
    "customer_fuzzy_matches",
    "events_audience_overlap",
    "events_audience_overlap_sketch_audit",
    "snapshot_consistency_audit",
    "ann_ivfpq_indexed_audit",
    "revenue_forecast_backtest",
    "basket_triangle_stats",
    "lineitem_nested_roundtrip_audit",
    "revenue_sample_estimate",
    "dedup_duplicated_ngrams",
    "zorder_pruning_audit",
    "python_datasource_scan",
    "ann_ivf_indexed_audit",
    "mv_rewrite_audit",
    "checked_write_audit",
    # New in r17 with no driver row yet (pytest-gated this round, window
    # full): join r19's window alongside the two names above.
    "dsir_compaction_audit",
    "stream_dsir_ingest_audit",
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
