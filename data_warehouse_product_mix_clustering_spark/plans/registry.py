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
    # ---- Round-16 window (positions 0-49) ----
    # Rotation hygiene (VERDICT r13 "What's wrong" #2, standing): rows-only
    # names are EXCLUDED from driver windows — they can only produce
    # `err: no_oracle` rows; their contracts ride the adjacent green
    # oracle-bearing audits. All registered rows-only queries stay
    # reachable by name and in the full sweep.
    #
    # New in round 16 — the next ten of the pre-staged backlog, registered
    # in the order the r15 registry comment fixed (EOD packing, the DSIR
    # five, then the classifier/DSIR-maintenance/DoReMi-seam/serving
    # audits — 1+5+1+1+1+1 fills the 10-slot budget exactly):
    "doc_context_windows_eod",
    "doc_dsir_weight",
    "training_corpus_dsir",
    "source_dsir_mixture",
    "training_corpus_dsir_budgeted",
    "dsir_context_windows",
    "quality_classifier_audit",
    "dsir_incremental_audit",
    "doremi_training_batches_audit",
    "quality_model_serving_audit",
    # r11-cohort tail (all 36 remaining oracle-bearing r11 names, in
    # r11-window order). Clearing these raises the oracle-bearing
    # attestation floor past r11.
    "asof_price_intervals",
    "cluster_summary",
    "shipping_priority",
    "top3_per_category",
    "asof_union_monthly_quotes",
    "asof_forward_next_quote",
    "asof_nearest_bucketed_quote",
    "asof_nearest_quote",
    "asof_tolerance_quotes",
    "corpus_shuffle",
    "curriculum_stages",
    "customer_first_last_order",
    "customer_spend_deciles",
    "customer_trailing_order_count",
    "dedup_embedding_lsh_audit",
    "discounted_bulk_revenue",
    "doc_chunks",
    "doc_chunks_tokens",
    "doc_pii_redacted",
    "doc_repetition",
    "embedding_quantize_int8",
    "events_approx_stats_audit",
    "events_props_map",
    "events_props_variant",
    "events_retention_cohorts",
    "events_stream_enriched",
    "lang_token_percentiles",
    "large_order_customers",
    "lineitem_profile",
    "lineitem_quality",
    "market_share_by_year",
    "media_frame_features",
    "media_resized",
    "top_supplier_period",
    "trailing_30d_revenue",
    "untapped_customer_balance",
    # r12-cohort head (4 oldest r12-window oracle-bearing rows, in
    # r12-window order — 10 + 36 + 4 fill the 50 slots exactly; the
    # attestation floor rises to r12):
    "doc_bigram_logprob",
    "semantic_dedup_groups_audit",
    "training_corpus_lm_filtered",
    "media_wav_metadata",
    # ---- window boundary ----
    # Round-17 rotation order (pre-decided): register the LAST ten of the
    # pre-staged backlog — the observability tail, in VERDICT r15 brief #6
    # order —
    #   1. vocab_growth (plans/pipeline/observability.py)
    #   2. source_vocab_overlap (observability.py)
    #   3. doc_length_equidepth_batches (plans/pipeline/packing.py)
    #   4. equidepth_padding_efficiency (packing.py)
    #   5. lang_classifier_audit (plans/pipeline/classifiers.py)
    #   6. stream_model_scoring_audit (classifiers.py)
    #   7. topic_balanced_corpus_audit (observability.py)
    # — 7 oracle-bearing window slots; the rows-only tail
    # (doc_quality_classifier, doc_lang_classifier, topic_balanced_corpus)
    # registers OUTSIDE the window as its audits land, per the hygiene
    # rule. That clears the backlog to zero. Fill the remaining 43 slots
    # with the FIRST 43 of the 46 r12-cohort tail names below
    # (r12-window order, through "events_rolling_dau") — 7 + 43 fill
    # the 50 slots exactly; the last three (doc_bm25_snippets,
    # events_user_streaks, events_multitouch_attribution) lead r18's
    # window, which otherwise rotates the then-oldest cohort as usual.
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
    "doc_bm25_snippets",
    "events_user_streaks",
    "events_multitouch_attribution",
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
