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
    # ---- Round-15 window (positions 0-49) ----
    # Rotation hygiene (VERDICT r13 "What's wrong" #2, standing): rows-only
    # names are EXCLUDED from driver windows — they can only produce
    # `err: no_oracle` rows; their contracts ride the adjacent green
    # oracle-bearing audits. All registered rows-only queries stay
    # reachable by name and in the full sweep.
    #
    # New in round 15 — the first ten of the pre-staged r14 backlog,
    # registered in the order VERDICT r14 brief #1 fixed (flagship
    # end-to-end composition first; remainder spills to r16 below):
    "training_batches_audit",
    "coreset_maxmin_audit",
    "source_mixture_doremi",
    "doc_quality_lm_calibration",
    "source_budget_allocation",
    "training_corpus_budgeted",
    "training_corpus_decontaminated",
    "benchmark_contamination_report",
    "benchmark_contamination_fuzzy",
    "training_corpus_decontaminated_fuzzy",
    # r10-cohort tail (all 26 remaining oracle-bearing r10 names — the 5
    # other r10 rows (bpe_merge_table, events_approx_stats,
    # events_stream_sessions, sequence_clusters, sequence_clusters_lstm)
    # are rows-only, excluded per the hygiene rule; their audits are
    # separately attested). Clearing these raises the oracle-bearing
    # attestation floor to r11.
    "stream_sessions_audit",
    "training_corpus",
    "trajectory_stats",
    "value_segments_audit",
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
    # r11-cohort head (14 oldest r11-window oracle-bearing rows, in
    # r11-window order — 10 + 26 + 14 fill the 50 slots exactly;
    # judge-checkable at position 50):
    "doc_unigram_logprob",
    "semantic_dedup_audit",
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
    # ---- window boundary ----
    # Round-16 rotation order (pre-decided): register the next <= 10 of
    # the remaining pre-staged backlog in VERDICT r14 brief order —
    #   1. doc_context_windows_eod (plans/pipeline/packing.py)
    #   2. the DSIR five: doc_dsir_weight, training_corpus_dsir,
    #      source_dsir_mixture, training_corpus_dsir_budgeted,
    #      dsir_context_windows (plans/pipeline/dsir.py)
    #   3. quality_classifier_audit (plans/pipeline/classifiers.py)
    #   4. dsir_incremental_audit (plans/pipeline/dsir.py)
    #   5. doremi_training_batches_audit (plans/pipeline/batches.py — the r15
    #      seam audit, VERDICT r14 brief #6; dry-run tested)
    #   6. quality_model_serving_audit (plans/pipeline/classifiers.py)
    # — that fills the 10-slot budget exactly (1+5+1+1+1+1); then r17
    # takes lang_classifier_audit,
    # topic_balanced_corpus_audit, stream_model_scoring_audit,
    # doc_length_equidepth_batches, equidepth_padding_efficiency,
    # vocab_growth, source_vocab_overlap, and the rows-only tail
    # (doc_quality_classifier, doc_lang_classifier,
    # topic_balanced_corpus) registers outside the window as each audit
    # lands (training_batches and coreset_maxmin_sample already did so
    # in r15, their audits being registered). Fill the rest of the r16
    # window with the remaining 36 r11-cohort oracle-bearing names
    # below (r11-window order) PLUS the first four r12-cohort names in
    # r12-window order — doc_bigram_logprob, semantic_dedup_groups_audit,
    # training_corpus_lm_filtered, media_wav_metadata — so 10 + 36 + 4
    # fill the 50 slots exactly and the floor rises to r12.
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
