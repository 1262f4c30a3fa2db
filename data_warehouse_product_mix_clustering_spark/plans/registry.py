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
    # New in round 7 — no driver row yet.
    "dedup_embedding_lsh_audit",
    "sequence_cluster_audit",
    "asof_nearest_bucketed_quote",  # attests the midpoint-cover reduction
    "waiting_orders_by_supplier",  # Q21 shape — first fact self-join
    "large_order_customers",  # Q18 shape
    "volume_shipping_nations",  # Q7 shape — dual-role dimension
    "discounted_bulk_revenue",  # Q6 shape — full-pushdown scan agg
    "market_share_by_year",  # Q8 shape — conditional share ratio
    "small_quantity_part_revenue",  # Q17 shape — windowed correlated threshold
    "nation_profit_by_year",  # Q9 shape — profit rollup
    "revenue_mom_growth",  # lag window
    "customer_spend_deciles",  # percent_rank / cume_dist / ntile
    "customer_first_last_order",  # min_by / max_by grouped argmin
    "events_retention_cohorts",  # cohort retention rollup
    "doc_chunks",  # overlapping-window document chunking
    "embedding_quantize_int8",  # absmax int8 vector compression
    "events_props_variant",  # Spark 4 VARIANT semi-structured path
    "events_stream_enriched",  # stream-static broadcast enrichment join
    "nation_revenue_trend",  # regr_slope/intercept/r2 aggregates
    "doc_chunks_tokens",  # token-boundary chunking
    "returnflag_metrics_unpivot",  # UNPIVOT/melt (inverse of pivot)
    "product_fuzzy_search",  # levenshtein top-10 typo-tolerant search
    "monthly_revenue_gapfill",  # calendar-spine resample / zero fill
    "product_monthly_ffill",  # IGNORE NULLS forward-fill imputation
    "customer_trailing_order_count",  # per-event RANGE-window velocity
    "returnflag_robust_stats",  # exact median + MAD (robust dispersion)
    "events_props_map",  # MAP-type semi-structured access
    # Code changed in round 7 — r6 rows predate the change.
    "events_approx_stats_audit",  # null-safe joins + coalesce-to-FALSE envelopes
    "asof_union_monthly_quotes",  # union paths restore left_on's input type
    "asof_nearest_quote",  # nearest-union _left_out type restore
    "asof_forward_next_quote",  # shares the union machinery
    "asof_tolerance_quotes",
    "asof_price_intervals",  # star-schema builder cache in its plan build
    "product_features",  # star-schema builder cache
    "cluster_summary",  # star-schema builder cache
    "media_frame_features",  # observable real-decoder fallback path
    "media_wav_metadata",
    "media_resized",
    # Oldest surviving rows — the r3 cohort (the judge's rotation ask).
    "corpus_shuffle",
    "curriculum_stages",
    "doc_pii_redacted",
    "doc_repetition",
    "lang_token_percentiles",
    "lineitem_profile",
    "lineitem_quality",
    "per_source_sample",
    "referential_integrity",
    "shard_packing",
    "source_mixture_weights",
    "training_corpus_sharded",
    # New in round 7, second session — the eight remaining TPC-H shapes
    # (plans/relational.py), incremental dedup, LATERAL, the retrieval
    # stack (BM25/RRF/snippets), sketch/anomaly/DAU/streak/attribution
    # analytics, and weighted sampling. The 50-slot window is already
    # exactly full above (27 new + 11 re-planned + 12 r3-rotation), so
    # this block occupies positions 51-77 and leads round 8's attestation
    # window (it exceeds one 50-slot window's tail; plan round 8's window
    # as: this block first, then the r4 cohort below). Until then every
    # entry is covered by tests/test_oracle_parity.py at sf0.001 and the
    # in-session sf0.01 sweeps recorded in PERF_NOTES.md (150/150
    # value-exact mid-session; later additions verified individually).
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
    # Then the r4 cohort — these rotate after the relational battery in
    # round 8; lead that round's window with any newly-changed queries.
    "returnflag_stats",
    "global_metrics",
    "quarter_rollup",
    "events_tumbling_hourly",
    "events_stream_hourly",
    "events_stream_attribution",
    "events_sliding_qtr_hour",
    "events_sessions",
    "events_funnel",
    "events_props_stats",
    "events_stream_sessions",
    "events_approx_stats",
    "events_session_window",
    "events_stream_topk",
    "pricing_summary",
    "nation_revenue",
    "shipping_priority",
    "recent_activity",
    "semi_join_large_parts",
    "category_values",
    "product_search",
    "product_pagination",
    "top3_per_category",
    "latest_order_top1",
    "category_pct_of_total",
    "promo_revenue_pct",
    "orders_above_customer_avg",
    "revenue_grouping_sets",
    "top_supplier_period",
    "untapped_customer_balance",
    "trailing_30d_revenue",
    "customer_revenue_distribution",
    "customer_order_setops",
    "anti_join_inactive_customers",
    "dedup_exact",
    "dedup_minhash_lsh",
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

    prioritized = {n: _REGISTRY[n] for n in _DRIVER_PRIORITY if n in _REGISTRY}
    prioritized.update(_REGISTRY)
    return prioritized
