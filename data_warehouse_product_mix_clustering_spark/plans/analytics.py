"""Round-7 widening: analytic window breadth + remaining TPC-H shapes +
document chunking (SURVEY.md §2.11 extension table).

Groups, each exercising an operator family no other registered query
shows end-to-end:

- TPC-H shapes Q6 / Q8 / Q17 / Q9: pure-predicate scan aggregate,
  conditional market-share ratio, correlated per-group scalar threshold
  (decorrelated into agg + broadcast join), and a multi-join profit rollup.
  The remaining shapes — Q2/Q10/Q11/Q12/Q13/Q16/Q19/Q20 — live in
  ``plans/relational.py`` (the supply-pair relation derived from lineitem
  stands in for the absent ``partsupp``), completing all 22 TPC-H shapes.
- Analytic windows: ``lag`` month-over-month growth, ``percent_rank`` /
  ``cume_dist`` / ``ntile`` customer deciles, ``min_by`` / ``max_by``
  first/last-order attributes. The reference's dashboards sort and rank
  driver-side in pandas (reference src/pages/*.py); these are the
  distributed equivalents.
- Cohort retention over ``events``: the classic product-analytics rollup
  (first-seen week × week offset × distinct users).
- ``doc_chunks`` / ``doc_chunks_tokens``: fixed-size overlapping character
  and token-boundary windows per document — the chunking step every
  embedding/RAG/training pipeline runs before encoding. Pure JVM
  expressions (sequence + explode + substr/slice + md5), no Python UDFs,
  verified value-exactly against DuckDB lateral generate_series oracles.
- ``nation_revenue_trend``: regr_slope/intercept/r2 grouped aggregates —
  the dashboard trend fit as a distributed agg.

Cross-engine float discipline follows functions/numeric.py: exact-decimal
sums snap through DECIMAL before rounding; division-derived ratios get the
+1e-9 boundary nudge on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.functions.numeric import (
    money_round,
    ratio_round,
    sql_money_round,
    sql_ratio_round,
)
from data_warehouse_product_mix_clustering_spark.plans.registry import register
from data_warehouse_product_mix_clustering_spark.sources.registry import table

# ---------------------------------------------------------------------------
# TPC-H shapes: Q6, Q8, Q17, Q9
# ---------------------------------------------------------------------------


def _supplier_nation(spark: SparkSession, sf_dir: str, alias: str = "n_name") -> DataFrame:
    """(s_suppkey, <alias>=nation name) — the broadcast-ready supplier-side
    nation dim shared by the Q7/Q8/Q9-shaped queries."""
    n = table(spark, "nation", sf_dir)
    return (
        table(spark, "supplier", sf_dir)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias(alias))
    )



@register(
    "discounted_bulk_revenue",
    oracle=f"""
        SELECT {sql_money_round("sum(l_extendedprice * l_discount)")} AS revenue_delta,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def discounted_bulk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure-predicate scan → scalar aggregate.

    The whole query is a filter + global sum, so the plan must be a single
    parquet scan with ALL four predicates pushed into the reader
    (PushedFilters on shipdate/discount/quantity) and a two-column
    ReadSchema — the canonical pushdown/pruning probe. No joins, no
    exchange beyond the final 1-row partial-agg gather.
    """
    li = table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_round(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue_delta"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "market_share_by_year",
    oracle=f"""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {sql_ratio_round(
                   "sum(CASE WHEN n_name = 'NATION_0' "
                   "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
                   "/ sum(l_extendedprice * (1 - l_discount))")} AS nation0_share,
               {sql_money_round("sum(l_extendedprice * (1 - l_discount))")} AS total_revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE p_type = 'PROMO'
        GROUP BY 1
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue per year.

    Numerator and denominator come out of ONE aggregation (CASE inside
    sum), so market share costs a single pass. The part filter broadcasts
    onto the fact BEFORE the orders join, shrinking the only large shuffle
    to the PROMO subset; supplier⋈nation broadcasts as a pre-joined
    two-column dim. Same 100 TB shape as `volume_shipping_nations`.
    """
    li = table(spark, "lineitem", sf_dir)
    o = table(spark, "orders", sf_dir)
    promo = table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    sup_nation = _supplier_nation(spark, sf_dir)
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    nation0 = F.when(F.col("n_name") == "NATION_0", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(promo), li.l_partkey == promo.p_partkey)
        .join(F.broadcast(sup_nation), li.l_suppkey == sup_nation.s_suppkey)
        .join(o.hint("SHUFFLE_HASH"), li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            ratio_round(F.sum(nation0) / F.sum(rev)).alias("nation0_share"),
            money_round(F.sum(rev)).alias("total_revenue"),
        )
    )


@register(
    "small_quantity_part_revenue",
    oracle=f"""
        WITH brand AS (
            SELECT l_partkey, l_quantity, l_extendedprice
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#11'
        ), thresholds AS (
            SELECT l_partkey AS t_partkey, 0.2 * avg(l_quantity) AS qty_threshold
            FROM brand GROUP BY 1
        )
        SELECT {sql_ratio_round("CAST(CAST(sum(l_extendedprice) AS DECIMAL(38,2)) AS DOUBLE) / 7.0", 4)} AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_small_lines
        FROM brand JOIN thresholds ON l_partkey = t_partkey
        WHERE l_quantity < qty_threshold
    """,
)
def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-one-fifth-of-average-quantity
    lines of one brand (correlated per-part scalar threshold).

    The correlated subquery (avg quantity *for this part*) becomes a
    per-part WINDOW average over the brand-filtered fact slice — ONE scan
    of lineitem and ONE shuffle (hash on the part key), where the naive
    decorrelation (agg + re-join, which is what Catalyst produces for the
    spark.sql correlated form — `orders_above_customer_avg` pins that)
    would scan the fact twice. The brand filter broadcasts onto the fact
    first, so the shuffled slice is |brand lines|, not |lineitem|. The
    oracle states the same semantics in the classic CTE agg-then-join
    form; values agree because a partition-wide window avg IS the group
    avg. tests/test_plans.py pins the single-scan, single-shuffle shape.
    """
    li = table(spark, "lineitem", sf_dir)
    brand_parts = table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#11")
    brand = li.join(F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    threshold = F.lit(0.2) * F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    return (
        brand.withColumn("qty_threshold", threshold)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            ratio_round(
                F.sum("l_extendedprice").cast("decimal(38,2)").cast("double")
                / F.lit(7.0),
                4,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


@register(
    "nation_profit_by_year",
    oracle=f"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {sql_money_round(
                   "sum(l_extendedprice * (1 - l_discount) "
                   "- 0.5 * p_retailprice * l_quantity)")} AS profit
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
    """,
)
def nation_profit_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-(supplier nation, year) profit on name-matched
    parts. The testdata has no ``partsupp``, so supply cost is the standing
    stand-in ``0.5 * p_retailprice`` (same convention as the star schema's
    profit expr, etl/star_schema.py F1); the join/agg shape is Q9's.

    Part (name-filtered) and supplier⋈nation broadcast onto the fact, so
    the 5-way join costs exactly one large shuffle (lineitem ⋈ orders on
    the order key) — at 100 TB the substring part filter also prunes the
    fact via the broadcast join before that shuffle.
    """
    li = table(spark, "lineitem", sf_dir)
    o = table(spark, "orders", sf_dir)
    widget = (
        table(spark, "part", sf_dir)
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    sup_nation = _supplier_nation(spark, sf_dir, alias="nation")
    profit = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) - F.lit(
        0.5
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(widget), li.l_partkey == widget.p_partkey)
        .join(F.broadcast(sup_nation), li.l_suppkey == sup_nation.s_suppkey)
        .join(o.hint("SHUFFLE_HASH"), li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(money_round(F.sum(profit)).alias("profit"))
    )


# ---------------------------------------------------------------------------
# Analytic windows: lag / percent_rank / cume_dist / ntile / min_by / max_by
# ---------------------------------------------------------------------------


def _monthly_order_revenue(o: DataFrame) -> DataFrame:
    """(month, revenue) — the deterministic rounded monthly rollup shared
    by the MoM-growth and gap-fill queries."""
    return o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month")).agg(
        money_round(F.sum("o_totalprice")).alias("revenue")
    )



@register(
    "revenue_mom_growth",
    oracle=f"""
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   {sql_money_round("sum(o_totalprice)")} AS revenue
            FROM orders GROUP BY 1
        )
        SELECT month, revenue,
               lag(revenue) OVER (ORDER BY month) AS prev_revenue,
               {sql_ratio_round(
                   "(revenue - lag(revenue) OVER (ORDER BY month)) "
                   "/ lag(revenue) OVER (ORDER BY month)")} AS mom_growth
        FROM monthly
    """,
)
def revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``lag`` window: month-over-month revenue growth.

    The window runs over the PRE-AGGREGATED monthly table (≤ a few
    hundred rows at any SF — months, not orders), so the unpartitioned
    ORDER BY is never a fact-scale single-partition sort; the fact
    reduces in one shuffle first. First month's prev/growth are NULL by
    lag's definition — preserved, not coalesced, on both engines.
    """
    o = table(spark, "orders", sf_dir)
    monthly = _monthly_order_revenue(o)
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        ratio_round((F.col("revenue") - prev) / prev).alias("mom_growth"),
    )


@register(
    "customer_spend_deciles",
    oracle=f"""
        WITH spend AS (
            SELECT o_custkey AS cust_key,
                   {sql_money_round("sum(o_totalprice)")} AS total_spend
            FROM orders GROUP BY 1
        )
        SELECT cust_key, total_spend,
               {sql_ratio_round(
                   "percent_rank() OVER (ORDER BY total_spend, cust_key)")} AS pct_rank,
               {sql_ratio_round(
                   "cume_dist() OVER (ORDER BY total_spend, cust_key)")} AS cume,
               CAST(ntile(10) OVER (ORDER BY total_spend, cust_key) AS BIGINT) AS decile
        FROM spend
    """,
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window battery: ``percent_rank`` + ``cume_dist`` +
    ``ntile(10)`` over per-customer spend.

    The ORDER BY includes the unique customer key, so ties are broken
    identically in both engines and ntile's row-order bucketing is
    deterministic. Scale note: an unpartitioned ranking window is a
    global sort of |customers| — exact by design here (the reference's
    dashboard ranks exactly); at 100 TB the approx path is
    operators/segmentation.py's quantile cut (`customer_value_quartiles`),
    which needs no global sort.
    """
    o = table(spark, "orders", sf_dir)
    spend = o.groupBy(F.col("o_custkey").alias("cust_key")).agg(
        money_round(F.sum("o_totalprice")).alias("total_spend")
    )
    w = Window.orderBy("total_spend", "cust_key")
    return spend.select(
        "cust_key",
        "total_spend",
        ratio_round(F.percent_rank().over(w)).alias("pct_rank"),
        ratio_round(F.cume_dist().over(w)).alias("cume"),
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


@register(
    "customer_first_last_order",
    oracle="""
        SELECT o_custkey AS cust_key,
               CAST(count(*) AS BIGINT) AS n_orders,
               min(o_orderdate) AS first_order_ts,
               max(o_orderdate) AS last_order_ts,
               arg_min(o_orderpriority,
                       CAST(floor(epoch(o_orderdate)) AS BIGINT) * 10000000 + o_orderkey)
                   AS first_priority,
               arg_max(o_orderpriority,
                       CAST(floor(epoch(o_orderdate)) AS BIGINT) * 10000000 + o_orderkey)
                   AS last_priority
        FROM orders GROUP BY 1
    """,
)
def customer_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``min_by`` / ``max_by`` (argmin/argmax aggregates): attributes of
    each customer's first and last order in ONE grouped pass — no window,
    no self-join, no per-group sort.

    The ordering value is ``floor(epoch_seconds) * 1e7 + o_orderkey``:
    same-second ties break on the unique order key, so the argmin/argmax is
    total and both engines pick the same row (min_by/arg_min on tied values
    is otherwise engine-nondeterministic). The timestamp goes through a
    NTZ→session-tz cast first (value-preserving: session tz is pinned UTC,
    sources/registry.py) because Spark refuses TIMESTAMP_NTZ→BIGINT
    directly. The multiplier must EXCEED every o_orderkey or the key stops
    being (time, key)-lexicographic and a wrong-second row can win on both
    engines at once; 1e7 covers TPC-H sf1's ~6e6 max key with the product
    (~1e16) still far inside int64. This is the grouped-TOP-1
    fast path vs `latest_order_top1`'s TakeOrderedAndProject and
    `top3_per_category`'s ranked window.
    """
    o = table(spark, "orders", sf_dir)
    mult = 10000000
    ordval = F.col("o_orderdate").cast("timestamp").cast("long") * F.lit(
        mult
    ) + F.col("o_orderkey")
    # Loud guard for the lexicographic precondition: if any orderkey
    # reaches the multiplier the encoding silently mis-orders on BOTH
    # engines (the oracle states the same arithmetic), so fail the job
    # instead. The guard is embedded IN the consumed ordering expression
    # — a withColumn(...).drop(...) guard gets column-pruned by Catalyst
    # and never fires (review r8, reproduced; same hazard note as
    # operators/merge.py's in-plan assert).
    guard = F.assert_true(
        F.col("o_orderkey") < F.lit(mult),
        F.lit("o_orderkey >= 1e7: raise the ordval multiplier"),
    )
    ordval = F.when(guard.isNull(), ordval)
    return o.groupBy(F.col("o_custkey").alias("cust_key")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderdate").alias("first_order_ts"),
        F.max("o_orderdate").alias("last_order_ts"),
        F.min_by("o_orderpriority", ordval).alias("first_priority"),
        F.max_by("o_orderpriority", ordval).alias("last_priority"),
    )


# ---------------------------------------------------------------------------
# Cohort retention over events
# ---------------------------------------------------------------------------


@register(
    "events_retention_cohorts",
    oracle="""
        WITH firsts AS (
            SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
            FROM events GROUP BY 1
        )
        SELECT cohort_week,
               CAST(date_diff('day', cohort_week,
                              date_trunc('week', ts)) / 7 AS BIGINT) AS week_offset,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        GROUP BY cohort_week, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted per
    week offset — the product-analytics rollup every events warehouse
    ships (reference has per-user aggregates only; SURVEY §2.10
    extension).

    Two shuffles on user_id (first-seen agg, then the enrich join) — at
    100 TB both hash-partition on the same key so AQE coalesces them, and
    the final (cohort, offset) agg is distinct-counting over an already
    user-partitioned stream. Week arithmetic stays on Monday-truncated
    dates (identical in Spark and DuckDB), offset = day-diff / 7 exactly.
    """
    ev = table(spark, "events", sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / F.lit(7)
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


# ---------------------------------------------------------------------------
# Document chunking (training-pipeline op)
# ---------------------------------------------------------------------------

_CHUNK_SIZE = 200
_CHUNK_STRIDE = 160  # 40-char overlap between consecutive chunks


@register(
    "doc_chunks",
    oracle=f"""
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT) AS chunk_start,
               CAST(length(substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS INT),
                                  {_CHUNK_SIZE})) AS BIGINT) AS chunk_len,
               md5(substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS INT),
                          {_CHUNK_SIZE})) AS chunk_md5
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(0, CAST(greatest(0, ceil(
                       (length(text) - {_CHUNK_SIZE}) / {_CHUNK_STRIDE}.0))
                       AS BIGINT))) AS i
            FROM documents
        )
    """,
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window document chunking (200-char windows,
    160-char stride — the ``_CHUNK_SIZE`` / ``_CHUNK_STRIDE`` constants):
    the pre-encoding split step of embedding / RAG / LLM-training
    pipelines.

    Pure JVM expressions — ``sequence`` + ``explode`` generates the chunk
    indices, ``substr``/``md5`` materialize each window — so chunking is
    embarrassingly parallel with zero shuffle and no Python in the loop.
    Every document yields ≥1 chunk (short docs → one partial window); the
    last window may be shorter than the full size, captured by chunk_len.
    The md5 column verifies the chunk TEXT value-exactly against the
    DuckDB oracle without hauling full chunk bodies through the compare.
    """
    return chunk_chars(table(spark, "documents", sf_dir))


def chunk_chars(docs: DataFrame) -> DataFrame:
    """The character-window chunk plan over any (doc_id, text) relation —
    factored out of `doc_chunks` so edge-length behavior (empty docs,
    exact-boundary lengths) is unit-testable on synthetic frames."""
    last_idx = F.greatest(
        F.lit(0),
        F.ceil((F.length("text") - F.lit(_CHUNK_SIZE)) / F.lit(float(_CHUNK_STRIDE))),
    ).cast("long")
    start = F.col("i") * _CHUNK_STRIDE + 1
    chunk = F.col("text").substr(start.cast("int"), F.lit(_CHUNK_SIZE))
    return (
        docs.select("doc_id", "text", F.explode(F.sequence(F.lit(0).cast("long"), last_idx)).alias("i"))
        .select(
            "doc_id",
            F.col("i").alias("chunk_idx"),
            start.cast("long").alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_len"),
            F.md5(chunk).alias("chunk_md5"),
        )
    )


# ---------------------------------------------------------------------------
# Regression aggregates + token-boundary chunking
# ---------------------------------------------------------------------------


@register(
    "nation_revenue_trend",
    oracle=f"""
        WITH monthly AS (
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) * 12 + month(o_orderdate) AS DOUBLE)
                       AS month_no,
                   {sql_money_round("sum(o_totalprice)")} AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY 1, 2
        )
        SELECT nation,
               CAST(count(*) AS BIGINT) AS n_months,
               round(regr_slope(revenue, month_no) + 1e-9, 2) AS slope,
               round(regr_intercept(revenue, month_no) + 1e-9, 2) AS intercept,
               {sql_ratio_round("regr_r2(revenue, month_no)")} AS r2
        FROM monthly GROUP BY 1
    """,
)
def nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (`regr_slope` / `regr_intercept` /
    `regr_r2`): per-nation monthly revenue trend — the "is this market
    growing" dashboard fit, computed as a grouped aggregate instead of a
    driver-side model fit.

    Two shuffles, both key-partitioned aggs: fact → (nation, month)
    rollup, then the regression over each nation's ≤ |months| points. The
    regression inputs are the DETERMINISTIC rounded monthly sums, so the
    fit is a pure function of exact decimals on both engines; outputs
    round at 2dp (slope/intercept, dollar-scale) and 6dp (r², a ratio).
    """
    o = table(spark, "orders", sf_dir)
    cust_nation = (
        table(spark, "customer", sf_dir)
        .join(
            F.broadcast(table(spark, "nation", sf_dir)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("nation"))
    )
    monthly = (
        o.join(F.broadcast(cust_nation), o.o_custkey == cust_nation.c_custkey)
        .groupBy(
            "nation",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("double")
            .alias("month_no"),
        )
        .agg(money_round(F.sum("o_totalprice")).alias("revenue"))
    )
    return monthly.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_months"),
        (F.round(F.regr_slope("revenue", "month_no") + F.lit(1e-9), 2)).alias("slope"),
        (F.round(F.regr_intercept("revenue", "month_no") + F.lit(1e-9), 2)).alias(
            "intercept"
        ),
        ratio_round(F.regr_r2("revenue", "month_no")).alias("r2"),
    )


_TOK_CHUNK = 60
_TOK_STRIDE = 50  # 10-token overlap


@register(
    "doc_chunks_tokens",
    oracle=f"""
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(len(list_slice(toks, CAST(i * {_TOK_STRIDE} + 1 AS BIGINT),
                                   CAST(i * {_TOK_STRIDE} + {_TOK_CHUNK} AS BIGINT)))
                    AS BIGINT) AS n_tokens,
               md5(array_to_string(
                   list_slice(toks, CAST(i * {_TOK_STRIDE} + 1 AS BIGINT),
                              CAST(i * {_TOK_STRIDE} + {_TOK_CHUNK} AS BIGINT)),
                   ' ')) AS chunk_md5
        FROM (
            SELECT doc_id, toks,
                   unnest(generate_series(0, CAST(greatest(0, ceil(
                       (len(toks) - {_TOK_CHUNK}) / {_TOK_STRIDE}.0)) AS BIGINT)))
                       AS i
            FROM (
                SELECT doc_id,
                       list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            )
        )
    """,
)
def doc_chunks_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-boundary chunking (60-token windows, 50-token stride — the
    ``_TOK_CHUNK`` / ``_TOK_STRIDE`` constants): the chunker variant real
    training/RAG pipelines use when windows must not split words —
    complements the character-window `doc_chunks`.

    Whitespace tokens (empty-filtered on both engines, so leading/trailing
    blanks don't shift offsets), chunk text rebuilt single-spaced — a
    DETERMINISTIC canonical form both engines derive identically even
    though the original inter-token whitespace varies. All JVM array
    functions (split / filter / sequence / explode / slice / array_join),
    zero shuffle.
    """
    return chunk_tokens(table(spark, "documents", sf_dir))


def chunk_tokens(docs: DataFrame) -> DataFrame:
    """The token-window chunk plan over any (doc_id, text) relation —
    factored out of `doc_chunks_tokens` for edge-case unit tests."""
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    with_toks = docs.select("doc_id", toks.alias("toks"))
    last_idx = F.greatest(
        F.lit(0),
        F.ceil((F.size("toks") - F.lit(_TOK_CHUNK)) / F.lit(float(_TOK_STRIDE))),
    ).cast("long")
    chunk = F.slice(
        F.col("toks"), (F.col("i") * _TOK_STRIDE + 1).cast("int"), _TOK_CHUNK
    )
    return (
        with_toks.select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0).cast("long"), last_idx)).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
        )
    )


# ---------------------------------------------------------------------------
# Unpivot (melt) + fuzzy search
# ---------------------------------------------------------------------------


@register(
    "returnflag_metrics_unpivot",
    oracle=f"""
        WITH wide AS (
            SELECT l_returnflag AS return_flag,
                   {sql_money_round("sum(l_quantity)")} AS sum_qty,
                   {sql_money_round("sum(l_extendedprice)")} AS sum_price,
                   {sql_ratio_round("avg(l_discount)")} AS avg_disc
            FROM lineitem GROUP BY 1
        )
        SELECT return_flag, metric, value FROM (
            SELECT return_flag, 'sum_qty'  AS metric, sum_qty  AS value FROM wide
            UNION ALL
            SELECT return_flag, 'sum_price' AS metric, sum_price AS value FROM wide
            UNION ALL
            SELECT return_flag, 'avg_disc' AS metric, avg_disc AS value FROM wide
        )
    """,
)
def returnflag_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — the inverse of the pivot family
    (`pivot_category_priority`): a wide per-flag metric rollup reshaped to
    long (flag, metric, value) tidy format, the shape BI and plotting
    layers consume.

    Spark's native ``unpivot`` (an Expand node — one pass, no self-union,
    no shuffle beyond the rollup's) over the pre-aggregated wide relation;
    the oracle states the same reshape as the portable UNION ALL. Metric
    values align to a common double type on both engines.
    """
    li = table(spark, "lineitem", sf_dir)
    wide = li.groupBy(F.col("l_returnflag").alias("return_flag")).agg(
        money_round(F.sum("l_quantity")).alias("sum_qty"),
        money_round(F.sum("l_extendedprice")).alias("sum_price"),
        ratio_round(F.avg("l_discount")).alias("avg_disc"),
    )
    return wide.unpivot(
        "return_flag", ["sum_qty", "sum_price", "avg_disc"], "metric", "value"
    )


@register(
    "product_fuzzy_search",
    oracle="""
        SELECT p_partkey, p_name, CAST(dist AS BIGINT) AS dist,
               CAST(rk AS BIGINT) AS rank
        FROM (
            SELECT p_partkey, p_name,
                   levenshtein(p_name, 'grean widgt') AS dist,
                   row_number() OVER (
                       ORDER BY levenshtein(p_name, 'grean widgt'), p_partkey
                   ) AS rk
            FROM part
        )
        WHERE rk <= 10
    """,
)
def product_fuzzy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant product search: edit-distance top-10 for a misspelled
    query ('grean widgt') — extends the reference's exact/substring product
    search (reference pages/2_Product_Details.py search box) with the
    fuzzy ranking users actually expect.

    ``levenshtein`` is a JVM codegen'd expression over the dimension-sized
    part table; the top-10 runs as TakeOrderedAndProject (map-side partial
    top-k, no global sort materialized). Unique tie-break on p_partkey
    keeps the cut deterministic across engines. At 100 TB-corpus scale the
    same query composes with the n-gram LSH candidate generation in
    operators/dedup.py to avoid scoring every row; scoring a dimension
    directly, as here, is the right plan.
    """
    part = table(spark, "part", sf_dir)
    dist = F.levenshtein(F.col("p_name"), F.lit("grean widgt"))
    w = Window.orderBy("dist", "p_partkey")
    return (
        part.select("p_partkey", "p_name", dist.cast("long").alias("dist"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
    )


@register(
    "monthly_revenue_gapfill",
    oracle=f"""
        WITH bounds AS (
            SELECT date_trunc('month', min(o_orderdate)) AS lo,
                   date_trunc('month', max(o_orderdate)) AS hi
            FROM orders
        ), spine AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month
            FROM bounds
        ), monthly AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   {sql_money_round("sum(o_totalprice)")} AS revenue
            FROM orders GROUP BY 1
        )
        SELECT s.month,
               coalesce(m.revenue, 0.0) AS revenue,
               m.revenue IS NULL AS is_gap
        FROM spine s LEFT JOIN monthly m ON s.month = m.month
    """,
)
def monthly_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap fill: a dense month axis from the data's own
    bounds, left-joined to the monthly rollup with zero fill — the
    resample step every time-series chart/model needs (a month with no
    orders must plot as 0, not vanish; `trailing_30d_revenue`'s RANGE
    frame handles gaps implicitly, this materializes them).

    The spine is ``sequence(min_month, max_month, interval 1 month)``
    exploded from the 1-row bounds aggregate — generated, never stored,
    |months| rows at any SF — then broadcast onto the rollup. The fact is
    touched exactly twice (bounds + rollup), both single-shuffle aggs.
    """
    o = table(spark, "orders", sf_dir)
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("month")
    )
    monthly = _monthly_order_revenue(o)
    return (
        spine.join(monthly, "month", "left")
        .select(
            "month",
            F.coalesce(F.col("revenue"), F.lit(0.0)).alias("revenue"),
            F.col("revenue").isNull().alias("is_gap"),
        )
    )


@register(
    "product_monthly_ffill",
    oracle="""
        WITH bounds AS (
            SELECT date_trunc('month', min(l_shipdate)) AS lo,
                   date_trunc('month', max(l_shipdate)) AS hi
            FROM lineitem
        ), months AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month
            FROM bounds
        ), prods AS (
            SELECT p_partkey FROM part WHERE p_partkey % 50 = 0
        ), sales AS (
            SELECT l_partkey, date_trunc('month', l_shipdate) AS month,
                   sum(l_quantity) AS qty
            FROM lineitem JOIN prods ON l_partkey = p_partkey
            GROUP BY 1, 2
        ), spine AS (
            SELECT p_partkey, month FROM prods, months
        )
        SELECT s.p_partkey AS part_key, s.month,
               last_value(q.qty IGNORE NULLS) OVER (
                   PARTITION BY s.p_partkey ORDER BY s.month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS qty_filled,
               q.qty IS NULL AS is_imputed
        FROM spine s LEFT JOIN sales q
          ON s.p_partkey = q.l_partkey AND s.month = q.month
    """,
)
def product_monthly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS forward fill: per-product monthly quantity carried
    forward over the dense month spine — the imputation step time-series
    models need after `monthly_revenue_gapfill`'s resample (a product with
    no sales in March keeps February's level, flagged ``is_imputed``;
    months before a product's first sale stay NULL by definition).

    The spine is a broadcast cross of a deterministic product subset
    (every 50th key) × the generated month axis — dimension-sized, never
    stored. ``last(qty, ignorenulls=True)`` over the per-product ordered
    frame is the carry. The FACT is shuffled exactly once (the sales
    rollup, pre-shrunk by the broadcast product filter); the spine join
    and the window exchange only |products| × |months| rows — at 100 TB
    the dense grid stays dimension-scale while the fact reduces first.
    """
    li = table(spark, "lineitem", sf_dir)
    bounds = li.agg(
        F.date_trunc("month", F.min("l_shipdate")).alias("lo"),
        F.date_trunc("month", F.max("l_shipdate")).alias("hi"),
    )
    months = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))).alias("month")
    )
    prods = (
        table(spark, "part", sf_dir)
        .filter(F.col("p_partkey") % 50 == 0)
        .select("p_partkey")
    )
    sales = (
        li.join(F.broadcast(prods), li.l_partkey == prods.p_partkey)
        .groupBy(
            F.col("l_partkey"),
            F.date_trunc("month", F.col("l_shipdate")).alias("month"),
        )
        .agg(F.sum("l_quantity").alias("qty"))
    )
    sales = sales.select(
        F.col("l_partkey").alias("s_key"),
        F.col("month").alias("s_month"),
        "qty",
    )
    spine = prods.crossJoin(F.broadcast(months)).select(
        F.col("p_partkey").alias("part_key"), "month"
    )
    w = (
        Window.partitionBy("part_key")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(
            sales,
            (F.col("part_key") == F.col("s_key")) & (F.col("month") == F.col("s_month")),
            "left",
        )
        .select(
            "part_key",
            "month",
            F.last("qty", ignorenulls=True).over(w).alias("qty_filled"),
            F.col("qty").isNull().alias("is_imputed"),
        )
    )


@register(
    "customer_trailing_order_count",
    oracle="""
        WITH o AS (
            SELECT o_orderkey, o_custkey,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS day_no
            FROM orders
        )
        SELECT o_orderkey AS order_key, o_custkey AS cust_key,
               CAST(count(*) OVER (
                   PARTITION BY o_custkey ORDER BY day_no
                   RANGE BETWEEN 90 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS orders_trailing_90d
        FROM o
    """,
)
def customer_trailing_order_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-window count: for EVERY order, how many orders
    its customer placed in the preceding 90 days (inclusive) — the
    row-level velocity feature fraud/churn models consume
    (`trailing_30d_revenue` is the global daily twin; this one runs at
    fact grain).

    RANGE frame over integer day numbers, PARTITIONed by customer — the
    window sorts each customer's orders locally after one hash shuffle on
    the customer key; no global sort at any scale. Same-day orders are
    frame peers (RANGE, not ROWS) so the count is order-independent and
    deterministic on both engines.
    """
    o = table(spark, "orders", sf_dir)
    day_no = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_no)
        .rangeBetween(-90, Window.currentRow)
    )
    return o.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.count(F.lit(1)).over(w).cast("long").alias("orders_trailing_90d"),
    )


@register(
    "returnflag_robust_stats",
    oracle="""
        SELECT l_returnflag AS return_flag,
               round(CAST(median(l_extendedprice) AS DOUBLE) + 1e-9, 6)
                   AS median_price,
               round(CAST(mad(l_extendedprice) AS DOUBLE) + 1e-9, 6) AS mad_price,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY 1
    """,
)
def returnflag_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per group: exact median + MAD (median absolute
    deviation) of the line price — the outlier-resistant spread stat
    quality pipelines prefer over stddev on heavy-tailed money columns.

    Spark has no mad(): it composes as median-of-|x − group median| —
    per-group median (one grouped agg), broadcast back onto the fact, then
    a second grouped exact median of the absolute deviations. Two
    single-key shuffles on the 3-value flag; medians are exact
    (`F.median`), so the result is deterministic and matches DuckDB's
    built-in ``mad`` value-for-value.
    """
    li = table(spark, "lineitem", sf_dir)
    med = li.groupBy(F.col("l_returnflag").alias("__rf")).agg(
        F.median("l_extendedprice").alias("__med"),
        F.count(F.lit(1)).alias("__n"),
    )
    return (
        li.join(F.broadcast(med), li.l_returnflag == F.col("__rf"))
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            ratio_round(F.first("__med")).alias("median_price"),
            ratio_round(
                F.median(F.abs(F.col("l_extendedprice") - F.col("__med")))
            ).alias("mad_price"),
            F.first("__n").alias("n_lines"),
        )
    )


@register(
    "events_props_map",
    oracle="""
        SELECT event_type, k_key AS prop_key,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(min(k_val) AS BIGINT) AS min_val,
               CAST(max(k_val) AS BIGINT) AS max_val
        FROM (
            SELECT event_type,
                   unnest(json_keys(props)) AS k_key,
                   CAST(json_extract_string(props, '$.' || k_key) AS BIGINT)
                       AS k_val
            FROM events
        )
        GROUP BY 1, 2
    """,
)
def events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type semi-structured access: props parsed into
    ``map<string,long>`` (schema-free — new keys need no schema change),
    entries exploded, stats per (event_type, key).

    The third semi-structured encoding beside the per-access
    `get_json_object` (`events_props_stats`) and binary VARIANT
    (`events_props_variant`): ``from_json`` to MapType + ``explode`` is
    the shape for ragged key sets where columns can't be predeclared.
    One shuffle (the final rollup); parse and explode are narrow.
    """
    from pyspark.sql.types import LongType, MapType, StringType

    ev = table(spark, "events", sf_dir)
    m = F.from_json("props", MapType(StringType(), LongType()))
    return (
        ev.select("event_type", F.explode(m).alias("prop_key", "k_val"))
        .groupBy("event_type", "prop_key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k_val").alias("min_val"),
            F.max("k_val").alias("max_val"),
        )
    )


# Shared by the registered single-window query and its exact distributed
# twin below: identical statistics by construction, so one oracle.
_PARETO_ORACLE = f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(sum(o_totalprice) AS DECIMAL(38,4)) AS revenue
            FROM orders GROUP BY 1
        ),
        ranked AS (
            SELECT revenue,
                   row_number() OVER (ORDER BY revenue DESC, o_custkey)
                       AS rk,
                   CAST(sum(revenue) OVER (ORDER BY revenue DESC, o_custkey
                                      ROWS UNBOUNDED PRECEDING)
                        AS DECIMAL(38,4)) AS running,
                   CAST(sum(revenue) OVER () AS DECIMAL(38,4)) AS total,
                   count(*) OVER () AS n_cust,
                   CAST(ceil(0.2 * count(*) OVER ()) AS BIGINT) AS top20_cut
            FROM per_cust
        )
        SELECT CAST(min(CASE WHEN 5 * running >= 4 * total THEN rk END)
                    AS BIGINT) AS customers_for_80pct,
               CAST(max(n_cust) AS BIGINT) AS n_customers,
               {sql_ratio_round(
                   "min(CASE WHEN 5 * running >= 4 * total THEN rk END)"
                   " / CAST(max(n_cust) AS DOUBLE)")} AS pareto_fraction,
               {sql_ratio_round(
                   "CAST(max(CASE WHEN rk <= top20_cut THEN running END) AS DOUBLE)"
                   " / CAST(max(total) AS DOUBLE)")} AS top20pct_share
        FROM ranked
    """


@register("revenue_pareto_share", oracle=_PARETO_ORACLE)
def revenue_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration of customer revenue: how many customers cover
    80% of revenue, and what share the top-20% hold — the 80/20 check a
    revenue team runs first.

    Per-customer revenue aggregates once (decimal-snapped), then a
    SINGLE-PARTITION running-sum window over the |customers|-sized
    aggregate finds the frontier. That global window is the documented
    cost: fine through ~1e8 customers (the relation is two doubles per
    row); beyond that ``revenue_pareto_share_distributed`` (below) is
    the EXACT coded escape — same values via the distributed two-pass
    prefix sum, no global window (equality test-pinned).
    Running sums add IDENTICAL snapped values in the IDENTICAL
    (revenue DESC, custkey) order on both engines, so the frontier rank
    cannot flip.
    """
    o = table(spark, "orders", sf_dir)
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").cast("decimal(38,4)").alias("revenue")
    )
    wo = Window.orderBy(F.col("revenue").desc(), "o_custkey")
    ranked = per_cust.select(
        "revenue",
        F.row_number().over(wo).alias("rk"),
        F.sum("revenue")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("decimal(38,4)")
        .alias("running"),
        F.sum("revenue").over(Window.partitionBy()).cast("decimal(38,4)").alias("total"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_cust"),
    ).withColumn("top20_cut", F.ceil(0.2 * F.col("n_cust")).cast("long"))
    # 5·running ≥ 4·total: exact decimal cross-multiplication, so the
    # frontier compare has NO double arithmetic and cannot flip on
    # summation-order ulps (the prior 0.8·total form could).
    frontier = F.min(
        F.when(5 * F.col("running") >= 4 * F.col("total"), F.col("rk"))
    )
    return ranked.agg(
        frontier.cast("long").alias("customers_for_80pct"),
        F.max("n_cust").cast("long").alias("n_customers"),
        ratio_round(frontier / F.max("n_cust").cast("double")).alias("pareto_fraction"),
        ratio_round(
            F.max(F.when(F.col("rk") <= F.col("top20_cut"), F.col("running")))
            .cast("double")
            / F.max("total").cast("double")
        ).alias("top20pct_share"),
    )


@register(
    "order_amount_benford",
    oracle=f"""
        WITH digits AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                    AS STRING), 1, 1) AS BIGINT) AS digit
            FROM orders WHERE o_totalprice >= 1
        )
        SELECT digit,
               CAST(count(*) AS BIGINT) AS n,
               {sql_ratio_round("count(*) / CAST(sum(count(*)) OVER () AS DOUBLE)")}
                   AS observed,
               {sql_ratio_round("ln(1 + 1.0 / digit) / ln(10)")} AS expected
        FROM digits
        GROUP BY digit
    """,
)
def order_amount_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit profile of order amounts — the fraud/data-
    quality screen: organically-generated money values follow
    P(d) = log10(1 + 1/d); fabricated or truncated feeds don't.

    The first digit comes from the INTEGER part's string (floor → bigint
    → substr), never from log10-of-the-value — floor on the identical
    stored doubles is exact on both engines, while floor(log10(x)) flips
    at exact powers of ten when a libm returns 2.9999…96. One scan, a
    9-row aggregate, and a free share window over it; the expected curve
    is computed from the integer digit so only the final ln() ulp is in
    play, absorbed by the nudge.

    (The synthetic testdata's uniform-ish prices need NOT follow Benford —
    this query reports the profile; conformance judgment is the caller's.)
    """
    o = table(spark, "orders", sf_dir).filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    share = Window.partitionBy()
    return counts.select(
        "digit",
        "n",
        ratio_round(
            F.col("n") / F.sum("n").over(share).cast("double")
        ).alias("observed"),
        ratio_round(F.log(1 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))).alias(
            "expected"
        ),
    )


@register(
    "customer_rfm_segments",
    oracle=f"""
        WITH anchor AS (
            SELECT max(o_orderdate) AS maxd FROM orders
        ),
        rfm AS (
            SELECT o_custkey,
                   CAST(date_diff('day', max(o_orderdate),
                                  (SELECT maxd FROM anchor)) AS BIGINT)
                       AS recency_days,
                   CAST(count(*) AS BIGINT) AS frequency,
                   CAST(CAST(sum(o_totalprice) AS DECIMAL(38,4)) AS DOUBLE)
                       AS monetary
            FROM orders GROUP BY 1
        ),
        scored AS (
            SELECT o_custkey, recency_days, frequency, monetary,
                   ntile(4) OVER (ORDER BY recency_days ASC, o_custkey) AS r,
                   ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f,
                   ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m
            FROM rfm
        )
        SELECT o_custkey, recency_days, frequency,
               {sql_money_round("monetary")} AS monetary,
               CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
               CAST(m AS BIGINT) AS m,
               concat(CAST(r AS STRING), CAST(f AS STRING), CAST(m AS STRING))
                   AS segment
        FROM scored
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the CRM workhorse: quartile scores for Recency
    (days since last order, vs the dataset's max date), Frequency (order
    count), and Monetary (decimal-snapped spend), concatenated into the
    '111'-style segment label.

    Three ntile windows over the per-customer aggregate (|customers|
    rows, not the fact); each orders by (metric, custkey) so quartile
    boundaries are engine-deterministic, and monetary is snapped BEFORE
    ranking so a summation-order ulp cannot move a customer across a
    quartile. The date anchor broadcasts as a 1-row scalar.
    """
    o = table(spark, "orders", sf_dir)
    anchor = o.agg(F.max("o_orderdate").alias("__maxd"))
    rfm = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("__last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("o_totalprice").cast("decimal(38,4)").cast("double").alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("__maxd"), F.col("__last")).cast("long").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    r = F.ntile(4).over(Window.orderBy(F.col("recency_days").asc(), "o_custkey"))
    f = F.ntile(4).over(Window.orderBy(F.col("frequency").desc(), "o_custkey"))
    m = F.ntile(4).over(Window.orderBy(F.col("monetary").desc(), "o_custkey"))
    scored = rfm.select(
        "o_custkey",
        "recency_days",
        "frequency",
        money_round(F.col("monetary")).alias("monetary"),
        r.cast("long").alias("r"),
        f.cast("long").alias("f"),
        m.cast("long").alias("m"),
    )
    return scored.withColumn(
        "segment",
        F.concat(
            F.col("r").cast("string"), F.col("f").cast("string"), F.col("m").cast("string")
        ),
    )


@register(
    "basket_part_pairs",
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   CAST(count(*) AS BIGINT) AS support
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        )
        SELECT part_a, part_b, support
        FROM pairs
        ORDER BY support DESC, part_a, part_b
        LIMIT 25
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: the 25 part pairs most often bought in
    the same order — pairwise frequent itemsets, the association step
    behind "bought together" recommendations.

    The within-order self-join is the canonical formulation; its blowup
    is quadratic in ORDER SIZE, not order count — baskets here are ≤ 7
    lines, so each order emits ≤ 21 pairs and the join stays linear in
    the fact at any corpus size (the same bounded-group argument as the
    LSH band join). Distinct (order, part) first so quantity split
    across lines cannot double-count a pair; top-25 via partial top-k
    with full tie-breaks.
    """
    li = table(spark, "lineitem", sf_dir)
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("__ok2"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, (F.col("__ok") == F.col("__ok2")) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(25)
    )


@register(
    "nation_supplier_hhi",
    oracle=f"""
        WITH by_sup AS (
            SELECT n_name,
                   CAST(sum(l_extendedprice * (1 - l_discount))
                        AS DECIMAL(38,4)) AS rev
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            GROUP BY n_name, s_suppkey
        )
        , shares AS (
            SELECT n_name,
                   CAST(rev AS DOUBLE)
                       / CAST(sum(rev) OVER (PARTITION BY n_name) AS DOUBLE)
                       AS sh
            FROM by_sup
        )
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               {sql_ratio_round("sum(power(sh, 2))")} AS hhi
        FROM shares
        GROUP BY n_name
    """,
)
def nation_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of supplier revenue per nation
    (Σ share² — 1/n for perfect competition, 1.0 for monopoly) — the
    market-concentration metric an antitrust or vendor-risk review runs.

    One fact shuffle to (nation, supplier) revenue, then the share window
    and the Σshare² rollup both run over that tiny aggregate. Revenue
    snaps to DECIMAL before the share division, so every share is the
    same exact-over-exact double on both engines; the ≤|suppliers|-term
    sum of squares sits well inside the nudged 6-dp round.
    """
    li = table(spark, "lineitem", sf_dir)
    sup_nation = _supplier_nation(spark, sf_dir)
    by_sup = (
        li.join(F.broadcast(sup_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("n_name", "s_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(38,4)")
            .alias("rev")
        )
    )
    share = F.col("rev").cast("double") / F.sum("rev").over(
        Window.partitionBy("n_name")
    ).cast("double")
    return (
        by_sup.withColumn("__sh", share)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            ratio_round(F.sum(F.pow(F.col("__sh"), 2))).alias("hhi"),
        )
    )


@register(
    "discount_quantity_correlation",
    oracle=f"""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_lines,
               {sql_ratio_round("corr(l_discount, l_quantity)")} AS corr_dq,
               {sql_ratio_round("covar_samp(l_discount, l_quantity)")} AS covar_dq
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def discount_quantity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation and sample covariance between discount and
    quantity per return flag — does discounting move volume? The
    bivariate-statistics aggregate family (corr/covar), not shown by any
    other registered query.

    Both engines implement the same textbook estimators over the same
    stored doubles; only summation order differs, and the ~1e-13
    relative noise that leaves sits far inside the nudged 6-dp round.
    One scan, partial-aggregable (Spark's corr/covar carry mergeable
    moment state), 3-row output.
    """
    li = table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        ratio_round(F.corr("l_discount", "l_quantity")).alias("corr_dq"),
        ratio_round(F.covar_samp("l_discount", "l_quantity")).alias("covar_dq"),
    )


@register(
    "customer_revenue_gini",
    oracle=f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(sum(o_totalprice) AS DECIMAL(38,4)) AS revenue
            FROM orders GROUP BY 1
        ),
        ranked AS (
            SELECT revenue,
                   row_number() OVER (ORDER BY revenue ASC, o_custkey) AS rk,
                   count(*) OVER () AS n,
                   CAST(sum(revenue) OVER () AS DECIMAL(38,4)) AS total
            FROM per_cust
        )
        SELECT CAST(max(n) AS BIGINT) AS n_customers,
               {sql_ratio_round(
                   "(2.0 * sum(CAST(rk AS DOUBLE) * CAST(revenue AS DOUBLE))"
                   " / (max(n) * CAST(max(total) AS DOUBLE)))"
                   " - (max(n) + 1.0) / max(n)")} AS gini
        FROM ranked
    """,
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue (0 = equal, →1 = one
    customer is everything) — the inequality companion to the Pareto
    frontier, via the rank-weighted closed form
    G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted revenue.

    Same single-partition window over the |customers|-sized aggregate as
    `revenue_pareto_share`; ``customer_revenue_gini_distributed`` (below)
    is the exact coded escape at extreme cardinality. Ranks are integers over decimal-snapped
    revenue in a pinned total order, so the weighted sum's inputs are
    identical on both engines; the final ratio takes the nudged round.
    """
    o = table(spark, "orders", sf_dir)
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").cast("decimal(38,4)").alias("revenue")
    )
    wo = Window.orderBy(F.col("revenue").asc(), "o_custkey")
    ranked = per_cust.select(
        "revenue",
        F.row_number().over(wo).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("revenue").over(Window.partitionBy()).cast("decimal(38,4)").alias("total"),
    )
    gini = (
        2.0
        * F.sum(F.col("rk").cast("double") * F.col("revenue").cast("double"))
        / (F.max("n") * F.max("total").cast("double"))
    ) - (F.max("n") + 1.0) / F.max("n")
    return ranked.agg(
        F.max("n").cast("long").alias("n_customers"),
        ratio_round(gini).alias("gini"),
    )


@register(
    "basket_pagerank_audit",
    oracle="""
        WITH multi AS (
            SELECT l_orderkey
            FROM lineitem GROUP BY 1
            HAVING count(DISTINCT l_partkey) >= 2
        )
        SELECT
            (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem
              WHERE l_orderkey IN (SELECT l_orderkey FROM multi)) AS n_nodes,
            TRUE AS converged_within_max,
            TRUE AS converged_by_iter_25,
            TRUE AS residual_below_tol,
            TRUE AS sum_to_one,
            TRUE AS residual_small,
            TRUE AS min_rank_above_floor
    """,
)
def basket_pagerank_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PageRank (operators/graph.py) over the basket
    co-purchase graph — parts are nodes, an edge joins two parts bought
    in the same order (both directions) — the product-importance twin of
    `basket_part_pairs`.

    The rank vector is engine-specific (doubles through 30 join+agg
    iterations), so the driver row attests the power-iteration INVARIANTS
    instead of values:

    - the node set size (the oracle derives it from multi-part orders);
    - the iteration CONVERGED before the cap (this near-regular random
      graph has a tiny second eigenvalue, so the 0.85-damped residual
      collapses within a couple dozen steps — measured: under 1e-15 by
      iteration 20 at sf0.01; a broken iteration diverges or stalls);
    - ranks sum to 1 within 1e-9 (dangling mass conserved — the
      symmetric graph has none, so a drift here is an arithmetic bug);
    - the final L1 residual is < 1e-9;
    - every rank ≥ (1−d)/n − ε, the structural PageRank floor.
    """
    from data_warehouse_product_mix_clustering_spark.operators.graph import pagerank

    li = table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("dst"))
    edges = a.join(b, "__ok").filter(F.col("src") != F.col("dst")).select("src", "dst")

    ranks, it, resid = pagerank(edges, tol=1e-12, max_iter=40)
    stats = ranks.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rank").alias("s"),
        F.min("rank").alias("mn"),
    ).first()
    n = stats["n"]
    floor = 0.15 / n - 1e-12
    # Convergence SPEED rides the hash row too (VERDICT r8 Next #7):
    # measured ≤20 iterations to residual <1e-15 at sf0.01 (tol 1e-12),
    # so ≤25 is generous headroom while a stalled/slowed iteration —
    # which still satisfies the loose within-cap bound — flips the
    # driver row red, not just a pytest assertion.
    return spark.createDataFrame(
        [
            (
                n,
                bool(it < 40 or resid <= 1e-12),
                bool(it <= 25),
                bool(resid <= 1e-12),
                bool(abs(stats["s"] - 1.0) < 1e-9),
                bool(resid < 1e-9),
                bool(stats["mn"] >= floor),
            )
        ],
        "n_nodes long, converged_within_max boolean, converged_by_iter_25 boolean, "
        "residual_below_tol boolean, sum_to_one boolean, "
        "residual_small boolean, min_rank_above_floor boolean",
    )


@register(
    "customer_fuzzy_matches",
    oracle="""
        SELECT a.c_custkey AS probe_key, b.c_custkey AS match_key,
               CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS distance
        FROM customer a
        JOIN customer b
          ON a.c_custkey % 100 = 7 AND b.c_custkey % 100 <> 7
        WHERE abs(length(a.c_name) - length(b.c_name)) <= 2
          AND levenshtein(a.c_name, b.c_name) <= 2
    """,
)
def customer_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution similarity JOIN: every (probe, corpus) customer
    pair within edit distance 2 — the join form of the reference's
    driver-side fuzzy scan (`product_fuzzy_search` mirrors that one;
    src/pages/2_Product_Details.py's search box is the semantic anchor).

    Probe batch = ``c_custkey % 100 == 7`` (~1%, the incremental-ingest
    framing shared with `dedup_incremental_*`); corpus = the rest. The
    plan is operators/strings.py::edit_distance_join — rarest-q-gram
    prefix postings (k·q+1 grams per name under a global
    frequency-ascending order) joined on gram, then exact levenshtein
    verify — so the result equals the oracle's quadratic
    levenshtein-filtered join without ever forming the cross product.
    """
    from data_warehouse_product_mix_clustering_spark.operators.strings import edit_distance_join

    cust = table(spark, "customer", sf_dir)
    probe = cust.filter(F.col("c_custkey") % 100 == 7).select(
        F.col("c_custkey").alias("probe_key"), F.col("c_name").alias("probe_name")
    )
    corpus = cust.filter(F.col("c_custkey") % 100 != 7).select(
        F.col("c_custkey").alias("match_key"), F.col("c_name").alias("match_name")
    )
    # The probe is ~1% of customers — the broadcast-verify strategy (one
    # corpus scan, thresholded levenshtein, zero shuffle) is the right
    # plan at this cardinality ratio; the prefix-postings strategy is the
    # both-sides-large path (completeness pinned in test_operators.py).
    return edit_distance_join(
        probe, corpus, "probe_key", "match_key", "probe_name", "match_name",
        max_dist=2, q=2, strategy="broadcast",
    ).select("probe_key", "match_key", "distance")


@register(
    "revenue_forecast_backtest",
    oracle="""
        WITH monthly AS (
            SELECT date_trunc('month', o_orderdate) AS month,
                   sum(o_totalprice) AS revenue
            FROM orders GROUP BY 1
        ),
        feat AS (
            SELECT month, revenue,
                   lag(revenue, 1) OVER (ORDER BY month) AS naive,
                   lag(revenue, 12) OVER (ORDER BY month) AS seasonal,
                   lag(revenue, 1) OVER (ORDER BY month)
                     + (lag(revenue, 1) OVER (ORDER BY month)
                        - lag(revenue, 2) OVER (ORDER BY month)) AS drift
            FROM monthly
        )
        SELECT method,
               CAST(count(err) AS BIGINT) AS n_months,
               CAST(round(avg(err)) AS BIGINT) AS mae,
               CAST(round(avg(serr)) AS BIGINT) AS bias
        FROM (
            SELECT 'naive' AS method, abs(revenue - naive) AS err,
                   revenue - naive AS serr FROM feat WHERE naive IS NOT NULL
            UNION ALL
            SELECT 'seasonal', abs(revenue - seasonal), revenue - seasonal
            FROM feat WHERE seasonal IS NOT NULL
            UNION ALL
            SELECT 'drift', abs(revenue - drift), revenue - drift
            FROM feat WHERE drift IS NOT NULL
        )
        GROUP BY method
    """,
)
def revenue_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline backtest over the monthly revenue series — the
    sanity harness every warehouse forecast ships against: walk-forward
    one-step errors of the three classical baselines (naive = last
    month, seasonal naive = same month last year, drift = last month +
    last delta), reported as per-method MAE and signed bias (rounded to
    whole currency — cross-engine-safe coarse rounding).

    Plan: one fact aggregation to the ~monthly spine (tiny), then lag
    windows over the single ordered series — the window runs on a
    relation of |months| rows, so the single-partition window is
    bounded by the calendar, not the data (the same justification as
    the Pareto/Gini aggregates); everything before it is a map-side
    partial sum. Errors stack via one array-explode rather than a
    3-way self-union, so the spine computes once.
    """
    monthly = (
        table(spark, "orders", sf_dir)
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.orderBy("month")
    feat = monthly.select(
        "revenue",
        F.lag("revenue", 1).over(w).alias("naive"),
        F.lag("revenue", 12).over(w).alias("seasonal"),
        (
            F.lag("revenue", 1).over(w)
            + (F.lag("revenue", 1).over(w) - F.lag("revenue", 2).over(w))
        ).alias("drift"),
    )
    methods = F.array(
        *[
            F.struct(
                F.lit(m).alias("method"),
                (F.col("revenue") - F.col(m)).alias("serr"),
            )
            for m in ("naive", "seasonal", "drift")
        ]
    )
    errs = (
        feat.select(F.explode(methods).alias("e"))
        .select(F.col("e.method").alias("method"), F.col("e.serr").alias("serr"))
        .filter(F.col("serr").isNotNull())
    )
    return errs.groupBy("method").agg(
        F.count("serr").cast("long").alias("n_months"),
        F.round(F.avg(F.abs(F.col("serr")))).cast("long").alias("mae"),
        F.round(F.avg("serr")).cast("long").alias("bias"),
    )


@register(
    "basket_triangle_stats",
    oracle="""
        WITH li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        e AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM li a
            JOIN li b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
        ),
        deg AS (
            SELECT n, count(*) AS d
            FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
            GROUP BY 1
        ),
        tri AS (
            SELECT count(*) AS t
            FROM e e1
            JOIN e e2 ON e1.v = e2.u
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
               (SELECT CAST(t AS BIGINT) FROM tri) AS n_triangles,
               (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg) AS n_wedges,
               round(3.0 * (SELECT t FROM tri)
                     / (SELECT sum(d * (d - 1) / 2) FROM deg) + 1e-9, 6)
                   AS global_clustering
    """,
)
def basket_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the basket co-purchase graph (parts joined by
    a shared order): exact triangle count, wedge count, and the global
    clustering coefficient — how strongly "bought together" closes into
    cliques, the graph-cohesion twin of `basket_part_pairs`.

    Plan: operators/graph.py::triangle_stats — degree-oriented wedge
    closure (compact-forward), which caps per-vertex wedge fan-out at
    O(√|E|) so a hub product cannot explode the join; the oracle counts
    the same triangles with the quadratic 3-way self-join DuckDB can
    afford at oracle scale.
    """
    from data_warehouse_product_mix_clustering_spark.operators.graph import triangle_stats

    li = table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "__ok").filter(F.col("src") < F.col("dst")).select("src", "dst")
    )
    return triangle_stats(edges)


# Bernoulli-by-hash sample at nominal 10%: md5-prefix < this 8-hex bound.
# The ACTUAL inclusion probability is the bound's exact value (the
# estimator must scale by what the predicate really selects, not 0.1).
_SAMPLE_BOUND = format(int(0.1 * 16**8), "08x")  # '19999999'
_SAMPLE_P = int(_SAMPLE_BOUND, 16) / 16**8


@register(
    "revenue_sample_estimate",
    oracle=f"""
        WITH s AS (
            SELECT o_totalprice AS y
            FROM orders
            WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)
                      < '{_SAMPLE_BOUND}'
        ),
        est AS (
            SELECT CAST(count(*) AS BIGINT) AS n_sampled,
                   sum(y) / {_SAMPLE_P!r} AS estimate,
                   1.96 * sqrt((1 - {_SAMPLE_P!r}) / ({_SAMPLE_P!r} * {_SAMPLE_P!r})
                               * sum(y * y)) AS hw
            FROM s
        )
        SELECT n_sampled,
               CAST(round(estimate) AS BIGINT) AS estimate,
               CAST(round(hw) AS BIGINT) AS ci_halfwidth,
               abs((SELECT sum(o_totalprice) FROM orders) - estimate) <= hw
                   AS covers_truth
        FROM est
    """,
)
def revenue_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-bounded approximate total from a 10% Bernoulli-by-hash
    sample — the online-aggregation / query-budget primitive: scan a
    deterministic tenth of the fact, report the Horvitz-Thompson total
    with a 95% CI, and (here, auditably) whether the CI covers the true
    total.

    The sample predicate is a pure function of md5(o_orderkey), so both
    engines select the IDENTICAL sample and every output value matches
    exactly — the estimator itself is oracle-checked, not just its
    contract. The estimator scales by the predicate's EXACT inclusion
    probability (the hex bound's value), not the nominal 0.1; variance
    is the Bernoulli-HT form (1−p)/p² · Σ y². At 100 TB the predicate
    pushes to the scan and the whole estimate costs a 10% read — with
    the CI telling the user what that 90% discount bought.
    """
    orders = table(spark, "orders", sf_dir)
    s = orders.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8)
        < _SAMPLE_BOUND
    ).select(F.col("o_totalprice").alias("y"))
    p = _SAMPLE_P
    est = s.agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        (F.sum("y") / p).alias("__est"),
        (1.96 * F.sqrt((1 - p) / (p * p) * F.sum(F.col("y") * F.col("y")))).alias(
            "__hw"
        ),
    )
    truth = orders.agg(F.sum("o_totalprice").alias("__truth"))
    return est.crossJoin(F.broadcast(truth)).select(
        "n_sampled",
        F.round("__est").cast("long").alias("estimate"),
        F.round("__hw").cast("long").alias("ci_halfwidth"),
        (F.abs(F.col("__truth") - F.col("__est")) <= F.col("__hw")).alias(
            "covers_truth"
        ),
    )


@register("revenue_pareto_share_distributed", oracle=_PARETO_ORACLE)
def revenue_pareto_share_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The coded escape hatch ``revenue_pareto_share``'s docstring
    points to (VERDICT r11: the single-partition-window class should
    carry its escape as code, not prose): the SAME frontier statistics
    computed with NO global window —
    ``operators/packing.py::with_rank_and_running`` supplies the global
    rank and the inclusive running revenue via the distributed two-pass
    prefix sum (range partition → partition windows → ≤P-row offsets).
    Prefix sums and ranks are associative, so the result is EXACTLY the
    registered query's (equality test-pinned), making this an exact
    scale twin rather than an approximation — at attested SFs the
    single window over the tiny per-customer aggregate is cheaper, so
    the registered query keeps it; past ~1e8 customers this is the
    plan. Registered r13 with the shared ``_PARETO_ORACLE``."""
    from data_warehouse_product_mix_clustering_spark.operators.packing import with_rank_and_running

    o = table(spark, "orders", sf_dir)
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").cast("decimal(38,4)").alias("revenue")
    )
    ranked = with_rank_and_running(
        per_cust,
        [F.col("revenue").desc(), F.col("o_custkey")],
        "revenue",
        rank_col="rk",
        running_col="running",
    ).withColumn("running", F.col("running").cast("decimal(38,4)"))
    totals = F.broadcast(
        per_cust.agg(
            F.sum("revenue").cast("decimal(38,4)").alias("total"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )
    joined = ranked.crossJoin(totals).withColumn(
        "top20_cut", F.ceil(0.2 * F.col("n_cust")).cast("long")
    )
    frontier = F.min(
        F.when(5 * F.col("running") >= 4 * F.col("total"), F.col("rk"))
    )
    return joined.agg(
        frontier.cast("long").alias("customers_for_80pct"),
        F.max("n_cust").cast("long").alias("n_customers"),
        ratio_round(frontier / F.max("n_cust").cast("double")).alias(
            "pareto_fraction"
        ),
        ratio_round(
            F.max(
                F.when(F.col("rk") <= F.col("top20_cut"), F.col("running"))
            ).cast("double")
            / F.max("total").cast("double")
        ).alias("top20pct_share"),
    )


@register(
    "customer_revenue_gini_distributed",
    oracle=f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(sum(o_totalprice) AS DECIMAL(38,4)) AS revenue
            FROM orders GROUP BY 1
        ),
        ranked AS (
            SELECT revenue,
                   row_number() OVER (ORDER BY revenue ASC, o_custkey) AS rk,
                   count(*) OVER () AS n,
                   CAST(sum(revenue) OVER () AS DECIMAL(38,4)) AS total
            FROM per_cust
        )
        SELECT CAST(max(n) AS BIGINT) AS n_customers,
               {sql_ratio_round(
                   "(2.0 * sum(CAST(rk AS DOUBLE) * CAST(revenue AS DOUBLE))"
                   " / (max(n) * CAST(max(total) AS DOUBLE)))"
                   " - (max(n) + 1.0) / max(n)")} AS gini
        FROM ranked
    """,
)
def customer_revenue_gini_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact twin of ``customer_revenue_gini`` — global
    ranks from the same two-pass prefix-sum machinery
    (operators/packing.py::with_rank_and_running), no global window;
    exactly equal by associativity (equality test-pinned). Same oracle
    as the registered windowed query: integer ranks over decimal-snapped
    revenue in a pinned total order make the weighted sum's inputs
    identical on both engines. At attested SFs the single window over
    the tiny per-customer aggregate is cheaper; past ~1e8 customers
    THIS is the plan."""
    from data_warehouse_product_mix_clustering_spark.operators.packing import with_rank_and_running

    o = table(spark, "orders", sf_dir)
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").cast("decimal(38,4)").alias("revenue")
    )
    ranked = with_rank_and_running(
        per_cust,
        [F.col("revenue").asc(), F.col("o_custkey")],
        "revenue",
        rank_col="rk",
        running_col="__unused_running",
    )
    totals = F.broadcast(
        per_cust.agg(
            F.sum("revenue").cast("decimal(38,4)").alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    joined = ranked.crossJoin(totals)
    gini = (
        2.0
        * F.sum(F.col("rk").cast("double") * F.col("revenue").cast("double"))
        / (F.max("n") * F.max("total").cast("double"))
    ) - (F.max("n") + 1.0) / F.max("n")
    return joined.agg(
        F.max("n").cast("long").alias("n_customers"),
        ratio_round(gini).alias("gini"),
    )
