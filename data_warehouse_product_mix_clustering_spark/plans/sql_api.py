"""spark.sql entry point (S3: the reference pushes literal SQL to its DBMS).

The reference's dashboard queries are raw SQL strings executed by
PostgreSQL (reference Clustering_Analysis.py:84-100); in this engine the
"DBMS" is Spark itself. These queries run the SAME ANSI-SQL text on Spark
(over registered temp views) that the driver's DuckDB oracle runs — one
string, two engines, hash-identical results — demonstrating that the SQL
surface, not just the DataFrame API, is a first-class entry point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_product_mix_clustering_spark.functions.numeric import sql_money_round, sql_ratio_round
from data_warehouse_product_mix_clustering_spark.plans.registry import register
from data_warehouse_product_mix_clustering_spark.sources.registry import load_testdata

# Written once in the engine-portable SQL subset (ANSI + date_trunc/round):
# used verbatim as BOTH the Spark query text and the DuckDB oracle.
_NATION_REVENUE_SQL = f"""
    SELECT n.n_name AS nation, r.r_name AS region,
           {sql_money_round("sum(l.l_extendedprice * (1 - l.l_discount))", 0)} AS revenue,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
"""

_ORDER_PRIORITY_SQL = f"""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           {sql_money_round("sum(o_totalprice)", 0)} AS total_price,
           {sql_ratio_round("avg(o_totalprice)", 2)} AS avg_price
    FROM orders
    GROUP BY o_orderpriority
"""


def _run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    load_testdata(spark, sf_dir, register_views=True)
    return spark.sql(sql)


@register("nation_revenue_sql", oracle=_NATION_REVENUE_SQL)
def nation_revenue_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation_revenue as literal SQL through spark.sql (S3 parity).

    Catalyst plans the identical physical strategy as the DataFrame
    version — broadcast dims, one big-big shuffle join — proving the two
    APIs are the same engine surface.
    """
    return _run_sql(spark, sf_dir, _NATION_REVENUE_SQL)


@register("order_priority_sql", oracle=_ORDER_PRIORITY_SQL)
def order_priority_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority rollup, single-string SQL on both engines."""
    return _run_sql(spark, sf_dir, _ORDER_PRIORITY_SQL)


# Round-7 second session: correlated LATERAL subquery — the "top-N per
# outer row" SQL idiom. One portable string; Spark decorrelates it into a
# row_number window + broadcast hash join (pinned in tests/test_plans.py),
# DuckDB executes it natively — hash-identical results.
_LATERAL_TOP_SUPPLIERS_SQL = """
    SELECT n.n_name, t.s_name, t.s_acctbal
    FROM nation n,
    LATERAL (
        SELECT s_name, s_acctbal FROM supplier s
        WHERE s.s_nationkey = n.n_nationkey
        ORDER BY s_acctbal DESC, s_name
        LIMIT 2
    ) t
"""


@register("lateral_top_suppliers", oracle=_LATERAL_TOP_SUPPLIERS_SQL)
def lateral_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 suppliers by account balance per nation via a correlated
    LATERAL subquery — the SQL-surface twin of the window-function
    formulation (`top3_per_category`).

    What this pins: Spark's decorrelation. A naive execution would run
    the subquery once per outer row; Catalyst rewrites it into ONE
    windowed scan of supplier (row_number ≤ 2 partitioned by nationkey)
    joined to nation — per-group top-k at scan cost, no repeated
    execution, no correlated loop. The ORDER BY carries s_name as the
    tie-break so the LIMIT boundary is deterministic across engines.
    """
    return _run_sql(spark, sf_dir, _LATERAL_TOP_SUPPLIERS_SQL)


def _hex_fraction_sql(cast_expr: str, chars: int = 6) -> str:
    """A uniform (0,1) draw from the md5 of ``cast_expr`` — evaluated from
    the hex digits with an explicit base-16 polynomial so the SAME string
    runs on Spark and DuckDB (neither needs a conv()/from_hex dialect
    function). +0.5 keeps the draw strictly inside (0,1) for ln()."""
    h = f"md5({cast_expr})"
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (chars - 1 - i)}"
        for i in range(chars)
    )
    # e-notation literals force DOUBLE arithmetic on BOTH engines — a
    # plain `0.5` makes Spark evaluate the quotient in DECIMAL (quantized
    # to 10 digits) while DuckDB uses DOUBLE, silently diverging the draw.
    return f"((({terms}) + 0.5e0) / {float(16 ** chars)!r})"


# A-Res (Efraimidis–Spirakis) weighted sampling without replacement:
# each row draws u ~ U(0,1) and ranks by u^(1/w) — realized as the
# order-equivalent ln(u)/w so no pow() is involved — and the top-k by
# that key IS a weighted sample. The draw comes from the content hash,
# so the "randomness" is deterministic, partition-independent, and
# identical on both engines; the repo's standard 6-dp round with a 1e-9
# nudge (nudge ≪ quantum) absorbs any last-ulp ln() difference between
# libms, and quantization ties break on doc_id identically everywhere.
_WEIGHTED_SAMPLE_SQL = f"""
    SELECT doc_id, n_chars,
           round(ln({_hex_fraction_sql("CAST(doc_id AS STRING)")})
                 / greatest(n_chars, 1) + 1e-9, 6) AS sample_key
    FROM documents
    ORDER BY sample_key DESC, doc_id
    LIMIT 50
"""


@register("doc_weighted_sample", oracle=_WEIGHTED_SAMPLE_SQL)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (A-Res), weight = n_chars:
    longer documents are proportionally likelier — the importance-
    sampling step a data-mixing pipeline runs with quality or domain
    weights.

    One scan + a partial top-k (TakeOrderedAndProject); no RNG state, no
    second pass, stable under growth and re-partitioning because the
    draw is a pure function of the content hash — the same determinism
    discipline as ``doc_split`` / ``doc_stratified_sample``, extended
    from uniform to weighted selection. Single portable SQL string runs
    verbatim on both engines.
    """
    return _run_sql(spark, sf_dir, _WEIGHTED_SAMPLE_SQL)


# FILTER-clause conditional aggregation: ANSI SQL:2003's cleaner form of
# CASE-inside-SUM, supported verbatim by Spark SQL and DuckDB — one string,
# two engines, completing the SQL-surface tour next to LATERAL. (An earlier
# draft filtered on dayofweek(), which is NOT portable: Spark counts
# Sunday=1..Saturday=7 while DuckDB counts Sunday=0..Saturday=6 — the
# priority predicate below means the same thing on both engines.)
_URGENT_REVENUE_SQL = """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                AS BIGINT) AS urgent_orders,
           CAST(count(*) FILTER (WHERE o_orderpriority <> '1-URGENT')
                AS BIGINT) AS other_orders,
           CAST(round(CAST(sum(o_totalprice)
                FILTER (WHERE o_orderpriority = '1-URGENT')
                AS DECIMAL(38,4)), 0) AS DOUBLE) AS urgent_revenue
    FROM orders
    GROUP BY 1
"""


@register("urgent_revenue_sql", oracle=_URGENT_REVENUE_SQL)
def urgent_revenue_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent vs non-urgent order split per year via FILTER-clause
    aggregates — the standard conditional-aggregation syntax, one
    portable string on both engines. All three aggregates come out of
    ONE pass; the filtered sum snaps through DECIMAL like every money
    rollup.
    """
    return _run_sql(spark, sf_dir, _URGENT_REVENUE_SQL)
