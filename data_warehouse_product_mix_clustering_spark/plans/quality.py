"""Data-quality queries: table profiling + contract checks over lineitem.

The pre-publish guardrail surface of the ingestion pipeline
(operators/quality.py), exercised on the biggest testdata table with full
DuckDB oracles — profiling and constraint math must agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.operators.quality import check_constraints, profile_table
from data_warehouse_product_mix_clustering_spark.plans.registry import register
from data_warehouse_product_mix_clustering_spark.sources.registry import table

_PROFILE_COLS = ["l_orderkey", "l_quantity", "l_discount", "l_shipdate", "l_returnflag"]


@register(
    "lineitem_profile",
    oracle=f"""
        SELECT *
        FROM (
            {" UNION ALL ".join(
                f'''SELECT '{c}' AS column_name,
                       CAST(count(*) AS BIGINT) AS n_rows,
                       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
                       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
                       CAST(min({c}) AS VARCHAR) AS min_value,
                       CAST(max({c}) AS VARCHAR) AS max_value
                FROM lineitem'''
                for c in _PROFILE_COLS
            )}
        )
    """,
)
def lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the fact table in ONE scan (stack-pivoted)."""
    return profile_table(table(spark, "lineitem", sf_dir), _PROFILE_COLS)


@register(
    "lineitem_quality",
    oracle="""
        SELECT 'not_null(l_orderkey)' AS constraint,
               CAST(count(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) AS violations
        FROM lineitem
        UNION ALL
        SELECT 'range(l_quantity,[1.0,50.0])',
               CAST(count(*) FILTER (WHERE l_quantity IS NOT NULL
                                       AND (l_quantity < 1 OR l_quantity > 50)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'range(l_discount,[0.0,0.1])',
               CAST(count(*) FILTER (WHERE l_discount IS NOT NULL
                                       AND (l_discount < 0 OR l_discount > 0.1)) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'unique(l_orderkey,l_linenumber)',
               CAST(coalesce(sum(n - 1), 0) AS BIGINT)
        FROM (SELECT count(*) AS n FROM lineitem
              GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
    """,
)
def lineitem_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract check: key not-null + uniqueness, business-range bounds.

    not-null and ranges share one scan; the composite-key uniqueness check
    is one grouped pass. All-zero violations = contract honored.
    """
    return check_constraints(
        table(spark, "lineitem", sf_dir),
        not_null=["l_orderkey"],
        unique=[["l_orderkey", "l_linenumber"]],
        ranges={"l_quantity": (1.0, 50.0), "l_discount": (0.0, 0.1)},
    )


@register(
    "referential_integrity",
    oracle="""
        SELECT 'lineitem.l_orderkey -> orders.o_orderkey' AS fk,
               CAST(count(*) AS BIGINT) AS orphans
        FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        UNION ALL
        SELECT 'lineitem.l_partkey -> part.p_partkey',
               CAST(count(*) AS BIGINT)
        FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
        UNION ALL
        SELECT 'lineitem.l_suppkey -> supplier.s_suppkey',
               CAST(count(*) AS BIGINT)
        FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
        UNION ALL
        SELECT 'orders.o_custkey -> customer.c_custkey',
               CAST(count(*) AS BIGINT)
        FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        UNION ALL
        SELECT 'customer.c_nationkey -> nation.n_nationkey',
               CAST(count(*) AS BIGINT)
        FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
    """,
)
def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table FK audit: orphan counts for every star-schema edge.

    The pre-publish referential contract of the warehouse — each foreign
    key anti-joins its referenced dimension (broadcast when the dim is
    small; orderkey→orders is the one big-big anti-join and shuffles on
    the key). One count per edge, unioned into a single tiny result.
    """
    li = table(spark, "lineitem", sf_dir)
    o = table(spark, "orders", sf_dir)
    edges = [
        (
            "lineitem.l_orderkey -> orders.o_orderkey",
            li.join(
                o.select("o_orderkey"),
                li.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ),
        ),
        (
            "lineitem.l_partkey -> part.p_partkey",
            li.join(
                F.broadcast(table(spark, "part", sf_dir).select("p_partkey")),
                li.l_partkey == F.col("p_partkey"),
                "left_anti",
            ),
        ),
        (
            "lineitem.l_suppkey -> supplier.s_suppkey",
            li.join(
                F.broadcast(table(spark, "supplier", sf_dir).select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"),
                "left_anti",
            ),
        ),
        (
            "orders.o_custkey -> customer.c_custkey",
            o.join(
                F.broadcast(table(spark, "customer", sf_dir).select("c_custkey")),
                o.o_custkey == F.col("c_custkey"),
                "left_anti",
            ),
        ),
        (
            "customer.c_nationkey -> nation.n_nationkey",
            table(spark, "customer", sf_dir).join(
                F.broadcast(table(spark, "nation", sf_dir).select("n_nationkey")),
                F.col("c_nationkey") == F.col("n_nationkey"),
                "left_anti",
            ),
        ),
    ]
    out = None
    for fk, orphans in edges:
        one = orphans.agg(F.count(F.lit(1)).alias("orphans")).select(
            F.lit(fk).alias("fk"), "orphans"
        )
        out = one if out is None else out.unionByName(one)
    return out


@register(
    "lineitem_drift_check",
    oracle="""
        WITH bounds AS (
            SELECT min(l_shipdate) AS lo, max(l_shipdate) AS hi FROM lineitem
        ),
        halves AS (
            SELECT CASE WHEN l_shipdate < lo + (hi - lo) / 2
                        THEN 'first' ELSE 'second' END AS half,
                   l_quantity, l_discount, l_extendedprice
            FROM lineitem, bounds
        ),
        stats AS (
            SELECT half,
                   CAST(count(*) AS BIGINT) AS n,
                   round(avg(l_quantity) + 1e-9, 4) AS mean_qty,
                   round(avg(l_discount) + 1e-9, 4) AS mean_disc,
                   round(avg(l_extendedprice) + 1e-9, 2) AS mean_price
            FROM halves GROUP BY 1
        )
        SELECT a.n AS n_first, b.n AS n_second,
               round(abs(a.mean_qty - b.mean_qty)
                     / greatest(abs(a.mean_qty), 1e-9) + 1e-9, 4) AS qty_drift,
               round(abs(a.mean_disc - b.mean_disc)
                     / greatest(abs(a.mean_disc), 1e-9) + 1e-9, 4) AS disc_drift,
               round(abs(a.mean_price - b.mean_price)
                     / greatest(abs(a.mean_price), 1e-9) + 1e-9, 4) AS price_drift,
               (abs(a.mean_qty - b.mean_qty)
                    / greatest(abs(a.mean_qty), 1e-9) <= 0.10)
               AND (abs(a.mean_disc - b.mean_disc)
                    / greatest(abs(a.mean_disc), 1e-9) <= 0.10)
               AND (abs(a.mean_price - b.mean_price)
                    / greatest(abs(a.mean_price), 1e-9) <= 0.10) AS within_10pct
        FROM stats a JOIN stats b ON a.half = 'first' AND b.half = 'second'
    """,
)
def lineitem_drift_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample drift check: the fact's time axis splits at its
    midpoint and the halves' key measure means are compared — the
    monitoring contract that catches a silently changed upstream feed
    (unit change, truncation, population shift) before it poisons
    downstream models.

    One scan computes both halves' moments (the CASE half label rides
    the partial aggregation); the 1-row bounds relation broadcasts. The
    drift ratios compare ROUNDED means (both engines round identically
    first), so the boolean cannot flip on summation noise; the 10%
    threshold is the conventional screening default, surfaced as data
    so the driver hash-checks the measured ratios, not just the flag.
    """
    li = table(spark, "lineitem", sf_dir)
    bounds = li.agg(F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi"))
    half = F.when(
        F.col("l_shipdate")
        < F.col("lo") + (F.col("hi") - F.col("lo")) / 2,
        "first",
    ).otherwise("second")
    stats = (
        li.crossJoin(F.broadcast(bounds))
        .groupBy(half.alias("half"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_quantity") + F.lit(1e-9), 4).alias("mean_qty"),
            F.round(F.avg("l_discount") + F.lit(1e-9), 4).alias("mean_disc"),
            F.round(F.avg("l_extendedprice") + F.lit(1e-9), 2).alias("mean_price"),
        )
    )
    a = stats.filter(F.col("half") == "first").select(
        F.col("n").alias("n_first"),
        F.col("mean_qty").alias("__qa"),
        F.col("mean_disc").alias("__da"),
        F.col("mean_price").alias("__pa"),
    )
    b = stats.filter(F.col("half") == "second").select(
        F.col("n").alias("n_second"),
        F.col("mean_qty").alias("__qb"),
        F.col("mean_disc").alias("__db"),
        F.col("mean_price").alias("__pb"),
    )

    def drift(x, y):
        return F.abs(x - y) / F.greatest(F.abs(x), F.lit(1e-9))

    qd, dd, pd_ = drift(F.col("__qa"), F.col("__qb")), drift(
        F.col("__da"), F.col("__db")
    ), drift(F.col("__pa"), F.col("__pb"))
    return a.crossJoin(b).select(
        "n_first",
        "n_second",
        F.round(qd + F.lit(1e-9), 4).alias("qty_drift"),
        F.round(dd + F.lit(1e-9), 4).alias("disc_drift"),
        F.round(pd_ + F.lit(1e-9), 4).alias("price_drift"),
        ((qd <= 0.10) & (dd <= 0.10) & (pd_ <= 0.10)).alias("within_10pct"),
    )


@register(
    "checked_write_audit",
    oracle="""
        WITH marks AS (
            SELECT c_custkey,
                   c_custkey % 97 = 0 AS null_bal,
                   c_custkey % 89 = 0 AS bad_nation,
                   c_custkey % 101 = 0 AS dup
            FROM customer
        )
        SELECT
            TRUE AS abort_raises_and_publishes_nothing,
            (SELECT CAST(count(*) AS BIGINT) FROM marks
              WHERE null_bal) AS v_not_null,
            (SELECT CAST(count(*) AS BIGINT) FROM marks
              WHERE bad_nation) AS v_range,
            (SELECT CAST(count(*) AS BIGINT) FROM marks WHERE dup) AS v_unique,
            (SELECT CAST(count(*) AS BIGINT) FROM marks
              WHERE NOT (null_bal OR bad_nation OR dup)) AS n_published,
            (SELECT CAST(count(*) FILTER (null_bal OR bad_nation OR dup)
                         + count(*) FILTER (dup) AS BIGINT)
               FROM marks) AS n_quarantined,
            TRUE AS conservation_holds
    """,
)
def checked_write_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-guarded publish (operators/quality.py::write_checked)
    attested end to end on a customer batch with INJECTED violations
    (nulled balances at custkey%97, out-of-range nation at %89,
    duplicated keys at %101 — all oracle-predictable):

    - abort policy: the dirty batch raises ``ConstraintViolation`` and
      publishes NOTHING (no version appears);
    - quarantine policy: per-constraint counts match the oracle's
      predicate arithmetic exactly (a row can violate several
      constraints at once — the testdata's custkey 0 hits all three —
      counting once per constraint but quarantining once; both copies
      of a duplicated key quarantine);
    - the published version holds exactly the clean rows and
      published + quarantined == input (row conservation).
    """
    import os
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.operators.quality import (
        ConstraintViolation,
        write_checked,
    )
    from data_warehouse_product_mix_clustering_spark.sources.versioned import read_table, versions

    base = table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    dirty = (
        base.withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") % 97 == 0, F.lit(None)).otherwise(
                F.col("c_acctbal")
            ),
        )
        .withColumn(
            "c_nationkey",
            F.when(F.col("c_custkey") % 89 == 0, F.lit(99)).otherwise(
                F.col("c_nationkey")
            ),
        )
        .unionByName(base.filter(F.col("c_custkey") % 101 == 0))
    )
    n_input = dirty.count()
    root = tempfile.mkdtemp(prefix="spark_graft_checked_write_audit_")
    try:
        tdir = os.path.join(root, "t")
        qdir = os.path.join(root, "q")
        kwargs = dict(
            not_null=["c_acctbal"],
            unique=[["c_custkey"]],
            ranges={"c_nationkey": (0, 24)},
        )
        try:
            write_checked(dirty, tdir, on_violation="abort", **kwargs)
            aborted = False
        except ConstraintViolation:
            aborted = versions(tdir) == []
        v, counts = write_checked(
            dirty, tdir, on_violation="quarantine", quarantine_dir=qdir, **kwargs
        )
        n_published = read_table(spark, tdir, v).count()
        n_quarantined = spark.read.parquet(qdir).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                bool(aborted),
                counts["not_null(c_acctbal)"],
                counts["range(c_nationkey,[0,24])"],
                counts["unique(c_custkey)"],
                n_published,
                n_quarantined,
                n_published + n_quarantined == n_input,
            )
        ],
        "abort_raises_and_publishes_nothing boolean, v_not_null long, "
        "v_range long, v_unique long, n_published long, n_quarantined long, "
        "conservation_holds boolean",
    )


_CHECKSUM_COLS = ["l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag", "l_shipdate"]


def _register_checksum():
    from data_warehouse_product_mix_clustering_spark.operators.quality import (
        sql_table_checksum,
        table_checksum,
    )

    @register(
        "lineitem_replica_checksum",
        oracle=sql_table_checksum("lineitem", _CHECKSUM_COLS),
    )
    def lineitem_replica_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Order-independent, engine-portable table checksum over
        lineitem's key/flag/date columns — the replica-verification /
        migration-sign-off primitive (operators/quality.py::
        table_checksum): the same two numbers (row count + summed
        md5-prefix of the canonicalized row) from ANY engine, ANY
        partitioning, ANY file layout mean the copies agree.

        This driver row is itself the proof: the oracle recomputes the
        checksum in DuckDB from scratch — hash equality here IS the
        cross-engine migration check this operator exists for. The
        canonical form '|'-joins explicit string casts (NULL → '\\N');
        columns whose string forms could embed the separator, or whose
        float formatting differs across engines, should be cast/rounded
        explicitly by the caller (ints/strings/dates used here).
        """
        return table_checksum(
            table(spark, "lineitem", sf_dir).select(*_CHECKSUM_COLS),
            _CHECKSUM_COLS,
        )


_register_checksum()


@register(
    "snapshot_consistency_audit",
    oracle="""
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_fact_rows,
               TRUE AS history_ok,
               TRUE AS rollup_consistent,
               TRUE AS torn_write_invisible,
               TRUE AS rollback_consistent,
               TRUE AS carry_forward_ok,
               CAST(2 AS BIGINT) AS vacuum_drops,
               CAST(4 AS BIGINT) AS vacuum_deletes,
               TRUE AS consistent_after_vacuum
    """,
)
def snapshot_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic MULTI-TABLE publish contract (sources/snapshot.py): a fact
    and its rollup always change together, never torn.

    The scenario drives the store through its whole lifecycle:

    - snapshot 0 publishes a fact slice + matching rollup, snapshot 1
      replaces both (``history_ok`` pins ids [0, 1] and current = 1);
    - ``rollup_consistent``: the CURRENT snapshot's rollup equals a
      recompute over the CURRENT snapshot's fact — the invariant two
      independent per-table publishes cannot guarantee;
    - a TORN write lands new fact data (the table's own version marker
      even advances) with no manifest — snapshot readers must keep
      serving the committed pair (``torn_write_invisible``);
    - ``rollback_consistent``: one O(1) pointer flip returns BOTH tables
      to snapshot 0, still pairwise consistent;
    - snapshot 2 changes only the rollup: the fact's data version CARRIES
      FORWARD by reference in the new manifest (``carry_forward_ok``) —
      an incremental refresh re-references, never rewrites, the
      unchanged 100 TB fact;
    - finally ``vacuum_snapshots(keep_last=1)`` drops snapshots 0-1 and
      exactly the four version directories no kept manifest references —
      INCLUDING the torn write's orphan — while the carried-forward fact
      version survives and the store stays pairwise consistent
      (``vacuum_drops`` / ``vacuum_deletes`` / ``consistent_after_vacuum``).
    """
    import os
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.sources.snapshot import (
        publish_snapshot,
        read_snapshot_table,
        rollback_snapshot,
        snapshot_manifest,
        snapshots,
        vacuum_snapshots,
    )
    from data_warehouse_product_mix_clustering_spark.sources.versioned import write_version

    orders = table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def rollup_of(fact: DataFrame) -> DataFrame:
        return fact.groupBy("o_orderstatus").agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )

    def consistent(store: str) -> bool:
        from data_warehouse_product_mix_clustering_spark.operators.quality import equivalence_probe

        fact = read_snapshot_table(spark, store, "fact")
        roll = read_snapshot_table(spark, store, "rollup")
        _n, match = equivalence_probe(
            rollup_of(fact), roll,
            keys=["o_orderstatus"], exact=["n"], approx={"revenue": 1e-6},
        )
        return match

    root = tempfile.mkdtemp(prefix="spark_graft_snapshot_audit_")
    try:
        store = os.path.join(root, "store")
        fact0 = orders.filter(F.col("o_orderkey") % 3 != 0)
        s0 = publish_snapshot(store, {"fact": fact0, "rollup": rollup_of(fact0)})
        s1 = publish_snapshot(store, {"fact": orders, "rollup": rollup_of(orders)})
        history_ok = (s0, s1) == (0, 1) and snapshots(store) == [0, 1]

        n_fact_rows = read_snapshot_table(spark, store, "fact").count()
        rollup_consistent = consistent(store)

        # torn write: data lands, the TABLE's own marker advances, but no
        # manifest was committed — the snapshot layer must not see it
        write_version(
            orders.limit(7), os.path.join(store, "fact")
        )
        torn_invisible = (
            read_snapshot_table(spark, store, "fact").count() == n_fact_rows
            and consistent(store)
        )

        rollback_snapshot(store, 0)
        rollback_consistent = (
            read_snapshot_table(spark, store, "fact").count() == fact0.count()
            and consistent(store)
        )
        rollback_snapshot(store, 1)  # restore before the carry-forward leg

        before = snapshot_manifest(store)["fact"]
        publish_snapshot(store, {"rollup": rollup_of(orders)})
        carry_forward_ok = (
            snapshot_manifest(store)["fact"] == before and consistent(store)
        )

        vres = vacuum_snapshots(store, keep_last=1)
        consistent_after_vacuum = (
            consistent(store)
            and read_snapshot_table(spark, store, "fact").count() == n_fact_rows
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                n_fact_rows,
                bool(history_ok),
                bool(rollup_consistent),
                bool(torn_invisible),
                bool(rollback_consistent),
                bool(carry_forward_ok),
                vres["snapshots_dropped"],
                vres["versions_deleted"],
                bool(consistent_after_vacuum),
            )
        ],
        "n_fact_rows long, history_ok boolean, rollup_consistent boolean, "
        "torn_write_invisible boolean, rollback_consistent boolean, "
        "carry_forward_ok boolean, vacuum_drops long, vacuum_deletes long, "
        "consistent_after_vacuum boolean",
    )


_ANALYZE_COLS = ["o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"]


def _analyze_oracle_col(c: str, numeric: bool) -> str:
    min_num = f"round(CAST(min({c}) AS DOUBLE) + 1e-9, 4)" if numeric else "CAST(NULL AS DOUBLE)"
    max_num = f"round(CAST(max({c}) AS DOUBLE) + 1e-9, 4)" if numeric else "CAST(NULL AS DOUBLE)"
    min_str = f"CAST(min({c}) AS VARCHAR)" if not numeric else "CAST(NULL AS VARCHAR)"
    max_str = f"CAST(max({c}) AS VARCHAR)" if not numeric else "CAST(NULL AS VARCHAR)"
    return f"""SELECT '{c}' AS column,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS ndv,
               {min_num} AS min_num, {max_num} AS max_num,
               {min_str} AS min_str, {max_str} AS max_str,
               TRUE AS sketch_ok
        FROM orders"""


@register(
    "table_stats_audit",
    oracle=" UNION ALL ".join(
        _analyze_oracle_col(c, c in ("o_custkey", "o_totalprice"))
        for c in _ANALYZE_COLS
    ),
)
def table_stats_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style planner statistics (operators/stats.py::
    analyze_table) attested two ways in one relation: the EXACT column
    profile (rows, nulls, exact NDV, typed min/max over 4 ``orders``
    columns) hash-matches DuckDB, and per column ``sketch_ok`` pins the
    one-pass HLL++ NDV within its 3σ envelope (rsd 5% → |approx−exact| ≤
    0.15·exact) of the exact count — the sketch the 100 TB path actually
    ships, gated against the audit-grade truth. Numeric min/max round to
    4dp (they are raw data values, so this is cosmetic cross-engine
    hygiene, not tolerance)."""
    from data_warehouse_product_mix_clustering_spark.operators.stats import analyze_table

    o = table(spark, "orders", sf_dir)
    exact = analyze_table(o, _ANALYZE_COLS, exact_ndv=True)
    approx = analyze_table(o, _ANALYZE_COLS, exact_ndv=False).select(
        "column", F.col("ndv").alias("ndv_approx")
    )
    return (
        exact.join(approx, "column")
        .select(
            "column",
            "n_rows",
            "n_nulls",
            "ndv",
            F.round(F.col("min_num") + 1e-9, 4).alias("min_num"),
            F.round(F.col("max_num") + 1e-9, 4).alias("max_num"),
            "min_str",
            "max_str",
            (
                F.abs(F.col("ndv_approx") - F.col("ndv"))
                <= 0.15 * F.col("ndv")
            ).alias("sketch_ok"),
        )
    )
