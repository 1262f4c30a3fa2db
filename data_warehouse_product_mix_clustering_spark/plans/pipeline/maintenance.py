"""Operational-pipeline contract audits: versioned-sink refresh,
streaming quarantine ETL, merge/upsert, time travel, JDBC roundtrip,
z-order pruning, python datasource, tombstone refresh, nested
roundtrip, streaming refresh, and table compaction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.plans.registry import register
from data_warehouse_product_mix_clustering_spark.sources.registry import table


# ---------------------------------------------------------------------------
# Operational-pipeline contract audits (round 8): the versioned-sink /
# incremental-refresh composition and the streaming quarantine ETL, each
# exercised end-to-end inside a registered query so the driver's hash gate
# attests the CONTRACT (the `stream_sessions_audit` mold). The scenario
# derives its feed from the sf_dir's own `customer` table, so the oracle can
# independently predict every count; the handful of contract scalars is
# materialized driver-side (the heavy work — ingest, publish, diff, rollup —
# all runs as distributed jobs against a throwaway work_dir).
# ---------------------------------------------------------------------------


def _rollup_probe(maintained, published, group_key: str, sum_col: str, src_col: str):
    """(n_groups, matches) for maintained-rollup ≡ full-recompute — the
    incremental-view-maintenance equivalence check BOTH refresh audits
    attest. Delegates to operators/quality.py::equivalence_probe (ONE
    definition of the full-outer / null-handling conventions across all
    maintenance audits); sums within the 1e-4 double-reassociation
    bound, counts exact."""
    from data_warehouse_product_mix_clustering_spark.operators.quality import equivalence_probe

    recomputed = published.groupBy(group_key).agg(
        F.sum(src_col).cast("double").alias(sum_col),
        F.count(F.lit(1)).alias("n"),
    )
    return equivalence_probe(
        maintained.select(group_key, sum_col, "n"),
        recomputed,
        keys=[group_key],
        exact=["n"],
        approx={sum_col: 1e-4},
    )


def _customer_feed(spark: SparkSession, sf_dir: str):
    c = table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    b1 = c.filter(F.col("c_custkey") % 3 != 0)
    b2 = c.filter(F.col("c_custkey") % 3 == 0).unionByName(
        c.filter((F.col("c_custkey") % 3 != 0) & (F.col("c_custkey") % 5 == 0))
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 100, 2))
    )
    return b1, b2


@register(
    "refresh_rollup_audit",
    oracle="""
        SELECT CAST(0 AS BIGINT) AS v0, CAST(1 AS BIGINT) AS v1,
               TRUE AS first_build_full,
               (SELECT CAST(count(*) AS BIGINT) FROM customer
                 WHERE c_custkey % 3 = 0 OR c_custkey % 5 = 0) AS n_changes,
               CAST(2 AS BIGINT) AS n_quarantined,
               (SELECT CAST(count(DISTINCT c_nationkey) AS BIGINT)
                  FROM customer) AS n_groups,
               TRUE AS rollup_matches_recompute
    """,
)
def refresh_rollup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end contract audit of the composed warehouse refresh
    (etl/refresh_pipeline.py): dirty CSV landing → quarantine →
    latest-wins upsert → atomic versioned publish → CDC diff →
    incrementally maintained rollup.

    Scenario (all derived from `customer`, so the oracle predicts every
    number from the raw table): batch 1 lands customers with
    custkey%3≠0 plus two malformed lines; batch 2 lands the %3=0 rows as
    inserts and re-lands the %5=0 survivors with acctbal+100 as upserts.
    Attested contract:

    - v0 then v1 publish (atomic versioning advanced exactly once per run);
    - the first build is a full rollup (`changes == -1`);
    - the second run's CDC change count is EXACTLY the predicted
      |inserts ∪ upserts| — a diff that rescanned, dropped, or double-
      counted rows flips `n_changes`;
    - both malformed lines sit in the quarantine (nothing silently lost);
    - the |changes|-cost maintained rollup is value-identical (≤1e-4
      absolute, the double reassociation bound) to a full recompute of
      the published v1 — the incremental-view-maintenance guarantee.
    """
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.etl.refresh_pipeline import refresh_warehouse
    from data_warehouse_product_mix_clustering_spark.sources.versioned import read_table
    from data_warehouse_product_mix_clustering_spark.streaming.quarantine import read_sink
    from pyspark.sql import types as T

    root = tempfile.mkdtemp(prefix="spark_graft_refresh_audit_")
    try:
        land = os.path.join(root, "landing")
        work = os.path.join(root, "work")
        schema = T.StructType(
            [
                T.StructField("c_custkey", T.LongType()),
                T.StructField("c_nationkey", T.LongType()),
                T.StructField("c_acctbal", T.DoubleType()),
            ]
        )
        args = dict(
            spark=spark, landing_dir=land, work_dir=work, schema=schema,
            key=["c_custkey"], group_keys=["c_nationkey"],
            measures={"bal_sum": "c_acctbal"}, header=False,
        )
        b1, b2 = _customer_feed(spark, sf_dir)
        b1.write.mode("append").csv(land)
        with open(os.path.join(land, "malformed.csv"), "w") as f:
            f.write("oops,not_a_number\nalso;bad;arity;line")
        r1 = refresh_warehouse(**args)
        b2.write.mode("append").csv(land)
        r2 = refresh_warehouse(**args)

        n_groups, rollup_ok = _rollup_probe(
            read_table(spark, os.path.join(work, "agg")),
            read_table(spark, os.path.join(work, "table")),
            "c_nationkey", "bal_sum", "c_acctbal",
        )
        from data_warehouse_product_mix_clustering_spark.streaming.quarantine import QUARANTINE_SCHEMA

        n_quar = read_sink(
            spark, os.path.join(work, "quarantine"), QUARANTINE_SCHEMA
        ).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                r1["version"],
                r2["version"],
                r1["changes"] == -1 and r1["agg_version"] == 0,
                r2["changes"],
                n_quar,
                n_groups,
                rollup_ok,
            )
        ],
        "v0 long, v1 long, first_build_full boolean, n_changes long, "
        "n_quarantined long, n_groups long, rollup_matches_recompute boolean",
    )


@register(
    "stream_quarantine_audit",
    oracle="""
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_clean,
               CAST(3 AS BIGINT) AS n_quarantined,
               TRUE AS conservation_holds,
               CAST(0 AS BIGINT) AS rerun_batches,
               TRUE AS rerun_is_noop,
               TRUE AS retry_idempotent
    """,
)
def stream_quarantine_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Determinism / exactly-once contract audit for the streaming
    quarantine ETL (streaming/quarantine.py) over an availableNow replay
    of a dirty feed derived from `customer` (+3 malformed lines):

    - conservation: clean + quarantined == every input line, exactly once
      (the oracle predicts n_clean from the raw table and pins the
      malformed count);
    - checkpoint idempotence: a second availableNow run with nothing new
      executes ZERO batches and leaves both sinks byte-count identical;
    - at-least-once retry idempotence: re-executing a batch write with the
      SAME (batch_df, batch_id) — foreachBatch's failure-retry shape —
      leaves the sinks exactly as one execution does, because each batch
      overwrites only its own ``__batch_id`` partition.
    """
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.streaming.quarantine import (
        QUARANTINE_SCHEMA,
        read_sink,
        streaming_csv_quarantine_etl,
        write_quarantine_batch,
    )
    from pyspark.sql import types as T

    root = tempfile.mkdtemp(prefix="spark_graft_quarantine_audit_")
    try:
        land = os.path.join(root, "landing")
        clean_dir = os.path.join(root, "clean")
        quar_dir = os.path.join(root, "quarantine")
        ckpt = os.path.join(root, "_ckpt")
        schema = T.StructType(
            [
                T.StructField("c_custkey", T.LongType()),
                T.StructField("c_nationkey", T.LongType()),
                T.StructField("c_acctbal", T.DoubleType()),
            ]
        )
        feed = table(spark, "customer", sf_dir).select(
            "c_custkey", "c_nationkey", "c_acctbal"
        )
        feed.write.mode("append").csv(land)
        with open(os.path.join(land, "malformed.csv"), "w") as f:
            f.write("not,a,number\nwrong,arity\n\n")  # 2 bad lines + 1 blank
        etl = dict(
            spark=spark, in_dir=land, schema=schema, clean_dir=clean_dir,
            quarantine_dir=quar_dir, checkpoint_dir=ckpt, header=False,
        )
        streaming_csv_quarantine_etl(**etl)
        n_input = spark.read.text(land).count()
        n_clean = read_sink(spark, clean_dir, schema).count()
        n_quar = read_sink(spark, quar_dir, QUARANTINE_SCHEMA).count()

        rerun_batches = streaming_csv_quarantine_etl(**etl)
        rerun_is_noop = (
            read_sink(spark, clean_dir, schema).count() == n_clean
            and read_sink(spark, quar_dir, QUARANTINE_SCHEMA).count() == n_quar
        )

        # at-least-once retry: same (df, id) twice into fresh sinks
        c2, q2 = os.path.join(root, "clean2"), os.path.join(root, "quar2")
        raw = spark.read.text(land)
        for _ in range(2):
            write_quarantine_batch(raw, 7, schema, c2, q2, header=False)
        retry_idempotent = (
            read_sink(spark, c2, schema).count() == n_clean
            and read_sink(spark, q2, QUARANTINE_SCHEMA).count() == n_quar
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                n_clean,
                n_quar,
                n_clean + n_quar == n_input,
                rerun_batches,
                rerun_is_noop,
                retry_idempotent,
            )
        ],
        "n_clean long, n_quarantined long, conservation_holds boolean, "
        "rerun_batches long, rerun_is_noop boolean, retry_idempotent boolean",
    )


@register(
    "merge_upsert_audit",
    oracle="""
        WITH t AS (
            SELECT c_custkey, c_nationkey, c_acctbal
            FROM customer WHERE c_custkey % 2 = 0
        ),
        res AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 50
                        ELSE c_acctbal END AS bal
            FROM t
            WHERE NOT (c_custkey % 3 = 0 AND c_custkey % 5 = 0)
            UNION ALL
            SELECT c_custkey, c_acctbal + 50 AS bal
            FROM customer WHERE c_custkey % 2 <> 0 AND c_custkey % 3 = 0
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(bal) + 1e-9, 2) AS total_bal,
               CAST(sum(CASE WHEN c_custkey % 2 <> 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_inserted,
               CAST(sum(CASE WHEN c_custkey % 6 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_updated
        FROM res
    """,
)
def merge_upsert_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-clause ANSI MERGE attested through the driver hash gate.

    ``operators/merge.py::merge_into`` runs WHEN MATCHED DELETE (source
    key %5=0) / WHEN MATCHED UPDATE (acctbal+50) / WHEN NOT MATCHED
    INSERT against a customer-derived target (even keys) and source
    (keys %3=0, amended balance) — so the oracle reconstructs the merged
    relation declaratively and every clause's effect lands in a checked
    aggregate: row count (delete + insert arithmetic), total balance
    (update arithmetic), inserted-odd and surviving-updated counts. One
    full-outer join, no driver loops; the duplicate-source-key ANSI
    precondition is asserted in-plan (unit-pinned in test_etl.py).
    """
    from data_warehouse_product_mix_clustering_spark.operators.merge import merge_into

    c = table(spark, "customer", sf_dir)
    t = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    s = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_acctbal") + 50).alias("c_acctbal"),
    )
    merged = merge_into(
        t, s, ["c_custkey"], delete_condition=F.col("s.c_custkey") % 5 == 0
    )
    return merged.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum("c_acctbal") + F.lit(1e-9), 2).alias("total_bal"),
        F.sum((F.col("c_custkey") % 2 != 0).cast("long")).alias("n_inserted"),
        F.sum((F.col("c_custkey") % 6 == 0).cast("long")).alias("n_updated"),
    )


@register(
    "time_travel_audit",
    oracle="""
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM customer
              WHERE c_custkey % 3 = 0) AS n_v0,
            (SELECT CAST(count(*) AS BIGINT) FROM customer
              WHERE c_custkey % 3 IN (0, 1)) AS n_v1,
            (SELECT CAST(count(*) AS BIGINT) FROM customer
              WHERE c_custkey % 3 = 1) AS n_v2,
            TRUE AS rollback_serves_v1,
            TRUE AS history_survives_rollback,
            TRUE AS vacuum_respects_marker
    """,
)
def time_travel_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-sink lifecycle contract (sources/versioned.py) as a
    driver hash row: three customer-derived versions published, then

    - every historical version stays readable with its own row count
      (time travel — counts predicted by the oracle from the raw table);
    - ``rollback`` is an O(1) marker flip: the default read serves the
      rolled-back-to version while NEWER versions stay committed and
      readable (rollback is reversible, not destructive);
    - ``vacuum(keep_last=1)`` keeps the newest version AND the marker's
      current target even when they differ — only v0 is reclaimed, and
      the rolled-back table keeps serving v1 after the vacuum.
    """
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.sources.versioned import (
        read_table,
        rollback,
        vacuum,
        write_version,
        versions,
    )

    c = table(spark, "customer", sf_dir).select("c_custkey", "c_acctbal")
    root = tempfile.mkdtemp(prefix="spark_graft_timetravel_audit_")
    try:
        tdir = os.path.join(root, "t")
        write_version(c.filter(F.col("c_custkey") % 3 == 0), tdir)
        write_version(c.filter((F.col("c_custkey") % 3).isin(0, 1)), tdir)
        write_version(c.filter(F.col("c_custkey") % 3 == 1), tdir)
        n_v0 = read_table(spark, tdir, 0).count()
        n_v1 = read_table(spark, tdir, 1).count()
        n_v2 = read_table(spark, tdir, 2).count()
        rollback(tdir, 1)
        rollback_serves_v1 = read_table(spark, tdir).count() == n_v1
        history_survives = (
            versions(tdir) == [0, 1, 2]
            and read_table(spark, tdir, 2).count() == n_v2
        )
        doomed = vacuum(tdir, keep_last=1)
        vacuum_ok = (
            read_table(spark, tdir).count() == n_v1
            and doomed == [0]
            and versions(tdir) == [1, 2]
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(n_v0, n_v1, n_v2, rollback_serves_v1, history_survives, vacuum_ok)],
        "n_v0 long, n_v1 long, n_v2 long, rollback_serves_v1 boolean, "
        "history_survives_rollback boolean, vacuum_respects_marker boolean",
    )


@register(
    "jdbc_roundtrip_audit",
    oracle="""
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM customer
              WHERE c_custkey % 4 = 0) AS n_rows,
            (SELECT CAST(count(*) AS BIGINT) FROM customer
              WHERE c_custkey % 4 = 0 AND c_custkey > 500) AS n_pushdown,
            (SELECT round(sum(c_acctbal) + 1e-9, 2) FROM customer
              WHERE c_custkey % 4 = 0) AS total_bal,
            TRUE AS partitioned_scan_ok
    """,
)
def jdbc_roundtrip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 (JDBC source) proven through the driver hash gate against a
    REAL embedded RDBMS (Derby, on Spark's own classpath): a
    customer-derived relation is written over JDBC, then read back via

    - a pushed-down SQL query (the filter executes inside Derby — the
      count is the oracle's predicate count);
    - a 4-slice partitioned parallel scan (partitionColumn/bounds), whose
      partition count and total-balance aggregate must both survive the
      round trip exactly.

    The balance sum is computed Spark-side from the JDBC scan and rounded
    identically to the oracle, so a type-mangling driver (DECIMAL
    downcast, row loss on slicing) flips the row.
    """
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.sources.io import read_jdbc

    c = table(spark, "customer", sf_dir).select("c_custkey", "c_acctbal")
    src = c.filter(F.col("c_custkey") % 4 == 0)
    hi = src.agg(F.max("c_custkey")).first()[0] or 0
    root = tempfile.mkdtemp(prefix="spark_graft_jdbc_audit_")
    try:
        url = f"jdbc:derby:{root}/db;create=true"
        props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
        (
            src.write.format("jdbc")
            .option("url", url)
            .option("dbtable", "cust")
            .option("driver", props["driver"])
            .mode("overwrite")
            .save()
        )
        n_pushdown = read_jdbc(
            spark,
            url,
            'SELECT "c_custkey" FROM cust WHERE "c_custkey" > 500',
            properties=props,
        ).count()
        part = read_jdbc(
            spark,
            url,
            'SELECT "c_custkey", "c_acctbal" FROM cust',
            properties=props,
            partition_column='"c_custkey"',
            num_partitions=4,
            lower_bound=0,
            upper_bound=int(hi) + 1,
        )
        agg = part.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("c_acctbal") + F.lit(1e-9), 2).alias("bal"),
        ).first()
        partitioned_ok = part.rdd.getNumPartitions() == 4
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(agg["n"], n_pushdown, float(agg["bal"]), partitioned_ok)],
        "n_rows long, n_pushdown long, total_bal double, partitioned_scan_ok boolean",
    )


@register(
    "zorder_pruning_audit",
    oracle="""
        WITH b AS (
            SELECT 0.45 * max(l_partkey) AS pk_lo, 0.55 * max(l_partkey) AS pk_hi,
                   0.45 * max(l_suppkey) AS sk_lo, 0.55 * max(l_suppkey) AS sk_hi
            FROM lineitem
        )
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_total,
            (SELECT CAST(count(*) AS BIGINT) FROM lineitem, b
              WHERE l_partkey BETWEEN pk_lo AND pk_hi
                AND l_suppkey BETWEEN sk_lo AND sk_hi) AS n_box,
            TRUE AS zorder_prunes_first_dim,
            TRUE AS zorder_prunes_second_dim,
            TRUE AS linear_blind_on_second_dim,
            TRUE AS box_never_widens,
            TRUE AS hilbert_no_worse,
            TRUE AS hilbert_rows_conserved
    """,
)
def zorder_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout (operators/layout.py) attested through the driver
    hash gate: lineitem re-clustered along the Morton curve into 16 files
    vs a 1-D range-sorted twin, pruning measured on parquet FOOTER
    min/max stats (what a stats-trusting reader actually skips on).

    Contract (center-decile boxes derived from exact column maxima, so
    the oracle states them identically):

    - the z-layout prunes files on BOTH dimensions; the linear layout is
      provably blind on its unsorted dimension (reads all 16);
    - the 2-D box never reads more files than either 1-D box (curve cell
      intersection only narrows);
    - rows are conserved under re-layout and the boxed COUNT from the
      z-ordered files equals the oracle's predicate count — pruning never
      drops a qualifying row;
    - a HILBERT-curve layout of the same data (adjacent-step curve —
      operators/layout.py::_hilbert_d2) reads NO MORE files for the 2-D
      box than Morton and conserves rows too (measured strictly fewer:
      4-vs-7 at sf0.01/0.1, 3-vs-4 at sf0.001).
    """
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.operators.layout import (
        files_overlapping_box,
        write_zordered,
    )

    li = table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    mx = li.agg(F.max("l_partkey"), F.max("l_suppkey")).first()
    pk_lo, pk_hi = 0.45 * mx[0], 0.55 * mx[0]
    sk_lo, sk_hi = 0.45 * mx[1], 0.55 * mx[1]
    n_files = 16
    root = tempfile.mkdtemp(prefix="spark_graft_zorder_audit_")
    try:
        lin, zpath = os.path.join(root, "linear"), os.path.join(root, "z")
        (
            li.repartitionByRange(n_files, "l_partkey")
            .sortWithinPartitions("l_partkey")
            .write.mode("overwrite")
            .parquet(lin)
        )
        write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files, bits=8)
        hpath = os.path.join(root, "h")
        write_zordered(
            li, hpath, ["l_partkey", "l_suppkey"], n_files, bits=8,
            curve="hilbert",
        )
        back = spark.read.parquet(zpath)
        n_total = back.count()
        n_box = back.filter(
            F.col("l_partkey").between(pk_lo, pk_hi)
            & F.col("l_suppkey").between(sk_lo, sk_hi)
        ).count()
        z_pk, zt = files_overlapping_box(zpath, {"l_partkey": (pk_lo, pk_hi)})
        z_sk, _ = files_overlapping_box(zpath, {"l_suppkey": (sk_lo, sk_hi)})
        z_2d, _ = files_overlapping_box(
            zpath, {"l_partkey": (pk_lo, pk_hi), "l_suppkey": (sk_lo, sk_hi)}
        )
        lin_sk, lt = files_overlapping_box(lin, {"l_suppkey": (sk_lo, sk_hi)})
        h_2d, _ht = files_overlapping_box(
            hpath, {"l_partkey": (pk_lo, pk_hi), "l_suppkey": (sk_lo, sk_hi)}
        )
        h_rows = spark.read.parquet(hpath).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                n_total,
                n_box,
                bool(z_pk < zt),
                bool(z_sk < zt),
                # blindness = the linear layout reads ALL its files on
                # its unsorted dimension; not pinned to exactly n_files
                # because repartitionByRange's sampled boundaries can
                # leave a partition empty (the review-r11 flake class —
                # the linear twin deliberately KEEPS the sampled range
                # writer, it is the thing being contrasted)
                bool(lin_sk == lt and lt >= n_files // 2),
                bool(z_2d <= min(z_pk, z_sk)),
                bool(h_2d <= z_2d),
                bool(h_rows == n_total),
            )
        ],
        "n_total long, n_box long, zorder_prunes_first_dim boolean, "
        "zorder_prunes_second_dim boolean, linear_blind_on_second_dim boolean, "
        "box_never_widens boolean, hilbert_no_worse boolean, "
        "hilbert_rows_conserved boolean",
    )


@register(
    "python_datasource_scan",
    oracle="""
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY lang
    """,
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table read through a FROM-SCRATCH connector built on
    Spark 4's Python DataSource API (sources/pyds.py) — named format,
    driver-side partition planning (one InputPartition per parquet row
    group), executor-side pyarrow reads returning Arrow RecordBatches
    (vectorized transfer, no per-row Python) — then aggregated per
    language. (The API hands the reader the full declared schema —
    projection pushdown does not exist for Python sources yet; the
    module docstring records that verified limit.)

    The oracle reads the SAME table natively, so the hash row attests the
    connector machinery end to end: a partition-planning bug (lost or
    doubled row group) or a batch-transfer type mangle flips the row. This is the engine's extension path for sources
    Spark lacks; parquet is used here precisely because an exact native
    twin exists to verify against.
    """
    from data_warehouse_product_mix_clustering_spark.sources.pyds import register_arrow_parquet

    register_arrow_parquet(spark)
    docs = (
        spark.read.format("arrowparquet")
        .option("path", os.path.join(sf_dir, "documents.parquet"))
        .load()
    )
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "refresh_tombstone_audit",
    oracle="""
        WITH marks AS (
            SELECT c_custkey, c_nationkey, c_acctbal,
                   c_custkey % 2 = 0 AS in_base,
                   c_custkey % 2 = 0 AND c_custkey % 6 = 0 AS deleted,
                   c_custkey % 2 = 0 AND c_custkey % 10 = 0
                       AND c_custkey % 6 <> 0 AS updated,
                   c_custkey % 2 <> 0 AND c_custkey % 9 = 0 AS inserted
            FROM customer
        )
        SELECT CAST(0 AS BIGINT) AS v0, CAST(1 AS BIGINT) AS v1,
               (SELECT CAST(count(*) FILTER (deleted)
                            + count(*) FILTER (updated)
                            + count(*) FILTER (inserted) AS BIGINT)
                  FROM marks) AS n_changes,
               (SELECT CAST(count(*) FILTER (in_base AND NOT deleted)
                            + count(*) FILTER (inserted) AS BIGINT)
                  FROM marks) AS n_final,
               CAST(0 AS BIGINT) AS n_deleted_present,
               TRUE AS rollup_matches_recompute
    """,
)
def refresh_tombstone_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE support in the composed refresh, end to end: batch 2 lands
    tombstones (%6=0 of the even-key base), updates (%10=0, acctbal+25)
    and odd inserts (%9=0) — all predicate-disjoint so the oracle
    predicts every count from the raw customer table.

    Attested contract:

    - the CDC change count is EXACTLY |deletes| + |updates| + |inserts|
      (a tombstone surfaces as a plain ``removed`` in the diff);
    - the published v1 holds exactly base − deletes + inserts rows and
      NO tombstoned key survives;
    - the |changes|-cost maintained rollup — including groups SHRINKING
      through the diff's removed path, which the upsert-only audit never
      exercises — equals a full recompute of v1 (≤1e-4).
    """
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.etl.refresh_pipeline import refresh_warehouse
    from data_warehouse_product_mix_clustering_spark.sources.versioned import read_table

    from pyspark.sql import types as T

    c = table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    b1 = c.filter(F.col("c_custkey") % 2 == 0).withColumn(
        "deleted", F.lit(False)
    )
    even = F.col("c_custkey") % 2 == 0
    b2 = (
        c.filter(even & (F.col("c_custkey") % 6 == 0))
        .select(
            "c_custkey",
            F.lit(None).cast("long").alias("c_nationkey"),
            F.lit(None).cast("double").alias("c_acctbal"),
            F.lit(True).alias("deleted"),
        )
        .unionByName(
            c.filter(
                even
                & (F.col("c_custkey") % 10 == 0)
                & (F.col("c_custkey") % 6 != 0)
            ).select(
                "c_custkey",
                "c_nationkey",
                F.round(F.col("c_acctbal") + 25, 2).alias("c_acctbal"),
                F.lit(False).alias("deleted"),
            )
        )
        .unionByName(
            c.filter(~even & (F.col("c_custkey") % 9 == 0)).withColumn(
                "deleted", F.lit(False)
            )
        )
    )
    root = tempfile.mkdtemp(prefix="spark_graft_tombstone_audit_")
    try:
        land = os.path.join(root, "landing")
        work = os.path.join(root, "work")
        schema = T.StructType(
            [
                T.StructField("c_custkey", T.LongType()),
                T.StructField("c_nationkey", T.LongType()),
                T.StructField("c_acctbal", T.DoubleType()),
                T.StructField("deleted", T.BooleanType()),
            ]
        )
        args = dict(
            spark=spark, landing_dir=land, work_dir=work, schema=schema,
            key=["c_custkey"], group_keys=["c_nationkey"],
            measures={"bal_sum": "c_acctbal"}, header=False,
            tombstone_col="deleted",
        )
        b1.write.mode("append").csv(land)
        r1 = refresh_warehouse(**args)
        b2.write.mode("append").csv(land)
        r2 = refresh_warehouse(**args)

        final = read_table(spark, os.path.join(work, "table"))
        n_final = final.count()
        n_deleted_present = final.filter(
            (F.col("c_custkey") % 2 == 0) & (F.col("c_custkey") % 6 == 0)
        ).count()
        _, rollup_ok = _rollup_probe(
            read_table(spark, os.path.join(work, "agg")),
            final,
            "c_nationkey", "bal_sum", "c_acctbal",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                r1["version"],
                r2["version"],
                r2["changes"],
                n_final,
                n_deleted_present,
                rollup_ok,
            )
        ],
        "v0 long, v1 long, n_changes long, n_final long, "
        "n_deleted_present long, rollup_matches_recompute boolean",
    )


@register(
    "lineitem_nested_roundtrip_audit",
    oracle="""
        SELECT (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem)
                   AS n_orders,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_lines,
               TRUE AS rows_conserved,
               TRUE AS checksums_match
    """,
)
def lineitem_nested_roundtrip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document assembly: the relational→nested transform a training-data
    pipeline runs to ship one RECORD per logical unit (order with its
    line array; conversation with its turn array), pinned lossless.

    The fact nests to one row per order carrying a canonically-sorted
    ``array<struct>`` of its lines, materializes through parquet (nested
    fidelity is part of the claim), re-flattens, and must checksum
    identically to the source projection under the engine's
    order-independent table checksum — so the driver row proves
    assemble→persist→explode loses and reorders nothing. One shuffle to
    nest (groupBy order), zero to flatten.
    """
    import os
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.operators.quality import table_checksum

    cols = ["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"]
    flat = table(spark, "lineitem", sf_dir).select(*cols)
    nested = flat.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_partkey", "l_quantity"))
        ).alias("lines")
    )
    root = tempfile.mkdtemp(prefix="spark_graft_nested_")
    try:
        p = os.path.join(root, "nested")
        nested.write.parquet(p)
        persisted = spark.read.parquet(p)
        back = persisted.select(
            "l_orderkey", F.explode("lines").alias("l")
        ).select("l_orderkey", "l.l_linenumber", "l.l_partkey", "l.l_quantity")

        src = table_checksum(flat, cols).first()
        rt = table_checksum(back, cols).first()
        n_orders = persisted.count()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                n_orders,
                src["n_rows"],
                bool(src["n_rows"] == rt["n_rows"]),
                bool(src["checksum"] == rt["checksum"]),
            )
        ],
        "n_orders long, n_lines long, rows_conserved boolean, checksums_match boolean",
    )


@register(
    "stream_refresh_audit",
    oracle="""
        SELECT CAST(0 AS BIGINT) AS v0, CAST(1 AS BIGINT) AS v1,
               CAST(2 AS BIGINT) AS v2,
               (SELECT CAST(count(*) AS BIGINT) FROM customer
                 WHERE c_custkey % 3 = 0 OR c_custkey % 5 = 0) AS n_changes,
               CAST(0 AS BIGINT) AS replay_changes,
               TRUE AS replay_table_identical,
               TRUE AS rollup_matches_recompute,
               TRUE AS mv_matches_recompute,
               TRUE AS navigator_serves_maintained
    """,
)
def stream_refresh_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full streaming→warehouse composition in one loop (VERDICT r9
    Next #5): checkpointed quarantine stream → idempotent versioned
    publish → CDC diff → |changes|-cost maintained rollup AND maintained
    MV summary store, then an at-least-once REPLAY of the last micro-
    batch driven through the same path. Same customer-derived feed as
    ``refresh_rollup_audit`` so the oracle predicts every count.

    Attested contract:

    - versions advance 0 → 1 → 2 (one publish per refresh run; the
      replay run publishes an IDENTICAL version, not a corrupted one);
    - run 2's CDC change count is exactly |inserts ∪ upserts|;
    - the replayed batch (same rows, same ``__batch_id``, re-executed via
      ``write_quarantine_batch`` — foreachBatch's failure-retry shape)
      yields ``changes == 0`` and a v2 row-identical to v1: replay ≡
      batch for the published table;
    - the rollup after replay equals a full recompute of the published
      state (incremental maintenance survived the replay);
    - the MV summary store — materialized at v0, maintained from the SAME
      ``version_diff`` extracts the refreshes consume (0→1, then the
      empty 1→2) — equals a recompute from the final published state,
      and ``answer_from_summaries``' navigator serves the maintained
      store (metadata-only choice) with values matching a direct
      aggregate of the table.
    """
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.etl.refresh_pipeline import refresh_warehouse
    from data_warehouse_product_mix_clustering_spark.operators.quality import equivalence_probe
    from data_warehouse_product_mix_clustering_spark.plans.mv import (
        answer_from_summaries,
        maintain_summary,
        materialize_summary,
    )
    from data_warehouse_product_mix_clustering_spark.sources.versioned import read_table, version_diff
    from data_warehouse_product_mix_clustering_spark.streaming.quarantine import write_quarantine_batch
    from pyspark.sql import types as T

    measures = {"bal_sum": "c_acctbal"}
    root = tempfile.mkdtemp(prefix="spark_graft_stream_refresh_")
    try:
        land = os.path.join(root, "landing")
        work = os.path.join(root, "work")
        store = os.path.join(root, "mv")
        table_dir = os.path.join(work, "table")
        schema = T.StructType(
            [
                T.StructField("c_custkey", T.LongType()),
                T.StructField("c_nationkey", T.LongType()),
                T.StructField("c_acctbal", T.DoubleType()),
            ]
        )
        args = dict(
            spark=spark, landing_dir=land, work_dir=work, schema=schema,
            key=["c_custkey"], group_keys=["c_nationkey"],
            measures=measures, header=False,
        )
        b1, b2 = _customer_feed(spark, sf_dir)
        b1.write.mode("append").csv(land)
        r1 = refresh_warehouse(**args)
        materialize_summary(
            read_table(spark, table_dir), store, "by_nation",
            ["c_nationkey"], measures,
        )

        # land batch 2 as identifiable files so the replay below can
        # re-execute EXACTLY the micro-batch the stream ingested
        stag = os.path.join(root, "stag")
        b2.write.mode("overwrite").csv(stag)
        b2_files = []
        for i, f in enumerate(sorted(os.listdir(stag))):
            if f.startswith("part-"):
                dst = os.path.join(land, f"b2-{i}.csv")
                shutil.copy(os.path.join(stag, f), dst)
                b2_files.append(dst)
        r2 = refresh_warehouse(**args)
        maintain_summary(
            spark, store, "by_nation",
            version_diff(spark, table_dir, 0, 1, key=["c_custkey"]),
            measures,
        )

        # at-least-once replay: re-execute the last micro-batch with the
        # SAME batch id (read back from the sink partition layout — no
        # assumption about how availableNow numbered it), then refresh
        clean_dir = os.path.join(work, "clean")
        last_bid = max(
            int(d.split("=", 1)[1])
            for d in os.listdir(clean_dir)
            if d.startswith("__batch_id=")
        )
        write_quarantine_batch(
            spark.read.text(b2_files), last_bid, schema,
            clean_dir, os.path.join(work, "quarantine"), header=False,
        )
        r3 = refresh_warehouse(**args)
        maintain_summary(
            spark, store, "by_nation",
            version_diff(spark, table_dir, 1, 2, key=["c_custkey"]),
            measures,
        )

        final = read_table(spark, table_dir)
        prev = read_table(spark, table_dir, 1)
        replay_identical = (
            final.exceptAll(prev).isEmpty() and prev.exceptAll(final).isEmpty()
        )
        _, rollup_ok = _rollup_probe(
            read_table(spark, os.path.join(work, "agg")), final,
            "c_nationkey", "bal_sum", "c_acctbal",
        )
        recompute = final.groupBy("c_nationkey").agg(
            F.sum("c_acctbal").cast("double").alias("bal_sum"),
            F.count("c_acctbal").cast("long").alias("__nn_bal_sum"),
            F.count(F.lit(1)).cast("long").alias("__n"),
        )
        _, mv_ok = equivalence_probe(
            spark.read.parquet(os.path.join(store, "by_nation")).select(
                "c_nationkey", "bal_sum", "__nn_bal_sum", "__n"
            ),
            recompute,
            keys=["c_nationkey"],
            exact=["__nn_bal_sum", "__n"],
            approx={"bal_sum": 1e-4},
        )
        answered, choice = answer_from_summaries(
            spark, store, ["c_nationkey"], ["bal_sum"]
        )
        _, nav_ok = equivalence_probe(
            answered.select("c_nationkey", "bal_sum"),
            final.groupBy("c_nationkey").agg(
                F.sum("c_acctbal").cast("double").alias("bal_sum")
            ),
            keys=["c_nationkey"],
            approx={"bal_sum": 1e-4},
        )
        nav_ok = nav_ok and choice == "by_nation"
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                r1["version"], r2["version"], r3["version"], r2["changes"],
                r3["changes"], bool(replay_identical), bool(rollup_ok),
                bool(mv_ok), bool(nav_ok),
            )
        ],
        "v0 long, v1 long, v2 long, n_changes long, replay_changes long, "
        "replay_table_identical boolean, rollup_matches_recompute boolean, "
        "mv_matches_recompute boolean, navigator_serves_maintained boolean",
    )


@register(
    "table_compaction_audit",
    oracle="""
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders
                 WHERE o_orderkey % 7 = 0) AS n_rows,
               CAST(24 AS BIGINT) AS files_before,
               CAST(1 AS BIGINT) AS files_after,
               TRUE AS content_identical,
               CAST(0 AS BIGINT) AS cdc_changes,
               TRUE AS time_travel_intact,
               TRUE AS marker_advanced
    """,
)
def table_compaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction on the versioned sink
    (sources/versioned.py::compact_table) — the operational rewrite a
    per-micro-run publisher needs at 100 TB, attested end to end:

    - a 24-file version compacts to 1 file (tiny data, 128 MB target);
    - the compacted version is row-identical to its source (exceptAll
      both ways — compaction may never lose, duplicate, or mutate);
    - ``version_diff`` across the compaction is EMPTY, so every
      incremental consumer (rollup maintenance, index maintenance, MV
      store) sees zero changes from a pure layout rewrite;
    - the pre-compaction version stays time-travelable (vacuum, not
      compaction, retires history) and the marker advanced atomically.
    """
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.sources.versioned import (
        compact_table,
        read_table,
        version_diff,
        versions,
        write_version,
    )

    src = (
        table(spark, "orders", sf_dir)
        .filter(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )
    root = tempfile.mkdtemp(prefix="spark_graft_compact_audit_")
    try:
        tdir = os.path.join(root, "t")
        write_version(src.repartition(24), tdir)
        stats = compact_table(spark, tdir)
        after = read_table(spark, tdir)
        before = read_table(spark, tdir, 0)
        identical = (
            after.exceptAll(before).isEmpty() and before.exceptAll(after).isEmpty()
        )
        n_rows = after.count()
        cdc = version_diff(
            spark, tdir, 0, stats["version"], key=["o_orderkey"]
        ).count()
        time_travel = before.count() == n_rows and versions(tdir) == [0, 1]
        marker_ok = stats["version"] == 1
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                n_rows,
                stats["files_before"],
                stats["files_after"],
                bool(identical),
                cdc,
                bool(time_travel),
                bool(marker_ok),
            )
        ],
        "n_rows long, files_before long, files_after long, "
        "content_identical boolean, cdc_changes long, "
        "time_travel_intact boolean, marker_advanced boolean",
    )


