"""Materialized-summary store + aggregate navigator (MV rewrite).

The warehouse optimizer feature Catalyst does not ship: answer an
aggregate query from a pre-materialized SUMMARY instead of the fact
table whenever the summary's grain is fine enough. Classic dimensional
result (summary navigation / aggregate rewrite): a SUM/COUNT aggregate
at grain G can be re-aggregated from any materialized rollup at grain
G' ⊇ G — sums of sums, counts as sums of counts — never touching the
fact. At 100 TB this is THE dashboard economics: the daily rollup is
~1e4-1e6 rows where the fact is 1e11, so every coarser slice (monthly,
by-flag, grand total) costs a summary scan, not a fact scan.

Spark-first shape: summaries are plain parquet directories with a JSON
sidecar declaring (group keys, measure sums, row-count column); the
navigator is driver-side METADATA work (pick the smallest valid
summary — sidecars are a handful of bytes), and the rewritten query is
an ordinary DataFrame re-aggregation Catalyst then optimizes normally.
Only SELF-MAINTAINABLE re-aggregation is offered: SUM (sums of sums)
and COUNT (the result carries the summed row count AND a per-measure
non-null count, so NULL-correct AVG derives as SUM/<m>_nonnull — a
row count alone would silently deflate AVG over nullable measures).
Anything a summary cannot answer exactly — a measure it does not
carry, and by construction every non-additive aggregate (exact
distinct, median) — is refused loudly rather than silently wrong.

Maintenance composes with the engine's CDC stack: a summary is a
grouped rollup, so ``operators/incremental_agg.py::apply_agg_delta``
maintains it from a version diff and ``sources/versioned.py`` publishes
it atomically (that path is driver-attested by `refresh_rollup_audit`);
this module owns the READ side — store, navigate, rewrite.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META = "_summary.json"


def materialize_summary(
    fact: DataFrame,
    store_dir: str,
    name: str,
    keys: list[str],
    measures: dict[str, str],
) -> None:
    """Materialize one rollup: ``keys`` grain, SUM of each measure source
    (output column → fact column), a per-measure NON-NULL count
    (``__nn_<out>`` — what makes NULL-correct AVG answerable) and an
    ``__n`` row count (what makes COUNT answerable). Writes parquet +
    the JSON sidecar the navigator reads."""
    if not keys:
        raise ValueError("summary needs at least one group key")
    path = os.path.join(store_dir, name)
    (
        fact.groupBy(*keys)
        .agg(
            *[F.sum(src).cast("double").alias(out) for out, src in measures.items()],
            *[
                F.count(src).cast("long").alias(f"__nn_{out}")
                for out, src in measures.items()
            ],
            F.count(F.lit(1)).cast("long").alias("__n"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )
    # Record the FULL out→src mapping, not just output names: maintenance
    # called with the right names but a wrong source column must be refused,
    # not silently corrupt the store (ADVICE r9).
    meta = {
        "keys": sorted(keys),
        "measures": sorted(measures),
        "measure_map": dict(sorted(measures.items())),
    }
    tmp = os.path.join(path, f".{_META}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, _META))


def _summaries(store_dir: str) -> list[tuple[str, dict]]:
    # A store that does not exist yet simply has no summaries — the
    # navigator must answer None / LookupError (the documented
    # fall-back-to-fact path), never FileNotFoundError (review r8).
    if not os.path.isdir(store_dir):
        return []
    out = []
    for d in sorted(os.listdir(store_dir)):
        mp = os.path.join(store_dir, d, _META)
        if os.path.exists(mp):
            with open(mp) as f:
                out.append((d, json.load(f)))
    return out


def navigate(
    store_dir: str, keys: list[str], measures: list[str]
) -> str | None:
    """Name of the CHEAPEST valid summary for (keys, measures), or None.

    Valid: the summary's grain contains every requested key and carries
    every requested measure. Cheapest: fewest grain keys — the coarsest
    valid rollup is (weakly) the smallest relation; metadata-only work,
    no data touched."""
    valid = [
        (len(meta["keys"]), name)
        for name, meta in _summaries(store_dir)
        if set(keys) <= set(meta["keys"]) and set(measures) <= set(meta["measures"])
    ]
    return min(valid)[1] if valid else None


def answer_from_summaries(
    spark: SparkSession,
    store_dir: str,
    need_cols: list[str],
    measures: list[str],
    out_keys: list | None = None,
) -> tuple[DataFrame, str]:
    """Rewrite ``SELECT <out_keys>, SUM(measures), COUNT(*) GROUP BY
    <out_keys>`` against the navigator's chosen summary; returns
    (result, chosen summary name).

    ``need_cols`` are the SUMMARY columns the grouping needs (what the
    navigator matches on); ``out_keys`` are the grouping expressions over
    those columns, already aliased (e.g. ``date_trunc('month', ship_day)
    .alias('month')``) — defaults to the need_cols themselves. COUNT
    re-aggregates as the sum of the summary's row counts; each measure
    also returns ``<m>_nonnull`` so AVG(m) derives NULL-correctly as
    ``m / m_nonnull``. Raises if no materialized summary can answer (the
    caller falls back to the fact — refusing beats silently scanning
    100 TB).
    """
    choice = navigate(store_dir, need_cols, measures)
    if choice is None:
        raise LookupError(
            f"no summary in {store_dir} answers keys={need_cols} "
            f"measures={measures}"
        )
    s = spark.read.parquet(os.path.join(store_dir, choice))
    keys = out_keys if out_keys is not None else [F.col(c) for c in need_cols]
    return (
        s.groupBy(*keys).agg(
            *[F.sum(m).alias(m) for m in measures],
            *[
                F.sum(f"__nn_{m}").cast("long").alias(f"{m}_nonnull")
                for m in measures
            ],
            F.sum("__n").cast("long").alias("n_rows"),
        ),
        choice,
    )


def maintain_summary(
    spark: SparkSession,
    store_dir: str,
    name: str,
    diff: DataFrame,
    measures: dict[str, str],
) -> None:
    """Maintain a materialized summary IN PLACE from a CDC change set
    (``sources/versioned.py::version_diff`` shape) — the write side the
    module docstring promises, closing the navigator⊕maintenance loop.

    Cost O(|changes| + |summary|), never the fact: the summary's SUM
    columns and row count maintain through ``operators/incremental_agg.py
    ::apply_agg_delta`` (group-move-correct: a changed row negates its OLD
    image at its OLD group and adds its NEW image at its NEW group); the
    per-measure non-null counts (``__nn_<m>``, what keeps AVG
    NULL-correct) ride the SAME algebra as indicator measures — each
    image's struct is enriched with ``(src IS NOT NULL)::double`` fields,
    so Σ(indicator) IS the non-null count delta. ``measures`` must be the
    mapping the summary was materialized with.

    The maintained relation is localCheckpointed before the overwrite
    (self-overwrite guard). The rewrite is sidecar-as-commit-marker
    two-phase (the postings-index pattern): the sidecar is removed
    FIRST, the data overwritten, the sidecar rewritten LAST — so a
    crash mid-maintenance leaves the summary ABSENT from the navigator
    (a loud LookupError / fall-back-to-fact, the module's documented
    degraded state) rather than a partial summary served as truth.
    Re-running ``materialize_summary`` recovers it.
    """
    from data_warehouse_product_mix_clustering_spark.operators.incremental_agg import apply_agg_delta

    path = os.path.join(store_dir, name)
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    # Compare the WHOLE out→src mapping when the store recorded it — the
    # right output names over a wrong source column is silent corruption,
    # not a usable delta (ADVICE r9). Stores written before measure_map
    # existed fall back to the names-only check.
    stored_map = meta.get("measure_map")
    if stored_map is not None:
        if dict(measures) != stored_map:
            raise ValueError(
                f"measure mapping {dict(sorted(measures.items()))} differs "
                f"from the summary's materialized mapping {stored_map}"
            )
    elif sorted(measures) != meta["measures"]:
        raise ValueError(
            f"measures {sorted(measures)} differ from the summary's "
            f"materialized set {meta['measures']}"
        )
    d = diff
    for out, src in measures.items():
        for img in ("__old", "__new"):
            d = d.withColumn(
                img,
                F.col(img).withField(
                    f"__i_{out}", F.col(f"{img}.{src}").isNotNull().cast("double")
                ),
            )
    all_measures = dict(measures)
    all_measures.update({f"__nn_{out}": f"__i_{out}" for out in measures})
    old = spark.read.parquet(path)
    new = apply_agg_delta(old, d, meta["keys"], all_measures, count_col="__n")
    # apply_agg_delta's documented NULL divergence (all-NULL group sums to
    # 0.0 where SQL SUM yields NULL) is resolved here exactly the way its
    # docstring prescribes: the summary carries the per-measure non-null
    # count, so a zero-__nn group's sum is NULLed to match a recompute.
    new = new.select(
        *meta["keys"],
        *[
            F.when(F.col(f"__nn_{out}") > 0, F.col(out)).alias(out)
            for out in measures
        ],
        *[F.col(f"__nn_{out}").cast("long").alias(f"__nn_{out}") for out in measures],
        F.col("__n").cast("long").alias("__n"),
    ).localCheckpoint(eager=True)
    try:
        os.remove(os.path.join(path, _META))  # phase 1: de-commit
    except FileNotFoundError:
        pass
    new.write.mode("overwrite").parquet(path)
    tmp = os.path.join(path, f".{_META}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, _META))


from data_warehouse_product_mix_clustering_spark.plans.registry import register  # noqa: E402
from data_warehouse_product_mix_clustering_spark.sources.registry import table  # noqa: E402


@register(
    "mv_rewrite_audit",
    oracle="""
        SELECT
            (SELECT CAST(count(DISTINCT date_trunc('month', l_shipdate))
                    AS BIGINT) FROM lineitem) AS n_months,
            TRUE AS chose_finer_summary,
            TRUE AS chose_coarsest_valid,
            TRUE AS monthly_matches_fact,
            TRUE AS total_matches_fact,
            TRUE AS summary_only_scan,
            TRUE AS refuses_unanswerable
    """,
)
def mv_rewrite_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-navigator contract: two summaries materialized off
    lineitem — daily-by-returnflag and daily — then

    - a monthly-by-flag query rewrites to the FINER summary (the coarse
      one lacks the flag) and matches the fact-direct answer value for
      value (sums within the 1e-4 double-reassociation bound, counts
      exact);
    - a monthly-total query picks the COARSEST valid summary (fewest
      grain keys) and matches the fact too;
    - the rewritten plan scans ONLY the summary parquet — the fact file
      never appears in it (the 100 TB point);
    - an unanswerable request (a measure no summary carries) raises
      instead of silently scanning the fact.
    """
    import shutil
    import tempfile

    li = table(spark, "lineitem", sf_dir).select(
        F.col("l_shipdate").cast("date").alias("ship_day"),
        "l_returnflag",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )
    root = tempfile.mkdtemp(prefix="spark_graft_mv_audit_")
    try:
        materialize_summary(
            li, root, "daily_flag", ["ship_day", "l_returnflag"], {"revenue": "revenue"}
        )
        materialize_summary(li, root, "daily", ["ship_day"], {"revenue": "revenue"})

        month = F.date_trunc("month", F.col("ship_day")).alias("month")
        by_flag, chosen_a = answer_from_summaries(
            spark, root, ["ship_day", "l_returnflag"], ["revenue"],
            out_keys=[month, F.col("l_returnflag")],
        )
        total, chosen_b = answer_from_summaries(
            spark, root, ["ship_day"], ["revenue"], out_keys=[month]
        )

        def matches(rewritten, key_names) -> bool:
            direct = li.groupBy(
                F.date_trunc("month", "ship_day").alias("month"),
                *[F.col(k) for k in key_names],
            ).agg(
                F.sum("revenue").alias("__rev"),
                F.count(F.lit(1)).cast("long").alias("__cnt"),
            )
            cond = rewritten["month"].eqNullSafe(direct["month"])
            for kn in key_names:
                cond = cond & rewritten[kn].eqNullSafe(direct[kn])
            probe = rewritten.join(direct, cond, "full_outer").agg(
                F.min(
                    F.coalesce(
                        (F.abs(F.col("revenue") - F.col("__rev")) <= 1e-4)
                        & (F.col("n_rows") == F.col("__cnt")),
                        F.lit(False),
                    )
                )
            ).first()[0]
            return bool(probe)

        monthly_ok = matches(by_flag, ["l_returnflag"])
        total_ok = matches(total, [])
        n_months = total.count()
        plan = by_flag._jdf.queryExecution().executedPlan().toString()
        summary_only = "daily_flag" in plan and "lineitem" not in plan
        try:
            answer_from_summaries(spark, root, ["ship_day"], ["quantity"])
            refuses = False
        except LookupError:
            refuses = True
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                n_months,
                chosen_a == "daily_flag",
                chosen_b == "daily",
                monthly_ok,
                total_ok,
                bool(summary_only),
                refuses,
            )
        ],
        "n_months long, chose_finer_summary boolean, chose_coarsest_valid boolean, "
        "monthly_matches_fact boolean, total_matches_fact boolean, "
        "summary_only_scan boolean, refuses_unanswerable boolean",
    )


@register(
    "mv_maintenance_audit",
    oracle="""
        WITH v1 AS (
            SELECT CAST(o_orderdate AS DATE) AS ship_day,
                   CASE WHEN o_orderkey % 7 = 5 THEN 'X' ELSE o_orderstatus
                       END AS flag
            FROM orders WHERE o_orderkey % 7 <> 3
        )
        SELECT (SELECT CAST(count(*) AS BIGINT)
                FROM (SELECT DISTINCT ship_day, flag FROM v1)) AS n_groups,
               TRUE AS maintained_equals_recompute,
               TRUE AS groups_moved,
               TRUE AS navigator_matches_fact
    """,
)
def mv_maintenance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigator ⊕ maintenance, composed end-to-end (VERDICT r8 Next #5):
    a daily-by-flag revenue summary is materialized off version 0 of a
    lineitem-derived fact, ONE CDC batch (adds + removes + group-moving
    changes) flows through ``maintain_summary``, and the audit pins

    - ``maintained_equals_recompute``: the maintained summary equals a
      from-scratch materialization over v1 — every group key, SUM within
      the 1e-6 double-reassociation bound, non-null counts and row counts
      EXACT, groups born (the 'X' flag) and died included;
    - ``groups_moved``: the change batch really exercised the
      between-groups decomposition (flag 'X' groups exist only via moved
      rows — a maintainer that nets changed rows at one group fails);
    - ``navigator_matches_fact``: ``answer_from_summaries`` over the
      MAINTAINED store answers the monthly-by-flag rollup identically to
      a v1 fact-direct aggregation — the loop the module docstring
      promises, driver-attested in one row.

    The CDC batch: v1 adds every ``o_orderkey % 7 == 0`` row (absent from
    v0), removes ``% 7 == 3``, and for ``% 7 == 5`` doubles the total
    price AND moves the row to status 'X'. (The fact derives from
    ``orders`` — its key is unique in the testdata, the diff
    precondition; lineitem's (orderkey, linenumber) is not.)
    """
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.sources.versioned import version_diff, write_version

    li = table(spark, "orders", sf_dir).select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("ship_day"),
        F.col("o_orderstatus").alias("flag"),
        F.col("o_totalprice").alias("revenue"),
    )
    mod = F.col("o_orderkey") % 7
    v0 = li.filter(mod != 0)
    v1 = li.filter(mod != 3).select(
        "o_orderkey",
        "ship_day",
        F.when(mod == 5, F.lit("X")).otherwise(F.col("flag")).alias("flag"),
        F.when(mod == 5, F.col("revenue") * 2).otherwise(F.col("revenue")).alias(
            "revenue"
        ),
    )
    root = tempfile.mkdtemp(prefix="spark_graft_mv_maint_")
    try:
        tdir = os.path.join(root, "fact")
        write_version(v0, tdir)
        write_version(v1, tdir)
        store = os.path.join(root, "store")
        measures = {"revenue": "revenue"}
        materialize_summary(v0, store, "daily_flag", ["flag", "ship_day"], measures)
        diff = version_diff(spark, tdir, 0, 1, key=["o_orderkey"])
        maintain_summary(spark, store, "daily_flag", diff, measures)

        maintained = spark.read.parquet(os.path.join(store, "daily_flag"))
        ref_store = os.path.join(root, "ref_store")
        materialize_summary(v1, ref_store, "daily_flag", ["flag", "ship_day"], measures)
        recomputed = spark.read.parquet(os.path.join(ref_store, "daily_flag"))

        from data_warehouse_product_mix_clustering_spark.operators.quality import equivalence_probe

        # summary grain: every value folds few rows → tight 1e-6 bound
        n_groups, equal = equivalence_probe(
            maintained, recomputed,
            keys=["ship_day", "flag"],
            exact=["__nn_revenue", "__n"],
            approx={"revenue": 1e-6},
        )
        moved = bool(
            maintained.agg(
                F.coalesce(F.max(F.col("flag") == "X"), F.lit(False))
            ).first()[0]
        )

        month = F.date_trunc("month", F.col("ship_day")).alias("month")
        nav, _choice = answer_from_summaries(
            spark, store, ["ship_day", "flag"], ["revenue"],
            out_keys=[month, F.col("flag")],
        )
        direct = v1.groupBy(
            F.date_trunc("month", "ship_day").alias("month"), "flag"
        ).agg(
            F.sum("revenue").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        # monthly grain folds ~30× more rows per value → looser 1e-4
        _n, nav_ok = equivalence_probe(
            nav.select("month", "flag", "revenue", "n_rows"), direct,
            keys=["month", "flag"],
            exact=["n_rows"],
            approx={"revenue": 1e-4},
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [(n_groups, bool(equal), moved, bool(nav_ok))],
        "n_groups long, maintained_equals_recompute boolean, "
        "groups_moved boolean, navigator_matches_fact boolean",
    )
