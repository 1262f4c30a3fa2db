"""The composed warehouse refresh: dirty landing feed → quarantined
ingest → atomic versioned publish → CDC diff → incrementally maintained
rollup.

Each piece exists and is tested on its own (streaming/quarantine.py,
sources/versioned.py, operators/incremental_agg.py); this module is the
end-to-end composition a production refresh actually runs, kept as ONE
function so the contract — "a refresh never shows readers a partial
table, never loses a malformed line, and never rescans the base table to
update the rollup" — is testable as a unit.

Flow per refresh run:

1. Drain the landing directory through the checkpointed quarantine ETL
   (new files only; malformed lines accumulate in the quarantine sink).
2. Collapse the append-only clean log to the current table state:
   latest-batch-wins per key (a re-landed key is an upsert; the
   deterministic tie-break makes even a within-batch duplicate resolve
   identically on every run). Deletes are not expressible in an
   append-only feed — a soft-delete flag column is the extension.
3. Publish that state as the NEXT table version (atomic marker flip;
   readers see old or new, never partial).
4. If a previous version exists, extract the CDC change set and maintain
   the rollup from the delta alone; on the first run, compute the rollup
   once from the published version.

At 100 TB step 4 is the payoff: the rollup update costs |changes|, not
|table|. The rollup itself is stored versioned too, so its history
travels with the table's and a bad refresh rolls BOTH back in O(1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_warehouse_product_mix_clustering_spark.operators.incremental_agg import apply_agg_delta
from data_warehouse_product_mix_clustering_spark.sources.versioned import (
    read_table,
    version_diff,
    versions,
    write_version,
)
from data_warehouse_product_mix_clustering_spark.streaming.quarantine import (
    streaming_csv_quarantine_etl,
)


def refresh_warehouse(
    spark: SparkSession,
    landing_dir: str,
    work_dir: str,
    schema: T.StructType,
    key: list[str],
    group_keys: list[str],
    measures: dict[str, str],
    header: bool = True,
    tombstone_col: str | None = None,
) -> dict[str, int]:
    """One refresh run. Returns {'version': N, 'agg_version': N,
    'changes': |diff|} (changes == -1 on the initial full build).

    Layout under ``work_dir``: ``clean/`` + ``quarantine/`` + ``_ckpt/``
    (the ingest sinks), ``table/`` (versioned table), ``agg/`` (versioned
    rollup). ``measures`` maps rollup sum-column → source column; the
    rollup always carries an ``n`` row count (what lets groups die).

    ``tombstone_col`` names a boolean schema column that makes DELETES
    expressible in the append-only feed (the extension the module
    docstring promises): a landed row with the flag true is a tombstone
    for its key — it wins the latest-batch-wins window like any upsert
    and is then filtered from the published state, so the CDC diff sees
    a plain ``removed`` and the maintained rollup shrinks (groups can
    die) through the same |changes|-cost path. Re-deleting an absent
    key is a no-op; the flag column itself stays in the published
    schema (false on every surviving row) so baselines union cleanly.
    """
    # The CDC diff carries only NON-key attributes in its __old/__new
    # images (version_diff's contract), so a rollup can neither group nor
    # sum by a key column — without this guard the first (full) build
    # succeeds and every later incremental refresh dies with an opaque
    # unresolved-field error (ADVICE r7).
    overlap = sorted(set(key) & (set(group_keys) | set(measures.values())))
    if overlap:
        raise ValueError(
            f"group_keys/measures must be disjoint from key; {overlap} "
            "appear in both. Keys identify rows; only non-key attributes "
            "travel in the change set the incremental rollup consumes."
        )
    if tombstone_col is not None:
        if tombstone_col not in {f.name for f in schema.fields}:
            raise ValueError(f"tombstone_col {tombstone_col!r} not in schema")
        if tombstone_col in set(key) | set(group_keys) | set(measures.values()):
            raise ValueError(
                f"tombstone_col {tombstone_col!r} must not be a key, group "
                "key, or measure source — it is a pure delete marker"
            )
    clean_dir = os.path.join(work_dir, "clean")
    quarantine_dir = os.path.join(work_dir, "quarantine")
    ckpt = os.path.join(work_dir, "_ckpt")
    table_dir = os.path.join(work_dir, "table")
    agg_dir = os.path.join(work_dir, "agg")

    streaming_csv_quarantine_etl(
        spark, landing_dir, schema, clean_dir, quarantine_dir, ckpt, header=header
    )
    # Latest-batch-wins upsert: the prior PUBLISHED version is the
    # baseline (tagged batch −1, so any re-delivered key outranks it) and
    # only batches newer than the ingest watermark join it — the upsert
    # window therefore processes |live keys| + |new rows|, never the
    # whole append-only log, which stays vacuumable after each publish.
    # Attrs complete the ordering so even an in-batch duplicate resolves
    # deterministically on every run.
    from pyspark.sql import Window

    from data_warehouse_product_mix_clustering_spark.streaming.quarantine import BATCH_COL

    from pyspark.errors import AnalysisException

    prior = versions(table_dir)
    try:
        raw = spark.read.parquet(clean_dir)
    except AnalysisException as e:
        # First run with an empty landing directory, or one whose every
        # line quarantined: the clean sink is absent (no committed batch)
        # or schema-uninferable (only empty partitions). ONLY those two
        # conditions are the empty-landing no-op; any other analysis
        # failure (e.g. conflicting schemas across batch partitions =
        # a corrupt clean sink) must fail the refresh, not silently
        # report changes=0 (ADVICE r8).
        from data_warehouse_product_mix_clustering_spark.sources.versioned import analysis_condition

        if analysis_condition(e) not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
            raise
        agg_prior = versions(agg_dir)
        return {
            "version": prior[-1] if prior else -1,
            "agg_version": agg_prior[-1] if agg_prior else -1,
            "changes": 0,
        }
    attrs = [f.name for f in schema.fields if f.name not in key]
    wm = _read_watermark(work_dir)
    if prior:
        baseline = read_table(spark, table_dir, prior[-1]).withColumn(
            BATCH_COL, F.lit(-1)
        )
        pool = baseline.unionByName(raw.filter(F.col(BATCH_COL) > wm))
    else:
        pool = raw
    w = Window.partitionBy(*key).orderBy(
        F.col(BATCH_COL).desc(), *[F.col(c).desc_nulls_last() for c in attrs]
    )
    current = (
        pool.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", BATCH_COL)
    )
    if tombstone_col is not None:
        # a winning tombstone deletes its key from the published state
        current = current.filter(
            ~F.coalesce(F.col(tombstone_col), F.lit(False))
        )
    new_wm = raw.agg(F.max(BATCH_COL)).collect()[0][0]
    v = write_version(current, table_dir)

    def full_rollup(df: DataFrame) -> DataFrame:
        # Sums cast to double so the v0 rollup schema matches what
        # apply_agg_delta maintains thereafter (its coalesce-with-0.0
        # arithmetic is double) — otherwise an integer measure makes the
        # rollup's own version history drift long→double and version_diff
        # over it raises its schema-drift error (ADVICE r7).
        return df.groupBy(*group_keys).agg(
            *[F.sum(src).cast("double").alias(out) for out, src in measures.items()],
            F.count(F.lit(1)).alias("n"),
        )

    agg_versions = versions(agg_dir)
    if not prior or not agg_versions:
        agg = full_rollup(read_table(spark, table_dir, v))
        changes = -1
    else:
        # The delta must run from the table version the CURRENT rollup
        # reflects (the basis sidecar), not blindly from prior[-1]: a
        # crash between the table publish and the rollup publish leaves
        # the rollup one version behind, and the next run's
        # prior[-1]→v diff is EMPTY (re-ingested batches are
        # idempotent), so a prior-based delta would silently skip the
        # crashed run's changes forever. Basis-based maintenance
        # self-heals: the stale basis makes the next diff span the
        # missed version too. (A missing sidecar — legacy store — falls
        # back to prior[-1], the pre-fix semantics.)
        basis = _read_agg_basis(work_dir, agg_versions[-1], prior[-1])
        diff = version_diff(spark, table_dir, basis, v, key=key)
        # the diff is consumed twice (count + delta); localCheckpoint so
        # the two version scans + join run once, and the count is honest
        diff = diff.localCheckpoint(eager=True)
        changes = diff.count()
        old_agg = read_table(spark, agg_dir)
        agg = apply_agg_delta(old_agg, diff, group_keys, measures, count_col="n")
    # The basis sidecar is keyed by the agg version it describes and
    # written BEFORE that version commits: a crash in between leaves a
    # sidecar for a version that does not exist (harmless), never a
    # committed rollup without its basis (which would double-apply the
    # delta on the next run).
    from data_warehouse_product_mix_clustering_spark.sources.versioned import next_version

    # next_version (marker + EVERY v=* dir, orphans included) — not
    # versions()[-1]+1: a crash-orphaned rollup directory makes the two
    # disagree, and the sidecar would then be keyed to a version the
    # write never produces, re-opening the staleness bug (review r9).
    next_agg_v = next_version(agg_dir)
    _write_agg_basis(work_dir, next_agg_v, v)
    agg_v = write_version(agg, agg_dir)
    _vacuum_agg_basis(work_dir, agg_dir, agg_v)
    if new_wm is not None:
        _write_watermark(work_dir, int(new_wm))
    return {"version": v, "agg_version": agg_v, "changes": changes}


_WATERMARK = "_ingest_watermark"
_AGG_BASIS = "_agg_basis_v"


def _read_agg_basis(work_dir: str, agg_version: int, fallback: int) -> int:
    """Table version the rollup's ``agg_version`` was maintained up to;
    ``fallback`` (= prior[-1], the pre-sidecar semantics) for legacy
    stores whose versions predate the sidecar."""
    p = os.path.join(work_dir, f"{_AGG_BASIS}{agg_version}")
    if not os.path.exists(p):
        return fallback
    with open(p) as f:
        return int(f.read().strip())


def _write_agg_basis(work_dir: str, agg_version: int, table_version: int) -> None:
    from data_warehouse_product_mix_clustering_spark.sources.versioned import write_small_file_atomic

    write_small_file_atomic(
        os.path.join(work_dir, f"{_AGG_BASIS}{agg_version}"), str(table_version)
    )


def _vacuum_agg_basis(work_dir: str, agg_dir: str, latest: int) -> None:
    """Drop basis sidecars for rollup versions the store no longer holds.

    One sidecar per rollup version otherwise accumulates forever (ADVICE
    r9). Keep sidecars for versions still present (rollback to version k
    re-reads basis k on the next maintenance) and any keyed ABOVE the
    just-published version (a crash-orphaned pending sidecar whose number
    ``next_version`` will hand out again — deleting it is harmless but
    racing a concurrent publish is not worth the risk).
    """
    from data_warehouse_product_mix_clustering_spark.sources.versioned import versions as _versions

    live = set(_versions(agg_dir))
    for name in os.listdir(work_dir):
        if not name.startswith(_AGG_BASIS):
            continue
        try:
            av = int(name[len(_AGG_BASIS):])
        except ValueError:
            continue
        if av <= latest and av not in live:
            os.remove(os.path.join(work_dir, name))


def _read_watermark(work_dir: str) -> int:
    p = os.path.join(work_dir, _WATERMARK)
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(f.read().strip())


def _write_watermark(work_dir: str, batch_id: int) -> None:
    from data_warehouse_product_mix_clustering_spark.sources.versioned import write_small_file_atomic

    write_small_file_atomic(os.path.join(work_dir, _WATERMARK), str(batch_id))
