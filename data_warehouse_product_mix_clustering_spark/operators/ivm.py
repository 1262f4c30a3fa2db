"""Shared incremental-view-maintenance primitives for persisted,
partition-bucketed index artifacts (postings r8, IVF/IVF-PQ r10, MinHash
r10). The common shape: an index relation partitioned by a bounded
bucket column, maintained by rewriting ONLY the buckets a CDC change set
touches — with the emptied-bucket rule dynamic partition overwrite does
not give you for free.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

# Completion marker shared by every persisted index family: the index's
# relations are mutated by several non-atomic steps, so the marker is
# deleted before the first mutation and re-created only after the last —
# a crash mid-build/mid-update leaves a DETECTABLE torn index. On a
# transactional table format this is the commit log's job; the marker is
# the local-parquet stand-in. (Hoisted from operators/postings.py in r10
# once three index families shared it via private imports — review r10.)
COMMIT_MARKER = "_INDEX_COMMITTED"


def index_is_committed(index_dir: str) -> bool:
    """True iff the last build/update of ``index_dir`` ran to completion."""
    return os.path.exists(os.path.join(index_dir, COMMIT_MARKER))


def mark_dirty(index_dir: str) -> None:
    try:
        os.remove(os.path.join(index_dir, COMMIT_MARKER))
    except FileNotFoundError:
        pass


def mark_committed(index_dir: str) -> None:
    with open(os.path.join(index_dir, COMMIT_MARKER), "w", encoding="utf-8") as f:
        f.write("committed\n")


def require_committed(index_dir: str, kind: str) -> None:
    """Serving-path guard: a torn index must REFUSE reads, not silently
    serve a mix of old and new rows (the postings read path's convention,
    extended to every family's search/maintenance entry points). A store
    written before the marker existed is indistinguishable from a torn
    one (that ambiguity is WHY the marker exists), so it is refused too —
    the deliberate upgrade contract is rebuild-once, stated in the
    message rather than guessed around."""
    if not index_is_committed(index_dir):
        raise RuntimeError(
            f"{kind} index at {index_dir} has no commit marker — either a "
            "build or update crashed mid-write (torn), or the index was "
            "built by a version without markers; rebuild it before use"
        )


def overwrite_touched_partitions(
    updated: DataFrame, path: str, part_col: str, touched: list
) -> None:
    """Dynamic-partition-overwrite ``updated`` into ``path`` and clear
    any touched partition directory the update emptied: dynamic overwrite
    only replaces partitions PRESENT in the written data, so a bucket
    whose last row was removed would otherwise keep serving stale rows
    forever (``replaceWhere``'s job on a transactional table format; this
    is the local-parquet stand-in, same as update_postings_index)."""
    (
        updated.repartition(part_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(part_col)
        .parquet(path)
    )
    nonempty = {r[part_col] for r in updated.select(part_col).distinct().collect()}
    for b in set(touched) - nonempty:
        shutil.rmtree(os.path.join(path, f"{part_col}={b}"), ignore_errors=True)


def read_index_relation(spark, path: str, empty_schema: str) -> DataFrame:
    """Read a partition-bucketed index relation, returning a typed EMPTY
    DataFrame when it holds zero rows: a maintenance run that cleared
    every partition (remove-everything CDC batch) — or a build over an
    all-empty input — leaves a directory with only ``_SUCCESS``, which
    ``spark.read.parquet`` cannot infer a schema from (found by the
    MinHash maintenance≡rebuild hypothesis property, r10; the same state
    is reachable in every family). ``empty_schema`` is the relation's DDL
    string, recorded by the builder in the index's schema sidecar.

    ONLY schema-inference failure is treated as empty: every legitimate
    emptied state still leaves the directory (with ``_SUCCESS``), so a
    PATH_NOT_FOUND means the relation was never built or was deleted
    out-of-band — with the commit marker still present that is a torn
    store, and masking it as empty would contradict ``require_committed``
    (review r10)."""
    from data_warehouse_product_mix_clustering_spark.sources.versioned import analysis_condition

    try:
        return spark.read.parquet(path)
    except Exception as e:
        if analysis_condition(e) != "UNABLE_TO_INFER_SCHEMA":
            raise
        return spark.createDataFrame([], empty_schema)


SCHEMA_SIDECAR = "_schema.json"


def write_id_schema(index_dir: str, id_col: str, id_type: str) -> None:
    """ONE convention for recording the id column's name/type next to the
    commit marker — what ``read_index_relation``'s typed-empty schema
    needs. Three families grew three divergent mechanisms in the first
    cut (one of which crashed on pre-existing indexes — review r10);
    every family now writes and reads this sidecar."""
    import json

    from data_warehouse_product_mix_clustering_spark.sources.versioned import write_small_file_atomic

    write_small_file_atomic(
        os.path.join(index_dir, SCHEMA_SIDECAR),
        json.dumps({"id_col": id_col, "id_type": id_type}),
    )


def read_id_schema(
    index_dir: str, default_col: str, default_type: str
) -> tuple[str, str]:
    """(id_col, id_type), falling back to the family's defaults for
    indexes persisted before the sidecar existed (also accepts the
    short-lived ``doc_id_type`` key shape)."""
    import json

    p = os.path.join(index_dir, SCHEMA_SIDECAR)
    if not os.path.exists(p):
        return default_col, default_type
    with open(p) as f:
        doc = json.load(f)
    if "doc_id_type" in doc:
        return default_col, doc["doc_id_type"]
    return doc.get("id_col", default_col), doc.get("id_type", default_type)


def partition_file_listing(
    base: str, part_col: str, skip_dirs: frozenset | set = frozenset()
) -> dict:
    """{partition_dir_name: sorted [(file, size, mtime)]} for every
    ``part_col=<v>`` directory under ``base`` — the measured
    untouched-partitions-kept-byte-intact primitive the maintenance
    audits share (one definition across the vector and MinHash index
    families; a fix here — e.g. metadata-file exclusion or mtime
    granularity — reaches every audit)."""
    out: dict = {}
    if not os.path.isdir(base):
        return out
    for d in os.listdir(base):
        if not d.startswith(f"{part_col}=") or d in skip_dirs:
            continue
        p = os.path.join(base, d)
        out[d] = sorted(
            (f, os.path.getsize(os.path.join(p, f)),
             os.path.getmtime(os.path.join(p, f)))
            for f in os.listdir(p)
            if not f.startswith(".")
        )
    return out
