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
