"""Incremental aggregate maintenance: apply a CDC change set to a
materialized SUM/COUNT aggregate without recomputing it.

The 100 TB motivation: a grouped rollup over a slowly-changing table
costs a full fact scan + shuffle to rebuild, but a day's change set is
typically a vanishing fraction of the table. SUM and COUNT are
self-maintainable aggregates (each row's contribution is algebraically
removable), so the new aggregate is ``old ⊕ delta`` where delta comes
only from the changed rows — the classic incremental-view-maintenance
result, composed here with ``sources/versioned.py::version_diff`` as the
change-set source.

Correctness subtlety this module exists to get right: a 'changed' row
may move BETWEEN groups (its group-key attribute changed). The delta
therefore decomposes into a negation of the row's OLD image at its OLD
group and an addition of its NEW image at its NEW group — never a
single net row at either. AVG and other non-self-maintainable aggregates
(min/max/distinct) need auxiliary state or a rebuild; they are out of
scope by design (document, don't pretend).

Known divergence from SQL SUM: NULL measure values contribute 0 here, so
a group whose every value is NULL maintains to 0.0 where a recompute's
``SUM`` yields NULL. The count column is exact either way; callers who
need the SQL NULL convention can post-process ``CASE WHEN n_nonnull = 0``
with an extra per-measure non-null count measure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_delta(
    diff: DataFrame, group_keys: list[str], measures: dict[str, str]
) -> DataFrame:
    """Per-group (Δsum per measure, Δcount) from a ``version_diff`` output.

    ``diff`` must carry the ``version_diff`` shape: the key columns plus
    ``change_type`` and the ``__old`` / ``__new`` attribute structs.
    ``group_keys`` name attributes INSIDE those structs (the aggregate's
    grouping); ``measures`` maps output sum-column → source attribute.
    """
    sign_new = F.when(F.col("change_type").isin("added", "changed"), 1).otherwise(0)
    sign_old = F.when(F.col("change_type").isin("removed", "changed"), -1).otherwise(0)

    # Both images emit from ONE pass over the diff (array + explode), not a
    # self-union — a union would evaluate the upstream diff plan (two
    # version scans + a join) twice, breaking the |changes|-only cost claim.
    entries = F.array(
        F.struct(sign_new.alias("__s"), F.col("__new").alias("__img")),
        F.struct(sign_old.alias("__s"), F.col("__old").alias("__img")),
    )
    e = diff.select(F.explode(entries).alias("e")).filter(F.col("e.__s") != 0)
    contributions = e.select(
        *[F.col(f"e.__img.{k}").alias(k) for k in group_keys],
        *[
            (
                F.col("e.__s") * F.coalesce(F.col(f"e.__img.{src}"), F.lit(0.0))
            ).alias(out)
            for out, src in measures.items()
        ],
        F.col("e.__s").alias("__dn"),
    )
    return contributions.groupBy(*group_keys).agg(
        *[F.sum(out).alias(out) for out in measures],
        F.sum("__dn").cast("long").alias("__dn"),
    )


def apply_agg_delta(
    old_agg: DataFrame,
    diff: DataFrame,
    group_keys: list[str],
    measures: dict[str, str],
    count_col: str = "n",
) -> DataFrame:
    """New aggregate = ``old_agg`` ⊕ the change set — no base-table scan.

    ``old_agg`` must carry ``group_keys``, the measure sum columns, and a
    row-count column (``count_col``; required — it is what lets a group
    disappear when its last row is removed). Groups reaching count 0 are
    dropped; brand-new groups appear. Cost: one shuffle over the DELTA
    (|changes|-sized) plus a join against the old aggregate — never the
    base table. Joins are null-safe so NULL-valued group keys maintain
    correctly.
    """
    if not group_keys:
        raise ValueError(
            "group_keys must be non-empty; maintain a global total by "
            "grouping on a constant column instead"
        )
    missing = [c for c in [*group_keys, *measures, count_col] if c not in old_agg.columns]
    if missing:
        raise ValueError(f"old_agg lacks columns {missing}")
    delta = agg_delta(diff, group_keys, measures)
    o = old_agg.select(
        *group_keys,
        *[F.col(m).alias(f"__o_{m}") for m in measures],
        F.col(count_col).alias("__o_n"),
    )
    d = delta.select(
        *group_keys,
        *[F.col(m).alias(f"__d_{m}") for m in measures],
        F.col("__dn"),
    )
    cond = None
    for k in group_keys:
        c = o[k].eqNullSafe(d[k])
        cond = c if cond is None else (cond & c)
    joined = o.join(d, cond, "full_outer")
    out_keys = [F.coalesce(o[k], d[k]).alias(k) for k in group_keys]
    new_n = F.coalesce(F.col("__o_n"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))
    return (
        joined.select(
            *out_keys,
            *[
                (
                    F.coalesce(F.col(f"__o_{m}"), F.lit(0.0))
                    + F.coalesce(F.col(f"__d_{m}"), F.lit(0.0))
                ).alias(m)
                for m in measures
            ],
            new_n.cast("long").alias(count_col),
        )
        .filter(F.col(count_col) > 0)
    )
