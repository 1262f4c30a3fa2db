"""ANSI MERGE INTO as a composable DataFrame operator.

The reference's load phase only ever truncates-and-reloads
(src/pipelines/etl.py:102-107 via to_sql replace); a warehouse that
cannot rewrite whole tables needs the three-clause merge instead:

    MERGE INTO target USING source ON key
    WHEN MATCHED AND <delete_cond> THEN DELETE
    WHEN MATCHED THEN UPDATE SET <set_cols>
    WHEN NOT MATCHED THEN INSERT *

Spark-first shape: ONE join on the (null-safe) key decides every
row's fate — unmatched-target rows pass through, matched rows delete
or update, unmatched-source rows insert. No driver loops, no second
pass. A full three-clause merge needs a FULL OUTER join, which Spark
can only sort-merge (one shuffle of both sides on the key — the honest
cost of insert detection); an update/delete-only merge
(``insert_unmatched=False``) downgrades to a LEFT join, which DOES
broadcast a dimension-sized source, so the common maintenance case
costs one target scan. The result is a plain DataFrame — compose
with ``sources/versioned.py::write_version`` for an atomically published,
time-travelable merge (and ``version_diff`` then yields the merge's CDC
set for downstream incremental consumers).

ANSI's one-source-row-per-target-key precondition is enforced IN-PLAN:
each source row carries a per-key count and the update/insert values are
wrapped in an ``assert_true`` guard, so a duplicate-key source fails the
job loudly instead of nondeterministically picking a winner (the
documented Delta/SQL MERGE error, reproduced rather than papered over).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: list[str],
    update_set: dict[str, Column] | None = None,
    delete_condition: Column | None = None,
    insert_unmatched: bool = True,
) -> DataFrame:
    """Return ``target`` merged with ``source`` on ``key``.

    ``update_set`` maps target column → expression over the joined row
    (reference source columns as ``F.col("s." + c)``, target as
    ``F.col("t." + c)``); ``None`` means update every non-key column to
    the source's value. ``delete_condition`` (evaluated on matched rows,
    same aliases) wins over update. ``insert_unmatched=False`` drops
    WHEN NOT MATCHED (update/delete-only merge).

    Output column set == target's. Cost: one sort-merge shuffle for the
    full merge, a broadcastable LEFT join when ``insert_unmatched=False``;
    the duplicate-source-key guard is a window over the SOURCE only
    (small side by construction in upsert workloads).
    """
    if not key:
        raise ValueError("key must be non-empty")
    missing = [c for c in key if c not in source.columns or c not in target.columns]
    if missing:
        raise ValueError(f"key columns {missing} missing from source or target")
    extra = [c for c in source.columns if c not in target.columns]
    if extra:
        raise ValueError(
            f"source columns {extra} absent from target; project the source "
            "to the target's schema (or a subset plus the key) first"
        )
    reserved = {"__src_n", "__tgt_present"}
    if reserved & set(target.columns) or reserved & set(source.columns):
        raise ValueError(f"columns {sorted(reserved)} are reserved by merge_into")

    # Presence is detected via synthetic always-non-null flags, never key
    # values: eqNullSafe lets a NULL key match, so a NULL-keyed matched
    # row would otherwise be misread as absent.
    dup = F.count(F.lit(1)).over(Window.partitionBy(*[F.col(k) for k in key]))
    s = source.withColumn("__src_n", dup).alias("s")
    t = target.withColumn("__tgt_present", F.lit(1)).alias("t")
    cond = None
    for k in key:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer" if insert_unmatched else "left")
    matched = F.col("s.__src_n").isNotNull() & F.col("t.__tgt_present").isNotNull()
    src_only = F.col("t.__tgt_present").isNull() & F.col("s.__src_n").isNotNull()

    # ANSI precondition, enforced where the value is consumed so the
    # guard cannot be pruned: a matched/inserting source row must be its
    # key's only one.
    def guarded(value: Column) -> Column:
        ok = F.assert_true(
            F.col("s.__src_n") == 1,
            F.lit("MERGE source has duplicate rows for a key"),
        )
        return F.when(ok.isNull(), value)

    if update_set is None:
        update_set = {
            c: F.col(f"s.{c}")
            for c in source.columns
            if c not in key and c in target.columns
        }
    bad = [c for c in update_set if c in key or c not in target.columns]
    if bad:
        raise ValueError(f"update_set targets key/unknown columns: {bad}")

    out_cols = []
    for c in target.columns:
        tgt = F.col(f"t.{c}")
        ins = (
            F.col(f"s.{c}")
            if c in source.columns
            else F.lit(None).cast(target.schema[c].dataType)
        )
        # The matched branch is guarded even when the column keeps its
        # target value (e.g. update_set={}): otherwise a delete-only or
        # partial-update merge would never evaluate the duplicate-key
        # assert and a dup-keyed source would silently FAN OUT the
        # matched target row instead of failing (review r8).
        upd = guarded(update_set[c]) if c in update_set else guarded(tgt)
        out_cols.append(
            F.when(matched, upd)
            .when(src_only, guarded(ins))
            .otherwise(tgt)
            .alias(c)
        )
    out = joined
    if delete_condition is not None:
        # NULL delete-condition on a matched row means "don't delete"
        # (SQL WHEN MATCHED AND cond semantics), hence coalesce to FALSE.
        # The duplicate-key assert must ALSO ride the delete predicate:
        # deleted rows never reach the guarded projection below, so a
        # pure-delete merge whose dup-keyed rows all satisfy the delete
        # condition would otherwise bypass the ANSI precondition
        # (ADVICE r8). ``guarded`` keeps the assert under the matched
        # branch so unmatched rows (NULL __src_n) never evaluate it.
        del_pred = F.when(
            matched & F.coalesce(delete_condition, F.lit(False)),
            guarded(F.lit(True)),
        ).otherwise(F.lit(False))
        out = out.filter(~del_pred)
    # insert_unmatched=False uses a LEFT join, so src_only rows cannot
    # exist — no post-filter needed.
    return out.select(*out_cols)
