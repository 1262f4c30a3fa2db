"""Data-quality operators: table profiling and declarative constraints.

The operational guardrail of a 100 TB ingestion pipeline: before data is
published, profile it (null rates, cardinalities, ranges) and enforce
contracts (not-null, uniqueness, value ranges). Both are single-pass
aggregations — one scan however many columns/constraints are checked —
with results small enough to alert on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: rows, nulls, distincts, min/max — ONE scan.

    All per-column aggregates are computed in a single aggregation (one
    pass, partial aggregation map-side), then pivoted to one row per
    column with a ``stack`` expression — no per-column jobs, no driver
    loop over data. min/max are stringified so heterogeneous column types
    share one output schema.
    """
    cols = columns or df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.select(
        F.col("__n").alias("__n"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_non_null, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column_name",
        F.col("__n").cast("long").alias("n_rows"),
        (F.col("__n") - F.col("n_non_null")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def check_constraints(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Contract check → (constraint, violations) summary, minimal passes.

    not_null and range constraints share ONE scan (conditional counts);
    each uniqueness key adds one aggregation on its key (a duplicate
    count needs a grouped pass by definition). Zero violations everywhere
    = the table honors its contract; alert on any non-zero row.
    """
    if not not_null and not unique and not ranges:
        raise ValueError(
            "check_constraints: no constraints given (not_null, unique and "
            "ranges are all empty)"
        )
    parts: list[DataFrame] = []
    aggs: list[Column] = []
    names: list[str] = []
    for c in not_null or []:
        names.append(f"not_null({c})")
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"__v{len(names)}"))
    for c, (lo, hi) in (ranges or {}).items():
        names.append(f"range({c},[{lo},{hi}])")
        aggs.append(
            F.count_if(
                F.col(c).isNotNull() & ((F.col(c) < lo) | (F.col(c) > hi))
            ).alias(f"__v{len(names)}")
        )
    if aggs:
        one = df.agg(*aggs)
        stacked = ", ".join(
            f"'{name}', __v{i + 1}" for i, name in enumerate(names)
        )
        parts.append(
            one.select(
                F.expr(
                    f"stack({len(names)}, {stacked}) AS (constraint, violations)"
                )
            )
        )
    for key in unique or []:
        kname = ",".join(key)
        dup = (
            df.groupBy(*key)
            .count()
            .filter(F.col("count") > 1)
            .agg(
                F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("violations")
            )
            .select(F.lit(f"unique({kname})").alias("constraint"), "violations")
        )
        parts.append(dup)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("constraint", F.col("violations").cast("long").alias("violations"))
