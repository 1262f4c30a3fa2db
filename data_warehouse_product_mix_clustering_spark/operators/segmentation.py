"""Quantile segmentation: exact ntile under a cap, approx buckets above it.

The reference's customer-value quartiles (plans/warehouse.py
``customer_value_quartiles``) use ``ntile(n)`` over an UN-partitioned
window — a single-reducer global sort. That is the right call while the
input is a per-customer rollup (orders of magnitude smaller than the
fact table; ~100 M rows is still one executor's sort), but at true
100 TB customer cardinality the one-reducer sort becomes the straggler.

``quantile_segment`` makes the trade-off explicit:

- ``exact=True`` — ntile over the global window. Exact equal-size tiles,
  deterministic with a caller-supplied tiebreak. Use below ~100 M rows.
- ``exact=False`` — ``approx_percentile`` cut points (one distributed
  agg, mergeable sketch state) broadcast back as an array; each row maps
  to its bucket with a JVM-side fold over the boundaries. No global
  sort, no single reducer — the 100 TB path. Semantic delta vs exact:
  tile sizes are approximate (sketch rank error ≤ rows/accuracy) and
  ties at a boundary all land in one bucket instead of being split to
  equalize tile sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantile_segment(
    df: DataFrame,
    value_col: str,
    n: int = 4,
    *,
    descending: bool = True,
    tiebreak: list[str] | None = None,
    exact: bool = True,
    accuracy: int = 10000,
    segment_col: str = "segment",
) -> DataFrame:
    """Attach a 1-based quantile-segment column (1 = first tile).

    ``descending=True`` gives segment 1 to the LARGEST values (the
    customer-value convention). ``tiebreak`` columns make the exact
    path's total order — and therefore its tile boundaries —
    deterministic; they are ignored by the approx path (ties are not
    split there).
    """
    if n < 2:
        raise ValueError(f"n must be >= 2: {n}")
    if exact:
        order = [
            F.col(value_col).desc() if descending else F.col(value_col).asc()
        ] + [F.col(c) for c in (tiebreak or [])]
        w = Window.orderBy(*order)
        return df.withColumn(segment_col, F.ntile(n).over(w).cast("long"))

    probs = [i / n for i in range(1, n)]
    bounds = df.agg(
        F.percentile_approx(value_col, probs, accuracy).alias("__qseg_bounds")
    )
    v = F.col(value_col)
    # boundaries come back ascending; a fold counts how many the value
    # falls past — pure JVM expression, no UDF, no per-row Python
    bump: Column = (
        (lambda b: F.when(b > v, 1).otherwise(0))
        if descending
        else (lambda b: F.when(v >= b, 1).otherwise(0))
    )
    seg = F.lit(1) + F.aggregate(
        "__qseg_bounds", F.lit(0), lambda acc, b: acc + bump(b)
    )
    # NULL values: every boundary comparison is NULL -> bump 0 -> they
    # would land in segment 1 (the BEST tile under descending). The
    # exact path's nulls-last ordering puts them in segment n; mirror
    # that here so the two paths agree on NULL rows (review r8).
    seg = F.when(v.isNull(), F.lit(n)).otherwise(seg)
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(segment_col, seg.cast("long"))
        .drop("__qseg_bounds")
    )
