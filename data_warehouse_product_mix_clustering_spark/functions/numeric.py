"""Cross-engine-deterministic numeric rounding (F15).

Money-ish columns in the testdata are exact decimals (2-6 fractional
digits), so their sums are exact decimals too — but a double-precision sum
carries ~1e-12 relative noise that differs between engines (different
summation order), and plain ``round(x, 2)`` then flips on the exact .xx5
boundaries these values actually land on (~1% of values!).

Fix: snap the sum to DECIMAL(38, snap) first. The FP noise (≪ the decimal
quantum) is absorbed — both engines recover the same exact decimal — then
both round it with the same half-away-from-zero rule. The result is cast
back to double so output schemas stay simple.

Use ``snap`` = the number of exact fractional digits the summed expression
has (LineTotal = price(2dp) × (1−discount)(2dp) → 4; × (1+tax)(2dp) → 6).
Only valid when the underlying values ARE exact decimals; for generic reals
(ratios, profit with a binary-inexact cost factor) use plain round with a
quantum ≫ the accumulated FP error instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_round(col: Column, out: int = 2, snap: int = 4) -> Column:
    return F.round(col.cast(f"decimal(38,{snap})"), out).cast("double")


def sql_money_round(expr: str, out: int = 2, snap: int = 4) -> str:
    return f"CAST(round(CAST({expr} AS DECIMAL(38,{snap})), {out}) AS DOUBLE)"


# Division-derived values (ratios, averages) are generic rationals, not grid
# decimals — but rationals with denominators sharing factors with 2·10^out DO
# land exactly on rounding half-boundaries, where Spark (shortest-repr
# HALF_UP) and DuckDB (scale-and-nearbyint) disagree. A +1e-9 nudge — far
# above cross-engine FP noise (~1e-13), far below the output quantum — moves
# every such rational off the boundary identically in both engines.
RATIO_EPS = 1e-9


def ratio_round(col: Column, out: int = 6) -> Column:
    return F.round(col + F.lit(RATIO_EPS), out)


def sql_ratio_round(expr: str, out: int = 6) -> str:
    return f"round(({expr}) + 1e-9, {out})"
