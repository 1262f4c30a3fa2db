"""Deterministic dataset splitting by content hash.

The standard mechanism for train/val/test splits at 100 TB: assignment is
a pure function of a stable key's md5 — no RNG, no seed plumbing, no
shuffle. The same document lands in the same split on every engine, every
run, every re-partition, and adding data never moves existing rows
between splits. Boundaries are hex-string thresholds on the md5 prefix
(lexicographic order == numeric order for fixed-length lowercase hex), so
the exact same rule is expressible in any SQL engine for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX_LEN = 6  # 16^6 buckets: granularity 6e-8, plenty for split ratios


def split_boundaries(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """(split_name, upper-bound hex prefix) pairs, cumulative order.

    The last split's bound is the sentinel 'g' (sorts after every hex
    string) so every row is covered; fractions must sum to 1 (±1e-9).
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out = []
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        # A cumulative fraction reaching 1.0 BEFORE the last split (e.g.
        # a trailing zero-fraction split) would format as 7 hex chars
        # ('1000000'), breaking the fixed-width lexicographic invariant
        # and routing half the rows past it (review r8). 'g' sorts after
        # every hex string, so it is the correct "covers everything"
        # sentinel; intermediate bounds clamp there.
        raw = int(acc * (16**_PREFIX_LEN))
        bound = (
            "g" if raw >= 16**_PREFIX_LEN else format(raw, f"0{_PREFIX_LEN}x")
        )
        out.append((name, bound))
    out.append((names[-1], "g"))
    return out


def split_column(key: Column, fractions: dict[str, float]) -> Column:
    """CASE expression assigning a split name from md5(key)'s prefix."""
    prefix = F.substring(F.md5(key.cast("string")), 1, _PREFIX_LEN)
    bounds = split_boundaries(fractions)
    expr = None
    for name, bound in bounds[:-1]:
        cond = prefix < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = bounds[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(last)


def sql_split_column(key_expr: str, fractions: dict[str, float]) -> str:
    """The identical CASE in portable SQL (DuckDB oracle mirror)."""
    prefix = f"substr(md5(CAST({key_expr} AS VARCHAR)), 1, {_PREFIX_LEN})"
    bounds = split_boundaries(fractions)
    whens = "\n".join(
        f"WHEN {prefix} < '{bound}' THEN '{name}'" for name, bound in bounds[:-1]
    )
    return f"CASE {whens} ELSE '{bounds[-1][0]}' END"


def hash_split(
    df: DataFrame, key_col: str, fractions: dict[str, float], out_col: str = "split"
) -> DataFrame:
    """Append the deterministic split assignment column."""
    return df.withColumn(out_col, split_column(F.col(key_col), fractions))
