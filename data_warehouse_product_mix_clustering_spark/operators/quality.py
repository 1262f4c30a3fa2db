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
    """Per-column profile: rows, nulls, distincts, min/max — columnar passes.

    One independent subplan per column, unioned: each computes count /
    non-null / exact distinct / min / max over JUST that column, so the
    parquet scan prunes to a single column and the distinct count plans as
    a plain two-stage aggregate. The alternative — all ``count_distinct``s
    in one aggregation — makes Catalyst Expand every row once per distinct
    column (a |cols|× row multiplication of the full fact through one
    shuffle); on columnar storage, |cols| single-column passes read the
    same total bytes WITHOUT the blow-up and each tiny subplan runs in
    parallel within one job. min/max are stringified so heterogeneous
    column types share one output schema.
    """
    cols = columns or df.columns
    parts = []
    for c in cols:
        parts.append(
            df.select(F.col(c)).agg(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                (F.count(F.lit(1)) - F.count(F.col(c))).cast("long").alias("n_nulls"),
                F.count_distinct(F.col(c)).cast("long").alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_value"),
                F.max(F.col(c)).cast("string").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ONE definition of each row-level violation predicate — shared by the
# summary counts (check_constraints) and the quarantine split
# (write_checked), so the two can never drift (review r8 #2).
def _null_violation(c: str) -> Column:
    return F.col(c).isNull()


def _range_violation(c: str, lo: float, hi: float) -> Column:
    return F.col(c).isNotNull() & ((F.col(c) < lo) | (F.col(c) > hi))


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
        aggs.append(F.count_if(_null_violation(c)).alias(f"__v{len(names)}"))
    for c, (lo, hi) in (ranges or {}).items():
        names.append(f"range({c},[{lo},{hi}])")
        aggs.append(F.count_if(_range_violation(c, lo, hi)).alias(f"__v{len(names)}"))
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


class ConstraintViolation(ValueError):
    """Raised by ``write_checked(on_violation='abort')``; carries the
    per-constraint violation counts."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        super().__init__(f"constraint violations: {counts}")


def write_checked(
    df: DataFrame,
    table_dir: str,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    on_violation: str = "abort",
    quarantine_dir: str | None = None,
) -> tuple[int, dict[str, int]]:
    """Constraint-guarded atomic publish: validate, THEN version.

    The sink-side complement of ``check_constraints``: the batch is
    validated first and published (``sources/versioned.py::
    write_version`` — atomic marker flip, readers never see it partial)
    only according to policy. Returns (published version, per-constraint
    violation counts); version is -1 when nothing was published (the
    quarantine policy on a batch whose EVERY row violates — the previous
    version keeps serving rather than being replaced by an empty table).

    - ``on_violation='abort'``: any violation raises
      ``ConstraintViolation`` with the counts — nothing is written, the
      previously published version keeps serving (the CI-gate posture).
    - ``on_violation='quarantine'``: clean rows publish, violating rows
      land in ``quarantine_dir`` (parquet, appended) — the keep-the-
      pipeline-running posture, same philosophy as the CSV quarantine.
      A row violates if any NOT NULL column is null, any range column is
      out of bounds, or it belongs to a duplicated uniqueness key (EVERY
      row of a duplicated group quarantines — the engine cannot know
      which copy is right, so it keeps neither and the evidence holds
      both). Row conservation: published + quarantined == input.

    Cost: the summary aggregate(s) of ``check_constraints`` plus, on the
    quarantine path, one window count per uniqueness key (the same
    shuffle the duplicate COUNT needs anyway) — no extra fact scans
    beyond the write itself.
    """
    from pyspark.sql import Window

    from data_warehouse_product_mix_clustering_spark.sources.versioned import write_version

    if on_violation not in ("abort", "quarantine"):
        raise ValueError("on_violation must be 'abort' or 'quarantine'")
    if on_violation == "quarantine" and not quarantine_dir:
        raise ValueError("on_violation='quarantine' requires quarantine_dir")

    counts = {
        r["constraint"]: r["violations"]
        for r in check_constraints(df, not_null, unique, ranges).collect()
    }
    total = sum(counts.values())
    if total == 0:
        return write_version(df, table_dir), counts
    if on_violation == "abort":
        raise ConstraintViolation(counts)

    viol = F.lit(False)
    for c in not_null or []:
        viol = viol | _null_violation(c)
    for c, (lo, hi) in (ranges or {}).items():
        viol = viol | _range_violation(c, lo, hi)
    flagged = df
    for i, key in enumerate(unique or []):
        cnt = F.count(F.lit(1)).over(Window.partitionBy(*key))
        flagged = flagged.withColumn(f"__dup{i}", cnt > 1)
        viol = viol | F.col(f"__dup{i}")
    flagged = flagged.withColumn("__viol", viol)
    dup_cols = [c for c in flagged.columns if c.startswith("__dup")]
    # Both channels consume the same flagged relation — persist so the
    # batch is scanned (and its uniqueness windows run) once, not twice.
    flagged = flagged.persist()
    try:
        clean = flagged.filter(~F.col("__viol")).drop("__viol", *dup_cols)
        bad = flagged.filter(F.col("__viol")).drop("__viol", *dup_cols)
        # Quarantine lands BEFORE the publish: a crash between the two
        # re-runs the whole call, which re-appends the violators
        # (at-least-once evidence, duplicates possible on retry) but can
        # never publish unvalidated rows. Readers wanting exactly-once
        # quarantine semantics should point quarantine_dir at a
        # versioned table and publish it with write_version too.
        bad.write.mode("append").parquet(quarantine_dir)
        if clean.isEmpty():
            # Every row violated: quarantine holds the whole batch, and
            # NO version publishes — an empty publish would repoint the
            # marker at a zero-row table and silently blank downstream
            # readers (review r8 #1). This is the documented -1 path.
            return -1, counts
        return write_version(clean, table_dir), counts
    finally:
        flagged.unpersist()


def _hex_char_val(expr: str, pos: int) -> str:
    # 1-based substring position; instr/strpos of the hex alphabet is the
    # engine-portable hex-digit → int trick (same as corpus_shuffle's).
    return f"(instr('0123456789abcdef', substring({expr}, {pos}, 1)) - 1)"


def md5_prefix_int(col: Column) -> Column:
    """First 8 hex chars of md5 as a BIGINT — computed digit by digit via
    alphabet position, so DuckDB states the identical arithmetic (neither
    engine has a portable hex→int cast both sides agree on)."""
    h = F.md5(col.cast("binary"))
    # accumulate in LONG from the start — a 32-bit int overflows (ANSI
    # error) once the Horner sum passes 2^31
    out = F.lit(0).cast("long")
    for i in range(1, 9):
        out = out * 16 + (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1
        ).cast("long")
    return out


def sql_md5_prefix_int(expr: str, md5_fn: str = "md5") -> str:
    """DuckDB twin of ``md5_prefix_int`` over an already-stringified
    expression."""
    h = f"{md5_fn}({expr})"
    out = "0"
    for i in range(1, 9):
        out = f"(({out}) * 16 + {_hex_char_val(h, i)})"
    return f"CAST({out} AS BIGINT)"


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """Order-independent, partition-independent, ENGINE-portable table
    checksum: one row (n_rows, checksum).

    The replica-verification / migration-sign-off primitive: run the same
    checksum on both sides of a copy (or on the same table through two
    engines) and compare two numbers instead of two tables. Each row
    canonicalizes to ``'|'``-joined string casts of ``cols`` (NULL →
    ``'\\N'`` so NULL ≠ empty string), hashes through md5 (stable across
    engines, unlike murmur/xxhash), and the first-8-hex integer SUMS —
    addition is commutative, so partitioning, shuffle order, and file
    layout cannot move the result; a BIGINT holds ~2^31 row-hashes
    before overflow — LOUD under Spark 4's default ANSI mode (the sum
    throws rather than wrapping) and equally loud in the DuckDB twin
    (HUGEINT→BIGINT cast fails), so past ~2e9 rows route the sum
    through DECIMAL(38,0) on both sides, the corpus_fingerprint
    (plans/pipeline) formulation.
    Collision odds for a mismatch slipping through: each differing row
    pair collides with p≈2^-32; a whole-table swap is detected with
    near-certainty.
    """
    canon = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\\N")) for c in cols]
    )
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(md5_prefix_int(canon)).cast("long").alias("checksum"),
    )


def sql_table_checksum(table: str, cols: list[str]) -> str:
    """The DuckDB twin of ``table_checksum`` (one SELECT string)."""
    canon = " || '|' || ".join(
        f"coalesce(CAST({c} AS VARCHAR), '\\N')" for c in cols
    )
    return (
        f"SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(sum({sql_md5_prefix_int(f'({canon})')}) AS BIGINT) AS checksum "
        f"FROM {table}"
    )


def equivalence_probe(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    exact: list[str] | None = None,
    approx: dict[str, float] | None = None,
) -> tuple[int, bool]:
    """(n_rows, all_match) for a maintained-relation ≡ recompute check —
    THE audit equivalence primitive (one definition so tolerance and
    null-handling conventions cannot drift between audits — review r9):

    full-outer join on the null-safe ``keys`` (both sides must share
    the key and compared column names); ``exact`` columns compare
    null-safe-equal, ``approx`` columns within their per-column absolute
    tolerance (double reassociation differs by aggregation depth, so
    the tolerance is the CALLER's statement about how many rows fold
    into each value); a row present on only one side — or any NULL
    comparison — coalesces to a loud FALSE, never a silent skip.
    """
    exact = exact or []
    approx = approx or {}
    if not keys or not (exact or approx):
        raise ValueError("equivalence_probe needs keys and at least one column")
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else cond & c
    pred = None
    for c in exact:
        p = left[c].eqNullSafe(right[c])
        pred = p if pred is None else pred & p
    for c, tol in approx.items():
        # NULL-on-both-sides is a MATCH (e.g. avg over an all-NULL group —
        # maintain_summary legitimately produces it); NULL on one side only
        # still coalesces to FALSE below via the null AND/comparison.
        p = (left[c].isNull() & right[c].isNull()) | (
            F.abs(left[c] - right[c]) <= tol
        )
        pred = p if pred is None else pred & p
    row = (
        left.join(right, cond, "full_outer")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.coalesce(
                F.min(F.coalesce(pred, F.lit(False))), F.lit(False)
            ).alias("all_match"),
        )
        .first()
    )
    return row["n_rows"], bool(row["all_match"])
