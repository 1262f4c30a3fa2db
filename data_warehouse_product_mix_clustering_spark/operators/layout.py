"""Z-order (Morton-curve) data layout for multi-dimensional file pruning.

The 100 TB problem this solves: a table physically sorted on ONE column
prunes parquet files/row-groups well for predicates on that column and
not at all for any other. Interleaving the bits of several columns' grid
positions (the Morton / Z-order curve) makes files cluster in EVERY
participating dimension at once, so a 2-D box predicate overlaps only
O(perimeter) files instead of O(all) — the technique behind Delta Lake's
``OPTIMIZE ZORDER BY`` and ClickHouse's ``mortonEncode``, built here from
plain Catalyst expressions (shift/or/and — no UDF, fully codegen'd).

Two grid-mapping modes:

- ``quantile`` (default): per-column approxQuantile boundaries map values
  to ranks, so skewed distributions still spread evenly over the grid —
  the deployment mode (Delta does the same with range ids).
- ``minmax``: linear min-max scaling; cheaper (one agg instead of a
  quantile sketch), exact for uniform data, degrades under heavy skew.

Scale notes: boundary/extent computation is one sample-based pass (driver
holds ≤ 2^bits boundaries per column — bytes); the layout write is ONE
``repartitionByRange`` on the z-key (a range shuffle over the data — the
unavoidable cost of re-clustering, identical to what a 1-D sort costs)
plus a partition-local sort. Nothing driver-bound grows with data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave_bits(grid_cols: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits``-wide grid coordinates into one long.

    Bit j of column i lands at position ``j * n_cols + i`` — a static
    expression tree of shifts and ORs, evaluated in whole-stage codegen.
    """
    n = len(grid_cols)
    out = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(grid_cols):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, j * n + i))
    return out


def _hilbert_d2(x: Column, y: Column, bits: int) -> Column:
    """Distance along the 2-D Hilbert curve for ``bits``-wide grid
    coordinates — the classic iterative rotate-and-fold, expressed as an
    ``F.aggregate`` fold over the bit levels with a (x, y, d) struct
    accumulator. The fold matters: a naively UNROLLED expression tree
    re-references x/y in several branches per round and grows ~3^bits
    nodes (bits=8 OOMs the analyzer — measured); the lambda-bound
    accumulator keeps every round constant-size, so the whole key is one
    compact, fully codegen'd JVM expression. No UDF.

    Hilbert beats Morton on locality: every curve step moves to an
    ADJACENT cell (Morton's 'Z' jumps whole quadrants), so contiguous
    curve segments — which is exactly what each output file holds —
    cover tighter boxes and box queries overlap fewer files. Rotation
    logic exists for d=2 only (the d-dimensional Butz construction is
    out of scope; >2 columns use Morton).
    """
    steps = F.array(*[F.lit(1 << e).cast("long") for e in range(bits - 1, -1, -1)])
    init = F.struct(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def fold(acc: Column, s: Column) -> Column:
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        d = acc["d"] + s * s * (F.lit(3) * rx).bitwiseXOR(ry)
        flip = (ry == F.lit(0)) & (rx == F.lit(1))
        nx = F.when(flip, s - F.lit(1) - acc["x"]).otherwise(acc["x"])
        ny = F.when(flip, s - F.lit(1) - acc["y"]).otherwise(acc["y"])
        swap = ry == F.lit(0)
        return F.struct(
            F.when(swap, ny).otherwise(nx).alias("x"),
            F.when(swap, nx).otherwise(ny).alias("y"),
            d.alias("d"),
        )

    return F.aggregate(steps, init, fold, lambda acc: acc["d"])


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    mode: str = "quantile",
    curve: str = "morton",
) -> Column:
    """A space-filling-curve key Column over ``cols`` for ``df``'s value
    distribution.

    ``bits`` grid resolution per dimension (8 → 256 cells/dim; the key
    needs ``bits × len(cols)`` ≤ 63 total bits). ``mode``: 'quantile'
    (skew-resistant rank grid) or 'minmax' (linear grid) — how VALUES map
    to grid cells. ``curve``: 'morton' (bit interleave, any dimension
    count) or 'hilbert' (adjacent-step curve, tighter file boxes,
    exactly 2 columns) — how CELLS order on disk.
    """
    if not cols or len(cols) < 2:
        raise ValueError("zorder_key needs >= 2 columns (1-D layout is a plain sort)")
    if bits * len(cols) > 63:
        raise ValueError(f"bits({bits}) x cols({len(cols)}) exceeds 63 key bits")
    if curve not in ("morton", "hilbert"):
        raise ValueError(f"unknown curve: {curve!r} (use 'morton' or 'hilbert')")
    if curve == "hilbert" and len(cols) != 2:
        raise ValueError(
            "hilbert curve is implemented for exactly 2 columns; use "
            "curve='morton' for higher dimensions"
        )
    n_cells = (1 << bits) - 1
    grid_cols: list[Column] = []
    if mode == "quantile":
        # ONE sketch pass for ALL columns (approxQuantile takes the column
        # list); boundaries are tiny driver-side lists.
        probs = [i / (n_cells + 1) for i in range(1, n_cells + 1)]
        bounds_all = df.approxQuantile(cols, probs, 0.001)
        for c, bounds in zip(cols, bounds_all):
            # strictly-increasing boundary list (dedup plateaus from skew)
            uniq: list[float] = []
            for b in bounds:
                if not uniq or b > uniq[-1]:
                    uniq.append(b)
            # rank = #boundaries below the value, folded over a literal
            # boundary array with a higher-order aggregate — ONE compact
            # expression per column (a 255-term WHEN chain would blow the
            # codegen tree), still fully JVM-side.
            arr = F.array(*[F.lit(float(b)) for b in uniq])
            rank = F.aggregate(
                arr,
                F.lit(0).cast("long"),
                lambda acc, b: acc
                + F.when(F.col(c).cast("double") > b, 1).otherwise(0),
            )
            # Rescale ranks onto the FULL grid width: a low-cardinality
            # column (few distinct quantile boundaries) would otherwise
            # occupy only the bottom ranks, leaving its high Morton bits
            # constant — the curve silently degenerates to 1-D on the
            # high-cardinality column.
            grid = F.floor(rank * F.lit(n_cells) / F.lit(len(uniq))).cast("long")
            grid_cols.append(grid)
    elif mode == "minmax":
        extents = df.agg(
            *[F.min(c).alias(f"__min_{c}") for c in cols],
            *[F.max(c).alias(f"__max_{c}") for c in cols],
        ).collect()[0]
        for c in cols:
            mn, mx = extents[f"__min_{c}"], extents[f"__max_{c}"]
            if mn is None or mx is None:
                raise ValueError(
                    f"minmax z-order grid needs a non-NULL extent for {c!r}; "
                    "the column is entirely NULL (use mode='quantile' after "
                    "filtering, or drop it from the z-order key)"
                )
            lo, hi = float(mn), float(mx)
            span = (hi - lo) or 1.0
            scaled = (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(
                float(n_cells)
            )
            grid_cols.append(
                F.least(F.greatest(F.floor(scaled), F.lit(0)), F.lit(n_cells)).cast(
                    "long"
                )
            )
    else:
        raise ValueError(f"unknown mode: {mode!r} (use 'quantile' or 'minmax')")
    if curve == "hilbert":
        return _hilbert_d2(grid_cols[0], grid_cols[1], bits)
    return _interleave_bits(grid_cols, bits)


def _identity_partition_remap(spark, n: int) -> list[int]:
    """For each target partition p in [0, n): an int x with
    ``pmod(hash(x), n) == p``, so ``repartition(n, remapped)`` places
    file id p EXACTLY in shuffle partition p (Spark's HashPartitioning
    is pmod(murmur3(col), n); the DataFrame API exposes no identity
    partitioner, so we pre-solve one preimage per partition with one
    tiny deterministic job over a literal range — never the data).
    Returned as a list indexed by p."""
    remap: dict[int, int] = {}
    base = 0
    while len(remap) < n:
        got = (
            spark.range(base, base + 4096)
            .select(
                F.col("id").cast("int").alias("x"),
                F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("p"),
            )
            .collect()
        )
        for r in got:
            remap.setdefault(r["p"], r["x"])
        base += 4096
    return [remap[p] for p in range(n)]


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 8,
    mode: str = "quantile",
    curve: str = "morton",
    max_exact_cells: int = 1 << 16,
) -> None:
    """Write ``df`` re-clustered along the z-curve into ``n_files`` files
    of contiguous curve segments (each file covers a compact multi-dim
    cell — that is what footer min/max stats then prune on); a
    partition-local sort tightens row-group stats within each file.

    DETERMINISM (review r11 — a real flake): ``repartitionByRange``
    draws its boundary sample with an RDD-id-dependent seed, so two runs
    of the same layout job cut files at slightly different curve
    positions and any file-count comparison downstream (the
    zorder-pruning audit's hilbert-vs-morton row) flickers. The z-key
    has BOUNDED cardinality by construction (≤ 2^(bits·dims) grid
    cells, and ≤ |distinct rows| occupied), so when the OCCUPIED cell
    count fits ``max_exact_cells`` (default 2^16 — the full grid for
    the default 2-D bits=8 key; gated by a shuffle-free
    approx_count_distinct sketch so the fallback regime never pays the
    histogram shuffle it would discard) the writer instead computes the
    exact per-cell histogram (one small shuffle), derives exactly
    mass-balanced boundaries on the driver (bounded collect, the
    centroid-sidecar class), and assigns files with a literal-boundary
    fold — deterministic end-to-end AND better balanced than a sampled
    split. Corpora whose occupied-cell count exceeds the cap fall back
    to ``repartitionByRange`` (documented nondeterministic file cuts;
    correctness is unaffected either way — only which file a row lands
    in).
    """
    key = zorder_key(df, cols, bits, mode, curve)
    keyed = df.withColumn("__zkey", key)
    # Cheap sketch gate BEFORE the exact histogram (review r11): on a
    # corpus that will fall back anyway, paying the full groupBy shuffle
    # just to discover "too many cells" wastes a pass exactly where
    # passes are most expensive. approx_count_distinct is one scan with
    # no shuffle. The sketch is compared with 2× MARGIN (ADVICE r11): a
    # corpus at or just under the cap must not be spuriously routed to
    # the nondeterministic fallback by ±5% sketch error — the exact
    # ``len(hist) <= 2 * max_exact_cells`` check below is the hard
    # bound on the driver collect, so admitting a borderline corpus
    # here costs at most one bounded histogram pass, while rejecting
    # one reintroduces the determinism flake this path exists to fix.
    approx_cells = keyed.agg(
        F.approx_count_distinct("__zkey").alias("c")
    ).first()["c"]
    hist = (
        keyed.groupBy("__zkey")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy("__zkey")
        .collect()
        if approx_cells <= 2 * max_exact_cells
        else []
    )
    if hist and len(hist) <= 2 * max_exact_cells:
        total = sum(r["__c"] for r in hist)
        bounds: list[int] = []  # bounds[i] = last zkey of file i
        cum = 0
        target = 1
        for r in hist:
            cum += r["__c"]
            while target < n_files and cum >= target * total / n_files:
                bounds.append(int(r["__zkey"]))
                target += 1
        if bounds:
            arr = F.array(*[F.lit(b) for b in bounds])
            fid = F.aggregate(
                arr,
                F.lit(0),
                lambda acc, b: acc + F.when(F.col("__zkey") > b, 1).otherwise(0),
            )
        else:
            fid = F.lit(0)
        remap = _identity_partition_remap(keyed.sparkSession, n_files)
        pt = F.element_at(F.array(*[F.lit(x) for x in remap]), fid + 1)
        out = keyed.withColumn("__pt", pt).repartition(n_files, F.col("__pt"))
    else:
        out = keyed.repartitionByRange(n_files, "__zkey")
    (
        out.sortWithinPartitions("__zkey")
        .drop("__zkey", "__pt")
        .write.mode("overwrite")
        .parquet(path)
    )


def morton_interleave_py(coords: list[int], bits: int) -> int:
    """Pure-python twin of ``_interleave_bits`` (test oracle)."""
    out = 0
    n = len(coords)
    for j in range(bits):
        for i, v in enumerate(coords):
            out |= ((v >> j) & 1) << (j * n + i)
    return out


def hilbert_d2_py(x: int, y: int, bits: int) -> int:
    """Pure-python twin of ``_hilbert_d2`` (test oracle)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def files_overlapping_box(
    path: str, box: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(files whose footer min/max stats intersect ``box``, total files).

    The pruning proxy a test can assert on: a reader that trusts parquet
    footer statistics must open exactly the intersecting files. Uses
    pyarrow footers directly, no Spark scan. A file with MISSING stats
    for a box column counts as overlapping — a reader cannot prove it
    disjoint, so it must be opened (counting it pruned would let layout
    regressions pass vacuously).
    """
    import glob as _glob
    import os as _os

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(_os.path.join(path, "*.parquet")))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        mins: dict[str, float] = {}
        maxs: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            for ci, name in enumerate(schema_names):
                if name not in box:
                    continue
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    continue
                lo, hi = float(st.min), float(st.max)
                mins[name] = min(mins.get(name, lo), lo)
                maxs[name] = max(maxs.get(name, hi), hi)
        # prunable only when stats PROVE disjointness on some box column
        provably_disjoint = any(
            name in mins and (maxs[name] < lo or mins[name] > hi)
            for name, (lo, hi) in box.items()
        )
        if not provably_disjoint:
            hit += 1
    return hit, len(files)
