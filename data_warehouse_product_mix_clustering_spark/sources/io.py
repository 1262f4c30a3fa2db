"""Generic sources & sinks (SURVEY.md §2.1, S1-S9).

The reference's sources are ODBC SQL scans with hand-written projection
pushdown (reference src/pipelines/etl.py:19-21) and its sinks are
``to_sql(if_exists='replace')`` full-table rewrites (etl.py:102-107).
Spark-first equivalents:

- Parquet is the engine-native format (columnar, pushdown, pruning).
- CSV source/sink for the reference's cache-file surface (S4/S5).
- JSON-lines and ORC source/sink for interchange parity.
- JDBC source/sink behind an import-guard (no driver jar in this image).
- ``write_parquet_table`` is the S6 'replace table' equivalent: atomic
  overwrite, optional hash-partitioning for downstream co-located joins.
- ``read_parquet_evolving`` (schema drift) and ``compact_parquet``
  (small-file compaction) cover the operational 100 TB chores.
- ``read_csv_quarantine`` / ``read_json_quarantine``: dirty-feed
  ingestion with a malformed-row channel — one raw-text scan, split by
  projection (no PERMISSIVE cache workaround, no silent nulls/drops).
"""

from __future__ import annotations

import os
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_parquet(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV source (S4). Explicit schema preferred: inferSchema double-scans."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink (S5)."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_single_parquet_file(df: DataFrame, path: str) -> None:
    """Write ``df`` as ONE bare parquet FILE at ``path`` (not a
    directory) — the landing-file shape a file-source stream consumes
    one-per-micro-batch. Spark-side write so column types survive
    exactly (pandas.to_parquet widens float32 arrays to DOUBLE whenever
    Arrow conversion is off in the hosting session, which an explicit
    stream schema then refuses): stage a coalesce(1) directory, move the
    single part file into place, drop the staging dir. Test/audit
    utility — production sinks write partitioned directories."""
    import glob as _glob
    import shutil as _shutil

    stage = path + "__stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    _shutil.move(_glob.glob(os.path.join(stage, "part-*.parquet"))[0], path)
    _shutil.rmtree(stage, ignore_errors=True)


def write_parquet_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    buckets: tuple[int, str] | None = None,
    table_name: str | None = None,
) -> None:
    """Table sink (S6 replace / S7 append).

    ``partition_by`` gives partition pruning on the listed columns;
    ``buckets=(n, key)`` pre-shuffles so later joins/aggs on ``key``
    co-locate without a shuffle. Bucketing metadata only exists in the
    session catalog, so bucketed writes require ``table_name`` and go
    through ``saveAsTable`` (path becomes the table location).
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if buckets is not None:
        if table_name is None:
            raise ValueError("bucketed writes need table_name (catalog metadata)")
        n, key = buckets
        writer.format("parquet").option("path", path).bucketBy(
            n, key
        ).sortBy(key).saveAsTable(table_name)
        return
    writer.parquet(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    multiline: bool = False,
) -> DataFrame:
    """JSON-lines source. Explicit schema preferred: inference double-scans,
    and at 100 TB a schema drift mid-dataset silently widens columns."""
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (interchange format; parquet is the engine-native one)."""
    df.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """ORC source — same columnar pushdown/pruning contract as parquet."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written under an EVOLVING schema (columns added over
    time): ``mergeSchema`` unions the per-file footers, so old files
    surface the new columns as NULL instead of failing the scan. The merge
    reads footers only — data pages are still pruned/pushed down normally.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-file compaction (the 100 TB operational chore).

    Streaming/incremental sinks accumulate many tiny files; every reader
    then pays per-file open/footer cost and loses row-group-sized IO. This
    rewrites a dataset into ~``target_file_bytes`` files: file count is
    derived from the actual on-disk size, and an optional
    ``sortWithinPartitions`` restores clustering (better min/max pruning)
    without a global sort. Returns the output file count.

    Writes to a NEW path (atomic swap is the caller's rename) — never
    rewrite a dataset in place while readers may be scanning it.
    """
    # On-disk size via the scan's own statistics (no driver-side file walk).
    df = spark.read.parquet(path)
    size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n_files = max(1, -(-int(size) // target_file_bytes))  # ceil division
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(out_path)
    return n_files


def read_jdbc(
    spark: SparkSession,
    url: str,
    query: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """JDBC source (S1) — the reference's SQL Server extract equivalent.

    Projection/predicate pushdown happens inside the remote DBMS via the
    query string; ``partition_column`` + bounds parallelize the scan across
    executors instead of the reference's single ODBC cursor.

    No JDBC driver jar ships in this image; this raises a clear error if the
    jar is missing rather than failing deep inside py4j.
    """
    reader = spark.read.format("jdbc").option("url", url)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound/upper_bound")
        # Spark rejects 'query' combined with 'partitionColumn'; the
        # documented parallel-scan form is a dbtable subquery alias.
        # No leading underscore: standard SQL identifiers may not start
        # with one and strict DBMSs (Derby) reject it.
        reader = (
            reader.option("dbtable", f"({query}) spark_jdbc_sub")
            .option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    else:
        reader = reader.option("query", query)
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - environment-dependent
        # Only a missing driver gets the jar hint; option-validation or
        # SQL errors surface as-is instead of a misleading wrapper.
        msg = str(exc)
        if "No suitable driver" in msg or "ClassNotFoundException" in msg:
            raise RuntimeError(
                "JDBC source unavailable (driver jar not on classpath?). "
                "Add the vendor jar via spark.jars to use S1/JDBC scans."
            ) from exc
        raise


# ---------------------------------------------------------------------------
# Quarantine ingestion (round-7 second session): dirty-file reads with a
# malformed-row channel instead of silent nulls or whole-job failure.
# ---------------------------------------------------------------------------


# Optional input column carrying each line's source file. Callers that
# cache/persist the raw lines before splitting must stamp it first (a
# cached scan no longer knows its files); see split_csv_quarantine.
FILE_COL = "__src_file"


def _ddl_of(schema: T.StructType) -> str:
    # backtick-quoted: reserved words / spaces in field names stay valid DDL
    return ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)


def split_csv_quarantine(
    raw: DataFrame,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Split a raw-text-line DataFrame (column ``value``) into
    (clean typed rows, quarantined raw lines).

    The shared core of ``read_csv_quarantine`` (batch) and
    ``streaming/quarantine.py`` (whose foreachBatch hands this function a
    plain batch DataFrame per micro-batch): one parser, one
    malformedness definition for both modes. The parse itself is a pure
    projection; ``header=True`` adds a tiny per-file window over the
    header-equal lines only (see below), which is why the streaming path
    applies this inside foreachBatch rather than to the stream directly.

    Policy decisions (pinned in tests):

    - Blank / whitespace-only lines are QUARANTINED — ``from_csv`` would
      otherwise parse them into all-null "clean" rows with no corrupt
      marker, the exact silent-null failure this module exists to stop.
    - ``header=True`` drops AT MOST ONE line equal to
      ``sep.join(field names)`` per input file — the header this engine's
      own ``write_csv`` emits. Any FURTHER header-equal line (a mid-file
      paste accident, a concatenated shard) is NOT silently deleted: it
      flows on to the parser, where the schema's guaranteed non-string
      field makes it unparseable, so it lands in the quarantine — the
      "every non-header line reaches exactly one channel" conservation
      invariant holds for the whole file, not just line 1 (ADVICE r7).
      A foreign header variant (quoted, spaced, reordered) likewise lands
      in the quarantine where it is visible. For an all-string schema the
      equality rule is ambiguous (a legitimate data row could equal the
      header and would be silently deleted), so that combination is
      refused — pre-strip the header and pass ``header=False``.
      Deduplicating the header costs a second pass over the text scan
      (the window shuffles only the header-equal lines themselves, never
      the data); feeds that pre-strip headers and pass ``header=False``
      keep the single-scan plan, which is the recommended 100 TB shape.
    """
    if any(f.name == "_corrupt_record" for f in schema.fields):
        raise ValueError("schema must not already contain _corrupt_record")
    from pyspark.sql import functions as F

    if header:
        if all(isinstance(f.dataType, T.StringType) for f in schema.fields):
            raise ValueError(
                "header=True with an all-string schema is ambiguous (a data "
                "row equal to the header line would be silently dropped); "
                "strip the header upstream and pass header=False"
            )
        header_line = sep.join(f.name for f in schema.fields)
        is_hdr = F.col("value") == F.lit(header_line)
        # Drop one header-equal line per file; re-inject the rest so they
        # reach the parser (and thus the quarantine — the all-string guard
        # above guarantees at least one non-string field, so a header line
        # can never parse clean). Header-equal lines are identical strings,
        # so WHICH one is dropped cannot affect either channel's contents —
        # the row_number needs no cross-retry ordering guarantee. The
        # window's shuffle input is only the header-equal lines (O(files)),
        # not the data scan. File identity comes from a pre-stamped
        # ``FILE_COL`` when the caller provides one (the streaming path
        # MUST: it persists the batch, and input_file_name() over a cached
        # scan is empty — write_quarantine_batch stamps before persisting);
        # otherwise from input_file_name() on the live scan. An
        # unidentifiable file (literal DataFrames in tests) degrades to
        # one group per batch: at most one header dropped, the rest
        # visible in quarantine — conserved either way.
        from pyspark.sql import Window

        file_expr = (
            F.col(FILE_COL) if FILE_COL in raw.columns else F.input_file_name()
        )
        hdr_w = Window.partitionBy("__f").orderBy("__id")
        extra_hdrs = (
            raw.filter(is_hdr)
            .select(
                "value",
                file_expr.alias("__f"),
                F.monotonically_increasing_id().alias("__id"),
            )
            .withColumn("__rn", F.row_number().over(hdr_w))
            .filter(F.col("__rn") > 1)
            .select("value")
        )
        raw = raw.filter(~is_hdr).select("value").unionByName(extra_hdrs)
    parse_schema = f"{_ddl_of(schema)}, _corrupt_record string"
    options = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": "_corrupt_record",
        "sep": sep,
    }
    parsed = raw.select(
        F.col("value"), F.from_csv(F.col("value"), parse_schema, options).alias("r")
    )
    blank = F.trim(F.col("value")) == ""
    bad = blank | F.col("r._corrupt_record").isNotNull()
    clean = parsed.filter(~bad).select(
        *[F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantined = parsed.filter(bad).select(F.col("value").alias("raw_line"))
    return clean, quarantined


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV ingestion with a quarantine channel: (clean, quarantined).

    ``clean`` carries ``schema``'s columns for every parseable line;
    ``quarantined`` carries (raw_line) for every malformed one (wrong
    arity, uncastable value). The warehouse answer to dirty feeds — the
    alternative Spark modes either silently null bad fields (PERMISSIVE),
    silently drop the rows (DROPMALFORMED), or kill the whole job
    (FAILFAST); a quarantine keeps the pipeline running AND the evidence.

    Built scale-correctly: the file is read as raw text and parsed with
    ``from_csv``, so the malformed split is a plain projection over one
    scan. Filtering the DataFrameReader's ``_corrupt_record`` column
    instead would hit Spark's documented restriction (the raw-file scan
    must be cached before that column is referencable) — an O(input)
    cache this path does not need. Header lines are dropped by value
    equality, at most one per file (they are identical in every shard by
    construction; extra header-equal lines quarantine — see
    ``split_csv_quarantine``).
    """
    return split_csv_quarantine(spark.read.text(path), schema, header, sep)


def read_json_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines ingestion with a quarantine channel: (clean, quarantined).

    Same design as ``read_csv_quarantine`` (raw text + ``from_json`` —
    one scan, no cache workaround). A line is quarantined when it is not
    valid JSON; valid JSON missing declared fields yields nulls (schema
    drift is ``read_parquet_evolving``'s concern, not corruption).
    """
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    parse_schema = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    options = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"}
    parsed = raw.select(
        F.col("value"), F.from_json(F.col("value"), parse_schema, options).alias("r")
    )
    bad = F.col("r").isNull() | F.col("r._corrupt_record").isNotNull()
    clean = parsed.filter(~bad).select(
        *[F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantined = parsed.filter(bad).select(F.col("value").alias("raw_line"))
    return clean, quarantined
