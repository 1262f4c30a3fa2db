"""DSIR hashed-feature models: batch construction + incremental store.

The model side of DSIR (Xie et al. 2023 — see
plans/pipeline/dsir.py::doc_dsir_weight for the method and the determinism
contract): two bag-of-hashed-ngrams unigram models — RAW (every doc) and
TARGET (gate-passing docs) — over a feature space FIXED at
16^DSIR_HEX buckets, so each model is an exact-integer relation of at
most 4096 rows regardless of corpus size.

That fixed size is what makes the models INCREMENTALLY maintainable for
free: a batch's contribution is a ≤4096-row (bucket, Δcr, Δct) delta,
and the current model is the per-bucket SUM of all deltas — exact
integers, so the incrementally-maintained model equals the batch-built
model bit-for-bit, and every score derived from it follows (pinned by
``plans/pipeline/dsir.py::dsir_incremental_audit``). The store follows the
repo's partitioned-delta discipline (streaming/corpus_ingest.py): one
partition per ``__batch_id`` written with dynamic partition overwrite —
an at-least-once replay overwrites only its own partition (idempotent) —
and reads use an explicit schema (the r12 zero-survivor lesson: an
all-filtered batch leaves a file-less partition directory that schema
inference cannot read).

Scale: ingest is O(batch) — one (id, bucket) shuffle of the BATCH plus
two ≤4096-row aggregates; the corpus is never re-read. Model read is a
sum over ≤4096 × n_batches delta rows; when n_batches matters,
``compact_dsir_store`` folds the log back to ONE partition behind a
generation marker (maintained ≡ batch preserved exactly, replays of
folded ids turned into no-ops — pinned by
``plans/pipeline/dsir.py::dsir_compaction_audit``). Scoring a batch
against the models is one broadcast join + one per-id aggregation.

The gate that defines the TARGET slice is the CALLER's input
(``target_ids``): this module knows hashing and counting, not corpus
policy — the same separation the minhash index keeps
(operators/dedup.py:597).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.functions.numeric import ratio_round
from data_warehouse_product_mix_clustering_spark.functions.text import tokens, word_ngrams

DSIR_HEX = 3  # md5-prefix bucket key → 16^3 = 4096 hashed feature buckets
DSIR_A = 0.5  # additive smoothing (the operators/lm.py default)

BATCH_COL = "__batch_id"
_DELTAS = "model_deltas"
_DELTA_SCHEMA = "bucket string, d_cr bigint, d_ct bigint"


def feature_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, bucket, c): hashed unigram+bigram bag per document.

    One token scan exploded twice (unigrams, bigram shingles) → ONE
    (id, bucket) groupBy. The bucket key is the md5-prefix STRING,
    computed JVM-side and bit-identical in DuckDB (the fingerprint
    discipline, functions/text.py:101) — no hex→int dialect split."""
    t = docs.select(id_col, tokens(F.col(text_col)).alias("t"))
    feats = t.select(id_col, F.explode("t").alias("feat")).unionAll(
        t.select(id_col, F.explode(word_ngrams("t", 2)).alias("feat"))
    )
    return feats.groupBy(
        id_col, F.substring(F.md5("feat"), 1, DSIR_HEX).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))


def dsir_models(
    fc: DataFrame, target_ids: DataFrame, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """(rawm, tgtm): the two exact-count models from a feature relation.

    rawm = (bucket, cr) over every doc; tgtm = (bucket, ct) over the
    target slice — each ≤ 16^DSIR_HEX rows, broadcast-sized by
    construction."""
    rawm = fc.groupBy("bucket").agg(F.sum("c").cast("long").alias("cr"))
    tgtm = (
        fc.join(target_ids.select(id_col), id_col)
        .groupBy("bucket")
        .agg(F.sum("c").cast("long").alias("ct"))
    )
    return rawm, tgtm


def dsir_score(
    base: DataFrame,
    fc: DataFrame,
    rawm: DataFrame,
    tgtm: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every row of ``base`` against the models — the single
    scoring implementation shared by the batch query
    (plans/pipeline/dsir.py::doc_dsir_weight, whose adjacent DuckDB oracle
    pins these semantics) and the incremental store path.

    ``base`` carries the id plus any pass-through columns; output
    appends (n_feats, dsir_logw, dsir_logw_rate, dsir_selected). All
    distributed reductions 6-dp snapped (the determinism contract);
    docs with no features coalesce to 0/0.0/FALSE. One broadcast join
    (models) + one per-id aggregation + one id equi-join."""
    m = 16**DSIR_HEX
    nt = tgtm.agg(
        F.coalesce(F.sum("ct"), F.lit(0)).cast("double").alias("__nt")
    )
    nr = rawm.agg(F.sum("cr").cast("double").alias("__nr"))
    llr = (
        rawm.join(tgtm, "bucket", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "bucket",
            (
                F.log2(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(DSIR_A))
                    / (F.col("__nt") + F.lit(DSIR_A * m))
                )
                - F.log2(
                    (F.col("cr") + F.lit(DSIR_A))
                    / (F.col("__nr") + F.lit(DSIR_A * m))
                )
            ).alias("llr"),
        )
    )
    scored = (
        fc.join(F.broadcast(llr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            ratio_round(F.sum(F.col("c") * F.col("llr"))).alias("dsir_logw"),
            ratio_round(
                F.sum(F.col("c") * F.col("llr")) / F.sum("c")
            ).alias("dsir_logw_rate"),
        )
        .localCheckpoint(eager=True)  # read twice: the cutoff agg + the attach
    )
    cut = F.broadcast(
        scored.agg(ratio_round(F.avg("dsir_logw_rate")).alias("__mu"))
    )
    out = base.join(scored, id_col, "left").crossJoin(cut)
    return out.select(
        *base.columns,
        F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce(F.col("dsir_logw"), F.lit(0.0)).alias("dsir_logw"),
        F.coalesce(F.col("dsir_logw_rate"), F.lit(0.0)).alias("dsir_logw_rate"),
        F.coalesce(
            F.col("dsir_logw_rate") > F.col("__mu"), F.lit(False)
        ).alias("dsir_selected"),
    )


# ---------------------------------------------------------------------------
# Incremental model store
# ---------------------------------------------------------------------------


_GEN_MARKER = "_DELTA_GEN"


def _unlink_quietly_path(path: str) -> None:
    try:
        os.unlink(path)
    except OSError:
        pass


def _read_gen(store_dir: str) -> tuple[int, int]:
    """(generation, compacted_through) from the compaction marker.

    (0, -1) when no marker exists — the legacy pre-compaction layout,
    where the log lives directly in ``model_deltas`` and no batch has
    been folded. The marker is JSON written atomically (temp +
    ``os.replace``), flipped LAST by ``compact_dsir_store`` — the
    versioned-sink commit discipline (sources/versioned.py)."""
    path = os.path.join(store_dir, _GEN_MARKER)
    if not os.path.exists(path):
        return 0, -1
    import json

    with open(path, encoding="utf-8") as f:
        meta = json.load(f)
    return int(meta["gen"]), int(meta["compacted_through"])


def _deltas_dir(store_dir: str, gen: int) -> str:
    """Generation g's delta-log directory; gen 0 keeps the legacy name
    so pre-compaction stores read/write unchanged."""
    name = _DELTAS if gen == 0 else f"{_DELTAS}.g={gen}"
    return os.path.join(store_dir, name)


def ingest_dsir_batch(
    store_dir: str,
    batch_id: int,
    batch_docs: DataFrame,
    target_ids: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> bool:
    """Fold one document batch into the model store: O(batch) work, one
    ≤16^DSIR_HEX-row (bucket, d_cr, d_ct) delta partition. Replaying a
    batch_id overwrites exactly its own partition (idempotent). After a
    compaction, replaying an already-folded batch (id ≤ the marker's
    ``compacted_through``) is a NO-OP — its counts live inside the
    folded partition, so re-writing them would double-count; the marker
    check keeps at-least-once delivery safe across compactions. New
    batches must use ids ABOVE ``compacted_through`` (ingest order is
    monotone by contract — Structured Streaming's checkpoint guarantees
    it; a caller that RESTARTS ids against a compacted store, e.g. by
    pointing a fresh checkpoint at an old store dir, violates it and
    would be silently dropped here, so the skip WARNS: a one-off
    warning is a replay, a stream of them is the violation).

    Writer discipline (ADVICE r17 #1): the intended deployment is a
    SINGLE writer that both ingests and compacts in the same loop
    (streaming/dsir_ingest.py) — then ingest and compaction never
    overlap by construction. An out-of-band ``compact_dsir_store``
    (operational tooling against a live store) could still flip the
    generation marker between this function's entry and its delta
    write, stranding the delta in the superseded directory that the
    next compaction sweeps — a silently lost batch. Guarded here: the
    marker is RE-READ after the write; if the generation advanced and
    the concurrent fold did not include this batch (its
    ``compacted_through`` is below ``batch_id`` — under the monotone-id
    contract this id is the largest live one, so a fold that saw the
    delta records ``compacted_through >= batch_id``), the delta is
    re-written into the new generation's directory and re-checked.

    Returns True when the delta was written, False when the folded-id
    check skipped it."""
    gen, through = _read_gen(store_dir)
    if batch_id <= through:
        import warnings

        warnings.warn(
            f"dsir store {store_dir}: batch {batch_id} <= "
            f"compacted_through {through} — skipped as an already-folded "
            f"replay. If this is a NEW batch (checkpoint reset against a "
            f"compacted store), its data is NOT ingested; resume with ids "
            f"above {through} or start a fresh store.",
            RuntimeWarning,
            stacklevel=2,
        )
        return False
    # checkpoint: BOTH model deltas aggregate this relation — without it
    # the batch token scan runs twice per ingest (exchange reuse is not
    # guaranteed across differently-keyed aggregates)
    fc = feature_counts(batch_docs, id_col, text_col).localCheckpoint(
        eager=True
    )
    raw_d = fc.groupBy("bucket").agg(F.sum("c").cast("long").alias("d_cr"))
    tgt_d = (
        fc.join(target_ids.select(id_col), id_col)
        .groupBy("bucket")
        .agg(F.sum("c").cast("long").alias("d_ct"))
    )
    delta = raw_d.join(tgt_d, "bucket", "left").select(
        "bucket",
        "d_cr",
        F.coalesce(F.col("d_ct"), F.lit(0)).cast("long").alias("d_ct"),
    )
    for _ in range(3):
        (
            delta.withColumn(BATCH_COL, F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BATCH_COL)
            .parquet(_deltas_dir(store_dir, gen))
        )
        # Concurrent out-of-band compaction guard (docstring): re-read
        # the marker. Unchanged generation, or a fold whose
        # compacted_through covers this id (it read the delta), means
        # the write is live; otherwise the delta sits in a superseded
        # directory — re-write it into the current generation.
        new_gen, new_through = _read_gen(store_dir)
        if new_gen == gen or new_through >= batch_id:
            return True
        gen = new_gen
    raise RuntimeError(
        f"dsir store {store_dir}: batch {batch_id} delta superseded by "
        "concurrent compactions 3 times in a row — compaction is racing "
        "ingest far faster than the single-writer deployment contract "
        "allows; stop the out-of-band compactor or fold compaction into "
        "the ingest loop (streaming/dsir_ingest.py)."
    )


def read_dsir_deltas(spark: SparkSession, store_dir: str) -> DataFrame:
    """The raw delta log (current generation), explicit schema
    (empty-store / file-less partition safe)."""
    gen, _ = _read_gen(store_dir)
    path = _deltas_dir(store_dir, gen)
    if not os.path.exists(path):
        return spark.createDataFrame([], f"{_DELTA_SCHEMA}, {BATCH_COL} bigint")
    return spark.read.schema(f"{_DELTA_SCHEMA}, {BATCH_COL} bigint").parquet(
        path
    )


def compact_dsir_store(spark: SparkSession, store_dir: str) -> dict:
    """Fold the whole delta log into ONE partition — the compaction the
    module docstring promises ("compactable by rewriting as one batch").
    Model reads sum ≤4096 × n_batches delta rows; a store ingesting for
    months accumulates n_batches without bound, and with it footer-read
    fan-out and planning overhead — the same operational decay
    ``sources/versioned.py::compact_table`` exists for.

    Commit discipline (marker-safe, the versioned-sink shape): the
    folded ≤16^DSIR_HEX-row relation lands INVISIBLY in the next
    generation's directory (``model_deltas.g=N``), and the
    ``_DELTA_GEN`` marker flips last via atomic ``os.replace`` — a
    reader resolves the marker first, so it sees the old log or the
    new, never a double-counting union and never a half-written one.
    Crash before the flip: the orphan directory is overwritten by the
    next compaction attempt; the live log is untouched.

    Retention (the vacuum discipline, sources/versioned.py): the
    superseded generation is NOT deleted at flip time — Spark readers
    resolve the marker at PLAN time but read files at ACTION time, so
    deleting immediately would crash any in-flight job planned against
    the old log. Each compaction instead sweeps generations older than
    the PREVIOUS one (current−1 is retained), so a lazy reader must
    reach its action within ONE compaction interval of planning
    (ADVICE r17 #2: at the ``compact_every=2`` cadence the shipped
    audits and sink use, that interval is two micro-batches — a plan
    held across more than that must ``collect``/``localCheckpoint``
    first, or the store must be compacted on a coarser cadence sized
    to its slowest reader). Stale marker temp files from crashed flips
    are swept on the same pass.

    The folded partition keeps ``__batch_id = max(folded ids)`` and the
    marker records ``compacted_through`` = that id: per-bucket integer
    sums are associative, so the post-compaction models equal the
    pre-compaction models EXACTLY (the maintained ≡ batch contract
    transfers through the fold), and ``ingest_dsir_batch`` turns
    replays of folded ids into no-ops instead of double-counts.

    O(log) work: one read of the ≤4096 × n_batches-row log, one
    per-bucket sum, one ≤4096-row single-file write — the corpus is
    never touched. Returns {'gen', 'compacted_through',
    'partitions_before', 'rows_after', 'noop'}."""
    import json
    import shutil
    import tempfile

    gen, through = _read_gen(store_dir)
    # Sweep everything the marker doesn't reference EXCEPT the previous
    # generation (retained for in-flight lazy readers — docstring) plus
    # marker temp files from crashed flips. The marker is the single
    # source of truth; anything older than current−1 is garbage from a
    # crash window or a superseded fold.
    keep = {_deltas_dir(store_dir, g) for g in (gen, gen - 1) if g >= 0}
    for entry in os.listdir(store_dir):
        full = os.path.join(store_dir, entry)
        is_gen_dir = entry == _DELTAS or entry.startswith(f"{_DELTAS}.g=")
        if is_gen_dir and full not in keep:
            shutil.rmtree(full, ignore_errors=True)
        elif entry.startswith("._gen_tmp_"):
            _unlink_quietly_path(full)
    log = read_dsir_deltas(spark, store_dir)
    ids = [r[BATCH_COL] for r in log.select(BATCH_COL).distinct().collect()]
    if len(ids) <= 1:  # nothing to fold (empty store or already compact)
        return {
            "gen": gen,
            "compacted_through": through,
            "partitions_before": len(ids),
            "rows_after": None,
            "noop": True,
        }
    max_id = max(ids)
    folded = (
        log.groupBy("bucket")
        .agg(
            F.sum("d_cr").cast("long").alias("d_cr"),
            F.sum("d_ct").cast("long").alias("d_ct"),
        )
        .withColumn(BATCH_COL, F.lit(max_id))
        .coalesce(1)  # ≤16^DSIR_HEX rows — one file by construction
    )
    new_gen = gen + 1
    new_dir = _deltas_dir(store_dir, new_gen)  # swept above if a crash orphan
    folded.write.mode("overwrite").partitionBy(BATCH_COL).parquet(new_dir)
    n_rows = (
        spark.read.schema(f"{_DELTA_SCHEMA}, {BATCH_COL} bigint")
        .parquet(new_dir)
        .count()
    )
    # marker flips LAST, atomically — the publish point
    fd, tmp = tempfile.mkstemp(dir=store_dir, prefix="._gen_tmp_")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        json.dump({"gen": new_gen, "compacted_through": int(max_id)}, f)
    os.replace(tmp, os.path.join(store_dir, _GEN_MARKER))
    # The superseded generation (now current−1) is retained for
    # in-flight readers; the NEXT compaction's sweep removes it.
    return {
        "gen": new_gen,
        "compacted_through": int(max_id),
        "partitions_before": len(ids),
        "rows_after": int(n_rows),
        "noop": False,
    }


def read_dsir_models(
    spark: SparkSession, store_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(rawm, tgtm) from the delta log alone — per-bucket integer sums,
    so equality with the batch-built models is exact. tgtm keeps only
    ct > 0 buckets, matching ``dsir_models``'s inner-join shape."""
    agg = read_dsir_deltas(spark, store_dir).groupBy("bucket").agg(
        F.sum("d_cr").cast("long").alias("cr"),
        F.sum("d_ct").cast("long").alias("ct"),
    )
    rawm = agg.select("bucket", "cr")
    tgtm = agg.filter(F.col("ct") > 0).select("bucket", "ct")
    return rawm, tgtm
