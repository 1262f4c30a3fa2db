"""Streaming semantic-dedup corpus ingestion.

The continuous-ingestion loop an embedding corpus actually runs: a
file-source stream over a landing directory of embedding batches, each
micro-batch semantically deduped against the CORPUS-SO-FAR (the seed
corpus plus every earlier batch's survivors) with
``operators/similarity.py::semantic_dedup_incremental``, survivors
appended. The coarse codebook is fit ONCE on the seed corpus and frozen
for every batch — refitting per batch would cost a full corpus k-means
per micro-batch and reshuffle cell identities under already-ingested
rows (the same frozen-centers invariant the persisted IVF index's CDC
maintenance holds).

Idempotence discipline (the quarantine sink's, review r8): foreachBatch
is at-least-once, so survivors land partitioned by ``__batch_id`` with
dynamic partition overwrite, and the sink reads the corpus restricted
to STRICTLY EARLIER batch partitions — an uncommitted batch's replay
therefore sees exactly the corpus prefix its first attempt saw (its own
possibly-torn partition is excluded; later batches cannot have
committed before it under availableNow's sequential batches), recomputes
the same survivors, and overwrites its own partition with the same
rows. The checkpoint makes committed batches never replay, so a rerun
with no new files appends nothing.

Scale: each micro-batch pays one batch-assign (broadcast centers), one
broadcast semi-join pruning the corpus to touched cells, and one
batch-bounded pair join — never a corpus self-join, never a refit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EMBEDDING_SCHEMA = "vec_id bigint, embedding array<float>"

# Seed-regime marker (review r13, VERDICT r12 #7): every (re-)seed bumps
# this counter; an ingest checkpoint records the epoch it was created
# under and REFUSES to run against a different one — a reused checkpoint
# after a re-seed would silently skip landing files ingested under the
# old regime (its offsets say "seen") while the corpus they fed is gone.
SEED_EPOCH_FILE = "seed_epoch.json"
_CKPT_EPOCH_FILE = "ingest_seed_epoch.json"


def seed_epoch(corpus_dir: str) -> int:
    """Current seed regime of ``corpus_dir`` (0 = never seeded / legacy
    corpus seeded before epochs existed)."""
    import json

    path = os.path.join(corpus_dir, SEED_EPOCH_FILE)
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        return int(json.load(f))


def _write_json_atomic(path: str, value) -> None:
    import json

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(value, f)
    os.replace(tmp, path)  # atomic: readers never see a torn marker


def seed_corpus(spark: SparkSession, corpus_dir: str, seed_df: DataFrame) -> None:
    """Write the initial corpus relation (vec_id, embedding) the ingest
    loop grows. Overwrite: seeding is a one-time bootstrap. RE-seeding
    first drops EVERYTHING derived from the old seed — the persisted
    codebook sidecars AND the survivors partitions — because both are
    exactly as stale as the codebook (survivors were admitted under the
    old seed's dedup decisions; the advisor-memo rule again: a derived
    decision never outlives the data it was measured from). The
    derived-state removal runs BEFORE the seed write (the mv.py
    two-phase discipline): a crash between the two steps leaves a loud
    refit/empty-corpus state, never a new seed silently paired with the
    old codebook or old survivors. The ingest CHECKPOINT is caller-owned;
    a reused checkpoint would skip landing files that were ingested
    under the old regime, so the SEED EPOCH bumps FIRST (before any
    removal — a crash anywhere after the bump leaves every stale
    checkpoint refusing loudly, never a new seed silently paired with
    old stream offsets) and ``streaming_semantic_ingest`` validates its
    checkpoint's recorded epoch against it."""
    import glob
    import shutil

    os.makedirs(corpus_dir, exist_ok=True)
    _write_json_atomic(
        os.path.join(corpus_dir, SEED_EPOCH_FILE), seed_epoch(corpus_dir) + 1
    )
    for sidecar in glob.glob(os.path.join(corpus_dir, "centers_*.json")):
        os.remove(sidecar)
    shutil.rmtree(os.path.join(corpus_dir, "survivors"), ignore_errors=True)
    seed_df.select("vec_id", "embedding").write.mode("overwrite").parquet(
        os.path.join(corpus_dir, "seed")
    )


def read_corpus(
    spark: SparkSession, corpus_dir: str, before_batch: int | None = None
) -> DataFrame:
    """Corpus-so-far: the seed plus ingested batches' survivors.

    ``before_batch``: the ingest sink MUST pass its own batch_id so it
    sees only STRICTLY EARLIER batches (review r12: reading everything
    meant an at-least-once replay of batch N read batch N's own
    previously-written partition back as "corpus", deduped every
    replayed row against its own prior copy, and — after a torn write
    that left a partial partition — permanently dropped the missing
    survivors). availableNow batches commit sequentially, so partitions
    ≥ the replaying batch's id can only be its own torn output, never a
    later batch's. Readers outside the sink omit it (None = all)."""
    from data_warehouse_product_mix_clustering_spark.streaming.quarantine import BATCH_COL

    seed = spark.read.schema(EMBEDDING_SCHEMA).parquet(
        os.path.join(corpus_dir, "seed")
    ).select("vec_id", "embedding")
    survivors_dir = os.path.join(corpus_dir, "survivors")
    if not os.path.exists(survivors_dir):
        return seed
    # Explicit schema (advice r12): a micro-batch whose rows were ALL
    # duplicates writes zero files, leaving survivors/ with only a
    # _SUCCESS marker; schema inference would fail on that file-less
    # directory and wedge every later batch and replay. With the schema
    # stated, Spark returns an empty relation instead (the partition
    # column rides the directory names when partitions do exist).
    survivors = spark.read.schema(
        f"{EMBEDDING_SCHEMA}, {BATCH_COL} bigint"
    ).parquet(survivors_dir)
    if before_batch is not None:
        survivors = survivors.filter(F.col(BATCH_COL) < before_batch)
    return seed.unionByName(survivors.select("vec_id", "embedding"))


def _load_or_fit_centers(
    spark: SparkSession, corpus_dir: str, nlist: int, seed: int
) -> list[tuple[int, list[float]]]:
    """The FROZEN codebook, persisted: fit once on the seed corpus and
    written as a JSON sidecar keyed by (nlist, seed); every later run
    loads it (review r12: the first cut refit the seed k-means on EVERY
    invocation — a multi-second cost even for a no-new-files rerun —
    and froze the centers only by the accident of seeded-KMeans
    determinism over identical seed data, not by actually persisting
    them). Python float repr round-trips exactly through JSON, so the
    loaded centers reproduce assignments bit-for-bit."""
    import json

    from data_warehouse_product_mix_clustering_spark.operators.similarity import fit_ivf_codebook

    sidecar = os.path.join(corpus_dir, f"centers_nlist{nlist}_seed{seed}.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return [(int(i), [float(x) for x in v]) for i, v in json.load(f)]
    model, _ = fit_ivf_codebook(
        spark.read.schema(EMBEDDING_SCHEMA).parquet(
            os.path.join(corpus_dir, "seed")
        ),
        "vec_id",
        "embedding",
        nlist,
        seed,
    )
    centers = [
        (i, [float(x) for x in ctr])
        for i, ctr in enumerate(model.clusterCenters())
    ]
    tmp = sidecar + ".tmp"
    with open(tmp, "w") as f:
        json.dump(centers, f)
    os.replace(tmp, sidecar)  # atomic: readers never see a torn sidecar
    return centers


def streaming_semantic_ingest(
    spark: SparkSession,
    landing_dir: str,
    corpus_dir: str,
    checkpoint_dir: str,
    nlist: int = 8,
    threshold: float = 0.95,
    seed: int = 42,
    timeout_sec: int = 300,
) -> int:
    """One availableNow ingest run: every unseen landing file's rows are
    semantically deduped against the corpus-so-far and the survivors
    appended under ``corpus_dir/survivors/__batch_id=N``. Returns the
    number of micro-batches executed (0 = checkpoint says nothing new).

    The codebook is fit on the SEED corpus only (frozen thereafter);
    batches and the grown corpus both assign through the same frozen
    ``assign_to_centers`` expression, so a row's cell never changes
    after ingestion."""
    import json

    from data_warehouse_product_mix_clustering_spark.operators.similarity import semantic_dedup_incremental
    from data_warehouse_product_mix_clustering_spark.streaming.quarantine import BATCH_COL
    from data_warehouse_product_mix_clustering_spark.streaming.runner import run_available_now

    # Seed-regime gate (review r13): a checkpoint carries the epoch it
    # was created under; running it against a re-seeded corpus would
    # silently under-ingest (offsets mark old-regime files as seen), so
    # mismatch refuses loudly — the torn-state discipline the versioned
    # sink and MV refresh follow. Pre-epoch checkpoints (marker absent
    # but offsets present) are grandfathered onto the current epoch.
    epoch = seed_epoch(corpus_dir)
    marker = os.path.join(checkpoint_dir, _CKPT_EPOCH_FILE)
    if os.path.exists(marker):
        with open(marker) as f:
            recorded = int(json.load(f))
        if recorded != epoch:
            raise RuntimeError(
                f"ingest checkpoint {checkpoint_dir!r} was created under "
                f"seed epoch {recorded} but {corpus_dir!r} is at epoch "
                f"{epoch}: the corpus was re-seeded. Use a FRESH "
                "checkpoint directory — replaying this one would skip "
                "landing files ingested under the old regime."
            )
    else:
        os.makedirs(checkpoint_dir, exist_ok=True)
        _write_json_atomic(marker, epoch)

    centers = _load_or_fit_centers(spark, corpus_dir, nlist, seed)
    survivors_dir = os.path.join(corpus_dir, "survivors")

    stream = (
        spark.readStream.schema(EMBEDDING_SCHEMA)
        # one landing file per micro-batch: each file dedups against a
        # corpus that includes every EARLIER file's survivors, which is
        # the sequential-ingest semantics the python twin tests pin
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # strictly-earlier batches only: a replay must not dedup its
        # rows against its own torn partition (read_corpus docstring)
        corpus = read_corpus(spark, corpus_dir, before_batch=batch_id)
        survivors = semantic_dedup_incremental(
            batch_df,
            corpus,
            nlist=nlist,
            threshold=threshold,
            seed=seed,
            centers=centers,
        )
        enriched = (
            batch_df.join(survivors.select("vec_id"), "vec_id", "left_semi")
            .withColumn(BATCH_COL, F.lit(batch_id))
        )
        (
            enriched.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(BATCH_COL)
            .parquet(survivors_dir)
        )

    return run_available_now(stream, sink, checkpoint_dir, timeout_sec)
