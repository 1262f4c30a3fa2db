"""Reproducibility and ingest observability: the corpus fingerprint,
the training-recipe manifest audit, the streaming gated-corpus ingest
audit, and the per-source attrition waterfall.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.functions.text import (
    sql_bpe_tokens,
    sql_fingerprint,
    sql_quality_score,
    sql_tokens,
    quality_score,
    tokens,
)
from data_warehouse_product_mix_clustering_spark.plans.registry import register
from data_warehouse_product_mix_clustering_spark.sources.registry import table
from data_warehouse_product_mix_clustering_spark.plans.pipeline.corpus import (
    source_mixture_weights,
)


# ---------------------------------------------------------------------------
# Training-data recipe manifest: the reproducibility receipt a corpus job
# publishes next to its tensors — which knobs produced WHICH corpus, with a
# fingerprint a rebuild can be held to.
# ---------------------------------------------------------------------------


def corpus_fingerprint(df: DataFrame) -> tuple[int, int, int]:
    """Order-independent exact fingerprint of a gated corpus relation:
    (n_docs, Σ int(md5(doc_id)[:12], 16), Σ n_tokens). Exact integer sums
    (the hash sum rides DECIMAL(38,0) — a BIGINT sum of 48-bit values
    overflows, and ANSI mode throws, past ~30k worst-case docs) —
    commutative, so partitioning/ordering cannot move it, and exact, so
    equality means equality (no float tolerance). The same shape as
    ``lineitem_replica_checksum``'s content hash, reduced to the id+size
    surface a recipe manifest needs. Collision scope: a 48-bit hash sum
    over documents — adversarial collisions are out of scope (this is a
    reproducibility receipt, not an integrity MAC)."""
    row = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        # DECIMAL(28,0) per row → DECIMAL(38,0) sum: a LONG sum of 48-bit
        # values overflows (and, under Spark 4's default ANSI mode,
        # THROWS) past ~30k worst-case docs; the decimal sum is exact to
        # ~3e23 docs (review r13 — the 100 TB posture audit caught it)
        F.sum(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
            .cast("decimal(28,0)")
        ).alias("h"),
        F.sum("n_tokens").cast("long").alias("t"),
    ).first()
    return (int(row["n"]), int(row["h"] or 0), int(row["t"] or 0))


@register(
    "training_recipe_manifest_audit",
    oracle="""
        SELECT TRUE AS manifest_roundtrip, TRUE AS rebuild_matches,
               TRUE AS tamper_detected, TRUE AS fingerprint_order_free
    """,
)
def training_recipe_manifest_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible-recipe contract: the gated training corpus
    (plans/text.py::gated_corpus — the SAME parameterized pipeline the
    registered ``training_corpus`` binds) is built, its recipe knobs
    (lang, quality_min, token budget) and exact corpus fingerprint are
    persisted as a manifest JSON, and the audit attests:

    - ``manifest_roundtrip``: the persisted knobs read back exactly
      (atomic write, the seed-epoch marker discipline);
    - ``rebuild_matches``: rebuilding the corpus FROM the manifest's
      knobs reproduces the fingerprint bit-for-bit — the claim a
      training run replays on (data + recipe ⇒ corpus);
    - ``tamper_detected``: a manifest with a drifted knob
      (quality_min + 0.1 — measured to bite: 116→9 docs at sf0.001,
      135→10 at sf0.01) rebuilds to a DIFFERENT fingerprint — the
      receipt actually discriminates recipes;
    - ``fingerprint_order_free``: the fingerprint is invariant under
      repartitioning (commutative exact sums — recomputed on a
      shuffled layout).

    Bounds: fingerprints are 3-scalar aggregates (nothing driver-side
    beyond them); the manifest is O(knobs) JSON. Pre-staged for r14."""
    import json
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.plans.text import (
        CORPUS_LANG,
        QUALITY_MIN,
        TOKEN_BUDGET,
        gated_corpus,
    )

    recipe = {
        "lang": CORPUS_LANG,
        "quality_min": QUALITY_MIN,
        "tok_lo": TOKEN_BUDGET[0],
        "tok_hi": TOKEN_BUDGET[1],
    }
    built = gated_corpus(spark, sf_dir, **recipe)
    fp = corpus_fingerprint(built)

    root = tempfile.mkdtemp(prefix="spark_graft_recipe_manifest_")
    try:
        path = os.path.join(root, "manifest.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"recipe": recipe, "fingerprint": list(fp)}, f)
        os.replace(tmp, path)  # atomic: readers never see a torn manifest
        with open(path) as f:
            loaded = json.load(f)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    manifest_roundtrip = (
        loaded["recipe"] == recipe and tuple(loaded["fingerprint"]) == fp
    )
    rebuilt = gated_corpus(spark, sf_dir, **loaded["recipe"])
    rebuild_matches = corpus_fingerprint(rebuilt) == fp
    tampered = dict(loaded["recipe"], quality_min=loaded["recipe"]["quality_min"] + 0.1)
    tamper_detected = corpus_fingerprint(gated_corpus(spark, sf_dir, **tampered)) != fp
    fingerprint_order_free = (
        corpus_fingerprint(built.repartition(7, "n_tokens")) == fp
    )
    return spark.createDataFrame(
        [(manifest_roundtrip, rebuild_matches, tamper_detected, fingerprint_order_free)],
        "manifest_roundtrip boolean, rebuild_matches boolean, "
        "tamper_detected boolean, fingerprint_order_free boolean",
    )


@register(
    "stream_gated_corpus_audit",
    oracle="""
        SELECT TRUE AS matches_batch, TRUE AS waterfall_consistent,
               TRUE AS by_source_consistent, TRUE AS mixture_matches_batch,
               TRUE AS rerun_is_noop, TRUE AS replay_idempotent,
               TRUE AS dedup_bites
    """,
)
def stream_gated_corpus_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end contract audit for the streaming gated-corpus
    ingestion (streaming/corpus_ingest.py) — the `stream_quarantine_audit`
    mold. A documents-derived landing feed (two doc_id-ordered slices;
    the second re-ingests a slice-1 text under a new id, guaranteeing an
    exact cross-batch duplicate) runs through one availableNow ingest,
    and the audit attests:

    - ``matches_batch``: the streamed survivor relation equals the batch
      ``gated_corpus`` over the documents table EXACTLY — (doc_id, lang,
      n_tokens, quality_score) tuples; the injected duplicate must NOT
      surface (its fingerprint was seen in batch 1 — the seen-store's
      reason to exist);
    - ``waterfall_consistent``: the incrementally-summed gate log equals
      the batch stage counts computed over the union input in one pass
      here — per-gate attrition survives batching;
    - ``by_source_consistent``: the log's per-SOURCE regroup
      (``read_gate_waterfall_by_source``) equals the per-source batch
      truth — the streamed twin of ``corpus_filter_waterfall_by_source``
      holds, source by source, stage by stage;
    - ``mixture_matches_batch``: the mixture derived from the
      incrementally-maintained log alone (``read_source_mixture``, zero
      corpus re-scan) equals the registered ``source_mixture_weights``
      over the documents table EXACTLY — the deduped union IS the
      document relation (first-arrival ≡ keep-lowest on ordered slices),
      so per-source token sums and the derived shares/weights agree to
      the bit;
    - ``rerun_is_noop``: a second availableNow run executes ZERO batches
      and leaves survivors AND waterfall identical;
    - ``replay_idempotent``: re-invoking batch 1's sink verbatim (the
      at-least-once shape) changes nothing — strictly-earlier reads +
      own-partition overwrite;
    - ``dedup_bites``: the cross-batch duplicate was dropped at the
      dedup stage (deduped < ingested in the summed log).

    Ground truth collects the survivor relation (≤ gated-corpus size at
    audit SFs — the bounded-audit convention)."""
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.functions.text import (
        bpe_tokens,
        fingerprint,
        quality_score,
        tokens,
    )
    from data_warehouse_product_mix_clustering_spark.plans.text import (
        CORPUS_LANG,
        QUALITY_MIN,
        TOKEN_BUDGET,
        gated_corpus,
    )
    from data_warehouse_product_mix_clustering_spark.streaming.corpus_ingest import (
        gated_ingest_batch,
        read_gate_waterfall,
        read_gate_waterfall_by_source,
        read_gated_corpus,
        read_source_mixture,
        streaming_gated_ingest,
        DOC_SCHEMA,
        GATE_STAGES,
    )
    from pyspark.sql import Window

    recipe = dict(
        lang=CORPUS_LANG,
        quality_min=QUALITY_MIN,
        tok_lo=TOKEN_BUDGET[0],
        tok_hi=TOKEN_BUDGET[1],
    )
    docs = table(spark, "documents", sf_dir).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    b1 = docs.filter(F.col("doc_id") < 250)
    # cross-batch exact duplicate: slice-1's lowest-id text under a new id
    reingest = (
        b1.orderBy("doc_id")
        .limit(1)
        .select(
            (F.col("doc_id") + 90000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    )
    b2 = docs.filter(F.col("doc_id") >= 250).unionByName(reingest)

    root = tempfile.mkdtemp(prefix="spark_graft_gated_ingest_")
    try:
        corpus_dir = os.path.join(root, "corpus")
        landing = os.path.join(root, "landing")
        ckpt = os.path.join(root, "ckpt")
        os.makedirs(landing)
        f1 = os.path.join(landing, "b1.parquet")
        f2 = os.path.join(landing, "b2.parquet")

        from data_warehouse_product_mix_clustering_spark.sources.io import write_single_parquet_file

        write_single_parquet_file(b1, f1)
        write_single_parquet_file(b2, f2)
        now = os.path.getmtime(f2)
        os.utime(f1, (now - 10, now - 10))
        n = streaming_gated_ingest(
            spark, landing, corpus_dir, ckpt, **recipe
        )

        def survivors_set():
            return {
                (r["doc_id"], r["lang"], r["n_tokens"], r["quality_score"])
                for r in read_gated_corpus(spark, corpus_dir).collect()
            }

        def waterfall_map():
            return {
                r["stage"]: (r["stage_order"], r["n_docs"])
                for r in read_gate_waterfall(spark, corpus_dir).collect()
            }

        got = survivors_set()
        want = {
            (r["doc_id"], r["lang"], r["n_tokens"], r["quality_score"])
            for r in gated_corpus(spark, sf_dir).collect()
        }
        matches_batch = n == 2 and got == want

        # batch-truth stage counts over the union input — cumulative
        # flags with source carried, so the scalar AND per-source
        # truths come from ONE staged relation
        union = b1.unionByName(b2)
        w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
        kept = (
            union.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
        )
        tflags = (
            kept.select(
                "doc_id", "lang", "source",
                tokens(F.col("text")).alias("t"),
                bpe_tokens(F.col("text")).alias("bt"),
            )
            .select(
                "source",
                (F.size("t") > 0).alias("f_tok"),
                F.size("bt").cast("long").alias("__nt"),
                quality_score(F.col("t")).alias("__q"),
                "lang",
            )
            .select(
                "source", "f_tok", "__nt",
                (F.col("f_tok") & (F.col("lang") == recipe["lang"])).alias("f_lang"),
                "__q",
            )
            .select(
                "source", "f_tok", "__nt", "f_lang",
                (F.col("f_lang") & (F.col("__q") >= recipe["quality_min"])).alias("f_qual"),
            )
            .select(
                "source", "f_tok", "f_lang", "f_qual",
                (
                    F.col("f_qual")
                    & F.col("__nt").between(recipe["tok_lo"], recipe["tok_hi"])
                ).alias("f_keep"),
            )
            # LAZY (r19): the one consumer (truth_src's per-source agg)
            # computes every partition, so the checkpoint materializes
            # inside that job instead of paying its own eager job first.
            .localCheckpoint(eager=False)
        )

        def _nf(flag: str):
            return F.sum(F.when(F.col(flag), 1).otherwise(0)).cast("long")

        truth_src = (
            union.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("c_in"))
            .join(
                tflags.groupBy("source").agg(
                    F.count(F.lit(1)).cast("long").alias("c_dedup"),
                    _nf("f_tok").alias("c_tok"),
                    _nf("f_lang").alias("c_lang"),
                    _nf("f_qual").alias("c_qual"),
                    _nf("f_keep").alias("c_keep"),
                ),
                "source",
                "full_outer",
            )
            .fillna(0)
            .collect()  # ≤ |sources| rows
        )
        stage_cols = ["c_in", "c_dedup", "c_tok", "c_lang", "c_qual", "c_keep"]
        want_by_src = {
            (r["source"], stage, i): int(r[c])
            for r in truth_src
            for i, (stage, c) in enumerate(zip(GATE_STAGES, stage_cols))
        }
        got_by_src = {
            (r["source"], r["stage"], r["stage_order"]): r["n_docs"]
            for r in read_gate_waterfall_by_source(spark, corpus_dir).collect()
        }
        by_source_consistent = got_by_src == want_by_src

        # mixture from the log alone ≡ the registered batch mixture
        # (both dimension-sized collects)
        def _mix_set(df):
            return {
                (
                    r["source"], r["n_docs"], r["total_tokens"],
                    r["observed_share"], r["uniform_weight"],
                )
                for r in df.collect()
            }

        mixture_matches_batch = _mix_set(
            read_source_mixture(spark, corpus_dir)
        ) == _mix_set(source_mixture_weights(spark, sf_dir))
        truth_counts = [
            sum(v for (src, st, i), v in want_by_src.items() if st == stage)
            for stage in GATE_STAGES
        ]
        wf = waterfall_map()
        waterfall_consistent = wf == {
            s: (i, c) for i, (s, c) in enumerate(zip(GATE_STAGES, truth_counts))
        }
        dedup_bites = wf["deduped"][1] < wf["ingested"][1]

        n2 = streaming_gated_ingest(
            spark, landing, corpus_dir, ckpt, **recipe
        )
        rerun_is_noop = n2 == 0 and survivors_set() == got and waterfall_map() == wf

        b2_w = spark.read.schema(DOC_SCHEMA).parquet(f2)
        gated_ingest_batch(spark, b2_w, 1, corpus_dir, **recipe)
        replay_idempotent = survivors_set() == got and waterfall_map() == wf
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                matches_batch,
                waterfall_consistent,
                by_source_consistent,
                mixture_matches_batch,
                rerun_is_noop,
                replay_idempotent,
                dedup_bites,
            )
        ],
        "matches_batch boolean, waterfall_consistent boolean, "
        "by_source_consistent boolean, mixture_matches_batch boolean, "
        "rerun_is_noop boolean, replay_idempotent boolean, "
        "dedup_bites boolean",
    )


def _waterfall_by_source_oracle() -> str:
    from data_warehouse_product_mix_clustering_spark.functions.text import (
        sql_fingerprint,
        sql_quality_score,
    )
    from data_warehouse_product_mix_clustering_spark.plans.text import (
        CORPUS_LANG,
        QUALITY_MIN,
        TOKEN_BUDGET,
    )

    return f"""
        WITH keep AS (
            SELECT doc_id, lang, source, text,
                   row_number() OVER (PARTITION BY {sql_fingerprint("text")}
                                      ORDER BY doc_id) AS rn
            FROM documents
        ), flagged AS (
            SELECT source, (rn = 1) AS f_dedup,
                   (rn = 1 AND len(t) > 0) AS f_tok,
                   (rn = 1 AND len(t) > 0 AND lang = '{CORPUS_LANG}') AS f_lang,
                   (rn = 1 AND len(t) > 0 AND lang = '{CORPUS_LANG}'
                    AND {sql_quality_score('t')} >= {QUALITY_MIN}) AS f_qual,
                   (rn = 1 AND len(t) > 0 AND lang = '{CORPUS_LANG}'
                    AND {sql_quality_score('t')} >= {QUALITY_MIN}
                    AND CAST(len(bt) AS BIGINT)
                        BETWEEN {TOKEN_BUDGET[0]} AND {TOKEN_BUDGET[1]}) AS f_keep
            FROM (
                SELECT doc_id, lang, source, rn,
                       {sql_tokens("text")} AS t, {sql_bpe_tokens("text")} AS bt
                FROM keep
            )
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_ingested,
               CAST(sum(CASE WHEN f_dedup THEN 1 ELSE 0 END) AS BIGINT) AS n_deduped,
               CAST(sum(CASE WHEN f_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_tokenized,
               CAST(sum(CASE WHEN f_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
               CAST(sum(CASE WHEN f_qual THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
               CAST(sum(CASE WHEN f_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_budget
        FROM flagged
        GROUP BY source
    """


@register("corpus_filter_waterfall_by_source", oracle=_waterfall_by_source_oracle())
def corpus_filter_waterfall_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``corpus_filter_waterfall``'s per-source breakdown — WHICH feed is
    losing docs at WHICH gate, the table a mixture owner reads when a
    source's realized share undershoots its target (a source can look
    healthy at ingest and be silently deleted by the quality gate; the
    corpus-wide waterfall cannot show that). One row per source, wide
    telescoping counts (ingested ≥ deduped ≥ tokenized ≥ lang ≥ quality
    ≥ budget). Dedup survivors attribute to the KEPT row's source (the
    keep-lowest representative), matching the batch pipeline's
    semantics. One fingerprint shuffle + one scan's worth of gate
    expressions as cumulative flags + one groupBy over |sources| groups —
    the streamed twin of this accounting is
    streaming/corpus_ingest.py's gate log. Pre-staged for r14
    registration with ``_waterfall_by_source_oracle()``."""
    from data_warehouse_product_mix_clustering_spark.functions.text import bpe_tokens, fingerprint
    from data_warehouse_product_mix_clustering_spark.plans.text import (
        CORPUS_LANG,
        QUALITY_MIN,
        TOKEN_BUDGET,
    )

    docs = table(spark, "documents", sf_dir)
    w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
    flagged = (
        docs.withColumn("__rn", F.row_number().over(w))
        .select(
            "source",
            (F.col("__rn") == 1).alias("f_dedup"),
            tokens(F.col("text")).alias("t"),
            bpe_tokens(F.col("text")).alias("bt"),
            "lang",
        )
        .select(
            "source",
            "f_dedup",
            (F.col("f_dedup") & (F.size("t") > 0)).alias("f_tok"),
            quality_score(F.col("t")).alias("__q"),
            F.size("bt").cast("long").alias("__nt"),
            "lang",
        )
        .select(
            "source",
            "f_dedup",
            "f_tok",
            (F.col("f_tok") & (F.col("lang") == CORPUS_LANG)).alias("f_lang"),
            "__q",
            "__nt",
        )
        .select(
            "source",
            "f_dedup",
            "f_tok",
            "f_lang",
            (F.col("f_lang") & (F.col("__q") >= QUALITY_MIN)).alias("f_qual"),
            "__nt",
        )
        .select(
            "source",
            "f_dedup",
            "f_tok",
            "f_lang",
            "f_qual",
            (F.col("f_qual") & F.col("__nt").between(*TOKEN_BUDGET)).alias("f_keep"),
        )
    )

    def _n(flag: str):
        return F.sum(F.when(F.col(flag), 1).otherwise(0)).cast("long")

    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_ingested"),
        _n("f_dedup").alias("n_deduped"),
        _n("f_tok").alias("n_tokenized"),
        _n("f_lang").alias("n_lang"),
        _n("f_qual").alias("n_quality"),
        _n("f_keep").alias("n_budget"),
    )


