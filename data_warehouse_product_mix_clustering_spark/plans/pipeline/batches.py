"""The end-to-end training-batch composition: ONE flow from the gated
corpus to the packed fixed-size batch plan (gate -> resample ->
interleave -> trained-BPE counts -> context windows -> batches), plus
its cross-stage contract audit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.functions.numeric import (
    ratio_round,
)
from data_warehouse_product_mix_clustering_spark.plans.registry import register
from data_warehouse_product_mix_clustering_spark.sources.registry import table
from data_warehouse_product_mix_clustering_spark.plans.pipeline.contamination import (
    _apply_decontamination,
)
from data_warehouse_product_mix_clustering_spark.plans.pipeline.mixture import (
    MIXTURE_ALPHA,
    _target_keep_rates,
    _temperature_keep_rates,
    source_mixture_doremi,
)
from data_warehouse_product_mix_clustering_spark.plans.pipeline.packing import (
    CONTEXT_LEN,
    _BATCH_SIZE,
    _interleave_rank,
)


# ---------------------------------------------------------------------------
# End-to-end training-batch composition (VERDICT r13 #3): ONE flow from the
# gated corpus to the packed-batch plan — gate → temperature resample →
# stride interleave → trained-BPE token counts → context windows → fixed-size
# window batches — so a recipe owner calls one function instead of trusting
# nine attested pieces to compose. The audit is the `refresh_rollup_audit`
# mold: the composition's cross-stage invariants, each of which some piece
# proved locally, re-pinned on the COMPOSED artifact.
# ---------------------------------------------------------------------------


def _tb_gated_with_source(
    spark: SparkSession, sf_dir: str,
    lang: str, quality_min: float, tok_lo: int, tok_hi: int,
    decontaminate: bool = False,
) -> DataFrame:
    """Stage A: the gated corpus (ONE gate-pipeline definition —
    plans/text.py::gated_corpus, shared with training_corpus and the
    manifest audit) with the mixture key carried through the same plan
    (``keep_source`` — one projected column, not a second documents
    scan + doc_id join). ``decontaminate`` additionally applies the
    fixed-benchmark exclusion (``training_corpus_decontaminated``'s
    clauses — eval docs out, overlap-gated docs out) so the one-call
    flow can ship benchmark-clean batches. (doc_id, source,
    n_tokens)."""
    from data_warehouse_product_mix_clustering_spark.plans.text import gated_corpus

    g = gated_corpus(
        spark, sf_dir, lang, quality_min, tok_lo, tok_hi, keep_source=True
    ).select("doc_id", "source", "n_tokens")
    if decontaminate:
        g = _apply_decontamination(spark, sf_dir, g)
    return g


def _tb_resample(
    gated: DataFrame, alpha: float, targets: DataFrame | None = None
) -> DataFrame:
    """Stage B: mixture resample of the GATED corpus — keep rates from
    the gated per-source token mass (``_temperature_keep_rates``, the
    same rule the registered resample query binds over raw documents;
    or ``_target_keep_rates`` when an explicit (source, target_share)
    mixture such as the DoReMi weights is given), doc selection by the
    shared md5 hex-fraction draw (RNG-free, engine- and
    partitioning-independent). (doc_id, source) survivors."""
    from data_warehouse_product_mix_clustering_spark.plans.sql_api import _hex_fraction_sql

    per_src = gated.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("total_tokens")
    )
    rates = (
        _target_keep_rates(per_src, targets)
        if targets is not None
        else _temperature_keep_rates(per_src, alpha)
    )
    frac = F.expr(_hex_fraction_sql("CAST(doc_id AS STRING)"))
    return (
        gated.join(F.broadcast(rates), "source")
        .filter(frac < F.col("keep_rate"))
        .select("doc_id", "source")
    )


def _tb_interleave(
    survivors: DataFrame, weight_col: str | None = None
) -> DataFrame:
    """Stage C: stride-interleave the RESAMPLED corpus into one training
    order. The mixture was already realized by stage B, so the stride
    targets here are the REALIZED per-source doc shares (6-dp-snapped) —
    this stage's sole job is ORDER fairness: every prefix of the stream
    holds each source's realized share to within a slot or two. Same
    no-window machinery as the registered interleave query
    (``_interleave_rank`` + ``with_rank_and_running`` — two distributed
    range-partitioned passes, two ≤P-row collects, zero global or
    per-source Window operators). (position, doc_id, source).

    With ``weight_col`` (optimization r19): the input carries a token
    weight, which RIDES the final rank pass — ``with_rank_and_running``
    computes rank AND inclusive running weight in the SAME range
    partitioning, so the output additionally carries ``weight_col`` and
    ``__start`` (the EXCLUSIVE running total: running − own weight),
    exactly the offset ``context_windows`` would re-derive with a third
    range-partitioned pass of its own. The batch planner consumes
    ``__start`` directly (``window_slices``), cutting one
    repartitionByRange + checkpoint + stats collect from every flow."""
    from data_warehouse_product_mix_clustering_spark.operators.packing import with_rank_and_running

    w = Window.partitionBy()
    shares = (
        survivors.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .select(
            "source",
            ratio_round(
                F.col("__n").cast("double") / F.sum("__n").over(w)
            ).alias("__tgt"),
        )
    )
    hashed = survivors.withColumn(
        "__h", F.md5(F.col("doc_id").cast("string"))
    )
    ranked = _interleave_rank(
        hashed, "source", [F.col("__h"), F.col("doc_id")], "__rk"
    ).drop("__h")
    carry = [weight_col] if weight_col else []
    keyed = (
        ranked.join(F.broadcast(shares), "source")
        .select(
            "doc_id",
            "source",
            *carry,
            ratio_round(
                (F.col("__rk") - F.lit(0.5)) / F.col("__tgt")
            ).alias("__vk"),
        )
    )
    if weight_col is None:
        return (
            with_rank_and_running(
                keyed.withColumn("__one", F.lit(1).cast("long")),
                [F.col("__vk"), F.col("doc_id")],
                "__one",
                rank_col="position",
            )
            .select("position", "doc_id", "source")
        )
    return (
        with_rank_and_running(
            keyed,
            [F.col("__vk"), F.col("doc_id")],
            weight_col,
            rank_col="position",
            running_col="__run",
        )
        .select(
            "position",
            "doc_id",
            "source",
            weight_col,
            (F.col("__run") - F.col(weight_col)).cast("long").alias("__start"),
        )
    )


def _tb_bpe_weights(
    spark: SparkSession, sf_dir: str, survivors: DataFrame
) -> DataFrame:
    """Stage D: trained-tokenizer token counts for the survivors — the
    packing weights a tensor writer actually budgets by (the
    ``doc_context_windows_bpe`` lesson: training budgets are tokenizer
    tokens, not whitespace words). One session-memoized merge table
    (plans/text.py::corpus_bpe_merges), distinct-word encode + join-back
    (|vocab| fold work, not |corpus|). Runs BEFORE the interleave since
    optimization r19 (the weights only key on doc_id, so attaching them
    to the pre-interleave survivors lets the interleave's rank pass carry
    the weight and emit the running token offset for free — see
    ``_tb_interleave``). (doc_id, source, w_tokens)."""
    from data_warehouse_product_mix_clustering_spark.operators.bpe import bpe_token_counts
    from data_warehouse_product_mix_clustering_spark.plans.text import corpus_bpe_merges

    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    subset = docs.join(survivors.select("doc_id"), "doc_id")
    merges = corpus_bpe_merges(spark, sf_dir)
    counts = bpe_token_counts(subset, merges).select(
        "doc_id", F.col("n_bpe_tokens").alias("w_tokens")
    )
    return survivors.join(counts, "doc_id")


def _tb_batch_plan(
    weighted: DataFrame, context_len: int, batch_size: int
) -> DataFrame:
    """Stage E: cut the interleaved token stream into ``context_len``
    windows (the distributed-prefix-sum concat-and-chunk index) and
    group consecutive windows into fixed-size training batches.
    batch_id = seq_id DIV batch_size PRESERVES the interleaved
    curriculum order — prefix fairness established at doc granularity
    rides through to batch granularity by monotonicity (a doc's first
    token lands in a window, windows land in batches, both in position
    order). Packed fixed-length windows need no length bucketing — every
    batch is a dense (batch_size × context_len) tensor; the
    length-bucketed planner (``doc_length_bucket_batches``) is the
    registered alternative for UNpacked padded batches.

    The input already carries ``__start`` (the exclusive running token
    offset, computed inside the interleave's rank pass — optimization
    r19), so the window cut is pure per-row arithmetic
    (``window_slices``): no third range-partitioned prefix-sum pass."""
    from data_warehouse_product_mix_clustering_spark.operators.packing import window_slices

    win = window_slices(
        weighted,
        weight_col="w_tokens",
        context_len=context_len,
    )
    return win.select(
        F.expr(f"seq_id DIV {int(batch_size)}").cast("long").alias("batch_id"),
        "seq_id",
        "position",
        "doc_id",
        "source",
        "slice_start",
        "slice_len",
        "seq_offset",
    )


# Rows-only (the composed plan's contract is hash-attested by the
# registered training_batches_audit; registered r15 alongside it,
# outside the driver window per the rows-only hygiene rule):
@register("training_batches")
def training_batches(
    spark: SparkSession,
    sf_dir: str,
    lang: str | None = None,
    quality_min: float | None = None,
    tok_lo: int | None = None,
    tok_hi: int | None = None,
    alpha: float = MIXTURE_ALPHA,
    context_len: int = CONTEXT_LEN,
    batch_size: int = _BATCH_SIZE,
    decontaminate: bool = False,
    mixture: str = "temperature",
) -> DataFrame:
    """The one-call corpus→batches plan: gated corpus → temperature
    resample → stride interleave → trained-BPE weights → context
    windows → fixed-size window batches. One row per (batch, window,
    document-slice): (batch_id, seq_id, position, doc_id, source,
    slice_start, slice_len, seq_offset) — the exact gather plan a
    tensor writer executes. Deterministic end-to-end (hash draws, 6-dp
    key snapping, distributed exact ranks), so the same (data, recipe)
    always yields the same plan — the reproducibility claim
    ``training_batches_audit`` holds it to. ``decontaminate=True``
    additionally applies the fixed-benchmark exclusion clauses
    (``_apply_decontamination`` — shared with
    ``training_corpus_decontaminated``) before the mixture stages.
    ``mixture`` selects the resample policy as a RECIPE FIELD, not a
    second flow: ``"temperature"`` (default — the α-power rule) or
    ``"doremi"`` (the loss-aware ``source_mixture_doremi`` weights fed
    through ``_target_keep_rates``; the
    ``doremi_training_batches_audit`` seam contract).

    Scale: gate = one fingerprint shuffle + per-row expressions;
    resample = dimension-sized rates broadcast back; interleave = two
    range-partitioned rank passes (no global/per-source windows); BPE
    weights = distinct-word encode + join-back; windows = distributed
    exclusive prefix sum, ≤ w/L+1 rows per doc. No stage funnels the
    corpus through one partition."""
    from data_warehouse_product_mix_clustering_spark.plans.text import (
        CORPUS_LANG,
        QUALITY_MIN,
        TOKEN_BUDGET,
    )

    lang = CORPUS_LANG if lang is None else lang
    quality_min = QUALITY_MIN if quality_min is None else quality_min
    tok_lo = TOKEN_BUDGET[0] if tok_lo is None else tok_lo
    tok_hi = TOKEN_BUDGET[1] if tok_hi is None else tok_hi
    if mixture not in ("temperature", "doremi"):
        raise ValueError(f"unknown mixture policy: {mixture!r}")
    gated = _tb_gated_with_source(
        spark, sf_dir, lang, quality_min, tok_lo, tok_hi,
        decontaminate=decontaminate,
    )
    targets = None
    if mixture == "doremi":
        targets = source_mixture_doremi(spark, sf_dir).select(
            "source", F.col("doremi_weight").alias("target_share")
        )
    survivors = _tb_resample(gated, alpha, targets)
    weighted = _tb_bpe_weights(spark, sf_dir, survivors)
    positioned = _tb_interleave(weighted, "w_tokens")
    return _tb_batch_plan(positioned, context_len, batch_size)


def _batch_plan_fingerprint(plan: DataFrame) -> tuple[int, int, int]:
    """Order-independent exact fingerprint of a batch plan: (n_rows,
    Σ int(md5(full row key)[:12], 16), Σ slice_len). The
    ``corpus_fingerprint`` discipline (decimal hash sum — exact,
    commutative, ANSI-overflow-safe) widened to the batch plan's
    composite row key, so equality means row-set equality (48-bit
    collision scope — a reproducibility receipt, not a MAC)."""
    key = F.concat_ws(
        ":", "batch_id", "seq_id", "position", "doc_id", "source",
        "slice_start", "slice_len", "seq_offset",
    )
    row = plan.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("decimal(28,0)")
        ).alias("h"),
        F.sum("slice_len").cast("long").alias("t"),
    ).first()
    return (int(row["n"]), int(row["h"] or 0), int(row["t"] or 0))


@register("training_batches_audit", oracle="""
    SELECT TRUE AS tokens_conserved, TRUE AS batches_exact,
           TRUE AS prefix_fair, TRUE AS fingerprint_reproducible,
           TRUE AS matches_staged, TRUE AS contract_bites
""")
def training_batches_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end contract audit for ``training_batches`` — the
    composition IS the product, so the invariants are pinned on the
    composed artifact, not re-proven per piece:

    - ``tokens_conserved``: Σ trained-BPE tokens over the resampled
      interleaved corpus == Σ slice_len over the window plan == Σ of
      per-batch token sums — the packing is lossless corpus→windows→
      batches (no doc drops silently; gated docs always tokenize > 0);
    - ``batches_exact``: every batch except the last holds exactly
      batch_size windows AND every window except the global last tiles
      to exactly context_len tokens — the dense-tensor shape claim;
    - ``prefix_fair``: interleave fairness RIDES THROUGH to batch
      order — among docs whose first token lands in the first half of
      the batches, each source's doc count is within 2 slots of its
      realized share (stride guarantee ±(0.5 + S·tgt/2) < 2; measured
      max dev 0.667 at sf0.001, 0.646 at sf0.01 — 3× margin);
    - ``fingerprint_reproducible``: a JSON-roundtripped recipe rebuilds
      the plan to the same fingerprint — (data, recipe) ⇒ batch plan,
      the manifest-discipline claim over the WHOLE flow;
    - ``matches_staged``: running the five stages as SEPARATE jobs —
      each stage's output round-tripped through parquet and
      re-partitioned (7-way) before feeding the next — reproduces the
      fused lazy plan's fingerprint EXACTLY. This is the real 100 TB
      deployment shape (per-stage materialization between jobs), and
      it holds because every stage is hash-deterministic and
      partition-layout-invariant (exact distributed ranks over total
      orders, snapped keys);
    - ``contract_bites``: ≥ 2 batches, ≥ 1 document split across
      windows, and a non-empty prefix — the invariants above are
      exercised, not vacuous.

    Bounds: per-source share maps are dimension-sized collects;
    everything else is scalar aggregates over distributed plans. The
    merge table rides the session memo (one training pass serves the
    production flow, the rebuild, and the staged twin)."""
    import json
    import shutil
    import tempfile

    from data_warehouse_product_mix_clustering_spark.plans.text import (
        CORPUS_LANG,
        QUALITY_MIN,
        TOKEN_BUDGET,
    )

    recipe = {
        "lang": CORPUS_LANG,
        "quality_min": QUALITY_MIN,
        "tok_lo": TOKEN_BUDGET[0],
        "tok_hi": TOKEN_BUDGET[1],
        "alpha": MIXTURE_ALPHA,
        "context_len": CONTEXT_LEN,
        "batch_size": _BATCH_SIZE,
    }
    L, BS = CONTEXT_LEN, _BATCH_SIZE

    # production flow, stage handles kept for the cross-stage checks.
    # LAZY checkpoints (optimization r18): each handle's first action —
    # the interleave's stats collect, the fused fingerprint+conservation
    # agg — computes every partition, so the checkpoint completes inside
    # a job the audit pays anyway instead of costing a materialization
    # job of its own; later consumers read the same pinned blocks either
    # way. Since r19 the weights attach BEFORE the interleave and the
    # window offsets ride the interleave's rank pass (see
    # _tb_interleave), so the flow has TWO range-partitioned passes, not
    # three.
    gated = _tb_gated_with_source(
        spark, sf_dir, recipe["lang"], recipe["quality_min"],
        recipe["tok_lo"], recipe["tok_hi"],
    )
    survivors = _tb_resample(gated, recipe["alpha"]).localCheckpoint(eager=False)
    weighted = _tb_bpe_weights(spark, sf_dir, survivors).localCheckpoint(
        eager=False
    )  # read by the interleave and the conservation agg
    plan = _tb_batch_plan(
        _tb_interleave(weighted, "w_tokens"), L, BS
    ).localCheckpoint(eager=False)

    # -- fingerprint + tokens_conserved corpus side, ONE job (r19: the
    #    fingerprint agg and the corpus-total agg were separate driver
    #    actions over two checkpointed relations; a cross join of the two
    #    1-row aggregates computes both in one action) --
    key = F.concat_ws(
        ":", "batch_id", "seq_id", "position", "doc_id", "source",
        "slice_start", "slice_len", "seq_offset",
    )
    fprow = (
        plan.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast(
                    "decimal(28,0)"
                )
            ).alias("h"),
            F.sum("slice_len").cast("long").alias("t"),
        )
        .crossJoin(weighted.agg(F.sum("w_tokens").alias("__ct")))
        .first()
    )
    fp = (int(fprow["n"]), int(fprow["h"] or 0), int(fprow["t"] or 0))
    corpus_total = int(fprow["__ct"] or 0)

    # Plan-wide scalars in ONE job (optimization r18, guide §5: the
    # driver actions over the checkpointed plan were four separate jobs;
    # the per-batch regroup below still exercises the batch-granular sum
    # path, so nothing the audit attests got weaker).
    scalars = plan.agg(
        F.max("batch_id").alias("__mb"), F.max("seq_id").alias("__mw")
    ).first()
    n_batches = int(scalars["__mb"] or 0) + 1
    max_win = int(scalars["__mw"] or 0)

    # -- batches_exact (+ the per-batch token regroup tokens_conserved
    #    compares against) in ONE job (r19): one per-(batch, window)
    #    aggregate feeds BOTH the batch-granular regroup (full-batch
    #    check + token total) and the window-tiling check; batch_id is a
    #    pure function of seq_id, so grouping by the pair is the same
    #    window grain the former per_win pass used --
    per_seq = plan.groupBy("batch_id", "seq_id").agg(
        F.sum("slice_len").alias("__s")
    ).localCheckpoint(eager=False)  # windows-sized; read by both branches
    shape = (
        per_seq.groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("__nw"), F.sum("__s").alias("__bs"))
        .agg(
            F.sum(
                F.when(
                    (F.col("batch_id") < n_batches - 1) & (F.col("__nw") != BS),
                    1,
                ).otherwise(0)
            ).alias("__bad_full"),
            F.sum("__bs").alias("__batch_total"),
        )
        .crossJoin(
            per_seq.agg(
                F.sum(
                    F.when(
                        (F.col("seq_id") < max_win) & (F.col("__s") != L), 1
                    ).otherwise(0)
                ).alias("__bad_tile")
            )
        )
        .first()
    )
    full_ok = int(shape["__bad_full"] or 0) == 0
    batch_total = int(shape["__batch_total"] or 0)
    tokens_conserved = corpus_total == fp[2] == batch_total
    tiling_ok = int(shape["__bad_tile"] or 0) == 0
    batches_exact = full_ok and tiling_ok

    # -- prefix_fair + the any_split probe, ONE job (r19: survivor
    #    per-source counts, prefix per-source counts, and the
    #    split-document existence check were three separate actions; one
    #    per-doc aggregate regrouped by source, full-outer-joined with
    #    the survivor counts, carries all three in ≤ |sources| rows) --
    half_seq = (n_batches // 2) * BS
    per_doc = plan.groupBy("doc_id", "source").agg(
        F.min("seq_id").alias("__fs"),
        F.count_distinct("seq_id").alias("__nw"),
    )
    fair_rows = (
        per_doc.groupBy("source")
        .agg(
            F.sum(
                F.when(F.col("__fs") < half_seq, 1).otherwise(0)
            ).cast("long").alias("__pre"),
            F.max("__nw").alias("__max_nw"),
        )
        .join(
            survivors.groupBy("source").agg(F.count(F.lit(1)).alias("__n")),
            "source",
            "full_outer",
        )
        .collect()  # ≤ |sources|
    )
    src_n = {r["source"]: int(r["__n"] or 0) for r in fair_rows}
    pre_n = {r["source"]: int(r["__pre"] or 0) for r in fair_rows}
    N = sum(src_n.values())
    P = sum(pre_n.values())  # |prefix| — the per-source counts partition it
    max_dev = max(
        abs(pre_n.get(s, 0) - P * n / N) for s, n in src_n.items()
    )
    prefix_fair = max_dev <= 2.0
    any_split = any(int(r["__max_nw"] or 0) >= 2 for r in fair_rows)

    # -- fingerprint_reproducible (JSON-roundtripped recipe rebuild) --
    loaded = json.loads(json.dumps(recipe))
    fingerprint_reproducible = (
        _batch_plan_fingerprint(training_batches(spark, sf_dir, **loaded)) == fp
    )

    # -- matches_staged (per-stage parquet materialization + reshuffle) --
    root = tempfile.mkdtemp(prefix="spark_graft_training_batches_")
    try:
        def _rt(df: DataFrame, name: str) -> DataFrame:
            p = os.path.join(root, name)
            df.write.mode("overwrite").parquet(p)
            return spark.read.parquet(p).repartition(7)

        a = _rt(
            _tb_gated_with_source(
                spark, sf_dir, recipe["lang"], recipe["quality_min"],
                recipe["tok_lo"], recipe["tok_hi"],
            ),
            "gated",
        )
        b = _rt(_tb_resample(a, recipe["alpha"]), "resampled")
        c = _rt(_tb_bpe_weights(spark, sf_dir, b), "weighted")
        d = _rt(_tb_interleave(c, "w_tokens"), "positioned")
        matches_staged = _batch_plan_fingerprint(_tb_batch_plan(d, L, BS)) == fp
    finally:
        shutil.rmtree(root, ignore_errors=True)

    # -- contract_bites (any_split rides the fairness job above) --
    contract_bites = n_batches >= 2 and any_split and P > 0

    return spark.createDataFrame(
        [
            (
                tokens_conserved,
                batches_exact,
                prefix_fair,
                fingerprint_reproducible,
                matches_staged,
                contract_bites,
            )
        ],
        "tokens_conserved boolean, batches_exact boolean, prefix_fair boolean, "
        "fingerprint_reproducible boolean, matches_staged boolean, "
        "contract_bites boolean",
    )


@register("doremi_training_batches_audit", oracle="""
    SELECT TRUE AS rates_match_twin, TRUE AS policy_applied,
           TRUE AS fingerprint_reproducible,
           TRUE AS differs_from_temperature, TRUE AS tokens_conserved
""")
def doremi_training_batches_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seam contract for the DoReMi mixture feeding ``training_batches``
    (VERDICT r14 #6): the loss-aware weights enter the one-call flow as
    a RECIPE FIELD (``mixture="doremi"``), and this audit pins the seam
    the way ``training_batches_audit`` pins the composition:

    - ``rates_match_twin``: the distributed ``_target_keep_rates`` over
      (gated per-source token mass × DoReMi weights) equals a driver
      twin computed from the two collected dimension-sized relations —
      exactly, 6-dp snap included (the ``coreset_maxmin_audit``
      twin mold);
    - ``policy_applied``: per source, the plan's realized survivor doc
      count equals the count of gated docs passing the shared md5
      hex-fraction draw under the TWIN's rates — the policy, not some
      policy, selected the corpus;
    - ``fingerprint_reproducible``: a JSON-roundtripped recipe (the
      ``mixture`` field riding with the other knobs) rebuilds the plan
      to the same fingerprint — (data, recipe) ⇒ batch plan holds for
      the new field;
    - ``differs_from_temperature``: the DoReMi keep rates differ from
      the temperature rates for ≥ 1 source AND the two plans'
      fingerprints differ — the recipe field BITES (not a silent
      fallback to the default policy);
    - ``tokens_conserved``: Σ trained-BPE tokens over the DoReMi
      survivors == Σ slice_len over the DoReMi plan — conservation
      re-pinned on the new path.

    Bounds: rate/share maps are |sources|-sized collects; everything
    else is scalar aggregates over distributed plans. The DoReMi weight
    relation derives from one (source, word) shuffle per build
    (``source_mixture_doremi``'s cost note).

    Scale: identical to ``training_batches`` — the policy swap changes
    a broadcast dimension relation, no new corpus-sized stage."""
    from data_warehouse_product_mix_clustering_spark.plans.sql_api import _hex_fraction_sql
    from data_warehouse_product_mix_clustering_spark.plans.similarity import ratio_round_py
    from data_warehouse_product_mix_clustering_spark.plans.text import (
        CORPUS_LANG,
        QUALITY_MIN,
        TOKEN_BUDGET,
    )

    recipe = {
        "lang": CORPUS_LANG,
        "quality_min": QUALITY_MIN,
        "tok_lo": TOKEN_BUDGET[0],
        "tok_hi": TOKEN_BUDGET[1],
        "alpha": MIXTURE_ALPHA,
        "context_len": CONTEXT_LEN,
        "batch_size": _BATCH_SIZE,
        "mixture": "doremi",
    }

    gated = _tb_gated_with_source(
        spark, sf_dir, recipe["lang"], recipe["quality_min"],
        recipe["tok_lo"], recipe["tok_hi"],
    ).localCheckpoint(eager=True)  # read by rates, draw recount, and the flow
    per_src = gated.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("total_tokens")
    )
    doremi = source_mixture_doremi(spark, sf_dir).select(
        "source", F.col("doremi_weight").alias("target_share")
    ).localCheckpoint(eager=True)  # one LM-ladder build serves every consumer

    # -- rates_match_twin --
    masses = {r["source"]: int(r["total_tokens"]) for r in per_src.collect()}
    weights = {r["source"]: float(r["target_share"]) for r in doremi.collect()}
    # The operator's documented rule normalizes observed shares over the
    # JOINED (weight-covered) set, so the twin's total must too (ADVICE
    # r15 — a total over ALL gated sources is a different formula exactly
    # when a source lacks a DoReMi weight; _target_keep_rates now raises
    # on that, and the audit corpus is full-coverage, so the two totals
    # coincide here — but the twin must implement the rule, not rely on
    # the coincidence).
    covered = {s: m for s, m in masses.items() if s in weights}
    total = sum(covered.values())
    raw = {s: weights[s] / (m / total) for s, m in covered.items()}
    mx = max(raw.values())
    rates_py = {s: ratio_round_py(v / mx) for s, v in raw.items()}
    rates_spark = {
        r["source"]: float(r["keep_rate"])
        for r in _target_keep_rates(per_src, doremi).collect()  # ≤ |sources|
    }
    rates_match_twin = rates_spark == rates_py

    # -- the DoReMi plan (stage handles kept for the checks) --
    survivors = _tb_resample(gated, recipe["alpha"], doremi).localCheckpoint(
        eager=True
    )
    weighted = _tb_bpe_weights(spark, sf_dir, survivors).localCheckpoint(
        eager=True
    )
    plan = _tb_batch_plan(
        _tb_interleave(weighted, "w_tokens"),
        recipe["context_len"], recipe["batch_size"],
    ).localCheckpoint(eager=True)
    fp = _batch_plan_fingerprint(plan)

    # -- policy_applied --
    got_n = {
        r["source"]: int(r["n"])
        for r in survivors.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    frac = F.expr(_hex_fraction_sql("CAST(doc_id AS STRING)"))
    rate_lit = F.create_map(
        *[F.lit(x) for kv in rates_py.items() for x in kv]
    )
    want_n = {
        r["source"]: int(r["n"])
        for r in gated.filter(frac < rate_lit[F.col("source")])
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    policy_applied = got_n == want_n

    # -- fingerprint_reproducible --
    import json

    loaded = json.loads(json.dumps(recipe))
    fingerprint_reproducible = (
        _batch_plan_fingerprint(training_batches(spark, sf_dir, **loaded)) == fp
    )

    # -- differs_from_temperature --
    temp_rates = {
        r["source"]: float(r["keep_rate"])
        for r in _temperature_keep_rates(per_src, recipe["alpha"]).collect()
    }
    temp_fp = _batch_plan_fingerprint(
        training_batches(spark, sf_dir, mixture="temperature")
    )
    differs_from_temperature = temp_rates != rates_py and temp_fp != fp

    # -- tokens_conserved --
    corpus_total = int(weighted.agg(F.sum("w_tokens")).first()[0] or 0)
    tokens_conserved = corpus_total == fp[2]

    return spark.createDataFrame(
        [
            (
                bool(rates_match_twin),
                bool(policy_applied),
                bool(fingerprint_reproducible),
                bool(differs_from_temperature),
                bool(tokens_conserved),
            )
        ],
        "rates_match_twin boolean, policy_applied boolean, "
        "fingerprint_reproducible boolean, differs_from_temperature boolean, "
        "tokens_conserved boolean",
    )


