"""Source-mixture policy: per-source token KL, temperature and DoReMi
reweighting, exact water-filling of a token budget, and the policies
APPLIED — resampled / repeats / stride-interleaved corpora.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.functions.numeric import (
    ratio_round,
    sql_ratio_round,
)
from data_warehouse_product_mix_clustering_spark.functions.text import (
    sql_tokens,
    tokens,
)
from data_warehouse_product_mix_clustering_spark.plans.registry import register
from data_warehouse_product_mix_clustering_spark.sources.registry import table
from data_warehouse_product_mix_clustering_spark.plans.pipeline.corpus import (
    _PER_SRC_CTE,
    _per_source_tokens,
)
from data_warehouse_product_mix_clustering_spark.plans.pipeline.packing import (
    _interleave_rank,
)


_SOURCE_KL_ORACLE = f"""
    WITH tok AS (
        SELECT source, unnest({sql_tokens("text")}) AS word
        FROM documents
    ), src_counts AS (
        SELECT source, word, CAST(count(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2
    ), src_totals AS (
        SELECT source, CAST(sum(c) AS DOUBLE) AS n_src
        FROM src_counts GROUP BY 1
    ), corpus_counts AS (
        SELECT word, CAST(sum(c) AS DOUBLE) AS cw
        FROM src_counts GROUP BY 1
    ), corpus_total AS (
        SELECT CAST(sum(cw) AS DOUBLE) AS n FROM corpus_counts
    )
    SELECT source,
           CAST(max(n_src) AS BIGINT) AS n_tokens,
           {sql_ratio_round(
               "sum((c / n_src) * log2((c / n_src) / (cw / n)))"
           )} AS kl_bits
    FROM src_counts
    JOIN src_totals USING (source)
    JOIN corpus_counts USING (word)
    CROSS JOIN corpus_total
    GROUP BY source
"""


@register("source_token_kl", oracle=_SOURCE_KL_ORACLE)
def source_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift: KL(P_source ‖ P_corpus) in bits
    over the unigram token distributions — the corpus-monitoring check
    a mixture owner runs to spot a source whose content shifted (crawl
    drift, a broken extractor, an injected spam burst). Exact, no
    smoothing needed: each source's support is a subset of the corpus
    support by construction, so both p_s(w) and p(w) are positive on
    every summed term. One shuffle on (source, word); the corpus-wide
    relation reuses the per-source counts (sum over sources), so the
    corpus is scanned ONCE; per-source scalars ride a broadcast join on
    the |sources|-row totals relation. Registered r13 with ``_SOURCE_KL_ORACLE``."""
    docs = table(spark, "documents", sf_dir)
    tok = docs.select("source", F.explode(tokens(F.col("text"))).alias("word"))
    src_counts = tok.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    src_totals = F.broadcast(
        src_counts.groupBy("source").agg(
            F.sum("c").cast("double").alias("n_src")
        )
    )
    corpus_counts = src_counts.groupBy("word").agg(
        F.sum("c").cast("double").alias("cw")
    )
    corpus_total = F.broadcast(
        corpus_counts.agg(F.sum("cw").cast("double").alias("n"))
    )
    term = (F.col("c") / F.col("n_src")) * F.log2(
        (F.col("c") / F.col("n_src")) / (F.col("cw") / F.col("n"))
    )
    return (
        src_counts.join(src_totals, "source")
        .join(corpus_counts, "word")
        .crossJoin(corpus_total)
        .groupBy("source")
        .agg(
            F.max("n_src").cast("long").alias("n_tokens"),
            ratio_round(F.sum(term)).alias("kl_bits"),
        )
    )


MIXTURE_ALPHA = 0.5  # temperature: 1 = proportional, 0 = uniform


_SOURCE_MIXTURE_TEMPERATURE_ORACLE = f"""
    {_PER_SRC_CTE}
    , obs_cte AS (
        SELECT source, n_docs, total_tokens,
               CAST(total_tokens AS DOUBLE) / sum(total_tokens) OVER ()
                   AS obs
        FROM per_src
    ), shared AS (
        SELECT source, n_docs, total_tokens, obs,
               pow(obs, {MIXTURE_ALPHA})
                   / sum(pow(obs, {MIXTURE_ALPHA})) OVER () AS tgt
        FROM obs_cte
    )
    SELECT source, n_docs, total_tokens,
           {sql_ratio_round("obs")} AS observed_share,
           {sql_ratio_round("tgt")} AS target_share,
           {sql_ratio_round("tgt / obs")} AS sampling_weight
    FROM shared
"""


@register("source_mixture_temperature", oracle=_SOURCE_MIXTURE_TEMPERATURE_ORACLE)
def source_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights — the multilingual/domain
    alpha-sampling recipe (target share ∝ observed_shareᵅ, α = 0.5):
    the knob between proportional sampling (α=1, big sources dominate)
    and uniform (α→0, tiny sources over-repeated to parity) that
    multilingual pretraining uses to up-weight low-resource slices
    without flattening the mixture. Generalizes
    ``source_mixture_weights``' uniform target (its α→0 limit); the
    emitted ``sampling_weight`` = target/observed is the multiplicative
    resampling factor. Same shape: one scan + one tiny groupBy, the
    share windows run over |sources| rows — dimension-sized by
    definition. Registered r13 with
    ``_SOURCE_MIXTURE_TEMPERATURE_ORACLE``."""
    per_src = _per_source_tokens(spark, sf_dir)
    w = Window.partitionBy()
    obs = F.col("total_tokens").cast("double") / F.sum("total_tokens").over(w)
    tgt = F.pow(obs, F.lit(MIXTURE_ALPHA)) / F.sum(
        F.pow(obs, F.lit(MIXTURE_ALPHA))
    ).over(w)
    return per_src.select(
        "source",
        "n_docs",
        "total_tokens",
        ratio_round(obs).alias("observed_share"),
        ratio_round(tgt).alias("target_share"),
        ratio_round(tgt / obs).alias("sampling_weight"),
    )


DOREMI_TAU = 1.0  # reweighting temperature: excess bits → 2^(excess/τ)


def _doremi_oracle() -> str:
    t = sql_tokens("text")
    return f"""
        WITH toks AS (
            SELECT source, {t} AS t FROM documents
        ), tok AS (
            SELECT source, unnest(t) AS word FROM toks
        ), sw AS (
            SELECT source, word, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY 1, 2
        ), cw AS (
            SELECT word, CAST(sum(c) AS BIGINT) AS c FROM sw GROUP BY 1
        ), ct AS (
            SELECT CAST(sum(c) AS DOUBLE) AS n,
                   CAST(count(*) AS DOUBLE) AS v
            FROM cw
        ), clm AS (
            SELECT word, log2((c + 0.5) / (n + 0.5 * v)) AS logp_c
            FROM cw, ct
        ), st AS (
            SELECT source, CAST(sum(c) AS DOUBLE) AS n,
                   CAST(count(*) AS DOUBLE) AS v
            FROM sw GROUP BY 1
        ), slm AS (
            SELECT source, word, c,
                   log2((c + 0.5) / (n + 0.5 * v)) AS logp_s
            FROM sw JOIN st USING (source)
        ), ex AS (
            SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
                   {sql_ratio_round(
                       "sum(c * (logp_s - logp_c)) / sum(c)"
                   )} AS excess_bits
            FROM slm JOIN clm USING (word)
            GROUP BY 1
        ), raw AS (
            SELECT source, n_tokens, excess_bits,
                   CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS obs,
                   (CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER ())
                       * pow(2.0, excess_bits / {DOREMI_TAU}) AS w
            FROM ex
        )
        SELECT source, n_tokens,
               {sql_ratio_round("obs")} AS observed_share,
               excess_bits,
               {sql_ratio_round("w / sum(w) OVER ()")} AS doremi_weight
        FROM raw
    """


@register("source_mixture_doremi", oracle=_doremi_oracle())
def source_mixture_doremi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining")
    composed from the repo's LM ladder: per source, the EXCESS BITS a
    generic corpus-wide unigram LM pays over the source's OWN in-domain
    LM (the engine's stand-in for DoReMi's proxy-vs-reference loss gap —
    how much a one-size-fits-all model underserves the domain), then the
    exponentiated-gradient reweight w_s ∝ observed_share_s ·
    2^(excess_s/τ), normalized. Domains with learnable headroom get
    up-weighted; domains a generic model already fits get thinned —
    the loss-aware alternative to the purely size-based
    ``source_mixture_temperature``. One row per source: (source,
    n_tokens, observed_share, excess_bits, doremi_weight); the weight
    column drops into the same resample/interleave machinery the
    temperature weights feed.

    Determinism: excess_bits is 6-dp-snapped BEFORE exponentiation, so
    both engines raise 2 to the identical double; the final weight takes
    the nudged ratio round (the pow last-ulp discipline
    ``source_mixture_temperature`` established).

    Scale: ONE (source, word) shuffle builds the count relation both
    LMs derive from (the ``source_token_kl`` cost shape); the corpus LM
    is a second groupBy of it; scoring is a vocabulary-sized join (not
    a corpus re-scan — integer counts carry the token mass); the share/
    normalize windows run over |sources| rows. No Python anywhere."""
    a = 0.5  # additive smoothing, the operators/lm.py default
    docs = table(spark, "documents", sf_dir)
    tok = docs.select("source", F.explode(tokens(F.col("text"))).alias("word"))
    sw = tok.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=True)  # read by both LM fits + the scoring join
    cw = sw.groupBy("word").agg(F.sum("c").cast("long").alias("c"))
    ct = F.broadcast(
        cw.agg(
            F.sum("c").cast("double").alias("__n"),
            F.count(F.lit(1)).cast("double").alias("__v"),
        )
    )
    clm = cw.crossJoin(ct).select(
        "word",
        F.log2(
            (F.col("c") + F.lit(a)) / (F.col("__n") + F.lit(a) * F.col("__v"))
        ).alias("logp_c"),
    )
    st = F.broadcast(
        sw.groupBy("source").agg(
            F.sum("c").cast("double").alias("__n"),
            F.count(F.lit(1)).cast("double").alias("__v"),
        )
    )
    slm = sw.join(st, "source").select(
        "source",
        "word",
        "c",
        F.log2(
            (F.col("c") + F.lit(a)) / (F.col("__n") + F.lit(a) * F.col("__v"))
        ).alias("logp_s"),
    )
    ex = (
        slm.join(clm, "word")
        .groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            ratio_round(
                F.sum(F.col("c") * (F.col("logp_s") - F.col("logp_c")))
                / F.sum("c")
            ).alias("excess_bits"),
        )
    )
    w = Window.partitionBy()
    obs = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    raw = obs * F.pow(F.lit(2.0), F.col("excess_bits") / F.lit(DOREMI_TAU))
    return ex.select(
        "source",
        "n_tokens",
        ratio_round(obs).alias("observed_share"),
        "excess_bits",
        ratio_round(raw / F.sum(raw).over(w)).alias("doremi_weight"),
    )


# ---------------------------------------------------------------------------
# Budget-constrained mixture: exact water-filling. The temperature/DoReMi
# queries answer "what SHARES"; a training run also has a hard TOKEN BUDGET.
# Water-filling allocates B tokens at target shares, capping each source at
# what it actually has and redistributing the slack — the classic
# max-min-fair allocation, here engine-deterministic.
# ---------------------------------------------------------------------------

BUDGET_ALPHA = 0.0  # uniform target: equal parts per source (α-generic code)
BUDGET_FRAC = 0.95  # token budget as a fraction of the corpus
_GU = 1_000_000  # target shares as integer micro-units (exact prefix sums)


def _budget_allocation_oracle() -> str:
    return f"""
        {_PER_SRC_CTE}
        , tot AS (
            SELECT CAST(sum(total_tokens) AS BIGINT) AS tt FROM per_src
        ), tgtu AS (
            SELECT source, total_tokens AS t, tt,
                   CAST(round({_GU} *
                        pow(CAST(total_tokens AS DOUBLE) / tt, {BUDGET_ALPHA})
                        / sum(pow(CAST(total_tokens AS DOUBLE) / tt,
                                  {BUDGET_ALPHA})) OVER (), 0) AS BIGINT) AS gu
            FROM per_src, tot
        ), ranked AS (
            SELECT *, CAST(round({BUDGET_FRAC} * tt, 0) AS BIGINT) AS b,
                   CAST(t AS DOUBLE) / gu AS r,
                   row_number() OVER (
                       ORDER BY CAST(t AS DOUBLE) / gu, source) AS rk,
                   sum(gu) OVER () AS gtot
            FROM tgtu
        ), lams AS (
            SELECT *,
                   (b - COALESCE(sum(t) OVER (
                        ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0))
                   / CAST(gtot - COALESCE(sum(gu) OVER (
                        ORDER BY rk ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS DOUBLE) AS lam
            FROM ranked
        ), star AS (
            SELECT *, min(CASE WHEN lam < r THEN rk END) OVER () AS jstar
            FROM lams
        ), lamstar AS (
            SELECT *, max(CASE WHEN rk = jstar THEN lam END) OVER () AS ls
            FROM star
        )
        SELECT source, t AS total_tokens,
               {sql_ratio_round(f"gu / {_GU}.0")} AS target_share,
               CAST(round(CASE WHEN ls IS NULL OR ls * gu >= t THEN t
                               ELSE ls * gu END, 0) AS BIGINT) AS alloc_tokens,
               {sql_ratio_round(
                   "CASE WHEN ls IS NULL OR ls * gu >= t THEN 1.0"
                   " ELSE ls * gu / t END")} AS keep_rate,
               (ls IS NULL OR ls * gu >= t) AS saturated
        FROM lamstar
    """


@register("source_budget_allocation", oracle=_budget_allocation_oracle())
def source_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact water-filling of a token budget across sources: allocate
    B = {BUDGET_FRAC}·|corpus| tokens at the target shares (α = 0 →
    equal parts per source), capping each source at the tokens it
    actually HAS and redistributing the slack to the rest — the
    max-min-fair allocation a budgeted recipe runs when targets exceed
    small sources' inventory (the pure-rate temperature resample cannot
    hit a budget: it has no feedback from saturated sources). Closed
    form, no iteration: sources sorted by inventory-to-target ratio
    saturate in order; for each candidate frontier k the water level
    λ(k) = (B − Σ_{{sat}} T) / Σ_{{unsat}} g is a prefix-sum expression,
    and the true frontier is the first row with λ < T/g. One row per
    source: (source, total_tokens, target_share, alloc_tokens,
    keep_rate, saturated); Σ alloc_tokens = B up to per-source rounding.

    Engine determinism (the discrete-frontier risk): target shares are
    snapped to integer MICRO-UNITS first, so every prefix sum in the
    frontier search is integer-exact and order-free; the sort key and
    every λ are single IEEE divisions of identical integers — both
    engines pick the identical frontier row, provably, not just at 6 dp.
    (α ≠ 0 would put a pow() inside the share sum — then micro-unit
    snapping still bounds the drift to one µunit per source, the same
    class the temperature query documents.)

    Scale: one scan + one dimension-sized groupBy; everything after is
    windows over |sources| rows."""
    return waterfill_allocation(
        _per_source_tokens(spark, sf_dir), BUDGET_ALPHA, BUDGET_FRAC
    )


def waterfill_allocation(
    per_src: DataFrame, alpha: float, budget_frac: float
) -> DataFrame:
    """The water-filling math over any (source, total_tokens) relation —
    factored from the registered query so property tests can feed
    synthetic inventories and other recipes can allocate over GATED or
    streamed per-source relations. Dimension-sized input by contract;
    see ``source_budget_allocation`` for the algorithm and the
    integer-µunit determinism argument (exact for α = 0; α ≠ 0 puts a
    pow() inside the share sum — µunit snapping bounds the drift to one
    µunit per source, the temperature query's documented class)."""
    w = Window.partitionBy()
    tt = F.sum("total_tokens").over(w)
    obs = F.col("total_tokens").cast("double") / tt
    tgt = F.pow(obs, F.lit(alpha)) / F.sum(F.pow(obs, F.lit(alpha))).over(w)
    base = per_src.select(
        "source",
        F.col("total_tokens").alias("t"),
        F.round(F.lit(_GU) * tgt, 0).cast("long").alias("gu"),
        F.round(F.lit(budget_frac) * tt, 0).cast("long").alias("b"),
    ).withColumn("r", F.col("t").cast("double") / F.col("gu"))
    pre = Window.orderBy("r", "source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    lams = base.select(
        "*",
        F.row_number().over(Window.orderBy("r", "source")).alias("rk"),
        (
            (F.col("b") - F.coalesce(F.sum("t").over(pre), F.lit(0)))
            / (
                F.sum("gu").over(w)
                - F.coalesce(F.sum("gu").over(pre), F.lit(0))
            ).cast("double")
        ).alias("lam"),
    )
    star = lams.withColumn(
        "jstar", F.min(F.when(F.col("lam") < F.col("r"), F.col("rk"))).over(w)
    ).withColumn(
        "ls", F.max(F.when(F.col("rk") == F.col("jstar"), F.col("lam"))).over(w)
    )
    sat = F.col("ls").isNull() | (F.col("ls") * F.col("gu") >= F.col("t"))
    return star.select(
        "source",
        F.col("t").alias("total_tokens"),
        ratio_round(F.col("gu") / F.lit(float(_GU))).alias("target_share"),
        F.round(
            F.when(sat, F.col("t").cast("double")).otherwise(
                F.col("ls") * F.col("gu")
            ),
            0,
        )
        .cast("long")
        .alias("alloc_tokens"),
        ratio_round(
            F.when(sat, F.lit(1.0)).otherwise(
                F.col("ls") * F.col("gu") / F.col("t")
            )
        ).alias("keep_rate"),
        sat.alias("saturated"),
    )


def waterfill_py(
    tokens_by_source: dict[str, int], budget: int
) -> dict[str, tuple[int, bool]]:
    """Pure-python twin of ``waterfill_allocation`` at α = 0 (uniform
    µunit targets) — the SAME arithmetic operation sequence in IEEE
    doubles with HALF_UP rounding, so allocations match EXACTLY (no
    tolerance). Returns {source: (alloc_tokens, saturated)}."""
    from decimal import ROUND_HALF_UP, Decimal

    def _half_up(x: float) -> int:
        return int(Decimal(repr(x)).quantize(Decimal("1"), ROUND_HALF_UP))

    s = len(tokens_by_source)
    gu = _half_up(_GU * (1.0 / s))  # α = 0: identical share for every source
    order = sorted(tokens_by_source, key=lambda k: (tokens_by_source[k] / gu, k))
    sat_t, suf_g = 0, gu * s
    lam = None
    for src in order:
        cand = (budget - sat_t) / float(suf_g)
        if cand < tokens_by_source[src] / gu:
            lam = cand
            break
        sat_t += tokens_by_source[src]
        suf_g -= gu
    out = {}
    for src, t in tokens_by_source.items():
        if lam is None or lam * gu >= t:
            out[src] = (t, True)
        else:
            out[src] = (_half_up(lam * gu), False)
    return out


def _budgeted_corpus_oracle() -> str:
    from data_warehouse_product_mix_clustering_spark.plans.sql_api import _hex_fraction_sql

    frac = _hex_fraction_sql("CAST(doc_id AS STRING)")
    return f"""
        WITH alloc AS ({_budget_allocation_oracle()})
        SELECT d.doc_id, d.source, a.keep_rate
        FROM documents d JOIN alloc a ON d.source = a.source
        WHERE {frac} < a.keep_rate
    """


@register("training_corpus_budgeted", oracle=_budgeted_corpus_oracle())
def training_corpus_budgeted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The water-filled allocation APPLIED: the budgeted corpus —
    every source thinned to its ``source_budget_allocation`` keep rate
    by the shared md5 hex-fraction draw (RNG-free, partitioning- and
    engine-independent; expected kept tokens per source = its
    allocation, so the whole corpus lands on the B-token budget in
    expectation). Saturated sources ride through at 100%. The same
    rates→corpus closure as ``training_corpus_resampled``, with
    allocation rates instead of pure temperature rates. Scale: the
    dimension-sized allocation broadcast back onto documents + a pure
    per-row filter."""
    from data_warehouse_product_mix_clustering_spark.plans.sql_api import _hex_fraction_sql

    rates = source_budget_allocation(spark, sf_dir).select("source", "keep_rate")
    docs = table(spark, "documents", sf_dir).select("doc_id", "source")
    frac = F.expr(_hex_fraction_sql("CAST(doc_id AS STRING)"))
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(frac < F.col("keep_rate"))
        .select("doc_id", "source", "keep_rate")
    )


# ---------------------------------------------------------------------------
# Applying the temperature weights: the resampled corpus (VERDICT r12 #6).
# `source_mixture_temperature` PRODUCES target weights; this query APPLIES
# them — the weights → corpus closure, the same move the LM gate made for
# scores → corpus.
# ---------------------------------------------------------------------------


def _temperature_keep_rates(per_src: DataFrame, alpha: float) -> DataFrame:
    """(source, keep_rate): the temperature downsampling rates over any
    (source, total_tokens) relation — each source's raw weight
    w = target_share/observed_share (target ∝ observedᵅ) normalized by
    the max so the rarest source keeps 100%. ONE definition of the
    temperature rule, shared by the registered
    ``training_corpus_resampled`` (rates over the raw documents) and the
    ``training_batches`` composition (rates over the GATED corpus).
    Dimension-sized input by contract; the windows run over |sources|
    rows. Rates 6-dp-snapped (ratio_round) so a last-ulp pow()
    divergence cannot flip a boundary doc on any engine."""
    w = Window.partitionBy()
    obs = F.col("total_tokens").cast("double") / F.sum("total_tokens").over(w)
    tgt = F.pow(obs, F.lit(alpha)) / F.sum(F.pow(obs, F.lit(alpha))).over(w)
    wts = per_src.select("source", (tgt / obs).alias("__w"))
    return wts.select(
        "source",
        ratio_round(F.col("__w") / F.max("__w").over(Window.partitionBy())).alias(
            "keep_rate"
        ),
    )


def _target_keep_rates(per_src: DataFrame, targets: DataFrame) -> DataFrame:
    """(source, keep_rate) for an EXPLICIT target mixture — the same
    w = target_share/observed_share, normalized-by-max rule as
    ``_temperature_keep_rates``, with the α-power target replaced by a
    given (source, target_share) relation (e.g. the DoReMi weights, so
    the loss-aware mixture drops into the same resample machinery as a
    recipe field). Observed shares are computed over the JOINED set, so
    a source the gate emptied cannot skew the distribution. Targets must
    COVER every gated source (ADVICE r15): a gated source missing from
    the weight relation would otherwise vanish from the resampled corpus
    silently (the temperature path keeps every source), so the plan
    raises at execution on the first uncovered source — a filter-guarded
    ``raise_error``, not a build-time count, so no extra job when
    coverage holds. Catalyst dependency (ADVICE r16): the guard relies
    on EliminateOuterJoin NOT null-evaluating the predicate — it must
    neither throw at planning time nor treat raise_error's unknown
    nullability as null-rejecting and convert the join to Inner (which
    would silently drop the uncovered source instead of raising).
    Verified on the pinned PySpark 4.1.2; the regression test asserts
    the optimized plan keeps the join LeftOuter so an optimizer upgrade
    fails loudly rather than silently. Inputs are dimension-sized by
    contract; rates 6-dp-snapped (the boundary-doc discipline)."""
    j = per_src.join(F.broadcast(targets), "source", "left").where(
        F.when(F.col("target_share").isNotNull(), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("_target_keep_rates: gated source "),
                    F.col("source"),
                    F.lit(
                        " has no target_share — the target mixture must"
                        " cover every gated source"
                    ),
                )
            )
        )
    )
    w = Window.partitionBy()
    obs = F.col("total_tokens").cast("double") / F.sum("total_tokens").over(w)
    wts = j.select("source", (F.col("target_share") / obs).alias("__w"))
    return wts.select(
        "source",
        ratio_round(F.col("__w") / F.max("__w").over(Window.partitionBy())).alias(
            "keep_rate"
        ),
    )


def _resampled_oracle() -> str:
    # The hex-fraction draw is the engine-portable uniform the weighted
    # sampler established (plans/sql_api.py::_hex_fraction_sql — an
    # explicit base-16 polynomial, no conv()/from_hex dialect split).
    from data_warehouse_product_mix_clustering_spark.plans.sql_api import _hex_fraction_sql

    frac = _hex_fraction_sql("CAST(doc_id AS STRING)")
    return f"""
        {_PER_SRC_CTE}
        , obs_cte AS (
            SELECT source,
                   CAST(total_tokens AS DOUBLE) / sum(total_tokens) OVER ()
                       AS obs
            FROM per_src
        ), wts AS (
            SELECT source,
                   (pow(obs, {MIXTURE_ALPHA})
                        / sum(pow(obs, {MIXTURE_ALPHA})) OVER ()) / obs AS w
            FROM obs_cte
        ), rates AS (
            SELECT source, {sql_ratio_round("w / max(w) OVER ()")} AS keep_rate
            FROM wts
        )
        SELECT d.doc_id, d.source, r.keep_rate
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE {frac} < r.keep_rate
    """


@register("training_corpus_resampled", oracle=_resampled_oracle())
def training_corpus_resampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The temperature-scaled mixture APPLIED: a deterministic per-source
    downsampled corpus realizing ``source_mixture_temperature``'s target
    shares (α = 0.5). Each source's keep rate is its sampling weight
    normalized by the maximum weight — the downsample-only realization:
    the rarest source keeps 100% and every other source is thinned so
    the expected kept-token share is ∝ target_share (∝ observedᵅ, the
    temperature recipe) at the largest corpus the rule allows. Doc
    selection is the content-hash rule the split / stratified-sample
    family uses — keep iff the md5(doc_id) fraction falls below the
    source's rate — RNG-free, partition-independent, identical in the
    oracle; the per-DOC draw never changes, though the RATES are
    data-derived, so corpus growth shifts thresholds by design (the
    mixture tracks the corpus, unlike doc_split's frozen fractions). The
    rate is snapped to 6 dp (ratio_round) on BOTH engines before the
    comparison so a last-ulp pow() divergence cannot flip a boundary doc.

    Scale: one scan for the |sources|-row weights relation (the
    ``_per_source_tokens`` base), broadcast-joined back onto documents;
    the filter is a pure per-row expression — zero extra shuffles beyond
    the dimension-sized groupBy. Pre-staged for r14 registration with
    ``_resampled_oracle()``."""
    from data_warehouse_product_mix_clustering_spark.plans.sql_api import _hex_fraction_sql

    rates = _temperature_keep_rates(_per_source_tokens(spark, sf_dir), MIXTURE_ALPHA)
    docs = table(spark, "documents", sf_dir).select("doc_id", "source")
    frac = F.expr(_hex_fraction_sql("CAST(doc_id AS STRING)"))
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(frac < F.col("keep_rate"))
        .select("doc_id", "source", "keep_rate")
    )


def _resampled_repeats_oracle() -> str:
    from data_warehouse_product_mix_clustering_spark.plans.sql_api import _hex_fraction_sql

    frac = _hex_fraction_sql("CAST(doc_id AS STRING)")
    return f"""
        {_PER_SRC_CTE}
        , obs_cte AS (
            SELECT source,
                   CAST(total_tokens AS DOUBLE) / sum(total_tokens) OVER ()
                       AS obs
            FROM per_src
        ), wts AS (
            SELECT source,
                   (pow(obs, {MIXTURE_ALPHA})
                        / sum(pow(obs, {MIXTURE_ALPHA})) OVER ()) / obs AS w
            FROM obs_cte
        ), rates AS (
            SELECT source, CAST(floor(w) AS BIGINT) AS base,
                   {sql_ratio_round("w - floor(w)")} AS frac_rate
            FROM wts
        ), per_doc AS (
            SELECT d.doc_id, d.source,
                   r.base + CASE WHEN {frac} < r.frac_rate
                                 THEN 1 ELSE 0 END AS n_copies
            FROM documents d JOIN rates r ON d.source = r.source
        )
        SELECT doc_id, source,
               CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_id
        FROM per_doc
        WHERE n_copies >= 1
    """


@register("training_corpus_resampled_repeats", oracle=_resampled_repeats_oracle())
def training_corpus_resampled_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The temperature mixture realized WITH UPSAMPLING — the
    multiple-epochs shape multilingual pretraining actually ships
    (rare sources repeat; ``training_corpus_resampled`` can only thin):
    each doc appears ``floor(w) + Bernoulli(frac(w))`` times, where
    ``w = target_share / observed_share`` is the raw temperature weight —
    so every source's EXPECTED emitted-token mass is exactly ``w × its
    corpus mass ∝ target share`` at unchanged total corpus scale. The
    Bernoulli draw is the same md5(doc_id) hex fraction as the
    downsampling variant (RNG-free, growth-stable, oracle-identical);
    the fractional rate is 6-dp-snapped on both engines so a last-ulp
    ``pow``/``floor`` divergence cannot flip a copy (and CANNOT flip the
    floor itself either: a weight straddling an integer boundary k∓ε
    yields base=k-1/frac≈1 on one engine and base=k/frac≈0 on the
    other — the same n_copies). One row per (doc, copy_id 1..n).

    Scale: the |sources|-row rates relation broadcasts; the explode is
    bounded by the OUTPUT size (Σ n_copies ≈ corpus size — temperature
    preserves total mass), never corpus × max-weight. The n_copies >= 1
    filter is load-bearing on the Spark side: ``sequence(1, 0)`` walks
    BACKWARD ([1, 0]) rather than returning empty, so zero-copy docs
    must be dropped before the explode (the oracle keeps the same
    predicate for row-set identity). Pre-staged for r14 registration
    with ``_resampled_repeats_oracle()``."""
    from data_warehouse_product_mix_clustering_spark.plans.sql_api import _hex_fraction_sql

    per_src = _per_source_tokens(spark, sf_dir)
    w = Window.partitionBy()
    obs = F.col("total_tokens").cast("double") / F.sum("total_tokens").over(w)
    tgt = F.pow(obs, F.lit(MIXTURE_ALPHA)) / F.sum(
        F.pow(obs, F.lit(MIXTURE_ALPHA))
    ).over(w)
    wts = per_src.select("source", (tgt / obs).alias("__w"))
    rates = wts.select(
        "source",
        F.floor("__w").cast("long").alias("__base"),
        ratio_round(F.col("__w") - F.floor("__w")).alias("__frac_rate"),
    )
    docs = table(spark, "documents", sf_dir).select("doc_id", "source")
    frac = F.expr(_hex_fraction_sql("CAST(doc_id AS STRING)"))
    per_doc = docs.join(F.broadcast(rates), "source").select(
        "doc_id",
        "source",
        (
            F.col("__base")
            + F.when(frac < F.col("__frac_rate"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_copies"),
    )
    return (
        per_doc.filter(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_id"),
        )
        .select("doc_id", "source", F.col("copy_id").cast("long").alias("copy_id"))
    )


def _interleaved_oracle() -> str:
    return f"""
        {_PER_SRC_CTE}
        , obs_cte AS (
            SELECT source, n_docs,
                   CAST(total_tokens AS DOUBLE) / sum(total_tokens) OVER ()
                       AS obs
            FROM per_src
        ), tgts AS (
            SELECT source,
                   pow(obs, {MIXTURE_ALPHA})
                       / sum(pow(obs, {MIXTURE_ALPHA})) OVER () AS tgt
            FROM obs_cte
        ), ranked AS (
            SELECT d.doc_id, d.source,
                   CAST(row_number() OVER (
                        PARTITION BY d.source
                        ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
                   ) AS BIGINT) AS rk,
                   t.tgt
            FROM documents d JOIN tgts t ON d.source = t.source
        ), keyed AS (
            SELECT doc_id, source,
                   {sql_ratio_round("(rk - 0.5e0) / tgt")} AS v_key
            FROM ranked
        )
        SELECT CAST(row_number() OVER (ORDER BY v_key, doc_id) AS BIGINT)
                   AS position,
               doc_id, source
        FROM keyed
    """


@register("training_corpus_interleaved", oracle=_interleaved_oracle())
def training_corpus_interleaved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The temperature mixture realized as a training ORDER — stride
    scheduling: training consumes ONE stream, and what makes a mixture
    real is that every PREFIX of that stream holds the target
    proportions (a corpus that is 30% code "on average" but front-loads
    it trains on a different curriculum than the recipe claims). Each
    source's docs get a deterministic within-source shuffle rank rk
    (md5 hash order), a virtual time v = (rk − ½) / target_share — the
    classic stride-scheduler rule: source s's k-th doc arrives when s
    has "earned" k slots — and the stream is the ascending-v order.
    Any prefix of length n then carries ≈ target_share × n docs of each
    source to within ±1 slot (stride's fairness bound), which the
    contract test pins empirically.

    Scale (and the reason this looks different from per_source_sample's
    window): BOTH ranks avoid a window funnel entirely. A
    ``partitionBy(source)`` window would sort ~1/|sources| of a 100 TB
    corpus on one partition per source; instead the within-source rank
    is the GLOBAL distributed rank over (source, hash, doc_id) — one
    ``with_rank_and_running`` pass — minus each source's broadcast
    doc-count offset (rows of one source are contiguous under
    source-major order, so global_rank − offset IS the per-source
    rank). The final position is a second distributed-rank pass over
    (v_key, doc_id). Two range-partitioned passes, two ≤P-row collects,
    zero global or per-source Window operators (plan-pinned). v is
    6-dp-snapped on both engines before ordering (ties broken by
    doc_id) so a last-ulp pow() divergence cannot swap neighbors.
    Pre-staged for r14 registration with ``_interleaved_oracle()``."""
    from data_warehouse_product_mix_clustering_spark.operators.packing import with_rank_and_running

    per_src = _per_source_tokens(spark, sf_dir)
    w = Window.partitionBy()
    obs = F.col("total_tokens").cast("double") / F.sum("total_tokens").over(w)
    tgt = F.pow(obs, F.lit(MIXTURE_ALPHA)) / F.sum(
        F.pow(obs, F.lit(MIXTURE_ALPHA))
    ).over(w)
    # (source, tgt): |sources| rows, broadcast below
    dim = per_src.select("source", tgt.alias("__tgt"))

    docs = table(spark, "documents", sf_dir).select(
        "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("__h")
    )
    ranked = _interleave_rank(
        docs, "source", [F.col("__h"), F.col("doc_id")], "__rk"
    ).drop("__h")
    keyed = (
        ranked.join(F.broadcast(dim), "source")
        .select(
            "doc_id",
            "source",
            ratio_round(
                (F.col("__rk") - F.lit(0.5)) / F.col("__tgt")
            ).alias("v_key"),
        )
        .withColumn("__one", F.lit(1).cast("long"))
    )
    return (
        with_rank_and_running(
            keyed,
            [F.col("v_key"), F.col("doc_id")],
            "__one",
            rank_col="position",
        )
        .select("position", "doc_id", "source")
    )

