"""Unigram language-model scoring — the perplexity-proxy quality filter
(CCNet's recipe uses a KenLM 5-gram; no LM library ships in this image,
so the honest distributed stand-in is the unigram LM, which already
separates gibberish/boilerplate from fluent text and is exactly
SQL-mirrorable for the oracle gate).

Shape: ONE corpus pass builds the (word, count) relation; additive
smoothing turns it into probabilities; scoring explodes each doc's
tokens, joins the probability relation on the word key (broadcast when
the vocabulary is small, shuffle otherwise — AQE's call), and averages
-log2 p per doc. At 100 TB both passes shuffle on the word and the
per-doc average is one groupBy — no Python anywhere.

Reference: no analogue in the reference repo (its text surface stops at
SQL feature engineering); extends the LLM-data-pipeline family
(SURVEY §2.11) next to the Gopher-style repetition metrics and the
stopword-ratio quality score.

Round-11 pre-stage: registration as an oracle-bearing query is deferred
(round 10 already carries its 10-new-query budget); the SQL twin below
mirrors the rule verbatim so the r11 registration is a paste.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    smoothing: float = 0.5,
) -> DataFrame:
    """(word, logp) — additive-smoothed unigram log2-probabilities over
    the whitespace tokenization of ``docs``: p(w) = (c_w + a) / (N + a·V)
    with a = ``smoothing``, V = |vocabulary|, N = total tokens. The two
    scalars (N, V) ride the relation as literals via a 1-row cross join —
    never collected."""
    from data_warehouse_product_mix_clustering_spark.functions.text import tokens

    words = docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).cast("long").alias("c"))
    totals = F.broadcast(
        counts.agg(
            F.sum("c").cast("double").alias("__n"),
            F.count(F.lit(1)).cast("double").alias("__v"),
        )
    )
    a = float(smoothing)
    return counts.crossJoin(totals).select(
        "word",
        F.log2(
            (F.col("c") + F.lit(a)) / (F.col("__n") + F.lit(a) * F.col("__v"))
        ).alias("logp"),
    )


def unigram_logprob_scores(
    docs: DataFrame,
    lm: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 0.5,
    round_out: int = 6,
) -> DataFrame:
    """Per-document perplexity proxy: (id, n_tokens, bits_per_token)
    where bits_per_token = -(1/n)·Σ log2 p(wᵢ) under ``lm`` (default: an
    LM fit on ``docs`` itself — self-scoring, the within-corpus outlier
    filter; pass a reference-corpus LM for CCNet-style cross-corpus
    filtering). Out-of-vocabulary words (possible only with an external
    ``lm``) take the LM's minimum logp as the floor (a 1-row scalar
    collect; an empty external LM raises). Empty docs are ABSENT (no tokens
    to score — the same drop rule as the quality score's len(t) > 0
    gate). Rounded to ``round_out`` dp with the repo's ratio_round nudge
    so both engines hash identically."""
    from data_warehouse_product_mix_clustering_spark.functions.numeric import ratio_round
    from data_warehouse_product_mix_clustering_spark.functions.text import tokens

    floor = None
    if lm is None:
        lm = unigram_lm(docs, text_col, smoothing)  # self: OOV impossible
    else:
        # Smallest logp is the best available floor for unseen words. A
        # 1-row scalar collect (contract-bounded, the PageRank-residual
        # class): carried on the LM rows it would be NULL exactly on the
        # OOV misses that need it, and an EMPTY external LM must fail
        # fast here, not silently NULL every score (review r10).
        floor = lm.agg(F.min("logp")).first()[0]
        if floor is None:
            raise ValueError(
                "unigram_logprob_scores: external lm has no rows — "
                "cannot derive an OOV floor"
            )
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    )
    joined = tok.join(lm.select("word", "logp"), "word", "left")
    lp = (
        F.coalesce(F.col("logp"), F.lit(float(floor)))
        if floor is not None
        else F.col("logp")
    )
    scored = joined.select(id_col, lp.alias("__lp"))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        ratio_round(-F.avg("__lp"), round_out).alias("bits_per_token"),
    )


# DuckDB twin of the self-scored rule, kept adjacent so the r11 oracle
# registration cannot drift from the operator (same discipline as
# functions/text.py's sql_* twins). {tokens} = sql_tokens('text').
SQL_UNIGRAM_SELF_SCORE = """
    WITH toks AS (
        SELECT doc_id, {tokens} AS t FROM documents
    ), tok AS (
        SELECT doc_id, unnest(t) AS word FROM toks
    ), counts AS (
        SELECT word, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1
    ), totals AS (
        SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v
        FROM counts
    ), lm AS (
        SELECT word, log2((c + {a}) / (n + {a} * v)) AS logp
        FROM counts, totals
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           {round_avg} AS bits_per_token
    FROM tok JOIN lm USING (word)
    GROUP BY doc_id
"""


def unigram_logprob_py(
    corpus: dict[int, list[str]], smoothing: float = 0.5
) -> dict[int, tuple[int, float]]:
    """Driver-side reference twin of the self-scored path for tests."""
    import math

    counts: dict[str, int] = {}
    for toks in corpus.values():
        for w in toks:
            counts[w] = counts.get(w, 0) + 1
    n = float(sum(counts.values()))
    v = float(len(counts))
    a = smoothing
    logp = {w: math.log2((c + a) / (n + a * v)) for w, c in counts.items()}
    out = {}
    for i, toks in corpus.items():
        if not toks:
            continue
        mean = sum(logp[w] for w in toks) / len(toks)
        out[i] = (len(toks), round(-mean + 1e-9, 6))
    return out
