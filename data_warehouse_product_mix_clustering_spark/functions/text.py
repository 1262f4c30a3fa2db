"""Text-analysis column functions for the training-data pipeline surface.

Language-ID (stopword-hit heuristic), quality scoring (length / stopword
ratios), token counting (whitespace tokenizer + word n-grams), and document
fingerprinting (md5 over normalized text). Everything is built-in Spark SQL
expressions — JVM-side, whole-stage-codegen'd, zero Python UDFs — so the
same logic scales from the 500-row testdata to billions of documents.

Each Spark expression has a mirrored DuckDB SQL snippet (``sql_*``) so
queries over these functions stay oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------


def tokens(text: Column) -> Column:
    """Whitespace tokens, empty strings dropped."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != "")


def sql_tokens(expr: str) -> str:
    return f"list_filter(regexp_split_to_array(trim({expr}), '\\s+'), x -> x <> '')"


# BPE-ish pre-tokenization pattern (GPT-2-style, simplified to constructs
# Java regex and DuckDB/RE2 treat identically): common contractions, letter
# runs, 1-3-digit number chunks, single punctuation marks. Applied to
# lowered text; count of matches ≈ subword token count, the unit LLM data
# budgets are measured in (vs whitespace words, which undercount ~1.3×).
BPE_PATTERN = "'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]{1,3}|[^a-z0-9\\s]"


def bpe_tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), 0)


def sql_bpe_tokens(expr: str) -> str:
    quoted = BPE_PATTERN.replace("'", "''")
    return f"regexp_extract_all(lower({expr}), '{quoted}')"


def word_ngrams(toks_col: str, n: int = 2) -> Column:
    """Word n-gram shingles (space-joined) from a *named* token-array column.

    Takes the column name (not a Column) because the index arithmetic uses a
    SQL lambda; guard against size < n (Spark's ``sequence(1, 0)`` would
    count DOWN, not produce an empty array). NULL token arrays propagate
    NULL — matching ``sql_word_ngrams``'s DuckDB semantics (len(NULL) →
    NULL), so the two twins agree on every input (review r9; the old
    ELSE branch turned NULL into an empty array on the Spark side only).
    """
    if n == 1:
        return F.col(toks_col)
    return F.expr(
        f"CASE WHEN {toks_col} IS NULL THEN CAST(NULL AS array<string>) "
        f"WHEN size({toks_col}) >= {n} THEN "
        f"transform(sequence(1, size({toks_col}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({toks_col}, i, {n}))) "
        f"ELSE cast(array() AS array<string>) END"
    )


def sql_word_ngrams(toks_expr: str, n: int = 2) -> str:
    if n == 1:
        return toks_expr
    return (
        f"list_transform(range(1, len({toks_expr}) - {n - 2}),"
        f" i -> array_to_string(({toks_expr})[i:i+{n - 1}], ' '))"
    )


# ---------------------------------------------------------------------------
# Normalization + fingerprint (document identity for exact dedup)
# ---------------------------------------------------------------------------


def normalized_text(text: Column) -> Column:
    """lower → strip non-[a-z0-9 ] → collapse whitespace → trim."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), "[^a-z0-9 ]", ""), r"\s+", " "
        )
    )


def sql_normalized_text(expr: str) -> str:
    return (
        "trim(regexp_replace(regexp_replace(lower("
        + expr
        + "), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g'))"
    )


def fingerprint(text: Column) -> Column:
    """md5 of the normalized text — the exact-dedup key (rolling-hash class)."""
    return F.md5(normalized_text(text).cast("binary"))


def sql_fingerprint(expr: str) -> str:
    return f"md5({sql_normalized_text(expr)})"


# ---------------------------------------------------------------------------
# Stopwords / language ID / quality
# ---------------------------------------------------------------------------

STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "is", "in", "on", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "ein", "mit", "von"],
    "es": ["el", "la", "de", "los", "es", "un", "una", "con"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "avec"],
    "zh": ["de5", "shi4", "le5", "zai4"],  # pinyin-ish placeholders
}

LANGS = sorted(STOPWORDS)  # deterministic tie-break order


def stopword_hits(toks: Column, words: list[str]) -> Column:
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t)))


def sql_stopword_hits(toks_expr: str, words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks_expr}, t -> list_contains([{lst}], t)))"


def predicted_lang(toks: Column) -> Column:
    """argmax of per-language stopword hits; ties → alphabetical first;
    zero hits everywhere → 'und' (undetermined)."""
    hits = {lang: stopword_hits(toks, ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    for lang in reversed(LANGS):  # build CASE so earliest lang wins ties
        out = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return out


def sql_predicted_lang(toks_expr: str) -> str:
    hits = {lang: sql_stopword_hits(toks_expr, ws) for lang, ws in STOPWORDS.items()}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    clauses = "\n                 ".join(
        f"WHEN {best} > 0 AND {hits[lang]} = {best} THEN '{lang}'" for lang in LANGS
    )
    return f"(CASE {clauses} ELSE 'und' END)"


# ---------------------------------------------------------------------------
# Document quality score — ONE definition (round 8): the 0.5·stopword-ratio
# + 0.5·length-saturation formula previously existed in four Spark + four
# SQL copies (doc_quality, curriculum_stages, training_corpus +
# _sharded, dedup_best_of_group); a drift in any copy would silently
# desynchronize queries whose docstrings all claim "the doc_quality score".
# ---------------------------------------------------------------------------


def quality_score(toks: Column) -> Column:
    """Rounded doc-quality score over a token-array column:
    0.5·(en-stopword ratio) + 0.5·min(tokens, 50)/50. Callers must
    exclude empty token arrays (division by zero) as doc_quality does."""
    from data_warehouse_product_mix_clustering_spark.functions.numeric import ratio_round

    hits = stopword_hits(toks, STOPWORDS["en"]).cast("double")
    n = F.size(toks)
    return ratio_round(
        F.lit(0.5) * (hits / n) + F.lit(0.5) * (F.least(n, F.lit(50)) / F.lit(50.0))
    )


def sql_quality_score(toks_expr: str = "t") -> str:
    """DuckDB twin of ``quality_score`` over a token-list expression."""
    from data_warehouse_product_mix_clustering_spark.functions.numeric import sql_ratio_round

    return sql_ratio_round(
        f"0.5 * (CAST({sql_stopword_hits(toks_expr, STOPWORDS['en'])} AS DOUBLE)"
        f" / len({toks_expr})) + 0.5 * (least(len({toks_expr}), 50) / 50.0)"
    )
