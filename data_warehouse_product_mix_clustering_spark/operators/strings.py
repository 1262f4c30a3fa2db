"""Scalable string-similarity join: edit-distance pairs via the classic
q-gram prefix filter (ED-Join / AllPairs family), all in JVM expressions.

The reference's only fuzzy matching is a driver-side contains/levenshtein
scan over one table (mirrored by `product_fuzzy_search`); an entity-
resolution pipeline needs the JOIN form — every (probe, corpus) pair
within edit distance k — without the all-pairs cross join. The standard
filter stack makes that near-linear:

- **count filter**: one edit changes at most ``q`` of a string's distinct
  content q-grams (position shifts don't change gram CONTENT), so a pair
  within distance k shares ≥ max(|Ga|,|Gb|) − k·q grams;
- **prefix filter**: order all grams by one global total order (corpus
  document frequency ascending — rarest first — then the gram itself);
  if two sets overlap in ≥ t elements, their (size − t + 1)-prefixes
  intersect. With t ≥ |G| − k·q per side, a prefix of the ``k·q + 1``
  RAREST grams per string suffices — so candidate generation is a join
  on rare-gram postings, never on ubiquitous grams;
- **short-string fallback**: a string with ≤ k·q grams has a vacuous
  count filter (every gram may change), so short×short pairs are joined
  by a length band instead — bounded, because "short" means
  ``len < q·(k+1)``;
- **verify**: surviving candidates pass a length filter and an exact
  ``levenshtein`` recheck (JVM built-in), so the output is EXACTLY the
  brute-force pair set.

At 100 TB: the gram-frequency table is bounded by the q-gram vocabulary
(tiny for char grams — broadcast), prefix postings are k·q+1 rows per
string, and the only shuffle joins those postings on rare grams whose
postings lists the frequency order deliberately keeps small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _distinct_grams(col, q: int):
    """Distinct content q-grams of a string column (JVM lambda, no UDF).

    Strings shorter than ``q`` yield the EMPTY set explicitly:
    ``sequence(1, 0)`` would infer step −1 and produce positions [1, 0]
    (phantom sub-q grams that pollute the document frequencies — review
    r9), so the expression is gated on length ≥ q.
    """
    return F.when(
        F.length(col) >= q,
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, length({col}) - {q - 1}),"
                f" i -> substring({col}, i, {q}))"
            )
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def edit_distance_join(
    probe: DataFrame,
    corpus: DataFrame,
    probe_id: str,
    corpus_id: str,
    probe_col: str,
    corpus_col: str,
    max_dist: int = 2,
    q: int = 2,
    strategy: str = "prefix",
) -> DataFrame:
    """All (probe, corpus) rows with ``levenshtein ≤ max_dist`` —
    exact result either way; ``strategy`` picks the plan by cardinality:

    - ``"prefix"`` (default): the filter stack above — the
      both-sides-large plan, near-linear in postings;
    - ``"broadcast"``: broadcast the PROBE and verify every corpus row
      against it with the length band + THRESHOLDED levenshtein
      (``levenshtein(a, b, k)`` early-exits once the distance exceeds
      k — a fraction of the full DP). A deliberate bounded nested-loop:
      when one side is a small batch (entity-resolution probes against
      a corpus), one corpus scan with no shuffle beats building prefix
      postings — measured 3.6 s vs 9 s at sf0.1 on the adversarial
      digit-vocabulary names. Pick it iff the probe side broadcasts.

    Returns (probe_id, corpus_id, <probe_col>, <corpus_col>, distance);
    output column names are the input id/text column names, so they must
    differ between the two sides.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1 (use an equi-join for 0)")
    if q < 2:
        raise ValueError("q must be >= 2")
    if strategy not in ("prefix", "broadcast"):
        raise ValueError(f"strategy must be 'prefix' or 'broadcast', got {strategy!r}")
    names = {probe_id, probe_col} & {corpus_id, corpus_col}
    if names:
        raise ValueError(f"probe/corpus column names must differ; shared: {sorted(names)}")
    if strategy == "broadcast":
        dist = F.levenshtein(F.col(probe_col), F.col(corpus_col), max_dist)
        return (
            corpus.join(
                F.broadcast(probe),
                (
                    F.abs(F.length(probe_col) - F.length(corpus_col)) <= max_dist
                )
                & (dist >= 0),  # thresholded: -1 means "> max_dist"
            )
            .select(
                probe_id,
                corpus_id,
                probe_col,
                corpus_col,
                dist.cast("long").alias("distance"),
            )
        )
    kq = max_dist * q
    short_len = q * (max_dist + 1)  # below this, the count filter is vacuous

    p = probe.select(
        F.col(probe_id), F.col(probe_col), _distinct_grams(probe_col, q).alias("__g")
    )
    c = corpus.select(
        F.col(corpus_id), F.col(corpus_col), _distinct_grams(corpus_col, q).alias("__g")
    )

    # One global gram order: corpus+probe document frequency asc, gram asc.
    # The vocabulary is bounded (char q-grams), so it broadcasts.
    grams_all = (
        p.select(F.explode("__g").alias("__gram"))
        .unionByName(c.select(F.explode("__g").alias("__gram")))
        .groupBy("__gram")
        .agg(F.count(F.lit(1)).alias("__df"))
    )

    def prefix_postings(side: DataFrame, id_col: str) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy("__df", "__gram")
        return (
            side.select(F.col(id_col), F.explode("__g").alias("__gram"))
            .join(F.broadcast(grams_all), "__gram")
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= kq + 1)
            .select(id_col, "__gram")
        )

    cand_long = (
        prefix_postings(p, probe_id)
        .join(prefix_postings(c, corpus_id), "__gram")
        .select(probe_id, corpus_id)
        .distinct()
    )
    # short×short arm: both sides' count filters are vacuous, but both
    # strings are < q·(k+1) chars. Block on DISTINCT short strings — the
    # distinct vocabulary is bounded (≤ alphabet^short_len) even when the
    # short ROW count is not, so the broadcast and the near cross-join
    # stay bounded regardless of corpus skew toward short strings
    # (ADVICE r9); matched string pairs then join back to ids.
    shorts_p = p.filter(F.length(probe_col) < short_len).select(probe_id, probe_col)
    shorts_c = c.filter(F.length(corpus_col) < short_len).select(corpus_id, corpus_col)
    short_dist = F.levenshtein(F.col(probe_col), F.col(corpus_col), max_dist)
    str_pairs = (
        shorts_p.select(probe_col)
        .distinct()
        .join(
            F.broadcast(shorts_c.select(corpus_col).distinct()),
            F.abs(F.length(probe_col) - F.length(corpus_col)) <= max_dist,
        )
        # verify at distinct-string granularity so only TRUE matches
        # expand back to id pairs (the shared verify below re-checks)
        .filter(short_dist >= 0)
    )
    cand_short = (
        str_pairs.join(shorts_p, probe_col)
        .join(shorts_c, corpus_col)
        .select(probe_id, corpus_id)
    )
    cands = cand_long.unionByName(cand_short).distinct()

    # thresholded levenshtein (-1 when > max_dist): the verify step's DP
    # early-exits on the (dominant) non-matching candidates
    dist = F.levenshtein(F.col(probe_col), F.col(corpus_col), max_dist)
    return (
        cands.join(p.select(probe_id, probe_col), probe_id)
        .join(c.select(corpus_id, corpus_col), corpus_id)
        .filter(
            (
                F.abs(F.length(probe_col) - F.length(corpus_col)) <= max_dist
            )
            & (dist >= 0)
        )
        .select(
            probe_id,
            corpus_id,
            probe_col,
            corpus_col,
            dist.cast("long").alias("distance"),
        )
    )
