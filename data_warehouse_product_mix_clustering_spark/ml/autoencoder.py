"""Sequence-embedding stage (reference M5: LSTM autoencoder on quarterly
product sequences — notebooks/LSTM_features_learning.ipynb cells 14-22,
src/models/LSTM_Autoencoder.py:5-98).

PyTorch is not available in this environment, so the module is split:

- ``lstm_autoencoder_embeddings`` — the REAL path (train the 12-hidden-unit
  LSTM autoencoder on collected sequences, score via Arrow pandas_udf).
  Gated behind a torch import; raises ``NotImplementedError`` here.
- ``pooled_embeddings`` — the deterministic stand-in with the same output
  contract (12-d embedding per product): per feature (order_frequency,
  total_quantity, revenue) the [mean, population std, first, last] over the
  quarter-ordered sequence. Pure Spark SQL aggregates (arg-min/max by
  quarter), so it is ALSO oracle-checkable — unlike any trained model.

The downstream KMeans (M6) consumes either producer unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEQ_FEATURES = ["order_frequency", "total_quantity", "revenue"]
EMBEDDING_DIM = 12  # reference hidden size (LSTM_features_learning cell 17)

try:  # pragma: no cover - torch is not shipped in this environment
    import torch  # noqa: F401

    HAS_TORCH = True
except ImportError:
    HAS_TORCH = False


def lstm_autoencoder_embeddings(
    quarterly: DataFrame,
    hidden: int = EMBEDDING_DIM,
    epochs: int = 1000,
    batch_size: int = 16,
) -> DataFrame:
    """Train the reference's LSTM autoencoder and embed each sequence.

    Reference config: hidden=12, 1000 epochs, batch 16, AdamW(2e-3, wd=5e-4),
    masked-MSE over padded variable-length sequences
    (notebooks/LSTM_features_learning.ipynb cells 17-18). The corpus is tiny
    (hundreds of sequences) — train driver-side, score distributed via a
    pandas_udf applying the trained encoder.
    """
    if not HAS_TORCH:
        raise NotImplementedError(
            "STUB: the LSTM autoencoder needs PyTorch, which is not installed "
            "here; use pooled_embeddings (same 12-d output contract) instead."
        )
    raise NotImplementedError("torch present but trainer not wired up yet")


def pooled_embeddings(quarterly: DataFrame) -> DataFrame:
    """12-d deterministic sequence embedding: stats over the quarter order.

    For each of the 3 quarterly features: mean, population std (0 for
    length-1 sequences), first value, last value — first/last resolved with
    min_by/max_by on the quarter key, so the whole embedding is one hash
    aggregation (no sequence materialization, no Python).
    """
    aggs = []
    for f in SEQ_FEATURES:
        c = F.col(f).cast("double")
        aggs += [
            F.avg(c).alias(f"{f}_mean"),
            F.coalesce(F.stddev_pop(c), F.lit(0.0)).alias(f"{f}_std"),
            F.min_by(c, F.col("quarter_key")).alias(f"{f}_first"),
            F.max_by(c, F.col("quarter_key")).alias(f"{f}_last"),
        ]
    return quarterly.groupBy("product_id").agg(
        F.count(F.lit(1)).alias("seq_len"), *aggs
    )


EMBEDDING_COLS = [
    f"{f}_{stat}" for f in SEQ_FEATURES for stat in ("mean", "std", "first", "last")
]
