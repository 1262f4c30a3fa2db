"""Sequence-embedding stage (reference M5: LSTM autoencoder on quarterly
product sequences — notebooks/LSTM_features_learning.ipynb cells 14-22,
src/models/LSTM_Autoencoder.py:5-98).

Two producers with the same 12-d-per-product output shape:

- ``lstm_autoencoder_embeddings`` — the REAL learned path: the pure-NumPy
  LSTM autoencoder (ml/lstm_np.py; PyTorch is not shipped here and the
  corpus — one short sequence per product — doesn't need it). Scaler stats
  and scoring are distributed (Spark agg / Arrow ``mapInPandas`` with
  broadcast weights); only the sample-based training loop runs driver-side,
  which is also the correct 100 TB shape: models this size are trained on a
  sample and scored across the cluster.
- ``pooled_embeddings`` — the deterministic relational stand-in: per
  feature (order_frequency, total_quantity, revenue) the [mean, population
  std, first, last] over the quarter-ordered sequence. Pure Spark SQL
  aggregates, so it is ALSO oracle-checkable — unlike any trained model.

The downstream KMeans (M6) consumes either producer unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEQ_FEATURES = ["order_frequency", "total_quantity", "revenue"]
EMBEDDING_DIM = 12  # reference hidden size (LSTM_features_learning cell 17)


def _sequence_arrays(quarterly: DataFrame) -> DataFrame:
    """(product_id, seq_len, sequence) with the quarter-ordered struct array."""
    return quarterly.groupBy("product_id").agg(
        F.count(F.lit(1)).cast("long").alias("seq_len"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    "quarter_key", *[F.col(f).cast("double").alias(f) for f in SEQ_FEATURES]
                )
            )
        ).alias("sequence"),
    )


def lstm_autoencoder_embeddings(
    quarterly: DataFrame,
    hidden: int = EMBEDDING_DIM,
    epochs: int = 150,
    batch_size: int = 16,
    seed: int = 2,
    train_sample: int = 256,
    lr: float = 2e-3,
    weight_decay: float = 5e-4,
) -> DataFrame:
    """Train the LSTM autoencoder and embed every product's sequence.

    Reference config: hidden=12, batch 16, AdamW(2e-3, wd=5e-4), masked MSE
    over padded variable-length sequences, features standardized globally
    before training (notebooks/LSTM_features_learning.ipynb cells 17-18;
    the reference runs 1000 epochs — the default here is lower because the
    loss is already well past the pooled baseline, and callers can raise it).

    Distribution of work:
    - scaler mean/std: one Spark aggregate over the quarterly table (exact,
      population std — sklearn StandardScaler semantics);
    - training: the ``train_sample`` lowest product_ids (deterministic
      sample), collected and fit driver-side in NumPy;
    - scoring: ``mapInPandas`` over the sequence arrays with the trained
      weights broadcast — every product embedded in parallel, no
      per-row Python, Arrow-batched.

    Output: (product_id, seq_len, embedding array<double>[hidden]).
    """
    import numpy as np

    from data_warehouse_product_mix_clustering_spark.ml.lstm_np import LSTMAutoencoderNP

    n_feat = len(SEQ_FEATURES)
    stats = quarterly.select(
        *[F.avg(F.col(f).cast("double")).alias(f"{f}_mu") for f in SEQ_FEATURES],
        *[F.stddev_pop(F.col(f).cast("double")).alias(f"{f}_sd") for f in SEQ_FEATURES],
    ).first()
    mu = np.array([stats[f"{f}_mu"] for f in SEQ_FEATURES])
    sd = np.array([stats[f"{f}_sd"] or 1.0 for f in SEQ_FEATURES])
    sd[sd == 0.0] = 1.0

    # Materialized once: the train-sample collect AND the mapInPandas
    # scoring pass both consume this shuffle aggregation — without the
    # checkpoint the dominant shuffle runs twice (review r9).
    arrays = _sequence_arrays(quarterly).localCheckpoint(eager=True)

    def to_matrix(seq) -> np.ndarray:
        return (
            np.array([[row[f] for f in SEQ_FEATURES] for row in seq], dtype=np.float64)
            - mu
        ) / sd

    train_rows = (
        arrays.orderBy("product_id").limit(train_sample).select("sequence").collect()
    )
    model = LSTMAutoencoderNP(n_feat, hidden, seed=seed)
    model.fit(
        [to_matrix(r.sequence) for r in train_rows],
        epochs=epochs,
        batch_size=batch_size,
        lr=lr,
        weight_decay=weight_decay,
    )

    spark = quarterly.sparkSession
    bweights = spark.sparkContext.broadcast(model.export_weights())
    bscale = spark.sparkContext.broadcast((mu, sd))

    def score(batches):
        import pandas as pd

        scorer = LSTMAutoencoderNP.from_weights(bweights.value, n_feat, hidden)
        smu, ssd = bscale.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seqs = [
                (
                    np.array(
                        [[row[f] for f in SEQ_FEATURES] for row in seq],
                        dtype=np.float64,
                    )
                    - smu
                )
                / ssd
                for seq in pdf["sequence"]
            ]
            emb = np.round(scorer.encode(seqs), 6)
            yield pd.DataFrame(
                {
                    "product_id": pdf["product_id"],
                    "seq_len": pdf["seq_len"],
                    "embedding": list(emb),
                }
            )

    id_type = arrays.schema["product_id"].dataType.simpleString()
    return arrays.mapInPandas(
        score, f"product_id {id_type}, seq_len long, embedding array<double>"
    )


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
