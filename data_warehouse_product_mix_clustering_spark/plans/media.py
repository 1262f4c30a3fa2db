"""Multimodal-column queries (training-data surface, new capability).

``media_metadata`` computes typed metadata over the opaque binary payload
entirely JVM-side (oracle-checked); ``media_frame_features`` crosses the
Arrow boundary once into the deterministic fake decoder (rows-only check —
the kernel is Python, not SQL-expressible; determinism is unit-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_warehouse_product_mix_clustering_spark.operators.media import frame_features, media_format, payload
from data_warehouse_product_mix_clustering_spark.plans.registry import register
from data_warehouse_product_mix_clustering_spark.sources.registry import table


@register(
    "media_metadata",
    oracle="""
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INTEGER)
                    WHEN 1 THEN 'wav' WHEN 2 THEN 'mp4' ELSE 'png' END
                   AS media_format,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS checksum
        FROM documents
    """,
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads: format, size, checksum.

    Pure JVM expressions over the binary column — the 100 TB shape for
    metadata extraction (no decode, no Python).
    """
    docs = table(spark, "documents", sf_dir)
    p = payload(F.col("text"))
    return docs.select(
        "doc_id",
        media_format(F.col("doc_id")).alias("media_format"),
        F.octet_length(p).cast("long").alias("n_bytes"),
        F.md5(p).alias("checksum"),
    )


@register("media_frame_features")
def media_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + frame-sample + featurize via Arrow-batched mapInPandas.

    The decode step is the deterministic fake (codec libs not shipped —
    operators/media.py:real_decode is the gated real path); the plumbing
    (schema, batch shape, one narrow Python crossing) is the real design.
    The 8-dim feature vector is serialized to JSON at the query boundary
    so the driver's canonicalizer can sort/hash the result (values are
    6-decimal rounded in the kernel); the array form stays available via
    operators.media.frame_features.
    """
    ff = frame_features(table(spark, "documents", sf_dir), "doc_id", "text")
    return ff.withColumn("features", F.to_json("features"))


@register(
    "media_wav_metadata",
    oracle="""
        SELECT doc_id,
               CAST(8000 + 4000 * (doc_id % 3) AS BIGINT) AS sample_rate,
               CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
               CAST(8 AS BIGINT) AS bits_per_sample,
               CAST(octet_length(encode(text)) // (1 + doc_id % 2) AS BIGINT)
                   AS n_samples,
               CAST((octet_length(encode(text)) // (1 + doc_id % 2)) * 1000
                    // (8000 + 4000 * (doc_id % 3)) AS BIGINT) AS duration_ms
        FROM documents
    """,
)
def media_wav_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV decode, driver-attested via an encode→decode round trip.

    Each document's utf-8 bytes become 8-bit PCM in a WAV container
    (stdlib ``wave`` writer, per-row rate/channel parameters derived from
    doc_id), then operators.media._decode_wav parses the RIFF/fmt/data
    header back. The oracle states the closed-form expectation for every
    decoded field, so the decoder itself is under the hash gate — unlike
    a fake-decoder row, a header-parse bug here turns the driver row red.
    """
    from data_warehouse_product_mix_clustering_spark.operators.media import wav_roundtrip

    return wav_roundtrip(table(spark, "documents", sf_dir), "doc_id", "text")


@register("media_resized")
def media_resized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: every payload resampled to a uniform 32×32 target.

    Binary-in/binary-out ``mapInPandas`` with typed size metadata — the
    batch-prep step of a multimodal training pipeline. Binary output ⇒
    rows-only driver check; determinism + exact output size are pinned in
    tests/test_operators.py.
    """
    from data_warehouse_product_mix_clustering_spark.operators.media import resize_media

    return resize_media(table(spark, "documents", sf_dir), "doc_id", "text")
