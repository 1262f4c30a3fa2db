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


@register(
    "media_frame_features",
    oracle="""
        WITH meta AS (
          SELECT doc_id,
                 CASE CAST(doc_id % 3 AS INTEGER)
                      WHEN 1 THEN 'wav' WHEN 2 THEN 'mp4' ELSE 'png' END
                     AS media_format,
                 hex(encode(text)) AS hx,
                 octet_length(encode(text)) AS len
          FROM documents
        ), bytes AS (
          SELECT doc_id, media_format, len,
                 list_transform(range(0, len),
                   i -> (strpos('0123456789ABCDEF',
                                substring(hx, CAST(2*i+1 AS INTEGER), 1))-1)*16
                      + strpos('0123456789ABCDEF',
                               substring(hx, CAST(2*i+2 AS INTEGER), 1)) - 1) AS bl
          FROM meta
        ), hashed AS (
          SELECT doc_id, media_format, len, bl,
                 list_reduce(list_prepend(CAST(0 AS BIGINT), bl[1:least(64, len)]),
                             (a, x) -> (a*131 + x) % 2147483648) AS h
          FROM bytes
        ), dims AS (
          SELECT doc_id, media_format, len, bl,
                 16 + h % 48 AS width,
                 16 + (h // 256) % 48 AS height,
                 CASE WHEN media_format = 'png' THEN 1
                      ELSE 1 + (h // 65536) % 4 END AS n_frames
          FROM hashed
        ), frames AS (
          SELECT doc_id, media_format, width, height, len, bl,
                 unnest(range(0, n_frames)) AS frame_index,
                 greatest(1, len // n_frames) AS stride
          FROM dims
        ), chunks AS (
          SELECT doc_id, media_format, frame_index, width, height,
                 CASE WHEN len(c0) = 0 THEN [CAST(0 AS BIGINT)] ELSE c0 END AS chunk
          FROM (
            SELECT *, bl[CAST(frame_index*stride+1 AS INTEGER)
                       : CAST(least((frame_index+1)*stride, len) AS INTEGER)] AS c0
            FROM frames
          )
        )
        SELECT doc_id, media_format,
               CAST(frame_index AS BIGINT) AS frame_index,
               CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
               array_to_string(
                 list_transform(range(0, 8), j ->
                   CAST(CASE WHEN len(list_transform(
                                 range(CAST(j AS INTEGER), CAST(len(chunk) AS INTEGER), 8),
                                 k -> chunk[CAST(k+1 AS INTEGER)])) = 0
                        THEN 0
                        ELSE round(round(
                               CAST(list_sum(list_transform(
                                 range(CAST(j AS INTEGER), CAST(len(chunk) AS INTEGER), 8),
                                 k -> chunk[CAST(k+1 AS INTEGER)])) AS DOUBLE)
                               / len(list_transform(
                                 range(CAST(j AS INTEGER), CAST(len(chunk) AS INTEGER), 8),
                                 k -> chunk[CAST(k+1 AS INTEGER)]))
                               / 255.0 + 1e-9, 6) * 1000000)
                        END AS BIGINT)::VARCHAR),
                 ',') AS features
        FROM chunks
    """,
)
def media_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + frame-sample + featurize via Arrow-batched mapInPandas —
    now HASH-CHECKED, not rows-only.

    The synthetic corpus takes the deterministic fake-decoder path (text
    payloads carry no codec magic), which makes every output row a pure
    function of (doc_id, payload bytes) — and that function is SQL:
    the oracle re-states the 64-byte polynomial hash (list_reduce), the
    derived dimensions, the frame chunking, and the 8 strided byte-mean
    features, byte-extracted in DuckDB via hex()+strpos arithmetic. The
    REAL decode paths (PNG zlib inflate, WAV RIFF parse) are attested by
    test_png_decoder_roundtrip / media_wav_metadata.

    Features serialize as micro-int CSV (×1e6) at the query boundary:
    integer strings hash identically across engines, whereas float JSON
    formatting differs (Java scientific notation under 1e-3).
    """
    ff = frame_features(table(spark, "documents", sf_dir), "doc_id", "text")
    return ff.select(
        "doc_id",
        "media_format",
        F.col("frame_index").cast("long").alias("frame_index"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.array_join(
            F.transform(
                "features", lambda f: F.round(f * 1e6).cast("long").cast("string")
            ),
            ",",
        ).alias("features"),
    )


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


@register(
    "media_resized",
    oracle="""
        WITH meta AS (
          SELECT doc_id,
                 CASE CAST(doc_id % 3 AS INTEGER)
                      WHEN 1 THEN 'wav' WHEN 2 THEN 'mp4' ELSE 'png' END
                     AS media_format,
                 hex(encode(text)) AS hx,
                 octet_length(encode(text)) AS len
          FROM documents
        ), bytes AS (
          SELECT doc_id, media_format,
                 greatest(len, 1) AS glen,
                 CASE WHEN len = 0 THEN [CAST(0 AS BIGINT)]
                      ELSE list_transform(range(0, len),
                        i -> (strpos('0123456789ABCDEF',
                                     substring(hx, CAST(2*i+1 AS INTEGER), 1))-1)*16
                           + strpos('0123456789ABCDEF',
                                    substring(hx, CAST(2*i+2 AS INTEGER), 1)) - 1)
                 END AS bl
          FROM meta
        )
        SELECT doc_id, media_format,
               CAST(32 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height,
               CAST(1024 AS BIGINT) AS n_bytes,
               array_to_string(list_transform(range(0, 1024),
                 i -> printf('%02X',
                        bl[CAST(least(i * glen // 1024, glen - 1) + 1
                                AS INTEGER)])), '') AS payload_hex
        FROM bytes
    """,
)
def media_resized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: every payload resampled to a uniform 32×32 target —
    now HASH-CHECKED, not rows-only (the ``media_frame_features`` oracle
    technique extended to the resize OUTPUT bytes).

    The synthetic corpus takes the deterministic fake-resample path (text
    payloads carry no codec magic), whose output byte ``i`` is exactly
    ``src[min((i·len)//1024, len−1)]`` — ``len/1024`` is a power-of-two
    division, so the kernel's float arithmetic is exact and the index is
    pure integer math the oracle restates (hex()+strpos byte extraction,
    printf('%02X') re-encoding). The query serializes the resized payload
    as an uppercase hex string at the boundary: binary columns don't
    hash-compare across engines, hex strings do. The REAL 2-D resample
    path (``_real_resize`` over genuine PNG/WAV pixels) is pinned by
    test_real_png_through_spark_kernels in tests/test_operators.py.
    """
    from data_warehouse_product_mix_clustering_spark.operators.media import resize_media

    resized = resize_media(table(spark, "documents", sf_dir), "doc_id", "text")
    return resized.select(
        "doc_id",
        "media_format",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "n_bytes",
        F.hex("payload").alias("payload_hex"),
    )
