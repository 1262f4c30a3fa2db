"""Multimodal-column operators: opaque ``binary`` payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or an object-store URI); metadata (format, byte size,
checksum) is typed columns computed JVM-side; decode / feature-extraction
runs as Arrow-batched ``mapInPandas`` so each Python worker sees columnar
batches, never a row at a time.

The container ships no codec libraries, so ``decode_media_batch`` uses a
clearly-marked deterministic fake decoder (seeded by the payload checksum);
``real_decode`` is the gated entry point that raises until a codec lib is
installed. The Spark-side plumbing — schema, batching, partitioning — is
real and is what the tests cover.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FRAME_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_format", StringType()),
        StructField("frame_index", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

_FORMATS = ["png", "wav", "mp4"]


def payload(text_col: Column) -> Column:
    """The opaque binary payload (here: utf-8 bytes of the doc text)."""
    return F.encode(text_col, "utf-8")


def media_format(id_col: Column) -> Column:
    """Deterministic per-row format tag (stand-in for a real format column)."""
    out = F.lit(_FORMATS[0])
    for i, fmt in enumerate(_FORMATS[1:], start=1):
        out = F.when(id_col % len(_FORMATS) == i, F.lit(fmt)).otherwise(out)
    return out


def real_decode(payload_bytes: bytes, fmt: str) -> dict:
    """Real codec path — requires PIL / soundfile / av, not shipped here."""
    raise NotImplementedError(
        "STUB: media decoding needs codec libraries (PIL/soundfile/av) that "
        "are not installed in this environment; the pipeline uses the "
        "deterministic fake decoder instead."
    )


def _fake_decode(payload_bytes: bytes, fmt: str) -> tuple[int, int, int]:
    """Deterministic fake decoder: (width, height, n_frames) from content.

    Seeded by payload bytes so results are stable across runs/engines —
    the decode STAND-IN that keeps the distributed plumbing testable.
    """
    h = 0
    for b in payload_bytes[:64]:
        h = (h * 131 + b) % (1 << 31)
    width = 16 + h % 48
    height = 16 + (h >> 8) % 48
    n_frames = 1 if fmt == "png" else 1 + (h >> 16) % 4
    return width, height, n_frames


def decode_media_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload → per-sampled-frame feature rows.

    Arrow hands columnar batches; each output row is one sampled frame with
    an 8-dim feature vector (byte-histogram moments of the frame's slice).
    """
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [],
            "media_format": [],
            "frame_index": [],
            "width": [],
            "height": [],
            "features": [],
        }
        for doc_id, fmt, data in zip(
            pdf["doc_id"], pdf["media_format"], pdf["payload"]
        ):
            raw = bytes(data)
            width, height, n_frames = _fake_decode(raw, fmt)
            stride = max(1, len(raw) // max(n_frames, 1))
            for fi in range(n_frames):
                chunk = raw[fi * stride : (fi + 1) * stride] or b"\x00"
                feats = []
                for j in range(8):
                    sl = chunk[j::8] or b"\x00"
                    feats.append(round(sum(sl) / len(sl) / 255.0, 6))
                out["doc_id"].append(doc_id)
                out["media_format"].append(fmt)
                out["frame_index"].append(fi)
                out["width"].append(width)
                out["height"].append(height)
                out["features"].append(feats)
        yield pd.DataFrame(out)


def frame_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Attach payload+format, then decode to per-frame features.

    Shape: narrow projection before the Python boundary (only id, format,
    payload cross into Arrow), explode happens inside the kernel.
    """
    media = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        media_format(F.col(id_col)).alias("media_format"),
        payload(F.col(text_col)).alias("payload"),
    )
    return media.mapInPandas(decode_media_batch, FRAME_FEATURES_SCHEMA)
