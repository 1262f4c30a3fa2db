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
    BinaryType,
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


def make_decode_kernel(sample_every: int = 1):
    """mapInPandas kernel factory: payload → per-sampled-frame feature rows.

    ``sample_every`` is the frame-sampling rate (keep frames 0, k, 2k, …) —
    the standard video knob: decode cost scales 1/k while coverage stays
    uniform. Arrow hands columnar batches; each output row is one kept
    frame with an 8-dim feature vector (byte-histogram moments).
    """

    def decode_media_batch(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
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
                for fi in range(0, n_frames, sample_every):
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

    return decode_media_batch


def frame_features(
    df: DataFrame, id_col: str, text_col: str, sample_every: int = 1
) -> DataFrame:
    """Attach payload+format, then decode to per-(sampled-)frame features.

    Shape: narrow projection before the Python boundary (only id, format,
    payload cross into Arrow), explode happens inside the kernel.
    """
    media = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        media_format(F.col(id_col)).alias("media_format"),
        payload(F.col(text_col)).alias("payload"),
    )
    return media.mapInPandas(make_decode_kernel(sample_every), FRAME_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)


def _fake_resize(raw: bytes, fmt: str, width: int, height: int) -> bytes:
    """Deterministic stand-in for a decode→resample→encode round trip:
    resamples the payload bytes to exactly width×height by nearest index.
    ``real_decode`` is the gated entry for the true codec path."""
    n = max(1, width * height)
    src = raw or b"\x00"
    step = len(src) / n
    return bytes(src[min(int(i * step), len(src) - 1)] for i in range(n))


def resize_media(
    df: DataFrame, id_col: str, text_col: str, width: int = 32, height: int = 32
) -> DataFrame:
    """Resize plumbing: binary in → binary out at a fixed target size.

    The transform every multimodal training pipeline runs before batching
    (uniform tensor shapes). Kernel is the deterministic fake resampler
    (codec libs gated behind ``real_decode``); the Spark side — narrow
    Arrow crossing, binary output column, typed size metadata — is real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                _fake_resize(bytes(d), f, width, height)
                for d, f in zip(pdf["payload"], pdf["media_format"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_format": pdf["media_format"],
                    "width": width,
                    "height": height,
                    "payload": resized,
                    "n_bytes": [len(r) for r in resized],
                }
            )

    media = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        media_format(F.col(id_col)).alias("media_format"),
        payload(F.col(text_col)).alias("payload"),
    )
    return media.mapInPandas(kernel, RESIZED_SCHEMA)
