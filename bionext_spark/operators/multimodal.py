"""Multimodal column operators: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
kernels over ``mapInPandas``. The Spark-side plumbing — schema,
partition-preserving batch shape, deterministic fake features for tests —
is real; the actual codec calls are stubbed (`decode_stub`) because no
image/audio library ships in this environment: swap `_decode_image` for a
PIL/libvips call and the operator contract is unchanged.

Scale notes: payload bytes never shuffle through these ops (all are
narrow mapInPandas); metadata-only projections prune the binary column at
the parquet scan, so "count images by format" never reads pixels.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes, metadata
    derived from the id (no external data)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                bytearray(payload),
                {"format": ["png", "jpeg", "wav"][i % 3], "width": 32 + i % 64, "height": 32 + (i * 7) % 64, "n_frames": 1 + i % 24},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image(payload: bytes, fmt: str) -> list[float]:
    """Real codec hook — PIL-backed, import-gated like the torch adapters.

    With Pillow installed (a real cluster), decodes the payload, grayscales
    and resizes to 4×2, and returns the 8 pixels scaled to [-1, 1] — the
    same shape/range contract as ``decode_stub``, so the surrounding Spark
    plumbing (schema, batching, partitioning) is identical on both paths.
    Without Pillow (this image) it raises NotImplementedError and the
    deterministic stub remains the default."""
    try:
        from PIL import Image  # noqa: PLC0415 - extras gate
    except ImportError as e:  # pragma: no cover - Pillow absent here
        raise NotImplementedError(
            "image codecs are not installed in this environment; install "
            "Pillow (or swap in libvips/soundfile) on a real cluster"
        ) from e
    import io

    img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 2))
    return [p / 127.5 - 1.0 for p in img.getdata()]


def decode_stub(payload: bytes, fmt: str) -> list[float]:
    """Deterministic fake 'decoded features': 8 floats from the payload
    digest — keeps the full Spark plumbing testable without codecs."""
    d = hashlib.md5(payload).digest()
    return [v / 2**31 - 1.0 for v in _struct.unpack(">8I", d + d)]


def extract_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """payload → feature vector (Arrow-batched; binary column stays
    executor-local, never collected)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                fmt = meta["format"] if meta is not None else "unknown"
                if use_real_codec:
                    feats.append(_decode_image(bytes(payload), fmt))
                else:
                    feats.append(decode_stub(bytes(payload), fmt))
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(gen, "media_id long, features array<double>")


def sample_frames(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame index —
    pure relational (sequence + explode), no Python."""
    return media.select(
        "media_id",
        F.col("meta.n_frames").alias("n_frames"),
        F.explode(F.expr(f"sequence(0, greatest(0, meta.n_frames - 1), {every_k})")).alias(
            "frame_idx"
        ),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only projection: never touches payload bytes (column
    pruning keeps the binary column out of the scan)."""
    return media.groupBy(F.col("meta.format").alias("format")).agg(
        F.count("*").alias("n"),
        F.avg(F.col("meta.width") * F.col("meta.height")).alias("avg_pixels"),
        F.sum("meta.n_frames").alias("total_frames"),
    )
