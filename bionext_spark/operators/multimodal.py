"""Multimodal column operators: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
kernels over ``mapInPandas``. The Spark-side plumbing — schema,
partition-preserving batch shape, deterministic fake features for tests —
is real; the codec calls are import-gated per modality (`decode_real`
dispatches to the PIL image hook, the soundfile audio hook, the
imageio/pyav video hook) and `decode_stub` is the deterministic default
in codec-free environments like this image. Every path returns the same
8-float [-1, 1] feature contract, so the operator plumbing is
modality-agnostic; the gated hooks are executed in-image against fake
codec shims (tests/test_multimodal.py).

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


def _decode_audio(payload: bytes, fmt: str) -> list[float]:
    """Real audio hook — soundfile-backed, import-gated like `_decode_image`.

    With soundfile installed, decodes the payload, downmixes to mono and
    returns an 8-bin RMS envelope scaled to [-1, 1] — the same 8-float
    shape/range contract as every other decode path, so the Spark
    plumbing is modality-agnostic. Without soundfile (this image) it
    raises NotImplementedError; tests exercise the full code path against
    a fake soundfile shim (the HF-shim pattern, tests/test_multimodal.py)."""
    try:
        import soundfile as sf  # noqa: PLC0415 - extras gate
    except ImportError as e:
        raise NotImplementedError(
            "audio codecs are not installed in this environment; install "
            "soundfile (libsndfile) on a real cluster"
        ) from e
    import io

    import numpy as np

    data, _rate = sf.read(io.BytesIO(payload))
    x = np.asarray(data, dtype="float64")
    if x.ndim > 1:
        x = x.mean(axis=1)  # downmix channels
    if x.size == 0:
        return [0.0] * 8
    bins = np.array_split(x, 8)
    return [
        float(min(1.0, np.sqrt(float((b**2).mean())) if b.size else 0.0) * 2.0 - 1.0)
        for b in bins
    ]


def _decode_video(payload: bytes, fmt: str) -> list[float]:
    """Real video hook — imageio-backed (pyav/ffmpeg plugin), import-gated.

    Decodes the FIRST frame, grayscales, average-pools to 4×2 and scales
    to [-1, 1] — identical contract to `_decode_image`, so a video is 'an
    image per sampled frame' to the rest of the engine (frame selection is
    the relational `sample_frames` plan, which never touches bytes)."""
    try:
        import imageio.v3 as iio  # noqa: PLC0415 - extras gate
    except ImportError as e:
        raise NotImplementedError(
            "video codecs are not installed in this environment; install "
            "imageio[pyav] (ffmpeg) on a real cluster"
        ) from e
    import numpy as np

    frame = next(iter(iio.imiter(payload, extension=f".{fmt}")), None)
    if frame is None:
        raise ValueError(f"video payload decoded to zero frames (format {fmt!r})")
    arr = np.asarray(frame, dtype="float64")
    if arr.ndim == 3:
        arr = arr.mean(axis=2)  # grayscale
    h, w = arr.shape
    if h < 2 or w < 4:
        # frames smaller than the 2x4 pool grid would produce empty slices
        # whose mean() is NaN, violating the 8-float [-1, 1] contract
        # (ADVICE r5) — fall back to the whole-frame mean for all 8 bins
        pooled = [float(arr.mean())] * 8
    else:
        pooled = [
            float(arr[r * h // 2 : (r + 1) * h // 2, c * w // 4 : (c + 1) * w // 4].mean())
            for r in range(2)
            for c in range(4)
        ]
    return [p / 127.5 - 1.0 for p in pooled]


IMAGE_FORMATS = {"png", "jpeg", "jpg", "gif", "bmp", "webp"}
AUDIO_FORMATS = {"wav", "flac", "ogg", "mp3"}
VIDEO_FORMATS = {"mp4", "webm", "mkv", "avi"}


def decode_real(payload: bytes, fmt: str) -> list[float]:
    """Format-dispatched real decode: every modality returns the same
    8-float [-1, 1] feature contract, each behind its own extras gate."""
    if fmt in IMAGE_FORMATS:
        return _decode_image(payload, fmt)
    if fmt in AUDIO_FORMATS:
        return _decode_audio(payload, fmt)
    if fmt in VIDEO_FORMATS:
        return _decode_video(payload, fmt)
    raise NotImplementedError(f"unknown media format {fmt!r}")


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
                    feats.append(decode_real(bytes(payload), fmt))
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
