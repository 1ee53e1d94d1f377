"""Multimodal (image / audio / video) column operators.

Payloads are opaque ``binary`` columns with typed metadata alongside
(the ``fetched`` table's input_hint shape: bytes, w, h, fmt, caption,
phash).  All heavy work runs as Arrow-batched ``mapInPandas`` — one
Python roundtrip per partition batch, never per row.

Codec reality in this container (no PIL/libjpeg/ffmpeg):
  * image decode is REAL for our corpus formats — the pure-numpy PNG
    codec in functions/images.py (the 'jpeg' rows use the documented
    stub codec, functions/images.py:10-16);
  * audio decode is REAL for WAV/PCM (stdlib wave + numpy,
    functions/audio.py); compressed audio and video frame-sampling are
    gated NotImplementedError stubs behind the same batch plumbing —
    the schema, partitioning, UDF signature and batch shape are real
    and tested; a deployment drops soundfile/ffmpeg into the marked
    dispatch slots.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zeno_spark.functions.images import decode_image, encode_image, phash64

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("brightness", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def image_features(images: DataFrame) -> DataFrame:
    """Decode image payloads and emit per-image features (mean channel
    values, brightness, recomputed phash).  Input needs (image_id, bytes,
    fmt); rows with null payloads are dropped.

    Scale shape: mapInPandas over the scan — embarrassingly parallel,
    no shuffle; Catalyst prunes the parquet read to the three columns.
    """
    src = images.select("image_id", "bytes", "fmt").filter(
        F.col("bytes").isNotNull()
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(data), fmt)
                means = px.astype(np.float64).mean(axis=(0, 1))
                rows.append(
                    {
                        "image_id": image_id,
                        "w": px.shape[1],
                        "h": px.shape[0],
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]),
                        "mean_b": float(means[2]),
                        "brightness": float(means.mean()),
                        "phash": phash64(px),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES.fields])

    return src.mapInPandas(_feat, schema=IMAGE_FEATURES)


RESIZED = T.StructType(
    [
        T.StructField("image_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
    ]
)


def resize_images(images: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize of every payload to (target_w, target_h),
    re-encoded in the source format.  Same batch plumbing as
    image_features; the interpolation kernel is the swap-in point for a
    real resampler."""
    src = images.select("image_id", "bytes", "fmt").filter(
        F.col("bytes").isNotNull()
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(data), fmt)
                h, w, _ = px.shape
                yi = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xi = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                out = px[yi][:, xi]
                rows.append(
                    {
                        "image_id": image_id,
                        "bytes": encode_image(out, fmt),
                        "w": target_w,
                        "h": target_h,
                        "fmt": fmt,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED.fields])

    return src.mapInPandas(_resize, schema=RESIZED)


# ---------------------------------------------------------------------------
# audio / video stubs — plumbing real, codec gated
# ---------------------------------------------------------------------------

AUDIO_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def decode_audio_batch(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """-> (samples float64 [-1,1] shape (frames, channels), rate).
    WAV/PCM decode is REAL (stdlib wave + numpy — functions/audio.py,
    the PNG-codec precedent); compressed formats stay gated: a
    deployment plugs soundfile/librosa into this dispatch."""
    if fmt == "wav":
        from zeno_spark.functions.audio import decode_wav

        return decode_wav(data)
    raise NotImplementedError(
        f"audio codec for {fmt!r} is not available in this environment; "
        "swap in soundfile.read at deployment"
    )


def audio_features(media: DataFrame) -> DataFrame:
    """Batch audio feature extraction over (media_id, bytes, fmt):
    sample counts, rate, duration, RMS level.  Runs end-to-end for WAV;
    other formats hit the gated decode."""
    src = media.select("media_id", "bytes", "fmt").filter(F.col("bytes").isNotNull())

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, data, fmt in zip(pdf["media_id"], pdf["bytes"], pdf["fmt"]):
                samples, rate = decode_audio_batch(bytes(data), fmt)
                rows.append(
                    {
                        "media_id": media_id,
                        "n_samples": int(samples.shape[0]),
                        "sample_rate": int(rate),
                        "channels": int(samples.shape[1]),
                        "duration_sec": float(samples.shape[0] / rate),
                        "rms": float(np.sqrt(np.mean(samples**2))),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES.fields])

    return src.mapInPandas(_feat, schema=AUDIO_FEATURES)


VIDEO_FRAMES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB frame sampler: one output row per sampled frame.  Decode is
    gated (no ffmpeg here); the explode-shaped output schema and the
    batch iterator are the real contract."""
    src = media.select("media_id", "bytes", "fmt").filter(F.col("bytes").isNotNull())

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for media_id, data, fmt in zip(pdf["media_id"], pdf["bytes"], pdf["fmt"]):
                raise NotImplementedError(
                    "video decoding unavailable in-sandbox; swap in "
                    "ffmpeg/pyav frame iteration at deployment"
                )
            yield pd.DataFrame(columns=[f.name for f in VIDEO_FRAMES.fields])

    return src.mapInPandas(_frames, schema=VIDEO_FRAMES)
