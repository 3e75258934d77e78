"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2C C6).

Media travel as opaque ``BinaryType`` columns next to typed metadata —
exactly how a 100 TB training corpus stores them in Parquet/Lance-style
row groups. The Spark-side machinery here is real and tested: schemas,
Arrow-batched ``mapInPandas`` decode/feature/resize/frame-sample stages,
partition-size guidance. The codec step dispatches through
``functions/media_codecs.py``: real pure-numpy PPM/PGM, BMP, and WAV(PCM)
parsers plus this repo's deterministic FAKE test container. Entropy-coded
formats (JPEG/PNG/MP4) still raise ``NotImplementedError`` — they
genuinely need PIL/ffmpeg, which this environment does not ship; swap the
dispatch for those bindings and nothing else changes.

Fake container format (deterministic, seedable):
``b"FAKE" | u16 width | u16 height | u8 channels | payload bytes``.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from vcf2db_spark.functions import media_codecs

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("mean_intensity", T.DoubleType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)


def encode_fake(width: int, height: int, channels: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=width * height * channels, dtype=np.uint8)
    return b"FAKE" + struct.pack("<HHB", width, height, channels) + payload.tobytes()


def _decode(blob: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """(fmt, w, h, c, cube) via the media_codecs dispatch — FAKE, PPM/PGM,
    BMP, and WAV decode for real; entropy-coded formats raise."""
    from vcf2db_spark.functions.media_codecs import decode

    fmt, arr = decode(bytes(blob))
    h, w, c = arr.shape
    return fmt, w, h, c, arr


def _decode_fake(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    # kept for API compatibility with round-1 callers/tests
    _fmt, w, h, c, arr = _decode(blob)
    return w, h, c, arr


def extract_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Decode + feature-extract via mapInPandas. Arrow moves the binary
    batches; each batch decodes in-process — the pattern scales as long as
    `spark.sql.files.maxPartitionBytes` keeps (rows × blob size) per
    partition inside executor memory."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf[content_col]):
                if blob is None:
                    out.append((mid, None, None, None, None, None))
                    continue
                _fmt, w, h, c, arr = _decode(blob)
                out.append((mid, w, h, c, round(float(arr.mean()), 6), len(blob)))
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return df.select("media_id", content_col).mapInPandas(gen, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize(df: DataFrame, out_w: int, out_h: int, content_col: str = "content") -> DataFrame:
    """Nearest-neighbor resize inside the fake codec (stand-in for a real
    resampler); re-encodes to the same container so stages compose."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf[content_col]):
                if blob is None:
                    out.append((mid, None, None, None))
                    continue
                fmt, w, h, c, arr = _decode(blob)
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                small = np.ascontiguousarray(arr[np.ix_(yi, xi)])
                blob2 = media_codecs.encode(fmt, small)  # same container out
                out.append((mid, blob2, out_w, out_h))
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select("media_id", content_col).mapInPandas(gen, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame, every_n_rows: int = 4, content_col: str = "content"
) -> DataFrame:
    """Video-style frame sampling over the fake codec: treats each image
    row-block as a frame, emits every n-th — one input row fans out to
    many, the mapInPandas generator shape a real ffmpeg sampler uses."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf[content_col]):
                if blob is None:
                    continue
                fmt, w, h, c, arr = _decode(blob)
                for k, y in enumerate(range(0, h, every_n_rows)):
                    frame = media_codecs.encode(fmt, arr[y : y + 1])
                    out.append((mid, k, frame))
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select("media_id", content_col).mapInPandas(gen, FRAME_SCHEMA)
