"""Genotype blob codecs (SURVEY.md §2A A8; [U vcf2db.py §pack_blob ~L60]).

The reference packs per-variant numpy genotype arrays to compressed BLOBs
(snappy, or zlib under ``--legacy-compression``) for SQLite. In Spark the
native representation is a typed ``ArrayType`` column — Parquet page
compression already covers the storage goal — so these UDFs exist only for
byte-level parity with gemini-format databases (JDBC sink) and as the
pattern for opaque multimodal binary columns (SURVEY §2C C6).

snappy is optional (import-gated); zlib is the always-available default.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, IntegerType

try:  # optional — container may not ship python-snappy
    import snappy  # type: ignore

    HAVE_SNAPPY = True
except Exception:  # pragma: no cover - environment-dependent
    snappy = None
    HAVE_SNAPPY = False


def pack_blob(arr: list[int] | None, legacy: bool = True) -> bytes | None:
    """int array → int32 little-endian bytes → compressed blob.
    ``legacy=True`` → zlib (gemini ``--legacy-compression``); else snappy."""
    if arr is None:
        return None
    raw = np.asarray(arr, dtype="<i4").tobytes()
    if legacy or not HAVE_SNAPPY:
        return zlib.compress(raw)
    return snappy.compress(raw)


def unpack_blob(blob: bytes | None, legacy: bool = True) -> list[int] | None:
    if blob is None:
        return None
    if legacy or not HAVE_SNAPPY:
        raw = zlib.decompress(blob)
    else:
        raw = snappy.decompress(blob)
    return np.frombuffer(raw, dtype="<i4").tolist()


def pack_blob_udf(legacy: bool = True):
    """Arrow-batched pandas UDF: ArrayType(int) column → BinaryType blob."""

    @F.pandas_udf(BinaryType())
    def _pack(s: pd.Series) -> pd.Series:
        return s.map(lambda a: pack_blob(None if a is None else list(a), legacy))

    return _pack


def unpack_blob_udf(legacy: bool = True):
    @F.pandas_udf(ArrayType(IntegerType()))
    def _unpack(s: pd.Series) -> pd.Series:
        return s.map(lambda b: unpack_blob(b, legacy))

    return _unpack
