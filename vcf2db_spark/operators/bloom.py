"""Per-file bloom-filter data skipping (the Delta bloom-index pattern).

Min/max footer stats — the lakehouse's first pruning tier
(sinks/lakehouse.py ``plan_files``) — cannot prune an EQUALITY lookup on
a high-cardinality column that is not clustered: when every file's
[min, max] spans the keyspace (hash-distributed writes, the common shape
for an upsert key), stats keep everything. Delta's answer is a bloom
filter index per (data file, indexed column): a point lookup probes the
filters and reads only files that MIGHT contain the key — no false
negatives ever, ~1% false positives at the default sizing. This module
is the filter math plus the distributed build; the sidecar layout,
manifest wiring, and planner live in sinks/lakehouse.py.

Design for 100 TB:

- **Built executor-side, no shuffle.** ``build_file_blooms`` folds each
  partition's Arrow batches into partial bitmaps keyed by
  ``input_file_name`` via ``mapInPandas`` (a groupBy-file build would
  shuffle the entire key column). The driver receives at most
  partitions × files × columns partial bitmaps of m/8 bytes each and
  ORs them — bloom union is bitwise OR when parameters match, so the
  merge is exact regardless of how Spark split files across tasks.
- **Vectorized hashing on the hot path.** Integer and float keys (the
  typical lookup columns) hash through a numpy splitmix64 pipeline —
  whole arrays at once, uint64 wrap-around arithmetic, no per-value
  Python. Strings/bytes fall back to a per-unique-value blake2b loop
  (variable-length hashing does not vectorize in numpy; unique-count,
  not row-count, bounds the loop).
- **Sized from the parquet footer.** The row count per file is already
  known when blooms are built (``_write_data`` harvests footers), so
  m and k are fixed up front: m = next power of two of n·10 bits
  (≈1% fpp at k = round(ln2 · m/n)), clamped to [1 KiB, 128 KiB] of
  bits.
- **Deterministic everywhere.** splitmix64 with fixed seeds and
  blake2b are platform- and process-independent: filters built on any
  executor probe identically anywhere (no Python hash randomization,
  no library-version-dependent hashing), so sidecars persist with the
  table.

Probe values must match the column's family: integer columns are probed
with ints, float with floats (IEEE bit pattern, −0.0 normalized),
string/bytes with the same Python type — Delta's guidance for its index
is the same. NULLs are never indexed and never filtered out.

Reference parity: Delta Lake bloom filter indexes
(delta.bloomFilter.* table properties); Parquet's optional column bloom
filters are format-level cousins [public Delta/Parquet docs].
"""

from __future__ import annotations

import base64
import hashlib
import os

import numpy as np

_MIN_BITS = 1 << 13  # 1 KiB of bits — tiny files still get a real filter
_MAX_BITS = 1 << 20  # 128 KiB cap per (file, column)
BITS_PER_KEY = 10  # ≈1% false-positive rate at the matching k

_S1 = np.uint64(0x9E3779B97F4A7C15)
_S2 = np.uint64(0xC2B2AE3D27D4EB4F)


def bloom_params(n_rows: int, bits_per_key: int = BITS_PER_KEY) -> tuple[int, int]:
    """(m_bits, k_hashes) for an expected ``n_rows`` keys: m is the next
    power of two of n·bits_per_key (power of two ⇒ the mod in the probe
    is a mask), clamped; k = round(ln2 · m/n) is the fpp-optimal count."""
    n = max(1, int(n_rows))
    want = n * bits_per_key
    m = _MIN_BITS
    while m < want and m < _MAX_BITS:
        m <<= 1
    k = max(1, min(16, round(0.6931 * m / n)))
    return m, k


def _mix64(x: np.ndarray, seed: np.uint64) -> np.ndarray:
    """splitmix64 finalizer — deterministic avalanche, wrap-around
    uint64 arithmetic (numpy wraps silently for unsigned ints)."""
    x = (x + seed).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _hash_numeric(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h1 = _mix64(u, _S1)
    h2 = _mix64(u, _S2) | np.uint64(1)  # odd stride cycles a pow-2 table
    return h1, h2


def _blake_pair(data: bytes) -> tuple[int, int]:
    d = hashlib.blake2b(data, digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little") | 1


def _obj_bytes(v) -> bytes:
    return v if isinstance(v, bytes) else str(v).encode()


def _hash_values(values) -> tuple[np.ndarray, np.ndarray]:
    """(h1[], h2[]) for an array/sequence of non-null values. Integer and
    float arrays take the vectorized path; everything else loops blake2b
    over the (unique) values."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        return _hash_numeric(arr.astype(np.int64).astype(np.uint64))
    if arr.dtype.kind == "b":
        return _hash_numeric(arr.astype(np.int64).astype(np.uint64))
    if arr.dtype.kind == "f":
        f = arr.astype(np.float64)
        f = np.where(f == 0.0, 0.0, f)  # −0.0 ≡ 0.0
        return _hash_numeric(f.view(np.uint64))
    pairs = [_blake_pair(_obj_bytes(v)) for v in arr]
    h = np.array(pairs, dtype=np.uint64).reshape(-1, 2)
    return h[:, 0], h[:, 1]


def _canonical_scalar(v) -> np.ndarray:
    """Probe-side canonicalization: a 1-element array whose dtype routes
    through the SAME _hash_values path the build used for that family."""
    if isinstance(v, (bool, np.bool_)):
        return np.array([int(v)], dtype=np.int64)
    if isinstance(v, (int, np.integer)):
        return np.array([int(v)], dtype=np.int64)
    if isinstance(v, (float, np.floating)):
        return np.array([float(v)], dtype=np.float64)
    return np.array([v], dtype=object)


def _insert_hashes(
    bools: np.ndarray, m: int, k: int, h1: np.ndarray, h2: np.ndarray
) -> None:
    """Set bits in a BOOLEAN working array — fancy-indexed constant
    assignment, not ``np.bitwise_or.at`` (the unbuffered ufunc is ~10×
    slower); ``np.packbits(bitorder='little')`` at serialization matches
    the probe's byte/bit addressing (bit i of byte j = position 8j+i)."""
    i = np.arange(k, dtype=np.uint64)
    idx = (h1[:, None] + i[None, :] * h2[:, None]).ravel() & np.uint64(m - 1)
    bools[idx.astype(np.int64)] = True


def _pack(bools: np.ndarray) -> str:
    return base64.b64encode(
        np.packbits(bools, bitorder="little").tobytes()
    ).decode()


def build_bloom(values, m: int, k: int) -> dict:
    """One filter from a sequence of values (NULLs skipped)."""
    bools = np.zeros(m, dtype=bool)
    vals = [v for v in values if v is not None]
    if vals:
        h1, h2 = _hash_values(vals)
        _insert_hashes(bools, m, k, h1, h2)
    return {"m": m, "k": k, "bits": _pack(bools)}


def bloom_contains(bloom: dict, value) -> bool:
    """Membership probe: False means DEFINITELY absent; True means maybe.
    NULL probes return True (blooms index non-null keys only)."""
    if value is None:
        return True
    m, k = int(bloom["m"]), int(bloom["k"])
    bits = np.frombuffer(base64.b64decode(bloom["bits"]), dtype=np.uint8)
    h1, h2 = _hash_values(_canonical_scalar(value))
    i = np.arange(k, dtype=np.uint64)
    idx = (h1[0] + i * h2[0]) & np.uint64(m - 1)
    hit = bits[(idx >> np.uint64(3)).astype(np.int64)] & (
        np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)
    )
    return bool(np.all(hit != 0))


def probe_any_key(spark, keys_df, col: str, blooms_by_id: dict) -> set:
    """Which filters match AT LEAST ONE key of ``keys_df[col]`` — the
    COW-merge scope refinement: a file whose filter rejects every update
    key provably contains none of them and need not be rewritten.

    Executor-side over the (possibly huge) key batch: the filters are
    broadcast (file-count × filter size — KBs each), each partition
    hashes its unique keys ONCE (vectorized) and tests every
    still-unmatched filter against the whole batch with numpy gathers;
    filters drop out of the loop as soon as one key hits, so a batch
    that touches every file exits after the first batches. The driver
    collects at most one id per filter — file-count-bounded."""
    import pandas as pd
    from pyspark.sql import functions as F

    if not blooms_by_id:
        return set()
    prepared = {
        i: (int(b["m"]), int(b["k"]), base64.b64decode(b["bits"]))
        for i, b in blooms_by_id.items()
    }
    pb = spark.sparkContext.broadcast(prepared)

    def gen(batches):
        bits_cache: dict = {}
        remaining = set(pb.value)
        matched = []
        for pdf in batches:
            if not remaining:
                break
            vals = pdf[col].dropna().unique()
            if not len(vals):
                continue
            h1, h2 = _hash_values(vals)
            for fid in list(remaining):
                m, k, raw = pb.value[fid]
                bits = bits_cache.get(fid)
                if bits is None:
                    bits = bits_cache[fid] = np.frombuffer(raw, dtype=np.uint8)
                i = np.arange(k, dtype=np.uint64)
                idx = (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(m - 1)
                hit = bits[(idx >> np.uint64(3)).astype(np.int64)] & (
                    np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)
                )
                if bool(np.any(np.all(hit != 0, axis=1))):
                    matched.append(fid)
                    remaining.discard(fid)
        if matched:
            yield pd.DataFrame({"id": matched})

    rows = (
        keys_df.select(F.col(col))
        .mapInPandas(gen, schema="id long")
        .collect()
    )
    return {r["id"] for r in rows}


def build_file_blooms(
    spark,
    paths: list[str],
    bloom_cols: tuple[str, ...],
    params_by_base: dict[str, tuple[int, int]],
) -> dict[str, dict[str, dict]]:
    """{file basename: {column: bloom}} for freshly written data files.

    One task per data file, executor-side, shuffle-free: each task
    pyarrow-reads ONLY the indexed columns of its file (the same
    executor-side read pattern as sources/lakehouse_feed.py) and builds
    the complete filter in one vectorized pass — no ``input_file_name``
    string per row, no partial-bitmap merge. The driver collects one
    (file, column, bitmap) row per filter: file-count-bounded kilobytes,
    never row-count. RDD ``flatMap`` is deliberate — this is genuinely
    per-file imperative metadata work, not a dataflow."""
    cols = list(bloom_cols)
    params = dict(params_by_base)

    def one_file(path: str) -> list[tuple[str, str, str]]:
        import pyarrow.parquet as pq

        base = os.path.basename(path)
        prm = params.get(base)
        if prm is None:
            return []
        m, k = prm
        t = pq.read_table(path, columns=[c for c in cols])
        out = []
        for c in cols:
            if c not in t.column_names:
                continue
            vals = t.column(c).drop_null().to_numpy(zero_copy_only=False)
            bools = np.zeros(m, dtype=bool)
            if len(vals):
                if vals.dtype.kind == "O":
                    vals = np.unique(vals)  # bound the blake2b loop
                h1, h2 = _hash_values(vals)
                _insert_hashes(bools, m, k, h1, h2)
            out.append((base, c, _pack(bools)))
        return out

    rows = (
        spark.sparkContext.parallelize(paths, max(1, len(paths)))
        .flatMap(one_file)
        .collect()
    )
    out: dict[str, dict[str, dict]] = {}
    for base, c, bits in rows:
        m, k = params_by_base[base]
        out.setdefault(base, {})[c] = {"m": m, "k": k, "bits": bits}
    return out
