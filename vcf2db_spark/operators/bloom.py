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

- **Built executor-side, no shuffle: one task per data file.** Each task
  pyarrow-reads ONLY the indexed columns of its file (the same
  executor-side read pattern as sources/lakehouse_feed.py) and builds
  the complete filter in one vectorized pass; the driver collects one
  (file, column, bitmap) row per filter — file-count-bounded kilobytes,
  never row-count.
- **Vectorized hashing on the hot path.** Integer and float keys (the
  typical lookup columns) hash through a numpy splitmix64 pipeline —
  whole arrays at once, uint64 wrap-around arithmetic, no per-value
  Python. Strings/bytes fall back to a per-unique-value blake2b loop
  (variable-length hashing does not vectorize in numpy; unique-count,
  not row-count, bounds the loop).
- **Typed filters — the no-false-negative contract survives dtype
  coercion.** Every filter records its value FAMILY (``"t"``: ``i``
  integer, ``f`` float, ``s`` string/bytes), taken from the parquet
  column type at build time. Probes coerce through the recorded family,
  not the probe value's Python type: an int column probed with ``5.0``
  hashes as the integer 5; a float column probed with ``5`` hashes as
  ``5.0``; and — critically — a pandas batch whose int64 key column was
  NULL-coerced to float64 (Arrow→pandas does this) still hashes its
  integral values through the integer path. A probe value that CANNOT
  exist in the family (``5.5`` against an int column) is definitely
  absent. Unsupported column types (timestamps, decimals, nested) are
  rejected at ``create()`` — silently-mismatched string forms would
  break the contract.
- **Sized from the parquet footer.** The row count per file is already
  known when blooms are built (``_write_data`` harvests footers), so
  m and k are fixed up front: m = next power of two of n·10 bits
  (≈1% fpp at k = round(ln2 · m/n)), clamped to [1 KiB, 128 KiB] of
  bits.
- **Deterministic everywhere.** splitmix64 with fixed seeds and blake2b
  are platform- and process-independent (no Python hash randomization,
  no library-version-dependent hashing), so sidecars persist with the
  table.

NULLs are never indexed and never filtered out.

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

#: Spark simpleString type names a bloom column may have; everything
#: else (timestamp/date/decimal/nested) has no canonical cross-engine
#: string/bit form and is rejected at create() — a silent mismatch
#: would produce false NEGATIVES, the one failure bloom must never have
SUPPORTED_SPARK_TYPES = frozenset(
    {"tinyint", "smallint", "int", "bigint", "boolean",
     "float", "double", "string", "binary"}
)


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


def family_of_arrow_type(t) -> str | None:
    """Filter family for a pyarrow column type, or None = unsupported
    (no filter built — probes keep the file, conservative)."""
    import pyarrow as pa

    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        return "i"
    if pa.types.is_floating(t):
        return "f"
    if (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    ):
        return "s"
    return None


def _coerce_array(arr: np.ndarray, fam: str) -> np.ndarray:
    """Coerce a batch of non-null probe/build values into the filter's
    family. Values that cannot exist in the family (non-integral floats
    against an int column) are DROPPED — they are definitely absent, so
    dropping them can only under-match, never lose a real key."""
    if fam == "i":
        if arr.dtype.kind in ("i", "u", "b"):
            return arr.astype(np.int64)
        if arr.dtype.kind == "f":
            f = arr.astype(np.float64)
            ok = np.isfinite(f) & (f == np.floor(f))
            return f[ok].astype(np.int64)
        out = []
        for v in arr:  # object path (mixed pandas columns)
            if isinstance(v, (bool, int, np.bool_, np.integer)):
                out.append(int(v))
            elif isinstance(v, (float, np.floating)) and float(v).is_integer():
                out.append(int(v))
        return np.array(out, dtype=np.int64)
    if fam == "f":
        if arr.dtype.kind in ("i", "u", "b", "f"):
            f = arr.astype(np.float64)
        else:
            vals = [
                float(v)
                for v in arr
                if isinstance(v, (bool, int, float, np.bool_, np.integer, np.floating))
            ]
            f = np.array(vals, dtype=np.float64)
        return np.where(f == 0.0, 0.0, f)  # −0.0 ≡ 0.0
    return arr  # "s": objects hash via _obj_bytes (str/bytes verbatim)


def _hash_family(arr: np.ndarray, fam: str) -> tuple[np.ndarray, np.ndarray]:
    """(h1[], h2[]) for a family-coerced array."""
    if fam == "i":
        return _hash_numeric(arr.astype(np.int64).astype(np.uint64))
    if fam == "f":
        return _hash_numeric(arr.view(np.uint64))
    pairs = [_blake_pair(_obj_bytes(v)) for v in arr]
    if not pairs:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    h = np.array(pairs, dtype=np.uint64).reshape(-1, 2)
    return h[:, 0], h[:, 1]


#: Probe-coercion sentinel: the probe value's relationship to the filter
#: family is not one of the DOCUMENTED cross-coercions, so the filter
#: cannot rule the file out — keep it (same posture as a missing
#: sidecar). Distinct from None, which means the value provably cannot
#: exist in the family (definitely absent).
KEEP = object()


def _coerce_scalar(value, fam: str):
    """Probe-side scalar coercion into the filter family. Returns the
    coerced value; None when the value provably cannot exist in the
    family (⇒ definitely absent — ONLY the documented int/float
    cross-coercions qualify); or :data:`KEEP` for anything outside the
    per-family whitelist (decimal.Decimal against a double column, a
    numeric probe of a string column where Spark's implicit cast could
    match textually different forms, NaN whose bit pattern is not
    canonical) — conservative, mirroring the missing-sidecar path
    (ADVICE r8)."""
    if fam == "i":
        if isinstance(value, (bool, int, np.bool_, np.integer)):
            return int(value)
        if isinstance(value, (float, np.floating)):
            f = float(value)
            if f != f or f in (float("inf"), float("-inf")):
                return None  # NaN/inf cannot exist in an integer column
            return int(f) if f.is_integer() else None
        return KEEP  # Decimal / str / exotic: row-level cast may match
    if fam == "f":
        if isinstance(value, float) and value != value:
            return KEEP  # NaN: bit patterns are not canonical
        if isinstance(value, (bool, int, float, np.bool_, np.integer, np.floating)):
            f = float(value)
            return 0.0 if f == 0.0 else f
        return KEEP  # Decimal / str: implicit cast may match row-level
    if isinstance(value, (str, bytes)):
        return value
    return KEEP  # numeric probe of a string column ("02" == 2 is true)


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


def build_bloom(values, m: int, k: int, fam: str = "i") -> dict:
    """One filter from a sequence/array of values (NULLs skipped),
    typed with its family — the unit used by build_file_blooms and the
    type-contract tests."""
    bools = np.zeros(m, dtype=bool)
    arr = (
        values
        if isinstance(values, np.ndarray)
        else np.asarray(
            [v for v in values if v is not None],
            dtype=object if fam == "s" else None,
        )
    )
    if len(arr):
        coerced = _coerce_array(arr, fam)
        if len(coerced):
            h1, h2 = _hash_family(coerced, fam)
            _insert_hashes(bools, m, k, h1, h2)
    return {"m": m, "k": k, "t": fam, "bits": _pack(bools)}


def _probe_bits(bits: np.ndarray, m: int, k: int, h1: int, h2: int) -> bool:
    i = np.arange(k, dtype=np.uint64)
    idx = (np.uint64(h1) + i * np.uint64(h2)) & np.uint64(m - 1)
    hit = bits[(idx >> np.uint64(3)).astype(np.int64)] & (
        np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)
    )
    return bool(np.all(hit != 0))


def bloom_contains(bloom: dict, value) -> bool:
    """Membership probe: False means DEFINITELY absent; True means maybe.
    NULL probes return True (blooms index non-null keys only). The probe
    value is coerced through the filter's recorded family, so int/float
    probe-type mismatches cannot produce a false negative."""
    if value is None:
        return True
    fam = bloom.get("t", "i" if isinstance(value, (bool, int)) else None)
    if fam is None:  # legacy untyped filter + non-int probe: keep the file
        return True
    coerced = _coerce_scalar(value, fam)
    if coerced is None:
        return False  # cannot exist in this column's family
    if coerced is KEEP:
        return True  # outside the documented coercions — keep the file
    m, k = int(bloom["m"]), int(bloom["k"])
    bits = np.frombuffer(base64.b64decode(bloom["bits"]), dtype=np.uint8)
    arr = np.asarray([coerced], dtype=object if fam == "s" else None)
    h1, h2 = _hash_family(_coerce_array(arr, fam), fam)
    return _probe_bits(bits, m, k, int(h1[0]), int(h2[0]))


def probe_any_key(spark, keys_df, col: str, blooms_by_id: dict) -> set:
    """Which filters match AT LEAST ONE key of ``keys_df[col]`` — the
    COW-merge scope refinement: a file whose filter rejects every update
    key provably contains none of them and need not be rewritten.

    Executor-side over the (possibly huge) key batch: the filters are
    broadcast (file-count × filter size — KBs each), each partition
    coerces its unique keys through each filter's recorded family
    (Arrow→pandas NULL-coercion to float64 is undone here — integral
    floats hash as ints) and tests every still-unmatched filter with
    numpy gathers; filters drop out of the loop as soon as one key
    hits. The driver collects at most one id per filter and destroys
    the broadcast."""
    import pandas as pd
    from pyspark.sql import functions as F

    if not blooms_by_id:
        return set()
    prepared = {
        i: (int(b["m"]), int(b["k"]), b.get("t", "i"), base64.b64decode(b["bits"]))
        for i, b in blooms_by_id.items()
    }
    # NaN guard (ADVICE r8): Spark joins treat NaN == NaN as TRUE, while
    # Arrow→pandas folds NULL and NaN together for float columns — the
    # executor batches below cannot tell a real NaN key from a NULL, and
    # pdf.dropna() would drop it either way. A float-family filter must
    # therefore never be pruned when the batch carries a NaN key (NaN bit
    # patterns are also non-canonical, so hashing could false-negative).
    # One Spark-side 1-row bounded aggregate decides it up front.
    matched_upfront: set = set()
    f_ids = {i for i, (_, _, fam, _) in prepared.items() if fam == "f"}
    if f_ids and dict(keys_df.dtypes).get(col) in ("float", "double"):
        has_nan = keys_df.select(
            F.max(F.isnan(F.col(col))).alias("x")
        ).collect()[0]["x"]
        if has_nan:
            matched_upfront = f_ids
            for i in f_ids:
                del prepared[i]
            if not prepared:
                return matched_upfront
    pb = spark.sparkContext.broadcast(prepared)

    def gen(batches):
        bits_cache: dict = {}
        hash_cache: dict = {}  # family -> (h1[], h2[]) for this batch
        remaining = set(pb.value)
        matched = []
        for pdf in batches:
            if not remaining:
                break
            vals = pdf[col].dropna().unique()
            if not len(vals):
                continue
            hash_cache.clear()
            for fid in list(remaining):
                m, k, fam, raw = pb.value[fid]
                if fam == "s" and np.asarray(vals).dtype.kind not in ("O", "U", "S"):
                    # numeric batch probing a string column: Spark's
                    # implicit cast can match textually different forms
                    # ("02" == 2) — the str() form is not faithful, so
                    # the filter cannot prune. Conservative keep.
                    matched.append(fid)
                    remaining.discard(fid)
                    continue
                if fam not in hash_cache:
                    coerced = _coerce_array(np.asarray(vals), fam)
                    hash_cache[fam] = (
                        _hash_family(coerced, fam) if len(coerced) else None
                    )
                hashed = hash_cache[fam]
                if hashed is None:
                    continue
                h1, h2 = hashed
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

    try:
        rows = (
            keys_df.select(F.col(col))
            .mapInPandas(gen, schema="id long")
            .collect()
        )
    finally:
        pb.destroy()
    return {r["id"] for r in rows} | matched_upfront


def build_file_blooms(
    spark,
    paths: list[str],
    bloom_cols: tuple[str, ...],
    params_by_base: dict[str, tuple[int, int]],
) -> dict[str, dict[str, dict]]:
    """{file basename: {column: typed bloom}} for freshly written data
    files — one task per file, executor-side, shuffle-free (see the
    module docstring). The filter family comes from the parquet column
    TYPE (pyarrow), not the materialized numpy dtype, so an all-null
    chunk cannot misfamily a column; unsupported types are skipped
    (probes then keep the file — conservative)."""
    cols = list(bloom_cols)
    params = dict(params_by_base)

    def one_file(path: str) -> list[tuple[str, str, dict]]:
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
            col = t.column(c)
            fam = family_of_arrow_type(col.type)
            if fam is None:
                continue
            vals = col.drop_null().to_numpy(zero_copy_only=False)
            if fam == "s" and vals.dtype.kind == "O":
                vals = np.unique(vals)  # bound the blake2b loop
            out.append((base, c, build_bloom(vals, m, k, fam)))
        return out

    rows = (
        spark.sparkContext.parallelize(paths, max(1, len(paths)))
        .flatMap(one_file)
        .collect()
    )
    out: dict[str, dict[str, dict]] = {}
    for base, c, bloom in rows:
        out.setdefault(base, {})[c] = bloom
    return out
