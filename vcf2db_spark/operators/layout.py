"""Z-order (Morton-curve) multi-column write layout.

The reference builds post-load B-tree indexes on its hot columns — gene,
(chrom, start), variant_impacts.variant_id [U vcf2db.py §create_indexes
~L1000]. The Spark-native analog for ONE column is a range-partitioned,
sorted Parquet layout (``sinks.writers.write_parquet``): row-group min/max
stats then prune like the B-tree does. But a single sort key only serves a
single column. Z-ordering interleaves the bits of several columns' bucket
ranks into one Morton key, so one physical order preserves locality in ALL
of the interleaved columns — the lakehouse replacement for *multiple*
secondary indexes (the same layout Delta/Iceberg ``OPTIMIZE ZORDER BY``
produces).

Scale design (100 TB): the layout is produced by exactly one extra
column-pruned stats scan (min/max of the key columns), one range shuffle on
the Morton key, and a per-partition sort — all operations that scale
linearly and that AQE balances. Queries pay nothing: pruning happens in the
Parquet reader from row-group/file stats, no index structure to load or
maintain. The key itself is pure integer arithmetic (exact, portable, and
whole-stage-codegen friendly — no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: cap total key width so the Morton key fits a signed 64-bit long
_MAX_KEY_BITS = 62


def _bits_per_col(n_cols: int, bits: int | None) -> int:
    b = bits if bits is not None else 16
    return max(1, min(b, _MAX_KEY_BITS // n_cols))


def _bucket_expr(name: str, mn: str, mx: str, n_buckets: int) -> Column:
    """Rank ``name`` into ``[0, n_buckets)`` with exact integer arithmetic:
    ``((x - mn) * nb) DIV (mx - mn + 1)``. Integer-exact on both Spark and
    DuckDB (the oracle twin uses ``//``), so the key is cross-engine
    deterministic — unlike float scaling, where last-ulp division noise
    could flip a bucket. Null and constant-column inputs collapse to
    bucket 0. Division form ``(x-mn) DIV ((mx-mn) DIV nb + 1)`` — no
    multiply, so a 64-bit-wide domain (epoch MICROS over a year ×
    2^bits was the r10 overflow) cannot overflow, and the result stays
    provably in [0, nb-1]: with q = R DIV nb, R ≤ nb·(q+1)-1 so
    R DIV (q+1) ≤ nb-1."""
    return F.expr(
        f"COALESCE(({name} - {mn}) "
        f"DIV (({mx} - {mn}) DIV {n_buckets} + 1), 0)"
    )


def _long_sql(name: str, dtype) -> str:
    """SQL expression normalizing a column to BIGINT for Z-bucketing —
    a MONOTONE transform is all the curve needs. Temporal columns
    (OPTIMIZE ZORDER BY a date/timestamp is the common case for
    time-partitioned tables) go through their epoch counters; numerics
    keep the plain cast the DuckDB oracle twin replays with ``//``."""
    t = dtype.typeName()
    if t == "date":
        return f"unix_date({name})"
    if t == "timestamp":
        return f"unix_micros({name})"
    if t == "timestamp_ntz":
        # interpret the wall-clock instant as UTC: session-independent,
        # monotone, exact (micros)
        return f"unix_micros(to_utc_timestamp({name}, 'UTC'))"
    return f"CAST({name} AS BIGINT)"


def interleave_bits(buckets: list[Column], bits: int) -> Column:
    """Morton-interleave: bit j of bucket i lands at key position
    ``j * n + i``. Expanded to ``bits × n`` shift/mask/or terms — all
    integer ops inside whole-stage codegen."""
    n = len(buckets)
    key = F.lit(0).cast("long")
    for j in range(bits):
        for i, b in enumerate(buckets):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + i))
    return key


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int | None = None,
    key_col: str = "zkey",
) -> DataFrame:
    """Append the Morton key, computing column min/max **in-plan**: the
    1-row stats aggregate is cross-joined (broadcast by AQE) so the whole
    thing stays one declarative plan — usable inside a declared query, no
    driver collect."""
    b = _bits_per_col(len(cols), bits)
    nb = 1 << b
    longs = {c: _long_sql(c, df.schema[c].dataType) for c in cols}
    stats = df.agg(
        *[F.min(F.expr(longs[c])).alias(f"_mn_{c}") for c in cols],
        *[F.max(F.expr(longs[c])).alias(f"_mx_{c}") for c in cols],
    )
    joined = df.crossJoin(F.broadcast(stats))
    buckets = [
        _bucket_expr(longs[c], f"_mn_{c}", f"_mx_{c}", nb) for c in cols
    ]
    out = joined.withColumn(key_col, interleave_bits(buckets, b))
    return out.drop(*[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols])


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    num_files: int = 32,
    bits: int | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """Write ``df`` as Parquet physically ordered along the Z-curve of
    ``cols``: range-partition on the Morton key (→ ``num_files`` files with
    disjoint key ranges), sort within partitions, drop the key. Each output
    file then covers a compact hyper-rectangle of the key columns' space,
    so min/max stats prune multi-column box predicates."""
    keyed = with_zorder_key(df, cols, bits=bits, key_col="_zkey")
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )


def zorder_oracle_sql(
    table: str,
    cols: list[str],
    keep: list[str],
    bits: int | None = None,
    key_col: str = "zkey",
) -> str:
    """DuckDB twin of ``with_zorder_key`` — generated from the same bucket
    and interleave formulas so the declared query stays literally symmetric
    with the Spark plan."""
    b = _bits_per_col(len(cols), bits)
    nb = 1 << b
    n = len(cols)
    stats = ", ".join(
        f"MIN(CAST({c} AS BIGINT)) AS _mn_{c}, MAX(CAST({c} AS BIGINT)) AS _mx_{c}"
        for c in cols
    )
    buckets = ", ".join(
        f"COALESCE((CAST({c} AS BIGINT) - _mn_{c}) "
        f"// ((_mx_{c} - _mn_{c}) // {nb} + 1), 0) AS _b{i}"
        for i, c in enumerate(cols)
    )
    terms = [
        f"(((_b{i} >> {j}) & 1) << {j * n + i})"
        for j in range(b)
        for i in range(n)
    ]
    keep_sql = ", ".join(keep)
    return (
        f"WITH _stats AS (SELECT {stats} FROM {table}), "
        f"_b AS (SELECT {keep_sql}, {buckets} FROM {table}, _stats) "
        f"SELECT {keep_sql}, ({' | '.join(terms)}) AS {key_col} FROM _b"
    )
