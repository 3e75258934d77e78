"""Gemini-database SQLite source — read reference-produced `.db` files
into Spark (SURVEY.md §3 entry point 3, reversed).

A reference user's existing artifact is a SQLite database written by
vcf2db [U vcf2db.py §VCFDB.create_tables ~L800]. This source lets them
migrate: ``read_gemini_db(spark, "cohort.db", "variants")`` yields the
same DataFrame shape our own pipeline produces — genotype BLOBs decoded
back to typed int arrays (zlib ``--legacy-compression`` or snappy
[U §pack_blob ~L60]), everything else typed from the declared column
affinity.

Spark-first design:
- **partitions = rowid ranges**: SQLite tables are rowid B-trees, so
  ``WHERE rowid BETWEEN lo AND hi`` is an index-range scan, not a table
  scan — N partitions each read only their slice. The driver samples
  min/max rowid once; executors open the file read-only in parallel
  (SQLite supports unlimited concurrent readers).
- **predicate pushdown**: simple comparisons/IN are translated to a WHERE
  clause evaluated inside SQLite — against the reference's own post-load
  indexes (chrom/start, gene) when present. Spark re-applies every filter
  afterwards, so partial translation is always safe.
- At cluster scale the `.db` file must be on a shared filesystem (the
  same constraint any single-file format has); the intended 100 TB flow
  is one migration read → ``write_parquet`` → native columnar layout.
"""

from __future__ import annotations

import sqlite3
import zlib
from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

#: BLOB columns that decode to int32 arrays (our sink's and the
#: reference's genotype matrices; `_blob` twins from the CLI path).
INT_ARRAY_BLOBS = frozenset(
    {"gt_types", "gt_phases", "gt_depths", "gt_ref_depths", "gt_alt_depths", "gt_quals"}
)


def _decode_int_blob(blob: bytes | None) -> list[int] | None:
    if blob is None:
        return None
    try:
        raw = zlib.decompress(blob)
    except zlib.error:
        try:  # reference default compression when python-snappy is present
            import snappy  # type: ignore

            raw = snappy.decompress(blob)
        except Exception as exc:  # pragma: no cover - env-dependent
            raise ValueError("genotype blob is neither zlib nor snappy") from exc
    return np.frombuffer(raw, dtype="<i4").tolist()


def _spark_type(declared: str, name: str, decode_blobs: bool) -> T.DataType:
    d = (declared or "").upper()
    if "INT" in d:
        return T.LongType()
    if d in ("REAL", "FLOAT", "DOUBLE") or "REAL" in d:
        return T.DoubleType()
    if "BLOB" in d or d == "":
        if decode_blobs and (name in INT_ARRAY_BLOBS or name.endswith("_blob")):
            return T.ArrayType(T.IntegerType())
        return T.BinaryType()
    return T.StringType()


def _table_schema(db_path: str, table: str, decode_blobs: bool) -> T.StructType:
    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
    finally:
        con.close()
    if not info:
        raise ValueError(f"no such table {table!r} in {db_path!r}")
    return T.StructType(
        [T.StructField(row[1], _spark_type(row[2], row[1], decode_blobs), True) for row in info]
    )


def _quote(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _sql_literal(v: object) -> str | None:
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return None


def _filter_to_sql(f: Filter) -> str | None:
    """Best-effort translation; None → not pushed (Spark re-applies all)."""
    if len(f.attribute) != 1:
        return None
    col = _quote(f.attribute[0])
    if isinstance(f, In):
        lits = [_sql_literal(v) for v in f.value]
        if any(x is None for x in lits) or not lits:
            return None
        return f"{col} IN ({', '.join(lits)})"
    op = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
    }.get(type(f))
    if op is None:
        return None
    lit = _sql_literal(f.value)
    return None if lit is None else f"{col} {op} {lit}"


@dataclass
class RowidRange(InputPartition):
    lo: int
    hi: int  # inclusive


class GeminiDBReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.schema_ = schema
        self.path = options["path"]
        self.table = options["table"]
        self.n_partitions = int(options.get("n_partitions", "8"))
        self.decode_blobs = options.get("decode_blobs", "true").lower() == "true"
        self.where: list[str] = []

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            sql = _filter_to_sql(f)
            if sql is not None:
                self.where.append(sql)
        # Spark re-applies everything we don't claim; claim nothing so a
        # lossy translation can never drop rows.
        return filters

    def _where_sql(self) -> str:
        return (" AND " + " AND ".join(self.where)) if self.where else ""

    def partitions(self):
        con = sqlite3.connect(f"file:{self.path}?mode=ro", uri=True)
        try:
            row = con.execute(
                f"SELECT min(rowid), max(rowid) FROM {_quote(self.table)}"
            ).fetchone()
        finally:
            con.close()
        if row is None or row[0] is None:
            return [RowidRange(1, 0)]  # empty table → one empty range
        lo, hi = int(row[0]), int(row[1])
        n = max(1, min(self.n_partitions, hi - lo + 1))
        step = (hi - lo + 1 + n - 1) // n
        return [RowidRange(lo + i * step, min(hi, lo + (i + 1) * step - 1)) for i in range(n)]

    def read(self, partition: RowidRange):
        cols = ", ".join(_quote(f.name) for f in self.schema_.fields)
        decode = [
            i
            for i, f in enumerate(self.schema_.fields)
            if isinstance(f.dataType, T.ArrayType)
        ]
        con = sqlite3.connect(f"file:{self.path}?mode=ro", uri=True)
        try:
            cur = con.execute(
                f"SELECT {cols} FROM {_quote(self.table)} "
                f"WHERE rowid BETWEEN ? AND ?{self._where_sql()}",
                (partition.lo, partition.hi),
            )
            for row in cur:
                if decode:
                    row = list(row)
                    for i in decode:
                        row[i] = _decode_int_blob(row[i])
                    yield tuple(row)
                else:
                    yield row
        finally:
            con.close()


class GeminiDBDataSource(DataSource):
    """``spark.read.format("gemini_db").option("table", "variants")
    .load("cohort.db")`` after ``spark.dataSource.register``."""

    @classmethod
    def name(cls) -> str:
        return "gemini_db"

    def schema(self) -> T.StructType:
        decode = self.options.get("decode_blobs", "true").lower() == "true"
        return _table_schema(self.options["path"], self.options["table"], decode)

    def reader(self, schema: T.StructType) -> GeminiDBReader:
        return GeminiDBReader(schema, dict(self.options))


def read_gemini_db(
    spark: SparkSession,
    db_path: str,
    table: str,
    n_partitions: int = 8,
    decode_blobs: bool = True,
) -> DataFrame:
    """Library entry point: one gemini-DB table as a DataFrame."""
    spark.dataSource.register(GeminiDBDataSource)
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    return (
        spark.read.format("gemini_db")
        .option("table", table)
        .option("n_partitions", str(n_partitions))
        .option("decode_blobs", "true" if decode_blobs else "false")
        .load(db_path)
    )
