"""Streaming SOURCE over the lakehouse transaction log — the read half
of the format's streaming story (the exactly-once ``stream_sink`` is
the write half; together: lakehouse in, lakehouse out).

``spark.readStream.format("lakehouse_feed").option("root", ...)``
streams each committed version's ADDED data files as one micro-batch
slice — the additive post-image change feed (Delta's CDF-streaming
shape): create/append/stream_append adds surface as ``insert`` rows,
COW merge rewrites as ``merge_postimage``, COW delete survivors as
``delete_postimage``, restore re-adds as ``restore``. Compaction /
ZORDER adds are SKIPPED — they carry rows unchanged, so they are not
logical changes (the same rule Delta applies to OPTIMIZE). Removed-file
pre-images are not streamed (post-image feed contract; the exact
pre/post diff for a version pair is the batch ``table_changes``).

Scale shape: offsets are version numbers (driver state = one int);
``partitions(start, end)`` reads only the DELTA manifests in the range
(never a folded snapshot — O(files added in the range)); each partition
is one data file read EXECUTOR-side via pyarrow and emitted as arrow
RecordBatches (no per-row Python). Late schema evolution: the stream
pins the schema at start; files written before an evolution reconcile
through the cast (missing columns → NULL).

Reference parity: vcf2db re-loads tables for downstream gemini
consumers; this source is the incremental version of that hand-off —
a consumer keeps up with the table instead of re-reading it.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: manifest operation → feed tag for that commit's added files
_CHANGE_TAG = {
    "create": "insert",
    "append": "insert",
    "stream_append": "insert",
    "merge": "merge_postimage",
    "delete": "delete_postimage",
    "restore": "restore",
}


class _FilePartition(InputPartition):
    def __init__(self, root: str, path: str, version: int, change: str):
        self.root = root
        self.path = path
        self.version = version
        self.change = change


class LakehouseFeedStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        # Spark lowercases DataSource option keys (r6 gotcha)
        def opt(key: str, default: str | None = None) -> str | None:
            return options.get(key) or options.get(key.lower()) or default

        self.root = opt("root")
        if not self.root:
            raise ValueError("lakehouse_feed requires option 'root'")
        self.schema = schema
        self.start_version = int(opt("startVersion", "-1"))

    # -- offsets: one int of driver state -------------------------------------

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        from vcf2db_spark.sinks import lakehouse as lh

        return {"version": max(lh.latest_version(self.root), self.start_version)}

    def partitions(self, start: dict, end: dict):
        from vcf2db_spark.sinks import lakehouse as lh

        parts: list[_FilePartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            man = lh._read_json(lh._manifest_path(self.root, v))
            tag = _CHANGE_TAG.get(man.get("operation", ""))
            if tag is None:
                continue  # compact/zorder/evolve: no logical change
            if "add" not in man:
                # a full-file-list manifest is NOT a delta — streaming
                # it as adds would replay the whole table once per
                # commit. Refuse loudly rather than duplicate silently.
                raise ValueError(
                    f"lakehouse_feed: manifest v{v} carries a full file "
                    "list (pre-delta-txlog format) — the feed requires "
                    "add/remove delta manifests"
                )
            for entry in man["add"]:
                parts.append(
                    _FilePartition(self.root, entry["path"], v, tag)
                )
        # an empty range still needs one no-op partition: Spark requires
        # at least one partition per planned micro-batch
        if not parts:
            parts.append(_FilePartition(self.root, "", -1, ""))
        return parts

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter(())
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        table = pq.read_table(os.path.join(partition.root, partition.path))
        n = table.num_rows
        data_schema = StructType(self.schema.fields[:-2])
        target = to_arrow_schema(data_schema)
        cols = []
        for field in target:
            if field.name in table.column_names:
                cols.append(table[field.name].cast(field.type))
            else:  # pre-evolution file: NULL backfill
                cols.append(pa.nulls(n, field.type))
        cols.append(pa.array([partition.change] * n, pa.string()))
        cols.append(pa.array([partition.version] * n, pa.int64()))
        out = pa.table(
            cols, schema=to_arrow_schema(self.schema)
        )
        return iter(out.to_batches(max_chunksize=1 << 16))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine's checkpoint


class LakehouseFeedDataSource(DataSource):
    """Register with ``spark.dataSource.register(LakehouseFeedDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "lakehouse_feed"

    def schema(self) -> StructType:
        from vcf2db_spark.sinks import lakehouse as lh

        def opt(key: str, default: str | None = None) -> str | None:
            return (
                self.options.get(key)
                or self.options.get(key.lower())
                or default
            )

        root = opt("root")
        if not root:
            raise ValueError("lakehouse_feed requires option 'root'")
        base = lh._schema_of(lh.snapshot(root))
        return StructType(
            list(base.fields)
            + [
                StructField("_change", StringType(), False),
                StructField("_commit_version", LongType(), False),
            ]
        )

    def streamReader(self, schema: StructType) -> LakehouseFeedStreamReader:
        return LakehouseFeedStreamReader(schema, self.options)


def read_feed_stream(spark, root: str, start_version: int = -1):
    """``readStream`` handle over the table's additive change feed."""
    spark.dataSource.register(LakehouseFeedDataSource)
    return (
        spark.readStream.format("lakehouse_feed")
        .option("root", root)
        .option("startVersion", str(start_version))
        .load()
    )
