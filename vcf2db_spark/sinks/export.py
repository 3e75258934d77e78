"""Training-shard export sink: the last mile of the corpus pipeline —
deterministically shuffled, shard-partitioned output plus an integrity
manifest a downstream trainer can verify before reading a byte.

Layout on disk (plain parquet — works on any object store):

    out_dir/
      shard=0/part-*.parquet     one directory per shard
      ...
      shard=N-1/part-*.parquet
      _manifest.json             rows + id-checksum per shard

Scale shape: shard assignment is the same Knuth multiplicative hash as
the ``shuffle_export`` declared query (queries/training.py) — one
exchange on the shard key, `partitionBy("shard")` writes each shard's
files from its own tasks, and the manifest is a shard-count-sized
aggregate (never a driver-side row scan). The id checksum is an exact
XOR-of-xxhash64 — order-independent, so it can be recomputed shard-by-
shard on read regardless of file order or parallelism.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vcf2db_spark.queries.training import knuth_hash_sql

MANIFEST = "_manifest.json"


def with_shard(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Deterministic pseudo-random shard id (no rand(), reproducible
    across runs/engines — overflow-safe split-modular Knuth hash, the
    same device as the ``shuffle_export`` declared query)."""
    return df.withColumn(
        "shard", F.expr(knuth_hash_sql(id_col, "DIV")) % F.lit(n_shards)
    )


def _shard_stats(df: DataFrame, id_col: str) -> DataFrame:
    # XOR of xxhash64(id): exact, commutative/associative → file- and
    # task-order independent. bit_xor is a native JVM aggregate.
    return df.groupBy("shard").agg(
        F.count(F.lit(1)).alias("rows"),
        F.expr(f"bit_xor(xxhash64({id_col}))").alias("id_checksum"),
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> dict:
    """Write ``df`` as ``n_shards`` hash-sharded parquet partitions plus
    an integrity manifest. Returns the manifest dict."""
    sharded = with_shard(df, id_col, n_shards)
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    stats = {
        int(r["shard"]): {"rows": int(r["rows"]), "id_checksum": int(r["id_checksum"])}
        for r in _shard_stats(sharded, id_col).collect()
    }
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "total_rows": sum(s["rows"] for s in stats.values()),
        "shards": {str(k): stats[k] for k in sorted(stats)},
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def write_fingerprint_store(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    fp_col: str = "fp",
) -> dict:
    """Persist a dedup FINGERPRINT STORE: distinct fingerprints, hash-
    sharded on the fingerprint itself (pmod(xxhash64(fp), n)), one file
    per shard, plus the same integrity manifest as the training-shard
    export (id_col = the fingerprint column, so ``read_training_shards``
    verifies it unchanged).

    Sharding on the FINGERPRINT is the incremental-dedup contract: a new
    batch derives each row's shard from its own fp, so batch-vs-store
    anti-joins are shard-aligned — the store side of every join task
    reads exactly one shard directory, never the whole store. The
    repartition before partitionBy keeps it one file per shard (tasks ×
    partitions small-file trap otherwise); the store stays append-able
    shard-by-shard because xxhash64 is stable across runs and engines.
    """
    sharded = (
        df.select(fp_col)
        .distinct()
        .withColumn(
            "shard", F.pmod(F.xxhash64(F.col(fp_col)), F.lit(n_shards)).cast("int")
        )
    )
    sharded.repartition(n_shards, "shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(out_dir)
    stats = {
        int(r["shard"]): {"rows": int(r["rows"]), "id_checksum": int(r["id_checksum"])}
        for r in _shard_stats(sharded, fp_col).collect()
    }
    manifest = {
        "n_shards": n_shards,
        "id_col": fp_col,
        "total_rows": sum(s["rows"] for s in stats.values()),
        "shards": {str(k): stats[k] for k in sorted(stats)},
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_training_shards(
    spark: SparkSession, out_dir: str, verify: bool = True
) -> DataFrame:
    """Read an exported shard set; with ``verify`` the per-shard row
    counts AND id checksums are recomputed and compared to the manifest
    (raises ValueError on any mismatch — a truncated/duplicated shard
    never reaches the trainer silently)."""
    df = spark.read.parquet(out_dir)
    if verify:
        with open(os.path.join(out_dir, MANIFEST)) as f:
            manifest = json.load(f)
        actual = {
            int(r["shard"]): (int(r["rows"]), int(r["id_checksum"]))
            for r in _shard_stats(df, manifest["id_col"]).collect()
        }
        expected = {
            int(k): (v["rows"], v["id_checksum"])
            for k, v in manifest["shards"].items()
        }
        if actual != expected:
            bad = sorted(
                set(actual.items()) ^ set(expected.items()),
            )
            raise ValueError(f"shard manifest mismatch: {bad[:4]}")
    return df
