"""Skew-mitigation operators (docs/SCALE.md §3).

Spark's partial aggregation already map-side-combines algebraic
aggregates, and AQE splits skewed sort-merge joins — but two shapes still
hot-spot on a skewed key at 100 TB and need explicit salting:

- **count-distinct under a heavy key**: all distinct values of the hot
  key funnel into one task. ``salted_count_distinct`` buckets the VALUE
  space by hash — buckets partition the distinct set, so per-bucket
  distinct counts sum EXACTLY to the true count — turning one giant task
  into ``n_salt`` bounded ones.
- **aggregation under a heavy key** where the per-key state itself is
  large (collect-style): ``with_salt`` adds the salt column for a manual
  two-phase pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, col: str | Column, n_salt: int = 32, name: str = "_salt") -> DataFrame:
    """Deterministic value-hash salt in [0, n_salt) — same value, same
    salt, so value-keyed semantics survive the split."""
    c = F.col(col) if isinstance(col, str) else col
    return df.withColumn(name, F.pmod(F.hash(c), F.lit(n_salt)))


def salted_count_distinct(
    df: DataFrame, keys: list[str], value: str, n_salt: int = 32
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key tuple in two bounded phases:

    phase 1: groupBy(keys + salt(value)) → per-bucket distinct counts
             (each task sees only its hash slice of the value space);
    phase 2: groupBy(keys) → sum of bucket counts (n_salt rows per key).

    Exact because hash-bucketing partitions the value set — no value can
    be double-counted across buckets.
    """
    salted = with_salt(df, value, n_salt)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        F.count_distinct(F.col(value)).alias("_pc")
    )
    return phase1.groupBy(*keys).agg(F.sum("_pc").alias(f"n_distinct_{value}"))
