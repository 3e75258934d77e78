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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_src: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salt-and-replicate equi-join for a HOT-KEY fact (docs/SCALE.md §3):
    the fact side gets a deterministic salt from its own unique columns
    (``salt_src`` — e.g. the row's primary key, so re-runs salt
    identically), the dim side is replicated ``n_salt`` times with every
    salt value, and the join key becomes (key, salt). A key carrying 30%
    of the fact now lands on ``n_salt`` tasks instead of one.

    Cost model: dim bytes × n_salt extra shuffle volume — the device is
    for fact-skew against a NON-broadcastable dim (a broadcast join has
    no skew problem; AQE's skew split covers sort-merge/shuffled-hash
    AFTER the exchange, but cannot split the sort/build of one giant
    key's partition on the fact side when the downstream agg keeps the
    key). Exact for any join type that doesn't null-extend the dim side
    (inner/left): salting partitions fact rows, replication guarantees
    every (key, salt) finds its dim row.
    """
    fs = fact.withColumn(
        "_fsalt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salt)).cast("int"),
    )
    ds = dim.withColumn(
        "_dsalt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = fs.join(
        ds,
        (F.col(fact_key) == F.col(dim_key)) & (F.col("_fsalt") == F.col("_dsalt")),
        how,
    )
    return out.drop("_fsalt", "_dsalt")
