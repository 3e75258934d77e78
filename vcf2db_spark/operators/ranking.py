"""Scale-safe global ranking (B14 at the 100 TB design point).

A bare ``Window.orderBy(...)`` with no ``partitionBy`` moves every row to a
single task — Spark even warns "Moving all data to a single partition".
These helpers produce the SAME answers with distributed plans:

- ``dense_rank_dim``: global DENSE_RANK over a *low-cardinality* key is a
  property of the key's distinct values, not of the rows. Rank the distinct
  values (tiny — one partial-agg shuffle, then a window over ≤|distinct|
  rows) and broadcast-join the rank back. Cost is O(|distinct|), invariant
  to row count.

- ``global_row_number``: exact global ROW_NUMBER via the classic two-phase
  sort: ``repartitionByRange`` on the sort key (range exchange — each
  partition holds a contiguous key range), per-partition ``row_number``
  (parallel), then add each partition's exact start offset computed from
  per-partition counts (P rows, broadcast back). No single-task sort; the
  only driver-visible state is the P-row offset table.

- ``ntile_expr``: NTILE(k) is pure arithmetic on (row_number, total): the
  first ``n % k`` tiles get ``ceil(n/k)`` rows, the rest ``floor(n/k)``.
  Given a global row_number and broadcast total this is a projection.

Reference parity: upstream exposes ranking via SQL windows over the loaded
DB [U gemini-query windows]; the scale-safe rewrite is ours (VERDICT r1
item 4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_rank_dim(df: DataFrame, key: str, alias: str = "dense_rank") -> DataFrame:
    """Attach global DENSE_RANK() OVER (ORDER BY key) as ``alias``.

    The window runs over the distinct-key dim only (low-cardinality by
    contract); the fact table never shuffles — the rank arrives via a
    broadcast hash join.
    """
    # Rank the dim without any WindowExec: rank(v) = |{v' : v' <= v}| via a
    # bounded non-equi self-join. O(d²) pairs on a ≤d-row dim is free, and
    # the plan stays warning-clean (a global window, even over a tiny dim,
    # would plan a single-partition WindowExec).
    dim = df.select(key).distinct()
    other = dim.select(F.col(key).alias("_k2"))
    rank_dim = (
        dim.join(F.broadcast(other), F.col("_k2") <= F.col(key), "inner")
        .groupBy(key)
        .agg(F.count(F.lit(1)).cast("int").alias(alias))
    )
    dim = rank_dim
    return df.join(F.broadcast(dim), on=key, how="inner")


def global_row_number(
    df: DataFrame, order_cols: list[str], alias: str = "rn", num_partitions: int | None = None
) -> DataFrame:
    """Attach exact global ROW_NUMBER() OVER (ORDER BY order_cols).

    Two-phase: range exchange → parallel per-partition row_number → add
    exact per-partition offsets (computed from counts, broadcast back).
    ``order_cols`` must be a total order (include a unique tiebreaker).
    """
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    ranged = ranged.withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy("_pid").orderBy(*cols)
    local = ranged.withColumn("_local_rn", F.row_number().over(w_local))
    # P-row offset table: rows before each partition. The window here runs
    # over P rows (one per shuffle partition), not over the data.
    # Exact prefix-sum offsets over exactly P rows (one per shuffle
    # partition) via a bounded non-equi self-join — no WindowExec, no
    # single-partition stage; O(P²) pairs is invariant to data volume.
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    prior = counts.select(F.col("_pid").alias("_pid2"), F.col("_cnt").alias("_cnt2"))
    offsets = (
        counts.join(F.broadcast(prior), F.col("_pid2") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_cnt2"), F.lit(0)).alias("_offset"))
    )
    return (
        local.join(F.broadcast(offsets), on="_pid", how="inner")
        .withColumn(alias, (F.col("_local_rn") + F.col("_offset")).cast("int"))
        .drop("_pid", "_local_rn", "_offset")
    )


def ntile_expr(rn: Column, total: Column, k: int) -> Column:
    """NTILE(k) from a 1-based global row_number and the total row count.

    SQL semantics: the first ``n % k`` tiles have ``floor(n/k)+1`` rows,
    the remaining tiles have ``floor(n/k)`` rows.
    """
    base = F.floor(total / k)  # floor(n/k)
    big = total % k  # number of size-(base+1) tiles
    cutoff = big * (base + 1)  # rows covered by the big tiles
    return (
        F.when(rn <= cutoff, F.floor((rn - 1) / (base + 1)) + 1)
        .otherwise(big + F.floor((rn - cutoff - 1) / base) + 1)
        .cast("int")
    )


def with_ntile(
    df: DataFrame, order_cols: list[str], k: int, alias: str = "ntile"
) -> DataFrame:
    """Attach exact global NTILE(k) OVER (ORDER BY order_cols), distributed.

    total arrives as a broadcast 1-row cross join (scalar), so the whole
    thing stays one range exchange + projections.
    """
    rn_df = global_row_number(df, order_cols, alias="_grn")
    total = rn_df.groupBy().agg(F.count(F.lit(1)).alias("_total"))
    out = rn_df.crossJoin(F.broadcast(total))
    return out.withColumn(alias, ntile_expr(F.col("_grn"), F.col("_total"), k)).drop(
        "_grn", "_total"
    )
