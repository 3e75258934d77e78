"""Warehouse-maintenance query tier: batch MERGE INTO and slowly-changing
dimensions — the ETL idioms a reference user runs against the produced
schema when new annotation builds land (SURVEY.md §2A extension; the
streaming twin is `stream_upsert` in queries/streaming_dq.py).

Spark has no MERGE INTO outside transactional table formats; the
DataFrame expression of the same semantics is a full-outer join +
column-wise coalesce, which is also exactly what a format's MERGE
compiles to underneath (minus the transaction log). Both queries here
are oracle-backed — the merge arithmetic is deterministic row algebra.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from vcf2db_spark.io import table
from vcf2db_spark.registry import dq

# --------------------------------------------------------------------------
# batch MERGE INTO (upsert): customers refreshed from recent orders, plus
# net-new rows for unseen keys
# --------------------------------------------------------------------------


@dq(
    "merge_upsert",
    oracle="""
    WITH src AS (
      SELECT o_custkey + CASE WHEN o_orderkey % 7 = 0 THEN 2000000 ELSE 0 END
               AS m_custkey,
             MAX(o_totalprice) AS new_bal
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01'
      GROUP BY 1)
    SELECT COALESCE(c.c_custkey, s.m_custkey) AS c_custkey,
           COALESCE(c.c_name, 'NEW#' || CAST(s.m_custkey AS VARCHAR)) AS c_name,
           ROUND(COALESCE(s.new_bal, c.c_acctbal), 6) AS c_acctbal,
           CASE WHEN c.c_custkey IS NULL THEN 'insert'
                WHEN s.m_custkey IS NULL THEN 'keep'
                ELSE 'update' END AS merge_action
    FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.m_custkey
    """,
)
def merge_upsert(spark, sf_dir):
    """MERGE INTO semantics on plain DataFrames: matched rows take the
    source's value (WHEN MATCHED THEN UPDATE), unmatched-source rows
    insert with synthesized attributes (WHEN NOT MATCHED THEN INSERT),
    untouched targets pass through. One full-outer join on the key —
    source aggregates first, so the join's build side is key-cardinality
    sized. The `merge_action` audit column is what a production MERGE
    reports as its row-level metrics."""
    c = table(spark, sf_dir, "customer")
    src = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(
            (
                F.col("o_custkey")
                + F.when(F.col("o_orderkey") % 7 == 0, F.lit(2000000)).otherwise(0)
            ).alias("m_custkey"),
            "o_totalprice",
        )
        .groupBy("m_custkey")
        .agg(F.max("o_totalprice").alias("new_bal"))
    )
    return c.join(src, c.c_custkey == src.m_custkey, "full_outer").select(
        F.coalesce("c_custkey", "m_custkey").alias("c_custkey"),
        F.coalesce(
            "c_name", F.concat(F.lit("NEW#"), F.col("m_custkey").cast("string"))
        ).alias("c_name"),
        F.round(F.coalesce("new_bal", "c_acctbal"), 6).alias("c_acctbal"),
        F.when(F.col("c_custkey").isNull(), "insert")
        .when(F.col("m_custkey").isNull(), "keep")
        .otherwise("update")
        .alias("merge_action"),
    )


# --------------------------------------------------------------------------
# SCD type-2 dimension build: per-key validity intervals from a change log
# --------------------------------------------------------------------------


@dq(
    "scd2_dim",
    oracle="""
    SELECT o_custkey, o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS valid_from,
           STRFTIME(LEAD(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
           CASE WHEN LEAD(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END
             AS is_current,
           ROUND(o_totalprice, 6) AS attr_price
    FROM orders
    WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def scd2_dim(spark, sf_dir):
    """Slowly-changing-dimension type 2: each change-log row (here:
    orders as the change stream) becomes a version with
    [valid_from, valid_to) bounds via LEAD over the key's timeline; the
    open-ended latest version is flagged current. Window partitioned by
    the dimension key — no global sort; ties broken by o_orderkey so
    both engines pick identical interval chains."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd").alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
        F.round("o_totalprice", 6).alias("attr_price"),
    )
