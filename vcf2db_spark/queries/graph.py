"""Graph-analytics query tier: PageRank over the customer–supplier trade
graph (SURVEY.md §2 C-tier extension alongside dedup_clusters' connected
components).

The graph: an undirected bipartite trade graph — customer c and supplier
s are linked iff some order of c contains a line supplied by s (distinct
pairs from orders⋈lineitem; supplier node ids offset by 10M to keep the
two key spaces disjoint). PageRank then ranks "centrality in the trade
network" — the same shape as ranking near-duplicate document clusters or
citation graphs in a training-data pipeline.

Oracle: the iterative operator is hash-checked against a closed-form
UNROLLED twin — three CTE levels, one per iteration, each applying the
identical fixed-point contribution sum and 6-decimal re-round. An
iterative distributed loop equaling a straight-line SQL derivation is the
strongest correctness signal the harness can express for fixed-iteration
algorithms (same pattern as dedup_clusters' recursive-CTE closure).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vcf2db_spark.io import table
from vcf2db_spark.operators.graph import pagerank
from vcf2db_spark.registry import dq

_SUPP_OFFSET = 10_000_000

# Each level LEFT-joins the contribution aggregate back onto the full
# node set (r0): a node with out-edges but no in-edges receives nothing
# and stays at the base term — mirroring operators/graph.pagerank's
# source-node persistence. On the undirected trade graph every node has
# in-edges, so the COALESCE default never fires at fixture scale.
_ITER = """
    r{n} AS (
      SELECT r0.node, COALESCE(a{n}.u, CAST(ROUND(150000.0) AS BIGINT)) AS u
      FROM r0 LEFT JOIN (
        SELECT ed.dst AS node,
               CAST(ROUND(150000.0 + 0.85 * CAST(SUM(
                 CAST(ROUND(CAST(r{p}.u AS DOUBLE) / ed.d) AS BIGINT)
               ) AS DOUBLE)) AS BIGINT) AS u
        FROM ed JOIN r{p} ON r{p}.node = ed.src
        GROUP BY ed.dst
      ) a{n} ON a{n}.node = r0.node
    )"""


def _pagerank_oracle() -> str:
    iters = ",".join(_ITER.format(n=i, p=i - 1) for i in (1, 2, 3))
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey AS a, l_suppkey + {_SUPP_OFFSET} AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_custkey % 7 = 0
    ),
    dir AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION ALL
      SELECT b AS src, a AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM dir GROUP BY src),
    ed AS (SELECT dir.src, dir.dst, deg.d FROM dir JOIN deg ON dir.src = deg.src),
    r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS u FROM deg),
    {iters}
    SELECT CAST(node AS BIGINT) AS node_id,
           CAST(u AS DOUBLE) / 1000000.0 AS rank
    FROM r3
    """


@dq("pagerank", oracle=_pagerank_oracle())
def pagerank_trade(spark, sf_dir):
    """3-iteration PageRank over the undirected customer–supplier trade
    graph. Spark side: operators/graph.pagerank — per iteration one keyed
    join + one aggregation, rank state stays distributed (no driver
    materialization, no collect), degrees attached to edges once. The
    edge build is a real fact join (orders⋈lineitem) collapsed to
    distinct pairs BEFORE the loop, so the iterations run over the
    deduplicated graph, not the raw fact table."""
    # bounded input (harness convention, same as curate_docs): the graph
    # BUILD is a full fact join and scales linearly; restricting to a
    # 1-in-7 customer slice keeps the per-round compare from dominating
    # the bench while exercising the identical plan. The operator itself
    # has no bound.
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 7 == 0)
        .select("o_orderkey", "o_custkey")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").cast("bigint").alias("a"),
            (F.col("l_suppkey").cast("bigint") + F.lit(_SUPP_OFFSET)).alias("b"),
        )
        .distinct()
    )
    dir_edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return pagerank(dir_edges, iters=3).select(
        F.col("node").alias("node_id"), "rank"
    )


@dq(
    "graph_triangles",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey FROM lineitem
      WHERE l_orderkey % 17 = 0
    ),
    e AS (
      SELECT DISTINCT LEAST(a.l_suppkey, b.l_suppkey) AS u,
                      GREATEST(a.l_suppkey, b.l_suppkey) AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    )
    SELECT e1.u AS node, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    GROUP BY e1.u
    """,
)
def graph_triangles(spark, sf_dir):
    """Triangle counting over the supplier co-purchase graph (two
    suppliers are linked iff some order contains lines from both — the
    trade graph itself is bipartite and triangle-free). The classic
    ordered-wedge formulation: with every edge stored once as u < v,
    a triangle a<b<c is counted exactly once by joining wedge (a,b)
    + (b,c) against closing edge (a,c) — no per-node adjacency lists,
    no driver state, two equi-join shuffles on edge endpoints. Skewed
    hubs (high-degree suppliers) split under AQE. The standard
    degree-ordering optimization (orient edges low→high degree to bound
    per-apex wedge fan-out) was A/B'd at sf1 in round 5 and REJECTED
    here: 2.57 vs 2.04 s median, value-identical (BASELINE.md) — this
    co-purchase graph's degree distribution is flat (uniform TPC-H
    supplier popularity), so the wedge reduction never recoups the
    degree-count + orientation joins. It remains the right knob for
    power-law graphs, where Σ d_out² drops by orders of magnitude.
    Per-node output keyed by the triangle's smallest member."""
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 17 == 0)
        .select("l_orderkey", "l_suppkey")
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.least(F.col("a.l_suppkey"), F.col("b.l_suppkey")).alias("u"),
            F.greatest(F.col("a.l_suppkey"), F.col("b.l_suppkey")).alias("v"),
        )
        .distinct()
    )
    # e is consumed three times (wedge sides + closing edge); without a
    # barrier each alias re-evaluates the pair join + distinct — measured
    # 6 lineitem scans / 10 Exchanges in the executed plan. One lazy
    # localCheckpoint of the (bounded) ordered edge set collapses that to
    # one build; the triangle joins then run over the materialized edges.
    e = e.localCheckpoint(eager=False)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    return (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .groupBy(F.col("e1.u").alias("node"))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
