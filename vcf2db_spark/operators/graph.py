"""Iterative graph operators over edge-list DataFrames.

PageRank here is the Pregel-on-DataFrames shape: the graph lives as a
distributed (src, dst) edge list with the out-degree attached once, and
every iteration is one keyed join (ranks onto edge sources) plus one
aggregation (contributions onto destinations). Nothing materializes on
the driver — rank state is a node-keyed DataFrame end to end, so the
same loop runs on a 100 TB edge list with the joins hash-partitioned by
node id (AQE splits skewed hubs). Iterations are FIXED-count (the
cross-engine determinism contract needs a closed-form oracle; see
queries/graph.py), which also bounds plan depth — a convergence-driven
variant would checkpoint every ~5 rounds to cut lineage, like
operators/dedup.duplicate_clusters does.

Determinism: rank state lives in INTEGER micro-units (1e-6) end to end —
per-edge contributions and per-iteration updates round to integers only
(ties-away integer ROUND is bit-identical across Spark and DuckDB; a
ROUND(double, 6) per iteration is NOT — it hits the HALF_UP-vs-float
boundary the registry.davg docstring describes, observed as 1e-6 flips
on ~1% of nodes at sf0.01), so shuffle order cannot perturb the value
against the unrolled SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    loop: str = "leftjoin",
) -> DataFrame:
    """Fixed-iteration PageRank over a DIRECTED edge list.

    The node set is the nodes WITH out-edges (feed an undirected graph as
    both edge directions — the trade-graph query does this); dangling
    nodes (no out-edge) and their mass redistribution are deliberately
    out of scope for the deterministic twin. A node with out-edges but no
    IN-edges receives no contributions — it is kept alive with the base
    term every iteration, so its outgoing contributions persist across
    iterations on general directed graphs. Returns (node BIGINT, rank
    DOUBLE), rank maintained in integer 1e-6 units per iteration.

    ``loop`` picks the per-iteration persistence device (both produce
    IDENTICAL values and node sets on every graph — pinned by
    tests/test_graph.py::test_loop_variants_identical):

    - ``"leftjoin"`` (default; kept after the round-5 A/B): aggregate
      real contributions, then left-join back onto the node set. The
      join is exchange-free (both sides arrive hash-partitioned on the
      node id), and it MEASURED fastest in every arm of the round-5
      interleaved A/B at sf1 (2.05 s vs union 2.24-2.84 s on 1.68M
      edges; 5.54 vs 6.04 s on 11.7M — BASELINE.md round 5).
    - ``"union"``: edges whose dst is dangling are semi-filtered ONCE
      outside the loop (their mass was dropped after aggregation
      before — same semantics, earlier), and each iteration unions
      zero-contribution rows for every node into the aggregate, so the
      groupBy itself yields the full node set — structurally one stage
      fewer, but the zero rows ride every exchange and the measured
      result is slower at both graph scales. Kept for the parity test
      and as the documented alternative.

    Round-5 floor decomposition (BASELINE.md): the identical loop over
    a 60-EDGE graph runs 0.96 s — pure stage-barrier latency, half of
    the 2.05 s sf1 total — and at 7× the edges Spark (5.5 s) beats the
    unrolled in-process SQL twin (13.2 s) 2.4× outright: the loop's
    overhead is fixed per iteration and amortizes with volume, exactly
    the regime a 1000-executor graph lives in.
    """
    dir_edges = edges.select(
        F.col(src).cast("bigint").alias("_src"), F.col(dst).cast("bigint").alias("_dst")
    )
    deg = dir_edges.groupBy("_src").agg(F.count(F.lit(1)).alias("_d"))
    # deg is consumed by the edge join, the node set (hence every
    # iteration's left join) and the union variant's semi filter; without
    # a barrier Catalyst INLINES the whole upstream edge-build DAG into
    # each consumer — measured on the trade-graph query: 3 full copies of
    # the orders⋈lineitem→distinct subtree in the final plan (56
    # Exchanges, 29 joins for 3 iterations). One lazy localCheckpoint of
    # the node-sized degree table collapses that to a single edge build.
    deg = deg.localCheckpoint(eager=False)
    # Degree rides along with the edge so the loop body is a single join.
    # The static edge relation is hash-partitioned on its join key ONCE,
    # outside the loop: the rank state arrives at each iteration already
    # hash-partitioned on the node id (the previous aggregation keyed it;
    # alias-preserving Project keeps the partitioning), so hoisting this
    # exchange leaves ONE shuffle per iteration (the contribution
    # aggregation), not two — the same relation was re-exchanged every
    # round before.
    try:
        shuffle_n = int(
            edges.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):
        # conf can be unset or non-numeric ("auto" on some platforms) —
        # stay config-agnostic rather than crash the operator
        shuffle_n = edges.sparkSession.sparkContext.defaultParallelism
    withdeg = dir_edges.join(deg, "_src")
    nodes = deg.select(F.col("_src").alias("node"))
    if loop == "union":
        # drop edges INTO dangling nodes once, statically: their
        # aggregated mass was discarded by the left join anyway (dangling
        # nodes are out of contract); filtering here lets the loop's
        # groupBy emit exactly the node set with no post-join. deg is
        # node-sized — broadcastable at the fixture scales, and at true
        # scale this one-time semi join is amortized over all iterations.
        withdeg = withdeg.join(
            deg.select(F.col("_src").alias("_dst")), "_dst", "semi"
        )
    # materialize the static edge relation ONCE (lazy localCheckpoint —
    # the first iteration's join pays it): it is re-consumed every
    # iteration, and without the barrier each iteration re-evaluates the
    # edge build (scan + distinct + degree join). Same device as
    # operators/dedup._cc_loop's edge materialization; at 100 TB this is
    # the loop-invariant you persist before any iterative graph pass.
    withdeg = withdeg.repartition(shuffle_n, "_src").localCheckpoint(
        eager=False
    )
    ranks = nodes.select(
        "node", F.lit(1_000_000).cast("long").alias("_u")
    )
    zero = nodes.select(
        F.col("node").alias("_dst"), F.lit(0).cast("long").alias("_cu")
    )
    # NOT (1.0 - damping) * 1e6: for damping=0.85 that evaluates to
    # 150000.00000000003 (0.15 is inexact in binary), one ulp above the
    # oracle twin's literal 150000.0 — enough to flip a ROUND(.5)
    # midpoint. The subtraction form is exact for any damping that is
    # exact in units (850000.0 is).
    base_units = 1_000_000.0 - damping * 1_000_000.0
    for _ in range(iters):
        contrib = withdeg.join(ranks, withdeg._src == ranks.node).select(
            F.col("_dst"),
            F.round(F.col("_u").cast("double") / F.col("_d")).cast("long").alias("_cu"),
        )
        if loop == "union":
            # one stage: zero rows ride the same exchange, so the
            # aggregate itself emits every node (sum over just the zero
            # row = base term — identical to the coalesce default)
            ranks = (
                contrib.unionAll(zero)
                .groupBy("_dst")
                .agg(
                    F.round(
                        F.lit(base_units)
                        + F.lit(damping) * F.sum("_cu").cast("double")
                    )
                    .cast("long")
                    .alias("_u")
                )
                .select(F.col("_dst").alias("node"), "_u")
            )
            continue
        agg = (
            contrib.groupBy("_dst")
            .agg(
                F.round(
                    F.lit(base_units) + F.lit(damping) * F.sum("_cu").cast("double")
                )
                .cast("long")
                .alias("_u")
            )
            .select(F.col("_dst").alias("node"), "_u")
        )
        # source-only nodes got no contributions: keep them at the base
        # term so they still emit next round (both sides hash-partitioned
        # on node — no exchange under this join)
        ranks = nodes.join(agg, "node", "left").select(
            "node",
            F.coalesce(
                F.col("_u"), F.round(F.lit(base_units)).cast("long")
            ).alias("_u"),
        )
    return ranks.select(
        "node", (F.col("_u").cast("double") / F.lit(1_000_000.0)).alias("rank")
    )
