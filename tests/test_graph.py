"""PageRank operator tests: hand-derivable graphs + invariants the
unrolled-SQL oracle can't see (parameter variation, normalization)."""

from __future__ import annotations

import pytest

from vcf2db_spark.operators.graph import pagerank


def _edges(spark, pairs):
    df = spark.createDataFrame(pairs, "src: bigint, dst: bigint")
    return df


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_symmetric_pair(spark):
    # two nodes, one undirected edge: fully symmetric, rank stays 1.0
    # at every iteration (each node forwards its whole rank to the other:
    # 0.15 + 0.85 * 1.0 = 1.0).
    r = _ranks(pagerank(_edges(spark, [(1, 2), (2, 1)]), iters=3))
    assert r == {1: 1.0, 2: 1.0}


def test_triangle_uniform(spark):
    # complete 3-cycle both directions: each node has degree 2 and receives
    # two half-ranks; uniform fixpoint rank 1.0 throughout.
    pairs = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
    r = _ranks(pagerank(_edges(spark, pairs), iters=2))
    assert r == {1: 1.0, 2: 1.0, 3: 1.0}


def test_star_hand_computed(spark):
    # undirected star 0–{1,2,3}: after one iteration the hub holds
    # 0.15 + 0.85 * (3 leaves × rank 1.0 / degree 1) = 2.70 and each leaf
    # 0.15 + 0.85 * (1.0 / 3) ≈ 0.433333.
    pairs = [(0, i) for i in (1, 2, 3)] + [(i, 0) for i in (1, 2, 3)]
    r = _ranks(pagerank(_edges(spark, pairs), iters=1))
    assert r[0] == pytest.approx(2.7, abs=1e-6)
    for leaf in (1, 2, 3):
        assert r[leaf] == pytest.approx(0.433333, abs=1e-6)


def test_rank_mass_conserved(spark):
    # with no dangling nodes the total rank mass is invariant:
    # Σ r' = Σ (0.15 + 0.85 · Σ_in r/d) = 0.15·n + 0.85·Σ r = n when
    # starting from Σ r = n (up to the 1e-6 unit rounding per node).
    pairs = [(0, i) for i in (1, 2, 3)] + [(i, 0) for i in (1, 2, 3)] + [(1, 2), (2, 1)]
    df = pagerank(_edges(spark, pairs), iters=3)
    total = sum(_ranks(df).values())
    assert total == pytest.approx(4.0, abs=1e-4)


def test_damping_zero_is_uniform(spark):
    # damping 0 ⇒ every node's rank collapses to the base term.
    pairs = [(0, 1), (1, 0), (1, 2), (2, 1)]
    r = _ranks(pagerank(_edges(spark, pairs), iters=2, damping=0.0))
    assert set(r.values()) == {1.0}


def test_arrow_normalize_handles_trailing_empty_list(spark):
    # regression: a batch whose LAST row has an empty embedding used to
    # crash np.add.reduceat (start index == len(values)); empty lists
    # anywhere must yield n_dims=0 and a 0.0 norm instead
    import vcf2db_spark.queries.vectors  # noqa: F401  (registers the DQ)
    from vcf2db_spark.queries import QUERIES

    rows = [(1, [3.0, 4.0]), (2, []), (3, [1.0]), (4, [])]
    df = spark.createDataFrame(rows, "vec_id: bigint, embedding: array<float>")
    df.createOrReplaceTempView("_t")
    # drive the same mapInArrow body through a crafted frame
    from pyspark.sql import functions as F

    import vcf2db_spark.queries.vectors as qv

    orig = qv.table_wide  # patch the module-local name the query bound at import
    try:
        qv.table_wide = lambda *a, **k: df
        out = {r["vec_id"]: (r["n_dims"], r["l2_norm"])
               for r in QUERIES["arrow_normalize"](spark, "unused").collect()}
    finally:
        qv.table_wide = orig
    assert out[1] == (2, 5.0)
    assert out[2] == (0, 0.0)
    assert out[3] == (1, 1.0)
    assert out[4] == (0, 0.0)


def test_interval_merge_duplicate_timestamps(spark):
    """Regression for the running-sum tie-break: two events at the SAME
    (user, ts) where one opens a new island must merge deterministically
    (event_id order). Hand-computed: user 1 has events at t=0s and both
    duplicates at t=400s (gap > 300s window): intervals [0,300), [400,700)
    ×2 → 2 merged islands, covered = 300s + 300s = 600s."""
    import vcf2db_spark.queries.analytics as qa
    from pyspark.sql import functions as F

    from vcf2db_spark.queries import QUERIES

    base = 1_700_000_000_000_000  # epoch micros
    rows = [
        (1, 10, base),
        (1, 11, base + 400_000_000),
        (1, 12, base + 400_000_000),  # exact duplicate ts, higher event_id
    ]
    df = spark.createDataFrame(rows, "user_id: bigint, event_id: bigint, uts: bigint").select(
        "user_id", "event_id", F.expr("timestamp_micros(uts)").cast("timestamp_ntz").alias("ts")
    )
    orig = qa.table_wide
    try:
        qa.table_wide = lambda *a, **k: df
        out = QUERIES["interval_merge"](spark, "unused").collect()
    finally:
        qa.table_wide = orig
    assert len(out) == 1
    r = out[0]
    assert r["n_intervals"] == 2
    assert r["covered_us"] == 600_000_000


def _events_df(spark, rows):
    """rows: (user_id, event_id, offset_seconds, event_type, value)."""
    from pyspark.sql import functions as F

    base = 1_700_000_000_000_000
    df = spark.createDataFrame(
        [(u, e, base + s * 1_000_000, t, v) for u, e, s, t, v in rows],
        "user_id: bigint, event_id: bigint, uts: bigint, event_type: string, value: double",
    )
    return df.select(
        "user_id", "event_id", "event_type", "value",
        F.expr("timestamp_micros(uts)").cast("timestamp_ntz").alias("ts"),
    )


def test_funnel_strictly_after_semantics(spark):
    """A stage event BEFORE the previous stage's first event must not
    count: user 1 completes signup→view→click in order; user 2's view
    precedes their signup (drops at stage 2); nobody purchases."""
    import vcf2db_spark.queries.windows as qw
    from vcf2db_spark.queries import QUERIES

    rows = [
        (1, 1, 0, "signup", 1.0), (1, 2, 10, "view", 1.0), (1, 3, 20, "click", 1.0),
        (2, 4, 100, "view", 1.0), (2, 5, 200, "signup", 1.0),
    ]
    df = _events_df(spark, rows)
    import vcf2db_spark.queries.analytics as qa

    orig = qa.table_wide
    try:
        qa.table_wide = lambda *a, **k: df
        out = {r["stage"]: r["n_users"]
               for r in QUERIES["funnel_stages"](spark, "unused").collect()}
    finally:
        qa.table_wide = orig
    assert out == {"signup": 2, "view": 1, "click": 1, "purchase": 0}


def test_drift_ks_hand_computed(spark):
    """KS statistic against a by-hand CDF: sample A = {1,2}, B = {2,3}
    (one event_type; the 2024-01-15 cutoff splits the halves). CDFs at
    sorted values [1,2,3]: A = .5,1,1 and B = 0,.5,1 → max gap 0.5."""
    import vcf2db_spark.queries.analytics as qa
    from vcf2db_spark.queries import QUERIES

    day = 86_400
    rows = [
        (1, 1, 0, "click", 1.0), (1, 2, 10, "click", 2.0),
        (1, 3, 70 * day, "click", 2.0), (1, 4, 70 * day + 10, "click", 3.0),
        # one-sided segment: entirely pre-cutoff — must be EXCLUDED, not
        # divide-by-zero (the ANSI crash this test originally caught)
        (1, 5, 0, "error", 9.0),
    ]
    # base epoch 1_700_000_000 = 2023-11-14; +0s is before the 2024-01-15
    # cutoff, +70d (2024-01-23) is after — the in_a flag splits 2/2
    df = _events_df(spark, rows)
    orig = qa.table_wide
    try:
        qa.table_wide = lambda *a, **k: df
        out = QUERIES["drift_ks"](spark, "unused").collect()
    finally:
        qa.table_wide = orig
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["ks_stat"] == 0.5


def test_grouped_ols_hand_computed(spark):
    """Exact line y = 1 + x/3600 (1 unit/hour): three points at 0, 1h, 2h
    must recover slope_per_hour=1, intercept=1 exactly; a single-instant
    user (zero time variance) must be excluded by the determinant test."""
    import vcf2db_spark.queries.analytics as qa
    from vcf2db_spark.queries import QUERIES

    rows = [
        (1, 1, 0, "view", 1.0),
        (1, 2, 3600, "view", 2.0),
        (1, 3, 7200, "view", 3.0),
        (2, 4, 50, "view", 7.0),  # one instant -> no fit
    ]
    df = _events_df(spark, rows)
    orig = qa.table_wide
    try:
        qa.table_wide = lambda *a, **k: df
        out = {r["user_id"]: r for r in QUERIES["grouped_ols"](spark, "unused").collect()}
    finally:
        qa.table_wide = orig
    assert set(out) == {1}
    assert out[1]["n"] == 3
    assert out[1]["slope_per_hour"] == 1.0
    assert out[1]["intercept"] == 1.0


def test_retention_cohort_hand_computed(spark):
    """User A active in weeks 0 and 2 (one cohort cell each), user B in
    week 0 only; both share cohort week. Matrix: offset 0 → 2 users,
    offset 2 → 1 user."""
    import vcf2db_spark.queries.analytics as qa
    from vcf2db_spark.queries import QUERIES

    wk = 604_800
    rows = [
        (1, 1, 0, "view", 1.0), (1, 2, 2 * wk, "view", 1.0),
        (1, 3, 2 * wk + 60, "view", 1.0),  # same week, must not double-count
        (2, 4, 100, "view", 1.0),
    ]
    df = _events_df(spark, rows)
    orig = qa.table_wide
    try:
        qa.table_wide = lambda *a, **k: df
        out = {(r["cohort_wk"] - min(x["cohort_wk"] for x in
                QUERIES["retention_cohort"](spark, "unused").collect()),
                r["offset_wk"]): r["n_active"]
               for r in QUERIES["retention_cohort"](spark, "unused").collect()}
    finally:
        qa.table_wide = orig
    assert out == {(0, 0): 2, (0, 2): 1}


def test_search_bm25_formula_hand_computed(spark):
    """Two-doc corpus, query terms from the registered _BM25_TERMS:
    doc 1 = 'join join filler', doc 2 = 'filler filler filler'. Only
    doc 1 matches; its score is idf(join) * tf(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
    with tf=2, dl=3, avgdl=3, df=1, N=2 — computed independently here
    in Python and compared to the engine output at 6 decimals."""
    import math

    import vcf2db_spark.queries.pipeline_ext as qp
    from pyspark.sql import functions as F
    from vcf2db_spark.queries import QUERIES

    docs = spark.createDataFrame(
        [(1, "join join filler"), (2, "filler filler filler")],
        "doc_id: bigint, text: string",
    )
    orig = qp.table_wide
    try:
        qp.table_wide = lambda *a, **k: docs
        out = QUERIES["search_bm25"](spark, "unused").collect()
    finally:
        qp.table_wide = orig
    assert len(out) == 1 and out[0]["doc_id"] == 1
    idf = math.log(1.0 + (2 - 1 + 0.5) / (1 + 0.5))
    expected = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / 3.0))
    # engine sums in 1e-6 fixed point before the final value
    assert abs(out[0]["score"] - round(expected, 6)) <= 1e-6


def test_pagerank_source_only_node_persists(spark):
    """A node with out-edges but no in-edges (3→2 below) receives no
    contributions, but must stay at the base term and KEEP CONTRIBUTING
    in later iterations (ADVICE r3: it used to drop out of the rank
    state after iteration 1, silently zeroing its out-flow). Hand
    computation, iteration 2: node 2 = 0.15 + 0.85·(r1(1) + r1(3))
    = 0.15 + 0.85·(1.0 + 0.15) = 1.1275 — the old behaviour gave 1.0."""
    r = _ranks(pagerank(_edges(spark, [(1, 2), (2, 1), (3, 2)]), iters=2))
    assert r[3] == pytest.approx(0.15, abs=1e-6)
    assert r[2] == pytest.approx(1.1275, abs=1e-6)
    assert r[1] == pytest.approx(0.15 + 0.85 * 1.85, abs=1e-6)


def test_grouped_ols_span_rebase_hand_computed(spark):
    """Beyond the 3e6 s span threshold x rebases to minutes; an exact
    line y = 1 + x_minutes over points at 0 / 1000 h / 2000 h must
    recover slope_per_hour = 60 and intercept = 1 exactly (the rescale
    3600/unit_s must compose with the minute grid)."""
    import vcf2db_spark.queries.analytics as qa
    from vcf2db_spark.queries import QUERIES

    rows = [
        (1, 1, 0, "view", 1.0),
        (1, 2, 3_600_000, "view", 60_001.0),
        (1, 3, 7_200_000, "view", 120_001.0),
    ]
    df = _events_df(spark, rows)
    orig = qa.table_wide
    try:
        qa.table_wide = lambda *a, **k: df
        out = QUERIES["grouped_ols"](spark, "unused").collect()
    finally:
        qa.table_wide = orig
    assert len(out) == 1
    assert out[0]["slope_per_hour"] == 60.0
    assert out[0]["intercept"] == 1.0


@pytest.mark.slow_sweep  # 1M-row overflow-cliff probe (~21 s); driver-window fit
def test_grouped_ols_cliff_no_overflow_and_oracle_lockstep(spark, tmp_path):
    """Property test AT the Σx² cliff (VERDICT r3 item 9): 1M events for
    one entity spread over a 6e6 s span — in raw seconds Σx² ≈ 1.2e19
    OVERFLOWS BIGINT (ANSI abort); the per-entity minute rebase keeps
    every sum exact, the query must RUN, match the DuckDB oracle
    bitwise on the same parquet, and recover the planted trend."""
    import duckdb
    from pyspark.sql import functions as F

    import vcf2db_spark.queries.analytics as qa
    from tools.check import compare
    from vcf2db_spark.queries import ORACLES, QUERIES

    n, span = 1_000_000, 6_000_000
    base = 1_700_000_000_000_000
    path = str(tmp_path / "events.parquet")
    # y = 2 + 1e-6·x_sec (slope 0.0036/h) — y stays O(1) so the y-side
    # fixed-point sums respect their own documented ±9.2e12-unit bound
    # (registry.py); the cliff under test is the x²/x·y moments
    (spark.range(n).select(
        F.lit(1).cast("bigint").alias("user_id"),
        F.col("id").alias("event_id"),
        F.lit("view").alias("event_type"),
        (F.lit(2.0) + 0.000001 * (F.col("id") * span / n)).alias("value"),
        F.expr(f"timestamp_micros({base} + CAST(id * {span} / {n} AS BIGINT)"
               " * 1000000)").cast("timestamp_ntz").alias("ts"),
        F.lit("{}").alias("props"),
    ).coalesce(1).write.mode("overwrite").parquet(path))
    df = spark.read.parquet(path)
    orig = qa.table_wide
    try:
        qa.table_wide = lambda *a, **k: df
        sdf = QUERIES["grouped_ols"](spark, "unused").toPandas()
    finally:
        qa.table_wide = orig
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')")
    odf = con.execute(ORACLES["grouped_ols"]).fetchdf()
    ok, msg = compare(sdf, odf)
    assert ok, msg
    assert len(sdf) == 1
    assert abs(sdf["slope_per_hour"].iloc[0] - 0.0036) < 0.0001


def test_graph_triangles_hand_computed(spark):
    """Hand graph: order 0 supplies {1,2,3} (triangle 1-2-3), order 34
    supplies {2,3,4} (triangle 2-3-4), order 17 supplies {3,4} (already
    an edge). Ordered-wedge counting keys each triangle ONCE by its
    smallest member: node 1 -> 1 triangle, node 2 -> 1 triangle."""
    import vcf2db_spark.queries.graph as qg
    from vcf2db_spark.queries import QUERIES

    rows = [(0, s) for s in (1, 2, 3)] + [(34, s) for s in (2, 3, 4)] + [
        (17, 3), (17, 4)]
    df = spark.createDataFrame(rows, "l_orderkey: bigint, l_suppkey: bigint")
    orig = qg.table
    try:
        qg.table = lambda *a, **k: df
        out = {r["node"]: r["n_triangles"]
               for r in QUERIES["graph_triangles"](spark, "unused").collect()}
    finally:
        qg.table = orig
    assert out == {1: 1, 2: 1}


def test_markov_transitions_hand_computed(spark):
    """User path A,B,A,C gives transitions A->B, B->A, A->C: from-state A
    row-normalizes to 0.5/0.5, B to 1.0; a same-timestamp tie resolves
    by event_id so the chain is deterministic."""
    import vcf2db_spark.queries.analytics as qa
    from vcf2db_spark.queries import QUERIES

    rows = [
        (1, 1, 0, "A", 1.0),
        (1, 2, 10, "B", 1.0),
        (1, 3, 20, "A", 1.0),
        (1, 4, 20, "C", 1.0),  # ties with event 3 on ts; event_id orders it
    ]
    df = _events_df(spark, rows)
    orig = qa.table_wide
    try:
        qa.table_wide = lambda *a, **k: df
        out = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
               for r in QUERIES["markov_transitions"](spark, "unused").collect()}
    finally:
        qa.table_wide = orig
    assert out == {("A", "B"): (1, 0.5), ("B", "A"): (1, 1.0),
                   ("A", "C"): (1, 0.5)}


def test_drift_psi_identical_halves_zero_and_shift_formula(spark):
    """PSI semantics: a segment whose value distribution is IDENTICAL in
    both halves scores exactly 0.0 (p=q per bin under the same Laplace
    smoothing); a segment that moves all mass from bin 0 to bin 1 scores
    the hand-computed smoothed formula."""
    import math

    from pyspark.sql import functions as F

    import vcf2db_spark.queries.analytics as qa
    from vcf2db_spark.queries import QUERIES

    # ts straddling the 2024-01-16 split (epoch micros)
    before = 1_705_000_000_000_000   # 2024-01-11
    after = 1_705_800_000_000_000    # 2024-01-21
    rows = [
        # 'same': two value-10 events each half -> psi 0
        (1, "same", before, 10.0), (2, "same", before + 1_000_000, 10.0),
        (3, "same", after, 10.0), (4, "same", after + 1_000_000, 10.0),
        # 'shift': bin 0 (value 10) -> bin 1 (value 60)
        (5, "shift", before, 10.0), (6, "shift", before + 1_000_000, 10.0),
        (7, "shift", after, 60.0), (8, "shift", after + 1_000_000, 60.0),
    ]
    df = spark.createDataFrame(
        [(e, t, u, v) for e, t, u, v in rows],
        "event_id: bigint, event_type: string, uts: bigint, value: double",
    ).select(
        "event_id", "event_type", "value",
        F.expr("timestamp_micros(uts)").cast("timestamp_ntz").alias("ts"),
        F.lit(1).cast("bigint").alias("user_id"),
    )
    orig = qa.table_wide
    try:
        qa.table_wide = lambda *a, **k: df
        out = {r["event_type"]: r["psi"]
               for r in QUERIES["drift_psi"](spark, "unused").collect()}
    finally:
        qa.table_wide = orig
    assert out["same"] == 0.0
    # hand formula, 10 bins, +1 smoothing, totals 2 per half:
    # bin0: p=(2+1)/12, q=(0+1)/12; bin1: p=1/12, q=3/12; bins 2-9: 1/12 both
    p0, q0 = 3 / 12, 1 / 12
    expected = round((p0 - q0) * math.log(p0 / q0)
                     + (q0 - p0) * math.log(q0 / p0), 6)
    assert out["shift"] == expected


def test_loop_variants_identical(spark):
    """The round-5 zero-row-union loop body must equal the left-join body
    node-for-node — including on DIRECTED graphs with source-only nodes
    (out-edges, no in-edges) and dangling destinations (in-edges, no
    out-edges; out of contract, must be absent from BOTH outputs)."""
    cases = [
        # undirected star + extra cycle (the declared-query shape)
        [(0, i) for i in (1, 2, 3)] + [(i, 0) for i in (1, 2, 3)] + [(1, 2), (2, 1)],
        # directed chain with a source-only head and a dangling tail:
        # 0 -> 1 -> 2 -> 3 (3 has no out-edge)
        [(0, 1), (1, 2), (2, 3)],
        # mixed: hub broadcasts to a dangler and a cycle
        [(0, 9), (0, 1), (1, 0), (1, 9), (2, 0)],
    ]
    for pairs in cases:
        e = _edges(spark, pairs)
        a = _ranks(pagerank(e, iters=3, loop="union"))
        b = _ranks(pagerank(e, iters=3, loop="leftjoin"))
        assert a == b, pairs
        srcs = {s for s, _ in pairs}
        assert set(a) == srcs, pairs  # dangling dsts absent, sources kept
