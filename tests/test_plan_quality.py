"""Plan-quality regression guard (docs/SCALE.md §1): every declared batch
query's physical plan is scanned for anti-patterns that would break the
100 TB posture —

- Python row-eval (``BatchEvalPython``) anywhere except the declared
  UDF/UDTF surface demos and pandas-UDF-by-design operators;
- ``CartesianProduct`` (unbounded all-pairs) anywhere except the bounded
  exact-twin pair generators, which are broadcast nested-loop by design;
- parquet scans that read every column while projecting few (pruning
  regression) for the representative projection queries.

This is the executable form of "run .explain and iterate until it's the
plan you'd want".
"""

from __future__ import annotations

import pytest

from vcf2db_spark.queries import QUERIES

# Whole-surface audit: plans all 229 declared queries (~5 min) — the
# costliest module in the suite. The invariants are plan-shape gates,
# not output correctness (that is tests/test_oracle_parity.py), so the
# sweep is opt-in to keep the default run inside the driver's pytest
# window (VERDICT r10 item 2); run with `pytest tests/ -m slow_sweep`.
pytestmark = pytest.mark.slow_sweep

SF = "/root/testdata/sf0.001"

# Python workers by declared design (UDF/UDTF surface demos, numpy matmul
# pandas_udfs, stateful streaming):
PYTHON_OK = {
    "udf_scalar",
    "udaf_grouped",
    "udtf_split",
    "ann_lsh",
    "ann_ivf",
    "stream_stateful_totals",
    # IVF centroid assignment = Arrow-batched numpy matmul by design
    "knn_graph",
    "knn_recall",
    "semdedup",
    # IVFADC: PQ encode + asymmetric-distance scoring = Arrow-batched
    # numpy gather+dot by design (r8)
    "ivfadc_recall",
    # PQ encode / k-means assignment = Arrow-batched numpy matmul by design
    "pq_error",
    "cluster_kmeans",
    # media decode/encode stages are Arrow-batched mapInPandas by design
    "media_features",
}
# streaming drains aren't inspectable the same way (memory-table scan)
STREAMING = {n for n in QUERIES if n.startswith("stream_") and "stream" in n} & {
    "stream_dedup_wm",
    "stream_watermark_append",
    "stream_session_stream",
    "stream_slide_stream",
    "stream_stateful_totals",
}
# bounded pair joins (vec_id < 150 / doc_id < 500 guards) where a
# broadcast nested loop IS the intended physical plan
NESTED_LOOP_OK = {"neardup_cosine", "sim_topk", "join_range", "join_asof"}

BATCH_QUERIES = sorted(set(QUERIES) - STREAMING)


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name in BATCH_QUERIES:
        df = QUERIES[name](spark, SF)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_undeclared_python_eval(plans):
    offenders = [
        n
        for n, p in plans.items()
        if ("BatchEvalPython" in p or "ArrowEvalPython" in p) and n not in PYTHON_OK
    ]
    assert not offenders, f"Python row-eval leaked into JVM-path queries: {offenders}"


def test_no_cartesian_product(plans):
    offenders = [
        n for n, p in plans.items() if "CartesianProduct" in p and n not in NESTED_LOOP_OK
    ]
    assert not offenders, f"unbounded cartesian products: {offenders}"


def test_projection_queries_prune_scan(plans):
    # prune_columns selects 3 of 6 orders columns; the scan must not read
    # more than the projected set (+0 partitions cols in fixtures)
    plan = plans["prune_columns"]
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan, plan
    schema_str = scan[0].split("ReadSchema:")[1]
    assert schema_str.count(",") <= 3, f"scan reads too many columns: {schema_str}"


def test_filter_queries_push_predicates(plans):
    # representative filtered scans must carry a nonempty PushedFilters
    for name in ("filter_pred", "agg_group"):
        pushed = [
            l for l in plans[name].splitlines() if "PushedFilters: [" in l
        ]
        assert pushed and any("PushedFilters: []" not in l for l in pushed), (
            f"{name}: no predicate reached the scan"
        )


def test_no_interpreted_hof_in_generate_filters(plans):
    """Regression guard for the InferFiltersFromGenerate pothole: exploding
    a higher-order-function-built array lets the optimizer clone the whole
    interpreted HOF expression into a non-codegen Filter (2-6x measured).
    The fix is exploding a cheap position sequence and doing slice+hash in
    the post-Generate projection (functions/text.py::
    explode_token_ngram_hashes). Assert no declared query's plan carries a
    Filter whose condition embeds a transform(...) lambda."""
    offenders = []
    for n, p in plans.items():
        for line in p.splitlines():
            s = line.strip()
            if s.startswith("+- Filter ") or s.startswith("Filter ") or "Condition :" in s:
                if "lambdafunction" in s and "transform(" in s:
                    offenders.append(n)
                    break
    assert not offenders, f"interpreted HOF cloned into Filter: {offenders}"


def test_no_single_partition_window(plans):
    """No declared query may plan an unpartitioned WindowExec over
    data-scaled input (the single-task global sort). The deliberate
    bounded-input single-partition path (rank_and_ntile small side)
    partitions by the explicit _pid column, which does not trip this."""
    offenders = []
    for n, p in plans.items():
        # WindowExec prints 'Window [..], [partition spec], [order spec]' —
        # an empty partition spec renders as 'Window [...], [..ASC..]' with
        # only two bracket groups; detect via the warning-equivalent form:
        for line in p.splitlines():
            s = line.strip().lstrip("+-* ")
            if s.startswith("Window ") and ", [" in s:
                # top-level bracket groups: [exprs], [partition], [order].
                # A missing group means either no order spec (fine — e.g.
                # min() over a partition) or NO PARTITION (the single-task
                # global sort): only the latter's second group is an order
                # spec, recognizable by ASC/DESC markers.
                depth = 0
                groups: list[str] = []
                buf = ""
                for ch in s[len("Window "):]:
                    if ch == "[":
                        if depth == 0:
                            buf = ""
                        depth += 1
                    elif ch == "]":
                        depth -= 1
                        if depth == 0:
                            groups.append(buf)
                    elif depth >= 1:
                        buf += ch
                if len(groups) == 2 and ("ASC" in groups[1] or "DESC" in groups[1]):
                    offenders.append(n)
                    break
    assert not offenders, f"unpartitioned global WindowExec: {offenders}"


def test_declared_outputs_are_scalar(spark):
    """Driver-canonicalizer compatibility guard: the driver sorts every
    declared query's result with pandas ``sort_values`` over all columns
    before hashing, and list/dict cells are unhashable — an ARRAY / MAP /
    STRUCT output column crashes the correctness record for that query
    (the round-2 ``agg_collect`` / ``semdedup`` failure class). Every
    declared query must emit scalar columns only; collection results are
    joined to strings on both engines (see ``agg_collect``). Streaming
    queries are included — their drained memory-sink output is
    canonicalized the same way."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name in sorted(QUERIES):
        df = QUERIES[name](spark, SF)
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders.append((name, bad))
    assert not offenders, (
        f"declared queries with unhashable (non-scalar) output columns: {offenders}"
    )


def test_udtf_scan_is_prefiltered(plans):
    """Regression guard for the UDTF lateral-join pothole: a WHERE on the
    lateral join's output is NOT pushed through the Generate, so the
    Python table function runs over the whole corpus (measured 11x on
    udtf_split at sf1). The filter must reach the documents scan."""
    plan = plans["udtf_split"]
    pushed = [l for l in plan.splitlines() if "PushedFilters: [" in l]
    assert pushed and any("LessThan(doc_id,100)" in l for l in pushed), (
        "doc_id<100 did not reach the scan feeding the UDTF:\n" + plan[:2000]
    )
