"""Interval-join operator tests (SURVEY.md §2B B7 at genomic scale):
binned implementation must exactly match the naive theta join, including
bin-boundary-straddling intervals, and its physical plan must be a hash
join on (chrom, bin) — not a nested loop.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from vcf2db_spark.operators.intervals import interval_join, interval_join_naive


def _mk(spark, rows, prefix):
    return spark.createDataFrame(
        [(c, s, e, f"{prefix}{i}") for i, (c, s, e) in enumerate(rows)],
        f"chrom string, start long, end long, {prefix}_id string",
    )


@pytest.fixture(scope="module")
def tables(spark):
    rng = random.Random(7)
    variants = [
        ("chr1", p := rng.randrange(0, 1_000_000), p + rng.choice([1, 1, 50, 5_000]))
        for _ in range(400)
    ] + [("chr2", p := rng.randrange(0, 500_000), p + 10) for _ in range(100)]
    genes = [
        ("chr1", p := rng.randrange(0, 1_000_000), p + rng.randrange(1_000, 120_000))
        for _ in range(60)
    ] + [("chr2", p := rng.randrange(0, 500_000), p + 50_000) for _ in range(10)]
    return _mk(spark, variants, "v"), _mk(spark, genes, "g")


def _pairs(df):
    return sorted((r["v_id"], r["g_id"]) for r in df.select("v_id", "g_id").collect())


def test_binned_matches_naive(tables):
    v, g = tables
    got = _pairs(interval_join(v, g, bin_width=10_000))
    want = _pairs(interval_join_naive(v, g))
    assert want, "fixture should produce overlaps"
    assert got == want


def test_bin_width_invariance(tables):
    v, g = tables
    base = _pairs(interval_join(v, g, bin_width=10_000))
    for w in (1_000, 37_777, 1_000_000):
        assert _pairs(interval_join(v, g, bin_width=w)) == base, f"width={w}"


def test_no_duplicate_pairs_across_bins(spark):
    # one interval spanning many bins overlapping one spanning many bins:
    # the ownership rule must emit the pair exactly once
    a = _mk(spark, [("chr1", 100, 500_000)], "v")
    b = _mk(spark, [("chr1", 250_000, 900_000)], "g")
    out = interval_join(a, b, bin_width=10_000).collect()
    assert len(out) == 1


def test_adjacent_intervals_do_not_overlap(spark):
    # half-open [start, end): touching endpoints are NOT overlaps
    a = _mk(spark, [("chr1", 0, 100)], "v")
    b = _mk(spark, [("chr1", 100, 200)], "g")
    assert interval_join(a, b).count() == 0
    assert interval_join_naive(a, b).count() == 0


def test_binned_plan_is_hash_join(tables):
    v, g = tables
    plan = (
        interval_join(v, g, bin_width=10_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan
