"""Differential correctness: every declared query vs its DuckDB oracle at
sf0.001 (the driver's gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from tools.check import compare
from vcf2db_spark.queries import ORACLES, QUERIES


def test_every_query_has_callable():
    assert QUERIES, "registry must not be empty"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_oracles_are_subset():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle_con, sf_dir):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only contract
        return
    odf = oracle_con.execute(ORACLES[name]).fetchdf()
    ok, msg = compare(sdf, odf)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as E

    rows = E.entry(spark).collect()
    assert len(rows) > 0


def test_fixed_point_sum_matches_duckdb_property(spark):
    """Registry fixed-point convention (dsum/OSUM): for random doubles the
    Spark aggregate and the DuckDB oracle expression must agree EXACTLY
    (bit-for-bit after the downscale divide), including negatives and
    values that land on .5-unit rounding boundaries."""
    import duckdb
    import numpy as np

    from vcf2db_spark.registry import OAVG, OSUM, davg, dsum

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.uniform(-1e5, 1e5, 500),
        np.round(rng.uniform(-100, 100, 200), 2),          # 2-dp money
        (rng.integers(-10**7, 10**7, 200) + 0.5) / 1e6,    # exact .5-unit boundaries
    ])
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got_sum = df.agg(dsum("v").alias("s")).collect()[0]["s"]
    got_avg = df.agg(davg("v").alias("a")).collect()[0]["a"]

    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"v": vals}))
    want_sum = con.execute(f"SELECT {OSUM('v')} FROM t").fetchone()[0]
    want_avg = con.execute(f"SELECT {OAVG('v')} FROM t").fetchone()[0]
    assert got_sum == want_sum, (got_sum, want_sum)
    assert got_avg == want_avg, (got_avg, want_avg)
