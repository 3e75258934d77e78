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
