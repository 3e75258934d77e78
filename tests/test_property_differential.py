"""Property-based differential testing (SURVEY.md §5.4): seeded random
query templates rendered to ONE ANSI SQL string executed by BOTH Spark SQL
and DuckDB over the same parquet; results must match exactly.

Deterministic by construction: fixed seed list committed; aggregates
restricted to order-insensitive integer/string forms (COUNT, MIN, MAX,
SUM of integral values) so float summation order cannot perturb results —
the float-aggregate discipline is covered by the dsum/OSUM DQ harness.
"""

from __future__ import annotations

import random

import pytest

from vcf2db_spark.io import table

SF_DIR = "/root/testdata/sf0.001"
SEEDS = list(range(40))

_FLAGS = ["'R'", "'N'", "'A'"]
_STATUS = ["'O'", "'F'", "'P'"]


def _predicate(rng: random.Random) -> str:
    kind = rng.randrange(6)
    if kind == 0:
        return f"l_quantity < {rng.randint(2, 50)}"
    if kind == 1:
        return f"l_returnflag = {rng.choice(_FLAGS)}"
    if kind == 2:
        picks = rng.sample(_STATUS, rng.randint(1, 2))
        return f"l_linestatus IN ({', '.join(picks)})"
    if kind == 3:
        return f"l_orderkey % {rng.randint(2, 7)} = {rng.randint(0, 1)}"
    if kind == 4:
        m, d = rng.randint(1, 12), rng.randint(1, 28)
        return f"l_shipdate < TIMESTAMP '2024-{m:02d}-{d:02d} 00:00:00'"
    return f"l_discount >= 0.0{rng.randint(1, 9)}"


def _where(rng: random.Random) -> str:
    n = rng.randint(1, 3)
    preds = [_predicate(rng) for _ in range(n)]
    return " AND ".join(preds) if rng.random() < 0.7 else " OR ".join(preds)


def _agg_query(seed: int) -> str:
    rng = random.Random(seed)
    keys = rng.sample(["l_returnflag", "l_linestatus", "l_linenumber"], rng.randint(0, 2))
    aggs = ["COUNT(*) AS n", "MIN(l_orderkey) AS min_k", "MAX(l_orderkey) AS max_k"]
    if rng.random() < 0.5:
        aggs.append("SUM(CAST(l_quantity AS BIGINT)) AS sum_qty")
    if rng.random() < 0.5:
        aggs.append("COUNT(DISTINCT l_suppkey) AS n_supp")
    select = ", ".join(keys + aggs)
    sql = f"SELECT {select} FROM lineitem WHERE {_where(rng)}"
    if keys:
        sql += f" GROUP BY {', '.join(keys)} ORDER BY {', '.join(keys)}"
    return sql


def _join_query(seed: int) -> str:
    rng = random.Random(seed + 10_000)
    return (
        "SELECT o_orderstatus, COUNT(*) AS n, MIN(l_orderkey) AS min_k "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        f"WHERE {_where(rng)} AND o_totalprice < {rng.randint(50, 400) * 1000} "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    for t in ("lineitem", "orders", "customer"):
        table(spark, SF_DIR, t).createOrReplaceTempView(t)


def _run_both(spark, oracle_con, sql: str):
    got = [tuple(r) for r in spark.sql(sql).collect()]
    want = [tuple(r) for r in oracle_con.execute(sql).fetchall()]
    # un-grouped queries return one row; grouped are ORDER BY'd — compare as-is
    assert got == want, f"engines disagree on:\n{sql}\nspark={got[:5]}\nduck={want[:5]}"


@pytest.mark.parametrize("seed", SEEDS)
def test_agg_template(seed, spark, oracle_con):
    _run_both(spark, oracle_con, _agg_query(seed))


@pytest.mark.parametrize("seed", SEEDS[:10])
def test_join_template(seed, spark, oracle_con):
    _run_both(spark, oracle_con, _join_query(seed))


def _window_query(seed: int) -> str:
    rng = random.Random(seed + 20_000)
    part = rng.choice(["l_returnflag", "l_linestatus", "l_suppkey % 10"])
    metric = rng.choice(["l_quantity", "l_extendedprice", "l_orderkey"])
    k = rng.randint(1, 4)
    return (
        f"SELECT part_key, n FROM ("
        f"  SELECT {part} AS part_key, l_orderkey, l_linenumber,"
        f"         ROW_NUMBER() OVER (PARTITION BY {part}"
        f"                            ORDER BY {metric} DESC, l_orderkey, l_linenumber) AS n"
        f"  FROM lineitem WHERE {_where(rng)}"
        f") WHERE n <= {k} ORDER BY part_key, n"
    )


@pytest.mark.parametrize("seed", SEEDS[:15])
def test_window_template(seed, spark, oracle_con):
    _run_both(spark, oracle_con, _window_query(seed))


def _interval_query(seed: int) -> str:
    """Non-equi (interval-overlap) self-join family: deterministic synthetic
    intervals derived from orders keys; randomized widths/strides/modulus.
    Exercises Spark's theta-join + the B7 range-join SQL shape vs DuckDB."""
    rng = random.Random(seed + 30_000)
    m1, m2 = rng.choice([3, 7, 11, 13]), rng.choice([5, 17, 19, 23])
    w1, w2 = rng.randint(1, 60), rng.randint(1, 90)
    mod = rng.choice([1_000, 5_000, 10_000])
    return (
        f"WITH a AS (SELECT o_orderkey AS id, o_orderstatus AS k,"
        f"  (o_orderkey*{m1})%{mod} AS s, (o_orderkey*{m1})%{mod}+{w1} AS e"
        f"  FROM orders WHERE o_orderkey < 800),"
        f" b AS (SELECT o_orderkey AS id, o_orderstatus AS k,"
        f"  (o_orderkey*{m2})%{mod} AS s, (o_orderkey*{m2})%{mod}+{w2} AS e"
        f"  FROM orders WHERE o_orderkey < 800)"
        f" SELECT a.k, COUNT(*) AS n, MIN(a.id*1000000+b.id) AS min_pair,"
        f"        MAX(a.id*1000000+b.id) AS max_pair"
        f" FROM a JOIN b ON a.k = b.k AND a.s < b.e AND a.e > b.s AND a.id < b.id"
        f" GROUP BY a.k ORDER BY a.k"
    )


@pytest.mark.parametrize("seed", SEEDS[:10])
def test_interval_template(seed, spark, oracle_con):
    _run_both(spark, oracle_con, _interval_query(seed))


def _setop_query(seed: int) -> str:
    """Set-operation family: UNION/INTERSECT/EXCEPT (ALL and DISTINCT)
    over randomized projections — exercises Catalyst's set-op planning and
    duplicate semantics vs DuckDB."""
    rng = random.Random(seed + 40_000)
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    key = rng.choice(["l_suppkey", "l_partkey % 50", "l_linenumber"])
    cut = rng.randint(1000, 5000)
    return (
        f"SELECT COUNT(*) AS n, COALESCE(MIN(k), -1) AS min_k,"
        f"       COALESCE(MAX(k), -1) AS max_k FROM ("
        f"  SELECT {key} AS k FROM lineitem WHERE l_orderkey < {cut}"
        f"  {op}"
        f"  SELECT {key} AS k FROM lineitem WHERE l_orderkey >= {cut // 2} AND l_orderkey < {cut * 2}"
        f")"
    )


@pytest.mark.parametrize("seed", SEEDS[:10])
def test_setop_template(seed, spark, oracle_con):
    _run_both(spark, oracle_con, _setop_query(seed))


def _null_case_query(seed: int) -> str:
    """NULL-semantics family: outer-join nulls through COALESCE/NULLIF/
    CASE buckets and null-aware counts — the B26 surface under random
    predicates."""
    rng = random.Random(seed + 50_000)
    cut = rng.randint(100, 1200)
    band = rng.randint(50, 300) * 1000
    return (
        f"SELECT CASE WHEN o.o_totalprice IS NULL THEN 'none'"
        f"            WHEN o.o_totalprice < {band} THEN 'low' ELSE 'high' END AS band,"
        f"       COUNT(*) AS n,"
        f"       COUNT(o.o_orderkey) AS n_orders,"
        f"       SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_null,"
        f"       COALESCE(MIN(NULLIF(o.o_orderstatus, 'O')), '-') AS min_status"
        f" FROM customer c LEFT JOIN orders o"
        f"   ON c.c_custkey = o.o_custkey AND o.o_orderkey < {cut}"
        f" GROUP BY band ORDER BY band"
    )


@pytest.mark.parametrize("seed", SEEDS[:10])
def test_null_case_template(seed, spark, oracle_con):
    _run_both(spark, oracle_con, _null_case_query(seed))


def _temporal_query(seed: int) -> str:
    """Temporal family: date_trunc/EXTRACT buckets with random predicates —
    the B22 surface under the UTC-pinned session both engines share."""
    rng = random.Random(seed + 60_000)
    unit = rng.choice(["month", "week", "day"])
    part = rng.choice(["year", "month", "day"])
    return (
        f"SELECT CAST(date_trunc('{unit}', o_orderdate) AS DATE) AS bucket,"
        f"       COUNT(*) AS n,"
        f"       CAST(MIN(EXTRACT({part} FROM o_orderdate)) AS BIGINT) AS min_part,"
        f"       MIN(o_orderkey) AS min_k"
        f" FROM orders WHERE o_orderkey % {rng.randint(2, 9)} = 0"
        f"   AND o_totalprice < {rng.randint(100, 500) * 1000}"
        f" GROUP BY bucket ORDER BY bucket"
    )


@pytest.mark.parametrize("seed", SEEDS[:10])
def test_temporal_template(seed, spark, oracle_con):
    _run_both(spark, oracle_con, _temporal_query(seed))


def _star_having_query(seed: int) -> str:
    """3-table star + conditional counts + HAVING (the TPC-H tier's
    randomized cousin; all aggregates integer-exact)."""
    rng = random.Random(seed + 40_000)
    thr = rng.randint(2, 30)
    seg = rng.choice(["'BUILDING'", "'AUTOMOBILE'", "'MACHINERY'", "'FURNITURE'", "'HOUSEHOLD'"])
    prio = rng.choice(["'1-URGENT'", "'2-HIGH'", "'5-LOW'"])
    return (
        "SELECT c_mktsegment, COUNT(*) AS n,"
        f" COUNT(CASE WHEN o_orderpriority = {prio} THEN 1 END) AS n_prio,"
        " MIN(l_orderkey) AS min_k, MAX(l_suppkey) AS max_s"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        f" WHERE {_where(rng)} OR c_mktsegment = {seg}"
        f" GROUP BY c_mktsegment HAVING COUNT(*) > {thr}"
        " ORDER BY c_mktsegment"
    )


@pytest.mark.parametrize("seed", SEEDS[:10])
def test_star_having_template(seed, spark, oracle_con):
    _run_both(spark, oracle_con, _star_having_query(seed))


def _distribution_window_query(seed: int) -> str:
    """PERCENT_RANK / CUME_DIST / NTILE with unique tie-breaks — the
    win_percentiles family randomized. Rank ratios are integer divisions,
    identical in both engines; ROUND(.,6) is belt-and-braces."""
    rng = random.Random(seed + 50_000)
    part = rng.choice(["o_orderstatus", "o_orderpriority"])
    metric = rng.choice(["o_totalprice", "o_custkey"])
    n = rng.randint(2, 10)
    return (
        f"SELECT o_orderkey,"
        f" ROUND(PERCENT_RANK() OVER (PARTITION BY {part}"
        f"   ORDER BY {metric}, o_orderkey), 6) AS pr,"
        f" ROUND(CUME_DIST() OVER (PARTITION BY {part}"
        f"   ORDER BY {metric}, o_orderkey), 6) AS cd,"
        f" NTILE({n}) OVER (PARTITION BY {part}"
        f"   ORDER BY {metric}, o_orderkey) AS tile"
        f" FROM orders WHERE o_orderkey % {rng.randint(2, 5)} = 0"
        f" ORDER BY o_orderkey"
    )


@pytest.mark.parametrize("seed", SEEDS[:10])
def test_distribution_window_template(seed, spark, oracle_con):
    _run_both(spark, oracle_con, _distribution_window_query(seed))


def _unpivot_query(seed: int) -> str:
    """Standard-SQL UNPIVOT parses in BOTH engines (Spark ≥3.4, DuckDB)."""
    rng = random.Random(seed + 60_000)
    mod = rng.randint(3, 9)
    return (
        "SELECT measure, COUNT(*) AS n, MIN(l_orderkey) AS min_k,"
        " SUM(CAST(val AS BIGINT)) AS sum_v FROM ("
        "  SELECT l_orderkey, CAST(l_quantity AS BIGINT) AS m_qty,"
        "         l_linenumber AS m_line, l_suppkey AS m_supp"
        f"  FROM lineitem WHERE l_orderkey % {mod} = 0)"
        " UNPIVOT (val FOR measure IN (m_qty, m_line, m_supp))"
        " GROUP BY measure ORDER BY measure"
    )


@pytest.mark.parametrize("seed", SEEDS[:8])
def test_unpivot_template(seed, spark, oracle_con):
    _run_both(spark, oracle_con, _unpivot_query(seed))


def _knuth_hash_query(seed: int) -> str:
    """Regression guard for the overflow-safe split-modular Knuth hash
    (queries/training.py): evaluate the formula over synthetic ids far
    beyond the naive-multiply overflow point (id·K > 2^63) and aggregate
    shard counts. Integer division spelled as exact double arithmetic
    ((e - e%65536)/65536 with e < 2^32) so ONE SQL string parses in both
    engines."""
    rng = random.Random(seed + 70_000)
    n_shards = rng.choice([4, 8, 16, 32])
    stride = rng.choice([10**9, 10**12, 10**14])  # ids up to ~10^17
    K, MOD = 2654435761, 4294967296
    e = f"((o_orderkey * {stride}) % {MOD})"
    hi = f"CAST(({e} - {e} % 65536) / 65536 AS BIGINT)"
    h = f"((({hi} * {K} % {MOD}) * 65536 + ({e} % 65536) * {K}) % {MOD})"
    return (
        f"SELECT {h} % {n_shards} AS shard, COUNT(*) AS n,"
        f" MIN(o_orderkey) AS min_id"
        f" FROM orders WHERE o_orderkey % {rng.randint(2, 4)} = 0"
        f" GROUP BY 1 ORDER BY 1"
    )


@pytest.mark.parametrize("seed", SEEDS[:8])
def test_knuth_hash_template(seed, spark, oracle_con):
    _run_both(spark, oracle_con, _knuth_hash_query(seed))
