"""Declared-query registry (SURVEY.md §2, rows marked DQ:*).

Every operator claimed as implemented registers here with a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, a DuckDB oracle
SQL string over the pre-registered fixture views. ``__spark_entry__``
exposes the registry to the driver.

Determinism conventions (SURVEY §2 harness conventions):
- identical aliases both sides;
- float aggregates go through exact decimal sums (``dsum``/``OSUM``) so
  summation order cannot perturb the value-hash, then ROUND(…, 6);
- ties in windows/top-k broken by a unique key;
- temporal outputs projected to strings (identical formatting both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def dq(name: str, oracle: str | None = None):
    """Register a declared query, optionally with its DuckDB oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


# ---- Spark-side numeric normalization -------------------------------------
# Double summation is order-dependent; Spark and DuckDB will disagree in the
# last ulps and ROUND() cannot always mask that. Instead: round each row's
# double to a DECIMAL(38,10) (deterministic per row), sum exactly, cast back.

def dsum(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(38,10)")).cast("double")


def davg(col: Column | str) -> Column:
    """Exact-sum / non-null-count, as double (round afterwards)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(38,10)")).cast("double") / F.count(c)


def r6(col: Column) -> Column:
    return F.round(col, 6)


def dsum6(col: Column | str) -> Column:
    """Exact decimal sum rounded to 6 decimals IN DECIMAL, then cast to
    double. ROUND(double, 6) is unsafe at magnitudes ≥1e9: DuckDB rounds
    numerically (x*1e6 → ulp noise) while Spark rounds via BigDecimal —
    decimal-space rounding is exact and identical on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(38,10)")).cast("decimal(38,6)").cast("double")


# ---- Oracle-side (DuckDB SQL) twins ----------------------------------------

def OSUM(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,10))) AS DOUBLE)"


def OSUM6(expr: str) -> str:
    """Oracle twin of ``dsum6``. DuckDB's decimal→decimal CAST truncates,
    but ROUND on a decimal rounds half-away-from-zero — matching Spark's
    decimal cast (HALF_UP) — so the rounding happens via ROUND here."""
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,10))), 6) AS DOUBLE)"


def OAVG(expr: str) -> str:
    return f"({OSUM(expr)} / COUNT({expr}))"
