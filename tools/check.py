"""Local differential harness: runs every declared query on Spark and its
DuckDB oracle, compares row count, column names, and the order-insensitive
multiset of values — a strict local stand-in for the driver's value-hash.

Usage: python tools/check.py [--sf-dir /root/testdata/sf0.01] [--only q1 q2]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcf2db_spark.io import TABLES  # noqa: E402


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # NOTE: -0.0 is deliberately NOT normalized here — the driver's
        # value-hash distinguishes it from +0.0 (round-4 embed_covariance
        # fail), so the local harness must be at least as strict. Queries
        # normalize with the registry's z6()/OZ6() convention instead.
        return repr(v)
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.floating,)):
        return norm_cell(float(v))
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def to_multiset(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(norm_cell(v) for v in t))
    return sorted(rows)


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> tuple[bool, str]:
    sc, oc = sorted(sdf.columns), sorted(odf.columns)
    if sc != oc:
        return False, f"columns differ: spark={sc} oracle={oc}"
    if len(sdf) != len(odf):
        return False, f"row count differs: spark={len(sdf)} oracle={len(odf)}"
    ms, mo = to_multiset(sdf), to_multiset(odf)
    if ms != mo:
        diff = [(a, b) for a, b in zip(ms, mo) if a != b][:3]
        return False, f"values differ; first diffs (spark,oracle): {diff}"
    return True, "ok"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    import __spark_entry__ as E
    from vcf2db_spark.session import get_spark

    # the differential COLLECTS full results for comparison — at sf4 the
    # per-row queries (math_funcs: 24M lineitem rows) exceed the 1g
    # default; this is a harness knob, not a query property
    os.environ.setdefault("SPARK_GRAFT_MAX_RESULT", "8g")
    spark = get_spark("vcf2db-check")
    qs, oracles = E.queries(), E.oracle_sql()

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        path = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    names = [n for n in qs if not args.only or n in args.only]
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        ok, msg = compare(sdf, odf)
        if ok:
            n_pass += 1
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: {msg}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only of {len(names)}")
    if failures:
        print("failing:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
