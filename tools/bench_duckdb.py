"""DuckDB side of the 2x perf gate: run every oracle SQL at a given sf_dir
and print one JSON line {"value": total_sec, "queries": {...}} — the
apples-to-apples denominator for bench.py's numerator.

Usage: python tools/bench_duckdb.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcf2db_spark.io import TABLES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from vcf2db_spark.queries import ORACLES

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    # warm-up (OS page cache for the parquet files)
    con.execute(ORACLES["agg_group"]).arrow()

    # Arrow materialization (engine-native columnar), matching bench.py's
    # in-process twin — fetchall() would tax DuckDB with per-cell Python
    # object conversion the Spark side doesn't pay under the noop sink.
    timings: dict[str, float] = {}
    for name, sql in sorted(ORACLES.items()):
        t0 = time.perf_counter()
        con.execute(sql).arrow()
        timings[name] = round(time.perf_counter() - t0, 4)

    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_wall_time_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf_dir": args.sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
