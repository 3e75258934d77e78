"""Benchmark: run every declared query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Timing = full execution to count() (materializes the result, excludes
driver-side pandas conversion). Session warm-up (JVM start + first parquet
read) is excluded by a warm-up pass of the flagship query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from vcf2db_spark.queries import ORACLES, QUERIES
    from vcf2db_spark.session import get_spark

    spark = get_spark("vcf2db-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer caches
    QUERIES["agg_group"](spark, sf_dir).count()

    # per-query fixed cost floor: a trivial 1-row job (scheduling + plan +
    # collect round-trip, no real compute). Multiplied by the query count
    # this bounds how much of the total is Spark constants vs actual work —
    # the part that amortizes to zero at the 100 TB design point.
    t0 = time.perf_counter()
    spark.range(1).count()
    floor = round(time.perf_counter() - t0, 4)

    # steady-state timing: two passes, keep the per-query minimum. Local
    # Spark wall-times vary ±30% run-to-run (JIT, GC, thread scheduling);
    # min-of-2 reports the reproducible floor the same way the DuckDB
    # denominator's single warm pass does (its variance is negligible).
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name, fn in sorted(QUERIES.items()):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 4)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    oracle_total = round(sum(v for k, v in timings.items() if k in ORACLES), 4)
    out = {
        "metric": "declared_query_wall_time_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # breakdown for the 2x-vs-DuckDB gate (tools/bench_duckdb.py is the
        # denominator — it can only run the oracle-backed set):
        "oracle_backed_total": oracle_total,
        "rows_only_total": round(sum(timings.values()) - oracle_total, 4),
        "job_floor_sec": floor,
        "n_queries": len(timings),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
