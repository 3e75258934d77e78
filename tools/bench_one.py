"""Per-query micro-bench for A/B plan work: times named declared queries
(median-of-N, full noop-sink materialization — same methodology as
bench.py) plus their DuckDB oracle twin on the same parquet dir.

Usage:
    python tools/bench_one.py --sf-dir .bench_data/sf1 --n 5 agg_distinct json_extract
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()

    from vcf2db_spark.io import TABLES
    from vcf2db_spark.queries import ORACLES, QUERIES
    from vcf2db_spark.session import get_spark

    spark = get_spark("bench-one")
    spark.sparkContext.setLogLevel("ERROR")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    run(QUERIES["agg_group"](spark, args.sf_dir))  # warm-up

    import duckdb

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    import os

    for t in TABLES:
        # same tolerance as tools/check.py: a partial sf dir skips the
        # missing views instead of erroring at oracle time
        if os.path.exists(f"{args.sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{args.sf_dir}/{t}.parquet')"
            )

    out = {}
    for name in args.names:
        times = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            run(QUERIES[name](spark, args.sf_dir))
            times.append(time.perf_counter() - t0)
        d_times = []
        if name in ORACLES:
            for _ in range(args.n):
                t0 = time.perf_counter()
                con.execute(ORACLES[name]).arrow()
                d_times.append(time.perf_counter() - t0)
        s = round(statistics.median(times), 4)
        d = round(statistics.median(d_times), 4) if d_times else None
        out[name] = {
            "spark_s": s,
            "spark_all": [round(x, 3) for x in times],
            "duckdb_s": d,
            "ratio": round(s / d, 2) if d else None,
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
