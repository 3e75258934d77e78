"""Capture `.explain("formatted")` for named declared queries into files.

Optimization-round deliverable (guide §1: record the plan shape —
Exchange count, join strategy, PushedFilters/ReadSchema, codegen spans,
Python-eval nodes — before and after every plan change).

Usage:
    python tools/plan_capture.py --out plans/r10 --suffix _after \
        [--sf-dir /root/testdata/sf0.01] name [name ...]

Run it from the repo checkout whose plans you want (a worktree of the
pre-change commit for the `_before` files).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="_after")
    args = ap.parse_args()

    from vcf2db_spark.queries import QUERIES
    from vcf2db_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    for name in args.names:
        fn = QUERIES.get(name)
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        if fn is None:
            print(f"SKIP {name}: not a declared query", file=sys.stderr)
            continue
        try:
            import io
            from contextlib import redirect_stdout

            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # capture the failure instead of dying
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}\n"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
