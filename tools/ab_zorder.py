"""OPTIMIZE ZORDER A/B at sf4 (VERDICT r6 item 6): multi-column box
predicates against manifest stats — files hit + wall, ZORDER layout vs
single-column range layout, with the box aggregate asserted identical.

The claim under test: Morton clustering gives BOTH dimensions pruning
power, where a range layout prunes only its sort leader. Usage:
python tools/ab_zorder.py [--sf sf4] [--files 64]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf4")
    ap.add_argument("--files", type=int, default=64)
    args = ap.parse_args()

    from vcf2db_spark.session import get_spark
    from vcf2db_spark.sinks import lakehouse as lh

    spark = get_spark("zorder-ab")
    li = spark.read.parquet(
        f"/root/repo/.bench_data/{args.sf}/lineitem.parquet"
    ).select("l_partkey", "l_suppkey", "l_quantity")
    bounds = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    p_lo, p_hi, s_lo, s_hi = bounds
    # middle ~sqrt(1/files) box per dim: selects ~1/files of the grid,
    # i.e. roughly one file's worth under perfect 2-D clustering
    frac = (1.0 / args.files) ** 0.5
    box = {
        "l_partkey": (
            int(p_lo + (p_hi - p_lo) * (0.5 - frac / 2)),
            int(p_lo + (p_hi - p_lo) * (0.5 + frac / 2)),
        ),
        "l_suppkey": (
            int(s_lo + (s_hi - s_lo) * (0.5 - frac / 2)),
            int(s_lo + (s_hi - s_lo) * (0.5 + frac / 2)),
        ),
    }
    print(f"{args.sf}: rows={li.count()} box={box}", flush=True)

    results = {}
    for layout in ("range", "zorder"):
        root = f"/tmp/zab_{layout}_{uuid.uuid4().hex[:8]}"
        lh.create(
            spark, root,
            li.repartitionByRange(args.files, "l_partkey")
              .sortWithinPartitions("l_partkey"),
            stat_cols=("l_partkey", "l_suppkey"),
        )
        if layout == "zorder":
            total = sum(
                os.path.getsize(os.path.join(root, f["path"]))
                for f in lh.snapshot(root)["files"]
            )
            lh.compact(
                spark, root,
                target_bytes=max(1, total // args.files),
                zorder_cols=("l_partkey", "l_suppkey"),
            )
        sel, skipped = lh.plan_files(root, box)
        walls = []
        for _ in range(3):
            t0 = time.time()
            agg = (
                lh.read_pruned(spark, root, box)
                .filter(
                    (F.col("l_partkey").between(*box["l_partkey"]))
                    & (F.col("l_suppkey").between(*box["l_suppkey"]))
                )
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.round(F.col("l_quantity") * 1e6).cast("long")).alias("q6"),
                )
                .collect()[0]
            )
            walls.append(time.time() - t0)
        results[layout] = (agg["n"], agg["q6"])
        print(
            f"  {layout}: files hit={len(sel)} skipped={skipped} "
            f"(of {len(sel)+skipped}) | box scan wall={min(walls):.2f}s "
            f"passes={sorted(round(w,2) for w in walls)} | "
            f"n={agg['n']} q6={agg['q6']}",
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)
    assert results["range"] == results["zorder"], results
    print("aggregates identical across layouts: OK", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
