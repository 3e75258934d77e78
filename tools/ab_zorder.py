"""OPTIMIZE ZORDER A/B at sf4 (VERDICT r6 item 6): multi-column box
predicates against manifest stats — files hit + wall, ZORDER layout vs
single-column range layout, with the box aggregate asserted identical.

The claim under test: Morton clustering gives BOTH dimensions pruning
power, where a range layout prunes only its sort leader.

Dimension choice: the synthetic fixture's key columns are pairwise
correlated (corr(l_orderkey, l_partkey) = 0.999 — the generator derives
them from one counter), so a range layout accidentally clusters EVERY
key column and no fixture pair can demonstrate the claim. The second
dimension is therefore the repo's split-modular Knuth hash of the
orderkey — deterministic, uniform, independent of the first by
construction, exactly the shape of a real table's (time, entity-hash)
pair. Usage: python tools/ab_zorder.py [--sf sf4] [--files 64]
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

    from vcf2db_spark.queries.training import knuth_hash_sql

    spark = get_spark("zorder-ab")
    li = (
        spark.read.parquet(
            f"/root/repo/.bench_data/{args.sf}/lineitem.parquet"
        )
        .select("l_orderkey", "l_quantity")
        .withColumn("ent_hash", F.expr(knuth_hash_sql("l_orderkey", "DIV")))
    )
    bounds = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("ent_hash"), F.max("ent_hash"),
    ).collect()[0]
    p_lo, p_hi, s_lo, s_hi = bounds
    # middle ~sqrt(1/files) box per dim: selects ~1/files of the grid,
    # i.e. roughly one file's worth under perfect 2-D clustering
    frac = (1.0 / args.files) ** 0.5

    def mid(lo, hi, f):
        return (int(lo + (hi - lo) * (0.5 - f / 2)), int(lo + (hi - lo) * (0.5 + f / 2)))

    boxes = {
        "2-dim box": {
            "l_orderkey": mid(p_lo, p_hi, frac),
            "ent_hash": mid(s_lo, s_hi, frac),
        },
        "leader only": {"l_orderkey": mid(p_lo, p_hi, frac)},
        "second-dim only": {"ent_hash": mid(s_lo, s_hi, frac)},
    }
    print(f"{args.sf}: rows={li.count()} boxes={boxes}", flush=True)

    results = {}
    for layout in ("range", "zorder"):
        root = f"/tmp/zab_{layout}_{uuid.uuid4().hex[:8]}"
        lh.create(
            spark, root,
            li.repartitionByRange(args.files, "l_orderkey")
              .sortWithinPartitions("l_orderkey"),
            stat_cols=("l_orderkey", "ent_hash"),
        )
        if layout == "zorder":
            total = sum(
                os.path.getsize(os.path.join(root, f["path"]))
                for f in lh.snapshot(root)["files"]
            )
            lh.compact(
                spark, root,
                target_bytes=max(1, total // args.files),
                zorder_cols=("l_orderkey", "ent_hash"),
            )
        for label, box in boxes.items():
            sel, skipped = lh.plan_files(root, box)
            pred = None
            for col, (lo, hi) in box.items():
                term = F.col(col).between(lo, hi)
                pred = term if pred is None else (pred & term)
            walls = []
            for _ in range(3):
                t0 = time.time()
                agg = (
                    lh.read_pruned(spark, root, box)
                    .filter(pred)
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum(
                            F.round(F.col("l_quantity") * 1e6).cast("long")
                        ).alias("q6"),
                    )
                    .collect()[0]
                )
                walls.append(time.time() - t0)
            results[(layout, label)] = (agg["n"], agg["q6"])
            print(
                f"  {layout:6s} | {label:15s}: files hit={len(sel)} "
                f"skipped={skipped} (of {len(sel)+skipped}) | "
                f"wall={min(walls):.2f}s "
                f"passes={sorted(round(w,2) for w in walls)} | "
                f"n={agg['n']} q6={agg['q6']}",
                flush=True,
            )
        shutil.rmtree(root, ignore_errors=True)
    for label in boxes:
        assert results[("range", label)] == results[("zorder", label)], label
    print("aggregates identical across layouts: OK", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
