"""Bloom data-skipping A/B (r8): files read + wall for point lookups on
an UNCLUSTERED key — stats-only planning vs stats+bloom — at a file
count where skipping matters.

The table is lineitem's (l_orderkey, l_partkey, l_extendedprice)
hash-distributed on l_partkey into N files, so every file's l_orderkey
[min, max] spans the keyspace: min/max stats prune NOTHING for an
orderkey equality, isolating the bloom tier's contribution. Probes are
P present keys (sampled deterministically) and P absent keys
(orderkey + 1 — lineitem orderkeys are ≡ 0,1,2,3 mod 32 so +4..+28
offsets are absent; we use max+1-based keys to be safe).

Usage: python tools/ab_bloom.py [--sf-dir /root/testdata/sf0.1]
                                [--files 64] [--probes 40]
Results land in stdout; the curated table goes to BASELINE.md.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--probes", type=int, default=40)
    args = ap.parse_args()

    from vcf2db_spark.session import get_spark
    from vcf2db_spark.sinks import lakehouse as lh

    spark = get_spark("ab-bloom")
    li = (
        spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet"))
        .select("l_orderkey", "l_partkey", "l_extendedprice")
    )
    root = f"/tmp/ab_bloom_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)

    t0 = time.time()
    lh.create(
        spark,
        root,
        li.repartition(args.files, "l_partkey"),
        stat_cols=("l_orderkey",),
        bloom_cols=("l_orderkey",),
    )
    t_build = time.time() - t0
    man = lh.snapshot(root)
    n_files = len(man["files"])
    n_rows = sum(e["rows"] for e in man["files"])
    side_bytes = sum(
        os.path.getsize(lh._bloom_sidecar_path(root, e["path"]))
        for e in man["files"]
    )
    # baseline: the same write WITHOUT blooms (isolates the build cost)
    root2 = root + "_nb"
    shutil.rmtree(root2, ignore_errors=True)
    t0 = time.time()
    lh.create(
        spark, root2, li.repartition(args.files, "l_partkey"),
        stat_cols=("l_orderkey",),
    )
    t_build_nb = time.time() - t0

    # deterministic probe keys: spread percent ranks of distinct
    # orderkeys; absent probes are IN-RANGE gaps (TPC-H orderkeys use 8
    # of every 32 consecutive values), so stats cannot reject them either
    keys = [
        r["l_orderkey"]
        for r in (
            li.select("l_orderkey").distinct()
            .orderBy("l_orderkey")
            .collect()
        )
    ]
    keyset = set(keys)
    step = max(1, len(keys) // args.probes)
    present = keys[::step][: args.probes]
    absent = [
        k + 1
        for k in keys[5::31]
        if k + 1 not in keyset and k < keys[-1]
    ][: args.probes]
    assert len(absent) == args.probes, "not enough in-range gaps"

    def sweep(probe_keys, planner):
        kept_total = 0
        t0 = time.time()
        total_rows = 0
        for k in probe_keys:
            kept = planner(k)
            kept_total += len(kept)
            if kept:
                total_rows += (
                    spark.read.parquet(
                        *[os.path.join(root, e["path"]) for e in kept]
                    )
                    .filter(F.col("l_orderkey") == k)
                    .count()
                )
        return kept_total, total_rows, time.time() - t0

    def stats_only(k):
        sel, _ = lh.plan_files(root, {"l_orderkey": (k, k)})
        return sel

    def with_bloom(k):
        sel, _, _ = lh.plan_files_bloom(root, {"l_orderkey": k})
        return sel

    for label, probe_set in (("present", present), ("absent", absent)):
        ks, rs, ts = sweep(probe_set, stats_only)
        kb, rb, tb = sweep(probe_set, with_bloom)
        assert rs == rb, f"{label}: bloom changed results ({rs} vs {rb})"
        print(
            f"{label:8s} probes={len(probe_set)}  "
            f"stats-only: files/probe={ks/len(probe_set):6.2f} wall={ts:6.2f}s  "
            f"bloom: files/probe={kb/len(probe_set):6.2f} wall={tb:6.2f}s  "
            f"rows={rb}"
        )
    print(
        f"table: files={n_files} rows={n_rows} "
        f"sidecar_bytes={side_bytes} ({side_bytes/n_files/1024:.1f} KiB/file) "
        f"build_with_bloom={t_build:.2f}s build_without={t_build_nb:.2f}s"
    )

    # merge-scope A/B: a sparse 5-key merge into the hash-distributed
    # table — range containment marks all files hit; the bloom probe
    # should narrow the rewrite to the files truly containing a key
    upd_keys = present[:5]
    upd = (
        li.filter(F.col("l_orderkey").isin(upd_keys))
        .groupBy("l_orderkey")
        .agg(F.min("l_partkey").alias("l_partkey"),
             F.min("l_extendedprice").alias("l_extendedprice"))
    )
    for label, r in (("bloom", root), ("stats-only", root2)):
        before = {e["path"] for e in lh.snapshot(r)["files"]}
        t0 = time.time()
        lh.merge(spark, r, upd, key="l_orderkey")
        t_merge = time.time() - t0
        after = {e["path"] for e in lh.snapshot(r)["files"]}
        print(
            f"merge[{label:10s}] rewrote {len(before - after)}/{len(before)} "
            f"files in {t_merge:.2f}s"
        )
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(root2, ignore_errors=True)


if __name__ == "__main__":
    main()
