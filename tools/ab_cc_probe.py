"""A/B the duplicate_clusters probe/edge double-evaluation fix (r10).

Times ONLY the CC leg of the dedup board: minhash-LSH candidates →
duplicate_clusters → distinct cluster count, at a scale where the
iterative (large) path is taken (sf4: 4.3M candidate pairs > the 500k
union-find threshold). Before the fix the size probe and the edge build
each evaluated the full LSH candidate DAG; after, the restricted pair
set is localCheckpoint-ed once and both read the materialized blocks.

Usage: python tools/ab_cc_probe.py [--sf-dir /root/repo/.bench_data/sf4]
                                   [--passes 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.bench_data/sf4")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    from vcf2db_spark.io import table_wide
    from vcf2db_spark.operators.dedup import (
        duplicate_clusters, minhash_lsh_candidates,
    )
    from vcf2db_spark.session import get_spark

    spark = get_spark("ab_cc_probe")
    d = table_wide(spark, args.sf_dir, "documents")
    n_docs = d.count()

    walls, n_cl, n_cand = [], 0, 0
    for i in range(args.passes):
        spark.sparkContext.setJobDescription(f"cc-leg pass {i}")
        t0 = time.time()
        pairs = minhash_lsh_candidates(d).filter(F.col("est_jaccard") >= 0.5)
        cl = duplicate_clusters(pairs, d.select("doc_id"))
        n_cl = cl.select("cluster_id").distinct().count()
        walls.append(time.time() - t0)
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    print(
        f"CC leg @ {args.sf_dir}: n_docs={n_docs} n_clusters={n_cl} "
        f"walls={[round(w, 2) for w in walls]} min={min(walls):.2f}s",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
