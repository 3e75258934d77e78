"""ANN/IVF scale study (VERDICT r6 item 5): does the IVF tier's cost
amortize sf1→sf4, and does recall hold as lists grow?

For each scale: run the UNBOUNDED knn_join (k=3, two-probe) over the
full embeddings table with n_lists ≈ √n, measure wall, compute recall@3
against a brute-force exact twin on a 100-query sample, and re-derive
the Σ|list|² pair-work bound from the actual assignment. Also times
semantic_dedup at both scales.

Usage: python tools/ab_ann_scale.py [--passes 2]
Results land in stdout; the curated table goes to BASELINE.md.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def exact_topk_sample(spark, emb, query_ids, k=3):
    """Brute-force cosine top-k for the sampled query ids against the
    FULL corpus: the broadcast side is the 100-query slice, so the plan
    is one map-side pass over the corpus + a window on 100 partitions."""
    from vcf2db_spark.operators.similarity import cosine

    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("_ea")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_eb")
    )
    pairs = c.join(F.broadcast(q), F.col("id") != F.col("neighbor_id"))
    scored = pairs.select(
        "id", "neighbor_id",
        F.round(cosine(F.col("_ea"), F.col("_eb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--scales", nargs="*", default=["sf1", "sf4"])
    args = ap.parse_args()

    from vcf2db_spark.operators.similarity import (
        ivf_assign_multi, ivfadc_knn_join, knn_join, semantic_dedup,
    )
    from vcf2db_spark.session import get_spark

    from vcf2db_spark.io import table_wide

    spark = get_spark("ann-scale")
    for sf in args.scales:
        # table_wide: the fixtures are single-row-group parquet, so a raw
        # scan runs 1 task and serializes the whole pipeline — the same
        # footer-probe rescue every embedding DQ uses
        emb = table_wide(spark, f"/root/repo/.bench_data/{sf}", "embeddings")
        n = emb.count()
        n_lists = max(8, int(round(math.sqrt(n))))
        step = max(1, n // 100)
        query_ids = list(range(0, n, step))[:100]

        # pair-work bound from the real two-probe assignment
        assigned, _ = ivf_assign_multi(emb, n_lists=n_lists, probes=2)
        sizes = assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("c"))
        row = sizes.agg(
            F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
            F.max("c").alias("max_list"),
            F.count(F.lit(1)).alias("n_nonempty"),
        ).collect()[0]
        pair_ratio = row["sum_sq"] / (n * n)

        walls = []
        for _ in range(args.passes):
            t0 = time.time()
            out = knn_join(emb, k=3, n_lists=n_lists, probes=2)
            n_out = out.count()
            walls.append(time.time() - t0)
        wall = min(walls)

        exact = exact_topk_sample(spark, emb, query_ids, k=3)
        approx = knn_join(emb, k=3, n_lists=n_lists, probes=2).filter(
            F.col("id").isin(query_ids)
        )
        n_exact = exact.count()
        n_hit = exact.join(approx, ["id", "neighbor_id"], "left_semi").count()
        recall = n_hit / n_exact

        # IVFADC (r8): same blocking, PQ-coded probe side + ADC scoring,
        # top-9 exact rerank — the billion-scale probe layout; compare
        # wall and recall to the float-vector knn_join at equal probes
        adc_walls = []
        for _ in range(args.passes):
            t0 = time.time()
            out_adc = ivfadc_knn_join(
                emb, k=3, n_lists=n_lists, probes=2, m=8, ksub=128,
                pq_sample=2048, rerank=9,
            )
            n_adc = out_adc.count()
            adc_walls.append(time.time() - t0)
        adc_wall = min(adc_walls)
        approx_adc = ivfadc_knn_join(
            emb, k=3, n_lists=n_lists, probes=2, m=8, ksub=128,
            pq_sample=2048, rerank=9,
        ).filter(F.col("id").isin(query_ids))
        adc_hit = exact_topk_sample(spark, emb, query_ids, k=3).join(
            approx_adc, ["id", "neighbor_id"], "left_semi"
        ).count()

        sd_walls = []
        for _ in range(args.passes):
            t0 = time.time()
            kept = semantic_dedup(emb, threshold=0.99, n_lists=n_lists, probes=2)
            n_kept = kept.count()
            sd_walls.append(time.time() - t0)

        print(
            f"{sf}: n={n} n_lists={n_lists} | knn_join wall={wall:.2f}s "
            f"(passes={sorted(round(w,2) for w in walls)}) rows={n_out} | "
            f"recall@3={recall:.4f} ({n_hit}/{n_exact}) | "
            f"sum|list|^2/n^2={pair_ratio:.5f} max_list={row['max_list']} "
            f"lists={row['n_nonempty']} | ivfadc wall={adc_wall:.2f}s "
            f"(passes={sorted(round(w,2) for w in adc_walls)}) rows={n_adc} "
            f"recall@3={adc_hit}/{n_exact} | semdedup wall={min(sd_walls):.2f}s "
            f"kept={n_kept}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
