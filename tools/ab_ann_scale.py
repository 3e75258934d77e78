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


def _drain_gc(spark) -> None:
    """Kick both GCs so the ContextCleaner can drop shuffle files and
    checkpoint blocks from finished phases — a measurement-harness need
    (one session runs every scale back-to-back against a bounded local
    dir), not an engine one."""
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def run_dedup_tier(spark, sf: str, sf_dir: str, passes: int) -> None:
    """Unbounded dedup/text tier board (VERDICT r9 item 1): minhash-LSH
    candidates over the FULL documents table with the Sigma|bucket|^2
    band bound re-derived from the actual banding, connected components
    over those candidate pairs (the realistic composition — exact
    jaccard_pairs is quadratic in shingle buckets and is NOT the scale
    path), the unbounded contam_ngram registered query, and bpe
    train+encode over the full corpus."""
    from vcf2db_spark.io import table_wide
    from vcf2db_spark.operators.dedup import (
        duplicate_clusters, minhash_lsh_candidates,
    )

    d = table_wide(spark, sf_dir, "documents")
    n_docs = d.count()

    walls, n_cand = [], 0
    for _ in range(passes):
        t0 = time.time()
        cand = minhash_lsh_candidates(d).filter(F.col("est_jaccard") >= 0.5)
        n_cand = cand.count()
        walls.append(time.time() - t0)
    lsh_wall = min(walls)
    _drain_gc(spark)

    # bound variable (VERDICT r9 item 1): candidate pairs the band join
    # generates = Sigma over (band, bucket) of C(|bucket|, 2) — re-derive
    # it from the REAL banding (same signature + band-hash expressions
    # the operator uses: 64 hashes, 16 bands, r=4)
    from vcf2db_spark.operators.dedup import minhash_signatures

    n_hashes, bands = 64, 16
    r = n_hashes // bands
    sigs = minhash_signatures(d)
    band_idx = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.hash(F.array_join(
                F.transform(
                    F.slice(F.col("signature"), b * r + 1, r),
                    lambda x: x.cast("string"),
                ),
                ",",
            )),
        )
    )
    bound_row = (
        sigs.select("id", band_idx.alias("band", "band_hash"))
        .groupBy("band", "band_hash")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
            F.max("c").alias("max_bucket"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .collect()[0]
    )

    cl_walls, n_cl = [], 0
    for _ in range(passes):
        t0 = time.time()
        pairs = minhash_lsh_candidates(d).filter(F.col("est_jaccard") >= 0.5)
        cl = duplicate_clusters(pairs, d.select("doc_id"))
        n_cl = cl.select("cluster_id").distinct().count()
        cl_walls.append(time.time() - t0)
        _drain_gc(spark)

    from vcf2db_spark.queries.pipeline_ext import contam_ngram

    ct_walls, n_ct = [], 0
    for _ in range(passes):
        t0 = time.time()
        n_ct = contam_ngram(spark, sf_dir).count()
        ct_walls.append(time.time() - t0)

    # unbounded BPE: train 8 merges on the full word table, encode all
    from vcf2db_spark.functions.text import ws_tokens
    from vcf2db_spark.operators.bpe import bpe_encode_vocab, bpe_train_merges

    bpe_walls, n_bpe = [], 0
    for _ in range(passes):
        t0 = time.time()
        toks = d.select(
            "doc_id",
            F.explode(ws_tokens(F.lower(F.trim(F.col("text"))))).alias("w"),
        ).filter(F.length("w") > 0)
        words = toks.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
        merges = bpe_train_merges(words, n_merges=8)
        enc = bpe_encode_vocab(words, merges)
        n_bpe = enc.count()
        bpe_walls.append(time.time() - t0)

    bound_txt = (
        f"band_pairs={int(bound_row['pairs'])} "
        f"max_bucket={bound_row['max_bucket']} "
        f"n_buckets={bound_row['n_buckets']}"
    )
    print(
        f"{sf} DEDUP: n_docs={n_docs} | lsh wall={lsh_wall:.2f}s "
        f"(passes={sorted(round(w, 2) for w in walls)}) cand={n_cand} | "
        f"{bound_txt} | clusters wall={min(cl_walls):.2f}s "
        f"n_clusters={n_cl} | contam wall={min(ct_walls):.2f}s "
        f"rows={n_ct} | bpe wall={min(bpe_walls):.2f}s vocab_rows={n_bpe}",
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--scales", nargs="*", default=["sf1", "sf4"])
    ap.add_argument(
        "--lists-mode", choices=("sqrt", "prop"), default="sqrt",
        help="n_lists = sqrt(n) (board continuity) or n/141 "
        "(constant per-list size — the scale path the r7 study found)",
    )
    ap.add_argument(
        "--tier", choices=("ann", "dedup", "all"), default="ann",
        help="dedup adds the unbounded minhash-LSH/clusters/contam/bpe "
        "board (VERDICT r9 item 1)",
    )
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
        sf_dir = f"/root/repo/.bench_data/{sf}"
        if args.tier in ("dedup", "all"):
            run_dedup_tier(spark, sf, sf_dir, args.passes)
        if args.tier == "dedup":
            continue
        emb = table_wide(spark, sf_dir, "embeddings")
        n = emb.count()
        if args.lists_mode == "sqrt":
            n_lists = max(8, int(round(math.sqrt(n))))
        else:  # constant per-list size (~141 rows, the sf1 density)
            n_lists = max(8, n // 141)
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
