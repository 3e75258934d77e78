"""Similarity search over embedding columns (SURVEY.md §2C C3).

Three tiers:
- **brute force**: exact cosine top-k — sequential-double array HOFs
  (bitwise-reproducible against DuckDB's list_dot_product, which folds in
  the same order), narrow map + TakeOrderedAndProject, corpus never
  shuffled.
- **LSH (random hyperplanes)**: fixed-seed projection matrix carried in a
  pandas_udf closure (executor broadcast); signature = sign bits; search
  only the query's Hamming ring.
- **IVF**: deterministic centroid sample, vectorized numpy assignment,
  probe the nearest ``nprobe`` lists. At 100 TB the index is written
  bucketed by ``list_id`` so a probe is a partition-pruned scan, not a
  full pass.

The wide linear algebra (vector × plane/centroid matrix) runs as
Arrow-batched numpy matmuls inside pandas UDFs — inlining the matrices as
column literals instead explodes Catalyst expression trees (n_planes × dim
literal nodes) and falls out of whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dot(a, b):
    """Sequential double dot product of two array columns (left-to-right
    fold — the same association order as DuckDB list_dot_product)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


_dot = dot  # back-compat alias


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine against one query vector: narrow map +
    TakeOrderedAndProject — no shuffle of the corpus."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.select(id_col, F.round(cosine(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signature_col(vec_col, planes: np.ndarray):
    """Signature bigint column: bit i = sign(dot(vec, plane_i)). One Arrow
    batch → one numpy matmul; the plane matrix rides the UDF closure."""
    P = np.ascontiguousarray(planes, dtype="float64")
    weights = (1 << np.arange(len(P), dtype="int64"))

    @pandas_udf("bigint")
    def sig(vecs: pd.Series) -> pd.Series:
        V = np.array(vecs.tolist(), dtype="float64")
        bits = (V @ P.T) > 0
        return pd.Series(bits @ weights)

    return sig(vec_col if isinstance(vec_col, Column) else F.col(vec_col))


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k: score only vectors whose signature is within
    ``max_hamming`` bits of the query's — the candidate set shrinks
    ~2^{-n_planes+·}; exact cosine re-ranks the candidates."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qsig = 0
    for i, row in enumerate(planes):
        if float(np.dot(row, np.asarray(query_vec))) > 0:
            qsig |= 1 << i
    sigs = emb.withColumn("_sig", lsh_signature_col(vec_col, planes))
    cand = sigs.filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(id_col, F.round(cosine(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
    )


def hash_ordered_sample(
    emb: DataFrame, n: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """The shared deterministic sample-without-rand device: the ``n``
    rows with smallest murmur3(id) (hash order is a seeded shuffle of the
    id space). Used by IVF centroid seeding and PQ codebook training so
    both tiers sample identically."""
    return (
        emb.select(id_col, vec_col, F.hash(F.col(id_col).cast("string")).alias("_h"))
        .orderBy("_h", id_col)
        .limit(n)
    )


def ivf_assign(
    emb: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Deterministic IVF: centroids = the n_lists vectors with smallest
    murmur3(id) (a seeded sample without rand()); every vector is assigned
    to its max-cosine centroid by one numpy matmul per Arrow batch.
    Returns (assigned, centroids). At scale: persist ``assigned`` bucketed
    by list_id; the centroid table is O(n_lists) driver/broadcast state.

    ``refine_iters`` runs that many Lloyd iterations (spherical k-means):
    recompute each list's centroid as the mean of its members (one
    posexplode+avg aggregation per iteration — fully distributed), then
    re-assign. Deterministic (no rand anywhere); the clustering objective
    (mean cosine to assigned centroid) is monotonically non-decreasing,
    which tests/test_sinks_scale.py asserts. Refined lists are tighter →
    higher recall at the same nprobe."""
    ranked = hash_ordered_sample(emb, n_lists, id_col, vec_col)
    centroids = [
        (int(r[id_col]), [float(x) for x in r[vec_col]]) for r in ranked.collect()
    ]
    centroids.sort()  # ties in assignment break to the smallest list_id

    def _make_assign(cents: list[tuple[int, list[float]]]):
        ids = np.array([c for c, _ in cents], dtype="int64")
        C = np.array([v for _, v in cents], dtype="float64")
        Cn = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)

        @pandas_udf("bigint")
        def assign(vecs: pd.Series) -> pd.Series:
            V = np.array(vecs.tolist(), dtype="float64")
            Vn = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-12)
            return pd.Series(ids[np.argmax(Vn @ Cn.T, axis=1)])

        return assign

    assigned = emb.withColumn("list_id", _make_assign(centroids)(F.col(vec_col)))
    for _ in range(refine_iters):
        # Lloyd step: per-list mean vector via posexplode + avg (the mean's
        # direction is the spherical-k-means maximizer; cosine ignores
        # its scale, so no re-normalization is needed here)
        rows = (
            assigned.select("list_id", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
            .collect()
        )
        means = {int(r["list_id"]): [float(x) for x in r["centroid"]] for r in rows}
        # empty lists keep their previous centroid (stable list ids)
        centroids = [(lid, means.get(lid, vec)) for lid, vec in centroids]
        assigned = emb.withColumn("list_id", _make_assign(centroids)(F.col(vec_col)))
    return assigned, centroids


def ivf_assign_multi(
    emb: DataFrame,
    n_lists: int = 16,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Multi-probe IVF assignment: each vector lands in its ``probes``
    nearest lists (one row per (vector, list) after explode).

    This is the boundary-recall mitigation for list-blocked candidate
    generation: a pair split across adjacent lists still collides as long
    as either vector's second-nearest list is the other's first. Cost is
    bounded: the exploded table is ``probes×`` rows, so same-list pair
    work rises by ~``probes²`` while staying Σ|list|² ≪ |corpus|².

    Centroids (and optional Lloyd refinement) come from the single-probe
    ``ivf_assign`` — the index layout stays identical; only candidate
    generation widens.
    """
    _assigned, centroids = ivf_assign(emb, n_lists, id_col, vec_col, refine_iters)
    ids = np.array([c for c, _ in centroids], dtype="int64")
    C = np.array([v for _, v in centroids], dtype="float64")
    Cn = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)
    p = min(probes, len(ids))

    @pandas_udf("array<bigint>")
    def assign_multi(vecs: pd.Series) -> pd.Series:
        V = np.array(vecs.tolist(), dtype="float64")
        Vn = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-12)
        sims = Vn @ Cn.T
        # top-p centroid indices per row (argpartition then exact order)
        part = np.argpartition(-sims, p - 1, axis=1)[:, :p]
        row_order = np.argsort(-np.take_along_axis(sims, part, axis=1), axis=1)
        top = np.take_along_axis(part, row_order, axis=1)
        return pd.Series(list(ids[top]))

    multi = emb.withColumn("_lists", assign_multi(F.col(vec_col)))
    # posexplode: keep the probe rank (0 = nearest list) — consumers that
    # don't need it ignore the column; the recall ladder derives every
    # probe level from one assignment pass with it
    exploded = multi.select(
        *[F.col(c) for c in emb.columns],
        F.posexplode("_lists").alias("_probe_rank", "list_id"),
    )
    return exploded, centroids


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest inverted lists, exact-rank within them."""
    assigned, centroids = ivf_assign(emb, n_lists, id_col, vec_col)
    qv = np.asarray(query_vec, dtype="float64")

    def cos_np(c):
        c = np.asarray(c)
        return float(np.dot(c, qv) / (np.linalg.norm(c) * np.linalg.norm(qv) + 1e-12))

    lists = sorted(((cos_np(vec), cid) for cid, vec in centroids), reverse=True)
    probe_ids = [lid for _, lid in lists[:nprobe]]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("list_id").isin(probe_ids))
        .select(id_col, F.round(cosine(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
    )


def build_ivf_index(
    emb: DataFrame,
    path: str,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refine_iters: int = 0,
) -> None:
    """Persist an IVF index: vectors partitioned by inverted list
    (`list_id=` directories → storage-level partition pruning at probe
    time) plus the centroid table under ``_centroids/`` (the underscore
    prefix keeps parquet readers of the main dataset from picking it up).
    Build cost: one centroid sample + one matmul assignment pass + one
    partitioned write; at 100 TB this is the one-off that turns every
    subsequent search from a full scan into an nprobe/n_lists scan."""
    assigned, centroids = ivf_assign(emb, n_lists, id_col, vec_col, refine_iters)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)
    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [(cid, vec) for cid, vec in centroids], "list_id bigint, centroid array<double>"
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{path}/_centroids")


def ivf_search(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a persisted IVF index: rank centroids driver-side
    (O(n_lists) work), probe the nprobe nearest partitions (pruned scan),
    exact cosine re-rank inside them. Same result contract as
    ``ivf_topk`` but without re-building the assignment."""
    qv = np.asarray(query_vec, dtype="float64")
    cents = spark.read.parquet(f"{path}/_centroids").collect()

    def cos_np(c):
        c = np.asarray(c)
        return float(np.dot(c, qv) / (np.linalg.norm(c) * np.linalg.norm(qv) + 1e-12))

    ranked = sorted(((cos_np(r["centroid"]), int(r["list_id"])) for r in cents), reverse=True)
    probe_ids = [lid for _, lid in ranked[:nprobe]]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    idx = spark.read.parquet(path)
    return (
        idx.filter(F.col("list_id").isin(probe_ids))
        .select(id_col, F.round(cosine(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
    )


def knn_join(
    emb: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
    scoring: str = "gemm",
) -> DataFrame:
    """Batch k-NN: top-``k`` cosine neighbors for EVERY vector — the
    neighbor-graph primitive behind semantic dedup and corpus clustering.

    Approximate by list blocking: candidate pairs are vectors sharing an
    IVF list (Lloyd-refined lists keep near neighbors together), ranked
    per vector by a window. Cost: Σ|list|² pair evaluations instead of
    |corpus|² — with balanced lists that's |corpus|²/n_lists, and the
    per-list join is an equi-join on ``list_id`` (shuffle-partitioned,
    AQE-splittable), never a cartesian product.

    ``probes > 1`` switches candidate generation to the multi-probe
    assignment (``ivf_assign_multi``): each vector also collides with the
    members of its ``probes-1`` runner-up lists, recovering pairs that
    straddle a list boundary at ~``probes²×`` pair cost. Duplicate
    candidates from shared lists are folded by a (id, neighbor_id)
    partial-agg before the top-k window, so the output contract is
    unchanged.

    Output: (id, neighbor_id, cosine), ``k`` rows per id (fewer in
    degenerate tiny lists), ties broken by neighbor id.

    ``scoring='gemm'`` (default) computes each list's pair scores as ONE
    blocked numpy matmul inside an ``applyInPandas`` group and emits only
    that list's per-id top-k — |list|×k rows instead of |list|² — before
    the cross-list fold. Per-list top-k then global top-k is exact: a
    pair in the global top-k is beaten by < k candidates overall, hence
    by < k in any shared list, so it survives every local cut (the order
    is strictly total — rounded score desc, neighbor id asc). The r9
    board measured the interpreted HOF fold (``scoring='hof'``) as the
    tier's scale ceiling: 64 interpreted ops × Σ|list|² pairs; the GEMM
    path moves the same arithmetic into ~n_lists BLAS calls and shrinks
    the post-score shuffle from Σ|list|² to n×probes×k rows.
    """
    from pyspark.sql import Window

    if probes > 1:
        assigned, _ = ivf_assign_multi(
            emb, n_lists, probes, id_col, vec_col, refine_iters
        )
    else:
        assigned, _ = ivf_assign(emb, n_lists, id_col, vec_col, refine_iters)

    if scoring == "gemm":
        def _score_list(pdf: pd.DataFrame) -> pd.DataFrame:
            L = len(pdf)
            if L < 2:
                return pd.DataFrame(
                    {"id": [], "neighbor_id": [], "cosine": []}
                ).astype({"id": "int64", "neighbor_id": "int64",
                          "cosine": "float64"})
            pdf = pdf.sort_values("_knn_id")  # column order = asc id
            ids = pdf["_knn_id"].to_numpy("int64")
            V = np.array(pdf["_knn_vec"].tolist(), dtype="float64")
            Vn = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-300)
            kk = min(k, L - 1)
            out_i, out_j, out_s = [], [], []
            # row blocks bound the score matrix to block×L
            step = max(1, min(L, (4 << 20) // max(L, 1)))
            for lo in range(0, L, step):
                S = np.round(Vn[lo : lo + step] @ Vn.T, 6)
                # self-pair: a finite below-any-cosine sentinel (NOT -inf:
                # int64(-inf) is INT64_MIN and the key multiply overflows)
                for r in range(S.shape[0]):
                    S[r, lo + r] = -2.0
                # strict total order: score desc, neighbor index asc —
                # encode as one int64 key (|1e6·score| ≤ 1e6, L < 2^31)
                # rint first: round(x,6)*1e6 can sit 1 ulp below the integer
                # and astype truncates toward zero, colliding two scores
                key = np.rint(S * 1e6).astype("int64") * (L + 1) - np.arange(L)
                top = np.argpartition(-key, kk - 1, axis=1)[:, :kk]
                kkey = np.take_along_axis(key, top, axis=1)
                order = np.argsort(-kkey, axis=1, kind="stable")
                top = np.take_along_axis(top, order, axis=1)
                rows = np.repeat(np.arange(S.shape[0]), kk)
                cols = top.reshape(-1)
                out_i.append(np.repeat(ids[lo : lo + step], kk))
                out_j.append(ids[cols])
                out_s.append(S[rows, cols])
            return pd.DataFrame(
                {
                    "id": np.concatenate(out_i),
                    "neighbor_id": np.concatenate(out_j),
                    "cosine": np.concatenate(out_s),
                }
            )

        cand = (
            assigned.select(
                "list_id",
                F.col(id_col).alias("_knn_id"),
                F.col(vec_col).alias("_knn_vec"),
            )
            .groupBy("list_id")
            .applyInPandas(
                _score_list, "id long, neighbor_id long, cosine double"
            )
        )
        scored = cand
        if probes > 1:
            # the same pair from several shared lists carries the same
            # rounded score; max() is a map-side-combinable dedup
            scored = scored.groupBy("id", "neighbor_id").agg(
                F.max("cosine").alias("cosine")
            )
    else:
        a = assigned.select(
            F.col("list_id"), F.col(id_col).alias("id"), F.col(vec_col).alias("_va")
        )
        b = assigned.select(
            F.col("list_id"), F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vb")
        )
        pairs = a.join(b, "list_id").filter(F.col("id") != F.col("neighbor_id"))
        scored = pairs.select(
            "id",
            "neighbor_id",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cosine"),
        )
        if probes > 1:
            scored = scored.groupBy("id", "neighbor_id").agg(F.max("cosine").alias("cosine"))
    w = Window.partitionBy("id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_lists: int = 16,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
) -> DataFrame:
    """Embedding-space near-duplicate removal (SemDeDup-style): drop every
    vector that has a kept neighbor with cosine ≥ ``threshold``; within a
    duplicate pair the smaller id survives (deterministic).

    Built on the IVF list blocking of ``knn_join``: only same-list pairs
    are compared (|corpus|²/n_lists work), then a left-anti join removes
    the larger id of each over-threshold pair. One list-blocked join, one
    anti join — no all-pairs product at any scale.
    """
    pairs = knn_join(
        emb, k=1, n_lists=n_lists, refine_iters=refine_iters,
        id_col=id_col, vec_col=vec_col, probes=probes,
    )
    drops = (
        pairs.filter((F.col("cosine") >= threshold) & (F.col("id") > F.col("neighbor_id")))
        .select(F.col("id").alias(id_col))
        .distinct()
    )
    return emb.join(drops, id_col, "left_anti")


def ivfadc_knn_join(
    emb: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    refine_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 1,
    m: int = 8,
    ksub: int = 128,
    pq_iters: int = 4,
    pq_sample: int = 2048,
    rerank: int = 0,
    scoring: str = "lut",
) -> DataFrame:
    """IVFADC batch k-NN (VERDICT r7 item 6 — Jégou et al.'s IVF +
    product-quantized asymmetric distance): the same IVF list blocking
    as ``knn_join``, but the DATABASE side of the pair join carries m
    one-byte PQ codes instead of the full vector — for a 64-dim float64
    embedding that is 512 B → 8 B of probe bandwidth per candidate
    (~64×), the standard billion-scale probe layout. Scoring is
    asymmetric: the query side stays full precision; the candidate is
    reconstructed from its codes per Arrow batch (one gather per
    subspace + one rowwise dot — vectorized numpy, no per-row Python),
    so the only approximation added over ``knn_join`` is the PQ
    reconstruction error, which the ``ivfadc_recall`` ladder measures
    against the exact twin at equal probe counts.

    ``rerank > 0`` adds the IVFADC-R tier: the top ``rerank`` ADC
    candidates per id are re-scored with FULL-precision cosine (a gather
    join against the corpus — full vectors move for only ``rerank``
    candidates per query, keeping the bandwidth bound) and the final
    top-k comes from the exact scores; this recovers most of the PQ
    reconstruction penalty on hard (near-random) distributions.

    Output contract matches ``knn_join``: (id, neighbor_id, cosine) with
    the ADC cosine (exact cosine when reranking), ``k`` rows per id,
    ties by neighbor id.

    ``scoring='lut'`` (default) is the FAISS-shaped plan: one
    ``applyInPandas`` group per list builds the m×ksub dot-product
    lookup table per query block and scores the whole list by m fancy-
    index gathers — each group emits only its per-id top candidates, so
    the post-score shuffle is n×probes×max(k, rerank) rows. The r10
    sf16 board measured the exploded-pair shape (``scoring='pairs'``,
    the r8 design: ADC pandas_udf over an a×b list join) at 445 s /
    320k vectors — the 512 B query vector crossed Arrow once PER
    CANDIDATE (~0.4 TB); the LUT plan ships each vector once per probed
    list. Codes are derived in-group from the same codebooks (argmin is
    deterministic, so they equal the ``pq_codes_col`` assignment); at
    the stored-index design point (``build_ivf_index``) the codes
    column replaces the vector column entirely and the same LUT scoring
    applies.
    """
    from pyspark.sql import Window

    from vcf2db_spark.operators.quantization import (
        adc_cosine_col, pq_codes_col, pq_train,
    )

    codebooks = pq_train(
        emb, m=m, k=ksub, iters=pq_iters, sample=pq_sample,
        id_col=id_col, vec_col=vec_col,
    )
    if probes > 1:
        assigned, _ = ivf_assign_multi(
            emb, n_lists, probes, id_col, vec_col, refine_iters
        )
    else:
        assigned, _ = ivf_assign(emb, n_lists, id_col, vec_col, refine_iters)

    kk_out = max(rerank, k) if rerank else k
    if scoring == "lut":
        C = codebooks.copy()
        cnorm2 = (C * C).sum(axis=2)  # m × ksub codeword norms²
        sub = C.shape[2]

        def _adc_list(pdf: pd.DataFrame) -> pd.DataFrame:
            L = len(pdf)
            if L < 2:
                return pd.DataFrame(
                    {"id": [], "neighbor_id": [], "cosine": []}
                ).astype({"id": "int64", "neighbor_id": "int64",
                          "cosine": "float64"})
            pdf = pdf.sort_values("_adc_id")
            ids = pdf["_adc_id"].to_numpy("int64")
            V = np.array(pdf["_adc_vec"].tolist(), dtype="float64")
            # database side: PQ codes + reconstruction norms (in-group,
            # identical to the global pq_codes_col assignment)
            codes = np.empty((L, m), dtype="int64")
            rnorm2 = np.zeros(L, dtype="float64")
            for j in range(m):
                Xj = V[:, j * sub : (j + 1) * sub]
                d = (
                    (Xj * Xj).sum(axis=1, keepdims=True)
                    - 2.0 * (Xj @ C[j].T)
                    + cnorm2[j][None, :]
                )
                codes[:, j] = np.argmin(d, axis=1)
                rnorm2 += cnorm2[j][codes[:, j]]
            qnorm = np.linalg.norm(V, axis=1)
            rnorm = np.sqrt(rnorm2)
            kk = min(kk_out, L - 1)
            out_i, out_j, out_s = [], [], []
            step = max(1, min(L, (4 << 20) // max(L, 1)))
            for lo in range(0, L, step):
                B = V[lo : lo + step]
                S = np.zeros((len(B), L), dtype="float64")
                for j in range(m):
                    lut = B[:, j * sub : (j + 1) * sub] @ C[j].T  # B×ksub
                    S += lut[:, codes[:, j]]
                S /= qnorm[lo : lo + step, None] * rnorm[None, :] + 1e-12
                S = np.round(S, 6)
                for r in range(S.shape[0]):
                    S[r, lo + r] = -2.0  # self (finite: key cast below)
                # rint first: round(x,6)*1e6 can sit 1 ulp below the integer
                # and astype truncates toward zero, colliding two scores
                key = np.rint(S * 1e6).astype("int64") * (L + 1) - np.arange(L)
                top = np.argpartition(-key, kk - 1, axis=1)[:, :kk]
                kkey = np.take_along_axis(key, top, axis=1)
                order = np.argsort(-kkey, axis=1, kind="stable")
                top = np.take_along_axis(top, order, axis=1)
                rows = np.repeat(np.arange(S.shape[0]), kk)
                cols = top.reshape(-1)
                out_i.append(np.repeat(ids[lo : lo + step], kk))
                out_j.append(ids[cols])
                out_s.append(S[rows, cols])
            return pd.DataFrame(
                {
                    "id": np.concatenate(out_i),
                    "neighbor_id": np.concatenate(out_j),
                    "cosine": np.concatenate(out_s),
                }
            )

        scored = (
            assigned.select(
                "list_id",
                F.col(id_col).alias("_adc_id"),
                F.col(vec_col).alias("_adc_vec"),
            )
            .groupBy("list_id")
            .applyInPandas(
                _adc_list, "id long, neighbor_id long, cosine double"
            )
        )
        if probes > 1:
            scored = scored.groupBy("id", "neighbor_id").agg(
                F.max("cosine").alias("cosine")
            )
    else:
        a = assigned.select(
            F.col("list_id"), F.col(id_col).alias("id"), F.col(vec_col).alias("_va")
        )
        # the probe side: codes ONLY — the full vector never enters the join
        b = assigned.select(
            F.col("list_id"),
            F.col(id_col).alias("neighbor_id"),
            pq_codes_col(F.col(vec_col), codebooks).alias("_cb"),
        )
        pairs = a.join(b, "list_id").filter(F.col("id") != F.col("neighbor_id"))
        scored = pairs.select(
            "id",
            "neighbor_id",
            adc_cosine_col(F.col("_va"), F.col("_cb"), codebooks).alias("cosine"),
        )
        if probes > 1:
            scored = scored.groupBy("id", "neighbor_id").agg(
                F.max("cosine").alias("cosine")
            )
    w = Window.partitionBy("id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    if not rerank:
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
    cand = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max(rerank, k))
        .drop("_rn", "cosine")
    )
    qa = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_ra"))
    qb = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_rb")
    )
    exact = cand.join(qa, "id").join(qb, "neighbor_id").select(
        "id",
        "neighbor_id",
        F.round(cosine(F.col("_ra"), F.col("_rb")), 6).alias("cosine"),
    )
    return (
        exact.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
