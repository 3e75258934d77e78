"""Similarity search over embedding columns (SURVEY.md §2C C3).

Three tiers:
- **brute force**: exact cosine top-k — per-position products with exact
  decimal sums (hash-reproducible across engines).
- **LSH (random hyperplanes)**: fixed-seed projection matrix broadcast as a
  literal; signature = sign bits; search only the query's bucket ring.
- **IVF**: deterministic centroid sample, residual assignment, probe the
  nearest `nprobe` lists. At 100 TB the index is written bucketed by
  ``list_id`` so a probe is a partition-pruned scan, not a full pass.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


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


def lsh_signature_col(vec_col: str, planes: np.ndarray):
    """Signature bigint: bit i = sign(dot(vec, plane_i)). Planes are baked
    in as literals (broadcast-by-plan)."""
    assert len(planes) <= 62, "signature must fit a signed bigint"
    sig = F.lit(0).cast("bigint")
    for i, row in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in row])
        sig = sig + F.when(_dot(F.col(vec_col), p) > 0, F.lit(1 << i).cast("bigint")).otherwise(0)
    return sig


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


def ivf_assign(
    emb: DataFrame,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF: centroids = the n_lists vectors with smallest
    murmur3(id) (a seeded sample without rand()); every vector joins its
    nearest centroid. Returns (assigned, centroids). At scale: persist
    ``assigned`` bucketed by list_id."""
    ranked = emb.select(
        id_col, vec_col, F.hash(F.col(id_col).cast("string")).alias("_h")
    ).orderBy("_h", id_col).limit(n_lists)
    centroids = [
        (int(r[id_col]), [float(x) for x in r[vec_col]]) for r in ranked.collect()
    ]
    pairs = []
    for cid, vec in centroids:
        c = F.array(*[F.lit(x) for x in vec])
        pairs.append(F.struct(F.lit(cid).alias("list_id"), (-cosine(F.col(vec_col), c)).alias("neg_cos")))
    best = F.array_min(F.array(*[F.struct(p["neg_cos"].alias("neg_cos"), p["list_id"].alias("list_id")) for p in pairs]))
    assigned = emb.withColumn("list_id", best["list_id"])
    cdf_rows = [(cid, vec) for cid, vec in centroids]
    cdf = emb.sparkSession.createDataFrame(cdf_rows, "list_id bigint, centroid array<double>")
    return assigned, cdf


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
    assigned, cdf = ivf_assign(emb, n_lists, id_col, vec_col)
    qv = np.asarray(query_vec, dtype="float64")

    def cos_np(c):
        c = np.asarray(c)
        return float(np.dot(c, qv) / (np.linalg.norm(c) * np.linalg.norm(qv) + 1e-12))

    lists = sorted(
        ((cos_np(r["centroid"]), r["list_id"]) for r in cdf.collect()), reverse=True
    )
    probe_ids = [lid for _, lid in lists[:nprobe]]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("list_id").isin(probe_ids))
        .select(id_col, F.round(cosine(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
    )
