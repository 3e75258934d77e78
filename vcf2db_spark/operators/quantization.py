"""Embedding compression operators: int8 affine quantization and product
quantization (PQ) — the storage tier of a large-scale embedding pipeline
(SURVEY.md §2C similarity family; companions to operators/similarity.py).

Design split, 100 TB-shaped:

- **int8 path** is pure JVM higher-order functions (transform/zip_with/
  aggregate) — no Python in the plan at all, so it whole-stage-codegens
  and scales like any narrow projection.
- **PQ path** trains codebooks on a *deterministic bounded sample*
  collected to the driver (O(sample × dim) memory, like the IVF centroid
  table), then encodes the full corpus distributively with one
  Arrow-batched numpy matmul per subspace — never a per-row Python loop.
  Codebooks travel to executors inside the pandas_udf closure
  (broadcast-sized: m·k·(dim/m) floats).

Determinism: no rand() anywhere. Sampling keys on murmur3 of the id
(same device as operators/similarity.py ivf_assign); Lloyd refinement is
plain means over fixed assignments, ties broken by smallest centroid id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


# --------------------------------------------------------------------------
# int8 affine quantization (symmetric, per-vector max-abs scale)
# --------------------------------------------------------------------------


def int8_quant_stats(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector int8 round-trip error, computed entirely JVM-side.

    quantized_i = round(x_i / scale * 127), dequantized back with the same
    per-vector max-abs ``scale``. Returns scalar columns only (driver-canon
    safe): id, scale, max_abs_err, mean_abs_err. Elements are cast to
    double FIRST so the arithmetic is the identical IEEE sequence the
    DuckDB oracle runs (list<float> fixtures would otherwise round-trip
    through float32 on the Spark side only). The per-vector MEAN error
    goes through the repo's fixed-point convention (exact BIGINT unit
    sums, registry.py) because a plain double fold would expose
    summation-order differences between Spark's HOF fold and DuckDB's
    unnest aggregate; MAX needs no such care (order-free).

    Plan shape: narrow projection, zero shuffles, whole-stage codegen —
    no explode, no Python. At 100 TB this is a map-only pass.
    """
    # Drop NULL elements before any arithmetic: the oracle's unnest rows
    # for NULL elements vanish from its MAX/COUNT aggregates, while a
    # NULL inside the Spark fold would poison the whole fixed-point
    # accumulator — compacting first keeps both engines on the same
    # element multiset (and the same mean denominator).
    v = F.filter(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        lambda x: x.isNotNull(),
    )
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # round-trip error per element, fused into ONE transform (no
    # intermediate dequantized array to materialize — these HOFs are
    # interpreted, so every avoided array pass is real time);
    # scale > 0 guaranteed by the filter
    err = F.transform(
        v,
        lambda x: F.abs(
            x
            - F.round(x / F.col("_scale") * F.lit(127.0))
            / F.lit(127.0)
            * F.col("_scale")
        ),
    )
    units = F.aggregate(
        F.col("_err"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.round(x * F.lit(1_000_000.0)).cast("long"),
    )
    mean_err = (
        F.round(units.cast("double") / F.size(F.col("_err"))).cast("double")
        / F.lit(1_000_000.0)
    )
    # Drop all-zero vectors with a cheap EXISTS precondition BEFORE any
    # computed alias exists: filtering on `_scale > 0` after the select
    # would make Catalyst inline the whole max-abs HOF into the Filter
    # and re-evaluate it per row (the docs/SCALE.md §9.2 pothole — the
    # plan guard test_no_interpreted_hof_in_generate_filters rejects it).
    # scale > 0 ⟺ some element ≠ 0, so the predicates are equivalent.
    return (
        emb.filter(F.exists(F.col(vec_col), lambda x: x != F.lit(0.0)))
        .select(id_col, F.col(vec_col), scale.alias("_scale"))
        .withColumn("_err", err)
        .select(
            id_col,
            F.col("_scale").alias("scale"),
            F.array_max("_err").alias("max_abs_err"),
            mean_err.alias("mean_abs_err"),
        )
    )


# --------------------------------------------------------------------------
# product quantization
# --------------------------------------------------------------------------


def _subspace_kmeans(
    X: np.ndarray, k: int, iters: int
) -> np.ndarray:
    """Deterministic Lloyd k-means for one subspace on the driver-side
    training sample. Init = the first k DISTINCT rows in input order
    (the sample is already hash-ordered, i.e. a seeded shuffle) —
    duplicate sample vectors would otherwise seed duplicate centroids
    and waste codewords; if the subspace has fewer than k distinct rows
    the tail repeats the last seed (k_effective = #distinct). Ties in
    assignment break to the lowest centroid index (np.argmin)."""
    seen: set = set()
    seed = []
    for row in X:
        key = row.tobytes()
        if key not in seen:
            seen.add(key)
            seed.append(row)
            if len(seed) == k:
                break
    while len(seed) < k:
        seed.append(seed[-1])
    C = np.array(seed, dtype="float64")
    n, sub = X.shape
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)
        # vectorized Lloyd update: per-dimension bincount sums replace a
        # per-centroid Python loop (the loop was 90% of opq_train's
        # driver time — k×iters×m tiny .mean calls); empty clusters keep
        # their previous centroid, as before
        counts = np.bincount(a, minlength=k).astype("float64")
        nz = counts > 0
        sums = np.empty((k, sub))
        for dcol in range(sub):
            sums[:, dcol] = np.bincount(a, weights=X[:, dcol], minlength=k)
        C[nz] = sums[nz] / counts[nz, None]
    return C


def _all_subspace_kmeans(
    X: np.ndarray, m: int, k: int, iters: int
) -> np.ndarray:
    """Train ALL m subspace codebooks at once — the same deterministic
    Lloyd as :func:`_subspace_kmeans` (first-k-distinct seeding per
    subspace, lowest-index tie-break, empty clusters keep their
    centroid) but with the m×iters loop collapsed to ``iters`` batched
    numpy steps: one (n, m, k) distance einsum + one flattened
    scatter-add per iteration. opq_train re-trains every subspace each
    of its opq_iters rounds — per-subspace Python looping was the whole
    driver cost of the OPQ rung (measured 4.3 s → <0.2 s at the ladder's
    m=32, k=128, 9 rounds)."""
    n, dim = X.shape
    sub = dim // m
    Xs = X.reshape(n, m, sub)
    C = np.empty((m, k, sub))
    for j in range(m):
        # first-k-distinct seeding, vectorized: unique rows' first
        # occurrence positions, restored to input order (identical to
        # the row-scan: first k distinct rows in order; short subspaces
        # repeat the last seed)
        col = np.ascontiguousarray(Xs[:, j, :])
        keyed = col.view([("", col.dtype)] * sub).ravel()
        _, first_idx = np.unique(keyed, return_index=True)
        first_idx.sort()
        idx = first_idx[:k]
        C[j, : len(idx)] = col[idx]
        if len(idx) < k:
            C[j, len(idx) :] = col[idx[-1]]
    offs = (np.arange(m) * k)[None, :]  # flat cluster ids: j*k + a[:, j]
    XsT = np.ascontiguousarray(Xs.transpose(1, 0, 2))  # (m, n, sub)
    x_sq = (Xs * Xs).sum(axis=2).T[:, :, None]  # (m, n, 1)
    for _ in range(iters):
        # ||x-c||² per (subspace, row, codeword) via one batched BLAS
        # matmul for the cross term, argmin over codewords
        d = (
            x_sq
            - 2.0 * np.matmul(XsT, C.transpose(0, 2, 1))
            + (C * C).sum(axis=2)[:, None, :]
        )
        a = d.argmin(axis=2).T  # (n, m)
        flat = (a + offs).ravel()  # (n*m,)
        counts = np.bincount(flat, minlength=m * k).astype("float64")
        sums = np.empty((m * k, sub))
        vals = Xs.reshape(n * m, sub)
        for dcol in range(sub):
            sums[:, dcol] = np.bincount(
                flat, weights=vals[:, dcol], minlength=m * k
            )
        nz = counts > 0
        Cf = C.reshape(m * k, sub)
        Cf[nz] = sums[nz] / counts[nz, None]
        C = Cf.reshape(m, k, sub)
    return C


def collect_train_sample(
    emb: DataFrame,
    sample: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Collect the deterministic hash-ordered training sample ONCE as an
    (n, dim) float64 matrix — pq_train and opq_train both key on
    murmur3(id), so a caller training several code tiers (the IVFADC
    ladder) pays one Spark job instead of one per tier (pass the result
    via their ``sample_X``)."""
    from vcf2db_spark.operators.similarity import hash_ordered_sample

    rows = (
        hash_ordered_sample(emb, sample, id_col, vec_col)
        .select(vec_col)
        .collect()
    )
    return np.array([r[vec_col] for r in rows], dtype="float64")


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    sample: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_X: np.ndarray | None = None,
) -> np.ndarray:
    """Train PQ codebooks on the ``sample`` vectors with smallest
    murmur3(id) — a deterministic sample-without-rand, the SAME shared
    helper ivf_assign seeds from
    (operators/similarity.py::hash_ordered_sample). Returns an
    (m, k, dim/m) ndarray. Driver memory is O(sample·dim + m·k·dim/m);
    the corpus is never collected."""
    X = (
        sample_X
        if sample_X is not None
        else collect_train_sample(emb, sample, id_col, vec_col)
    )
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    return _all_subspace_kmeans(X, m, k, iters)


def _pq_reconstruct(Y: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Nearest-codeword reconstruction of ``Y`` under codebooks ``C`` —
    one vectorized argmin + gather per subspace (shared by training and
    the stats/ADC paths)."""
    m, k, sub = C.shape
    R = np.empty_like(Y)
    for j in range(m):
        Yj = Y[:, j * sub : (j + 1) * sub]
        d = (
            (Yj * Yj).sum(axis=1, keepdims=True)
            - 2.0 * (Yj @ C[j].T)
            + (C[j] * C[j]).sum(axis=1)[None, :]
        )
        R[:, j * sub : (j + 1) * sub] = C[j][np.argmin(d, axis=1)]
    return R


def opq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    sample: int = 2048,
    opq_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_X: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Optimized Product Quantization (Ge et al., CVPR 2013, OPQ-NP):
    learn an ORTHOGONAL rotation R that redistributes variance across
    the PQ subspaces before encoding, alternating (a) train/assign PQ
    codebooks on the rotated sample with (b) the orthogonal-Procrustes
    solve R = UVᵀ from svd(Xᵀ·Ŷ) — the closed-form rotation minimizing
    ‖XR − Ŷ‖_F against the current reconstruction Ŷ. Returns
    (R: (dim, dim), codebooks: (m, k, dim/m)); encode x as
    PQ-codes(x·R) and score ADC queries through the same rotation —
    orthogonality preserves norms and inner products, so rotated-space
    cosine IS original-space cosine.

    This closes the ADC-only recall gap PQ's subspace-independence
    assumption leaves (VERDICT r8 item 3): measured on the embeddings
    fixture, recall@3 0.70 (PQ m=8) → 0.76 (OPQ m=8) → 0.91 (OPQ m=16).
    Everything here runs on the driver over the SAME bounded
    hash-ordered sample pq_train uses (O(sample·dim) memory, one
    64×64 SVD per iteration); the corpus is never collected and the
    rotation rides to executors in the UDF closure like the codebooks."""
    X = (
        sample_X
        if sample_X is not None
        else collect_train_sample(emb, sample, id_col, vec_col)
    )
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    R = np.eye(dim)
    for _ in range(opq_iters):
        Y = X @ R
        C = _all_subspace_kmeans(Y, m, k, iters)
        U, _, Vt = np.linalg.svd(X.T @ _pq_reconstruct(Y, C))
        R = U @ Vt
    Y = X @ R
    C = _all_subspace_kmeans(Y, m, k, iters)
    return R, C


def pq_encode_stats(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector against the codebooks and report scalar
    reconstruction stats (no array columns in the output). One
    Arrow-batched numpy pass: for each subspace, argmin distance to its k
    codewords (vectorized over the whole batch), reconstruction = the
    chosen codewords. Returns (id, l2_err, cos_recon): L2 reconstruction
    error and cosine(original, reconstruction)."""
    m, k, sub = codebooks.shape
    C = codebooks.copy()

    @pandas_udf("struct<l2_err: double, cos_recon: double>")
    def encode(vecs: pd.Series) -> pd.DataFrame:
        X = np.array(vecs.tolist(), dtype="float64")
        R = np.empty_like(X)
        for j in range(m):
            Xj = X[:, j * sub : (j + 1) * sub]
            # (batch, k) distances via ||x||² - 2xC' + ||c||²
            d = (
                (Xj * Xj).sum(axis=1, keepdims=True)
                - 2.0 * (Xj @ C[j].T)
                + (C[j] * C[j]).sum(axis=1)[None, :]
            )
            R[:, j * sub : (j + 1) * sub] = C[j][np.argmin(d, axis=1)]
        l2 = np.sqrt(((X - R) ** 2).sum(axis=1))
        denom = np.linalg.norm(X, axis=1) * np.linalg.norm(R, axis=1) + 1e-12
        cos = (X * R).sum(axis=1) / denom
        return pd.DataFrame({"l2_err": l2, "cos_recon": cos})

    return emb.select(
        id_col, encode(F.col(vec_col)).alias("_s")
    ).select(id_col, "_s.l2_err", "_s.cos_recon")


# --------------------------------------------------------------------------
# IVFADC support: PQ codes as a column + asymmetric distance (Jégou et al.,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011)
# --------------------------------------------------------------------------


def pq_codes_col(vec_col, codebooks: np.ndarray, rotation: np.ndarray | None = None):
    """PQ-encode a vector column to ``array<tinyint>`` codes (m bytes per
    vector — requires k ≤ 128 codewords per subspace). One Arrow-batched
    numpy argmin per subspace; the codebooks ride the UDF closure
    (broadcast-sized). This is the database-side storage/bandwidth tier
    of IVFADC: a 64-dim float64 vector (512 B) probes as m=8 bytes —
    the ~32–64× probe-bandwidth cut of the standard billion-scale
    layout. With ``rotation`` (from :func:`opq_train`) each batch is
    rotated ONCE before encoding — one extra (batch × dim × dim) matmul,
    the OPQ tier."""
    m, k, sub = codebooks.shape
    if k > 128:
        raise ValueError(f"pq_codes_col: k={k} codewords exceed tinyint range")
    C = codebooks.copy()
    R = None if rotation is None else rotation.copy()

    @pandas_udf("array<tinyint>")
    def encode(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype="float64")
        if R is not None:
            X = X @ R
        codes = np.empty((len(X), m), dtype="int8")
        for j in range(m):
            Xj = X[:, j * sub : (j + 1) * sub]
            d = (
                (Xj * Xj).sum(axis=1, keepdims=True)
                - 2.0 * (Xj @ C[j].T)
                + (C[j] * C[j]).sum(axis=1)[None, :]
            )
            codes[:, j] = np.argmin(d, axis=1).astype("int8")
        return pd.Series(list(codes))

    col = vec_col if not isinstance(vec_col, str) else F.col(vec_col)
    return encode(col)


def adc_cosine_col(va_col, codes_col, codebooks: np.ndarray, rotation: np.ndarray | None = None):
    """Asymmetric-distance cosine: full-precision query side vs the
    PQ-code side reconstructed per Arrow batch (ADC — the query is never
    quantized, so the only error is the database side's reconstruction).
    Rounded to 6 dp like every similarity score in this repo. Vectorized:
    one fancy-index gather per subspace + one rowwise dot per batch — no
    per-row Python. With ``rotation`` the QUERY batch is rotated into
    the OPQ space (one matmul); orthogonality preserves norms and dots,
    so the rotated-space cosine equals the original-space cosine."""
    m, k, sub = codebooks.shape
    C = codebooks.copy()
    Rm = None if rotation is None else rotation.copy()

    @pandas_udf("double")
    def adc(va: pd.Series, codes: pd.Series) -> pd.Series:
        A = np.array(va.tolist(), dtype="float64")
        if Rm is not None:
            A = A @ Rm
        Cd = np.array(codes.tolist(), dtype="int64")
        R = np.concatenate([C[j][Cd[:, j]] for j in range(m)], axis=1)
        num = (A * R).sum(axis=1)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(R, axis=1) + 1e-12
        return pd.Series(np.round(num / den, 6))

    a = va_col if not isinstance(va_col, str) else F.col(va_col)
    c = codes_col if not isinstance(codes_col, str) else F.col(codes_col)
    return adc(a, c)


def pq_codes_multi_col(vec_col, tiers: dict):
    """Encode a vector column under SEVERAL code tiers in ONE
    Arrow-batched pass — ``tiers`` maps a field name to ``(codebooks,
    rotation | None)``; returns a struct column with one
    ``array<tinyint>`` field per tier. The IVFADC ladder's device: the
    database side ships over Arrow once instead of once per tier, and
    each batch is materialized as a float64 matrix once (the rotation,
    when present, is one extra batch×dim×dim matmul per tier)."""
    specs = {}
    for name, (cb, rot) in tiers.items():
        m, k, sub = cb.shape
        if k > 128:
            raise ValueError(
                f"pq_codes_multi_col[{name}]: k={k} exceeds tinyint range"
            )
        specs[name] = (cb.copy(), None if rot is None else rot.copy())
    ret = ", ".join(f"{n}: array<tinyint>" for n in specs)

    @pandas_udf(f"struct<{ret}>")
    def encode(vecs: pd.Series) -> pd.DataFrame:
        X0 = np.array(vecs.tolist(), dtype="float64")
        out = {}
        for name, (C, R) in specs.items():
            X = X0 if R is None else X0 @ R
            m, k, sub = C.shape
            codes = np.empty((len(X), m), dtype="int8")
            for j in range(m):
                Xj = X[:, j * sub : (j + 1) * sub]
                d = (
                    (Xj * Xj).sum(axis=1, keepdims=True)
                    - 2.0 * (Xj @ C[j].T)
                    + (C[j] * C[j]).sum(axis=1)[None, :]
                )
                codes[:, j] = np.argmin(d, axis=1).astype("int8")
            out[name] = list(codes)
        return pd.DataFrame(out)

    col = vec_col if not isinstance(vec_col, str) else F.col(vec_col)
    return encode(col)


def adc_cosine_multi_col(va_col, tiers: dict):
    """Asymmetric-distance cosine for SEVERAL code tiers in ONE
    Arrow-batched pass — ``tiers`` maps a field name to ``(codes_col,
    codebooks, rotation | None)``; returns a struct column with one
    rounded double field per tier. The full-precision query side (the
    expensive Arrow payload — dim float64s per pair) ships ONCE for all
    tiers instead of once per tier; per tier the batch pays one rotation
    matmul (when present), one gather-reconstruct, and one rowwise dot,
    exactly :func:`adc_cosine_col`'s arithmetic (same 6-dp round)."""
    names = list(tiers)
    specs = {
        n: (cb.copy(), None if rot is None else rot.copy())
        for n, (_c, cb, rot) in tiers.items()
    }
    ret = ", ".join(f"{n}: double" for n in names)

    @pandas_udf(f"struct<{ret}>")
    def adc(va: pd.Series, *codes: pd.Series) -> pd.DataFrame:
        A0 = np.array(va.tolist(), dtype="float64")
        na0 = np.linalg.norm(A0, axis=1)
        out = {}
        for n, cs in zip(names, codes):
            C, Rm = specs[n]
            m = C.shape[0]
            A = A0 if Rm is None else A0 @ Rm
            Cd = np.array(cs.tolist(), dtype="int64")
            R = np.concatenate([C[j][Cd[:, j]] for j in range(m)], axis=1)
            num = (A * R).sum(axis=1)
            # orthogonal rotation preserves the query norm — reuse it
            den = na0 * np.linalg.norm(R, axis=1) + 1e-12
            out[n] = np.round(num / den, 6)
        return pd.DataFrame(out)

    a = va_col if not isinstance(va_col, str) else F.col(va_col)
    code_cols = [
        c if not isinstance(c, str) else F.col(c)
        for c, _cb, _r in tiers.values()
    ]
    return adc(a, *code_cols)
