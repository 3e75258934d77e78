"""Training-export query tier: the operations that turn a curated corpus
into model-ready input at 100 TB (SURVEY.md §2C extension — companions to
the dedup/quality/contamination families in queries/pipeline_ext.py).

All queries here are oracle-backed: shuffle/split/sample keys are an
explicit Knuth multiplicative hash (both engines compute the identical
BIGINT arithmetic — no engine-specific hash functions), packing is
integer cumulative sums, the weighted sampler's inclusion test is a
cross-multiplied BIGINT comparison, and mixing weights / token shares
are single-division doubles over exact integer totals.

Scale notes: nothing here uses a global (single-partition) window — the
shuffle positions and packing offsets are windowed WITHIN a shard/source
partition, which is exactly how a 1000-executor export writes shards. A
pathologically skewed source in ``seq_pack`` would route through the
two-phase range-partitioned ranking in operators/ranking.py (same
rewrite as win_ntile_dense).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from vcf2db_spark.io import table, table_wide
from vcf2db_spark.registry import dq

# Knuth multiplicative hash constant (2^32 / phi). The product is
# computed in SPLIT modular form — (id%2^32) decomposed into 16-bit
# halves, each multiplied and reduced mod 2^32 separately — because the
# naive `id * 2654435761` overflows BIGINT (and raises under ANSI mode)
# for id > 2^63/K ≈ 3.4e9, squarely inside the multi-billion-row corpora
# the export tier targets. The split form is ≡ (K·id) mod 2^32 for every
# id (modular arithmetic identity), never exceeds ~2^49 in any
# intermediate, and is expressed with the same integer ops in both
# engines so hash values stay bitwise identical.
_KNUTH = 2654435761
_MOD = 4294967296
N_SHARDS = 8
SEQ_LEN = 2048


def knuth_hash_sql(col: str, idiv: str) -> str:
    """(K·col) mod 2^32, overflow-safe; ``idiv`` is the engine's integer
    division operator ('DIV' for Spark SQL, '//' for DuckDB)."""
    e = f"(({col}) % {_MOD})"
    return (
        f"((({e} {idiv} 65536) * {_KNUTH} % {_MOD}) * 65536"
        f" + ({e} % 65536) * {_KNUTH}) % {_MOD}"
    )


@dq(
    "shuffle_export",
    oracle=f"""
    WITH h AS (SELECT doc_id,
                      {knuth_hash_sql('doc_id', '//')} AS hkey
               FROM documents)
    SELECT doc_id, hkey % {N_SHARDS} AS shard,
           ROW_NUMBER() OVER (PARTITION BY hkey % {N_SHARDS}
                              ORDER BY hkey, doc_id) - 1 AS pos
    FROM h
    """,
)
def shuffle_export(spark, sf_dir):
    """Deterministic global shuffle for training export: a Knuth
    multiplicative hash gives every document a pseudo-random sort key,
    shard = hkey mod N (hash-balanced, no global coordination), position
    = rank within shard. One shuffle on the shard key; each shard's
    window sorts independently — the exact layout a distributed
    shard-writer needs, with zero single-partition stages."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    h = d.withColumn("hkey", F.expr(knuth_hash_sql("doc_id", "DIV")))
    w = Window.partitionBy(F.col("hkey") % N_SHARDS).orderBy("hkey", "doc_id")
    return h.select(
        "doc_id",
        (F.col("hkey") % N_SHARDS).alias("shard"),
        (F.row_number().over(w) - 1).alias("pos"),
    )


@dq(
    "seq_pack",
    oracle=f"""
    WITH t AS (SELECT doc_id, source,
                      len(string_split_regex(text, '\\s+')) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
                 CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS cum
          FROM t)
    SELECT doc_id, source, n_tokens,
           (cum - n_tokens) // {SEQ_LEN} AS seq_id,
           (cum - n_tokens) % {SEQ_LEN} AS seq_offset
    FROM c
    """,
)
def seq_pack(spark, sf_dir):
    """GPT-style sequence packing (concat-then-chop): documents are laid
    head-to-tail per source in doc_id order; each document's starting
    token offset is the running sum of its predecessors, so seq_id =
    start // SEQ_LEN and seq_offset = start % SEQ_LEN. Integer cumulative
    sums — exact in both engines. The window is partitioned by source
    (per-shard packing), not global."""
    d = table_wide(spark, sf_dir, "documents", "doc_id")
    t = d.select(
        "doc_id", "source", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    # seq_id via SQL `DIV` (exact BIGINT division, matching the oracle's
    # `//`) — F.floor(start / N) would route through an IEEE double and
    # lose integer exactness once a source's running token count passes
    # 2^53, silently disagreeing with the modulo column.
    return t.withColumn("_start", start).select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"_start DIV {SEQ_LEN}").alias("seq_id"),
        (F.col("_start") % SEQ_LEN).alias("seq_offset"),
    )


@dq(
    "split_leakage",
    oracle=f"""
    WITH g AS (
      SELECT source, CAST(MIN(doc_id) AS BIGINT) AS gid
      FROM documents GROUP BY source
    ),
    a AS (
      SELECT d.doc_id, d.source,
             CAST(len(string_split_regex(trim(d.text), '\\s+')) AS BIGINT)
               AS nt,
             CASE WHEN ({knuth_hash_sql('g.gid', '//')}) % 100 < 90
                  THEN 'train' ELSE 'val' END AS split
      FROM documents d JOIN g ON d.source = g.source
    ),
    leak AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS leak_groups FROM (
        SELECT source FROM a GROUP BY source
        HAVING COUNT(DISTINCT split) > 1
      )
    ),
    s AS (
      SELECT split, CAST(COUNT(DISTINCT source) AS BIGINT) AS n_groups,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(nt) AS BIGINT) AS n_tokens
      FROM a GROUP BY split
    ),
    t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM s)
    SELECT s.split, s.n_groups, s.n_docs, s.n_tokens,
           CAST(s.n_tokens AS DOUBLE) / t.tot AS token_share,
           leak.leak_groups
    FROM s, t, leak
    """,
)
def split_leakage(spark, sf_dir):
    """Group-aware train/val split with a leakage audit — the standard
    pre-training split-correctness check. The GROUP (here: source; in
    production, author/site/user) is assigned wholesale to one split by
    Knuth-hashing a canonical group id (its MIN doc_id — stable, both
    engines compute it identically), so correlated documents can never
    straddle the boundary. The audit does NOT trust the construction:
    ``leak_groups`` recounts, from the assignment relation itself, the
    groups observed in more than one split (must be 0). Per-split token
    shares are exact integer totals with one final IEEE division.
    Shuffles: the group-id aggregate and the per-split rollup; the group
    table and the two scalar relations ride broadcasts."""
    d = table_wide(spark, sf_dir, "documents", "doc_id")
    g = d.groupBy("source").agg(F.min("doc_id").cast("bigint").alias("gid"))
    a = d.join(F.broadcast(g), "source").select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("nt"),
        F.when(
            F.expr(knuth_hash_sql("gid", "DIV")) % 100 < 90, F.lit("train")
        )
        .otherwise(F.lit("val"))
        .alias("split"),
    )
    leak = (
        a.groupBy("source")
        .agg(F.countDistinct("split").alias("_ns"))
        .filter(F.col("_ns") > 1)
        .agg(F.count(F.lit(1)).alias("leak_groups"))
    )
    s = a.groupBy("split").agg(
        F.countDistinct("source").alias("n_groups"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
    )
    t = s.agg(F.sum("n_tokens").alias("tot"))
    return (
        s.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(leak))
        .select(
            "split",
            "n_groups",
            "n_docs",
            "n_tokens",
            (F.col("n_tokens").cast("double") / F.col("tot")).alias("token_share"),
            "leak_groups",
        )
    )


@dq(
    "mix_weights",
    oracle="""
    WITH g AS (SELECT source, lang, COUNT(*) AS n_docs,
                      CAST(SUM(len(string_split_regex(text, '\\s+')))
                           AS BIGINT) AS n_tokens
               FROM documents GROUP BY source, lang),
    t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
                 COUNT(*) AS n_groups FROM g)
    SELECT source, lang, n_docs, n_tokens,
           CAST(tot AS DOUBLE) / (n_groups * n_tokens) AS weight
    FROM g, t
    """,
)
def mix_weights(spark, sf_dir):
    """Domain-mixing sampling weights: per (source, lang) bucket, the
    multiplier that re-weights its natural token share to a uniform
    target mix (weight = total/(n_groups·bucket)). Exact integer token
    totals; the single double division is identical IEEE in both
    engines. The corpus-wide total is a 1-row broadcast — the same
    scalar-subquery shape as tpch_q11."""
    d = table_wide(spark, sf_dir, "documents", "doc_id")
    g = (
        d.select("source", "lang", F.size(F.split("text", r"\s+")).alias("nt"))
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("nt").alias("n_tokens"))
    )
    t = g.agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n_groups")
    )
    return g.join(F.broadcast(t)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("tot").cast("double") / (F.col("n_groups") * F.col("n_tokens"))).alias(
            "weight"
        ),
    )


@dq(
    "sample_weighted",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, n_chars,
             {knuth_hash_sql('doc_id', '//')} AS hkey
      FROM documents
    ),
    t AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS tot FROM h)
    SELECT doc_id, n_chars, hkey
    FROM h, t
    WHERE hkey * t.tot < n_chars * CAST(100 AS BIGINT) * 4294967296
    """,
)
def sample_weighted(spark, sf_dir):
    """Weighted Poisson sampling with EXACT integer arithmetic: include
    document i iff hash(i)/2^32 < k·wᵢ/Σw (expected sample size k=100,
    inclusion probability ∝ weight — here n_chars, i.e. longer docs are
    proportionally likelier, the standard token-budget-aware corpus
    draw). The comparison is cross-multiplied into pure BIGINT
    (hash·Σw < wᵢ·k·2^32 — no division, no floats, no ln), so both
    engines select the identical set; the Σw total rides a 1-row
    broadcast. Map-only over the corpus: every executor decides its own
    rows — the distributed weighted sampler with zero coordination.
    Overflow: hash < 2^32 and Σw < 2^31 keeps the left product < 2^63
    (document the rescale-to-per-million-weights step past that)."""
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = d.withColumn("hkey", F.expr(knuth_hash_sql("doc_id", "DIV")))
    t = h.agg(F.sum("n_chars").cast("bigint").alias("tot"))
    return (
        h.crossJoin(F.broadcast(t))
        .filter(
            F.col("hkey") * F.col("tot")
            < F.col("n_chars") * F.lit(100) * F.lit(4294967296)
        )
        .select("doc_id", "n_chars", "hkey")
    )


# --------------------------------------------------------------------------
# Training-prep: hash-stratified k-fold assignment audit. Folds come from
# the deterministic Knuth multiplicative hash (not row_number over a
# per-class window — a single window partition per class would serialize
# the largest class at 100 TB; the hash is map-only, exactly reproducible
# across engines, and balanced in expectation within every class). The
# declared output is the (class, fold) audit grid a pipeline gates on:
# counts, char mass, and each fold's deviation from the per-class mean.
# --------------------------------------------------------------------------

_K_FOLDS = 5


@dq(
    "kfold_stratified",
    oracle=f"""
    WITH h AS (
      SELECT lang, n_chars,
             ({knuth_hash_sql('doc_id', '//')}) % {_K_FOLDS} AS fold
      FROM documents
    ),
    g AS (
      SELECT lang, fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM h GROUP BY 1, 2
    )
    SELECT lang, fold, n_docs, sum_chars,
           (ROUND(CAST(n_docs AS DOUBLE)
              / (CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE)
                 / {_K_FOLDS}.0) - 1.0, 6) + 0.0) AS balance_dev
    FROM g
    """,
)
def kfold_stratified(spark, sf_dir):
    """K-fold split audit: fold = knuth_hash(doc_id) % k (map-only, no
    shuffle until the audit aggregate), then per-(class, fold) counts,
    char mass, and relative deviation from the class's ideal fold size.
    The window runs over the k-row-per-class AUDIT grid, not the corpus,
    so partitions stay tiny at any scale."""
    from pyspark.sql import Window

    from vcf2db_spark.registry import z6

    d = table(spark, sf_dir, "documents").select(
        "lang",
        "n_chars",
        (F.expr(knuth_hash_sql("doc_id", "DIV")) % _K_FOLDS).alias("fold"),
    )
    g = d.groupBy("lang", "fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    w = Window.partitionBy("lang")
    return g.select(
        "lang",
        "fold",
        "n_docs",
        "sum_chars",
        z6(
            F.col("n_docs").cast("double")
            / (F.sum("n_docs").over(w).cast("double") / float(_K_FOLDS))
            - 1.0
        ).alias("balance_dev"),
    )
