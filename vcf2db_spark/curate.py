"""Composed training-data curation pipeline (SURVEY.md §2C C1-C5 as one
dataflow) — the end-to-end shape a 100 TB corpus pass actually runs:

    score → filter → exact-dedup → near-dedup (MinHash-LSH) → report

Every stage is an existing operator; this module is the composition plus
the bookkeeping a production pass needs (per-stage drop counts, a
provenance column saying why each surviving row survived its cluster).

Scale shape: stages 1-2 are narrow (scan-local); stage 3 shuffles once on
the fingerprint; stage 4 shuffles the LSH band buckets and then
broadcast-joins the (small) drop-list back; nothing materializes an
all-pairs product. The whole pipeline is one lazy plan — Catalyst fuses
the narrow stages into the scans on either side of the two shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vcf2db_spark.functions.text import doc_fingerprint, lang_id, quality_score
from vcf2db_spark.operators.dedup import minhash_lsh_candidates

# Persisted intermediates from the most recent lazy (non-report) curate
# call. The persist must outlive this function (the caller hasn't run the
# plan yet), but repeated calls in one session — the driver's multi-query
# sweep — must not accumulate cached stages in executor memory: each call
# releases the previous call's cache, and ``release_curate_cache()`` lets
# a caller drop the last one explicitly.
from vcf2db_spark.lifecycle import Lifecycle

_CURATE_LC = Lifecycle()


def release_curate_cache() -> None:
    """Unpersist intermediates cached by earlier ``curate_documents`` calls."""
    _CURATE_LC.release()


@dataclass
class CurationReport:
    """Row counts after each stage (exact, computed from one cached pass)."""

    n_input: int
    n_after_quality: int
    n_after_exact: int
    n_after_neardup: int
    curated: DataFrame


def curate_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    languages: tuple[str, ...] | None = None,
    lsh_threshold: float = 0.8,
    n_hashes: int = 64,
    bands: int = 16,
    report: bool = False,
) -> DataFrame | CurationReport:
    """Curate a document table for training: quality/language filter,
    exact dedup (rolling-hash fingerprint, keep the smallest id), then
    near-dup removal (MinHash-LSH candidates at ``lsh_threshold``
    estimated Jaccard; within each candidate pair the larger id drops).

    Deterministic end to end: fixed hash seeds, id-based tie-breaks.
    ``report=True`` additionally reports per-stage counts via
    ``DataFrame.observe`` — the metrics ride the plan and are all
    collected by the ONE action that materializes the curated result
    (previously: one extra count() action per stage)."""
    from pyspark.sql import Observation

    obs_in = obs_q = obs_ex = None
    if report:
        obs_in, obs_q, obs_ex = (
            Observation("curate_input"),
            Observation("curate_quality"),
            Observation("curate_exact"),
        )
        docs = docs.observe(obs_in, F.count(F.lit(1)).alias("n"))
    # NOTE: swapping lang_id for the exploded lang_id_table join here
    # measured net-NEUTRAL-to-worse (the doc-id join re-shapes the cached
    # stage); the expression form stays. The table form wins when lang is
    # the only thing computed (see the lang_id DQ).
    scored = docs.withColumns(
        {
            "quality": quality_score(text_col),
            "lang_pred": lang_id(text_col),
            "fingerprint": doc_fingerprint(text_col),
        }
    )
    kept = scored.filter(F.col("quality") >= min_quality)
    if languages is not None:
        kept = kept.filter(F.col("lang_pred").isin(*languages))
    if report:
        kept = kept.observe(obs_q, F.count(F.lit(1)).alias("n"))

    # exact dedup: keep the smallest id per fingerprint. A window filter
    # (min over the fingerprint partition) does it in ONE hash exchange of
    # the scored rows; the groupBy+join-back alternative evaluates the
    # scoring subtree twice and shuffles both sides.
    from pyspark.sql import Window

    w_fp = Window.partitionBy("fingerprint")
    exact = (
        kept.withColumn("_keep_id", F.min(id_col).over(w_fp))
        .filter(F.col(id_col) == F.col("_keep_id"))
        .drop("_keep_id")
    )
    # the survivors feed BOTH the LSH candidate pass and the final
    # anti-join probe — persist so the quality/lang/fingerprint scoring
    # runs once (at 100 TB this is the stage boundary you'd materialize
    # to storage anyway). Previous calls' caches are released first so
    # repeated invocations hold at most one cached stage.
    if report:
        exact = exact.observe(obs_ex, F.count(F.lit(1)).alias("n"))
    release_curate_cache()
    exact = exact.persist()

    # near-dup: LSH candidates above threshold; larger id of each pair drops
    cands = minhash_lsh_candidates(
        exact, text_col=text_col, id_col=id_col, n_hashes=n_hashes, bands=bands
    ).filter(F.col("est_jaccard") >= lsh_threshold)
    drops = cands.select(F.col("id_b").alias(id_col)).distinct()
    curated = exact.join(drops, id_col, "left_anti")

    if not report:
        _CURATE_LC.hold_df(exact)
        return curated
    # ONE action: materializing the curated count executes the whole
    # pipeline exactly once (exact's persist de-dups the two consumers of
    # the scored subtree), and every stage observation fills as its plan
    # node streams through — no per-stage re-execution.
    n_curated = curated.count()
    out = CurationReport(
        n_input=int(obs_in.get["n"]),
        n_after_quality=int(obs_q.get["n"]),
        n_after_exact=int(obs_ex.get["n"]),
        n_after_neardup=n_curated,
        curated=curated,
    )
    # the count above materialized everything; the cache has served its
    # purpose and a re-execution of ``curated`` simply recomputes the plan
    exact.unpersist()
    return out
