"""Composed curation pipeline (vcf2db_spark/curate.py): stage semantics
on a hand-built corpus with known dups, plus fixture-scale smoke."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vcf2db_spark.curate import curate_documents
from vcf2db_spark.io import table


@pytest.fixture(scope="module")
def corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and then "
        "the dog sleeps in the warm sun for a while longer"
    )
    near = base.replace("warm sun", "bright sun")  # near-dup of base
    rows = [
        (1, base, "en"),
        (2, base, "en"),            # exact dup of 1 → drops
        (3, near, "en"),            # near-dup of 1 → drops via LSH
        (4, "completely different words about spark query engines "
            "and the analytics they make possible for everyone", "en"),
        (5, "zz qq xx", "en"),      # low quality → drops at stage 1
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_stagewise_semantics(spark, corpus):
    rep = curate_documents(corpus, min_quality=0.5, lsh_threshold=0.7, report=True)
    assert rep.n_input == 5
    assert rep.n_after_quality == 4          # doc 5 fails quality
    assert rep.n_after_exact == 3            # doc 2 exact-dups doc 1
    assert rep.n_after_neardup == 2          # doc 3 near-dups doc 1
    ids = sorted(r["doc_id"] for r in rep.curated.select("doc_id").collect())
    assert ids == [1, 4]                     # smallest id survives each cluster
    cols = set(rep.curated.columns)
    assert {"quality", "lang_pred", "fingerprint"} <= cols


def test_deterministic_and_lazy(spark, corpus):
    a = sorted(r["doc_id"] for r in curate_documents(corpus, lsh_threshold=0.7).collect())
    b = sorted(r["doc_id"] for r in curate_documents(corpus, lsh_threshold=0.7).collect())
    assert a == b == [1, 4]


def test_fixture_scale_smoke(spark, sf_dir):
    """documents fixture: pipeline runs, keeps a sane fraction, never
    increases row count at any stage."""
    docs = table(spark, sf_dir, "documents")
    rep = curate_documents(docs, min_quality=0.0, lsh_threshold=0.9, report=True)
    assert rep.n_input >= rep.n_after_quality >= rep.n_after_exact >= rep.n_after_neardup
    assert rep.n_after_neardup > 0
    # all surviving ids exist in the input
    surviving = rep.curated.select("doc_id")
    assert surviving.join(docs, "doc_id", "left_anti").count() == 0


def test_curate_cache_released_across_calls(spark, sf_dir):
    """Repeated lazy curate calls must not accumulate persisted stages
    (the driver's multi-query sweep calls curate_docs several times per
    session): each call releases the previous call's cache, and
    release_curate_cache() drops the last one."""
    from vcf2db_spark import curate as C

    def n_cached():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    docs = table(spark, sf_dir, "documents").limit(200)
    base = n_cached()  # other suites may hold their own caches
    a = C.curate_documents(docs)
    a.count()
    assert len(C._CURATE_LC._held) == 1
    b = C.curate_documents(docs)
    b.count()
    assert len(C._CURATE_LC._held) == 1  # previous cache was released
    C.release_curate_cache()
    assert not C._CURATE_LC._held
    assert n_cached() <= base

    # report path: all counts materialized inside the call → nothing stays
    rep = C.curate_documents(docs, report=True)
    assert rep.n_input == 200
    assert n_cached() <= base
