"""Gemini-style query surface goldens over the mini VCF fixture
(SURVEY.md §3 entry point 3). Expected sets hand-computed from
tests/fixtures/make_mini_vcf.py BODY:

  pos   NA001  NA002  NA003     gt_types (cyvcf2 0/1/2/3)   gt_depths
  100   0/1    0/0    1|1       1, 0, 3                     10, 12, 8
  200   0/0    ./.    0/1       0, 2, 1                      7, ., 9
  300   1/1    0/1    0/1       3, 1, 1                     14, 11, 12
  400   0/0    0/1    0/0       0, 1, 0                      6,  5, 7
  150   0/1    1/1    0/0       1, 3, 0  (chr2)              9, 10, 8
  250   0/1    0/0    ./1       1, 0, 2  (chr2)              5,  6, 4

PED: NA001 phenotype=2 (affected), NA002 phenotype=1, NA003 phenotype=-9.
"""

from __future__ import annotations

import pytest

from vcf2db_spark.gemini import GeminiEngine
from vcf2db_spark.pipeline import load_vcf
from tests.fixtures.make_mini_vcf import write_fixture


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    vcf, ped = write_fixture(str(tmp_path_factory.mktemp("gemini_vcf")))
    tables = load_vcf(spark, vcf, ped_path=ped)
    return GeminiEngine(spark, tables)


def _positions(df):
    return sorted((r["chrom"], r["start"]) for r in df.select("chrom", "start").collect())


def test_plain_sql(engine):
    df = engine.query(
        "SELECT v.chrom, v.start, i.gene FROM variants v "
        "JOIN variant_impacts i ON v.variant_id = i.variant_id "
        "WHERE i.impact_severity = 'HIGH'"
    )
    genes = {r["gene"] for r in df.collect()}
    assert genes == {"BRCA2", "MLH1"}  # frameshift @300, stop_gained @chr2:150


def test_gt_sample_access(engine):
    df = engine.query("SELECT chrom, start FROM variants", gt_filter="gt_types.NA001 == HET")
    assert _positions(df) == [("chr1", 99), ("chr2", 149), ("chr2", 249)]


def test_gt_filter_combines_with_sql_where(engine):
    # PASS is stored as NULL filter (gemini convention, vcf.py:167)
    df = engine.query(
        "SELECT chrom, start FROM variants WHERE filter IS NULL",
        gt_filter="gt_types.NA001 == HET and gt_depths.NA001 >= 9",
    )
    # HET for NA001 at 100/150/250; depth>=9 keeps 100 (10) and 150 (9);
    # 250 fails both depth (5) and PASS (lowq); all remaining are PASS.
    assert _positions(df) == [("chr1", 99), ("chr2", 149)]


def test_wildcard_affected_all_het(engine):
    # affected samples (phenotype==2) = NA001 only
    df = engine.query(
        "SELECT chrom, start FROM variants",
        gt_filter="(gt_types).(phenotype==2).(==HET).(all)",
    )
    assert _positions(df) == [("chr1", 99), ("chr2", 149), ("chr2", 249)]


def test_wildcard_any_vs_none(engine):
    hom_alt_any = engine.query(
        "SELECT chrom, start FROM variants",
        gt_filter="(gt_types).(*).(==HOM_ALT).(any)",
    )
    assert _positions(hom_alt_any) == [("chr1", 99), ("chr1", 299), ("chr2", 149)]
    hom_alt_none = engine.query(
        "SELECT chrom, start FROM variants",
        gt_filter="(gt_types).(*).(==HOM_ALT).(none)",
    )
    assert _positions(hom_alt_none) == [("chr1", 199), ("chr1", 399), ("chr2", 249)]


def test_wildcard_count(engine):
    df = engine.query(
        "SELECT chrom, start FROM variants",
        gt_filter="(gt_depths).(*).(>=10).(count>=2)",
    )
    assert _positions(df) == [("chr1", 99), ("chr1", 299)]


def test_missing_genotype_is_never_true(engine):
    # NA002 at 200 is ./. (UNKNOWN, NULL depth): must not satisfy >=0
    df = engine.query(
        "SELECT chrom, start FROM variants",
        gt_filter="(gt_depths).(name == 'NA002').(>= 0).(all)",
    )
    assert ("chr1", 199) not in _positions(df)


def test_unknown_sample_raises(engine):
    with pytest.raises(KeyError, match="NA999"):
        engine.query("SELECT * FROM variants", gt_filter="gt_types.NA999 == HET")


def test_region(engine):
    assert _positions(engine.region("chr1", 0, 250)) == [("chr1", 99), ("chr1", 199)]


def test_compiled_filter_is_catalyst_only(engine):
    """The gt-filter must compile to element_at expressions (no UDF, no
    explode) so it rides the scan pipeline — docs/SCALE.md §1."""
    sql = engine.compile_gt_filter("(gt_types).(phenotype==2).(==HET).(all)")
    assert "element_at(gt_types, 1)" in sql
    df = engine.query("SELECT chrom, start FROM variants", gt_filter="gt_types.NA001 == HET")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Generate" not in plan


def test_inheritance_via_engine(engine):
    inh = engine.inheritance()
    # mini fixture has no complete affected-child trio (NA002 unaffected),
    # so models run and return empty — the wiring is what's under test
    assert inh.de_novo().count() == 0
    assert inh.trios and inh.trios[0].child == "NA002"


def test_model_scan_rows_share_one_artifact_build(spark, sf_dir, monkeypatch):
    """The default-genotype gemini rows — gtfilter, denovo, comp_hets,
    autorec, mendelviol (and the other six shared-scan rows) — share ONE
    artifact build per (process, sf_dir): gemini's load-once-query-many
    pattern (r9 consolidation; r10 folded comp_hets in via the k%3==0
    decoupled-phased-parent subset). Only the chrX cohort may build
    privately — 2 builds per (process, sf_dir) total."""
    from vcf2db_spark.queries import gemini_dq as G

    calls: list[str] = []
    real = G._build_engine

    def counting(spark_, sf_dir_, lc, *args, **kwargs):
        calls.append(sf_dir_)
        return real(spark_, sf_dir_, lc, *args, **kwargs)

    monkeypatch.setattr(G, "_build_engine", counting)
    G._SH_ENGINES.clear()
    assert G.gemini_gtfilter(spark, sf_dir).count() > 0
    assert G.gemini_denovo(spark, sf_dir).count() > 0
    assert G.gemini_autorec(spark, sf_dir).count() > 0
    assert G.gemini_mendelviol(spark, sf_dir).count() > 0
    assert G.gemini_comphet(spark, sf_dir).count() >= 0  # shared, no build
    assert calls == [sf_dir], "shared-scan rows must reuse ONE build"
    G._SH_ENGINES.clear()  # leave no cross-test cached engine behind
