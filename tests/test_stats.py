"""Cohort stats / ROH / burden goldens (gemini stats|roh|burden parity)
on a hand-built two-sample VCF with known runs and known substitutions.

Fixture design (gt order: S1, S2), chr1 positions:
  100..105  six consecutive sites: S1 hom (0/0 or 1/1) at all six,
            S2 het at 102 → S2's run breaks into 2+3
  200       S1 het — terminates S1's run at 6 snps
  300..302  S1 uncalled (./.) — unknowns; S2 hom
Substitutions: A>G ×4 + C>T ×2 (ts); A>C ×2, G>T ×1, C>A ×1 (tv).
"""

from __future__ import annotations

import pytest

from vcf2db_spark.pipeline import load_vcf
from vcf2db_spark.stats import (
    burden,
    gt_long,
    roh,
    roh_tolerant,
    site_frequency_spectrum,
    snp_counts,
    tstv,
)

VCF = """\
##fileformat=VCFv4.2
##contig=<ID=chr1,length=248956422>
##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
##INFO=<ID=CSQ,Number=.,Type=String,Description="Consequence annotations from VEP. Format: Allele|Consequence|SYMBOL|Feature">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2
chr1\t100\t.\tA\tG\t50\tPASS\tDP=30;CSQ=G|stop_gained|BRCA2|T1\tGT\t0/0\t1/1
chr1\t101\t.\tA\tG\t50\tPASS\tDP=30;CSQ=G|missense_variant|BRCA2|T1\tGT\t1/1\t0/0
chr1\t102\t.\tA\tG\t50\tPASS\tDP=30;CSQ=G|synonymous_variant|BRCA2|T1\tGT\t0/0\t0/1
chr1\t103\t.\tC\tT\t50\tPASS\tDP=30;CSQ=T|stop_gained|MLH1|T2\tGT\t1/1\t1/1
chr1\t104\t.\tC\tT\t50\tPASS\tDP=30\tGT\t0/0\t0/0
chr1\t105\t.\tA\tG\t50\tPASS\tDP=30\tGT\t0/0\t0/0
chr1\t200\t.\tA\tC\t50\tPASS\tDP=30;CSQ=C|missense_variant|MLH1|T2\tGT\t0/1\t0/0
chr1\t300\t.\tA\tC\t50\tPASS\tDP=30\tGT\t./.\t1/1
chr1\t301\t.\tG\tT\t50\tPASS\tDP=30\tGT\t./.\t0/0
chr1\t302\t.\tC\tA\t50\tPASS\tDP=30\tGT\t./.\t0/0
"""


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stats_vcf")
    p = str(d / "cohort.vcf")
    open(p, "w").write(VCF)
    return load_vcf(spark, p)


@pytest.fixture(scope="module")
def samples(tables):
    return tables.header.samples


# ---- gemini stats ---------------------------------------------------------


def test_tstv(tables):
    row = tstv(tables.variants).first()
    # ts: 4×A>G + 2×C>T = 6; tv: A>C ×2, G>T ×1, C>A ×1 = 4
    assert (row["n_ts"], row["n_tv"]) == (6, 4)
    assert row["tstv"] == round(6 / 4, 4)


def test_snp_counts(tables):
    got = {(r["ref"], r["alt"]): r["n"] for r in snp_counts(tables.variants).collect()}
    assert got == {("A", "G"): 4, ("C", "T"): 2, ("A", "C"): 2, ("G", "T"): 1, ("C", "A"): 1}


def test_sfs_buckets_cover_all_called(tables):
    sfs = site_frequency_spectrum(tables.variants, bins=4).collect()
    assert sum(r["n"] for r in sfs) == 10  # every site has ≥1 called gt
    assert all(0 <= r["bucket"] < 4 and r["lo"] < r["hi"] for r in sfs)
    # pos 100: gts 0/0+1/1 → aaf 0.5 lands in bucket 2 ([0.5, 0.75))
    b = {r["bucket"]: r["n"] for r in sfs}
    assert b.get(2, 0) >= 1


# ---- gemini roh -----------------------------------------------------------


def test_roh_strict_runs(tables, samples):
    runs = roh(tables.variants, samples, min_snps=3, min_size_bp=0).collect()
    got = {(r["sample"], r["run_start"], r["run_end"], r["n_snps"]) for r in runs}
    # S1: pos 100-105 all hom → one 6-snp run (start = VCF pos - 1);
    #     the het at 200 ends it and the uncalled 300-302 never restart it.
    # S2: 100-101 hom (2 snps, below min_snps), het at 102 breaks, then
    #     103..302 all called hom (200 is 0/0) → one 7-snp run.
    assert ("S1", 99, 105, 6) in got
    assert ("S2", 102, 302, 7) in got
    assert len(got) == 2


def test_roh_strict_min_size_filter(tables, samples):
    runs = roh(tables.variants, samples, min_snps=3, min_size_bp=150).collect()
    # only S2's 103..302 run spans ≥150 bp
    assert [(r["sample"], r["n_snps"]) for r in runs] == [("S2", 7)]


def test_roh_tolerant_absorbs_het(tables, samples):
    runs = roh_tolerant(
        tables.variants, samples, min_snps=4, min_size_bp=0, max_hets=1, max_unknowns=3
    ).collect()
    got = {(r["sample"], r["run_start"], r["run_end"], r["n_snps"]) for r in runs}
    # S2's het at 102 is absorbed → single 100..302 run of 9 hom sites
    assert ("S2", 99, 302, 9) in got
    # S1: het at 200 absorbed, unknowns at 300-302 within cap → 6-snp run
    assert any(s == "S1" and n == 6 for (s, _b, _e, n) in got)


def test_roh_tolerant_respects_het_cap(tables, samples):
    runs = roh_tolerant(
        tables.variants, samples, min_snps=4, min_size_bp=0, max_hets=0, max_unknowns=0
    ).collect()
    got = {(r["sample"], r["run_start"], r["run_end"], r["n_snps"]) for r in runs}
    # zero tolerance ≡ strict semantics
    assert got == {("S1", 99, 105, 6), ("S2", 102, 302, 7)}


# ---- gemini burden --------------------------------------------------------


def test_burden_counts(tables, samples):
    got = {
        (r["gene"], r["sample"]): r["n_variants"]
        for r in burden(tables.variants, tables.variant_impacts, samples).collect()
    }
    # qualifying (HIGH/MED): 100 BRCA2 stop, 101 BRCA2 missense,
    #   103 MLH1 stop, 200 MLH1 missense (102 synonymous = LOW, excluded)
    # carriers: 100→S2(1/1); 101→S1(1/1); 103→both(1/1); 200→S1(0/1)
    assert got == {
        ("BRCA2", "S1"): 1,
        ("BRCA2", "S2"): 1,
        ("MLH1", "S1"): 2,
        ("MLH1", "S2"): 1,
    }


def test_burden_wide_matrix(tables, samples):
    from vcf2db_spark.stats import burden_wide

    rows = {r["gene"]: r for r in burden_wide(
        tables.variants, tables.variant_impacts, samples
    ).collect()}
    assert set(rows) == {"BRCA2", "MLH1"}
    assert (rows["BRCA2"]["S1"], rows["BRCA2"]["S2"]) == (1, 1)
    assert (rows["MLH1"]["S1"], rows["MLH1"]["S2"]) == (2, 1)
    # a gene×sample cell with no carriers is zero-filled, never null
    high = {r["gene"]: r for r in burden_wide(
        tables.variants, tables.variant_impacts, samples, severities=("HIGH",)
    ).collect()}
    assert (high["BRCA2"]["S1"], high["BRCA2"]["S2"]) == (0, 1)


def test_burden_severity_knob(tables, samples):
    high_only = burden(
        tables.variants, tables.variant_impacts, samples, severities=("HIGH",)
    )
    got = {
        (r["gene"], r["sample"]): r["n_variants"] for r in high_only.collect()
    }
    assert got == {("BRCA2", "S2"): 1, ("MLH1", "S1"): 1, ("MLH1", "S2"): 1}


# ---- plan discipline ------------------------------------------------------


def test_strict_roh_is_catalyst_only(tables, samples):
    plan = roh(tables.variants, samples, 3, 0)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gt_long_single_explode(tables, samples):
    long = gt_long(tables.variants, samples, ["chrom", "start"])
    assert long.count() == 10 * len(samples)
    plan = long._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1
