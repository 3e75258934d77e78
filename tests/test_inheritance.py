"""Inheritance-model goldens on a hand-built trio (gemini tool parity).

Trio: CHILD (affected) with FATHER (affected) and MOTHER (unaffected).
Variant design (gt order: CHILD, FATHER, MOTHER):
  pos 100  C=0/1 F=0/0 M=0/0  → de_novo only
  pos 200  C=1/1 F=0/1 M=0/1  → autosomal_recessive only
  pos 300  C=0/1 F=0/1 M=0/0  → autosomal_dominant only (father affected)
  pos 400  C=0/0 F=0/0 M=0/0  → nothing
  pos 500  C=0/1 F=0/0 M=0/1  → nothing (het parent is unaffected; not de novo)
"""

from __future__ import annotations

import pytest

from vcf2db_spark.inheritance import InheritanceEngine
from vcf2db_spark.pipeline import load_vcf

VCF = """\
##fileformat=VCFv4.2
##contig=<ID=chr1,length=248956422>
##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tCHILD\tFATHER\tMOTHER
chr1\t100\t.\tA\tG\t50.0\tPASS\tDP=30\tGT\t0/1\t0/0\t0/0
chr1\t200\t.\tC\tT\t50.0\tPASS\tDP=30\tGT\t1/1\t0/1\t0/1
chr1\t300\t.\tG\tA\t50.0\tPASS\tDP=30\tGT\t0/1\t0/1\t0/0
chr1\t400\t.\tT\tC\t50.0\tPASS\tDP=30\tGT\t0/0\t0/0\t0/0
chr1\t500\t.\tA\tC\t50.0\tPASS\tDP=30\tGT\t0/1\t0/0\t0/1
"""

PED = """\
#family_id name paternal_id maternal_id sex phenotype
fam1 CHILD FATHER MOTHER 1 2
fam1 FATHER 0 0 1 2
fam1 MOTHER 0 0 2 1
"""


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("trio")
    vcf, ped = str(d / "trio.vcf"), str(d / "trio.ped")
    open(vcf, "w").write(VCF)
    open(ped, "w").write(PED)
    return InheritanceEngine(load_vcf(spark, vcf, ped_path=ped))


def _starts(df):
    return sorted(r["start"] for r in df.select("start").collect())


def test_trio_detection(engine):
    assert len(engine.trios) == 1
    t = engine.trios[0]
    assert (t.child, t.father, t.mother) == ("CHILD", "FATHER", "MOTHER")
    assert t.child_affected and t.father_affected and not t.mother_affected


def test_de_novo(engine):
    assert _starts(engine.de_novo()) == [99]


def test_autosomal_recessive(engine):
    assert _starts(engine.autosomal_recessive()) == [199]


def test_autosomal_dominant(engine):
    assert _starts(engine.autosomal_dominant()) == [299]


def test_models_are_catalyst_only(engine):
    plan = engine.de_novo()._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


# ---- compound hets ---------------------------------------------------------

VCF_CH = """\
##fileformat=VCFv4.2
##contig=<ID=chr1,length=248956422>
##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
##INFO=<ID=CSQ,Number=.,Type=String,Description="Consequence annotations from Ensembl VEP. Format: Allele|Consequence|SYMBOL|Feature|BIOTYPE|EXON|Codons|Amino_acids|Protein_position|PolyPhen|SIFT">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tCHILD\tFATHER\tMOTHER
chr1\t100\t.\tA\tG\t50.0\tPASS\tDP=30;CSQ=G|missense_variant|GENE1|T1|protein_coding||||||\tGT\t0/1\t0/1\t0/0
chr1\t200\t.\tC\tT\t50.0\tPASS\tDP=30;CSQ=T|missense_variant|GENE1|T2|protein_coding||||||\tGT\t0/1\t0/0\t0/1
chr1\t300\t.\tG\tA\t50.0\tPASS\tDP=30;CSQ=A|missense_variant|GENE2|T3|protein_coding||||||\tGT\t0/1\t0/1\t0/0
chr1\t400\t.\tT\tC\t50.0\tPASS\tDP=30;CSQ=C|missense_variant|GENE3|T4|protein_coding||||||\tGT\t0/1\t0/1\t0/1
chr1\t500\t.\tA\tG\t50.0\tPASS\tDP=30;CSQ=G|missense_variant|GENE4|T5|protein_coding||||||\tGT\t0/1\t0/1\t0/0
chr1\t600\t.\tC\tT\t50.0\tPASS\tDP=30;CSQ=T|missense_variant|GENE4|T6|protein_coding||||||\tGT\t0/1\t0/1\t0/0
chr1\t700\t.\tG\tA\t50.0\tPASS\tDP=30;CSQ=A|missense_variant|GENE5|T7|protein_coding||||||\tGT\t0/1\t0/0\t0/0
chr1\t800\t.\tT\tC\t50.0\tPASS\tDP=30;CSQ=C|missense_variant|GENE5|T8|protein_coding||||||\tGT\t0/1\t0/1\t0/1
"""


@pytest.fixture(scope="module")
def ch_engine(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("trio_ch")
    vcf, ped = str(d / "ch.vcf"), str(d / "ch.ped")
    open(vcf, "w").write(VCF_CH)
    open(ped, "w").write(PED)
    return InheritanceEngine(load_vcf(spark, vcf, ped_path=ped))


def test_compound_hets(ch_engine):
    """GENE1 has a paternal-origin HET (pos 100) and a maternal-origin HET
    (pos 200) → exactly one pair. GENE2 has only paternal; GENE3's site is
    ambiguous (both parents HET) → excluded. GENE4's two sites are both
    paternal (no maternal partner); GENE5's sites have no resolvable
    origin (de novo shape / both-parents-HET) → all excluded in strict
    mode."""
    rows = ch_engine.compound_hets().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["child"] == "CHILD" and r["gene"] == "GENE1"
    assert r["paternal_variant_id"] != r["maternal_variant_id"]


def test_compound_hets_pattern_only(ch_engine):
    """--pattern-only keeps GENE1 (opposite single-parent carriers) and
    GENE5 (700 is carried by neither parent, 800 by both — no single
    parent carries both), but drops GENE4 where dad carries both sites
    (possible cis pair)."""
    rows = ch_engine.compound_hets(pattern_only=True).collect()
    got = {(r["child"], r["gene"]) for r in rows}
    assert got == {("CHILD", "GENE1"), ("CHILD", "GENE5")}
    assert all(r["variant_id_1"] < r["variant_id_2"] for r in rows)


# ---- X-linked models -------------------------------------------------------

# Affected SON (sex=1) with unaffected carrier MOM and unaffected DAD.
# chrX design (gt order: SON, DAD, MOM):
#   pos 100  S=0/1 D=0/0 M=0/1  → x_linked_recessive (carrier mom, clear dad)
#   pos 200  S=1/1 D=0/0 M=0/1  → x_linked_recessive (hemizygous coded 1/1)
#   pos 300  S=0/1 D=0/0 M=0/0  → x_linked_de_novo only
#   pos 400  S=0/1 D=0/1 M=0/1  → neither (dad carries → not strict xrec)
# chr1 row with the xrec genotype shape → excluded by the chrom filter.
VCF_X = """\
##fileformat=VCFv4.2
##contig=<ID=chrX,length=156040895>
##contig=<ID=chr1,length=248956422>
##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSON\tDAD\tMOM
chrX\t100\t.\tA\tG\t50.0\tPASS\tDP=30\tGT\t0/1\t0/0\t0/1
chrX\t200\t.\tC\tT\t50.0\tPASS\tDP=30\tGT\t1/1\t0/0\t0/1
chrX\t300\t.\tG\tA\t50.0\tPASS\tDP=30\tGT\t0/1\t0/0\t0/0
chrX\t400\t.\tT\tC\t50.0\tPASS\tDP=30\tGT\t0/1\t0/1\t0/1
chr1\t500\t.\tA\tC\t50.0\tPASS\tDP=30\tGT\t0/1\t0/0\t0/1
"""

PED_X = """\
#family_id name paternal_id maternal_id sex phenotype
fam1 SON DAD MOM 1 2
fam1 DAD 0 0 1 1
fam1 MOM 0 0 2 1
"""


@pytest.fixture(scope="module")
def x_engine(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("trio_x")
    vcf, ped = str(d / "x.vcf"), str(d / "x.ped")
    open(vcf, "w").write(VCF_X)
    open(ped, "w").write(PED_X)
    return InheritanceEngine(load_vcf(spark, vcf, ped_path=ped))


def test_trio_sex(x_engine):
    assert x_engine.trios[0].child_sex == 1


def test_x_linked_recessive(x_engine):
    assert _starts(x_engine.x_linked_recessive()) == [99, 199]


def test_x_linked_de_novo(x_engine):
    assert _starts(x_engine.x_linked_de_novo()) == [299]


def test_x_linked_dominant_requires_affected_parent(x_engine):
    # no affected parent in this pedigree → empty
    assert _starts(x_engine.x_linked_dominant()) == []


def test_x_chrom_filter_excludes_autosomes(x_engine):
    chroms = {r["chrom"] for r in x_engine.x_linked_recessive().collect()}
    assert chroms <= {"chrX"}


def test_x_models_are_catalyst_only(x_engine):
    plan = x_engine.x_linked_recessive()._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


# ---- mendel_errors ---------------------------------------------------------

# Reuses the autosomal trio fixture file shapes; dedicated VCF covering all
# four gemini error categories (gt order: CHILD, FATHER, MOTHER):
#   pos 100  C=0/1 F=0/0 M=0/0  → plausible de novo
#   pos 200  C=1/1 F=0/0 M=0/0  → implausible de novo
#   pos 300  C=0/0 F=0/0 M=1/1  → uniparental disomy
#   pos 400  C=1/1 F=0/1 M=0/0  → loss of heterozygosity
#   pos 500  C=0/1 F=0/1 M=0/0  → consistent (no row)
#   pos 600  C=0/1 F=./. M=0/0  → uncallable parent (no row)
VCF_ME = """\
##fileformat=VCFv4.2
##contig=<ID=chr1,length=248956422>
##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tCHILD\tFATHER\tMOTHER
chr1\t100\t.\tA\tG\t50.0\tPASS\tDP=30\tGT\t0/1\t0/0\t0/0
chr1\t200\t.\tC\tT\t50.0\tPASS\tDP=30\tGT\t1/1\t0/0\t0/0
chr1\t300\t.\tG\tA\t50.0\tPASS\tDP=30\tGT\t0/0\t0/0\t1/1
chr1\t400\t.\tT\tC\t50.0\tPASS\tDP=30\tGT\t1/1\t0/1\t0/0
chr1\t500\t.\tA\tC\t50.0\tPASS\tDP=30\tGT\t0/1\t0/1\t0/0
chr1\t600\t.\tA\tC\t50.0\tPASS\tDP=30\tGT\t0/1\t./.\t0/0
"""


@pytest.fixture(scope="module")
def me_engine(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("trio_me")
    vcf, ped = str(d / "me.vcf"), str(d / "me.ped")
    open(vcf, "w").write(VCF_ME)
    open(ped, "w").write(PED)
    return InheritanceEngine(load_vcf(spark, vcf, ped_path=ped))


def test_mendel_errors_categories(me_engine):
    rows = {r["start"]: r["error"] for r in me_engine.mendel_errors().collect()}
    assert rows == {
        99: "plausible de novo",
        199: "implausible de novo",
        299: "uniparental disomy",
        399: "loss of heterozygosity",
    }


def test_mendel_errors_child_column(me_engine):
    assert {r["child"] for r in me_engine.mendel_errors().collect()} == {"CHILD"}


def test_mendel_errors_single_scan(me_engine):
    plan = me_engine.mendel_errors()._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # one Generate (explode) over one scan — no union of per-trio subplans
    assert plan.count("Generate") == 1


# ---- randomized differential vs a pure-Python twin --------------------------

_GT_OF = {0: "0/0", 1: "0/1", 3: "1/1", 2: "./."}


def _twin_models(rows, trios, sidx):
    """Re-derive every model's start-set from the generated CODES with
    plain Python — an independent restatement of the reconstructed
    gemini semantics (inheritance.py module docstring). rows =
    [(chrom, start, {sample: code})]; trios = [(child, father, mother,
    child_sex, child_aff, father_aff, mother_aff)]."""

    def carries(code, sex):
        return code in (1, 3) if sex == 1 else code == 1

    out = {m: set() for m in (
        "de_novo", "autosomal_recessive", "autosomal_dominant",
        "x_linked_de_novo", "x_linked_recessive", "x_linked_dominant",
    )}
    mendel = set()
    for chrom, start, codes in rows:
        on_x = chrom == "chrX"
        for child, father, mother, csex, caff, faff, maff in trios:
            c, f, m = codes[child], codes[father], codes[mother]
            if caff:
                if c == 1 and f == 0 and m == 0:
                    out["de_novo"].add(start)
                if c == 3 and f == 1 and m == 1:
                    out["autosomal_recessive"].add(start)
                if c == 1 and ((faff and f == 1) or (maff and m == 1)):
                    out["autosomal_dominant"].add(start)
                if on_x:
                    if carries(c, csex) and f == 0 and m == 0:
                        out["x_linked_de_novo"].add(start)
                    if csex == 1:
                        if carries(c, 1) and m == 1 and f == 0:
                            out["x_linked_recessive"].add(start)
                        mother_ok = maff and m == 1
                        if carries(c, 1) and mother_ok:
                            out["x_linked_dominant"].add(start)
                    else:
                        if c == 3 and m == 1 and f in (1, 3):
                            out["x_linked_recessive"].add(start)
                        mother_ok = maff and m == 1
                        father_ok = faff and f in (1, 3)
                        if carries(c, 2) and (mother_ok or father_ok):
                            out["x_linked_dominant"].add(start)
            err = None
            if f == 0 and m == 0 and c == 1:
                err = "plausible de novo"
            elif f == 3 and m == 3 and c == 1:
                err = "plausible de novo"
            elif f == 0 and m == 0 and c == 3:
                err = "implausible de novo"
            elif f == 3 and m == 3 and c == 0:
                err = "implausible de novo"
            elif ((f == 0 and m == 3) or (f == 3 and m == 0)) and c in (0, 3):
                err = "uniparental disomy"
            elif f == 1 and m == 0 and c == 3:
                err = "loss of heterozygosity"
            elif f == 1 and m == 3 and c == 0:
                err = "loss of heterozygosity"
            elif m == 1 and f == 0 and c == 3:
                err = "loss of heterozygosity"
            elif m == 1 and f == 3 and c == 0:
                err = "loss of heterozygosity"
            if err is not None:
                mendel.add((start, child, err))
    return out, mendel


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_inheritance_models_randomized_differential(spark, tmp_path, seed):
    """Two random trios + one unrelated sample, 120 random-genotype sites
    across chr1/chrX (UNKNOWN calls included): every model and the
    mendel scan must match the Python twin exactly — catches sample
    indexing, chrom filtering, sex handling, and affected-status wiring
    under shapes the goldens never pin."""
    import random

    rng = random.Random(seed)
    samples = ["C1", "F1", "M1", "C2", "F2", "M2", "U1"]
    sex = {"C1": rng.choice([1, 2]), "F1": 1, "M1": 2,
           "C2": rng.choice([1, 2]), "F2": 1, "M2": 2, "U1": 2}
    aff = {s: rng.random() < 0.5 for s in samples}
    aff["C1"] = True  # at least one affected child keeps models non-vacuous
    ped_lines = ["#family_id name paternal_id maternal_id sex phenotype"]
    for fam, (ch, fa, mo) in (("f1", ("C1", "F1", "M1")),
                              ("f2", ("C2", "F2", "M2"))):
        for s, pa, ma in ((ch, fa, mo), (fa, "0", "0"), (mo, "0", "0")):
            ped_lines.append(
                f"{fam} {s} {pa} {ma} {sex[s]} {2 if aff[s] else 1}"
            )
    ped_lines.append(f"f3 U1 0 0 {sex['U1']} {2 if aff['U1'] else 1}")

    rows = []
    vcf_lines = []
    for chrom in ("chr1", "chrX"):  # header order = locus order
        for i in range(60):
            pos = 100 + i
            codes = {s: rng.choice((0, 1, 3, 2)) for s in samples}
            rows.append((chrom, pos - 1, codes))
            gts = "\t".join(_GT_OF[codes[s]] for s in samples)
            vcf_lines.append(
                f"{chrom}\t{pos}\t.\tA\tG\t50.0\tPASS\tDP=30\tGT\t{gts}"
            )
    header = (
        "##fileformat=VCFv4.2\n"
        "##contig=<ID=chr1,length=248956422>\n"
        "##contig=<ID=chrX,length=156040895>\n"
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">\n'
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(samples) + "\n"
    )
    vcf, ped = str(tmp_path / "rand.vcf"), str(tmp_path / "rand.ped")
    open(vcf, "w").write(header + "\n".join(vcf_lines) + "\n")
    open(ped, "w").write("\n".join(ped_lines) + "\n")

    eng = InheritanceEngine(load_vcf(spark, vcf, ped_path=ped))
    trios = [
        ("C1", "F1", "M1", sex["C1"], aff["C1"], aff["F1"], aff["M1"]),
        ("C2", "F2", "M2", sex["C2"], aff["C2"], aff["F2"], aff["M2"]),
    ]
    want, want_mendel = _twin_models(rows, trios, samples)
    for model in want:
        got = {r["start"] for r in getattr(eng, model)().select("start").collect()}
        assert got == want[model], f"seed {seed}: {model} diverged"
    got_mendel = {
        (r["start"], r["child"], r["error"])
        for r in eng.mendel_errors().collect()
    }
    assert got_mendel == want_mendel, f"seed {seed}: mendel_errors diverged"
