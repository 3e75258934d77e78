"""In-engine multi-allelic decomposition (sources/vcf.py decompose='split',
vt decompose -s semantics): per-alt INFO A/R slicing, GT allele remap with
other-alt→missing, AD subsetting, G-field drop — hand-golden checked."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vcf2db_spark.pipeline import load_vcf

HEADER = """\
##fileformat=VCFv4.2
##contig=<ID=chr1,length=1000000>
##INFO=<ID=AC,Number=A,Type=Integer,Description="per-alt count">
##INFO=<ID=AF,Number=A,Type=Float,Description="per-alt freq">
##INFO=<ID=DP,Number=1,Type=Integer,Description="site depth">
##INFO=<ID=RD,Number=R,Type=Integer,Description="per-allele depth">
##INFO=<ID=GL,Number=G,Type=Float,Description="genotype likelihoods">
##FORMAT=<ID=GT,Number=1,Type=String,Description="gt">
##FORMAT=<ID=AD,Number=R,Type=Integer,Description="ad">
##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="gq">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2
"""

# one tri-allelic site + one plain site
BODY = (
    "chr1\t100\t.\tA\tG,T\t60.0\tPASS\t"
    "AC=3,1;AF=0.75,0.25;DP=40;RD=10,20,5;GL=-1,-2,-3,-4,-5,-6\t"
    "GT:AD:GQ\t1/2:2,20,5:99\t0/1:10,8,0:88\n"
    "chr1\t200\t.\tC\tG\t30.0\tPASS\tAC=1;AF=0.5;DP=9;RD=4,5\t"
    "GT:AD:GQ\t0/0:4,0:50\t0/1:2,5:60\n"
)


@pytest.fixture(scope="module")
def loaded(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("decomp") / "multi.vcf"
    p.write_text(HEADER + BODY)
    return load_vcf(spark, str(p), decompose="split").variants.cache()


def test_reject_mode_still_raises(spark, tmp_path):
    p = tmp_path / "multi2.vcf"
    p.write_text(HEADER + BODY)
    with pytest.raises(Exception, match="decompose"):
        load_vcf(spark, str(p)).variants.collect()


def test_split_row_counts_and_alts(loaded):
    rows = loaded.orderBy("start", "alt").collect()
    assert [(r["start"], r["alt"]) for r in rows] == [(99, "G"), (99, "T"), (199, "G")]


def test_info_a_and_r_slicing(loaded):
    g = loaded.filter((F.col("start") == 99) & (F.col("alt") == "G")).collect()[0]
    t = loaded.filter((F.col("start") == 99) & (F.col("alt") == "T")).collect()[0]
    assert g["ac"] == 3 and g["af"] == pytest.approx(0.75)
    assert t["ac"] == 1 and t["af"] == pytest.approx(0.25)
    assert g["dp"] == 40 and t["dp"] == 40          # Number=1 passes through
    assert g["rd"] == [10, 20] and t["rd"] == [10, 5]  # R → [ref, alt_i]
    assert g["gl"] is None and t["gl"] is None      # Number=G dropped on split


def test_gt_remap_and_ad_subset(loaded):
    """S1 is 1/2: for alt G (index 0) → 1/. = unknown; for alt T → ./1 =
    unknown. S2 is 0/1: for G → 0/1 het; for T → 0/. unknown."""
    g = loaded.filter((F.col("start") == 99) & (F.col("alt") == "G")).collect()[0]
    t = loaded.filter((F.col("start") == 99) & (F.col("alt") == "T")).collect()[0]
    assert g["gt_types"] == [2, 1]
    assert t["gt_types"] == [2, 2]
    # AD subset: S1 2,20,5 → G:(2,20) T:(2,5); S2 10,8,0 → G:(10,8) T:(10,0)
    assert g["gt_ref_depths"] == [2, 10] and g["gt_alt_depths"] == [20, 8]
    assert t["gt_ref_depths"] == [2, 10] and t["gt_alt_depths"] == [5, 0]
    # GQ untouched
    assert g["gt_quals"] == [99, 88]


def test_biallelic_rows_unchanged_by_split_mode(loaded):
    r = loaded.filter(F.col("start") == 199).collect()[0]
    assert r["ac"] == 1 and r["rd"] == [4, 5]
    assert r["gt_types"] == [0, 1]


def test_variant_id_orders_split_rows(loaded):
    ids = [r["variant_id"] for r in loaded.orderBy("chrom", "start", "ref", "alt").collect()]
    assert ids == [1, 2, 3]
