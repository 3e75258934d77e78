"""Deterministic mini-VCF fixture (FIXTURES.md §3 source form).

Generates a decomposed, VEP-annotated VCF with 3 samples and a PED file —
small enough to hand-check, wide enough to exercise every header/INFO/
FORMAT/CSQ path (A1/A2/A5/A6/A7/A8/A9).
"""

from __future__ import annotations

HEADER = """\
##fileformat=VCFv4.2
##contig=<ID=chr1,length=248956422>
##contig=<ID=chr2,length=242193529>
##INFO=<ID=AC,Number=A,Type=Integer,Description="Allele count">
##INFO=<ID=AF,Number=A,Type=Float,Description="Allele frequency">
##INFO=<ID=DP,Number=1,Type=Integer,Description="Total depth">
##INFO=<ID=culprit,Number=1,Type=String,Description="VQSR culprit">
##INFO=<ID=PASSFLAG,Number=0,Type=Flag,Description="A flag">
##INFO=<ID=MQ.RankSum,Number=1,Type=Float,Description="dotted name">
##INFO=<ID=CSQ,Number=.,Type=String,Description="Consequence annotations from Ensembl VEP. Format: Allele|Consequence|SYMBOL|Feature|BIOTYPE|EXON|Codons|Amino_acids|Protein_position|PolyPhen|SIFT">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype quality">
##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Read depth">
##FORMAT=<ID=AD,Number=R,Type=Integer,Description="Allelic depths">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA001\tNA002\tNA003
"""

BODY = """\
chr1\t100\trs1\tA\tG\t50.0\tPASS\tAC=2;AF=0.333;DP=30;culprit=MQ;CSQ=G|missense_variant|BRCA2|ENST0002|protein_coding|2/10|gCa/gGa|A/G|120|probably_damaging(0.95)|deleterious(0.02),G|intron_variant|BRCA2|ENST0001|protein_coding||||||\tGT:GQ:DP:AD\t0/1:99:10:6,4\t0/0:80:12:12,0\t1|1:60:8:0,8
chr1\t200\t.\tC\tT\t12.5\tq10\tAC=1;AF=0.167;DP=22;PASSFLAG;MQ.RankSum=-1.5;CSQ=T|synonymous_variant|TP53|ENST0010|protein_coding|4/11|ttC/ttT|F|88||tolerated(0.8)\tGT:GQ:DP:AD\t0/0:50:7:7,0\t./.:.:.:.\t0/1:33:9:5,4
chr1\t300\t.\tG\tGTT\t99.0\tPASS\tAC=4;AF=0.667;DP=41;CSQ=GTT|frameshift_variant|BRCA2|ENST0002|protein_coding|3/10|||130||,GTT|upstream_gene_variant|XDH1|ENST0099|lincRNA|||||||\tGT:GQ:DP:AD\t1/1:90:14:1,13\t0/1:70:11:5,6\t0/1:88:12:7,5
chr1\t400\t.\tTAC\tT\t77.0\tPASS\tAC=1;AF=0.167;DP=18\tGT:GQ:DP:AD\t0/0:44:6:6,0\t0/1:55:5:3,2\t0/0:67:7:7,0
chr2\t150\t.\tT\tC\t33.0\tPASS\tAC=3;AF=0.5;DP=27;CSQ=C|stop_gained&splice_region_variant|MLH1|ENST0042|protein_coding|1/5||Q/*|20||\tGT:GQ:DP:AD\t0/1:95:9:4,5\t1/1:85:10:0,10\t0/0:75:8:8,0
chr2\t250\t.\tG\tC\t21.0\tlowq\tAC=1;AF=0.167;DP=15;culprit=FS\tGT:GQ:DP:AD\t0/1:40:5:3,2\t0/0:40:6:6,0\t./1:20:4:1,3
"""

PED = """\
#family_id name paternal_id maternal_id sex phenotype ethnicity
fam1 NA001 0 0 1 2 EUR
fam1 NA002 NA001 NA003 2 1 EUR
fam2 NA003 0 0 2 -9 AFR
"""


def write_fixture(dirpath: str) -> tuple[str, str]:
    import os

    os.makedirs(dirpath, exist_ok=True)
    vcf = os.path.join(dirpath, "mini.vcf")
    ped = os.path.join(dirpath, "mini.ped")
    with open(vcf, "w") as fh:
        fh.write(HEADER + BODY)
    with open(ped, "w") as fh:
        fh.write(PED)
    return vcf, ped
