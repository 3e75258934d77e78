"""BED source (sources/bed.py) + seeded property check: binned interval
annotation equals the naive theta join on randomized interval sets."""

from __future__ import annotations

import gzip
import random

import pytest

from pyspark.sql import functions as F

from vcf2db_spark.operators.annotate import annotate_variants
from vcf2db_spark.sources.bed import read_bed

BED6 = """\
# CpG islands (toy)
track name=cpg description="islands"
chr1\t50\t150\tcpg1\t900\t+
chr1\t100000\t120000\tcpg2\t800\t-
chr2\t0\t1000\tcpg3\t700\t+
"""


def test_read_bed6(spark, tmp_path):
    p = tmp_path / "toy.bed"
    p.write_text(BED6)
    df = read_bed(spark, str(p))
    assert df.columns == ["chrom", "start", "end", "name", "score", "strand"]
    rows = df.orderBy("chrom", "start").collect()
    assert len(rows) == 3
    assert rows[0]["name"] == "cpg1" and rows[0]["score"] == 900.0
    assert rows[2]["chrom"] == "chr2" and rows[2]["strand"] == "+"


def test_read_bed_gz_and_bed3(spark, tmp_path):
    p = tmp_path / "toy3.bed.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("chr1\t10\t20\nchr1\t30\t40\n")
    df = read_bed(spark, str(p))
    assert df.columns == ["chrom", "start", "end"]
    assert df.count() == 2


def test_read_bed_rejects_empty(spark, tmp_path):
    p = tmp_path / "empty.bed"
    p.write_text("# nothing\n")
    with pytest.raises(ValueError, match="no data lines"):
        read_bed(spark, str(p))


def test_annotate_from_bed_file(spark, tmp_path):
    """End-to-end gemini-annotate shape: variants × BED file → flag+name."""
    p = tmp_path / "anno.bed"
    p.write_text(BED6)
    variants = spark.createDataFrame(
        [(1, "chr1", 100, 101), (2, "chr1", 500, 520), (3, "chr2", 10, 11)],
        "variant_id bigint, chrom string, start bigint, end bigint",
    )
    out = annotate_variants(
        variants,
        read_bed(spark, str(p)),
        boolean_col="in_cpg",
        extract={"cpg_name": ("name", "first")},
        bin_width=1_000,
    ).orderBy("variant_id")
    got = [(r["in_cpg"], r["cpg_name"]) for r in out.collect()]
    assert got == [(True, "cpg1"), (False, None), (True, "cpg3")]


@pytest.mark.parametrize("seed,bin_width", [(1, 64), (2, 1000), (3, 7)])
def test_annotate_property_binned_equals_naive(spark, seed, bin_width):
    """Seeded random intervals: the binned join's bin-ownership dedup must
    reproduce the exact theta-join multiset for every bin width."""
    rng = random.Random(seed)
    chroms = ["chr1", "chr2"]
    vs = [
        (i, rng.choice(chroms), s := rng.randrange(0, 5000), s + rng.randrange(1, 400))
        for i in range(60)
    ]
    rs = [
        (rng.choice(chroms), s := rng.randrange(0, 5000), s + rng.randrange(1, 800), float(i))
        for i in range(40)
    ]
    variants = spark.createDataFrame(vs, "variant_id bigint, chrom string, start bigint, end bigint")
    regions = spark.createDataFrame(rs, "chrom string, start bigint, end bigint, score double")

    out = (
        annotate_variants(
            variants, regions, count_col="n", extract={"s": ("score", "sum")}, bin_width=bin_width
        )
        .select("variant_id", "n", "s")
        .collect()
    )
    v, r = variants.alias("v"), regions.alias("r")
    naive = (
        v.join(
            r,
            (F.col("v.chrom") == F.col("r.chrom"))
            & (F.col("v.start") < F.col("r.end"))
            & (F.col("v.end") > F.col("r.start")),
            "left",
        )
        .groupBy("v.variant_id")
        .agg(F.count("r.score").alias("n"), F.sum("r.score").alias("s"))
        .collect()
    )
    assert sorted(map(tuple, out)) == sorted(map(tuple, naive))
