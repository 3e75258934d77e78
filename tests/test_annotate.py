"""`gemini annotate` analog (operators/annotate.py): boolean / count /
extract region annotation over the binned interval join, verified against
a hand-computed golden and the naive theta-join twin."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vcf2db_spark.operators.annotate import annotate_variants


@pytest.fixture(scope="module")
def frames(spark):
    variants = spark.createDataFrame(
        [
            (1, "chr1", 100, 101),   # inside r1, touches r2? r2=[100,200) yes
            (2, "chr1", 150_000, 150_010),  # crosses bin boundary region r3
            (3, "chr1", 500, 520),   # no overlap
            (4, "chr2", 100, 101),   # other chrom, inside r4
        ],
        "variant_id bigint, chrom string, start bigint, end bigint",
    )
    regions = spark.createDataFrame(
        [
            ("chr1", 50, 150, 1.0, "cpg"),
            ("chr1", 100, 200, 3.0, "dgv"),
            ("chr1", 140_000, 160_000, 5.0, "seg"),
            ("chr2", 0, 1_000, 7.0, "cpg"),
        ],
        "chrom string, start bigint, end bigint, score double, name string",
    )
    return variants, regions


def test_boolean_count_extract_golden(frames):
    variants, regions = frames
    out = annotate_variants(
        variants,
        regions,
        boolean_col="in_any",
        count_col="n_regions",
        extract={
            "score_mean": ("score", "mean"),
            "score_max": ("score", "max"),
            "first_name": ("name", "first"),
            "names": ("name", "uniq"),
        },
        bin_width=1_000,  # small width: variant 2's region spans 20 bins
    ).orderBy("variant_id")
    rows = {r["variant_id"]: r for r in out.collect()}
    assert len(rows) == 4

    assert rows[1]["in_any"] and rows[1]["n_regions"] == 2
    assert rows[1]["score_mean"] == pytest.approx(2.0)
    assert rows[1]["score_max"] == 3.0
    assert rows[1]["first_name"] == "cpg"  # region starting at 50 comes first
    assert rows[1]["names"] == ["cpg", "dgv"]

    assert rows[2]["n_regions"] == 1 and rows[2]["score_mean"] == 5.0

    assert not rows[3]["in_any"]
    assert rows[3]["n_regions"] == 0
    assert rows[3]["score_mean"] is None and rows[3]["names"] is None

    assert rows[4]["first_name"] == "cpg" and rows[4]["score_max"] == 7.0


def test_matches_naive_theta_join(frames):
    """Binned-join annotation == brute-force theta-join annotation."""
    variants, regions = frames
    out = (
        annotate_variants(variants, regions, count_col="n", bin_width=128)
        .select("variant_id", "n")
        .orderBy("variant_id")
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
        .agg(F.count("r.chrom").alias("n"))
        .orderBy("variant_id")
        .collect()
    )
    assert [tuple(x) for x in out] == [tuple(x) for x in naive]


def test_rejects_bad_op_and_empty_spec(frames):
    variants, regions = frames
    with pytest.raises(ValueError, match="unknown extract op"):
        annotate_variants(variants, regions, extract={"x": ("score", "median")})
    with pytest.raises(ValueError, match="nothing to annotate"):
        annotate_variants(variants, regions)
